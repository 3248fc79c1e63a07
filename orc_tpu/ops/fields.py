"""Boundary-condition arrays on device.

`BoundaryTable` (host) -> small per-zone device arrays -> per-face
gathered arrays used by every interpolation/assembly op. BC *values* are
traced data, so editing them never recompiles; BC *types* are also traced
(selected with `jnp.where` masks), so even retyping a zone reuses the
same executable.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from orc_tpu.mesh.compile import CompiledMesh
from orc_tpu.mesh.zones import BoundaryTable, FaceCondition

# Integer codes used in on-device selects.
INTERIOR = int(FaceCondition.INTERIOR)
WALL = int(FaceCondition.WALL)
PRESSURE_INLET = int(FaceCondition.PRESSURE_INLET)
PRESSURE_OUTLET = int(FaceCondition.PRESSURE_OUTLET)
SYMMETRY = int(FaceCondition.SYMMETRY)
VELOCITY_INLET = int(FaceCondition.VELOCITY_INLET)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FaceBC:
    """Per-face boundary-condition data (gathered from the zone table)."""

    code: jax.Array  # [F] i32 FaceCondition code
    scalar: jax.Array  # [F] zone scalar (boundary pressure, ...)
    vector: jax.Array  # [F,3] zone vector (wall/inlet velocity, ...)

    def is_(self, *codes: int) -> jax.Array:
        m = self.code == codes[0]
        for c in codes[1:]:
            m = m | (self.code == c)
        return m


def device_bc(table: BoundaryTable, dtype=jnp.float64):
    """Zone-level device arrays: (codes[Z] i32, scalar[Z], vector[Z,3])."""
    return (
        jnp.asarray(table.codes, dtype=jnp.int32),
        jnp.asarray(table.scalar, dtype=dtype),
        jnp.asarray(table.vector, dtype=dtype),
    )


def face_bc(mesh: CompiledMesh, zone_codes, zone_scalar, zone_vector) -> FaceBC:
    """Gather zone BC data onto faces (inside jit)."""
    s = mesh.face_zone_slot
    return FaceBC(
        code=zone_codes[s], scalar=zone_scalar[s], vector=zone_vector[s]
    )
