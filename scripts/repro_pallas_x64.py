"""Diagnostic: lower the fused-assembly Pallas step for TPU via
jax.export on a CPU host (runs the Mosaic pass locally, no tunnel).

FINDING (2026-08-17): this cross-platform export path fails with
"Unsupported cast: float64 -> float32" under jax_enable_x64, but the
REAL TPU-backend jit path lowers AND executes the same graph clean
(verified on-chip at HEAD) — weak-f64 literal constants are folded
differently by export. The 10:39 CD1-probe RecursionError predates
commit 1a3de6b's lowering fix; no x64 gate is needed in
_pallas_asm_spec. Keep this script only as a tunnel-free smoke probe
for FUTURE Mosaic lowering regressions, and re-verify any failure it
reports against a real `jax.jit(...).lower()` on the tpu backend
before acting on it.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import orc_tpu  # noqa: F401  (enables x64)

assert jax.config.jax_enable_x64, "x64 must be ON for this repro"

from orc_tpu.models.cavity import cavity_case
from orc_tpu.ops.ck_ops import build_ck_geometry, ck_bc, ck_diffusion
from orc_tpu.solver.simple import (
    _make_chunk_runner,
    _pallas_asm_spec,
    device_bc,
    initial_state,
)
from orc_tpu.utils.settings import (
    MatrixSolverSettings,
    MomentumScheme,
    NumericalSettings,
    PreconditionMethod,
    PressureInterpolation,
    RelaxationMode,
    SolutionMethod,
    VelocityInterpolation,
)

mesh, table = cavity_case(n=64, lid_velocity=1.0, dtype=jnp.float32)
settings = NumericalSettings(
    momentum=MomentumScheme.UD,
    pressure_interpolation=PressureInterpolation.LINEAR_WEIGHTED,
    velocity_interpolation=VelocityInterpolation.LINEAR_WEIGHTED,
    pressure_relaxation=0.1,
    momentum_relaxation=0.7,
    relaxation_mode=RelaxationMode.IMPLICIT,
    matrix_solver=MatrixSolverSettings(
        solver_type=SolutionMethod.BICGSTAB,
        iterations=50,
        preconditioner=PreconditionMethod.JACOBI,
    ),
)
zc, zs, zv = device_bc(table, dtype=mesh.dtype)
state = initial_state(mesh)
ck = build_ck_geometry(mesh, len(table.zone_ids))
ck_diff = ck_diffusion(mesh, ck, ck_bc(ck, zc, zs, zv), jnp.asarray(0.001, mesh.dtype))
from orc_tpu.ops.pallas_assembly import column_specs

# _pallas_asm_spec would gate off on the cpu backend; build the real
# (non-interpret) spec directly — we only LOWER for tpu, never run.
from orc_tpu.ops.pallas_assembly import AsmSpec

cols = column_specs(mesh, table)
assert cols is not None, "expected a pallas-eligible uniform box"
spec = (cols, AsmSpec(vol=float(mesh.cell_volume[0])), False)

run = _make_chunk_runner(mesh, settings, None, 10, {}, ck=ck, ck_diff=ck_diff, pallas_asm=spec, maybe_singular=False)
# rho / mu as python floats exactly as solve_steady passes them (weak
# f64 under x64 — the suspected crash trigger).
exported = jax.export.export(
    jax.jit(run), platforms=["tpu"]
)(state, zc, zs, zv, 1.0, 0.001)
print("LOWERED OK for tpu:", exported.platforms)
