"""ELL sparse matrix-vector products.

The fixed mesh adjacency gives every assembled system the same sparsity:
one diagonal + up to K off-diagonals per row, aligned with
`mesh.cell_neighbors` (the TPU-native replacement for the reference's
CSR matrices with in-place value overwrite, discretization.rs:450-472).

`EllMatrix` supports leading batch dimensions — the three momentum
systems (shared sparsity, different coefficients) are solved as one
batched [3, C] solve.

The default implementation is pure XLA (gather + multiply + reduce,
which XLA fuses well). A Pallas kernel path for the roofline-critical
single-matrix case lives in `orc_tpu.ops.pallas_kernels` and is selected
automatically on TPU for large meshes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EllMatrix:
    """A = diag(diag) + scatter(off) over a shared neighbor table.

    diag: [..., C];  off: [..., C, K];  neighbors: [C, K] i32 with
    self-indices at padded/boundary slots (their `off` must be 0).

    `offsets`: static per-column index deltas when the adjacency is
    *structured* (neighbors[c, k] == c + offsets[k] wherever off != 0,
    detected at mesh-compile time). With offsets set, the SpMV gather
    degenerates to K circular shifts — pure elementwise work that XLA
    fuses into the surrounding Krylov iteration, eliminating the gather
    and (at small mesh sizes) most of the dispatch-latency floor.
    Wrap-around entries are safe by construction: any row whose
    neighbor is not exactly c + offsets[k] carries a zero coefficient.
    """

    diag: jax.Array
    off: jax.Array
    neighbors: jax.Array
    offsets: tuple | None = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    @property
    def n(self) -> int:
        return self.diag.shape[-1]

    def matvec(self, x):
        """A @ x for x of shape [..., C] (batch dims broadcast)."""
        return ell_spmv(self.diag, self.off, self.neighbors, x, self.offsets)

    def with_values(self, diag, off) -> "EllMatrix":
        return EllMatrix(
            diag=diag,
            off=off,
            neighbors=self.neighbors,
            offsets=self.offsets,
        )

    def jacobi_preconditioned(self):
        """Return (D^-1 A, D^-1) applied form: scales rows by 1/diag
        (reference: linear_algebra.rs:157-168)."""
        inv_d = 1.0 / self.diag
        return (
            EllMatrix(
                diag=jnp.ones_like(self.diag),
                off=self.off * inv_d[..., None],
                neighbors=self.neighbors,
                offsets=self.offsets,
            ),
            inv_d,
        )


import os as _os

#: Pallas halo-window kernel for large structured f32 SpMVs — opt-in
#: (ORC_TPU_PALLAS_SPMV=1). Measured story (round 2, hardened
#: scan-slope timing): in ISOLATION it beats the XLA shift path on
#: every case tried (1M-cell 3D 695 vs 659 GB/s; 1024^2 f32 1095 vs
#: 901; 2048^2 1169 vs 1055 — single x read via VMEM halo windows vs
#: per-offset rolls). IN CONTEXT it loses: a pallas_call is a fusion
#: barrier, so the BiCGSTAB axpys/dots that XLA otherwise fuses into
#: the SpMV materialize separately — measured 462 vs 326 ms per SIMPLE
#: iteration at 9.4M cells (scripts/bench_cavity.py A/B). Default off
#: until the kernel grows to cover the fused neighborhood (the
#: fused-assembly+SpMV design in NOTES.md). f64 cannot use it (XLA's
#: x64-emulation rewrite rejects custom calls), nor can batched [3,C]
#: momentum solves.
_PALLAS_SPMV = _os.environ.get("ORC_TPU_PALLAS_SPMV", "0") == "1"
_PALLAS_MIN_CELLS = 262144


def _pallas_eligible(diag, off, x, offsets):
    if not _PALLAS_SPMV or offsets is None:
        return False
    if x.ndim != 1 or diag.ndim != 1 or off.ndim != 2:
        return False
    if x.dtype != jnp.float32:
        return False
    if x.shape[0] < _PALLAS_MIN_CELLS:
        return False
    try:
        import jax

        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def ell_spmv(diag, off, neighbors, x, offsets=None):
    """y = diag * x + sum_k off[..., k] * x[..., neighbors[:, k]].

    With static `offsets`, neighbor gathers become circular shifts
    (see EllMatrix.offsets)."""
    if _pallas_eligible(diag, off, x, offsets):
        from orc_tpu.ops.pallas_spmv import shift_spmv

        return shift_spmv(diag, off, tuple(offsets), x)
    if offsets is not None:
        y = diag * x
        for k, d in enumerate(offsets):
            xk = jnp.roll(x, -d, axis=-1) if d != 0 else x
            y = y + off[..., k] * xk
        return y
    xg = x[..., neighbors]  # [..., C, K]
    return diag * x + jnp.sum(off * xg, axis=-1)
