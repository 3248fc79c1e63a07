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

    `plan` (irregular meshes, mesh/reorder.py): a per-tile distinct-
    delta slice schedule. `prepare()` converts `off` once per solve
    into the slice-column layout [..., ntiles, n_max, T]
    (`slice_layout=True`), after which matvec runs gather-free on
    contiguous dynamic slices — the TPU fast path for meshes with no
    structured offsets.
    """

    diag: jax.Array
    off: "jax.Array | tuple"
    neighbors: jax.Array
    offsets: tuple | None = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    plan: "object | None" = None
    slice_layout: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )

    @property
    def n(self) -> int:
        return self.diag.shape[-1]

    def matvec(self, x):
        """A @ x for x of shape [..., C] (batch dims broadcast)."""
        if self.slice_layout:
            return slice_spmv(self.diag, self.off, self.plan, x)
        return ell_spmv(self.diag, self.off, self.neighbors, x, self.offsets)

    def split_columns(self) -> "EllMatrix":
        """Pre-slice `off` into its K per-offset columns (a K-tuple of
        [..., C] arrays) BEFORE entering a solver loop.

        Inside a `lax.while_loop` body, `off[..., k]` is re-sliced —
        and, with the minor-dim-K layout the assembly graph produces,
        re-LAYOUTED — on every iteration: measured 45% of a SIMPLE
        iteration at 9.4M cells (profile_trace.py fusion.142/144, six
        [C,1] T(1,128) copies per sweep/BiCGSTAB step, ~2.6 ms each).
        Splitting once per solve moves those copies out of the loop;
        the shift SpMV then reads loop-invariant contiguous vectors.

        Zero-offset slots are DROPPED: a d == 0 entry marks a padded
        ELL column that is never active (a real self-neighbor lives on
        the diagonal, so mesh compilation assigns 0 only to slots with
        identically-zero coefficients — e.g. the two unused K=6 slots
        of a 2D mesh). Dropping them removes their dead coefficient
        reads from every SpMV of the solve.

        Only meaningful for structured-offsets matrices (the slice-plan
        path converts layouts in `prepare()` instead). No-op if already
        split."""
        if self.offsets is None or isinstance(self.off, tuple):
            return self
        keep = [k for k, d in enumerate(self.offsets) if int(d) != 0]
        return EllMatrix(
            diag=self.diag,
            off=tuple(self.off[..., k] for k in keep),
            neighbors=self.neighbors,
            offsets=tuple(self.offsets[k] for k in keep),
            plan=self.plan,
            slice_layout=self.slice_layout,
        )

    def prepare(self) -> "EllMatrix":
        """One-time (per solve) conversion to the slice-column layout
        when a slice plan exists; amortized over the solve's dozens of
        SpMVs. No-op otherwise.

        The [C,K] -> [C,n_max] routing is a K-way one-hot select
        accumulation whose SUM is exactly scatter-add-equivalent —
        including when two interior slots of a row share a delta (e.g.
        duplicated face pairs): their coefficients land in the same
        (c, j) and add, just as a scatter-add would merge them. No
        distinct-delta precondition is needed for correctness; delta
        distinctness only determines whether coefficients merge into
        one slice column. On TPU the elementwise form runs at memory
        speed while
        the equivalent XLA scatter takes ~74x longer (12.5 ms vs
        0.17 ms at 200k cells, K=6, n_max=33 — measured round 4)."""
        if self.plan is None or self.slice_layout:
            return self
        p = self.plan
        C, K = self.neighbors.shape
        batch = self.off.shape[:-2]
        iota_j = jnp.arange(p.n_max, dtype=p.col_of.dtype)[None, :]
        coef = jnp.zeros((*batch, C, p.n_max), self.off.dtype)
        for k in range(K):
            coef = coef + jnp.where(
                p.col_of[:, k : k + 1] == iota_j,
                self.off[..., :, k : k + 1],
                0.0,
            )
        cpad = p.ntiles * p.tile - C
        coef = jnp.pad(
            coef, [(0, 0)] * len(batch) + [(0, cpad), (0, 0)]
        ).reshape(*batch, p.ntiles, p.tile, p.n_max)
        coef = jnp.swapaxes(coef, -1, -2)  # [..., ntiles, n_max, T]
        return EllMatrix(
            diag=self.diag,
            off=coef,
            neighbors=self.neighbors,
            offsets=None,
            plan=p,
            slice_layout=True,
        )

    def with_values(self, diag, off) -> "EllMatrix":
        return EllMatrix(
            diag=diag,
            off=off,
            neighbors=self.neighbors,
            offsets=self.offsets,
            plan=self.plan,
            slice_layout=self.slice_layout,
        )

    def jacobi_preconditioned(self):
        """Return (D^-1 A, D^-1) applied form: scales rows by 1/diag
        (reference: linear_algebra.rs:157-168)."""
        inv_d = 1.0 / self.diag
        if self.slice_layout:
            p = self.plan
            batch = self.diag.shape[:-1]
            cpad = p.ntiles * p.tile - p.n_cells
            inv_d_t = jnp.pad(
                inv_d, [(0, 0)] * len(batch) + [(0, cpad)]
            ).reshape(*batch, p.ntiles, 1, p.tile)
            off_scaled = self.off * inv_d_t
        elif isinstance(self.off, tuple):
            off_scaled = tuple(o * inv_d for o in self.off)
        else:
            off_scaled = self.off * inv_d[..., None]
        return (
            EllMatrix(
                diag=jnp.ones_like(self.diag),
                off=off_scaled,
                neighbors=self.neighbors,
                offsets=self.offsets,
                plan=self.plan,
                slice_layout=self.slice_layout,
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
    if isinstance(off, tuple):
        return False  # column-split form (split_columns) — XLA path
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
            col = off[k] if isinstance(off, tuple) else off[..., k]
            y = y + col * xk
        return y
    xg = x[..., neighbors]  # [..., C, K]
    return diag * x + jnp.sum(off * xg, axis=-1)


#: Pallas slice-plan kernel (ops/pallas_slice.py) — DEFAULT ON for
#: irregular-mesh f32 SpMVs on TPU. The XLA formulation below lowers
#: to an element gather (measured ~7000x the structured shift on v5e,
#: scripts/bench_irregular.py); the kernel DMAs one VMEM window per 8
#: tiles and rotates slices in-register. ORC_TPU_PALLAS_SLICE=0 opts
#: out.
_PALLAS_SLICE = _os.environ.get("ORC_TPU_PALLAS_SLICE", "1") == "1"


#: VMEM ceiling for the slice kernel's shared per-group window
#: (win_rows * 128 lanes * 4 B = win_rows * 512 B). 8192 rows = 4 MiB,
#: leaving headroom for the coef block + outputs inside v5e's ~64 MiB
#: VMEM even with double-buffered blocks. A plan whose RCM bandwidth
#: (or a stray empty tile, see mesh/reorder.py) exceeds this falls back
#: to the XLA path instead of failing Mosaic compilation.
_SLICE_WIN_ROWS_MAX = 8192


def slice_nbr_eligible(plan, x, n_fields: int) -> bool:
    """Gate for the Pallas neighbor-gather kernel
    (ops/pallas_slice.slice_nbr_values) — the irregular-mesh
    replacement for take(x, cell_neighbors) in assembly/gradients.
    Same constraints as the slice SpMV, plus the per-field VMEM window
    (n_fields windows share one run_scoped buffer). Opt out together
    with the slice SpMV via ORC_TPU_PALLAS_SLICE=0."""
    if not _PALLAS_SLICE or plan is None:
        return False
    if plan.win_rows <= 0 or plan.tile % 128 != 0:
        return False
    if getattr(plan, "col_tile", None) is None:
        return False
    if plan.win_rows * max(1, n_fields) > _SLICE_WIN_ROWS_MAX:
        return False
    if x.dtype != jnp.float32:
        return False  # v5e x64-emulation rejects custom calls
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _slice_pallas_eligible(coef, plan, x):
    if not _PALLAS_SLICE or plan.win_rows <= 0 or plan.tile % 128 != 0:
        return False
    if plan.win_rows > _SLICE_WIN_ROWS_MAX:
        return False
    if x.dtype != jnp.float32:
        return False  # v5e x64-emulation rejects custom calls
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def slice_spmv(diag, coef, plan, x):
    """Gather-free SpMV over a slice plan (mesh/reorder.py).

    coef: [..., ntiles, n_max, T] slice-column coefficients (from
    EllMatrix.prepare()); x: [..., C]. On TPU (f32) this dispatches to
    the Pallas window kernel (ops/pallas_slice.py). The XLA fallback
    below (vmapped dynamic_slice) is the portable reference: XLA
    lowers it to a gather with slice_sizes=(T,), which TPU executes at
    element-gather speed — correct everywhere, fast nowhere; it serves
    CPU tests and f64.
    """
    from jax import lax

    if _slice_pallas_eligible(coef, plan, x):
        from orc_tpu.ops.pallas_slice import slice_spmv_pallas

        return slice_spmv_pallas(diag, coef, plan, x)

    T, C = plan.tile, plan.n_cells
    batch = x.shape[:-1]
    xp = jnp.pad(
        x, [(0, 0)] * len(batch) + [(plan.pad_lo, plan.pad_hi)]
    )

    def one(s):
        return lax.dynamic_slice_in_dim(xp, s, T, axis=-1)  # [..., T]

    g = jax.vmap(jax.vmap(one))(plan.starts)  # [ntiles, n_max, ..., T]
    if batch:
        g = jnp.moveaxis(g, tuple(range(2, 2 + len(batch))), tuple(range(len(batch))))
    # [..., ntiles, n_max, T] — matches coef's layout elementwise.
    y_off = jnp.sum(coef * g, axis=-2)  # [..., ntiles, T]
    y_off = y_off.reshape(*batch, plan.ntiles * T)[..., :C]
    return diag * x + y_off
