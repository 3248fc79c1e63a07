"""Fused multi-sweep Jacobi smoother — one Pallas pass per solve.

The fixed-count damped-Jacobi smoother (krylov.jacobi_smooth_solve, the
warm-started momentum/transport solver under implicit relaxation —
reference counterpart: the smoother loop, linear_algebra.rs:172-218)
costs one full HBM pass over (x, b', diag, off) per sweep in XLA: the
rolls materialize shifted copies of x and the sweep arithmetic is a
separate fusion (measured ~15 ms/iter for 6 sweeps x 3 components at
9.4M cells, profile_trace.py while.75). This kernel runs ALL sweeps in
one pass using sweep-deep halo windows (temporal blocking): each block
loads x/b/coefficient windows of `br + sweeps*(hr + hr + 1)` rows into
VMEM once, iterates the sweeps in registers with the valid region
shrinking by one halo per sweep, and writes only the final `br` rows.
HBM traffic drops from `sweeps` passes to ~1 window-read + 1 write —
the redundant halo recompute is VPU-cheap.

Semantics are bit-identical to the XLA path modulo FMA contraction:
the same `(diag*x + sum_k off_k*shift_k) - diag*x` off-diagonal form,
the same single `1/diag` and `b*inv_diag` precomputations, the same
k-order accumulation. Out-of-range shift reads hit zero padding where
the XLA rolls wrap around — both are multiplied by the zero
coefficients the EllMatrix offsets contract guarantees at the ends.

Batched systems ([B,C] momentum u/v/w over a SHARED matrix) run as one
kernel with B x-windows; `jax.vmap` over the unbatched call routes to
that batched kernel via custom_vmap (component-dependent matrices fall
back to the XLA sweeps).

v5e cannot take f64 Pallas operands (x64-emulation rewrite skips
custom calls) — f64 and CPU runs use the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS = 512
#: Below this the dispatch/pad overhead beats the traffic saving.
MIN_CELLS = 262144

import os as _os

_ENABLED = _os.environ.get("ORC_TPU_PALLAS_SMOOTH", "1") == "1"


def sweeps_xla(diag, off, offsets, b, x0, sweeps: int, relaxation):
    """The reference XLA formulation (krylov.jacobi_smooth_solve's
    loop body, broadcasting over any leading batch dims)."""
    split = isinstance(off, tuple)
    inv_diag = 1.0 / diag
    b_prime = b * inv_diag

    def mv_off(x):
        y = diag * x
        for k, d in enumerate(offsets):
            xk = jnp.roll(x, -d, axis=-1) if d != 0 else x
            col = off[k] if split else off[..., k]
            y = y + col * xk
        return y - diag * x

    def sweep(_, x):
        return relaxation * (b_prime - mv_off(x) * inv_diag) + (
            1.0 - relaxation
        ) * x

    return jax.lax.fori_loop(0, sweeps, sweep, x0)


def eligible(diag, off, offsets, x0, sweeps, relaxation) -> bool:
    """Gate for the fused kernel (called with possibly-vmapped
    tracers: shapes are the per-element logical shapes)."""
    if not _ENABLED or offsets is None or sweeps < 1:
        return False
    if not isinstance(relaxation, (int, float)):
        return False  # traced relaxation: keep the XLA loop
    if diag.dtype != jnp.float32 or diag.ndim != 1:
        return False
    if diag.shape[-1] < MIN_CELLS:
        return False
    H = max((abs(int(d)) for d in offsets), default=0)
    hr = -(-H // LANES) if H else 1
    # Window must stay a small multiple of the block (redundant halo
    # compute and VMEM both scale with sweeps*hr).
    if sweeps * (2 * hr + 1) > 2 * BLOCK_ROWS:
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _kernel(
    offsets, sweeps, relax, hr, br, W, B, K,
    dg_hbm, off_hbm, b_hbm, x_hbm, y_ref,
):
    r = pl.program_id(0)
    start = pl.multiple_of(r * jnp.int32(br), br)

    def body(dgw, offw, bw, xa, xb, sem):
        for src_ref, buf in (
            (dg_hbm.at[pl.ds(start, W), :], dgw),
            (off_hbm.at[:, pl.ds(start, W), :], offw),
            (b_hbm.at[:, pl.ds(start, W), :], bw),
            (x_hbm.at[:, pl.ds(start, W), :], xa),
        ):
            dma = pltpu.make_async_copy(src_ref, buf, sem)
            dma.start()
            dma.wait()

        inv_d = 1.0 / dgw[...]
        bufs = [xa, xb]
        for s in range(sweeps):
            src, dst = bufs[s % 2], bufs[(s + 1) % 2]
            lo = (s + 1) * hr
            hi = W - (s + 1) * (hr + 1)
            L = hi - lo
            dg_c = dgw[lo:hi, :]
            inv_c = inv_d[lo:hi, :]
            for comp in range(B):
                x_c = src[comp, lo:hi, :]
                mv = dg_c * x_c
                for k, d in enumerate(offsets):
                    q, sl = divmod(d, LANES)
                    base = lo + q
                    if sl == 0:
                        shifted = src[comp, base : base + L, :]
                    else:
                        shifted = jnp.concatenate(
                            [
                                src[comp, base : base + L, sl:],
                                src[comp, base + 1 : base + 1 + L, :sl],
                            ],
                            axis=1,
                        )
                    mv = mv + offw[k, lo:hi, :] * shifted
                ax_off = mv - dg_c * x_c
                b_prime = bw[comp, lo:hi, :] * inv_c
                dst[comp, lo:hi, :] = (
                    relax * (b_prime - ax_off * inv_c)
                    + (1.0 - relax) * x_c
                )
        final = bufs[sweeps % 2]
        s_lo = sweeps * hr
        y_ref[...] = final[:, s_lo : s_lo + br, :]

    pl.run_scoped(
        body,
        pltpu.VMEM((W, LANES), y_ref.dtype),
        pltpu.VMEM((K, W, LANES), y_ref.dtype),
        pltpu.VMEM((B, W, LANES), y_ref.dtype),
        pltpu.VMEM((B, W, LANES), y_ref.dtype),
        pltpu.VMEM((B, W, LANES), y_ref.dtype),
        pltpu.SemaphoreType.DMA,
    )


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "sweeps", "relaxation", "interpret"),
)
def _fused_batched(
    diag, off_cols, b, x0, *, offsets, sweeps, relaxation, interpret
):
    """sweeps of damped Jacobi on [B,C] systems sharing (diag, off).

    off_cols: K-tuple of [C] columns (EllMatrix.split_columns form)."""
    C = diag.shape[0]
    B = b.shape[0]
    K = len(offsets)
    H = max((abs(int(d)) for d in offsets), default=0)
    hr = -(-H // LANES) if H else 1
    s_lo = sweeps * hr
    s_hi = sweeps * (hr + 1)
    R = -(-C // LANES)
    n_blocks = -(-R // BLOCK_ROWS)
    Rp = n_blocks * BLOCK_ROWS
    Cp = Rp * LANES
    W = BLOCK_ROWS + s_lo + s_hi

    def rows(v, fill):
        return jnp.pad(
            v,
            ((s_lo * LANES, Cp - C + s_hi * LANES),),
            constant_values=fill,
        ).reshape(Rp + s_lo + s_hi, LANES)

    def rows_b(v, fill):
        return jnp.pad(
            v,
            ((0, 0), (s_lo * LANES, Cp - C + s_hi * LANES)),
            constant_values=fill,
        ).reshape(B, Rp + s_lo + s_hi, LANES)

    # Padded rows get identity equations (diag 1, off 0, b 0, x 0):
    # their sweep iterates stay exactly 0 and real rows never read
    # them through a nonzero coefficient.
    dg = rows(diag, 1.0)
    offp = jnp.stack([rows(c, 0.0) for c in off_cols], axis=0)
    bp = rows_b(b, 0.0)
    xp = rows_b(x0, 0.0)

    kern = functools.partial(
        _kernel,
        tuple(int(d) for d in offsets),
        sweeps,
        float(relaxation),
        hr,
        BLOCK_ROWS,
        W,
        B,
        K,
    )
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Rp, LANES), x0.dtype),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec(
            (B, BLOCK_ROWS, LANES),
            lambda r: (jnp.int32(0), r, jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(dg, offp, bp, xp)
    return y.reshape(B, Cp)[:, :C]


def fused_jacobi_sweeps(
    diag, off, offsets, b, x0, sweeps: int, relaxation,
    interpret: bool = False,
):
    """Drop-in for the jacobi_smooth_solve sweep loop: `sweeps` damped
    Jacobi sweeps of (diag, off, offsets) on b with initial x0.

    Dispatches to the fused Pallas kernel when eligible; under
    jax.vmap with a SHARED matrix (diag/off unbatched) the whole batch
    runs as one kernel. Everything else falls back to sweeps_xla."""
    if not eligible(diag, off, offsets, x0, sweeps, relaxation):
        return sweeps_xla(diag, off, offsets, b, x0, sweeps, relaxation)
    if isinstance(off, tuple):
        off_cols = off
    else:
        off_cols = tuple(off[..., k] for k in range(off.shape[-1]))
    if any(c.ndim != 1 for c in off_cols):
        return sweeps_xla(diag, off, offsets, b, x0, sweeps, relaxation)

    from jax.custom_batching import custom_vmap

    kw = dict(
        offsets=tuple(int(d) for d in offsets),
        sweeps=int(sweeps),
        relaxation=float(relaxation),
        interpret=interpret,
    )

    @custom_vmap
    def fs(diag, off_cols, b, x0):
        return _fused_batched(diag, off_cols, b[None], x0[None], **kw)[0]

    @fs.def_vmap
    def _rule(axis_size, in_batched, diag, off_cols, b, x0):
        d_b = jax.tree_util.tree_leaves(in_batched[0])
        o_b = jax.tree_util.tree_leaves(in_batched[1])
        b_b = jax.tree_util.tree_leaves(in_batched[2])
        x_b = jax.tree_util.tree_leaves(in_batched[3])
        shared = not any(d_b) and not any(o_b)
        if shared and all(b_b) and all(x_b):
            return _fused_batched(diag, off_cols, b, x0, **kw), True
        # Partially-batched (component-dependent matrix): XLA sweeps
        # broadcast across whatever is batched.
        bc = lambda a, isb: a if isb else a[None]
        off_a = tuple(
            bc(c, ib)
            for c, ib in zip(off_cols, jax.tree_util.tree_leaves(in_batched[1]))
        ) if isinstance(off_cols, tuple) else off_cols
        y = sweeps_xla(
            bc(diag, any(d_b)),
            off_a,
            kw["offsets"],
            bc(b, all(b_b)),
            bc(x0, all(x_b)),
            kw["sweeps"],
            kw["relaxation"],
        )
        return y, True

    if b.ndim == 1:
        return fs(diag, off_cols, b, x0)
    return _fused_batched(diag, off_cols, b, x0, **kw)
