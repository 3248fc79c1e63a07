"""Pallas TPU kernel for the structured-offset ELL SpMV.

The XLA shift SpMV (ops/spmv.ell_spmv with offsets) re-materializes a
shifted copy of x for each of the K offsets, reading x K+1 times from
HBM (~40% of the HBM roofline at 1M cells f64). This kernel loads each
x window (block + halo) into VMEM once via async DMA and applies all K
shifts as VMEM slices, bringing HBM traffic down to the algorithmic
minimum (diag + off + x + y).

Layout: vectors are viewed as [R, 128] row-major (flat index
i = 128 r + l). A flat shift by d = 128 q + s (s in [0,128)) becomes,
for each output row j, `concat(x[j+q, s:], x[j+q+1, :s])` — two static
lane slices, no gather. x is zero-padded by Hr = ceil(H/128) rows on
each side so halo reads stay in bounds; out-of-range lanes feed zero
coefficients by construction (EllMatrix.offsets contract).

Use `shift_spmv(diag, off, offsets, x)`; it pads, tiles, and calls the
kernel. Interpreter mode (CPU tests) via interpret=True.

NOTE: on TPU backends that emulate f64 (v5e), Pallas custom calls
cannot carry f64 operands (XLA's x64-rewrite pass does not handle
custom calls) — use f32 inputs on hardware; f64 works in interpreter
mode and on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS = 256  # 32k elements per block


def _kernel(offsets, hr, br, diag_ref, off_ref, x_hbm, y_ref):
    # Keep all index math in i32: under jax_enable_x64 stray i64 scalars
    # fail Mosaic legalization.
    r = pl.program_id(0)
    start = pl.multiple_of(r * jnp.int32(br), br)

    def body(xb, sem):
        # Window: rows [r*BR, r*BR + BR + 2*Hr + 1) of the padded x.
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, br + 2 * hr + 1), :],
            xb,
            sem,
        )
        dma.start()
        dma.wait()
        acc = diag_ref[...] * xb[hr : hr + br, :]
        for k, d in enumerate(offsets):
            q, s = divmod(d, LANES)
            base = hr + q
            if s == 0:
                shifted = xb[base : base + br, :]
            else:
                shifted = jnp.concatenate(
                    [
                        xb[base : base + br, s:],
                        xb[base + 1 : base + 1 + br, :s],
                    ],
                    axis=1,
                )
            acc = acc + off_ref[k] * shifted
        y_ref[...] = acc

    pl.run_scoped(
        body,
        pltpu.VMEM((br + 2 * hr + 1, LANES), y_ref.dtype),
        pltpu.SemaphoreType.DMA,
    )


@functools.partial(jax.jit, static_argnames=("offsets", "interpret"))
def shift_spmv(diag, off, offsets: tuple, x, interpret: bool = False):
    """y = diag * x + sum_k off[:, k] * x[i + offsets[k]] (zero beyond
    the ends — callers guarantee off==0 wherever the read would stray).

    diag, x: [C]; off: [C, K]; offsets: static tuple of K ints.
    """
    C = diag.shape[0]
    K = off.shape[1]
    H = max((abs(int(d)) for d in offsets), default=0)
    hr = -(-H // LANES) if H else 1
    R = -(-C // LANES)
    n_blocks = -(-R // BLOCK_ROWS)
    Rp = n_blocks * BLOCK_ROWS
    Cp = Rp * LANES

    def to_rows(v):
        return jnp.pad(v, (0, Cp - C)).reshape(Rp, LANES)

    x_pad = jnp.pad(
        jnp.pad(x, (0, Cp - C)), (hr * LANES, (hr + 1) * LANES)
    ).reshape(Rp + 2 * hr + 1, LANES)
    diag2 = to_rows(diag)
    off2 = jnp.stack(
        [to_rows(off[:, k]) for k in range(K)], axis=0
    )  # [K, Rp, 128]

    kern = functools.partial(
        _kernel, tuple(int(d) for d in offsets), hr, BLOCK_ROWS
    )
    # Index maps must return uniformly-i32 indices: under
    # jax_enable_x64, literal 0 traces as i64 and Mosaic fails to
    # legalize the mixed (i32, i64) index tuple.
    z32 = lambda r: jnp.int32(0)
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Rp, LANES), x.dtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (BLOCK_ROWS, LANES),
                lambda r: (r, z32(r)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (K, BLOCK_ROWS, LANES),
                lambda r: (z32(r), r, z32(r)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (BLOCK_ROWS, LANES),
            lambda r: (r, z32(r)),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(diag2, off2, x_pad)
    return y.reshape(Cp)[:C]
