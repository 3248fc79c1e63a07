"""Pallas TPU kernel for the irregular-mesh slice-plan SpMV.

The XLA lowering of `ops.spmv.slice_spmv` (vmapped dynamic_slice)
degenerates to an ELEMENT gather of [ntiles*n_max, T] — measured on a
v5e chip at the usual ~1.8 GB/s element-gather rate, i.e. ~7000x the
structured shift SpMV and even ~6x WORSE than the plain [C,K] gather
it was meant to replace (scripts/bench_irregular.py, round 3). TPUs
have exactly one fast way to read many small windows at arbitrary
offsets: DMA a covering window into VMEM once and slice it there.

This kernel does that, exploiting the RCM-bounded bandwidth
(mesh/reorder.py): consecutive tiles read from nearby rows of x, so a
group of G=8 tiles shares ONE async-copied window of `plan.win_rows`
rows. Each of the group's slices is then two VMEM rows + a dynamic
lane rotation (`pltpu.roll`) + a lane select — no gather anywhere:

    flat window index  rel = 128*rq + rr
    x[rel : rel+128]   = where(lane < 128-rr,
                               roll(win[rq],   -rr),
                               roll(win[rq+1], -rr))

HBM traffic is coef (the dominant term: [ntiles, n_max, T], the
dense-column layout produced by EllMatrix.prepare()) + one window per
8 tiles + y — within a small factor of the algorithmic minimum, vs the
element-gather rate of the XLA formulations.

f64 cannot use it on v5e (XLA's x64-emulation rewrite rejects custom
calls) — irregular f64 falls back to the XLA gather path. Reference
counterpart: none (the reference's CSR SpMV is cache-friendly on CPU
regardless of ordering, linear_algebra.rs:143-178); this is the
TPU-native answer to unstructured adjacency.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
GROUP = 8  # tiles per grid step (output sublanes per block)


def _kernel(n_max, wr, qmin_ref, rel_ref, coef_ref, x_hbm, y_ref):
    # n_max here is the STATIC per-tile slice count this kernel
    # handles — the full plan n_max, or plan.j0 when the heavy-tail
    # split is active (_kernel_heavy takes the rest). The loop must
    # stay statically unrolled: a dynamic per-tile trip count
    # (lax.fori_loop over SlicePlan.tile_nj) was measured ~14x slower
    # PER SLICE on v5e — Mosaic's dynamic loop around tiny [1,128]
    # ops erases the 5x work saving and then some (round 5).
    g = pl.program_id(0)
    qmin = qmin_ref[g]

    def body(win, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(qmin, wr), :], win, sem
        )
        dma.start()
        dma.wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        # All scalar arithmetic in EXPLICIT i32: a bare Python `128`
        # traces as an i64 operand under the package's x64 default,
        # and Mosaic's i64 convert_element_type lowering recurses
        # infinitely (RecursionError at compile — seen on v5e).
        lanes_i = jnp.int32(LANES)
        for t in range(GROUP):
            acc = jnp.zeros((1, LANES), y_ref.dtype)
            for j in range(n_max):
                rel = rel_ref[t, j]
                rq = jax.lax.div(rel, lanes_i)
                rr = jax.lax.rem(rel, lanes_i)
                pair = win[pl.ds(rq, 2), :]  # rows rq, rq+1
                # roll left by rr: out[i] = row[(i + rr) mod 128]
                rolled = pltpu.roll(
                    pair, jax.lax.rem(lanes_i - rr, lanes_i), axis=1
                )
                sl = jnp.where(
                    lane < lanes_i - rr, rolled[0:1, :], rolled[1:2, :]
                )
                acc = acc + coef_ref[t, j, :].reshape(1, LANES) * sl
            y_ref[t, :] = acc[0]

    pl.run_scoped(
        body,
        pltpu.VMEM((wr, LANES), y_ref.dtype),
        pltpu.SemaphoreType.DMA,
    )


def _kernel_heavy(n_rest, wr, relq_ref, coefB_ref, x_hbm, y_ref):
    """Heavy-tail kernel: slice columns [j0, n_max) of the few tiles
    whose used-slice count exceeds plan.j0 (~10% of tiles on real
    irregular meshes). One group of 8 heavy tiles per grid step; the
    tiles are scattered, so each gets its OWN window DMA.

    relq_ref: SMEM [8, n_rest + 1] — columns 0..n_rest-1 the slice
    starts relative to the tile's own window, column n_rest the
    window's base row (qmin). coefB_ref: VMEM [8, n_rest, LANES]
    (pre-gathered heavy rows of the scaled coef; padding rows zero).
    """
    def body(win, sem):
        for t in range(8):
            # Explicit i32 index: a bare Python int traces as i64
            # under the package's x64 default and fails Mosaic's
            # memref_slice verification.
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(relq_ref[t, n_rest], wr), :],
                win.at[jnp.int32(t)],
                sem,
            )
            dma.start()
            dma.wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        lanes_i = jnp.int32(LANES)
        for t in range(8):
            acc = jnp.zeros((1, LANES), y_ref.dtype)
            for j in range(n_rest):
                rel = relq_ref[t, j]
                rq = jax.lax.div(rel, lanes_i)
                rr = jax.lax.rem(rel, lanes_i)
                pair = win[t, pl.ds(rq, 2), :]
                rolled = pltpu.roll(
                    pair, jax.lax.rem(lanes_i - rr, lanes_i), axis=1
                )
                sl = jnp.where(
                    lane < lanes_i - rr, rolled[0:1, :], rolled[1:2, :]
                )
                acc = acc + coefB_ref[t, j, :].reshape(1, LANES) * sl
            y_ref[t, :] = acc[0]

    pl.run_scoped(
        body,
        pltpu.VMEM((8, wr, LANES), y_ref.dtype),
        pltpu.SemaphoreType.DMA,
    )


@functools.partial(
    jax.jit,
    static_argnames=("tile", "n_max", "win_rows", "j0", "n_heavy",
                     "interpret"),
)
def _slice_spmv_pallas(
    coef,
    starts,
    x_padded,
    tile: int,
    n_max: int,
    win_rows: int,
    j0: int = 0,
    n_heavy: int = 0,
    heavy_ids=None,
    heavy_relq=None,
    interpret: bool = False,
):
    """y_off [ntiles*tile] for one matrix (no diagonal term).

    coef: [ntiles, n_max, tile] slice-column coefficients;
    starts: [ntiles, n_max] i32 slice starts into x_padded;
    x_padded: [pad_lo + C + pad_hi] (plan contract: every slice
    [s, s+tile) is in range).

    j0 > 0 activates the HEAVY-TAIL SPLIT (SlicePlan.j0): the main
    kernel statically iterates only the first j0 slice columns of
    every tile (covering most tiles completely — the per-tile count
    distribution is heavily skewed), and `_kernel_heavy` processes
    columns [j0, n_max) for the `n_heavy` tiles that have more,
    scatter-added into the result. Both kernels stay statically
    unrolled — a dynamic per-tile trip count measured ~14x slower per
    slice on v5e.
    """
    assert tile == LANES
    ntiles = coef.shape[0]
    ngroups = -(-ntiles // GROUP)
    ntp = ngroups * GROUP
    if ntp != ntiles:
        # Replicate the last tile's starts (keeps the group window
        # tight); their coefficients are zero, output rows dropped.
        starts = jnp.concatenate(
            [starts]
            + [starts[-1:]] * (ntp - ntiles),
            axis=0,
        )
        coef = jnp.pad(coef, ((0, ntp - ntiles), (0, 0), (0, 0)))

    q = starts // LANES
    qmin = q.reshape(ngroups, GROUP * n_max).min(axis=1)  # [ngroups]
    rel = (
        starts - jnp.repeat(qmin, GROUP)[:, None] * LANES
    ).astype(jnp.int32)

    # Rows of x covering every window: qmin + win_rows <= n_rows.
    n = x_padded.shape[0]
    nrows = -(-n // LANES) + win_rows
    x2 = jnp.pad(x_padded, (0, nrows * LANES - n)).reshape(nrows, LANES)

    split = j0 > 0 and j0 < n_max and n_heavy > 0
    jA = j0 if split else n_max
    relA = rel[:, :jA] if split else rel

    z32 = lambda g: jnp.int32(0)
    kern = functools.partial(_kernel, jA, win_rows)
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((ntp, LANES), x_padded.dtype),
        grid=(ngroups,),
        in_specs=[
            # qmin [ngroups], whole array per step. The index map MUST
            # be explicit: a mapless SMEM BlockSpec gets Pallas's
            # default map whose literal 0 traces as i64 under the
            # package's x64 default, and Mosaic cannot legalize an
            # i64-returning transform ("failed to legalize func.return
            # (i64)" at compile on v5e).
            pl.BlockSpec(
                (ngroups,), lambda g: (z32(g),), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (GROUP, jA),
                lambda g: (g, z32(g)),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                # Partial column read when split: only [:, :jA, :] of
                # coef ever reaches VMEM (jA is a multiple of 8 by the
                # SlicePlan.j0 contract, satisfying the block rules).
                (GROUP, jA, LANES),
                lambda g: (g, z32(g), z32(g)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (GROUP, LANES),
            lambda g: (g, z32(g)),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(
        qmin.astype(jnp.int32),
        relA,
        coef,
        x2,
    )
    if not split:
        return y.reshape(ntp * LANES)

    # --- heavy tail: columns [j0, n_max) of the n_heavy tiles ---
    n_rest = n_max - j0
    Hp = heavy_ids.shape[0]  # padded to a multiple of 8
    # Pre-gathered heavy coef rows; padding rows zeroed so the padded
    # grid slots contribute nothing.
    coefB = coef[heavy_ids, j0:, :]
    if Hp != n_heavy:
        mask = (jnp.arange(Hp) < n_heavy)[:, None, None]
        coefB = jnp.where(mask, coefB, 0.0)
    kern_b = functools.partial(_kernel_heavy, n_rest, win_rows)
    yB = pl.pallas_call(
        kern_b,
        out_shape=jax.ShapeDtypeStruct((Hp, LANES), x_padded.dtype),
        grid=(Hp // 8,),
        in_specs=[
            pl.BlockSpec(
                (8, n_rest + 1),
                lambda s: (s, z32(s)),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (8, n_rest, LANES),
                lambda s: (s, z32(s), z32(s)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (8, LANES),
            lambda s: (s, z32(s)),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(heavy_relq, coefB, x2)
    y = y.at[heavy_ids[:n_heavy]].add(yB[:n_heavy])
    return y.reshape(ntp * LANES)


def _kernel_wide(n_max, wr, T, qmin_ref, rel_ref, coef_ref, x_hbm, y_ref):
    """Wide-tile SpMV kernel: one tile of T*128 rows per grid step.

    The roll/select/FMA issue ONCE per slice regardless of row count,
    so a T=8 tile retires 8x the outputs of the 128-row kernel per
    slice at the cost of a (T+1)-row rolled block — ~4x fewer VPU
    instructions per cell at the measured n_max inflation
    (mesh/reorder.build_best_slice_plan)."""
    g = pl.program_id(0)
    qmin = qmin_ref[g]
    # rel rows are blocked in groups of 8 (SMEM blocks need the
    # second-to-last dim divisible by 8); this step's row is g % 8.
    row = jax.lax.rem(g, jnp.int32(8))

    def body(win, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(qmin, wr), :], win, sem
        )
        dma.start()
        dma.wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        lanes_i = jnp.int32(LANES)  # see _kernel: scalars MUST be i32
        acc = jnp.zeros((T, LANES), y_ref.dtype)
        for j in range(n_max):
            rel = rel_ref[row, j]
            rq = jax.lax.div(rel, lanes_i)
            rr = jax.lax.rem(rel, lanes_i)
            block = win[pl.ds(rq, T + 1), :]  # rows rq .. rq+T
            rolled = pltpu.roll(
                block, jax.lax.rem(lanes_i - rr, lanes_i), axis=1
            )
            sl = jnp.where(
                lane < lanes_i - rr, rolled[:T, :], rolled[1:, :]
            )  # (T, LANES)
            acc = acc + coef_ref[0, j] * sl
        y_ref[0] = acc

    pl.run_scoped(
        body,
        pltpu.VMEM((wr, LANES), y_ref.dtype),
        pltpu.SemaphoreType.DMA,
    )


@functools.partial(
    jax.jit, static_argnames=("tile", "n_max", "win_rows", "interpret")
)
def _slice_spmv_pallas_wide(
    coef,
    starts,
    x_padded,
    tile: int,
    n_max: int,
    win_rows: int,
    interpret: bool = False,
):
    """Wide-tile variant of _slice_spmv_pallas (tile = T*128, one tile
    per grid step). coef: [ntiles, n_max, tile]."""
    T = tile // LANES
    assert T * LANES == tile and T > 1
    ntiles = coef.shape[0]
    wr = win_rows

    q = starts // LANES
    qmin = q.min(axis=1)  # [ntiles]
    rel = (starts - qmin[:, None] * LANES).astype(jnp.int32)
    # SMEM blocks need the second-to-last dim divisible by 8: pad the
    # rel rows to a multiple of 8 and hand the kernel 8-row blocks.
    nt8 = -(-ntiles // 8) * 8
    rel = jnp.pad(rel, ((0, nt8 - ntiles), (0, 0)))

    n = x_padded.shape[0]
    nrows = -(-n // LANES) + wr
    x2 = jnp.pad(x_padded, (0, nrows * LANES - n)).reshape(nrows, LANES)
    coef4 = coef.reshape(ntiles, n_max, T, LANES)

    z32 = lambda g: jnp.int32(0)
    div8 = lambda g: jax.lax.div(g, jnp.int32(8))
    kern = functools.partial(_kernel_wide, n_max, wr, T)
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (ntiles, T, LANES), x_padded.dtype
        ),
        grid=(ntiles,),
        in_specs=[
            # Explicit index maps: see _slice_spmv_pallas.
            pl.BlockSpec(
                (ntiles,), lambda g: (z32(g),), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (8, n_max),
                lambda g: (div8(g), z32(g)),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, n_max, T, LANES),
                lambda g: (g, z32(g), z32(g), z32(g)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, T, LANES),
            lambda g: (g, z32(g), z32(g)),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(qmin.astype(jnp.int32), rel, coef4, x2)
    return y.reshape(ntiles * tile)


def _nbr_kernel_wide(
    n_max, wr, B, K, T, qmin_ref, rel_ref, col_ref, x_hbm, out_ref
):
    """Wide-tile neighbor-VALUE kernel (cf. _nbr_kernel): one T*128-row
    tile per step; col_ref [1, K, T, LANES]; out [B, K, 1, T, LANES]."""
    g = pl.program_id(0)
    qmin = qmin_ref[g]
    row = jax.lax.rem(g, jnp.int32(8))  # see _kernel_wide

    def body(win, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(qmin, wr), :], win, sem
        )
        dma.start()
        dma.wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), 2)
        lanes_i = jnp.int32(LANES)
        acc = [
            jnp.zeros((K, T, LANES), out_ref.dtype) for _ in range(B)
        ]
        col = col_ref[0]  # (K, T, LANES)
        for j in range(n_max):
            rel = rel_ref[row, j]
            rq = jax.lax.div(rel, lanes_i)
            rr = jax.lax.rem(rel, lanes_i)
            shift = jax.lax.rem(lanes_i - rr, lanes_i)
            keep = lane < lanes_i - rr  # (1, 1, LANES)
            mask = col == jnp.int32(j)  # (K, T, LANES)
            for b in range(B):
                block = win[b, pl.ds(rq, T + 1), :]
                rolled = pltpu.roll(block, shift, axis=1)
                sl = jnp.where(
                    keep, rolled[:T, :][None], rolled[1:, :][None]
                )  # (1, T, LANES)
                acc[b] = jnp.where(mask, sl, acc[b])
        for b in range(B):
            out_ref[b, :, 0] = acc[b]

    pl.run_scoped(
        body,
        pltpu.VMEM((B, wr, LANES), out_ref.dtype),
        pltpu.SemaphoreType.DMA,
    )


@functools.partial(
    jax.jit,
    static_argnames=("tile", "n_max", "win_rows", "interpret"),
)
def _slice_nbr_pallas_wide(
    col_tile,
    starts,
    x_padded,
    tile: int,
    n_max: int,
    win_rows: int,
    interpret: bool = False,
):
    """Wide-tile variant of _slice_nbr_pallas. col_tile: [ntiles, K,
    tile]; x_padded: [B, ...]; returns [B, K, ntiles*tile]."""
    T = tile // LANES
    assert T * LANES == tile and T > 1
    B = x_padded.shape[0]
    ntiles, K, _ = col_tile.shape
    wr = win_rows

    q = starts // LANES
    qmin = q.min(axis=1)
    rel = (starts - qmin[:, None] * LANES).astype(jnp.int32)
    nt8 = -(-ntiles // 8) * 8  # see _slice_spmv_pallas_wide
    rel = jnp.pad(rel, ((0, nt8 - ntiles), (0, 0)))

    n = x_padded.shape[1]
    nrows = -(-n // LANES) + wr
    x2 = jnp.pad(
        x_padded, ((0, 0), (0, nrows * LANES - n))
    ).reshape(B, nrows, LANES)
    col4 = col_tile.reshape(ntiles, K, T, LANES)

    z32 = lambda g: jnp.int32(0)
    div8 = lambda g: jax.lax.div(g, jnp.int32(8))
    kern = functools.partial(_nbr_kernel_wide, n_max, wr, B, K, T)
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (B, K, ntiles, T, LANES), x_padded.dtype
        ),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(
                (ntiles,), lambda g: (z32(g),), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (8, n_max),
                lambda g: (div8(g), z32(g)),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, K, T, LANES),
                lambda g: (g, z32(g), z32(g), z32(g)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (B, K, 1, T, LANES),
            lambda g: (z32(g), z32(g), g, z32(g), z32(g)),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(qmin.astype(jnp.int32), rel, col4, x2)
    return y.reshape(B, K, ntiles * tile)


def _vmappable_kernel(plan, interpret):
    """The kernel call wrapped in a custom vmap rule: `jax.vmap`
    (the [3,C] batched momentum solve, solver/simple.py) unrolls into
    per-element calls of the UNBATCHED Mosaic lowering instead of
    relying on Mosaic's automatic batched lowering of a kernel with a
    memory_space=ANY operand + manual run_scoped DMA, which is
    unexercised on hardware (ADVICE r3). The batch is a small static
    constant (3), so unrolling is the right lowering anyway."""
    kw = dict(
        tile=plan.tile,
        n_max=plan.n_max,
        win_rows=plan.win_rows,
        interpret=interpret,
    )
    wide = plan.tile != LANES
    j0 = int(getattr(plan, "j0", 0) or 0)
    n_heavy = int(getattr(plan, "n_heavy", 0) or 0)

    from jax.custom_batching import custom_vmap

    # The heavy-split arrays ride as explicit arguments (like starts):
    # under jit the plan arrays are TRACERS, and custom_vmap cannot
    # close over a tracer ("No constant handler for
    # DynamicJaxprTracer").
    @custom_vmap
    def y_off(coef, starts, hids, hrelq, xp):
        if wide:
            return _slice_spmv_pallas_wide(coef, starts, xp, **kw)
        return _slice_spmv_pallas(
            coef, starts, xp, j0=j0, n_heavy=n_heavy,
            heavy_ids=hids, heavy_relq=hrelq, **kw,
        )

    @y_off.def_vmap
    def _rule(axis_size, in_batched, coef, starts, hids, hrelq, xp):
        cb, sb, hb, rb, xb = in_batched
        outs = [
            y_off(
                coef[i] if cb else coef,
                starts[i] if sb else starts,
                hids[i] if hb else hids,
                hrelq[i] if rb else hrelq,
                xp[i] if xb else xp,
            )
            for i in range(axis_size)
        ]
        return jnp.stack(outs), True

    def call(coef, starts, xp):
        hids = getattr(plan, "heavy_ids", None)
        hrelq = getattr(plan, "heavy_relq", None)
        if hids is None:  # no split — dummies keep the arity fixed
            hids = jnp.zeros((8,), jnp.int32)
            hrelq = jnp.zeros((8, 2), jnp.int32)
        return y_off(coef, starts, hids, hrelq, xp)

    return call


def _nbr_kernel(
    n_max, wr, B, K, qmin_ref, rel_ref, col_ref, x_hbm, out_ref
):
    """Neighbor-VALUE variant of `_kernel`: instead of accumulating
    coef*slice into one output row, it routes each tile's rotated
    slices to their ELL slots via the per-tile column table.

    col_ref: [GROUP, K, LANES] i32 — slice column j of ELL slot (k, c)
    (SlicePlan.col_tile); out_ref: [B, K, GROUP, LANES]."""
    g = pl.program_id(0)
    qmin = qmin_ref[g]

    def body(win, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(qmin, wr), :], win, sem
        )
        dma.start()
        dma.wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        lanes_i = jnp.int32(LANES)  # see _kernel: scalars MUST be i32
        for t in range(GROUP):
            col = col_ref[t]  # (K, LANES) i32
            acc = [
                jnp.zeros((K, LANES), out_ref.dtype) for _ in range(B)
            ]
            for j in range(n_max):
                rel = rel_ref[t, j]
                rq = jax.lax.div(rel, lanes_i)
                rr = jax.lax.rem(rel, lanes_i)
                shift = jax.lax.rem(lanes_i - rr, lanes_i)
                keep = lane < lanes_i - rr
                mask = col == jnp.int32(j)  # (K, LANES)
                for b in range(B):
                    pair = win[b, pl.ds(rq, 2), :]  # rows rq, rq+1
                    rolled = pltpu.roll(pair, shift, axis=1)
                    sl = jnp.where(
                        keep, rolled[0:1, :], rolled[1:2, :]
                    )  # (1, LANES)
                    acc[b] = jnp.where(mask, sl, acc[b])
            for b in range(B):
                out_ref[b, :, t, :] = acc[b]

    pl.run_scoped(
        body,
        pltpu.VMEM((B, wr, LANES), out_ref.dtype),
        pltpu.SemaphoreType.DMA,
    )


@functools.partial(
    jax.jit,
    static_argnames=("tile", "n_max", "win_rows", "interpret"),
)
def _slice_nbr_pallas(
    col_tile,
    starts,
    x_padded,
    tile: int,
    n_max: int,
    win_rows: int,
    interpret: bool = False,
):
    """Neighbor values [B, K, ntp*tile] for B fields at once.

    col_tile: [ntiles, K, tile] i32 (SlicePlan.col_tile);
    starts: [ntiles, n_max] i32; x_padded: [B, pad_lo + C + pad_hi].
    Non-interior slots (column 0 in col_tile) return arbitrary window
    data — the caller overwrites them with the own-cell value."""
    assert tile == LANES
    B = x_padded.shape[0]
    ntiles, K, _ = col_tile.shape
    ngroups = -(-ntiles // GROUP)
    ntp = ngroups * GROUP
    if ntp != ntiles:
        starts = jnp.concatenate(
            [starts] + [starts[-1:]] * (ntp - ntiles), axis=0
        )
        col_tile = jnp.pad(
            col_tile, ((0, ntp - ntiles), (0, 0), (0, 0))
        )

    q = starts // LANES
    qmin = q.reshape(ngroups, GROUP * n_max).min(axis=1)  # [ngroups]
    rel = (
        starts - jnp.repeat(qmin, GROUP)[:, None] * LANES
    ).astype(jnp.int32)

    n = x_padded.shape[1]
    nrows = -(-n // LANES) + win_rows
    x2 = jnp.pad(
        x_padded, ((0, 0), (0, nrows * LANES - n))
    ).reshape(B, nrows, LANES)

    z32 = lambda g: jnp.int32(0)
    kern = functools.partial(_nbr_kernel, n_max, win_rows, B, K)
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (B, K, ntp, LANES), x_padded.dtype
        ),
        grid=(ngroups,),
        in_specs=[
            # Explicit index maps: see _slice_spmv_pallas (a mapless
            # SMEM spec's default map traces i64 under x64).
            pl.BlockSpec(
                (ngroups,), lambda g: (z32(g),), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (GROUP, n_max),
                lambda g: (g, z32(g)),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (GROUP, K, LANES),
                lambda g: (g, z32(g), z32(g)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (B, K, GROUP, LANES),
            lambda g: (z32(g), z32(g), g, z32(g)),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(qmin.astype(jnp.int32), rel, col_tile, x2)
    return y.reshape(B, K, ntp * LANES)


def slice_nbr_values(plan, x, interpret: bool = False):
    """Neighbor-cell values x[nbr[c,k]] -> [C, K, *rest] over a slice
    plan — the gather-free replacement for `take(x, cell_neighbors)`
    on irregular meshes (kernel path of ops.ck_ops.nbr_values).

    x: [C, *rest] (rest flattened into the kernel's field batch).
    Values at non-interior ELL slots are arbitrary — the caller must
    overwrite them with the own-cell value (nbr_values does)."""
    C = plan.n_cells
    rest = x.shape[1:]
    flat = x.reshape(C, -1).T  # [B, C]
    xp = jnp.pad(flat, ((0, 0), (plan.pad_lo, plan.pad_hi)))
    impl = (
        _slice_nbr_pallas if plan.tile == LANES else _slice_nbr_pallas_wide
    )
    kw = dict(
        tile=plan.tile,
        n_max=plan.n_max,
        win_rows=plan.win_rows,
        interpret=interpret,
    )

    # Same custom-vmap treatment as _vmappable_kernel: jax.vmap over
    # this call unrolls into per-element UNBATCHED Mosaic lowerings
    # instead of relying on automatic batching of a kernel with manual
    # run_scoped DMA (unexercised on hardware).
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def nbr(col_tile, starts, xb):
        return impl(col_tile, starts, xb, **kw)

    @nbr.def_vmap
    def _rule(axis_size, in_batched, col_tile, starts, xb):
        cb, sb, bb = in_batched
        outs = [
            nbr(
                col_tile[i] if cb else col_tile,
                starts[i] if sb else starts,
                xb[i] if bb else xb,
            )
            for i in range(axis_size)
        ]
        return jnp.stack(outs), True

    y = nbr(plan.col_tile, plan.starts, xp)[:, :, :C]  # [B, K, C]
    K = y.shape[1]
    return jnp.transpose(y, (2, 1, 0)).reshape((C, K) + rest)


def slice_spmv_pallas(diag, coef, plan, x, interpret: bool = False):
    """y = diag*x + slice-plan off-diagonal product, kernel path.

    Handles leading batch dims by looping (the batch is a small static
    constant — the [3,C] momentum systems); batching introduced by
    jax.vmap takes the same per-element route via _vmappable_kernel."""
    batch = x.shape[:-1]
    C = plan.n_cells
    if batch:
        import numpy as np

        flat_x = x.reshape((-1, C))
        flat_c = coef.reshape((-1,) + coef.shape[-3:])
        ys = [
            slice_spmv_pallas(
                jnp.zeros((C,), x.dtype), flat_c[b], plan, flat_x[b],
                interpret=interpret,
            )
            for b in range(int(np.prod(batch)))
        ]
        return diag * x + jnp.stack(ys).reshape(*batch, C)
    xp = jnp.pad(x, (plan.pad_lo, plan.pad_hi))
    y_off = _vmappable_kernel(plan, interpret)(coef, plan.starts, xp)[:C]
    return diag * x + y_off


# ---------------------------------------------------------------------
# Exact-accumulation (error-tracked) slice SpMV — the df32 residual
# kernel. v5e rejects f64 Pallas operands, so an f64-ACCURACY irregular
# solve cannot run its SpMV in this kernel family directly; instead the
# iterative-refinement path (solver/refine.py) computes its
# high-precision residual from f32 planes:
#
#     A x = (Ah + Al)(xh + xl)
#         = [Ah xh exact]  +  Ah xl  +  Al xh  (+ Al xl ~ 2^-48, drop)
#
# where the dominant Ah xh term is produced HERE with every product an
# error-free two-product (Dekker) and every accumulation an error-free
# two-sum (Knuth), the rounding errors collected into a second output
# plane. ~6x the VPU work of the plain kernel — used once per
# refinement step, not per Krylov iteration. Reference counterpart:
# none (the reference is f64 CPU throughout, lib.rs:213).
# ---------------------------------------------------------------------


def _kernel_exact(
    n_max, wr, qmin_ref, rel_ref, coef_ref, x_hbm, y_ref, e_ref
):
    from orc_tpu.ops.df32 import two_prod, two_sum

    g = pl.program_id(0)
    qmin = qmin_ref[g]

    def body(win, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(qmin, wr), :], win, sem
        )
        dma.start()
        dma.wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        lanes_i = jnp.int32(LANES)  # see _kernel: scalars MUST be i32
        for t in range(GROUP):
            acc = jnp.zeros((1, LANES), y_ref.dtype)
            err = jnp.zeros((1, LANES), y_ref.dtype)
            for j in range(n_max):
                rel = rel_ref[t, j]
                rq = jax.lax.div(rel, lanes_i)
                rr = jax.lax.rem(rel, lanes_i)
                pair = win[pl.ds(rq, 2), :]
                rolled = pltpu.roll(
                    pair, jax.lax.rem(lanes_i - rr, lanes_i), axis=1
                )
                sl = jnp.where(
                    lane < lanes_i - rr, rolled[0:1, :], rolled[1:2, :]
                )
                ph, pe = two_prod(coef_ref[t, j, :].reshape(1, LANES), sl)
                acc, te = two_sum(acc, ph)
                err = err + (te + pe)
            y_ref[t, :] = acc[0]
            e_ref[t, :] = err[0]

    pl.run_scoped(
        body,
        pltpu.VMEM((wr, LANES), y_ref.dtype),
        pltpu.SemaphoreType.DMA,
    )


def _kernel_wide_exact(
    n_max, wr, T, qmin_ref, rel_ref, coef_ref, x_hbm, y_ref, e_ref
):
    from orc_tpu.ops.df32 import two_prod, two_sum

    g = pl.program_id(0)
    qmin = qmin_ref[g]
    row = jax.lax.rem(g, jnp.int32(8))  # see _kernel_wide

    def body(win, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(qmin, wr), :], win, sem
        )
        dma.start()
        dma.wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        lanes_i = jnp.int32(LANES)
        acc = jnp.zeros((T, LANES), y_ref.dtype)
        err = jnp.zeros((T, LANES), y_ref.dtype)
        for j in range(n_max):
            rel = rel_ref[row, j]
            rq = jax.lax.div(rel, lanes_i)
            rr = jax.lax.rem(rel, lanes_i)
            block = win[pl.ds(rq, T + 1), :]
            rolled = pltpu.roll(
                block, jax.lax.rem(lanes_i - rr, lanes_i), axis=1
            )
            sl = jnp.where(
                lane < lanes_i - rr, rolled[:T, :], rolled[1:, :]
            )
            ph, pe = two_prod(coef_ref[0, j], sl)
            acc, te = two_sum(acc, ph)
            err = err + (te + pe)
        y_ref[0] = acc
        e_ref[0] = err

    pl.run_scoped(
        body,
        pltpu.VMEM((wr, LANES), y_ref.dtype),
        pltpu.SemaphoreType.DMA,
    )


@functools.partial(
    jax.jit, static_argnames=("tile", "n_max", "win_rows", "interpret")
)
def _slice_spmv_exact(
    coef,
    starts,
    x_padded,
    tile: int,
    n_max: int,
    win_rows: int,
    interpret: bool = False,
):
    """(y_off, err) with y_off + err == the EXACT per-row sum of
    coef * x slice products to first order (see module note above).
    Mirrors _slice_spmv_pallas / _slice_spmv_pallas_wide."""
    if tile == LANES:
        ntiles = coef.shape[0]
        ngroups = -(-ntiles // GROUP)
        ntp = ngroups * GROUP
        if ntp != ntiles:
            starts = jnp.concatenate(
                [starts] + [starts[-1:]] * (ntp - ntiles), axis=0
            )
            coef = jnp.pad(coef, ((0, ntp - ntiles), (0, 0), (0, 0)))
        q = starts // LANES
        qmin = q.reshape(ngroups, GROUP * n_max).min(axis=1)
        rel = (
            starts - jnp.repeat(qmin, GROUP)[:, None] * LANES
        ).astype(jnp.int32)
        n = x_padded.shape[0]
        nrows = -(-n // LANES) + win_rows
        x2 = jnp.pad(x_padded, (0, nrows * LANES - n)).reshape(
            nrows, LANES
        )
        z32 = lambda g: jnp.int32(0)
        kern = functools.partial(_kernel_exact, n_max, win_rows)
        y, e = pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((ntp, LANES), x_padded.dtype),
                jax.ShapeDtypeStruct((ntp, LANES), x_padded.dtype),
            ),
            grid=(ngroups,),
            in_specs=[
                pl.BlockSpec(
                    (ngroups,), lambda g: (z32(g),),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (GROUP, n_max),
                    lambda g: (g, z32(g)),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec(
                    (GROUP, n_max, LANES),
                    lambda g: (g, z32(g), z32(g)),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec(
                    (GROUP, LANES), lambda g: (g, z32(g)),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (GROUP, LANES), lambda g: (g, z32(g)),
                    memory_space=pltpu.VMEM,
                ),
            ),
            interpret=interpret,
        )(
            qmin.astype(jnp.int32),
            rel,
            coef,
            x2,
        )
        return y.reshape(ntp * LANES), e.reshape(ntp * LANES)

    T = tile // LANES
    assert T * LANES == tile and T > 1
    ntiles = coef.shape[0]
    wr = win_rows
    q = starts // LANES
    qmin = q.min(axis=1)
    rel = (starts - qmin[:, None] * LANES).astype(jnp.int32)
    nt8 = -(-ntiles // 8) * 8
    rel = jnp.pad(rel, ((0, nt8 - ntiles), (0, 0)))
    n = x_padded.shape[0]
    nrows = -(-n // LANES) + wr
    x2 = jnp.pad(x_padded, (0, nrows * LANES - n)).reshape(nrows, LANES)
    coef4 = coef.reshape(ntiles, n_max, T, LANES)
    z32 = lambda g: jnp.int32(0)
    div8 = lambda g: jax.lax.div(g, jnp.int32(8))
    kern = functools.partial(_kernel_wide_exact, n_max, wr, T)
    y, e = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((ntiles, T, LANES), x_padded.dtype),
            jax.ShapeDtypeStruct((ntiles, T, LANES), x_padded.dtype),
        ),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(
                (ntiles,), lambda g: (z32(g),), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (8, n_max),
                lambda g: (div8(g), z32(g)),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, n_max, T, LANES),
                lambda g: (g, z32(g), z32(g), z32(g)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, T, LANES),
                lambda g: (g, z32(g), z32(g)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, T, LANES),
                lambda g: (g, z32(g), z32(g)),
                memory_space=pltpu.VMEM,
            ),
        ),
        interpret=interpret,
    )(qmin.astype(jnp.int32), rel, coef4, x2)
    return y.reshape(ntiles * tile), e.reshape(ntiles * tile)


def slice_spmv_exact(coef, plan, x, interpret: bool = False):
    """Error-tracked off-diagonal slice product for the df32 residual:
    returns (y, err) with y + err the first-order-exact row sums of
    coef * x over the slice plan (no diagonal term). x: [C] f32."""
    C = plan.n_cells
    xp = jnp.pad(x, (plan.pad_lo, plan.pad_hi))
    y, e = _slice_spmv_exact(
        coef, plan.starts, xp,
        tile=plan.tile, n_max=plan.n_max, win_rows=plan.win_rows,
        interpret=interpret,
    )
    return y[:C], e[:C]
