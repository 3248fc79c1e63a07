"""Cell reordering + slice-plan construction for irregular meshes.

The structured fast path (EllMatrix.offsets -> circular-shift SpMV)
requires every ELL column to have a constant neighbor index delta.
Genuinely irregular meshes (the reference's native mesh class,
io.rs:32-515 / mesh.rs:140-179) have no such structure, and TPU's
dynamic element gathers are ~400x slower than shifts (BASELINE.md).

This module recovers most of the shift path's performance for ANY mesh:

1. **Reverse Cuthill-McKee ordering** bounds the adjacency bandwidth to
   ~O(sqrt(C)) for planar / O(C^(2/3)) for volumetric meshes: after
   reordering, every neighbor of cell c lies within a small index
   window of c.
2. **Slice plan**: cells are grouped into tiles of T consecutive rows.
   Within one tile the (neighbor - cell) deltas concentrate onto a few
   dozen distinct values (measured: ~33 distinct deltas per 128-row
   tile on a 100k-cell random-triangulated box, vs 786 globally). The
   SpMV then becomes, per tile, a sum over its distinct deltas d of

       y[tile] += coef_d[tile] * x[tile_start + d : tile_start + d + T]

   i.e. *contiguous dynamic slices* of x (gather-with-slice-size-T,
   which XLA/TPU executes at near-DMA speed) times dense coefficient
   columns -- no element gather anywhere, and coverage of every matrix
   entry is exact by construction (out-of-range slice starts are
   absorbed by zero padding of x).

The reference has no counterpart (its CSR SpMV is cache-friendly on
CPU regardless of ordering); this is the TPU-native answer to the same
problem.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SlicePlan:
    """Static per-tile slice schedule for an ELL matrix.

    starts:  [ntiles, n_max] i32 -- start of each slice in the PADDED
             x vector (pad_lo zeros prepended); unused columns repeat
             the tile's first used start (keeping the per-tile window
             tight for the Pallas kernel) and carry zero coefficients.
    col_of:  [C, K] i32 -- slice column j of each ELL entry (tile-local);
             boundary/padded entries map to column 0, where their zero
             coefficients are harmlessly accumulated.
    win_rows: static row count of the shared VMEM window the Pallas
             slice kernel (ops/pallas_slice.py) DMAs per GROUP of
             tiles: max over groups of the slice row span, + 2.
    """

    starts: jax.Array
    col_of: jax.Array
    tile: int = dataclasses.field(metadata=dict(static=True))
    n_max: int = dataclasses.field(metadata=dict(static=True))
    pad_lo: int = dataclasses.field(metadata=dict(static=True))
    pad_hi: int = dataclasses.field(metadata=dict(static=True))
    n_cells: int = dataclasses.field(metadata=dict(static=True))
    win_rows: int = dataclasses.field(
        default=0, metadata=dict(static=True)
    )
    #: [ntiles, K, tile] i32 — col_of transposed to the kernel-tile
    #: layout consumed by the Pallas neighbor-gather kernel
    #: (ops/pallas_slice.slice_nbr_values). Only materialized when
    #: build_slice_plan(build_col_tile=True) — the mesh-compile path;
    #: None disables that kernel (AMG coarse plans and f64/CPU meshes
    #: never gather neighbor values, so they skip the ~C*K*4 B buffer).
    col_tile: "jax.Array | None" = None
    #: [ntiles] i32 — per-tile count of USED slice columns. n_max is
    #: the worst tile; the distribution is heavily skewed (measured on
    #: the permuted 448^2 cavity: mean 5.1, median 4, max 33).
    #: Informational — the kernels exploit the skew via the STATIC
    #: heavy-tail split below (a dynamic per-tile trip count measured
    #: ~14x slower per slice on v5e).
    tile_nj: "jax.Array | None" = None
    #: Heavy-tail split (tile == 128 plans): the main SpMV kernel
    #: statically iterates only slice columns [0, j0) of every tile
    #: (j0 a multiple of 8, chosen so most tiles are fully covered);
    #: columns [j0, n_max) of the n_heavy tiles that exceed it run in
    #: a second small kernel over heavy_ids/heavy_relq and are
    #: scatter-added. j0 == 0 disables the split (static n_max loop).
    j0: int = dataclasses.field(default=0, metadata=dict(static=True))
    n_heavy: int = dataclasses.field(
        default=0, metadata=dict(static=True)
    )
    #: [Hp] i32 heavy tile ids (padded to a multiple of 8).
    heavy_ids: "jax.Array | None" = None
    #: [Hp, n_max - j0 + 1] i32 — per-heavy-tile slice starts relative
    #: to its own window; last column the window base row.
    heavy_relq: "jax.Array | None" = None

    @property
    def ntiles(self) -> int:
        return self.starts.shape[0]


def rcm_permutation(
    cell_neighbors: np.ndarray, entry_interior: np.ndarray
) -> np.ndarray:
    """Reverse Cuthill-McKee ordering of the cell adjacency graph.

    Returns `order` with order[new_id] = old_id. Starts each connected
    component from a minimum-degree vertex (the standard heuristic).
    """
    C, K = cell_neighbors.shape
    # CSR adjacency from the ELL table (interior entries only).
    # np.nonzero is row-major, so the entries are already grouped by
    # row in order — `nbr` IS the CSR data array.
    rows, cols = np.nonzero(entry_interior)
    nbr = cell_neighbors[rows, cols]
    deg = np.zeros(C, dtype=np.int64)
    np.add.at(deg, rows, 1)
    starts = np.zeros(C + 1, dtype=np.int64)
    np.cumsum(deg, out=starts[1:])
    adj = nbr

    try:
        # C-speed RCM; the pure-numpy BFS below is the fallback (and
        # the behavioral spec). Any valid RCM ordering works — callers
        # only rely on bandwidth reduction, not the exact permutation.
        from scipy.sparse import csr_matrix
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        a = csr_matrix(
            (np.ones(len(adj), np.int8), adj, starts), shape=(C, C)
        )
        return np.asarray(
            reverse_cuthill_mckee(a, symmetric_mode=True), dtype=np.int64
        )
    except ImportError:  # pragma: no cover
        pass

    visited = np.zeros(C, dtype=bool)
    order = np.empty(C, dtype=np.int64)
    pos = 0
    for start in np.argsort(deg, kind="stable"):
        if visited[start]:
            continue
        visited[start] = True
        head = pos
        order[pos] = start
        pos += 1
        while head < pos:
            u = order[head]
            head += 1
            cand = adj[starts[u] : starts[u + 1]]
            cand = cand[~visited[cand]]
            if len(cand):
                cand = np.unique(cand)  # sorted, dedup
                cand = cand[np.argsort(deg[cand], kind="stable")]
                n = len(cand)
                order[pos : pos + n] = cand
                visited[cand] = True
                pos += n
    assert pos == C
    return order[::-1].copy()


def build_slice_plan(
    cell_neighbors: np.ndarray,
    entry_interior: np.ndarray,
    tile: int = 128,
    build_col_tile: bool = False,
) -> SlicePlan | None:
    """Build the per-tile distinct-delta slice schedule.

    Returns None when the plan would be degenerate (bandwidth so large
    that n_max slices per tile exceed the tile size -- then the plan
    has no advantage over a plain gather).

    build_col_tile materializes SlicePlan.col_tile ([ntiles, K, tile]
    i32, ~C*K*4 B on device) for the Pallas neighbor-gather kernel;
    only the mesh-compile path needs it — SpMV-only consumers (AMG
    coarse levels, f64/CPU fallbacks) leave it off.
    """
    import jax.numpy as jnp

    C, K = cell_neighbors.shape
    ntiles = -(-C // tile)
    delta = cell_neighbors.astype(np.int64) - np.arange(C)[:, None]
    rows, cols = np.nonzero(entry_interior)
    if len(rows) == 0:
        return None
    t = rows // tile
    d = delta[rows, cols]
    # Unique (tile, delta) pairs; tile-local column = rank of delta
    # within its tile's sorted distinct set.
    pair = np.stack([t, d], axis=1)
    uniq, inverse = np.unique(pair, axis=0, return_inverse=True)
    ut, ud = uniq[:, 0], uniq[:, 1]
    tile_first = np.searchsorted(ut, np.arange(ntiles))
    j_of_pair = np.arange(len(uniq)) - tile_first[ut]
    counts = np.bincount(ut, minlength=ntiles)
    n_max = int(counts.max())
    if n_max > tile:
        return None

    col_of = np.zeros((C, K), dtype=np.int64)
    col_of[rows, cols] = j_of_pair[inverse]

    # Slice for (tile t, column j) covers padded indices
    # [pad_lo + t*tile + d, + tile); choose pads so every start and end
    # is in range. Unused columns -> start 0, coef 0.
    raw_start = ut * tile + ud
    pad_lo = int(max(0, -raw_start.min()))
    # Padded length pad_lo + C + pad_hi must cover the furthest slice
    # end pad_lo + raw_start.max() + tile.
    pad_hi = int(max(0, raw_start.max() + tile - C))
    # Unused columns repeat the tile's first used start: zero
    # coefficients make them no-ops, and pointing them INSIDE the
    # tile's slice span keeps the Pallas kernel's per-group window
    # tight (a 0 placeholder would stretch every window to row 0).
    # Tiles with NO interior entries get a placeholder inside their own
    # row span (not pad_lo: a far empty tile would stretch its group's
    # window back to the vector start and blow the kernel's VMEM
    # budget).
    own_span = pad_lo + np.minimum(
        np.arange(ntiles, dtype=np.int64) * tile, max(0, C - tile)
    )
    first_start = own_span
    has = counts > 0
    first_start[has] = raw_start[tile_first[has]] + pad_lo
    starts = np.broadcast_to(
        first_start[:, None], (ntiles, n_max)
    ).copy()
    starts[ut, j_of_pair] = raw_start + pad_lo

    # Static window size for the Pallas slice kernels. Rows are
    # 128-lane rows of the padded x. tile == 128: GROUP tiles share one
    # window per kernel step (span + 2 rows for the roll pair). Wider
    # tiles (tile = T*128): one tile per step, window = start span +
    # T + 1 rows (the rolled block is T+1 rows).
    from orc_tpu.ops.pallas_slice import GROUP, LANES

    win_rows = 0
    if tile == LANES:
        q = starts // LANES
        ngroups = -(-ntiles // GROUP)
        qpad = np.concatenate(
            [q] + [q[-1:]] * (ngroups * GROUP - ntiles), axis=0
        ).reshape(ngroups, GROUP * n_max)
        win_rows = int((qpad.max(axis=1) - qpad.min(axis=1)).max()) + 2
    elif tile % LANES == 0:
        q = starts // LANES
        T = tile // LANES
        win_rows = int((q.max(axis=1) - q.min(axis=1)).max()) + T + 1

    # col_of in the kernel-tile layout for the neighbor-gather kernel:
    # [ntiles, K, tile], rows past C padded with column 0 (their
    # outputs are dropped / masked by the caller's interior mask).
    col_tile = None
    if build_col_tile:
        col_pad = np.zeros((ntiles * tile, K), dtype=np.int64)
        col_pad[:C] = col_of
        col_tile = jnp.asarray(
            np.swapaxes(col_pad.reshape(ntiles, tile, K), 1, 2),
            jnp.int32,
        )

    # Heavy-tail split metadata (see the SlicePlan field docs): pick
    # the smallest multiple-of-8 j0 that fully covers >= 3/4 of the
    # tiles; the remainder runs in the small second kernel. The 8x
    # per-heavy-tile VMEM windows gate on win_rows (the heavy kernel's
    # scratch is 8 * win_rows * 512 B).
    j0 = n_heavy_ct = 0
    heavy_ids = heavy_relq = None
    if tile == LANES and n_max > 12 and 0 < win_rows <= 1024:
        for cand in (8, 16, 24):
            if cand >= n_max:
                break
            if (counts > cand).sum() <= ntiles // 4:
                j0 = cand
                break
        if j0:
            heavy = np.nonzero(counts > j0)[0]
            n_heavy_ct = len(heavy)
            n_rest = n_max - j0
            Hp = max(8, -(-n_heavy_ct // 8) * 8)
            sub = starts[heavy, j0:]  # [H, n_rest], pad_lo included
            qmin_h = (sub // LANES).min(axis=1)
            relq = np.zeros((Hp, n_rest + 1), dtype=np.int64)
            relq[:n_heavy_ct, :n_rest] = sub - qmin_h[:, None] * LANES
            relq[:n_heavy_ct, n_rest] = qmin_h
            hids = np.zeros(Hp, dtype=np.int64)
            hids[:n_heavy_ct] = heavy
            heavy_ids = jnp.asarray(hids, jnp.int32)
            heavy_relq = jnp.asarray(relq, jnp.int32)

    return SlicePlan(
        starts=jnp.asarray(starts, jnp.int32),
        col_of=jnp.asarray(col_of, jnp.int32),
        tile=tile,
        n_max=n_max,
        pad_lo=pad_lo,
        pad_hi=pad_hi,
        n_cells=C,
        win_rows=win_rows,
        col_tile=col_tile,
        tile_nj=jnp.asarray(counts, jnp.int32),
        j0=j0,
        n_heavy=n_heavy_ct,
        heavy_ids=heavy_ids,
        heavy_relq=heavy_relq,
    )


def build_best_slice_plan(
    cell_neighbors: np.ndarray,
    entry_interior: np.ndarray,
    tiles=(128, 1024),
    build_col_tile: bool = False,
) -> SlicePlan | None:
    """Build slice plans at the candidate tile widths and keep the one
    with the lowest modeled kernel cost.

    Wider tiles amortize the Pallas kernels' per-slice work — the roll
    + select + FMA issue ONCE per (tile, slice) regardless of sublane
    count, so a T*128-row tile retires T*128 outputs per ~ (2 + 2T/8)
    instructions where T=1 retires 128 per ~4 — at the price of a
    larger per-tile distinct-delta set (n_max grows with the union of
    the constituent 128-row tiles' delta sets) and proportionally more
    slice-column coefficient traffic in prepare()/SpMV. The model
    charges instructions n_max*(2 + ceil((T+1)/8) + ceil(T/8)) per
    tile plus HBM-traffic instructions for the n_max*tile coefficient
    block; measured crossover on the permuted-cavity mesh favors
    tile=1024 from ~100k cells (BASELINE.md round 4)."""
    C = cell_neighbors.shape[0]
    best, best_cost = None, None
    for tile in tiles:
        if tile != 128 and C < 4 * tile:
            continue
        plan = build_slice_plan(
            cell_neighbors, entry_interior, tile=tile,
            build_col_tile=build_col_tile,
        )
        if plan is None:
            continue
        T = tile // 128
        # instructions per tile: n_max rolls/selects/FMAs on
        # (T+1,128)-row blocks + coefficient-load cost (the [n_max,
        # tile] block read from HBM, ~1 instr / (8,128) f32 register).
        # Effective per-tile slice count: the tile-128 heavy-tail
        # split (SlicePlan.j0) caps the main kernel at j0 slices and
        # pays the tail only on the n_heavy tiles — measured 2.3x on
        # the skewed distribution (BASELINE.md round 5), which moves
        # the 128-vs-1024 crossover strongly toward 128.
        if plan.j0:
            n_eff = plan.j0 + (
                plan.n_heavy * (plan.n_max - plan.j0)
            ) / max(1, plan.ntiles)
        else:
            n_eff = plan.n_max
        instr = n_eff * (2 + -(-(T + 1) // 8) + -(-T // 8))
        instr += n_eff * T * 16 // 8  # coef traffic
        cost = instr / tile  # per cell
        if best_cost is None or cost < best_cost:
            best, best_cost = plan, cost
    return best
