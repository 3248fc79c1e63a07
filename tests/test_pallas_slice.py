"""Interpret-mode equivalence pins for the irregular-mesh Pallas slice
kernel (ops/pallas_slice.py) against the gather SpMV.

The kernel is DEFAULT ON for every irregular-mesh f32 TPU SpMV
(momentum, pressure, AMG coarse levels), but the CPU test suite routes
around it via _slice_pallas_eligible — so, like pallas_assembly, the
kernel math itself is pinned here by calling it directly with
interpret=True (byte-for-byte the same kernel Mosaic compiles on TPU).

Covers: unbatched, explicit [3,C] batch, jax.vmap (the production
momentum-solve shape — routed through the custom_vmap unroll), tile
counts not divisible by GROUP, a partial last tile, and the
empty-tile placeholder contract of mesh/reorder.build_slice_plan.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orc_tpu.mesh.reorder import build_slice_plan
from orc_tpu.ops.pallas_slice import GROUP, slice_spmv_pallas
from orc_tpu.ops.spmv import EllMatrix, ell_spmv


def _random_banded(C, K=4, bw=10, seed=0, empty_tiles=()):
    """A random banded ELL sparsity (what RCM produces) + a matching
    slice plan; `empty_tiles` rows get no interior entries at all."""
    rng = np.random.default_rng(seed)
    base = np.arange(C)[:, None]
    nbrs = base + rng.integers(-bw, bw + 1, (C, K))
    valid = (nbrs >= 0) & (nbrs < C) & (nbrs != base)
    t = np.arange(C) // 128
    for et in empty_tiles:
        valid[t == et] = False
    nbrs = np.where(valid, nbrs, base)
    plan = build_slice_plan(nbrs, valid, tile=128, build_col_tile=True)
    assert plan is not None
    off = (rng.standard_normal((C, K)) * valid).astype(np.float32)
    diag = (rng.standard_normal(C) + 5.0).astype(np.float32)
    x = rng.standard_normal(C).astype(np.float32)
    return nbrs, off, diag, x, plan


def _prepared_coef(off, nbrs, plan):
    A = EllMatrix(
        diag=jnp.zeros(off.shape[:-1], off.dtype),
        off=jnp.asarray(off),
        neighbors=jnp.asarray(nbrs),
        plan=plan,
    ).prepare()
    return A.off  # [..., ntiles, n_max, T]


# C values chosen so ntiles % GROUP != 0 and the last tile is partial.
@pytest.mark.parametrize("C", [300, 1410])
def test_kernel_matches_gather(C):
    nbrs, off, diag, x, plan = _random_banded(C, seed=C % 97)
    ntiles = plan.ntiles
    assert ntiles % GROUP != 0  # tail group exercised
    assert C % 128 != 0  # partial last tile exercised
    coef = _prepared_coef(off, nbrs, plan)
    y_ref = ell_spmv(jnp.asarray(diag), jnp.asarray(off), jnp.asarray(nbrs), jnp.asarray(x))
    y = slice_spmv_pallas(
        jnp.asarray(diag), coef, plan, jnp.asarray(x), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=2e-6, atol=2e-6
    )


def test_kernel_batched_explicit():
    """Explicit [3,C] leading batch (the prepared momentum systems)."""
    C = 500
    nbrs, off1, diag1, _, plan = _random_banded(C, seed=2)
    rng = np.random.default_rng(5)
    valid = off1 != 0
    off = (rng.standard_normal((3, C, off1.shape[1])) * valid).astype(
        np.float32
    )
    diag = (rng.standard_normal((3, C)) + 5.0).astype(np.float32)
    x = rng.standard_normal((3, C)).astype(np.float32)
    coef = _prepared_coef(jnp.asarray(off), jnp.asarray(nbrs), plan)
    y_ref = ell_spmv(
        jnp.asarray(diag), jnp.asarray(off), jnp.asarray(nbrs), jnp.asarray(x)
    )
    y = slice_spmv_pallas(
        jnp.asarray(diag), coef, plan, jnp.asarray(x), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=2e-6, atol=2e-6
    )


def test_kernel_under_vmap():
    """jax.vmap over the kernel (how solver/simple.py's batched
    momentum solve reaches it) must route through the custom_vmap
    unroll and match the gather path."""
    C = 400
    nbrs, off1, _, _, plan = _random_banded(C, seed=3)
    rng = np.random.default_rng(7)
    valid = off1 != 0
    off = (rng.standard_normal((3, C, off1.shape[1])) * valid).astype(
        np.float32
    )
    diag = (rng.standard_normal((3, C)) + 5.0).astype(np.float32)
    x = rng.standard_normal((3, C)).astype(np.float32)
    coef = _prepared_coef(jnp.asarray(off), jnp.asarray(nbrs), plan)

    y = jax.vmap(
        lambda d, c, xi: slice_spmv_pallas(d, c, plan, xi, interpret=True)
    )(jnp.asarray(diag), coef, jnp.asarray(x))
    y_ref = ell_spmv(
        jnp.asarray(diag), jnp.asarray(off), jnp.asarray(nbrs), jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=2e-6, atol=2e-6
    )


def test_empty_tile_placeholder_stays_local():
    """A tile with zero interior entries must get a placeholder start
    inside its OWN row span (mesh/reorder.py): a pad_lo placeholder
    would stretch its group's VMEM window back to the vector start.
    The kernel must still match the gather path on such a plan."""
    C = 128 * 12  # two groups of GROUP=8 (padded)
    empty = (2, 9)
    nbrs, off, diag, x, plan = _random_banded(
        C, bw=10, seed=11, empty_tiles=empty
    )
    starts = np.asarray(plan.starts)
    for et in empty:
        lo = plan.pad_lo + et * 128
        assert np.all(starts[et] >= lo) and np.all(starts[et] <= lo + 128)
    # Window span stays at group + band scale, not the
    # tile-9-to-row-0 span (>= 9*128/128 + group rows).
    assert plan.win_rows <= GROUP + (2 * 10) // 128 + 4
    coef = _prepared_coef(off, nbrs, plan)
    y_ref = ell_spmv(
        jnp.asarray(diag), jnp.asarray(off), jnp.asarray(nbrs), jnp.asarray(x)
    )
    y = slice_spmv_pallas(
        jnp.asarray(diag), coef, plan, jnp.asarray(x), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=2e-6, atol=2e-6
    )


def test_win_rows_cap_falls_back_to_xla():
    """Plans whose window exceeds the VMEM ceiling must be rejected by
    the eligibility gate (ops/spmv._slice_pallas_eligible), not fed to
    Mosaic."""
    import dataclasses

    from orc_tpu.ops.spmv import _SLICE_WIN_ROWS_MAX, _slice_pallas_eligible

    C = 400
    nbrs, off, diag, x, plan = _random_banded(C, seed=13)
    big = dataclasses.replace(plan, win_rows=_SLICE_WIN_ROWS_MAX + 1)
    coef = _prepared_coef(off, nbrs, plan)
    assert not _slice_pallas_eligible(coef, big, jnp.asarray(x))


def test_nbr_kernel_matches_gather():
    """The neighbor-gather kernel (slice_nbr_values) must reproduce
    take(x, cell_neighbors) exactly at interior slots — scalar and
    vector fields, partial last tile, an empty tile, K=6. Small sizes:
    interpret-mode unrolls GROUP*n_max*B, so compiles are expensive."""
    from orc_tpu.ops.pallas_slice import slice_nbr_values

    C = 300  # partial last tile, ntiles % GROUP != 0
    nbrs, off, diag, x, plan = _random_banded(
        C, K=6, bw=6, seed=7, empty_tiles=(1,)
    )
    assert plan.col_tile is not None
    valid = nbrs != np.arange(C)[:, None]

    y = np.asarray(
        slice_nbr_values(plan, jnp.asarray(x), interpret=True)
    )
    np.testing.assert_array_equal(y * valid, x[nbrs] * valid)

    xv = np.random.default_rng(1).standard_normal((C, 3)).astype(
        np.float32
    )
    yv = np.asarray(
        slice_nbr_values(plan, jnp.asarray(xv), interpret=True)
    )
    np.testing.assert_array_equal(
        yv * valid[:, :, None], xv[nbrs] * valid[:, :, None]
    )


def test_nbr_eligibility_gate():
    """slice_nbr_eligible: rejects f64, missing col_tile, and
    window*fields over the VMEM cap."""
    import dataclasses

    from orc_tpu.ops.spmv import _SLICE_WIN_ROWS_MAX, slice_nbr_eligible

    nbrs, off, diag, x, plan = _random_banded(300, seed=3)
    x32 = jnp.asarray(x)
    assert not slice_nbr_eligible(None, x32, 1)
    assert not slice_nbr_eligible(
        dataclasses.replace(plan, col_tile=None), x32, 1
    )
    assert not slice_nbr_eligible(plan, x32.astype(jnp.float64), 1)
    assert not slice_nbr_eligible(
        plan, x32, 1 + _SLICE_WIN_ROWS_MAX // max(1, plan.win_rows)
    )


def test_wide_tile_kernels_match_gather():
    """tile=1024 variants (one T*128-row tile per grid step,
    mesh/reorder.build_best_slice_plan): SpMV and neighbor-gather
    kernels must match the gather paths exactly, including a partial
    last tile."""
    from orc_tpu.ops.pallas_slice import slice_nbr_values

    C, K, bw = 4196, 4, 6  # 5 tiles, last partial
    rng = np.random.default_rng(21)
    base = np.arange(C)[:, None]
    nbrs = base + rng.integers(-bw, bw + 1, (C, K))
    valid = (nbrs >= 0) & (nbrs < C) & (nbrs != base)
    nbrs = np.where(valid, nbrs, base)
    plan = build_slice_plan(nbrs, valid, tile=1024, build_col_tile=True)
    assert plan is not None and plan.tile == 1024
    off = (rng.standard_normal((C, K)) * valid).astype(np.float32)
    diag = (rng.standard_normal(C) + 5.0).astype(np.float32)
    x = rng.standard_normal(C).astype(np.float32)

    coef = _prepared_coef(off, nbrs, plan)
    y = slice_spmv_pallas(
        jnp.asarray(diag), coef, plan, jnp.asarray(x), interpret=True
    )
    y_ref = ell_spmv(
        jnp.asarray(diag), jnp.asarray(off), jnp.asarray(nbrs),
        jnp.asarray(x),
    )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=2e-6, atol=2e-6
    )

    yn = np.asarray(
        slice_nbr_values(plan, jnp.asarray(x), interpret=True)
    )
    np.testing.assert_array_equal(yn * valid, x[nbrs] * valid)
    xv = rng.standard_normal((C, 3)).astype(np.float32)
    ynv = np.asarray(
        slice_nbr_values(plan, jnp.asarray(xv), interpret=True)
    )
    np.testing.assert_array_equal(
        ynv * valid[:, :, None], xv[nbrs] * valid[:, :, None]
    )


def test_best_plan_selector():
    """build_best_slice_plan picks a valid plan and small meshes stay
    on tile=128 (wide tiles need C >= 4*tile)."""
    from orc_tpu.mesh.reorder import build_best_slice_plan

    C, K = 700, 4
    rng = np.random.default_rng(5)
    base = np.arange(C)[:, None]
    nbrs = base + rng.integers(-8, 9, (C, K))
    valid = (nbrs >= 0) & (nbrs < C) & (nbrs != base)
    nbrs = np.where(valid, nbrs, base)
    plan = build_best_slice_plan(nbrs, valid, build_col_tile=True)
    assert plan is not None and plan.tile == 128


def _skewed_mesh(C=6400, K=6, band=400, seed=3):
    """Adjacency with a heavily skewed per-tile slice-count
    distribution (most tiles few distinct deltas, a tail of many) —
    exercises the heavy-tail split (SlicePlan.j0 > 0)."""
    rng = np.random.default_rng(seed)
    ntiles = -(-C // 128)
    n_d = np.minimum(2 + rng.geometric(0.2, ntiles), 30)
    max_d = int(n_d.max())
    tile_deltas = rng.integers(-band, band + 1, (ntiles, max_d))
    t_of = np.arange(C) // 128
    pick = rng.integers(0, 10_000, (C, K)) % n_d[t_of][:, None]
    nbrs = np.arange(C)[:, None] + tile_deltas[t_of[:, None], pick]
    valid = (nbrs >= 0) & (nbrs < C) & (rng.random((C, K)) < 0.9)
    nbrs = np.where(valid, np.clip(nbrs, 0, C - 1), np.arange(C)[:, None])
    plan = build_slice_plan(nbrs, valid, tile=128, build_col_tile=True)
    assert plan is not None
    off = (rng.standard_normal((C, K)) * valid).astype(np.float32)
    diag = (rng.standard_normal(C) + 5.0).astype(np.float32)
    x = rng.standard_normal(C).astype(np.float32)
    return nbrs, off, diag, x, plan


def test_heavy_tail_split_exact():
    """With j0 active, kernel A (first j0 columns, all tiles) + kernel
    B (the rest, heavy tiles) + scatter-add must equal the plain
    gather SpMV."""
    nbrs, off, diag, x, plan = _skewed_mesh()
    assert plan.j0 > 0 and plan.n_heavy > 0, (
        plan.j0, plan.n_heavy, plan.n_max
    )
    A = EllMatrix(
        diag=jnp.asarray(diag), off=jnp.asarray(off),
        neighbors=jnp.asarray(nbrs), plan=plan,
    ).prepare()
    y = np.asarray(
        slice_spmv_pallas(A.diag, A.off, plan, jnp.asarray(x),
                          interpret=True)
    )
    y_ref = diag * x + (off * x[nbrs]).sum(-1)
    np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=2e-5)


def test_heavy_tail_split_batched():
    """vmapped [3,C] batched solve over a split plan (the momentum
    path) stays exact."""
    nbrs, off, diag, x, plan = _skewed_mesh(seed=11)
    assert plan.j0 > 0
    C = len(diag)
    rng = np.random.default_rng(5)
    x3 = rng.standard_normal((3, C)).astype(np.float32)
    A = EllMatrix(
        diag=jnp.asarray(diag), off=jnp.asarray(off),
        neighbors=jnp.asarray(nbrs), plan=plan,
    ).prepare()
    f = lambda v: slice_spmv_pallas(A.diag, A.off, plan, v,
                                    interpret=True)
    y = np.asarray(jax.vmap(f)(jnp.asarray(x3)))
    y_ref = diag * x3 + (off[None] * x3[:, nbrs.astype(np.int64)]
                         * 1.0).sum(-1)
    np.testing.assert_allclose(y, y_ref, rtol=2e-5, atol=2e-5)
