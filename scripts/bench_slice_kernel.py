"""Slice-plan SpMV formulation shootout on the current backend.

Synthetic RCM-like banded adjacency (no 260s mesh build on this 1-core
host): per 128-cell tile, K=4 neighbor deltas drawn from ~30 distinct
per-tile values within a +/-B band — the structure mesh/reorder.py
produces on real irregular meshes. Times, with the hardened scan-slope
recipe:

  1. structured shift SpMV (speed-of-light reference, same C/K)
  2. element gather (the pre-round-3 irregular path)
  3. XLA slice_spmv (vmapped dynamic_slice -> element gather)
  4. Pallas slice kernel (ops/pallas_slice.py)

Usage: python scripts/bench_slice_kernel.py [C] [B]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

V5E_HBM_GBPS = 819.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from orc_tpu.mesh.reorder import build_slice_plan
    from orc_tpu.ops.spmv import EllMatrix, ell_spmv, slice_spmv

    jax.config.update("jax_compilation_cache_dir", "/tmp/orc_tpu_jax_cache")
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 200704
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 450
    K = 4
    dtype = jnp.float32
    print(f"backend: {jax.devices()}, C={C} K={K} band={B}", file=sys.stderr)

    rng = np.random.default_rng(0)
    ntiles = -(-C // 128)
    # ~30 distinct deltas per tile, shared by its 128 cells.
    tile_deltas = rng.integers(-B, B + 1, (ntiles, 30))
    t_of = np.arange(C) // 128
    pick = rng.integers(0, 30, (C, K))
    nb = np.arange(C)[:, None] + tile_deltas[t_of[:, None], pick]
    interior = (nb >= 0) & (nb < C) & (rng.random((C, K)) < 0.9)
    nb = np.where(interior, np.clip(nb, 0, C - 1), np.arange(C)[:, None])

    plan = build_slice_plan(nb, interior, build_col_tile=True)
    print(
        f"plan: ntiles={plan.ntiles} n_max={plan.n_max} "
        f"win_rows={plan.win_rows}",
        file=sys.stderr,
    )

    diag = jnp.asarray(rng.standard_normal(C), dtype)
    off = jnp.asarray(rng.standard_normal((C, K)) * interior, dtype)
    x = jnp.asarray(rng.standard_normal(C), dtype)
    nbj = jnp.asarray(nb)

    # Hardware correctness first.
    y_ref = np.asarray(diag) * np.asarray(x) + (
        np.asarray(off) * np.asarray(x)[nb]
    ).sum(1)
    A = EllMatrix(diag=diag, off=off, neighbors=nbj, plan=plan).prepare()
    y_hw = np.asarray(A.matvec(x))
    err = np.abs(y_hw - y_ref).max() / np.abs(y_ref).max()
    print(f"hardware rel err (dispatched path): {err:.2e}", file=sys.stderr)
    assert err < 1e-5, "slice kernel WRONG on this backend"

    def slope(f, x0, nsteps=512):
        def run(n_steps):
            g = jax.jit(
                lambda v: lax.scan(
                    lambda c, _: (f(c), None), v, None, length=n_steps
                )[0][:8]
            )
            _ = np.asarray(g(x0))
            ts = []
            for _i in range(3):
                t1 = time.perf_counter()
                _ = np.asarray(g(x0))
                ts.append(time.perf_counter() - t1)
            return sorted(ts)[1]

        n0 = max(1, nsteps // 8)
        return (run(nsteps) - run(n0)) / (nsteps - n0)

    nb4 = C * jnp.dtype(dtype).itemsize * (1 + K + 1 + 1)

    def report(label, t):
        print(
            f"{label:18s}: {t*1e6:9.1f} us/SpMV "
            f"({nb4/t/1e9:6.1f} GB/s min-traffic)"
        )

    # 1. structured shift (reference point): same C, K offsets.
    offs = (-C // 450, -1, 1, C // 450)
    valid = np.ones((C, K), bool)
    nbs = np.arange(C)[:, None] + np.asarray(offs)
    valid &= (nbs >= 0) & (nbs < C)
    offs_coef = jnp.asarray(rng.standard_normal((C, K)) * valid, dtype)
    t_shift = slope(
        lambda v: ell_spmv(diag, offs_coef, None, v, offs), x
    )
    report("structured shift", t_shift)

    # 2. element gather
    t_g = slope(lambda v: ell_spmv(diag, off, nbj, v, None), x, nsteps=64)
    report("element gather", t_g)
    print(f"  = {t_g/t_shift:.0f}x shift")

    # 3. XLA slice formulation (known-slow; few steps)
    import orc_tpu.ops.spmv as spmv_mod

    saved = spmv_mod._PALLAS_SLICE
    spmv_mod._PALLAS_SLICE = False
    t_xs = slope(lambda v: slice_spmv(A.diag, A.off, plan, v), x, nsteps=16)
    spmv_mod._PALLAS_SLICE = saved
    report("XLA slice", t_xs)
    print(f"  = {t_xs/t_shift:.0f}x shift")

    # 4. Pallas slice kernel
    from orc_tpu.ops.pallas_slice import slice_spmv_pallas

    t_p = slope(lambda v: slice_spmv_pallas(A.diag, A.off, plan, v), x)
    report("pallas slice", t_p)
    print(
        f"  = {t_p/t_shift:.1f}x shift, {t_g/t_p:.0f}x faster than "
        f"gather, {t_xs/t_p:.0f}x faster than XLA slice"
    )

    # 4b. wide-tile (1024) Pallas slice kernel: one roll retires 8
    # output rows (mesh/reorder.build_best_slice_plan rationale).
    plan_w = build_slice_plan(nb, interior, tile=1024, build_col_tile=True)
    if plan_w is not None:
        print(
            f"wide plan: ntiles={plan_w.ntiles} n_max={plan_w.n_max} "
            f"win_rows={plan_w.win_rows}",
            file=sys.stderr,
        )
        Aw = EllMatrix(
            diag=diag, off=off, neighbors=nbj, plan=plan_w
        ).prepare()
        y_hw = np.asarray(Aw.matvec(x))
        err = np.abs(y_hw - y_ref).max() / np.abs(y_ref).max()
        assert err < 1e-5, f"wide slice kernel WRONG ({err})"
        t_pw = slope(lambda v: slice_spmv_pallas(Aw.diag, Aw.off, plan_w, v), x)
        report("pallas slice 1024", t_pw)
        print(f"  = {t_pw/t_shift:.1f}x shift, {t_p/t_pw:.1f}x vs tile-128")

    # 5. neighbor-VALUE gather (assembly's nbr_values): Pallas window
    # kernel vs the element gather, scalar and [C,3] vector fields.
    from orc_tpu.ops.pallas_slice import slice_nbr_values

    intj = jnp.asarray(interior)

    # Hardware correctness of the dispatched kernel first.
    y_nbr = np.asarray(
        jax.jit(lambda v: slice_nbr_values(plan, v))(x)
    )
    ref_nbr = np.asarray(x)[nb]
    errn = np.abs((y_nbr - ref_nbr) * interior).max()
    print(f"nbr kernel hardware err: {errn:.2e}", file=sys.stderr)
    assert errn < 1e-6, "nbr kernel WRONG on this backend"

    own = lambda v, y: jnp.where(intj, y, v[:, None])
    t_ng = slope(lambda v: own(v, v[nbj]).sum(1), x, nsteps=64)
    report("nbr gather [C,K]", t_ng)
    t_np = slope(
        lambda v: own(v, slice_nbr_values(plan, v)).sum(1), x
    )
    report("nbr kernel [C,K]", t_np)
    print(f"  = {t_ng/t_np:.0f}x faster than gather")

    x3 = jnp.asarray(rng.standard_normal((C, 3)), dtype)
    own3 = lambda v, y: jnp.where(intj[..., None], y, v[:, None, :])
    t_ng3 = slope(
        lambda v: own3(v, v[nbj]).sum(1), x3, nsteps=32
    )
    report("nbr gather [C,K,3]", t_ng3)
    t_np3 = slope(
        lambda v: own3(v, slice_nbr_values(plan, v)).sum(1), x3,
        nsteps=256,
    )
    report("nbr kernel [C,K,3]", t_np3)
    print(f"  = {t_ng3/t_np3:.0f}x faster than gather")

    if plan_w is not None:
        y_nw = np.asarray(
            jax.jit(lambda v: slice_nbr_values(plan_w, v))(x)
        )
        errn = np.abs((y_nw - ref_nbr) * interior).max()
        assert errn < 1e-6, f"wide nbr kernel WRONG ({errn})"
        t_nw = slope(
            lambda v: own(v, slice_nbr_values(plan_w, v)).sum(1), x
        )
        report("nbr kernel 1024 [C,K]", t_nw)
        t_nw3 = slope(
            lambda v: own3(v, slice_nbr_values(plan_w, v)).sum(1), x3,
            nsteps=256,
        )
        report("nbr kernel 1024 [C,K,3]", t_nw3)
        print(
            f"  vs tile-128: scalar {t_np/t_nw:.1f}x, "
            f"vector {t_np3/t_nw3:.1f}x"
        )


if __name__ == "__main__":
    main()
