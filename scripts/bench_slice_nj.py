"""Micro-bench for the slice-SpMV dynamic trip-count variants on a
REALISTIC skewed per-tile slice-count distribution (the permuted-
cavity plan measures mean 5.1 / median 4 / max 33 — the synthetic
bench_slice_kernel mesh has ~30 everywhere and cannot show the win).

Usage: python scripts/bench_slice_nj.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/orc_tpu_jax_cache")
    from orc_tpu.mesh.reorder import build_slice_plan
    from orc_tpu.ops.spmv import EllMatrix

    rng = np.random.default_rng(0)
    C, K, B = 200704, 6, 450
    ntiles = -(-C // 128)
    # Skewed per-tile delta counts: most tiles few, a tail up to ~33.
    n_deltas = np.minimum(
        2 + rng.geometric(0.25, ntiles), 33
    )  # mean ~5.5
    max_d = int(n_deltas.max())
    tile_deltas = rng.integers(-B, B + 1, (ntiles, max_d))
    t_of = np.arange(C) // 128
    pick = rng.integers(0, 10_000, (C, K)) % n_deltas[t_of][:, None]
    nb = np.arange(C)[:, None] + tile_deltas[t_of[:, None], pick]
    interior = (nb >= 0) & (nb < C) & (rng.random((C, K)) < 0.9)
    nb = np.where(interior, np.clip(nb, 0, C - 1), np.arange(C)[:, None])

    plan = build_slice_plan(nb, interior, build_col_tile=True)
    nj = np.asarray(plan.tile_nj)
    print(
        f"plan: ntiles={plan.ntiles} n_max={plan.n_max} "
        f"nj mean {nj.mean():.1f} median {np.median(nj):.0f} "
        f"max {nj.max()}",
        file=sys.stderr,
    )

    diag = jnp.asarray(1 + rng.random(C), jnp.float32)
    off = jnp.asarray(rng.standard_normal((C, K)) * interior, jnp.float32)
    x = jnp.asarray(rng.standard_normal(C), jnp.float32)
    A = EllMatrix(
        diag=diag, off=off, neighbors=jnp.asarray(nb, jnp.int32),
        plan=plan,
    ).prepare()

    y = np.asarray(A.matvec(x))
    yref = np.asarray(diag) * np.asarray(x) + (
        np.asarray(off) * np.asarray(x)[nb]
    ).sum(-1)
    err = float(np.abs(y - yref).max() / np.abs(yref).max())
    print(f"err {err:.2e}", file=sys.stderr)
    assert err < 1e-5

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def many(v, n):
        def body(c, _):
            return A.matvec(c) * 0.5, None

        return lax.scan(body, v, None, length=n)[0]

    for n in (64, 512):
        r = many(v=x, n=n)
        _ = np.asarray(r[:8])
    t0 = time.perf_counter()
    r = many(v=x, n=64)
    _ = np.asarray(r[:8])
    t64 = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = many(v=x, n=512)
    _ = np.asarray(r[:8])
    t512 = time.perf_counter() - t0
    us = (t512 - t64) / (512 - 64) * 1e6
    print(f"slice SpMV: {us:.1f} us")


if __name__ == "__main__":
    main()
