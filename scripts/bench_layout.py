"""Layout experiment: ELL off-diagonals stored [C,K] vs [K,C].

Motivated by the 2048^2 OOM (BASELINE.md): XLA lays gather-produced
[C,K] buffers out with minor-dim K, padding lanes K->128 (21.3x). This
measures whether K-major [K,C] storage changes the *speed* of the
shift-SpMV inner loop (the Krylov hot path), to size up the round-2
relayout before committing to it. Same scan-slope methodology as
scripts/bench_spmv.py (cancels dispatch latency).

Usage: python scripts/bench_layout.py [n_cells] [K]
"""

import os
import sys
import time

os.environ.setdefault("JAX_ENABLE_X64", "1")
sys.path.insert(0, "/root/repo")

V5E_HBM_GBPS = 819.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/orc_tpu_jax_cache")
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    nx = 1 << 10
    offsets = (-nx, -1, 1, nx, 0, 0)[:K]
    print(f"backend: {jax.devices()} C={C} K={K}", file=sys.stderr)

    def slope(f, x0, n=512):
        # Median of 3 slope estimates (the tunnel's dispatch RTT
        # fluctuates enough to corrupt a single pair).
        def run(n_steps):
            g = jax.jit(
                lambda x: lax.scan(
                    lambda c, _: (f(c), None), x, None, length=n_steps
                )[0][:8]
            )
            # Tiny dependent device-to-host copy as the barrier:
            # block_until_ready misreports through the axon tunnel, and
            # the copy's fixed cost cancels in the slope.
            _ = np.asarray(g(x0))
            ts = []
            for _i in range(3):
                t0 = time.perf_counter()
                _ = np.asarray(g(x0))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[1]

        # Wide interval: at ~100 us/SpMV the tunnel's fluctuating
        # 25us-30ms dispatch RTT swamps a (1, 64) pair.
        n0 = max(1, n // 8)
        t1, tn = run(n0), run(n)
        return (tn - t1) / (n - n0)

    rng = np.random.default_rng(0)
    for dt in (jnp.float32, jnp.float64):
        nb = jnp.dtype(dt).itemsize
        diag = jnp.asarray(rng.standard_normal(C), dt)
        off_np = rng.standard_normal((C, K))
        off_ck = jnp.asarray(off_np, dt)
        off_kc = jnp.asarray(off_np.T.copy(), dt)
        x = jnp.asarray(rng.standard_normal(C), dt)
        bytes_min = C * nb * (1 + K + 1 + 1)

        def mv_ck(v):
            y = diag * v
            for k, d in enumerate(offsets):
                vk = jnp.roll(v, -d) if d else v
                y = y + off_ck[:, k] * vk
            return y

        def mv_kc(v):
            y = diag * v
            for k, d in enumerate(offsets):
                vk = jnp.roll(v, -d) if d else v
                y = y + off_kc[k] * vk
            return y

        for name, f in (("[C,K]", mv_ck), ("[K,C]", mv_kc)):
            t = slope(f, x)
            print(
                f"{jnp.dtype(dt).name} {name}: {t*1e6:8.1f} us/SpMV  "
                f"{bytes_min/t/1e9:6.1f} GB/s "
                f"({100*bytes_min/t/1e9/V5E_HBM_GBPS:5.1f}% roofline, "
                "min-traffic)"
            )


if __name__ == "__main__":
    main()
