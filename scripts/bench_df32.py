"""Double-float (2xf32) SpMV vs XLA-emulated f64 on the chip
(VERDICT r3 item 8).

The f64 shift SpMV runs at 31-41% of the HBM roofline on v5e because
XLA software-emulates every f64 op (BASELINE.md). df32 keeps the same
8 B/value traffic (two f32 planes) but replaces IEEE-double emulation
with plain f32 vector ops (ops/df32.py): this measures whether that
lifts the f64-accuracy SpMV toward the bandwidth bound, and how much
accuracy it costs (pinned functionally in tests/test_df32.py).

Usage: python scripts/bench_df32.py [n]     (n x n structured box)
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
    from orc_tpu.mesh import structured_box_mesh
    from orc_tpu.ops.df32 import df_from_f64, df_spmv, df_to_f64
    from orc_tpu.ops.spmv import ell_spmv

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    print(f"backend: {jax.devices()}, {n}x{n}", file=sys.stderr)
    mesh, _ = structured_box_mesh(n, n, 1, dtype=jnp.float64)
    C, K = mesh.cell_neighbors.shape
    offsets = mesh.neighbor_offsets
    interior = np.asarray(
        mesh.face_interior[mesh.cell_faces] & mesh.cell_face_mask
    )
    rng = np.random.default_rng(0)
    diag = jnp.asarray(rng.standard_normal(C) + 4.0, jnp.float64)
    off = jnp.asarray(rng.standard_normal((C, K)) * interior, jnp.float64)
    x = jnp.asarray(rng.standard_normal(C), jnp.float64)

    def slope(f, x0, nsteps=256):
        def run(ns):
            g = jax.jit(
                lambda v: jax.tree_util.tree_leaves(
                    lax.scan(
                        lambda c, _: (f(c), None), v, None, length=ns
                    )[0]
                )[0].ravel()[:8]
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

    # accuracy on hardware first
    dh, dl = df_from_f64(diag)
    oh, ol = df_from_f64(off)
    xh, xl = df_from_f64(x)
    want = np.asarray(ell_spmv(diag, off, None, x, offsets))
    yh, yl = jax.jit(
        lambda a, b: df_spmv(dh, dl, oh, ol, offsets, a, b)
    )(xh, xl)
    got = np.asarray(df_to_f64(yh, yl))
    scale = np.abs(want) + np.abs(np.asarray(diag) * np.asarray(x))
    rel = np.abs(got - want) / np.maximum(scale, 1e-300)
    print(
        f"df32-vs-f64 rel err: max {rel.max():.2e} "
        f"median {np.median(rel):.2e}",
        file=sys.stderr,
    )

    nbytes64 = C * 8 * (1 + K + 1 + 1)  # x + coefs + y, 8 B/value

    t64 = slope(lambda v: ell_spmv(diag, off, None, v, offsets), x)
    print(
        f"f64 shift SpMV  : {t64*1e6:8.1f} us "
        f"({nbytes64/t64/1e9:6.1f} GB/s, "
        f"{nbytes64/t64/1e9/819*100:4.1f}% roofline)"
    )

    def df_step(st):
        a, b = st
        yh, yl = df_spmv(dh, dl, oh, ol, offsets, a, b)
        return (yh, yl)

    tdf = slope(df_step, (xh, xl))
    print(
        f"df32 shift SpMV : {tdf*1e6:8.1f} us "
        f"({nbytes64/tdf/1e9:6.1f} GB/s, "
        f"{nbytes64/tdf/1e9/819*100:4.1f}% roofline)  "
        f"{t64/tdf:.2f}x f64"
    )

    # f32 reference point (half the traffic, the production dtype)
    d32, o32, x32 = (
        diag.astype(jnp.float32),
        off.astype(jnp.float32),
        x.astype(jnp.float32),
    )
    t32 = slope(lambda v: ell_spmv(d32, o32, None, v, offsets), x32)
    print(
        f"f32 shift SpMV  : {t32*1e6:8.1f} us "
        f"({nbytes64/2/t32/1e9:6.1f} GB/s, "
        f"{nbytes64/2/t32/1e9/819*100:4.1f}% roofline)"
    )


if __name__ == "__main__":
    main()
