"""Pallas vs XLA shift-SpMV on the current backend (scan-slope timing).

Usage: python scripts/bench_pallas_spmv.py
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

    from orc_tpu.mesh import structured_box_mesh
    from orc_tpu.ops.pallas_spmv import shift_spmv
    from orc_tpu.ops.spmv import ell_spmv

    print(f"backend: {jax.devices()}", file=sys.stderr)

    def slope(f, x0):
        def run(ns):
            g = jax.jit(
                lambda x: lax.scan(
                    lambda c, _: (f(c), None), x, None, length=ns
                )[0]
            )
            # Dependent host copy closes each timed dispatch
            # (block_until_ready alone misreports through the tunnel —
            # CLAUDE.md / bench_layout.py hardened recipe).
            _ = np.asarray(g(x0)[:8])
            ts = []
            for _i in range(3):
                t0 = time.perf_counter()
                _ = np.asarray(g(x0)[:8])
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1, tn = run(64), run(512)
        return (tn - t1) / (512 - 64)

    mesh, _ = structured_box_mesh(100, 100, 100)
    C, K = mesh.cell_neighbors.shape
    interior = np.asarray(
        mesh.face_interior[mesh.cell_faces] & mesh.cell_face_mask
    )
    rng = np.random.default_rng(0)
    offs = mesh.neighbor_offsets
    # f64 Pallas is impossible on this backend: XLA's x64-emulation
    # rewrite does not handle custom calls ("While rewriting computation
    # to not contain X64 element types ... not implemented:
    # pallas_call"). f32 only.
    for dt in (jnp.float32,):
        diag = jnp.asarray(rng.standard_normal(C), dt)
        off = jnp.asarray(rng.standard_normal((C, K)) * interior, dt)
        x = jnp.asarray(rng.standard_normal(C), dt)
        nb = jnp.dtype(dt).itemsize
        min_bytes = C * nb * (1 + K + 1 + 1)

        # Correctness on hardware first.
        y_x = ell_spmv(diag, off, mesh.cell_neighbors, x, offs)
        y_p = shift_spmv(diag, off, offs, x)
        err = float(jnp.max(jnp.abs(y_x - y_p)))
        print(f"{jnp.dtype(dt).name}: max|xla-pallas| = {err:.3e}")

        t_x = slope(lambda v: ell_spmv(diag, off, mesh.cell_neighbors, v, offs), x)
        t_p = slope(lambda v: shift_spmv(diag, off, offs, v), x)
        for name, t in (("xla-shift", t_x), ("pallas", t_p)):
            print(
                f"  {name:>10}: {t*1e6:8.1f} us  "
                f"{min_bytes/t/1e9:6.1f} GB/s "
                f"({100*min_bytes/t/1e9/V5E_HBM_GBPS:5.1f}% roofline)"
            )


if __name__ == "__main__":
    main()
