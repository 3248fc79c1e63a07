"""SpMV roofline benchmark: achieved HBM bandwidth of the ELL SpMV.

Measures the gather-based and structured-shift SpMV paths across mesh
sizes and dtypes on the current backend, using scan-slope timing to
cancel dispatch latency (see scripts/profile_step.py). Reports GB/s
against the v5e HBM roofline (~819 GB/s).

Usage: python scripts/bench_spmv.py
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
    from orc_tpu.ops.spmv import ell_spmv

    print(f"backend: {jax.devices()}", file=sys.stderr)

    def slope(f, x0, n=64):
        def run(n_steps):
            g = jax.jit(
                lambda x: lax.scan(
                    lambda c, _: (f(c), None), x, None, length=n_steps
                )[0]
            )
            jax.block_until_ready(g(x0))
            t0 = time.perf_counter()
            jax.block_until_ready(g(x0))
            return time.perf_counter() - t0

        t1, tn = run(1), run(n)
        return (tn - t1) / (n - 1)

    rows = []
    for nx, ny, nz in [(127, 63, 1), (100, 100, 100), (200, 200, 50)]:
        mesh, _ = structured_box_mesh(nx, ny, nz)
        C, K = mesh.cell_neighbors.shape
        interior = np.asarray(
            mesh.face_interior[mesh.cell_faces] & mesh.cell_face_mask
        )
        rng = np.random.default_rng(0)
        for dt in (jnp.float64, jnp.float32):
            diag = jnp.asarray(rng.standard_normal(C), dt)
            off = jnp.asarray(rng.standard_normal((C, K)) * interior, dt)
            nbr = mesh.cell_neighbors
            x = jnp.asarray(rng.standard_normal(C), dt)
            nb = jnp.dtype(dt).itemsize
            # diag + off + x + y data; neighbor indices only on the
            # gather path.
            bytes_shift = C * nb * (1 + K + 1 + 1)
            bytes_gather = bytes_shift + C * K * 4 + C * K * nb

            t_shift = slope(
                lambda v: ell_spmv(diag, off, nbr, v, mesh.neighbor_offsets), x
            )
            t_gather = slope(lambda v: ell_spmv(diag, off, nbr, v, None), x)
            rows.append(
                (
                    C,
                    jnp.dtype(dt).name,
                    t_shift * 1e6,
                    bytes_shift / t_shift / 1e9,
                    t_gather * 1e6,
                    bytes_gather / t_gather / 1e9,
                )
            )
            print(
                f"C={C:>9} {jnp.dtype(dt).name}: "
                f"shift {t_shift*1e6:8.1f} us ({bytes_shift/t_shift/1e9:6.1f} GB/s, "
                f"{100*bytes_shift/t_shift/1e9/V5E_HBM_GBPS:5.1f}% roofline)  "
                f"gather {t_gather*1e6:8.1f} us ({bytes_gather/t_gather/1e9:6.1f} GB/s)"
            )
    return rows


if __name__ == "__main__":
    main()
