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

    def slope(f, x0, n=512):
        # Hardened timing (see scripts/bench_layout.py): wide scan-slope
        # interval + a tiny dependent device-to-host copy as the barrier
        # (block_until_ready misreports through the axon tunnel; the
        # original narrow-interval numbers understated bandwidth ~2x).
        def run(n_steps):
            g = jax.jit(
                lambda x: lax.scan(
                    lambda c, _: (f(c), None), x, None, length=n_steps
                )[0][:8]
            )
            _ = np.asarray(g(x0))
            ts = []
            for _i in range(3):
                t0 = time.perf_counter()
                _ = np.asarray(g(x0))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[1]

        n0 = max(1, n // 8)
        t1, tn = run(n0), run(n)
        return (tn - t1) / (n - n0)

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
            # Gather path: only at small sizes — a 512-step gather scan
            # at 1M cells is a ~30s dispatch and has crashed the TPU
            # worker through the tunnel; the 8k-cell number already
            # shows the ~200-400x gap.
            if C <= 100_000:
                t_gather = slope(
                    lambda v: ell_spmv(diag, off, nbr, v, None), x, n=64
                )
            else:
                t_gather = float("nan")
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
