"""Irregular-mesh SpMV micro-bench: slice-plan vs gather vs structured.

Builds a genuinely irregular mesh (a structured box whose cells are
randomly permuted, so no structured offsets exist — the reference's
native mesh class, io.rs:32-515) at ~200k cells, then times the three
ELL SpMV paths with the hardened scan-slope recipe (wide interval +
dependent device-to-host barrier, see scripts/bench_layout.py):

- structured shift SpMV on the unpermuted twin (the speed-of-light
  reference point),
- slice-plan SpMV (mesh/reorder.py: compile-time RCM + per-tile
  distinct-delta contiguous slices) on the irregular mesh,
- element-gather SpMV on the irregular mesh (what every irregular mesh
  paid before round 3).

Usage: python scripts/bench_irregular.py [n]   (box is n x n, f32)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

V5E_HBM_GBPS = 819.0


def build_irregular(n, dtype, seed=0):
    import numpy as np
    import jax.numpy as jnp

    from orc_tpu.mesh.compile import compile_from_arrays
    from orc_tpu.models.cavity import cavity_case

    mesh, table = cavity_case(n=n, dtype=dtype)
    rng = np.random.default_rng(seed)
    C = mesh.n_cells
    perm = rng.permutation(C)
    inv = np.empty(C, np.int64)
    inv[perm] = np.arange(C)
    owner = inv[np.asarray(mesh.face_owner)]
    interior = np.asarray(mesh.face_interior)
    neighbor = np.where(interior, inv[np.asarray(mesh.face_neighbor)], -1)
    m2 = compile_from_arrays(
        dim=2,
        face_owner=owner,
        face_neighbor=neighbor,
        face_area=np.asarray(mesh.face_area),
        face_normal=np.asarray(mesh.face_normal),
        face_centroid=np.asarray(mesh.face_centroid),
        face_zone_slot=np.asarray(mesh.face_zone_slot),
        cell_centroid=np.asarray(mesh.cell_centroid)[perm],
        cell_volume=np.asarray(mesh.cell_volume)[perm],
        dtype=dtype,
    )
    return mesh, m2


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from orc_tpu.ops.spmv import EllMatrix

    jax.config.update("jax_compilation_cache_dir", "/tmp/orc_tpu_jax_cache")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 448
    dtype = jnp.float32
    print(f"backend: {jax.devices()}", file=sys.stderr)
    t0 = time.perf_counter()
    mesh_s, mesh_i = build_irregular(n, dtype)
    print(
        f"built {mesh_s.n_cells}-cell structured + irregular twin "
        f"({time.perf_counter()-t0:.0f}s); slice plan: "
        f"ntiles={mesh_i.slice_plan.ntiles} n_max={mesh_i.slice_plan.n_max}",
        file=sys.stderr,
    )

    def slope(f, x0, nsteps=512):
        def run(n_steps):
            g = jax.jit(
                lambda x: lax.scan(
                    lambda c, _: (f(c), None), x, None, length=n_steps
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

    rng = np.random.default_rng(0)
    results = {}
    for label, mesh in (("structured", mesh_s), ("irregular", mesh_i)):
        C, K = mesh.cell_neighbors.shape
        interior = np.asarray(
            mesh.face_interior[mesh.cell_faces] & mesh.cell_face_mask
        )
        diag = jnp.asarray(rng.standard_normal(C), dtype)
        off = jnp.asarray(rng.standard_normal((C, K)) * interior, dtype)
        x = jnp.asarray(rng.standard_normal(C), dtype)
        nb = jnp.dtype(dtype).itemsize
        bytes_min = C * nb * (1 + K + 1 + 1)  # diag+off+x+y

        A = EllMatrix(
            diag=diag, off=off, neighbors=mesh.cell_neighbors,
            offsets=mesh.neighbor_offsets, plan=mesh.slice_plan,
        )
        if label == "structured":
            t = slope(A.matvec, x)
            results["shift"] = t
            print(
                f"structured shift : {t*1e6:8.1f} us/SpMV "
                f"({bytes_min/t/1e9:6.1f} GB/s, "
                f"{100*bytes_min/t/1e9/V5E_HBM_GBPS:.1f}% roofline)"
            )
        else:
            Ap = jax.jit(lambda a: a.prepare())(A)
            t = slope(Ap.matvec, x)
            results["slice"] = t
            print(
                f"irregular slice  : {t*1e6:8.1f} us/SpMV "
                f"({bytes_min/t/1e9:6.1f} GB/s min-traffic, "
                f"{t/results['shift']:.1f}x structured shift)"
            )
            tg = slope(
                lambda v: EllMatrix(
                    diag=diag, off=off, neighbors=mesh.cell_neighbors
                ).matvec(v),
                x,
                nsteps=64,
            )
            results["gather"] = tg
            print(
                f"irregular gather : {tg*1e6:8.1f} us/SpMV "
                f"({tg/results['shift']:.0f}x structured shift, "
                f"slice wins {tg/t:.0f}x)"
            )
            # prepare() cost, amortized over a solve's SpMVs. Not
            # scan-slope-able (prepare changes the pytree's static
            # slice_layout flag, so it cannot be a scan carry): time
            # jitted dispatches directly with the host-copy barrier.
            prep = jax.jit(lambda off: A.with_values(diag, off).prepare().off)
            _ = np.asarray(prep(off).ravel()[:8])
            ts = []
            for _ in range(7):
                t1 = time.perf_counter()
                _ = np.asarray(prep(off).ravel()[:8])
                ts.append(time.perf_counter() - t1)
            tp = sorted(ts)[len(ts) // 2]
            print(f"prepare() cost   : {tp*1e6:8.1f} us (once per solve)")
    return results


if __name__ == "__main__":
    main()
