"""AMG vs BiCGSTAB on a genuinely IRREGULAR 8k mesh: ms/iter + convergence.

VERDICT r2 item 4's perf bar: algebraic multigrid within ~3x of
BiCGSTAB ms/iter on the 8k irregular bench (round 1 measured 22x,
with gather SpMV smoothing and per-solve scatter Galerkin).

The mesh is the reference couette fixture (8001 cells) with its cells
randomly permuted, so no structured offsets exist and MULTIGRID
auto-selects the algebraic hierarchy (gmg.build_mg_hierarchy ->
amg.build_hierarchy); smoothing rides the slice-plan SpMV
(mesh/reorder.py). Same physics config as the headline couette bench.

Usage: python scripts/bench_amg_irregular.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/orc_tpu_jax_cache")

    from orc_tpu.mesh.compile import compile_from_arrays
    from orc_tpu.mesh.tgrid import read_mesh
    from orc_tpu.mesh.zones import FaceCondition
    from orc_tpu.ops.assembly import diffusion_system
    from orc_tpu.ops.fields import device_bc, face_bc
    from orc_tpu.solver.simple import _make_chunk_runner, initial_state
    from orc_tpu.utils.settings import (
        MatrixSolverSettings,
        MomentumScheme,
        NumericalSettings,
        PreconditionMethod,
        PressureInterpolation,
        SolutionMethod,
        VelocityInterpolation,
    )

    dtype = jnp.float64
    mesh0, table = read_mesh(
        "/root/reference/examples/couette_flow_128x64x1.msh", dtype=dtype
    )
    # Random cell permutation -> genuinely irregular adjacency (the
    # reference's native mesh class, io.rs:32-515). Faces keep their
    # geometry; only cell ids move.
    rng = np.random.default_rng(0)
    C = mesh0.n_cells
    perm = rng.permutation(C)
    inv = np.empty(C, np.int64)
    inv[perm] = np.arange(C)
    owner = inv[np.asarray(mesh0.face_owner)]
    interior = np.asarray(mesh0.face_interior)
    neighbor = np.where(interior, inv[np.asarray(mesh0.face_neighbor)], -1)
    mesh = compile_from_arrays(
        dim=2,
        face_owner=owner,
        face_neighbor=neighbor,
        face_area=np.asarray(mesh0.face_area),
        face_normal=np.asarray(mesh0.face_normal),
        face_centroid=np.asarray(mesh0.face_centroid),
        face_zone_slot=np.asarray(mesh0.face_zone_slot),
        cell_centroid=np.asarray(mesh0.cell_centroid)[perm],
        cell_volume=np.asarray(mesh0.cell_volume)[perm],
        dtype=dtype,
    )
    assert mesh.neighbor_offsets is None, "must be irregular"
    print(
        f"backend: {jax.devices()}; {mesh.n_cells} cells, irregular "
        f"(slice plan ntiles={mesh.slice_plan.ntiles})",
        file=sys.stderr,
    )

    table.set("INLET", FaceCondition.PRESSURE_INLET, scalar_value=0.02)
    table.set("OUTLET", FaceCondition.PRESSURE_OUTLET, scalar_value=0.0)
    table.set("TOP_WALL", FaceCondition.WALL, vector_value=(5e-4, 0, 0))
    table.set("BOTTOM_WALL", FaceCondition.WALL)
    table.set("PERIODIC_-Z", FaceCondition.SYMMETRY)
    table.set("PERIODIC_+Z", FaceCondition.SYMMETRY)
    rho, mu = 1000.0, 0.001

    zc, zs, zv = device_bc(table, dtype=mesh.dtype)
    fbc = face_bc(mesh, zc, zs, zv)
    diff = diffusion_system(mesh, fbc, jnp.asarray(mu, mesh.dtype))

    solvers = {
        "bicgstab": MatrixSolverSettings(
            solver_type=SolutionMethod.BICGSTAB,
            iterations=50,
            preconditioner=PreconditionMethod.JACOBI,
        ),
        "amg": MatrixSolverSettings(
            solver_type=SolutionMethod.MULTIGRID,
            iterations=50,
            multigrid_levels=4,
            multigrid_smoother_iterations=4,
            preconditioner=PreconditionMethod.JACOBI,
        ),
    }
    n_iters = 100
    out = {}
    for sname, ms in solvers.items():
        settings = NumericalSettings(
            momentum=MomentumScheme.CD1,
            pressure_interpolation=PressureInterpolation.SECOND_ORDER,
            velocity_interpolation=VelocityInterpolation.RHIE_CHOW,
            matrix_solver=ms,
        )
        extras = {}
        if ms.solver_type == SolutionMethod.MULTIGRID:
            from orc_tpu.solver.gmg import build_mg_hierarchy

            class S:
                matrix_solver = ms

            h = build_mg_hierarchy(mesh, diff, S)
            sizes = [getattr(l, "n_coarse", None) for l in h]
            print(f"  amg: {len(h)} levels, coarse sizes {sizes}",
                  file=sys.stderr)
            extras = dict(mg_hierarchy=h)
        run = _make_chunk_runner(
            mesh, settings, diff, n_iters, extras, ck=None, ck_diff=None
        , maybe_singular=False)
        state = initial_state(mesh)
        state, m = run(state, zc, zs, zv, rho, mu)
        _ = np.asarray(state.p[:8])
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            state, m = run(state, zc, zs, zv, rho, mu)
            _ = np.asarray(state.p[:8])
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        pc = float(np.asarray(m.p_corr_norm)[-1])
        out[sname] = (1e3 * dt / n_iters, pc)
        print(
            f"{sname:10s}: {1e3*dt/n_iters:7.2f} ms/iter, "
            f"p_corr after {5*n_iters} iters = {pc:.3e}"
        )
    ratio = out["amg"][0] / out["bicgstab"][0]
    print(f"amg/bicgstab ms/iter ratio: {ratio:.2f}x (round-1: 22x)")


if __name__ == "__main__":
    main()
