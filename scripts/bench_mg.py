"""MULTIGRID (structured GMG) vs BiCGSTAB: ms/iter and convergence.

Round-1 AMG was 22x slower than BiCGSTAB per SIMPLE iteration
(BASELINE.md); the structured geometric hierarchy (solver/gmg.py) keeps
every level on the shift-SpMV path. This measures both solvers on the
8k couette bench and on larger cavities to locate the crossover.

Usage: python scripts/bench_mg.py [case ...]
  cases: couette (default), cavity512, cavity1024, cavity2048
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def bench_case(name):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/orc_tpu_jax_cache")

    from orc_tpu.mesh.generate import structured_box_mesh
    from orc_tpu.mesh.tgrid import read_mesh
    from orc_tpu.mesh.zones import FaceCondition
    from orc_tpu.ops.assembly import diffusion_system
    from orc_tpu.ops.fields import device_bc, face_bc
    from orc_tpu.ops.ck_ops import build_ck_geometry, ck_bc, ck_diffusion
    from orc_tpu.solver.simple import _make_chunk_runner, initial_state
    from orc_tpu.utils.settings import (
        MatrixSolverSettings,
        MomentumScheme,
        NumericalSettings,
        PreconditionMethod,
        PressureInterpolation,
        RelaxationMode,
        SolutionMethod,
        VelocityInterpolation,
    )

    if name == "couette":
        dtype = jnp.float64
        mesh, table = read_mesh(
            "/root/reference/examples/couette_flow_128x64x1.msh", dtype=dtype
        )
        table.set("INLET", FaceCondition.PRESSURE_INLET, scalar_value=0.02)
        table.set("OUTLET", FaceCondition.PRESSURE_OUTLET, scalar_value=0.0)
        table.set("TOP_WALL", FaceCondition.WALL, vector_value=(5e-4, 0, 0))
        table.set("BOTTOM_WALL", FaceCondition.WALL)
        table.set("PERIODIC_-Z", FaceCondition.SYMMETRY)
        table.set("PERIODIC_+Z", FaceCondition.SYMMETRY)
        rho, mu = 1000.0, 0.001
        momentum = MomentumScheme.CD1
        p_interp = PressureInterpolation.SECOND_ORDER
        v_interp = VelocityInterpolation.RHIE_CHOW
        relax = {}
        n_iters = 100
    else:
        n = int(name.replace("cavity", ""))
        dtype = jnp.float32
        from orc_tpu.models.cavity import cavity_case

        mesh, table = cavity_case(n=n, lid_velocity=1.0, dtype=dtype)
        rho, mu = 1.0, 1.0 / 1000.0
        momentum = MomentumScheme.UD
        p_interp = PressureInterpolation.LINEAR_WEIGHTED
        v_interp = VelocityInterpolation.LINEAR_WEIGHTED
        relax = dict(
            pressure_relaxation=0.1,
            momentum_relaxation=0.7,
            relaxation_mode=RelaxationMode.IMPLICIT,
        )
        n_iters = 20

    zc, zs, zv = device_bc(table, dtype=mesh.dtype)
    fbc = face_bc(mesh, zc, zs, zv)
    diff = diffusion_system(mesh, fbc, jnp.asarray(mu, mesh.dtype))
    ck = build_ck_geometry(mesh, len(table.zone_ids))
    ck_diff = ck_diffusion(
        mesh, ck, ck_bc(ck, zc, zs, zv), jnp.asarray(mu, mesh.dtype)
    )

    solvers = {
        "bicgstab": MatrixSolverSettings(
            solver_type=SolutionMethod.BICGSTAB,
            iterations=50,
            preconditioner=PreconditionMethod.JACOBI,
        ),
        # The reference's BiCGSTAB semantics: fixed 50 sweeps, no
        # relative-residual exit (linear_algebra.rs:255-268) — the
        # regime in which its "multigrid is by far the fastest" claim
        # (lib.rs:33) was made.
        "bicgstab_fixed50": MatrixSolverSettings(
            solver_type=SolutionMethod.BICGSTAB,
            iterations=50,
            relative_convergence_threshold=0.0,
            preconditioner=PreconditionMethod.JACOBI,
        ),
        "multigrid": MatrixSolverSettings(
            solver_type=SolutionMethod.MULTIGRID,
            iterations=50,
            multigrid_levels=6,
            multigrid_smoother_iterations=4,
            preconditioner=PreconditionMethod.JACOBI,
        ),
    }
    out = {}
    for sname, ms in solvers.items():
        settings = NumericalSettings(
            momentum=momentum,
            pressure_interpolation=p_interp,
            velocity_interpolation=v_interp,
            matrix_solver=ms,
            **relax,
        )
        extras = {}
        if ms.solver_type == SolutionMethod.MULTIGRID:
            from orc_tpu.solver.gmg import build_mg_hierarchy

            class S:
                matrix_solver = ms

            h = build_mg_hierarchy(mesh, diff, S)
            extras = dict(mg_hierarchy=h)
            print(f"  {sname}: {len(h)} levels "
                  f"{[l.cdims for l in h]}", file=sys.stderr)
        run = _make_chunk_runner(
            mesh, settings, diff, n_iters, extras, ck=ck, ck_diff=ck_diff
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
        vc = float(np.asarray(m.vel_corr_norm)[-1])
        assert np.isfinite(np.asarray(state.vel)).all()
        out[sname] = (1e3 * dt / n_iters, pc, vc)
        print(
            f"  {sname}: {1e3 * dt / n_iters:.3f} ms/iter  "
            f"p_corr={pc:.3e} vel_corr={vc:.3e}",
        )
    r = out["multigrid"][0] / out["bicgstab"][0]
    print(f"{name}: multigrid/bicgstab ms ratio = {r:.2f}  "
          f"(p_corr ratio {out['multigrid'][1] / max(out['bicgstab'][1], 1e-300):.2f})")
    if "bicgstab_fixed50" in out:
        rf = out["multigrid"][0] / out["bicgstab_fixed50"][0]
        print(f"{name}: multigrid/bicgstab_fixed50 ms ratio = {rf:.2f}")


def main():
    cases = sys.argv[1:] or ["couette"]
    for c in cases:
        print(f"=== {c} ===")
        bench_case(c)


if __name__ == "__main__":
    main()
