"""Measure compensated-f32 reductions vs the f64 residual-history
fixture (VERDICT round-1 item 7 / SURVEY §7 "hard part #2").

Runs the pinned couette bench config three ways — f64, plain f32,
compensated f32 — then reports:
- per-field max relative deviation of each f32 history from f64,
- whether compensation moves f32 toward the f64 trajectory,
- iterations/sec for each (on whatever backend is active; run via the
  tunnel for the real-chip numbers).

Usage: python scripts/bench_compensated.py [iters]
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def run(dtype_name, compensated, iters):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from orc_tpu.mesh.tgrid import read_mesh
    from orc_tpu.mesh.zones import FaceCondition
    from orc_tpu.solver.simple import (
        initial_state,
        solve_steady,
        stack_history,
    )
    from orc_tpu.utils.settings import (
        MatrixSolverSettings,
        MomentumScheme,
        NumericalSettings,
        PreconditionMethod,
        PressureInterpolation,
        SolutionMethod,
        VelocityInterpolation,
    )

    dtype = jnp.float64 if dtype_name == "f64" else jnp.float32
    mesh, table = read_mesh(
        "/root/reference/examples/couette_flow_128x64x1.msh", dtype=dtype
    )
    # The reference's validated couette case (tests.rs:44-152).
    table.set("INLET", FaceCondition.PRESSURE_INLET, scalar_value=0.02)
    table.set("OUTLET", FaceCondition.PRESSURE_OUTLET, scalar_value=0.0)
    table.set("TOP_WALL", FaceCondition.WALL, vector_value=(5e-4, 0.0, 0.0))
    table.set("BOTTOM_WALL", FaceCondition.WALL)
    table.set("PERIODIC_-Z", FaceCondition.SYMMETRY)
    table.set("PERIODIC_+Z", FaceCondition.SYMMETRY)
    settings = NumericalSettings(
        momentum=MomentumScheme.CD1,
        pressure_interpolation=PressureInterpolation.SECOND_ORDER,
        velocity_interpolation=VelocityInterpolation.RHIE_CHOW,
        matrix_solver=MatrixSolverSettings(
            solver_type=SolutionMethod.BICGSTAB,
            iterations=50,
            preconditioner=PreconditionMethod.JACOBI,
            compensated_f32=compensated,
        ),
    )
    state = initial_state(mesh)
    # Warm up compile.
    _, _ = solve_steady(
        mesh, table, settings, 1000.0, 0.001, state=state,
        iterations=10, reporting_interval=10, verbose=False,
    )
    t0 = time.perf_counter()
    final, history = solve_steady(
        mesh, table, settings, 1000.0, 0.001, state=state,
        iterations=iters, reporting_interval=10, verbose=False,
    )
    dt = time.perf_counter() - t0
    hs = stack_history(history)
    return hs, iters / dt, np.asarray(final.vel, np.float64)


def main():
    import numpy as np

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    results = {}
    rates = {}
    finals = {}
    for name, (dt, comp) in {
        "f64": ("f64", False),
        "f32": ("f32", False),
        "f32c": ("f32", True),
    }.items():
        hs, rate, vel = run(dt, comp, iters)
        results[name] = hs
        rates[name] = rate
        finals[name] = vel
        print(f"{name}: {rate:.1f} iters/sec", file=sys.stderr)

    ref = results["f64"]
    fields = (
        "vel_avg", "p_corr_norm", "vel_corr_norm",
        "mom_residual", "pc_residual", "peclet_avg",
    )
    for name in ("f32", "f32c"):
        print(f"--- {name} vs f64 ({rates[name]:.1f} vs "
              f"{rates['f64']:.1f} iters/sec) ---")
        for f in fields:
            got = np.asarray(getattr(results[name], f), np.float64)
            want = np.asarray(getattr(ref, f), np.float64)
            denom = np.maximum(np.abs(want), 1e-30)
            rel = np.abs(got - want) / denom
            n10 = max(1, len(rel) // 10)
            print(
                f"  {f:14s} first-10%: {np.max(rel[:n10]):.3e}  "
                f"final: {np.max(rel[-1:]):.3e}  worst: {np.max(rel):.3e}"
            )
        # Physics: the final velocity field on the flow scale.
        dv = np.abs(finals[name] - finals["f64"]).max()
        scale = np.abs(finals["f64"]).max()
        print(f"  final |vel| field deviation: {dv:.3e} "
              f"(flow scale {scale:.3e} -> {dv / scale:.2e} relative)")


if __name__ == "__main__":
    main()
