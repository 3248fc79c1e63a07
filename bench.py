"""Benchmark: SIMPLE iterations/sec on the couette_flow_128x64x1 case.

Runs the reference's VALIDATED configuration (pressure-driven couette
with a moving wall, tests.rs:44-152 / main.rs:84-102) with the
reference's default discretization (CD1 + SecondOrder pressure +
Rhie-Chow face velocities, lib.rs:58-74) and 50-iteration
preconditioned BiCGSTAB on the real TPU chip, asserts the bulk
velocity tracks the analytical channel profile, and prints ONE JSON
line:

    {"metric": ..., "value": N, "unit": "iters/sec", "vs_baseline": N}

The reference publishes no absolute numbers (BASELINE.md); the baseline
below is this framework's own round-1 measurement, so vs_baseline
tracks round-over-round improvement.
"""

import json
import os
import sys
import time

# Round-1 self-generated baseline (iters/sec, default f64 config, one
# v5e chip; measured 2026-08-16 with physics validated against the
# analytical channel profile). vs_baseline tracks round-over-round
# improvement against it.
BASELINE_ITERS_PER_SEC = 588.0

REF_MESH = "/root/reference/examples/couette_flow_128x64x1.msh"


def build_case():
    import jax.numpy as jnp

    from orc_tpu.mesh import read_mesh, structured_box_mesh
    from orc_tpu.mesh.zones import FaceCondition

    dtype = (
        jnp.float32
        if os.environ.get("BENCH_DTYPE", "f64") == "f32"
        else jnp.float64
    )
    if os.path.exists(REF_MESH):
        mesh, table = read_mesh(REF_MESH, dtype=dtype)
    else:
        mesh, table = structured_box_mesh(
            128, 64, 1, lengths=(0.002, 0.001, 0.0001), dtype=dtype
        )
    # BCs of the reference's VALIDATED case (solve_channel_flow,
    # tests.rs:60-76 with main.rs:84-102 parameters): moving top wall
    # 5e-4 m/s + streamwise dp/dx = 10 Pa/m. Analytical
    # u_mean = U/2 + h^2/(12 mu) dp/dx = 1.0833e-3 m/s.
    table.set("TOP_WALL", FaceCondition.WALL, vector_value=(5e-4, 0.0, 0.0))
    table.set("BOTTOM_WALL", FaceCondition.WALL)
    table.set("INLET", FaceCondition.PRESSURE_INLET, scalar_value=0.02)
    table.set("OUTLET", FaceCondition.PRESSURE_OUTLET, scalar_value=0.0)
    table.set("PERIODIC_-Z", FaceCondition.SYMMETRY)
    table.set("PERIODIC_+Z", FaceCondition.SYMMETRY)
    return mesh, table


def main():
    import jax

    # Persistent compilation cache: the AMG graph takes minutes to
    # compile cold; cached recompiles are seconds.
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/orc_tpu_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    from orc_tpu.solver.simple import initial_state, solve_steady
    from orc_tpu.utils.settings import (
        MatrixSolverSettings,
        NumericalSettings,
        PreconditionMethod,
        SolutionMethod,
    )

    mesh, table = build_case()
    # Solver: Jacobi-preconditioned BiCGSTAB with relative-residual
    # early exit — fastest in this framework at this size (the
    # reference's multigrid claim, lib.rs:33, does not transfer: a
    # V-cycle with 50-iteration smoothers costs ~12x here).
    solver_name = os.environ.get("BENCH_SOLVER", "bicgstab")
    mg_smooth = os.environ.get("BENCH_MG_SMOOTH")  # smoother iters/level
    settings = NumericalSettings(
        matrix_solver=MatrixSolverSettings(
            solver_type=SolutionMethod(solver_name),
            iterations=50,
            preconditioner=PreconditionMethod.JACOBI,
            multigrid_smoother_iterations=(
                int(mg_smooth) if mg_smooth else None
            ),
        ),
    )
    rho, mu = 1000.0, 0.001
    state = initial_state(mesh)

    n_iters = int(os.environ.get("BENCH_ITERS", "100"))
    # Build one chunk runner and time its SECOND dispatch so compile
    # time and constant upload stay out of the measurement.
    import jax.numpy as jnp

    from orc_tpu.ops.assembly import diffusion_system
    from orc_tpu.ops.fields import device_bc, face_bc
    from orc_tpu.solver.simple import _make_chunk_runner

    zc, zs, zv = device_bc(table, dtype=mesh.dtype)
    fbc = face_bc(mesh, zc, zs, zv)
    diff = diffusion_system(mesh, fbc, jnp.asarray(mu, mesh.dtype))
    ck = ck_diff = None
    if os.environ.get("BENCH_CK", "1") == "1":
        from orc_tpu.ops.ck_ops import build_ck_geometry, ck_bc, ck_diffusion

        ck = build_ck_geometry(mesh, len(table.zone_ids))
        ck_diff = ck_diffusion(mesh, ck, ck_bc(ck, zc, zs, zv), jnp.asarray(mu, mesh.dtype))
    extras = {}
    if settings.matrix_solver.solver_type == SolutionMethod.MULTIGRID:
        from orc_tpu.solver.gmg import build_mg_hierarchy

        extras = dict(mg_hierarchy=build_mg_hierarchy(mesh, diff, settings))
    run = _make_chunk_runner(
        mesh, settings, diff, n_iters, extras, ck=ck, ck_diff=ck_diff
    )
    import numpy as np

    t0 = time.perf_counter()
    state, _ = run(state, zc, zs, zv, rho, mu)
    _ = np.asarray(state.p)  # host materialization = hard barrier
    print(f"warmup (incl. compile): {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # Median of several dependent dispatches; each is closed by a
    # device-to-host copy (block_until_ready alone can misreport through
    # the axon tunnel and yield bogus ~0 timings).
    times = []
    for _i in range(5):
        t0 = time.perf_counter()
        state, _ = run(state, zc, zs, zv, rho, mu)
        _ = np.asarray(state.p)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    print(
        "dispatch times: " + ", ".join(f"{t:.3f}s" for t in times),
        file=sys.stderr,
    )

    u = np.asarray(state.vel[:, 0])
    assert np.isfinite(u).all(), "benchmark produced non-finite fields"
    u_mean_analytical = 5e-4 / 2 + 1e-3**2 / (12 * 0.001) * 10.0
    print(
        f"sanity: u_mean={u.mean():.3e} (analytical "
        f"{u_mean_analytical:.3e}) u_min={u.min():.3e} u_max={u.max():.3e}",
        file=sys.stderr,
    )
    # After warmup + measured run (>= 2 * BENCH_ITERS iterations) the
    # bulk velocity must be tracking the analytical value.
    assert abs(u.mean() - u_mean_analytical) / u_mean_analytical < 0.25, (
        "benchmark physics drifted from the analytical solution"
    )
    iters_per_sec = n_iters / dt
    print(
        f"{n_iters} SIMPLE iterations in {dt:.2f}s -> "
        f"{iters_per_sec:.2f} iters/sec ({1e3*dt/n_iters:.2f} ms/iter)",
        file=sys.stderr,
    )

    vs = (
        iters_per_sec / BASELINE_ITERS_PER_SEC
        if BASELINE_ITERS_PER_SEC
        else 1.0
    )
    dtype_name = os.environ.get("BENCH_DTYPE", "f64")
    print(
        json.dumps(
            {
                "metric": "SIMPLE iters/sec, couette_128x64x1, "
                f"CD1+SecondOrder+RhieChow+{solver_name}(50), {dtype_name}",
                "value": round(iters_per_sec, 3),
                "unit": "iters/sec",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
