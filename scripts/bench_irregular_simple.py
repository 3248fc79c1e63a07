"""End-to-end SIMPLE ms/iter on a genuinely IRREGULAR mesh vs its
structured twin (VERDICT r3 item 3).

The irregular mesh is the lid cavity with randomly permuted cell ids
(the reference's native unstructured mesh class, io.rs:32-515): no
structured offsets exist, so the whole solver stack rides the
compile-time RCM reordering + slice-plan SpMV (mesh/reorder.py +
ops/pallas_slice.py). The structured twin runs the circular-shift
SpMV. Identical physics/settings (UD + LinearWeighted + implicit +
BiCGSTAB(50)), f32 — the bench_cavity.py configuration.

Prints ms/iter for both and the irregular/structured ratio (the price
of genuine unstructure; the pre-round-3 element-gather path paid
~50-400x).

Usage: python scripts/bench_irregular_simple.py [n]   (box n x n)
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/orc_tpu_jax_cache")

    from bench_irregular import build_irregular
    from orc_tpu.ops.assembly import diffusion_system
    from orc_tpu.ops.fields import device_bc, face_bc
    from orc_tpu.ops.ck_ops import build_ck_geometry, ck_bc, ck_diffusion
    from orc_tpu.models.cavity import cavity_case
    from orc_tpu.solver.simple import (
        _make_chunk_runner,
        _pallas_asm_spec,
        initial_state,
    )
    from orc_tpu.utils.settings import (
        MatrixSolverSettings,
        MomentumScheme,
        NumericalSettings,
        PreconditionMethod,
        PressureInterpolation,
        PressureVelocityCoupling,
        RelaxationMode,
        SolutionMethod,
        VelocityInterpolation,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 448
    dtype = jnp.float32
    print(f"backend: {jax.devices()}", file=sys.stderr)
    t0 = time.perf_counter()
    mesh_s, mesh_i = build_irregular(n, dtype)
    _, table = cavity_case(n=n, dtype=dtype)
    print(
        f"built {mesh_s.n_cells}-cell structured + irregular twin "
        f"({time.perf_counter()-t0:.0f}s); slice plan "
        f"ntiles={mesh_i.slice_plan.ntiles} n_max={mesh_i.slice_plan.n_max} "
        f"win_rows={mesh_i.slice_plan.win_rows}",
        file=sys.stderr,
    )

    settings = NumericalSettings(
        momentum=MomentumScheme.UD,
        # Parity loop so both meshes run the identical stateless step
        # (FC equivalence on irregular meshes is pinned in
        # tests/test_fc.py; this measures the SpMV story).
        pressure_velocity_coupling=PressureVelocityCoupling.SIMPLE,
        pressure_interpolation=PressureInterpolation.LINEAR_WEIGHTED,
        velocity_interpolation=VelocityInterpolation.LINEAR_WEIGHTED,
        matrix_solver=MatrixSolverSettings(
            solver_type=SolutionMethod.BICGSTAB,
            iterations=50,
            preconditioner=PreconditionMethod.JACOBI,
        ),
        pressure_relaxation=0.1,
        momentum_relaxation=0.7,
        relaxation_mode=RelaxationMode.IMPLICIT,
    )
    rho, mu = 1.0, 1e-3
    n_iters = 25
    out = {}
    for label, mesh in (("structured", mesh_s), ("irregular", mesh_i)):
        zc, zs, zv = device_bc(table, dtype=dtype)
        ck = build_ck_geometry(mesh, len(table.zone_ids))
        ck_diff = ck_diffusion(
            mesh, ck, ck_bc(ck, zc, zs, zv), jnp.asarray(mu, dtype)
        )
        pallas_asm = _pallas_asm_spec(mesh, table, settings, ck)
        run = _make_chunk_runner(
            mesh, settings, None, n_iters, {}, ck=ck, ck_diff=ck_diff,
            pallas_asm=pallas_asm, maybe_singular=False,
        )
        state = initial_state(mesh)
        t0 = time.perf_counter()
        state, _ = run(state, zc, zs, zv, rho, mu)
        _ = np.asarray(state.p[:8])
        print(
            f"{label}: warmup {time.perf_counter()-t0:.1f}s "
            f"(fused asm: {pallas_asm is not None})",
            file=sys.stderr,
        )
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            state, _ = run(state, zc, zs, zv, rho, mu)
            _ = np.asarray(state.p[:8])
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        ms = 1e3 * dt / n_iters
        out[label] = ms
        u = np.asarray(state.vel[:, 0])
        assert np.isfinite(u).all(), label
        print(f"{label:10s}: {ms:8.2f} ms/iter")
    print(
        f"irregular/structured ratio: "
        f"{out['irregular']/out['structured']:.2f}x"
    )


if __name__ == "__main__":
    main()
