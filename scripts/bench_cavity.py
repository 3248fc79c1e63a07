"""Large-mesh single-chip benchmark: lid-driven cavity.

Measures SIMPLE iterations/sec at 1M+ cells (f32) on the current
backend — the single-chip end of BASELINE.md's scale-out story.

Usage: python scripts/bench_cavity.py [n] [dtype] [nz] [Re]
(nz > 1 builds an n*n*nz 3D cavity; above the ck memory ceiling the
face-major step is used automatically.)
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/orc_tpu_jax_cache"
    )
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    dtype = (
        jnp.float64
        if (len(sys.argv) > 2 and sys.argv[2] == "f64")
        else jnp.float32
    )
    nz = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    reynolds = float(sys.argv[4]) if len(sys.argv) > 4 else 1000.0
    n_cells = n * n * nz
    print(
        f"backend: {jax.devices()}, {n}x{n}x{nz} ({n_cells} cells), "
        f"{jnp.dtype(dtype).name}",
        file=sys.stderr,
    )

    from orc_tpu.models.cavity import cavity_case
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

    t0 = time.perf_counter()
    mesh, table = cavity_case(n=n, nz=nz, lid_velocity=1.0, dtype=dtype)
    print(f"mesh build: {time.perf_counter()-t0:.1f}s "
          f"(structured: {mesh.neighbor_offsets})", file=sys.stderr)
    rho, mu = 1.0, 1.0 / reynolds
    import os

    use_fc = os.environ.get("ORC_TPU_BENCH_FC", "0") == "1"
    # ORC_TPU_BENCH_SCHEME=default -> the reference's own default
    # numerics (CD1 + SecondOrder pressure + Rhie-Chow, lib.rs:58-74);
    # anything else -> the UD + LinearWeighted fast pair the scale
    # table has always used.
    ref_default = os.environ.get("ORC_TPU_BENCH_SCHEME", "") == "default"
    from orc_tpu.utils.settings import PressureVelocityCoupling

    settings = NumericalSettings(
        momentum=MomentumScheme.CD1 if ref_default else MomentumScheme.UD,
        pressure_velocity_coupling=(
            PressureVelocityCoupling.SIMPLE_FC
            if use_fc
            else PressureVelocityCoupling.SIMPLE
        ),
        pressure_interpolation=(
            PressureInterpolation.SECOND_ORDER
            if ref_default
            else PressureInterpolation.LINEAR_WEIGHTED
        ),
        velocity_interpolation=(
            VelocityInterpolation.RHIE_CHOW
            if ref_default
            else VelocityInterpolation.LINEAR_WEIGHTED
        ),
        matrix_solver=MatrixSolverSettings(
            solver_type=SolutionMethod.BICGSTAB,
            iterations=50,
            preconditioner=PreconditionMethod.JACOBI,
        ),
        # 3D needs a tighter pressure relaxation than 2D (0.1 diverges
        # from ~24^3 up; 0.02 converges monotonically to 48^3+). FC is
        # stable at the textbook 0.3.
        pressure_relaxation=(
            0.3 if use_fc else (0.1 if nz == 1 else 0.02)
        ),
        momentum_relaxation=0.7,
        relaxation_mode=RelaxationMode.IMPLICIT,
    )
    zc, zs, zv = device_bc(table, dtype=mesh.dtype)
    from orc_tpu.solver.simple import CK_AUTO_MAX_CELLS

    ck = ck_diff = diff = None
    if n_cells <= CK_AUTO_MAX_CELLS:
        t0 = time.perf_counter()
        ck = build_ck_geometry(mesh, len(table.zone_ids))
        ck_diff = ck_diffusion(
            mesh, ck, ck_bc(ck, zc, zs, zv), jnp.asarray(mu, mesh.dtype)
        )
        # Drop the face/[C,K]-index tables the ck step never reads so
        # their HBM is reclaimed (the runner trims its own copy, but
        # freeing needs this reference gone too).
        from orc_tpu.mesh.compile import trim_for_ck

        mesh = trim_for_ck(mesh)
        print(f"ck geometry: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    else:
        # Face-major step only: build its diffusion system here so the
        # ck path never materializes the [F]/[C,K] face tables it will
        # immediately trim (at 4096^2 f32 that transient is ~1.4 GB of
        # the HBM budget).
        fbc = face_bc(mesh, zc, zs, zv)
        diff = diffusion_system(mesh, fbc, jnp.asarray(mu, mesh.dtype))
        print("above ck ceiling -> face-major step", file=sys.stderr)

    # Fused assembly kernels exactly as solve_steady would pick them
    # (ops/pallas_assembly.py; ORC_TPU_PALLAS_ASM=0 opts out).
    from orc_tpu.solver.simple import _pallas_asm_spec

    pallas_asm = _pallas_asm_spec(mesh, table, settings, ck)
    print(f"fused assembly kernels: {pallas_asm is not None}",
          file=sys.stderr)

    # Keep single dispatches well under ~10s: longer ones have crashed
    # the TPU worker through the tunnel (CLAUDE.md).
    n_iters = int(os.environ.get("ORC_TPU_BENCH_ITERS", "50"))
    run = _make_chunk_runner(
        mesh, settings, diff, n_iters, {}, ck=ck, ck_diff=ck_diff,
        pallas_asm=pallas_asm, maybe_singular=use_fc, use_fc=use_fc,
    )
    state = initial_state(mesh)
    if use_fc:
        import dataclasses as _dc

        from orc_tpu.ops.ck_ops import ck_bc as _ckbc
        from orc_tpu.solver.fc import ck_initial_flux

        state = _dc.replace(
            state,
            flux=ck_initial_flux(
                mesh, ck, _ckbc(ck, zc, zs, zv), settings, state
            ),
        )
    t0 = time.perf_counter()
    state, _ = run(state, zc, zs, zv, rho, mu)
    _ = np.asarray(state.p)  # host copy = hard barrier (tunnel-safe)
    print(f"warmup (incl. compile): {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    # Median of several dispatches, each closed by a device-to-host
    # copy (block_until_ready can misreport through the axon tunnel).
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        state, m = run(state, zc, zs, zv, rho, mu)
        _ = np.asarray(state.p)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    print("dispatch times: " + ", ".join(f"{t:.3f}s" for t in times),
          file=sys.stderr)
    u = np.asarray(state.vel[:, 0])
    assert np.isfinite(u).all()
    assert np.abs(u).max() < 2.0, "cavity fields not physical"
    mi = np.asarray(m.mom_iters)
    pi = np.asarray(m.pc_iters)
    print(
        f"inner iters (mean of last chunk): momentum "
        f"{mi.mean(axis=0) if mi.ndim > 1 else mi.mean()}, "
        f"pressure {pi.mean():.1f}",
        file=sys.stderr,
    )
    print(
        f"{n_iters} iterations in {dt:.2f}s -> {n_iters/dt:.2f} iters/sec "
        f"({1e3*dt/n_iters:.2f} ms/iter) at {n_cells} cells; "
        f"u range [{u.min():.3f}, {u.max():.3f}]"
    )


if __name__ == "__main__":
    main()
