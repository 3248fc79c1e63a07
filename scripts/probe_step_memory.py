"""Compile-only memory analysis of the real SIMPLE step graphs at a
given size (default 2048^2 f32 = the documented OOM case). Prints
argument/output/temp sizes per graph so the K-major relayout can be
targeted at the buffers that actually blow up.

Usage: python scripts/probe_step_memory.py [nx] [f32|f64] [ck|face|geo ...]
"""

import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/orc_tpu_jax_cache")
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    dtype = jnp.float64 if "f64" in sys.argv[2:] else jnp.float32
    which = [a for a in sys.argv[2:] if a in ("ck", "face", "geo")] or [
        "geo", "ck", "face"
    ]

    from orc_tpu.models.cavity import cavity_case
    from orc_tpu.ops.assembly import diffusion_system
    from orc_tpu.ops.fields import device_bc, face_bc
    from orc_tpu.solver.simple import _run_scan, initial_state
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

    mesh, table = cavity_case(n=nx, nz=1, lid_velocity=1.0, dtype=dtype)
    print(f"{nx}x{nx} = {mesh.n_cells} cells, {jnp.dtype(dtype).name}",
          file=sys.stderr)
    rho, mu = 1.0, 1e-3
    settings = NumericalSettings(
        momentum=MomentumScheme.UD,
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
    zc, zs, zv = device_bc(table, dtype=mesh.dtype)
    state = initial_state(mesh)
    gb = 1 / (1 << 30)

    def analyze(name, fn, *args, **kw):
        m = jax.jit(fn, **kw).lower(*args).compile().memory_analysis()
        print(
            f"{name:24s} args {m.argument_size_in_bytes*gb:7.2f} GiB  "
            f"out {m.output_size_in_bytes*gb:7.2f} GiB  "
            f"temp {m.temp_size_in_bytes*gb:7.2f} GiB"
        )

    if "geo" in which:
        from orc_tpu.ops.ck_ops import _expand_geometry

        analyze("ck geometry build", lambda m: _expand_geometry(m), mesh)

    if "ck" in which:
        from orc_tpu.ops.ck_ops import build_ck_geometry, ck_bc, ck_diffusion

        ck = build_ck_geometry(mesh, len(table.zone_ids))
        ck_diff = ck_diffusion(mesh, ck, ck_bc(ck, zc, zs, zv), mu)
        analyze(
            "ck step x1",
            lambda *a: _run_scan(
                *a,
                settings=settings,
                n_steps=1,
                n_colors=0,
                use_ck=True,
            ),
            mesh, None, ck, ck_diff, state, zc, zs, zv, rho, mu, None, None,
        )

    if "face" in which:
        fbc = face_bc(mesh, zc, zs, zv)
        diff = diffusion_system(mesh, fbc, jnp.asarray(mu, mesh.dtype))
        analyze(
            "face-major step x1",
            lambda *a: _run_scan(
                *a,
                settings=settings,
                n_steps=1,
                n_colors=0,
                use_ck=False,
            ),
            mesh, diff, None, None, state, zc, zs, zv, rho, mu, None, None,
        )


if __name__ == "__main__":
    main()
