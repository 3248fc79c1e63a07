"""Compile-only memory analysis of individual face-major step
sub-graphs at a given size, to localize layout blowups.

Usage: python scripts/probe_subgraphs.py [nx]
"""

import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/orc_tpu_jax_cache")
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    dtype = jnp.float32

    from orc_tpu.models.cavity import cavity_case
    from orc_tpu.ops.assembly import (
        apply_pressure_correction,
        diffusion_system,
        momentum_system,
        pressure_correction_system,
    )
    from orc_tpu.ops.fields import device_bc, face_bc
    from orc_tpu.ops.gradients import pressure_gradient, velocity_gradient
    from orc_tpu.ops.interpolation import face_flux, face_pressure
    from orc_tpu.ops.spmv import EllMatrix
    from orc_tpu.solver.krylov import iterative_solve
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
    C, K = mesh.n_cells, mesh.max_faces_per_cell
    print(f"{C} cells K={K}", file=sys.stderr)
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
        relaxation_mode=RelaxationMode.IMPLICIT,
        momentum_relaxation=0.7,
        pressure_relaxation=0.1,
    )
    zc, zs, zv = device_bc(table, dtype=dtype)
    gb = 1 / (1 << 30)

    def analyze(name, fn, *args):
        try:
            m = jax.jit(fn).lower(*args).compile().memory_analysis()
            print(
                f"{name:22s} args {m.argument_size_in_bytes*gb:6.2f}  "
                f"out {m.output_size_in_bytes*gb:6.2f}  "
                f"temp {m.temp_size_in_bytes*gb:6.2f} GiB"
            )
        except Exception as e:
            msg = str(e)
            i = msg.find("Ran out of memory")
            print(f"{name:22s} OOM: {msg[i:i+60] if i>=0 else msg[:90]}")

    import numpy as np

    rng = np.random.default_rng(0)
    vel = jnp.asarray(rng.standard_normal((C, 3)), dtype)
    p = jnp.asarray(rng.standard_normal(C), dtype)
    md = jnp.asarray(1.0 + rng.random((C, 3)), dtype)
    flux = jnp.asarray(rng.standard_normal(mesh.n_faces), dtype)
    pf = jnp.asarray(rng.standard_normal(mesh.n_faces), dtype)
    diag3 = jnp.asarray(1.0 + rng.random((3, C)), dtype)
    off3 = jnp.asarray(rng.standard_normal((3, C, K)) * 0.1, dtype)
    b3 = jnp.asarray(rng.standard_normal((3, C)), dtype)
    x3 = jnp.zeros((3, C), dtype)

    fbc_f = lambda: face_bc(mesh, zc, zs, zv)

    analyze("diffusion_system", lambda m_: diffusion_system(m_, fbc_f(), mu), mesh)
    analyze(
        "face_flux(LW)",
        lambda m_, v: face_flux(m_, fbc_f(), v, settings.velocity_interpolation),
        mesh, vel,
    )
    analyze(
        "pressure_gradient",
        lambda m_, p_: pressure_gradient(m_, fbc_f(), p_),
        mesh, p,
    )
    diff = diffusion_system(mesh, face_bc(mesh, zc, zs, zv), mu)

    analyze(
        "momentum_system",
        lambda m_, v, fl, pfc, d: momentum_system(
            m_, fbc_f(), settings, rho, v, fl, pfc, d
        ),
        mesh, vel, flux, pf, diff,
    )

    def solve3(diag, off, b, x0, m_):
        def one(dg, of, bb, xx):
            A = EllMatrix(diag=dg, off=of, neighbors=m_.cell_neighbors,
                          offsets=m_.neighbor_offsets)
            return iterative_solve(A, bb, xx, settings.matrix_solver)

        return jax.vmap(one)(diag, off, b, x0)

    analyze("bicgstab50 x3", solve3, diag3, off3, b3, x3, mesh)
    analyze(
        "p_correction_system",
        lambda m_, fl, md_: pressure_correction_system(m_, fbc_f(), rho, fl, md_),
        mesh, flux, md,
    )
    analyze(
        "apply_correction",
        lambda m_, pp, md_, v, p_: apply_pressure_correction(
            m_, fbc_f(), settings, pp, md_, v, p_
        ),
        mesh, p, md, vel, p,
    )


def chain():
    """Progressive prefixes of simple_step, in-graph chained."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/orc_tpu_jax_cache")
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    dtype = jnp.float32

    from orc_tpu.models.cavity import cavity_case
    from orc_tpu.ops.assembly import (
        apply_pressure_correction,
        diffusion_system,
        momentum_system,
        pressure_correction_system,
    )
    from orc_tpu.ops.fields import device_bc, face_bc
    from orc_tpu.ops.interpolation import face_flux, face_pressure
    from orc_tpu.ops.spmv import EllMatrix
    from orc_tpu.solver.krylov import iterative_solve
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
    C = mesh.n_cells
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
        relaxation_mode=RelaxationMode.IMPLICIT,
        momentum_relaxation=0.7,
        pressure_relaxation=0.1,
    )
    zc, zs, zv = device_bc(table, dtype=dtype)
    gb = 1 / (1 << 30)

    def analyze(name, fn, *args):
        try:
            m = jax.jit(fn).lower(*args).compile().memory_analysis()
            print(
                f"{name:22s} args {m.argument_size_in_bytes*gb:6.2f}  "
                f"out {m.output_size_in_bytes*gb:6.2f}  "
                f"temp {m.temp_size_in_bytes*gb:6.2f} GiB"
            )
        except Exception as e:
            msg = str(e)
            i = msg.find("Ran out of memory")
            print(f"{name:22s} OOM: {msg[i:i+60] if i>=0 else msg[:90]}")

    rng = np.random.default_rng(0)
    vel = jnp.asarray(rng.standard_normal((C, 3)), dtype)
    p = jnp.asarray(rng.standard_normal(C), dtype)
    md = jnp.asarray(1.0 + rng.random((C, 3)), dtype)
    fbc0 = face_bc(mesh, zc, zs, zv)
    diff = diffusion_system(mesh, fbc0, mu)

    def prefix(stage):
        def fn(mesh, diff, vel, p, md):
            fbc = face_bc(mesh, zc, zs, zv)
            flux = face_flux(mesh, fbc, vel, settings.velocity_interpolation)
            p_f = face_pressure(mesh, fbc, p, settings.pressure_interpolation)
            if stage == 1:
                return flux, p_f
            A3, b3, pe = momentum_system(
                mesh, fbc, settings, rho, vel, flux, p_f, diff
            )
            if stage == 2:
                return A3.diag, A3.off, b3
            def one(dg, of, bb, xx):
                A = EllMatrix(
                    diag=dg, off=of, neighbors=mesh.cell_neighbors,
                    offsets=mesh.neighbor_offsets)
                return iterative_solve(A, bb, xx, settings.matrix_solver)
            x0 = jnp.moveaxis(vel, -1, 0)
            sol, info = jax.vmap(one)(A3.diag, A3.off, b3, x0)
            new_vel = jnp.moveaxis(sol, 0, -1)
            new_md = jnp.moveaxis(A3.diag, 0, -1)
            if stage == 3:
                return new_vel, new_md
            flux2 = face_flux(
                mesh, fbc, new_vel, settings.velocity_interpolation
            )
            Pmat, b_p = pressure_correction_system(mesh, fbc, rho, flux2, new_md)
            if stage == 4:
                return Pmat.diag, Pmat.off, b_p
            p_prime, p_info = iterative_solve(
                Pmat, b_p, jnp.zeros_like(p), settings.matrix_solver
            )
            if stage == 5:
                return p_prime
            return apply_pressure_correction(
                mesh, fbc, settings, p_prime, new_md, new_vel, p
            )

        return fn

    for stage in (1, 2, 3, 4, 5, 6):
        analyze(f"prefix{stage}", prefix(stage), mesh, diff, vel, p, md)


if __name__ == "__main__":
    if "chain" in sys.argv[1:2]:
        chain()
    else:
        main()
