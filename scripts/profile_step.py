"""Device-time profiling of SIMPLE step components.

The axon tunnel adds a large, fluctuating per-dispatch RTT, so
single-dispatch timing is unusable. Each component is instead wrapped
in a `lax.scan` of N dependent repetitions inside ONE dispatch; the
per-repetition device time is (t_N - t_1) / (N - 1).

Usage: python scripts/profile_step.py [f64|f32] [mesh_path]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    dtype_arg = sys.argv[1] if len(sys.argv) > 1 else "f64"
    dtype = jnp.float64 if dtype_arg == "f64" else jnp.float32

    from orc_tpu.mesh import read_mesh, structured_box_mesh
    from orc_tpu.mesh.zones import FaceCondition
    from orc_tpu.ops.assembly import (
        apply_pressure_correction,
        diffusion_system,
        momentum_system,
        pressure_correction_system,
    )
    from orc_tpu.ops.fields import device_bc, face_bc
    from orc_tpu.ops.gradients import pressure_gradient
    from orc_tpu.ops.interpolation import face_flux, face_pressure
    from orc_tpu.ops.spmv import EllMatrix
    from orc_tpu.solver.krylov import bicgstab_solve
    from orc_tpu.solver.simple import initial_state, simple_step
    from orc_tpu.utils.settings import (
        MatrixSolverSettings,
        NumericalSettings,
        PreconditionMethod,
        PressureInterpolation,
        SolutionMethod,
        VelocityInterpolation,
    )

    mesh_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/root/reference/examples/couette_flow_128x64x1.msh"
    )
    import os

    if os.path.exists(mesh_path):
        from orc_tpu.mesh.tgrid import parse_tgrid
        from orc_tpu.mesh.compile import compile_mesh

        raw = parse_tgrid(open(mesh_path).read())
        mesh, table = compile_mesh(raw, dtype=dtype)
    else:
        mesh, table = structured_box_mesh(127, 63, 1, dtype=dtype)
    table.set("TOP_WALL", FaceCondition.WALL)
    table.set("BOTTOM_WALL", FaceCondition.WALL)
    table.set("INLET", FaceCondition.VELOCITY_INLET, vector_value=(1e-3, 0, 0))
    table.set("OUTLET", FaceCondition.PRESSURE_OUTLET)
    table.set("PERIODIC_-Z", FaceCondition.SYMMETRY)
    table.set("PERIODIC_+Z", FaceCondition.SYMMETRY)

    zc, zs, zv = device_bc(table, dtype)
    fbc = face_bc(mesh, zc, zs, zv)
    st = initial_state(mesh)
    rho, mu = 1000.0, 0.001
    diff = diffusion_system(mesh, fbc, jnp.asarray(mu, dtype))
    settings = NumericalSettings(
        matrix_solver=MatrixSolverSettings(
            solver_type=SolutionMethod.BICGSTAB,
            iterations=50,
            preconditioner=PreconditionMethod.JACOBI,
        )
    )

    def slope(name, body, x0, n=64):
        """body: x -> x (same pytree). Returns per-rep ms via scan."""

        def run(n_steps):
            f = jax.jit(
                lambda x: lax.scan(
                    lambda c, _: (body(c), None), x, None, length=n_steps
                )[0]
            )
            jax.block_until_ready(f(x0))  # compile
            t0 = time.perf_counter()
            jax.block_until_ready(f(x0))
            return time.perf_counter() - t0

        t1 = run(1)
        tn = run(n)
        per = (tn - t1) / (n - 1)
        print(f"{name:>28}: {per*1e3:8.3f} ms/rep  (1: {t1*1e3:.1f} ms)")
        return per

    p0 = st.p
    grad_p0 = pressure_gradient(mesh, fbc, p0)

    slope(
        "grad_p (GG)",
        lambda p: pressure_gradient(mesh, fbc, p)[:, 0],
        p0,
    )
    slope(
        "face_flux (Rhie-Chow)",
        lambda v: jnp.tile(
            face_flux(
                mesh,
                fbc,
                jnp.tile(v[:, None], (1, 3)),
                VelocityInterpolation.RHIE_CHOW,
                p=p0,
                grad_p=grad_p0,
                mom_diag=st.mom_diag,
            )[: mesh.n_cells],
            1,
        ),
        p0,
    )
    flux0 = face_flux(
        mesh,
        fbc,
        st.vel,
        VelocityInterpolation.RHIE_CHOW,
        p=p0,
        grad_p=grad_p0,
        mom_diag=st.mom_diag,
    )
    p_f0 = face_pressure(
        mesh, fbc, p0, PressureInterpolation.SECOND_ORDER, grad_p=grad_p0
    )

    def asm_body(v3):
        A3, b3, pe = momentum_system(
            mesh, fbc, settings, rho, v3, flux0, p_f0, diff
        )
        return jnp.moveaxis(b3, 0, -1)

    slope("momentum assembly", asm_body, st.vel)

    A3, b3, _ = momentum_system(
        mesh, fbc, settings, rho, st.vel, flux0, p_f0, diff
    )
    A1 = EllMatrix(
        diag=A3.diag[0], off=A3.off[0], neighbors=A3.neighbors,
        offsets=A3.offsets,
    )

    def bic_body(x):
        y, _ = bicgstab_solve(A1, b3[0], x, 5, convergence_threshold=0.0)
        return y

    per5 = slope("bicgstab x5 iters", bic_body, jnp.zeros_like(p0))
    print(f"{'-> per BiCGSTAB iteration':>28}: {per5/5*1e3:8.3f} ms")

    def step_body(state):
        s2, _ = simple_step(
            mesh, zc, zs, zv, settings, rho, mu, diff, state
        )
        return s2

    slope("full SIMPLE step (BiCGSTAB)", step_body, st, n=16)

    settings_mg = NumericalSettings()
    from orc_tpu.solver.amg import build_hierarchy

    hier = build_hierarchy(mesh, diff, settings_mg.matrix_solver)

    def step_body_mg(state):
        s2, _ = simple_step(
            mesh,
            zc,
            zs,
            zv,
            settings_mg,
            rho,
            mu,
            diff,
            state,
            solver_extras=dict(mg_hierarchy=hier),
        )
        return s2

    slope("full SIMPLE step (AMG)", step_body_mg, st, n=16)


if __name__ == "__main__":
    main()
