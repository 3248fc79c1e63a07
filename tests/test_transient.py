"""Transient solver validation: impulsively-started Couette flow
(Stokes' problem between plates) against the analytical series
solution — the "transient iteration" capability the reference's roadmap
leaves unchecked (README.md:42)."""

import numpy as np
import pytest

from orc_tpu.mesh import structured_box_mesh
from orc_tpu.mesh.zones import FaceCondition
from orc_tpu.solver.simple import initial_state
from orc_tpu.solver.transient import solve_transient
from orc_tpu.utils.settings import (
    MatrixSolverSettings,
    MomentumScheme,
    NumericalSettings,
    PreconditionMethod,
    PressureInterpolation,
    SolutionMethod,
    VelocityInterpolation,
)

H = 1e-3  # channel height [m]
U = 1e-3  # wall velocity [m/s]
RHO, MU = 1000.0, 0.001
NU = MU / RHO


def couette_startup_analytical(y, t, n_terms=200):
    """u(y,t) for the top wall impulsively started at t=0."""
    u = y / H
    for n in range(1, n_terms + 1):
        u = u + (2.0 * (-1) ** n / (n * np.pi)) * np.exp(
            -(n**2) * np.pi**2 * NU * t / H**2
        ) * np.sin(n * np.pi * y / H)
    return U * u


def test_couette_startup():
    ny = 16
    mesh, table = structured_box_mesh(
        4, ny, 1, lengths=(4e-4, H, 1e-4)
    )
    table.set("TOP_WALL", FaceCondition.WALL, vector_value=(U, 0, 0))
    table.set("BOTTOM_WALL", FaceCondition.WALL)
    table.set("INLET", FaceCondition.PRESSURE_INLET, scalar_value=0.0)
    table.set("OUTLET", FaceCondition.PRESSURE_OUTLET, scalar_value=0.0)
    table.set("PERIODIC_-Z", FaceCondition.SYMMETRY)
    table.set("PERIODIC_+Z", FaceCondition.SYMMETRY)
    settings = NumericalSettings(
        momentum=MomentumScheme.UD,
        pressure_interpolation=PressureInterpolation.LINEAR_WEIGHTED,
        velocity_interpolation=VelocityInterpolation.LINEAR_WEIGHTED,
        matrix_solver=MatrixSolverSettings(
            solver_type=SolutionMethod.BICGSTAB,
            iterations=40,
            preconditioner=PreconditionMethod.JACOBI,
        ),
        momentum_relaxation=0.8,
        pressure_relaxation=0.2,
    )
    t_end = 0.1  # Fourier number 0.1 — profile still developing
    n_steps = 20
    state, metrics = solve_transient(
        mesh,
        table,
        settings,
        RHO,
        MU,
        dt=t_end / n_steps,
        n_steps=n_steps,
        inner_iterations=15,
        verbose=False,
    )
    cc = np.asarray(mesh.cell_centroid)
    u = np.asarray(state.vel[:, 0])
    # Take the centre x-column.
    col = np.abs(cc[:, 0] - 2e-4) < 1.1e-4 / 2 + 1e-9
    col = np.abs(cc[:, 0] - cc[:, 0].mean()) < 6e-5
    y = cc[col, 1]
    u_num = u[col]
    u_ana = couette_startup_analytical(y, t_end)
    # The developing profile must clearly differ from steady state...
    u_steady = U * y / H
    assert np.abs(u_ana - u_steady).max() > 0.2 * U
    # ...and the numerical solution must track the analytical one.
    err = np.abs(u_num - u_ana).max() / U
    assert err < 0.06, (err, list(zip(y, u_num, u_ana)))
    # March much further: must approach the steady linear profile
    # (tolerance covers the pressure-BC entrance effect at this short
    # channel plus per-step convergence residue).
    state2, _ = solve_transient(
        mesh, table, settings, RHO, MU,
        dt=0.1, n_steps=30, inner_iterations=20, state=state, verbose=False,
    )
    u2 = np.asarray(state2.vel[:, 0])[col]
    assert np.abs(u2 - u_steady).max() / U < 0.1


def test_transient_metrics_shape():
    mesh, table = structured_box_mesh(4, 4, 1, lengths=(1e-3, 1e-3, 1e-4))
    table.set("TOP_WALL", FaceCondition.WALL, vector_value=(1e-3, 0, 0))
    table.set("BOTTOM_WALL", FaceCondition.WALL)
    table.set("INLET", FaceCondition.PRESSURE_INLET)
    table.set("OUTLET", FaceCondition.PRESSURE_OUTLET)
    table.set("PERIODIC_-Z", FaceCondition.SYMMETRY)
    table.set("PERIODIC_+Z", FaceCondition.SYMMETRY)
    settings = NumericalSettings(
        momentum=MomentumScheme.UD,
        pressure_interpolation=PressureInterpolation.LINEAR_WEIGHTED,
        velocity_interpolation=VelocityInterpolation.LINEAR_WEIGHTED,
        matrix_solver=MatrixSolverSettings(
            solver_type=SolutionMethod.BICGSTAB, iterations=20
        ),
    )
    state, metrics = solve_transient(
        mesh, table, settings, RHO, MU, dt=0.01, n_steps=5,
        inner_iterations=4, verbose=False,
    )
    assert metrics.vel_avg.shape == (5, 3)
    assert np.isfinite(np.asarray(state.vel)).all()


def test_courant_numbers():
    """Co = dt * sum|u.n|A / (2V): uniform u through a unit-cell box
    gives Co = dt*|u|/h exactly (two crossed faces per direction)."""
    import jax.numpy as jnp

    from orc_tpu.solver.transient import courant_numbers

    mesh, table = structured_box_mesh(4, 4, 1, lengths=(4.0, 4.0, 1.0))
    u0, dt = 2.0, 0.25
    # Through-flow BCs so every cell sees both its x-faces fluxed
    # (walls zero the face flux, which is correct but makes the
    # expected value cell-position-dependent).
    table.set("INLET", FaceCondition.VELOCITY_INLET, vector_value=(u0, 0, 0))
    table.set("OUTLET", FaceCondition.PRESSURE_OUTLET)
    vel = jnp.tile(jnp.asarray([u0, 0.0, 0.0]), (mesh.n_cells, 1))
    avg, lo, hi = courant_numbers(mesh, table, vel, dt)
    # h = 1, |u| = 2, dt = 0.25 -> Co = 0.5 in every cell.
    np.testing.assert_allclose(float(avg), 0.5, rtol=1e-12)
    np.testing.assert_allclose(float(lo), 0.5, rtol=1e-12)
    np.testing.assert_allclose(float(hi), 0.5, rtol=1e-12)
