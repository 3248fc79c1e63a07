"""k-epsilon turbulence model tests (EXPERIMENTAL feature — the
reference only declares the enum, lib.rs:164-168).

Qualitative physics checks: stable coupled iteration, positive bounded
fields, developed eddy viscosity orders of magnitude above molecular."""

import numpy as np
import pytest

from orc_tpu.mesh import structured_box_mesh
from orc_tpu.mesh.zones import FaceCondition
from orc_tpu.solver.turbulence import (
    initial_turbulence,
    solve_steady_turbulent,
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


def channel(nx=16, ny=12):
    mesh, table = structured_box_mesh(nx, ny, 1, lengths=(8.0, 2.0, 0.5))
    table.set("TOP_WALL", FaceCondition.WALL)
    table.set("BOTTOM_WALL", FaceCondition.WALL)
    table.set("INLET", FaceCondition.VELOCITY_INLET, vector_value=(1.0, 0, 0))
    table.set("OUTLET", FaceCondition.PRESSURE_OUTLET, scalar_value=0.0)
    table.set("PERIODIC_-Z", FaceCondition.SYMMETRY)
    table.set("PERIODIC_+Z", FaceCondition.SYMMETRY)
    return mesh, table


SETTINGS = NumericalSettings(
    momentum=MomentumScheme.UD,
    pressure_interpolation=PressureInterpolation.LINEAR_WEIGHTED,
    velocity_interpolation=VelocityInterpolation.LINEAR_WEIGHTED,
    matrix_solver=MatrixSolverSettings(
        solver_type=SolutionMethod.BICGSTAB,
        iterations=30,
        preconditioner=PreconditionMethod.JACOBI,
    ),
    momentum_relaxation=0.6,
    pressure_relaxation=0.05,
)


def test_turbulent_channel_develops():
    mesh, table = channel()
    rho, mu = 1.0, 1e-5  # Re_h = 2e5
    flow, turb, history = solve_steady_turbulent(
        mesh,
        table,
        SETTINGS,
        rho,
        mu,
        u_ref=1.0,
        iterations=200,
        reporting_interval=200,
        intensity=0.05,
        length_scale=0.14,
        verbose=False,
    )
    k = np.asarray(turb.k)
    eps = np.asarray(turb.eps)
    mu_t = np.asarray(turb.mu_t)
    vel = np.asarray(flow.vel)
    assert np.isfinite(vel).all() and np.isfinite(k).all()
    assert (k > 0).all() and (eps > 0).all() and (mu_t >= 0).all()
    # Eddy viscosity far above molecular in the developed region.
    assert mu_t.max() / mu > 50.0, mu_t.max() / mu
    # Mass conservation: bulk velocity ~ inlet velocity.
    u_mean = vel[:, 0].mean()
    assert abs(u_mean - 1.0) < 0.15, u_mean


def test_initial_turbulence_levels():
    mesh, _ = channel(4, 4)
    t = initial_turbulence(mesh, u_ref=2.0, intensity=0.1, length_scale=0.5, rho=1.0)
    k = float(np.asarray(t.k)[0])
    assert np.isclose(k, 1.5 * (0.1 * 2.0) ** 2)
    assert float(np.asarray(t.mu_t)[0]) > 0
