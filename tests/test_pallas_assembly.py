"""Fused momentum-assembly kernel vs the ck reference implementation
(interpret mode — runs on CPU; the TPU path is byte-for-byte the same
kernel compiled by Mosaic)."""

import numpy as np
import pytest

import jax.numpy as jnp

from orc_tpu.models.cavity import cavity_case
from orc_tpu.mesh.generate import structured_box_mesh
from orc_tpu.mesh.zones import FaceCondition
from orc_tpu.ops.ck_ops import (
    build_ck_geometry,
    ck_bc,
    ck_diffusion,
    ck_face_pressure,
    ck_flux,
    ck_momentum,
    nbr_values,
)
from orc_tpu.ops.fields import device_bc
from orc_tpu.ops.pallas_assembly import column_specs, momentum_assembly
from orc_tpu.utils.settings import (
    MomentumScheme,
    NumericalSettings,
    PressureInterpolation,
    RelaxationMode,
    VelocityInterpolation,
)


def _reference(mesh, table, settings, vel, p, rho, mu):
    zc, zs, zv = device_bc(table, dtype=mesh.dtype)
    ck = build_ck_geometry(mesh, len(table.zone_ids))
    bc = ck_bc(ck, zc, zs, zv)
    diff3 = ck_diffusion(mesh, ck, bc, jnp.asarray(mu, mesh.dtype))
    vel_nbr = nbr_values(mesh, vel, ck.interior)
    flux = ck_flux(
        mesh, ck, bc, vel, settings.velocity_interpolation, p=p,
        vel_nbr=vel_nbr,
    )
    F = flux * ck.area * rho
    p_f = ck_face_pressure(
        mesh, ck, bc, p, settings.pressure_interpolation
    )
    return ck_momentum(
        mesh, ck, bc, settings, rho, vel, F, p_f, *diff3
    )


CASES = {
    "cavity": lambda: cavity_case(n=20, dtype=jnp.float32),
    "cavity3d": lambda: cavity_case(n=8, nz=8, dtype=jnp.float32),
}


def _couette():
    mesh, table = structured_box_mesh(
        16, 8, 1, lengths=(0.002, 0.001, 0.0001), dtype=jnp.float32
    )
    table.set("TOP_WALL", FaceCondition.WALL, vector_value=(5e-4, 0, 0))
    table.set("INLET", FaceCondition.PRESSURE_INLET, scalar_value=0.01)
    table.set("OUTLET", FaceCondition.PRESSURE_OUTLET, scalar_value=0.0)
    table.set("PERIODIC_-Z", FaceCondition.SYMMETRY)
    table.set("PERIODIC_+Z", FaceCondition.SYMMETRY)
    return mesh, table


CASES["couette"] = _couette


@pytest.mark.parametrize("name", sorted(CASES))
def test_momentum_assembly_matches_ck(name):
    mesh, table = CASES[name]()
    assert mesh.ck_constants is not None
    settings = NumericalSettings(
        momentum=MomentumScheme.UD,
        pressure_interpolation=PressureInterpolation.LINEAR_WEIGHTED,
        velocity_interpolation=VelocityInterpolation.LINEAR_WEIGHTED,
        momentum_relaxation=0.7,
        relaxation_mode=RelaxationMode.IMPLICIT,
    )
    rho, mu = 1.0, 1e-3
    rng = np.random.default_rng(3)
    C = mesh.n_cells
    vel = jnp.asarray(rng.standard_normal((C, 3)) * 0.1, jnp.float32)
    p = jnp.asarray(rng.standard_normal(C) * 0.05, jnp.float32)

    A_ref, b_ref, _pe = _reference(mesh, table, settings, vel, p, rho, mu)
    assert A_ref.diag.ndim == 1  # shared-matrix form

    cols = column_specs(mesh, table)
    assert cols is not None
    from orc_tpu.ops.pallas_assembly import bc_value_table, pack_flags

    zc, zs, zv = device_bc(table, dtype=jnp.float32)
    bcv = bc_value_table(zs, zv)
    ck_g = build_ck_geometry(mesh, len(table.zone_ids))
    flags = pack_flags(ck_g.interior, ck_g.mask)
    diag, off, b3 = momentum_assembly(
        vel, p, bcv, flags, cols, rho, mu, 0.7, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(diag), np.asarray(A_ref.diag), rtol=2e-5, atol=1e-7
    )
    # Column ORDER may differ between the kernel (ck_constants order)
    # and the assembled matrix; both use mesh.neighbor_offsets order —
    # identical by construction.
    np.testing.assert_allclose(
        np.asarray(off), np.asarray(A_ref.off), rtol=2e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(b3), np.asarray(b_ref), rtol=2e-5, atol=1e-6
    )


@pytest.mark.parametrize("name", sorted(CASES))
def test_pc_assembly_matches_ck(name):
    from orc_tpu.ops.ck_ops import ck_pressure_correction
    from orc_tpu.ops.pallas_assembly import pc_assembly
    from orc_tpu.solver.gmg import infer_box_dims

    mesh, table = CASES[name]()
    rho = 1.0
    rng = np.random.default_rng(7)
    C = mesh.n_cells
    vel = jnp.asarray(rng.standard_normal((C, 3)) * 0.1, jnp.float32)
    md = jnp.asarray(rng.uniform(0.5, 2.0, C), jnp.float32)

    zc, zs, zv = device_bc(table, dtype=mesh.dtype)
    ck = build_ck_geometry(mesh, len(table.zone_ids))
    bc = ck_bc(ck, zc, zs, zv)
    vel_nbr = nbr_values(mesh, vel, ck.interior)
    flux = ck_flux(
        mesh, ck, bc, vel, VelocityInterpolation.LINEAR_WEIGHTED,
        vel_nbr=vel_nbr,
    )
    F2 = flux * ck.area * rho
    md3 = md[:, None] * jnp.ones((1, 3), md.dtype)
    A_ref, b_ref = ck_pressure_correction(mesh, ck, bc, rho, F2, md3)

    from orc_tpu.ops.pallas_assembly import pack_flags

    cols = column_specs(mesh, table)
    flags = pack_flags(ck.interior, ck.mask)
    diag, off, b = pc_assembly(vel, md, flags, cols, rho, interpret=True)
    np.testing.assert_allclose(
        np.asarray(diag), np.asarray(A_ref.diag), rtol=2e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(off), np.asarray(A_ref.off), rtol=2e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(b_ref), rtol=2e-5, atol=1e-6
    )


def test_solve_steady_with_fused_assembly(monkeypatch):
    """End-to-end SIMPLE with the fused kernels (interpreter mode via
    ORC_TPU_PALLAS_ASM=force) matches the stock ck path."""
    from orc_tpu.solver.simple import initial_state, solve_steady
    from orc_tpu.utils.settings import (
        MatrixSolverSettings,
        PreconditionMethod,
        RelaxationMode,
        SolutionMethod,
    )

    mesh, table = cavity_case(n=16, dtype=jnp.float32)
    settings = NumericalSettings(
        momentum=MomentumScheme.UD,
        pressure_interpolation=PressureInterpolation.LINEAR_WEIGHTED,
        velocity_interpolation=VelocityInterpolation.LINEAR_WEIGHTED,
        pressure_relaxation=0.1,
        momentum_relaxation=0.7,
        relaxation_mode=RelaxationMode.IMPLICIT,
        matrix_solver=MatrixSolverSettings(
            solver_type=SolutionMethod.BICGSTAB,
            iterations=25,
            preconditioner=PreconditionMethod.JACOBI,
        ),
    )
    kw = dict(
        state=initial_state(mesh), iterations=40, reporting_interval=40,
        verbose=False,
    )

    monkeypatch.setenv("ORC_TPU_PALLAS_ASM", "0")
    ref, _ = solve_steady(mesh, table, settings, 1.0, 0.01, **kw)
    monkeypatch.setenv("ORC_TPU_PALLAS_ASM", "force")
    kw["state"] = initial_state(mesh)
    fused, _ = solve_steady(mesh, table, settings, 1.0, 0.01, **kw)
    np.testing.assert_allclose(
        np.asarray(fused.vel), np.asarray(ref.vel), rtol=2e-4, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(fused.p), np.asarray(ref.p), rtol=2e-4, atol=2e-5
    )


@pytest.mark.parametrize("name", sorted(CASES))
def test_fc_momentum_assembly_matches_ck(name):
    """SIMPLE_FC fused momentum kernel vs ck_momentum fed with a stored
    [C,K] flux (solver/fc.py's momentum call)."""
    from orc_tpu.ops.pallas_assembly import (
        bc_value_table,
        fc_momentum_assembly,
        pack_flags,
    )

    mesh, table = CASES[name]()
    settings = NumericalSettings(
        momentum=MomentumScheme.UD,
        pressure_interpolation=PressureInterpolation.LINEAR_WEIGHTED,
        velocity_interpolation=VelocityInterpolation.LINEAR_WEIGHTED,
        momentum_relaxation=0.7,
        relaxation_mode=RelaxationMode.IMPLICIT,
    )
    rho, mu = 1.0, 1e-3
    rng = np.random.default_rng(11)
    C = mesh.n_cells
    vel = jnp.asarray(rng.standard_normal((C, 3)) * 0.1, jnp.float32)
    p = jnp.asarray(rng.standard_normal(C) * 0.05, jnp.float32)

    zc, zs, zv = device_bc(table, dtype=mesh.dtype)
    ck = build_ck_geometry(mesh, len(table.zone_ids))
    bc = ck_bc(ck, zc, zs, zv)
    diff3 = ck_diffusion(mesh, ck, bc, jnp.asarray(mu, mesh.dtype))
    # An arbitrary antisymmetric-per-face "stored" flux: use the plain
    # interpolated flux of a DIFFERENT velocity field, so the test
    # cannot pass by re-deriving flux from vel.
    vel2 = jnp.asarray(rng.standard_normal((C, 3)) * 0.1, jnp.float32)
    flux = ck_flux(
        mesh, ck, bc, vel2, VelocityInterpolation.LINEAR_WEIGHTED,
    )
    F = flux * ck.area * rho
    p_f = ck_face_pressure(
        mesh, ck, bc, p, PressureInterpolation.LINEAR_WEIGHTED
    )
    A_ref, b_ref, _pe = ck_momentum(
        mesh, ck, bc, settings, rho, vel, F, p_f, *diff3
    )
    assert A_ref.diag.ndim == 1

    cols = column_specs(mesh, table)
    bcv = bc_value_table(zs, zv)
    flags = pack_flags(ck.interior, ck.mask)
    diag, off, b3 = fc_momentum_assembly(
        vel, p, flux, bcv, flags, cols, rho, mu, 0.7, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(diag), np.asarray(A_ref.diag), rtol=2e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(off), np.asarray(A_ref.off), rtol=2e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(b3), np.asarray(b_ref), rtol=2e-5, atol=1e-6
    )


@pytest.mark.parametrize("name", sorted(CASES))
def test_fc_pc_assembly_matches_ck(name):
    """SIMPLE_FC fused full-p assembly vs ck_flux_h + ck_d_coeffs +
    ck_fc_pressure_system."""
    from orc_tpu.ops.pallas_assembly import (
        bc_value_table,
        fc_pc_assembly,
        pack_flags,
    )
    from orc_tpu.solver.fc import (
        ck_d_coeffs,
        ck_fc_pressure_system,
        ck_flux_h,
    )

    mesh, table = CASES[name]()
    rho = 1.0
    rng = np.random.default_rng(13)
    C = mesh.n_cells
    vel = jnp.asarray(rng.standard_normal((C, 3)) * 0.1, jnp.float32)
    md = jnp.asarray(rng.uniform(0.5, 2.0, C), jnp.float32)

    zc, zs, zv = device_bc(table, dtype=mesh.dtype)
    ck = build_ck_geometry(mesh, len(table.zone_ids))
    bc = ck_bc(ck, zc, zs, zv)
    md3 = md[:, None] * jnp.ones((1, 3), md.dtype)
    fh_ref = ck_flux_h(
        mesh, ck, bc, vel, VelocityInterpolation.LINEAR_WEIGHTED
    )
    d_ref = ck_d_coeffs(mesh, ck, bc, rho, md3)
    A_ref, b_ref = ck_fc_pressure_system(mesh, ck, bc, rho, fh_ref, d_ref)

    cols = column_specs(mesh, table)
    bcv = bc_value_table(zs, zv)
    flags = pack_flags(ck.interior, ck.mask)
    diag, off, b, fh = fc_pc_assembly(
        vel, md, mesh.cell_volume[0], bcv, flags, cols, rho,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(diag), np.asarray(A_ref.diag), rtol=2e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(off), np.asarray(A_ref.off), rtol=2e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(b_ref), rtol=2e-5, atol=1e-6
    )
    mask = np.asarray(ck.mask)
    np.testing.assert_allclose(
        np.asarray(fh) * mask, np.asarray(fh_ref) * mask,
        rtol=2e-5, atol=1e-7,
    )


def test_solve_steady_fc_with_fused_assembly(monkeypatch):
    """End-to-end SIMPLE_FC with the fused kernels (interpreter mode)
    matches the stock FC ck path."""
    from orc_tpu.solver.simple import initial_state, solve_steady
    from orc_tpu.utils.settings import (
        MatrixSolverSettings,
        PreconditionMethod,
        PressureVelocityCoupling,
        RelaxationMode,
        SolutionMethod,
    )

    mesh, table = cavity_case(n=16, dtype=jnp.float32)
    settings = NumericalSettings(
        momentum=MomentumScheme.UD,
        pressure_velocity_coupling=PressureVelocityCoupling.SIMPLE_FC,
        pressure_interpolation=PressureInterpolation.LINEAR_WEIGHTED,
        velocity_interpolation=VelocityInterpolation.LINEAR_WEIGHTED,
        pressure_relaxation=0.3,
        momentum_relaxation=0.7,
        relaxation_mode=RelaxationMode.IMPLICIT,
        matrix_solver=MatrixSolverSettings(
            solver_type=SolutionMethod.BICGSTAB,
            iterations=25,
            preconditioner=PreconditionMethod.JACOBI,
        ),
    )
    kw = dict(
        state=initial_state(mesh), iterations=40, reporting_interval=40,
        verbose=False,
    )

    monkeypatch.setenv("ORC_TPU_PALLAS_ASM", "0")
    ref, _ = solve_steady(mesh, table, settings, 1.0, 0.01, **kw)
    monkeypatch.setenv("ORC_TPU_PALLAS_ASM", "force")
    kw["state"] = initial_state(mesh)
    fused, _ = solve_steady(mesh, table, settings, 1.0, 0.01, **kw)
    np.testing.assert_allclose(
        np.asarray(fused.vel), np.asarray(ref.vel), rtol=2e-4, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(fused.p), np.asarray(ref.p), rtol=2e-4, atol=2e-5
    )
