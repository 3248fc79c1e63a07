"""FC under EXPLICIT relaxation: divergence mechanism + stored-flux
under-relaxation probe (VERDICT r4 item 6).

Round-4 measurement: FC + explicit NaNs where FC + implicit and
parity + explicit are fine. Hypothesis: under explicit relaxation the
velocity receives only alpha_u of the pressure correction while the
stored conservative flux receives ALL of it — an
O((1-alpha_u) * corr) field/flux inconsistency injected every
iteration. The conservative blend
  flux <- flux_old + beta * (flux_corr - flux_old)
(settings.resolved_fc_flux_relaxation; beta = alpha_u by default under
explicit) removes it without losing conservation (both operands are
divergence-free).

Cases: pressure-driven Poiseuille channel (the BASELINE FC-table
case) and a 16^2 Rhie-Chow lid cavity, each under parity+explicit,
FC+explicit beta=1 (round-4 behavior), FC+explicit beta=alpha_u.

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
           python scripts/probe_fc_explicit.py [iters]
"""

import sys

sys.path.insert(0, "/root/repo")


def _settings(coupling, beta, alpha_u, alpha_p):
    from orc_tpu.utils.settings import (
        MatrixSolverSettings,
        MomentumScheme,
        NumericalSettings,
        PreconditionMethod,
        PressureVelocityCoupling,
        RelaxationMode,
        SolutionMethod,
        VelocityInterpolation,
    )

    return NumericalSettings(
        momentum=MomentumScheme.UD,
        velocity_interpolation=VelocityInterpolation.RHIE_CHOW,
        pressure_velocity_coupling=coupling,
        relaxation_mode=RelaxationMode.EXPLICIT,
        momentum_relaxation=alpha_u,
        pressure_relaxation=alpha_p,
        fc_flux_relaxation=beta,
        matrix_solver=MatrixSolverSettings(
            solver_type=SolutionMethod.BICGSTAB,
            iterations=50,
            preconditioner=PreconditionMethod.JACOBI,
        ),
    )


def _report(name, state, hist):
    import numpy as np

    u = np.asarray(state.vel[:, 0])
    last = hist[-1]
    pc = float(np.asarray(last.p_corr_norm)[-1])
    vc = float(np.asarray(last.vel_corr_norm)[-1])
    div = bool(np.asarray(last.diverged)[-1])
    ok = bool(np.isfinite(u).all()) and not div
    print(
        f"  {name:40s} {'OK ' if ok else 'DIV'} "
        f"p_corr {pc:9.2e}  vel_corr {vc:9.2e}  "
        f"u_mean {u.mean():+.4e}"
    )
    return ok


def main():
    from orc_tpu.models.cavity import cavity_case
    from orc_tpu.models.channel_flow import (
        ChannelFlowParameters,
        couette_case,
    )
    from orc_tpu.solver.simple import solve_steady
    from orc_tpu.utils.settings import PressureVelocityCoupling as PVC

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 400

    def run(name, mesh, table, rho, mu, s):
        try:
            state, hist = solve_steady(
                mesh, table, s, rho, mu,
                iterations=iters, reporting_interval=50,
                verbose=False, check_divergence=False,
            )
            return _report(name, state, hist)
        except Exception as e:
            print(f"  {name:40s} EXC {type(e).__name__}: {e}")
            return False

    params = ChannelFlowParameters(top_wall_velocity=0.0, dp_dx=5.0)
    mesh, table = couette_case(nx=8, ny=8, params=params)
    rho, mu = params.rho, params.mu
    print("== Poiseuille 8x8 (pressure-driven, BASELINE FC case) ==")
    for alpha_u, alpha_p in ((0.5, 0.02), (0.5, 0.1), (0.7, 0.1)):
        print(f" alpha_u = {alpha_u}, alpha_p = {alpha_p}")
        run("parity + explicit",
            mesh, table, rho, mu, _settings(PVC.SIMPLE, None, alpha_u, alpha_p))
        run("FC + explicit, beta=1 (round-4)",
            mesh, table, rho, mu, _settings(PVC.SIMPLE_FC, 1.0, alpha_u, alpha_p))
        run("FC + explicit, beta=alpha_u",
            mesh, table, rho, mu, _settings(PVC.SIMPLE_FC, None, alpha_u, alpha_p))

    print("== channel_flow.msh (graded, pressure inlet/outlet — the "
          "round-4 failing config) ==")
    import os

    import orc_tpu
    from orc_tpu.mesh.zones import FaceCondition

    gm, gt = orc_tpu.read_mesh(
        "/root/reference/examples/channel_flow.msh", verbose=False
    )
    dp_dx, gmu, grho = 5.0, 0.001, 1000.0
    gt.set("WALL", FaceCondition.WALL)
    gt.set("INLET", FaceCondition.PRESSURE_INLET, scalar_value=dp_dx * 0.002)
    gt.set("OUTLET", FaceCondition.PRESSURE_OUTLET, scalar_value=0.0)
    gt.set("PERIODIC_-Z", FaceCondition.SYMMETRY)
    gt.set("PERIODIC_+Z", FaceCondition.SYMMETRY)
    for alpha_u, alpha_p in ((0.5, 0.005), (0.5, 0.01), (0.5, 0.02), (0.7, 0.02)):
        print(f" alpha_u = {alpha_u}, alpha_p = {alpha_p}")
        run("parity + explicit",
            gm, gt, grho, gmu, _settings(PVC.SIMPLE, None, alpha_u, alpha_p))
        run("FC + explicit, beta=1 (round-4)",
            gm, gt, grho, gmu, _settings(PVC.SIMPLE_FC, 1.0, alpha_u, alpha_p))
        run("FC + explicit, beta=alpha_u",
            gm, gt, grho, gmu, _settings(PVC.SIMPLE_FC, None, alpha_u, alpha_p))

    print("== lid cavity 16^2, Rhie-Chow ==")
    cmesh, ctable = cavity_case(n=16, nz=1, lid_velocity=1.0)
    for alpha_u, alpha_p in ((0.5, 0.02), (0.5, 0.1)):
        print(f" alpha_u = {alpha_u}, alpha_p = {alpha_p}")
        run("parity + explicit",
            cmesh, ctable, 1.0, 1e-2, _settings(PVC.SIMPLE, None, alpha_u, alpha_p))
        run("FC + explicit, beta=1 (round-4)",
            cmesh, ctable, 1.0, 1e-2, _settings(PVC.SIMPLE_FC, 1.0, alpha_u, alpha_p))
        run("FC + explicit, beta=alpha_u",
            cmesh, ctable, 1.0, 1e-2, _settings(PVC.SIMPLE_FC, None, alpha_u, alpha_p))


if __name__ == "__main__":
    main()
