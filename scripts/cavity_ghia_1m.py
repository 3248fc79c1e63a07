"""Mesh-sequenced 1M-cell lid-driven cavity vs the Ghia benchmarks.

A cold-started steady SIMPLE run at 1024^2 spends O(10^5) iterations
spinning up the core vortex (the pseudo-timestep shrinks with cell
size), so the standard practice is mesh sequencing: converge the flow
on a coarse grid where spin-up is cheap, prolong to the next grid, and
finish with a few thousand fine-grid iterations.

Usage: python scripts/cavity_ghia_1m.py [n_final] [re]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")


# Ghia, Ghia & Shin (1982), Re = 1000, Table I/II landmarks.
GHIA_Y = [0.0547, 0.1016, 0.2813, 0.4531, 0.5, 0.6172, 0.7344, 0.9531]
GHIA_U = [-0.1812, -0.2973, -0.2781, -0.1065, -0.0608, 0.0570, 0.1872, 0.4660]
GHIA_X = [0.0625, 0.2266, 0.5, 0.8047, 0.9531]
GHIA_V = [0.27485, 0.33075, 0.02526, -0.31966, -0.33714]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/orc_tpu_jax_cache")

    from orc_tpu.models.cavity import cavity_case
    from orc_tpu.solver.simple import FlowState, initial_state, solve_steady
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

    n_final = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    re = float(sys.argv[2]) if len(sys.argv) > 2 else 1000.0
    # The cascade runs robust first-order UD; SCHEME=tvd additionally
    # re-converges the FINAL level with the second-order limited scheme
    # + Rhie-Chow seeded by the UD field (cold-started TVD diverges; at
    # Re=1000 UD's cross-stream numerical viscosity ~u h/2 rivals the
    # physical one and weakens the core vortex).
    second_order = os.environ.get("SCHEME", "ud") == "tvd"
    from orc_tpu.utils.settings import tvd_umist

    solver = MatrixSolverSettings(
        solver_type=SolutionMethod.BICGSTAB,
        iterations=50,
        preconditioner=PreconditionMethod.JACOBI,
    )
    settings = NumericalSettings(
        momentum=MomentumScheme.UD,
        pressure_interpolation=PressureInterpolation.LINEAR_WEIGHTED,
        velocity_interpolation=VelocityInterpolation.LINEAR_WEIGHTED,
        pressure_relaxation=0.1,
        momentum_relaxation=0.7,
        relaxation_mode=RelaxationMode.IMPLICIT,
        matrix_solver=solver,
    )
    settings_tvd = NumericalSettings(
        momentum=MomentumScheme.TVD,
        tvd_psi=tvd_umist,
        pressure_interpolation=PressureInterpolation.LINEAR_WEIGHTED,
        velocity_interpolation=VelocityInterpolation.RHIE_CHOW,
        pressure_relaxation=0.05,
        momentum_relaxation=0.6,
        relaxation_mode=RelaxationMode.IMPLICIT,
        matrix_solver=solver,
    )

    def upsample(arr, n_from, n_to):
        a = np.asarray(arr)
        feat = a.shape[1:]
        a = a.reshape(n_from, n_from, *feat)
        r = n_to // n_from
        a = np.repeat(np.repeat(a, r, axis=0), r, axis=1)
        return jnp.asarray(a.reshape((n_to * n_to,) + feat))

    levels = []
    n = n_final
    while n >= 64:
        levels.append(n)
        n //= 2
    levels.reverse()

    t_all = time.perf_counter()
    state = None
    for i, n in enumerate(levels):
        mesh, table = cavity_case(n=n, lid_velocity=1.0, dtype=jnp.float32)
        if state is None:
            state = initial_state(mesh)
        else:
            state = FlowState(
                vel=upsample(state.vel, levels[i - 1], n),
                p=upsample(state.p, levels[i - 1], n),
                mom_diag=upsample(state.mom_diag, levels[i - 1], n),
            )
        iters = 4000 if n < n_final else 30000
        t0 = time.perf_counter()
        state, h = solve_steady(
            mesh, table, settings, 1.0, 1.0 / re,
            state=state, iterations=iters, reporting_interval=1000,
            verbose=False,
        )
        pc = float(np.asarray(h[-1].p_corr_norm)[-1])
        print(
            f"level {n:>5}: {iters} iters in "
            f"{time.perf_counter()-t0:.0f}s  p_corr {pc:.3e}",
            file=sys.stderr,
        )
        if second_order and n == n_final:
            t0 = time.perf_counter()
            state, h = solve_steady(
                mesh, table, settings_tvd, 1.0, 1.0 / re,
                state=state, iterations=iters, reporting_interval=1000,
                verbose=False,
            )
            pc = float(np.asarray(h[-1].p_corr_norm)[-1])
            print(
                f"level {n:>5} (tvd): {iters} iters in "
                f"{time.perf_counter()-t0:.0f}s  p_corr {pc:.3e}",
                file=sys.stderr,
            )

    u = np.asarray(state.vel)[:, 0].reshape(n_final, n_final)
    v = np.asarray(state.vel)[:, 1].reshape(n_final, n_final)
    yc = (np.arange(n_final) + 0.5) / n_final
    u_mid = u[:, n_final // 2]
    v_mid = v[n_final // 2, :]
    erru = []
    for yg, ug in zip(GHIA_Y, GHIA_U):
        i = int(np.argmin(np.abs(yc - yg)))
        erru.append(abs(u_mid[i] - ug))
        print(f"  u(y={yg:.4f}) = {u_mid[i]: .4f}  ghia {ug: .4f}")
    errv = [
        abs(v_mid[int(np.argmin(np.abs(yc - xg)))] - vg)
        for xg, vg in zip(GHIA_X, GHIA_V)
    ]
    print(
        f"{n_final}^2 Re={re:.0f}: Ghia u-midline max err "
        f"{max(erru):.4f}, v-midline max err {max(errv):.4f}, total "
        f"{time.perf_counter()-t_all:.0f}s"
    )


if __name__ == "__main__":
    main()
