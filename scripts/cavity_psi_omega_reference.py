"""Independent cross-check: vorticity-streamfunction FD cavity solver.

A from-scratch second-order finite-difference psi-omega solver for the
lid-driven cavity (node-based, 2nd-order central diffusion + 2nd-order
upwind advection, explicit pseudo-time omega transport + red-black SOR
for the psi Poisson equation). Shares NOTHING with the FV framework —
used to independently validate the Ghia Re=1000 comparison rig while
chasing the core-vortex deficit.

Usage: python scripts/cavity_psi_omega_reference.py [n] [re] [t_end]
"""

import sys
import time

import numpy as np


def solve(n=129, re=1000.0, t_end=60.0, report=5.0):
    h = 1.0 / (n - 1)
    nu = 1.0 / re
    psi = np.zeros((n, n))  # [i (x), j (y)]
    om = np.zeros((n, n))
    u = np.zeros((n, n))
    v = np.zeros((n, n))
    u[:, -1] = 1.0  # lid at y=1 moving +x

    dt = min(0.35 * h, 0.2 * h * h / nu)
    sor_w = 2.0 / (1.0 + np.sin(np.pi * h))

    def poisson(psi, om, sweeps):
        # Red-black SOR on psi: lap(psi) = -om, psi=0 on walls.
        for _ in range(sweeps):
            for color in (0, 1):
                ii, jj = np.meshgrid(
                    np.arange(1, n - 1), np.arange(1, n - 1), indexing="ij"
                )
                mask = ((ii + jj) % 2) == color
                res = (
                    psi[2:, 1:-1] + psi[:-2, 1:-1]
                    + psi[1:-1, 2:] + psi[1:-1, :-2]
                    - 4.0 * psi[1:-1, 1:-1]
                    + h * h * om[1:-1, 1:-1]
                )
                upd = psi[1:-1, 1:-1] + sor_w * 0.25 * res
                psi[1:-1, 1:-1] = np.where(mask, upd, psi[1:-1, 1:-1])
        return psi

    def velocities(psi):
        u = np.zeros((n, n))
        v = np.zeros((n, n))
        u[1:-1, 1:-1] = (psi[1:-1, 2:] - psi[1:-1, :-2]) / (2 * h)
        v[1:-1, 1:-1] = -(psi[2:, 1:-1] - psi[:-2, 1:-1]) / (2 * h)
        u[:, -1] = 1.0
        return u, v

    def wall_vorticity(psi, om):
        # 2nd-order (Briley) wall formulas; lid adds the 3U/h term... use
        # the standard first-order-in-psi, O(h^2) Jensen form:
        om[0, :] = -2.0 * psi[1, :] / (h * h)  # x=0 wall
        om[-1, :] = -2.0 * psi[-2, :] / (h * h)  # x=1
        om[:, 0] = -2.0 * psi[:, 1] / (h * h)  # y=0
        om[:, -1] = -2.0 * psi[:, -2] / (h * h) - 2.0 / h  # lid
        return om

    def upwind2(om, u, v):
        # 2nd-order upwind convective derivative u d(om)/dx + v d(om)/dy
        # (interior 2..n-3; fall back to 1st-order next to walls).
        co = np.zeros((n, n))
        ui = u[1:-1, 1:-1]
        vi = v[1:-1, 1:-1]
        # 1st-order fallback everywhere first
        dx_m = (om[1:-1, 1:-1] - om[:-2, 1:-1]) / h
        dx_p = (om[2:, 1:-1] - om[1:-1, 1:-1]) / h
        dy_m = (om[1:-1, 1:-1] - om[1:-1, :-2]) / h
        dy_p = (om[1:-1, 2:] - om[1:-1, 1:-1]) / h
        co[1:-1, 1:-1] = ui * np.where(ui > 0, dx_m, dx_p) + vi * np.where(
            vi > 0, dy_m, dy_p
        )
        # 2nd-order upwind in the deep interior
        i0 = slice(2, n - 2)
        ui = u[i0, i0]
        vi = v[i0, i0]
        omc = om[i0, i0]
        dx_m2 = (3 * omc - 4 * om[1:-3, 2:-2] + om[0:-4, 2:-2]) / (2 * h)
        dx_p2 = (-3 * omc + 4 * om[3:-1, 2:-2] - om[4:, 2:-2]) / (2 * h)
        dy_m2 = (3 * omc - 4 * om[2:-2, 1:-3] + om[2:-2, 0:-4]) / (2 * h)
        dy_p2 = (-3 * omc + 4 * om[2:-2, 3:-1] - om[2:-2, 4:]) / (2 * h)
        co[i0, i0] = ui * np.where(ui > 0, dx_m2, dx_p2) + vi * np.where(
            vi > 0, dy_m2, dy_p2
        )
        return co

    t = 0.0
    next_rep = report
    t0 = time.perf_counter()
    while t < t_end:
        om = wall_vorticity(psi, om)
        lap = (
            om[2:, 1:-1] + om[:-2, 1:-1] + om[1:-1, 2:] + om[1:-1, :-2]
            - 4.0 * om[1:-1, 1:-1]
        ) / (h * h)
        conv = upwind2(om, u, v)
        om[1:-1, 1:-1] += dt * (nu * lap - conv[1:-1, 1:-1])
        psi = poisson(psi, om, sweeps=3)
        u, v = velocities(psi)
        t += dt
        if t >= next_rep:
            print(
                f"t={t:6.1f}  |om|max={np.abs(om).max():8.2f} "
                f"({time.perf_counter()-t0:.0f}s)",
                file=sys.stderr, flush=True,
            )
            next_rep += report
    return psi, om, u, v


GHIA_Y = [0.0547, 0.1016, 0.2813, 0.4531, 0.5, 0.6172, 0.7344, 0.9531]
GHIA_U = [-0.1812, -0.2973, -0.2781, -0.1065, -0.0608, 0.0570, 0.1872, 0.4660]
GHIA_X = [0.0625, 0.2266, 0.5, 0.8047, 0.9531]
GHIA_V = [0.27485, 0.33075, 0.02526, -0.31966, -0.33714]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 129
    re = float(sys.argv[2]) if len(sys.argv) > 2 else 1000.0
    t_end = float(sys.argv[3]) if len(sys.argv) > 3 else 80.0
    psi, om, u, v = solve(n=n, re=re, t_end=t_end)
    y = np.linspace(0, 1, n)
    u_mid = u[(n - 1) // 2, :]
    v_mid = v[:, (n - 1) // 2]
    eu = []
    for yg, ug in zip(GHIA_Y, GHIA_U):
        ui = np.interp(yg, y, u_mid)
        eu.append(abs(ui - ug))
        print(f"u(y={yg:.4f}) = {ui: .4f}  ghia {ug: .4f}")
    ev = [abs(np.interp(xg, y, v_mid) - vg) for xg, vg in zip(GHIA_X, GHIA_V)]
    print(f"{n}^2 Re={re:.0f}: u max err {max(eu):.4f}  v max err {max(ev):.4f}")


if __name__ == "__main__":
    main()
