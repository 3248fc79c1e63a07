"""Where do the ms/iter go on an irregular mesh? (round 4)

bench_irregular_simple.py measured 322 ms/iter at 200k cells vs
2.0 ms structured (160x) — the slice-plan SpMV fixed the SOLVES, so
the residue must be the per-iteration assembly/gradient gathers
(nbr_values -> take(x, cell_neighbors) on irregular meshes) and the
per-solve prepare() scatter. This probe times each piece with the
scan-slope recipe on the permuted 448^2 cavity.

Usage: python scripts/probe_irregular_breakdown.py [n]
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/orc_tpu_jax_cache")

    from bench_irregular import build_irregular
    from orc_tpu.models.cavity import cavity_case
    from orc_tpu.ops.ck_ops import (
        build_ck_geometry,
        ck_bc,
        ck_diffusion,
        ck_face_pressure,
        ck_flux,
        ck_momentum,
        ck_pressure_correction,
        ck_pressure_gradient,
        nbr_values,
    )
    from orc_tpu.ops.fields import device_bc
    from orc_tpu.ops.spmv import EllMatrix
    from orc_tpu.solver.krylov import iterative_solve
    from orc_tpu.utils.settings import (
        MatrixSolverSettings,
        MomentumScheme,
        NumericalSettings,
        PreconditionMethod,
        PressureInterpolation,
        SolutionMethod,
        VelocityInterpolation,
    )
    import dataclasses as dc

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 448
    dtype = jnp.float32
    print(f"backend: {jax.devices()}", file=sys.stderr)
    _, mesh = build_irregular(n, dtype)
    _, table = cavity_case(n=n, dtype=dtype)
    C, K = mesh.cell_neighbors.shape
    print(f"{C} cells irregular, K={K}, plan n_max={mesh.slice_plan.n_max}",
          file=sys.stderr)

    settings = NumericalSettings(
        momentum=MomentumScheme.UD,
        pressure_interpolation=PressureInterpolation.LINEAR_WEIGHTED,
        velocity_interpolation=VelocityInterpolation.LINEAR_WEIGHTED,
        matrix_solver=MatrixSolverSettings(
            solver_type=SolutionMethod.BICGSTAB,
            iterations=50,
            preconditioner=PreconditionMethod.JACOBI,
        ),
    )
    rho, mu = 1.0, jnp.asarray(1e-3, dtype)
    zc, zs, zv = device_bc(table, dtype=dtype)
    ck = build_ck_geometry(mesh, len(table.zone_ids))
    bc = ck_bc(ck, zc, zs, zv)
    diff3 = ck_diffusion(mesh, ck, bc, mu)

    def slope(f, x0, nsteps=64):
        def run(n_steps):
            g = jax.jit(
                lambda x: jax.tree_util.tree_leaves(
                    lax.scan(
                        lambda c, _: (f(c), None), x, None, length=n_steps
                    )[0]
                )[0].ravel()[:8]
            )
            _ = np.asarray(g(x0))
            ts = []
            for _i in range(3):
                t1 = time.perf_counter()
                _ = np.asarray(g(x0))
                ts.append(time.perf_counter() - t1)
            return sorted(ts)[1]

        n0 = max(1, nsteps // 8)
        return (run(nsteps) - run(n0)) / (nsteps - n0)

    rng = np.random.default_rng(0)
    vel = jnp.asarray(rng.standard_normal((C, 3)) * 1e-3, dtype)
    p = jnp.asarray(rng.standard_normal(C) * 1e-3, dtype)
    md = jnp.ones((C, 3), dtype)
    x = jnp.asarray(rng.standard_normal(C), dtype)
    diag = jnp.abs(jnp.asarray(rng.standard_normal(C), dtype)) + 4.0
    interior = np.asarray(
        mesh.face_interior[mesh.cell_faces] & mesh.cell_face_mask
    )
    off = jnp.asarray(rng.standard_normal((C, K)) * interior, dtype)

    # 1. one [C,K] nbr_values gather (scalar field)
    t = slope(lambda v: nbr_values(mesh, v, ck.interior).sum(1), x)
    print(f"nbr_values [C,K] scalar : {t*1e6:9.1f} us")
    # 2. one [C,K,3] nbr_values gather (vector field)
    t = slope(
        lambda v: nbr_values(mesh, v, ck.interior).sum(1), vel, nsteps=16
    )
    print(f"nbr_values [C,K,3] vec  : {t*1e6:9.1f} us")

    # 3. full ck assembly pass (flux + momentum + p-correction)
    def assemble(st):
        v, pp, m = st
        v_nbr = nbr_values(mesh, v, ck.interior)
        m_nbr = nbr_values(mesh, m, ck.interior)
        flux = ck_flux(
            mesh, ck, bc, v, settings.velocity_interpolation,
            p=pp, mom_diag=m, mom_diag_nbr=m_nbr, vel_nbr=v_nbr,
        )
        F = flux * ck.area
        p_f = ck_face_pressure(
            mesh, ck, bc, pp, settings.pressure_interpolation
        )
        A3, b3, _pe = ck_momentum(
            mesh, ck, bc, settings, rho, v, F, p_f, *diff3
        )
        Ap, bp = ck_pressure_correction(mesh, ck, bc, rho, F, m)
        b3c = b3 if b3.shape[0] == C else jnp.moveaxis(b3, 0, -1)
        d3 = A3.diag
        d3c = d3[:, None] if d3.ndim == 1 else jnp.moveaxis(d3, 0, -1)
        return (v + 1e-12 * b3c, pp + 1e-12 * bp, m + 1e-12 * d3c)

    t_asm = slope(assemble, (vel, p, md), nsteps=16)
    print(f"ck assembly pass        : {t_asm*1e6:9.1f} us")

    # 4. pressure gradient (GG cell)
    t = slope(lambda v: ck_pressure_gradient(mesh, ck, bc, v).sum(1), x)
    print(f"ck_pressure_gradient    : {t*1e6:9.1f} us")

    # 5. EllMatrix.prepare() (once per solve)
    A = EllMatrix(
        diag=diag, off=off, neighbors=mesh.cell_neighbors,
        plan=mesh.slice_plan,
    )
    prep = jax.jit(lambda o: A.with_values(diag, o).prepare().off)
    _ = np.asarray(prep(off).ravel()[:8])
    ts = []
    for _ in range(7):
        t1 = time.perf_counter()
        _ = np.asarray(prep(off).ravel()[:8])
        ts.append(time.perf_counter() - t1)
    print(f"prepare() per solve     : {sorted(ts)[3]*1e6:9.1f} us")

    # 6. one slice SpMV (solve inner loop unit)
    Ap2 = jax.jit(lambda a: a.prepare())(A)
    t_mv = slope(Ap2.matvec, x, nsteps=256)
    print(f"slice SpMV              : {t_mv*1e6:9.1f} us")

    # 7. one full pressure solve (BiCGSTAB 50)
    def psolve(v):
        xs, info = iterative_solve(
            A, v, jnp.zeros_like(v), settings.matrix_solver
        )
        return v + 1e-12 * xs

    t_ps = slope(psolve, x, nsteps=8)
    print(f"pressure solve (50 it)  : {t_ps*1e6:9.1f} us")

    # 8. batched momentum smoother solve (6 jacobi sweeps, [3,C])
    A3 = EllMatrix(
        diag=jnp.broadcast_to(diag, (3, C)),
        off=jnp.broadcast_to(off, (3, C, K)),
        neighbors=mesh.cell_neighbors,
        plan=mesh.slice_plan,
    )

    def msolve(v3):
        xs, info = jax.vmap(
            lambda d, o, b: iterative_solve(
                EllMatrix(
                    diag=d, off=o, neighbors=mesh.cell_neighbors,
                    plan=mesh.slice_plan,
                ),
                b, jnp.zeros_like(b),
                settings.momentum_matrix_solver().momentum_solver(),
            )
        )(A3.diag, A3.off, v3)
        return v3 + 1e-12 * xs

    v3 = jnp.stack([x, 2 * x, -x])
    t_ms = slope(msolve, v3, nsteps=8)
    print(f"momentum smooth (6 swp) : {t_ms*1e6:9.1f} us")


if __name__ == "__main__":
    main()
