#!/usr/bin/env python3
"""Chip probe: reference-default fused assembly (CD1 + SecondOrder +
Rhie-Chow) with the round-5 in-kernel Green-Gauss gradient (AsmSpec.gg)
vs the round-4 streamed-plane formulation.

Reports per-pass time and bandwidth under BOTH traffic accountings:
- r4 accounting (includes the separate XLA gradient pass + gp planes:
  37 C values at K=6) — the series the VERDICT 70% bar is defined on;
- honest gg accounting (the new formulation's algorithmic minimum:
  30 C values) — true utilization.

Usage: python scripts/bench_gg_fused.py [n]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ORC_TPU_X64", "0")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _scan_slope  # hardened tunnel timing

jax.config.update(
    "jax_compilation_cache_dir", "/tmp/orc_tpu_bench_cache"
)

V5E_HBM_GBPS = 819.0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    import dataclasses as _dc

    from orc_tpu.models.cavity import cavity_case
    from orc_tpu.ops.ck_ops import build_ck_geometry, ck_bc, ck_pressure_gradient
    from orc_tpu.ops.fields import device_bc
    from orc_tpu.ops.pallas_assembly import (
        bc_value_table,
        momentum_assembly,
        pack_flags,
        pc_assembly,
    )
    from orc_tpu.solver.simple import _pallas_asm_spec
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

    mesh, table = cavity_case(n=n, dtype=jnp.float32)
    s_rc = NumericalSettings(
        momentum=MomentumScheme.CD1,
        pressure_interpolation=PressureInterpolation.SECOND_ORDER,
        velocity_interpolation=VelocityInterpolation.RHIE_CHOW,
        momentum_relaxation=0.7,
        relaxation_mode=RelaxationMode.IMPLICIT,
        matrix_solver=MatrixSolverSettings(
            solver_type=SolutionMethod.BICGSTAB, iterations=50,
            preconditioner=PreconditionMethod.JACOBI,
        ),
    )
    ck = build_ck_geometry(mesh, len(table.zone_ids))
    zc, zs, zv = device_bc(table, dtype=jnp.float32)
    bc = ck_bc(ck, zc, zs, zv)
    flags = pack_flags(ck.interior, ck.mask)
    bcv = bc_value_table(zs, zv)
    C = mesh.n_cells

    spec = _pallas_asm_spec(mesh, table, s_rc, ck)
    assert spec is not None, "fused kernels ineligible?"
    cols, aspec, interp = spec
    K = len(cols)
    print(f"n={n} C={C} K={K} gg={aspec.gg}", flush=True)

    rng = np.random.default_rng(0)
    st0 = (
        jnp.asarray(rng.standard_normal((C, 3)) * 1e-3, jnp.float32),
        jnp.asarray(rng.standard_normal(C) * 1e-3, jnp.float32),
        jnp.ones((C,), jnp.float32),
    )

    def make_pair(a):
        def pair(st):
            vel, p, md = st
            if a.gg:
                grad_p = None
            else:
                grad_p = ck_pressure_gradient(mesh, ck, bc, p)
            mdiag, moff, b3 = momentum_assembly(
                vel, p, bcv, flags, cols, 1.0, 1e-3, 0.7,
                grad_p=grad_p, mom_diag=md, spec=a, interpret=interp,
            )
            pdiag, poff, bp = pc_assembly(
                vel, mdiag, bcv, flags, cols, 1.0,
                p=p, grad_p=grad_p, spec=a, interpret=interp,
            )
            b3c = jnp.moveaxis(b3, 0, -1)
            return (vel + 1e-12 * b3c, p + 1e-12 * bp, md + 1e-12 * pdiag)

        return pair

    bytes_r4 = C * 4 * (
        (1 + 2) + (4 + 2 + 1 + 1 + 1 + K + 3) + (7 + 1 + 1 + K + 1)
    )
    bytes_gg = C * 4 * ((4 + 1 + 1 + K + 3 + 1) + (4 + 1 + 1 + K + 1 + 1))
    for label, a in (("gg-in-kernel", aspec._replace(gg=True)),
                     ("r4-streamed", aspec._replace(gg=False))):
        t = _scan_slope(make_pair(a), st0, n=128)
        print(
            f"{label}: {t * 1e6:.1f} us/pass | "
            f"r4-accounting {bytes_r4 / t / 1e9:.1f} GB/s "
            f"({bytes_r4 / t / 1e9 / V5E_HBM_GBPS * 100:.1f}%) | "
            f"gg-accounting {bytes_gg / t / 1e9:.1f} GB/s "
            f"({bytes_gg / t / 1e9 / V5E_HBM_GBPS * 100:.1f}%)",
            flush=True,
        )


if __name__ == "__main__":
    main()
