#!/usr/bin/env python3
"""Chip bench: f64-accuracy IRREGULAR-mesh solve via df32 iterative
refinement (solver/refine.py) vs (a) the plain f32 slice-kernel solve
and (b) the native-f64 solve (XLA element-gather SpMV — the pre-round-5
fallback). VERDICT r4 item 4: target IR <= ~2.5x the f32 path.

Also validates ON CHIP that the exact-accumulation Pallas kernel + df32
residual reach f64-level solve accuracy (XLA:TPU preserves the EFTs;
XLA:CPU does not — see ops/df32.py).

Usage: python scripts/bench_df32_ir.py [C] [K] [band]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 200_704
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    band = int(sys.argv[3]) if len(sys.argv) > 3 else 450

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/orc_tpu_bench_cache"
    )
    print(f"backend: {jax.default_backend()}  C={C} K={K} band={band}",
          flush=True)

    from orc_tpu.mesh.reorder import build_best_slice_plan
    from orc_tpu.ops.spmv import EllMatrix
    from orc_tpu.solver.krylov import iterative_solve
    from orc_tpu.utils.settings import (
        MatrixSolverSettings,
        PreconditionMethod,
        SolutionMethod,
        SolverPrecision,
    )

    rng = np.random.default_rng(0)
    nbrs = np.clip(
        np.arange(C)[:, None] + rng.integers(-band, band, (C, K)), 0, C - 1
    )
    valid = nbrs != np.arange(C)[:, None]
    plan = build_best_slice_plan(nbrs, valid)
    assert plan is not None
    print(f"plan: tile={plan.tile} n_max={plan.n_max} "
          f"win_rows={plan.win_rows}", flush=True)
    off = rng.standard_normal((C, K)) * valid * 0.2
    diag = np.abs(off).sum(1) + rng.uniform(1.0, 2.0, C)
    x_true = rng.standard_normal(C)

    ms = MatrixSolverSettings(
        solver_type=SolutionMethod.BICGSTAB,
        iterations=100,
        relative_convergence_threshold=1e-8,
        preconditioner=PreconditionMethod.JACOBI,
    )

    def run(A, b, x0, settings, label):
        x, info = iterative_solve(A, b, x0, settings)
        _ = np.asarray(x[:8])  # dependent barrier (tunnel-safe)
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            x, info = iterative_solve(A, b, x0, settings)
            _ = np.asarray(x[:8])
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[1]
        err = np.abs(np.asarray(x, np.float64) - x_true).max()
        err /= np.abs(x_true).max()
        print(f"{label}: {dt*1e3:.1f} ms/solve, rel err vs true "
              f"{err:.2e}, iters {int(np.asarray(info.iterations))}",
              flush=True)
        return dt, err

    # (a) plain f32 slice-kernel solve
    A32 = EllMatrix(
        diag=jnp.asarray(diag, jnp.float32),
        off=jnp.asarray(off, jnp.float32),
        neighbors=jnp.asarray(nbrs, jnp.int32),
        offsets=None, plan=plan,
    )
    b32 = A32.matvec(jnp.asarray(x_true, jnp.float32))
    t32, e32 = run(A32, b32, jnp.zeros(C, jnp.float32), ms, "f32 slice")

    # (b) DF32_IR
    A64 = EllMatrix(
        diag=jnp.asarray(diag), off=jnp.asarray(off),
        neighbors=jnp.asarray(nbrs), offsets=None, plan=plan,
    )
    b64 = A64.matvec(jnp.asarray(x_true))
    t_ir, e_ir = run(
        A64, b64, jnp.zeros(C), ms.replace_precision(
            SolverPrecision.DF32_IR
        ),
        "DF32_IR",
    )

    # (c) native f64 (element-gather SpMV fallback)
    t64, e64 = run(A64, b64, jnp.zeros(C), ms, "native f64 (gather)")

    print(
        f"IR vs f32: {t_ir / t32:.2f}x | native f64 vs f32: "
        f"{t64 / t32:.1f}x | IR speedup over native f64: "
        f"{t64 / t_ir:.1f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
