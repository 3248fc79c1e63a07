"""Mixed-precision iterative refinement: f64-accuracy linear solves
from f32 kernels (VERDICT r4 item 4).

v5e has no native f64 — XLA software-emulates it, and Pallas custom
calls cannot take f64 operands at all, so an f64 solve on an IRREGULAR
mesh used to ride the XLA element-gather SpMV (~400x the structured
shift, BASELINE.md). This module replaces the reference's
everything-f64 stance (lib.rs:213) with the classical TPU-native
answer: **iterative refinement**.

    split once:  A = Ah + Al,  b = bh + bl   (f32 hi/lo pairs)
    repeat k times:
        r  = b - A x          (df32 accuracy ~2^-45: ops/df32.py +
                               the exact-accumulation slice kernel,
                               ops/pallas_slice.slice_spmv_exact)
        d  = solve(Ah, r_hi)  (PLAIN f32 — the fast shift / Pallas
                               slice path, full Krylov machinery)
        x += d                (df32 add)

Each refinement contracts the error by the inner solve's relative
accuracy; the df32 residual sets the attainable limit (~2^-45 * kappa).
The expensive high-precision work is ONE residual per refinement, not
per Krylov iteration, so the cost approaches the plain f32 solve.

Opt-in: MatrixSolverSettings.precision = SolverPrecision.DF32_IR on an
f64 system (utils/settings.py); routed by krylov.iterative_solve.
Single-device only (the sharded runtime runs f32 + compensated
reductions instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orc_tpu.ops.df32 import (
    df_add,
    df_from_f64,
    df_mul,
    df_to_f64,
)
from orc_tpu.ops.spmv import EllMatrix


def _interp():
    return jax.default_backend() == "cpu"


def _exact_off(coef_h, plan, xh):
    """Error-tracked off-diagonal product coef_h @ xh over the slice
    plan, vmap-unrollable (cf. pallas_slice._vmappable_kernel)."""
    from jax.custom_batching import custom_vmap

    from orc_tpu.ops.pallas_slice import slice_spmv_exact

    interpret = _interp()

    @custom_vmap
    def run(c, x):
        return slice_spmv_exact(c, plan, x, interpret=interpret)

    @run.def_vmap
    def _rule(axis_size, in_batched, c, x):
        cb, xb = in_batched
        outs = [
            run(c[i] if cb else c, x[i] if xb else x)
            for i in range(axis_size)
        ]
        ys, es = zip(*outs)
        return (jnp.stack(ys), jnp.stack(es)), (True, True)

    return run(coef_h, xh)


def _plain_off(coef, plan, x):
    """Plain f32 off-diagonal slice product (zero diagonal)."""
    from orc_tpu.ops.spmv import slice_spmv

    C = plan.n_cells
    return slice_spmv(jnp.zeros((C,), x.dtype), coef, plan, x)


class _DfMatrix:
    """f64 EllMatrix split into f32 (hi, lo) planes, with a df32-
    accurate matvec for residuals and the hi-plane f32 matrix for the
    inner solves.

    BACKEND CAVEAT (measured, round 5): XLA:CPU's LLVM pipeline
    rewrites the error-free transformations away (two_sum/two_prod
    error terms collapse; y+e accuracy degrades from ~1e-13 to f32
    epsilon) and no xla_cpu flag restores them, while XLA:TPU
    preserves them exactly. The residual therefore uses native f64 on
    CPU (cheap there) and the df32 formulation on TPU (where f64 is
    emulated ~2.5x slower and Pallas rejects f64 operands outright)."""

    def __init__(self, A: EllMatrix):
        self._A64 = A if jax.default_backend() == "cpu" else None
        if A.plan is not None and not A.slice_layout:
            A = A.prepare()  # f64 XLA selects — once per solve
        self.plan = A.plan
        self.offsets = A.offsets
        self.slice_layout = A.slice_layout
        self.diag_h, self.diag_l = df_from_f64(A.diag)
        self.off_h, self.off_l = df_from_f64(A.off)
        self.A32 = EllMatrix(
            diag=self.diag_h,
            off=self.off_h,
            neighbors=None if A.neighbors is None else A.neighbors,
            offsets=A.offsets,
            plan=A.plan,
            slice_layout=A.slice_layout,
        )

    def df_matvec(self, xh, xl):
        """(A x)_df to first order: exact hi*hi accumulation + hi*lo +
        lo*hi cross terms; lo*lo (~2^-48) dropped."""
        if self._A64 is not None:  # CPU: native f64 (see class note)
            return df_from_f64(self._A64.matvec(df_to_f64(xh, xl)))
        if self.slice_layout:
            y1, e1 = _exact_off(self.off_h, self.plan, xh)
            y2 = _plain_off(self.off_h, self.plan, xl)
            y3 = _plain_off(self.off_l, self.plan, xh)
            dh, dl = df_mul(self.diag_h, self.diag_l, xh, xl)
            return df_add(y1, e1 + y2 + y3, dh, dl)
        # Structured shift path: full df32 SpMV (ops/df32.py).
        from orc_tpu.ops.df32 import df_spmv

        return df_spmv(
            self.diag_h, self.diag_l, self.off_h, self.off_l,
            self.offsets, xh, xl,
        )


def df32_ir_solve(
    A: EllMatrix,
    b,
    x0,
    settings,
    axis_sum,
    project,
    refine_steps: int = 3,
):
    """f64-accuracy solve of the f64 system (A, b) via df32 iterative
    refinement with plain-f32 inner solves. Returns (x_f64, SolveInfo)
    like every krylov solver; SolveInfo.residual is the df32-accurate
    final residual norm (f32 scalar widened to the b dtype)."""
    from orc_tpu.solver.krylov import SolveInfo, iterative_solve
    from orc_tpu.utils.settings import SolverPrecision

    inner_settings = settings.replace_precision(SolverPrecision.NATIVE)
    M = _DfMatrix(A)
    bh, bl = df_from_f64(b)
    xh, xl = df_from_f64(x0)

    it_total = jnp.zeros((), jnp.int32)
    diverged = jnp.zeros((), bool)
    for _ in range(refine_steps):
        axh, axl = M.df_matvec(xh, xl)
        rh, rl = df_add(bh, bl, -axh, -axl)
        rh, rl = project(rh), project(rl)
        d, info = iterative_solve(
            M.A32,
            rh,
            jnp.zeros_like(rh),
            inner_settings,
            axis_sum=axis_sum,
            project=project,
        )
        xh, xl = df_add(xh, xl, d, jnp.zeros_like(d))
        it_total = it_total + info.iterations
        diverged = diverged | info.diverged

    axh, axl = M.df_matvec(xh, xl)
    rh, _ = df_add(bh, bl, -axh, -axl)
    rh = project(rh)
    rn = jnp.sqrt(axis_sum(jnp.sum(rh * rh, axis=-1))).astype(b.dtype)
    x = df_to_f64(xh, xl)
    return x, SolveInfo(
        iterations=it_total,
        residual=rn,
        diverged=diverged | jnp.isnan(rn),
    )
