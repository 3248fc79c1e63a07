"""Fused multi-sweep Jacobi smoother (ops/pallas_smooth.py).

Equivalence pins: the interpret-mode kernel must reproduce the XLA
sweep loop (krylov.jacobi_smooth_solve's body) on structured-offset
systems — batched and unbatched, 2D and 3D offset patterns, sweep
counts spanning the halo-depth range — and split_columns' zero-offset
pruning must not change any SpMV result.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orc_tpu.ops.pallas_smooth import (
    _fused_batched,
    eligible,
    fused_jacobi_sweeps,
    sweeps_xla,
)
from orc_tpu.ops.spmv import EllMatrix


def _structured_system(C, offsets, B=0, dtype=jnp.float32, seed=0):
    """Random diagonally-dominant system honoring the offsets contract
    (off == 0 wherever c + d strays outside [0, C))."""
    rng = np.random.default_rng(seed)
    K = len(offsets)
    off = rng.uniform(-1.0, 0.0, size=(C, K))
    c = np.arange(C)
    for k, d in enumerate(offsets):
        if d == 0:
            off[:, k] = 0.0
        else:
            off[((c + d) < 0) | ((c + d) >= C), k] = 0.0
    diag = 1.0 + np.abs(off).sum(axis=1) + rng.random(C)
    shape = (B, C) if B else (C,)
    b = rng.standard_normal(shape)
    x0 = rng.standard_normal(shape)
    return (
        jnp.asarray(diag, dtype),
        jnp.asarray(off, dtype),
        jnp.asarray(b, dtype),
        jnp.asarray(x0, dtype),
    )


@pytest.mark.parametrize(
    "offsets,sweeps",
    [
        ((-40, -1, 1, 40), 1),
        ((-40, -1, 1, 40), 6),
        ((-40, -1, 1, 40, 0, 0), 4),  # 2D mesh with padded K=6 slots
        ((-1600, -40, -1, 1, 40, 1600), 3),  # 3D-like pattern
        ((-130, -1, 1, 130), 5),  # |d| > LANES: multi-row halo
    ],
)
def test_kernel_matches_xla_sweeps(offsets, sweeps):
    C = 2100
    diag, off, b, x0 = _structured_system(C, offsets, B=3, seed=1)
    cols = tuple(off[:, k] for k in range(off.shape[1]))
    y_ref = sweeps_xla(diag, off, offsets, b, x0, sweeps, 0.8)
    y = _fused_batched(
        diag, cols, b, x0,
        offsets=offsets, sweeps=sweeps, relaxation=0.8, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=2e-6, atol=2e-6
    )


def test_unbatched_and_dispatch():
    offsets = (-64, -1, 1, 64)
    C = 4096
    diag, off, b, x0 = _structured_system(C, offsets, seed=2)
    y_ref = sweeps_xla(diag, off, offsets, b, x0, 4, 0.7)
    # On CPU eligible() is False -> fused_jacobi_sweeps must return the
    # identical XLA formulation.
    y = fused_jacobi_sweeps(diag, off, offsets, b, x0, 4, 0.7)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-6)
    # Kernel (interpret) against the same reference, B=1.
    cols = tuple(off[:, k] for k in range(off.shape[1]))
    y_k = _fused_batched(
        diag, cols, b[None], x0[None],
        offsets=offsets, sweeps=4, relaxation=0.7, interpret=True,
    )[0]
    np.testing.assert_allclose(
        np.asarray(y_k), np.asarray(y_ref), rtol=2e-6, atol=2e-6
    )


def test_eligibility_gate():
    offsets = (-64, -1, 1, 64)
    diag, off, b, x0 = _structured_system(300000, offsets, seed=3)
    # CPU backend: never eligible (the fused kernel is TPU-only).
    assert not eligible(diag, off, offsets, x0, 6, 0.8)
    # Traced relaxation: ineligible regardless of backend.
    assert not eligible(diag, off, offsets, x0, 6, jnp.float32(0.8))
    # f64: ineligible (v5e rejects f64 Pallas operands).
    assert not eligible(
        diag.astype(jnp.float64), off, offsets, x0, 6, 0.8
    )


def test_split_columns_drops_zero_offsets():
    offsets = (-40, -1, 1, 40, 0, 0)
    C = 1000
    diag, off, b, x0 = _structured_system(C, offsets, seed=4)
    A = EllMatrix(
        diag=diag, off=off, neighbors=None, offsets=offsets
    )
    S = A.split_columns()
    assert isinstance(S.off, tuple)
    assert len(S.off) == 4 and S.offsets == (-40, -1, 1, 40)
    np.testing.assert_allclose(
        np.asarray(S.matvec(x0)), np.asarray(A.matvec(x0)), rtol=1e-6
    )
    # Preconditioning on the split form matches preconditioning then
    # splitting.
    P1, inv1 = S.jacobi_preconditioned()
    P2, inv2 = A.jacobi_preconditioned()
    np.testing.assert_allclose(
        np.asarray(P1.matvec(x0)),
        np.asarray(P2.matvec(x0)),
        rtol=1e-6,
    )


def test_vmap_shared_matrix_routes_batched():
    """jax.vmap over fused_jacobi_sweeps with a shared matrix must
    produce the same result as the batched XLA loop (custom_vmap rule
    correctness; on CPU both sides are XLA, exercising the rule's
    shape plumbing)."""
    offsets = (-48, -1, 1, 48)
    C = 2304
    diag, off, b3, x3 = _structured_system(C, offsets, B=3, seed=5)
    y_ref = sweeps_xla(diag, off, offsets, b3, x3, 5, 0.75)
    f = lambda bb, xx: fused_jacobi_sweeps(
        diag, off, offsets, bb, xx, 5, 0.75
    )
    y = jax.vmap(f)(b3, x3)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=1e-6, atol=1e-6
    )
