"""Pallas shift-SpMV kernel vs the XLA reference (interpreter mode on
CPU; the real-TPU path is exercised by scripts/bench_spmv.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from orc_tpu.mesh import structured_box_mesh
from orc_tpu.ops.pallas_spmv import shift_spmv
from orc_tpu.ops.spmv import ell_spmv


@pytest.mark.parametrize(
    "dims", [(17, 9, 3), (5, 4, 1), (40, 11, 2)]
)
def test_matches_xla_shift_spmv(dims):
    mesh, _ = structured_box_mesh(*dims)
    C, K = mesh.cell_neighbors.shape
    interior = np.asarray(
        mesh.face_interior[mesh.cell_faces] & mesh.cell_face_mask
    )
    rng = np.random.default_rng(0)
    off = jnp.asarray(rng.standard_normal((C, K)) * interior)
    diag = jnp.asarray(rng.standard_normal(C))
    x = jnp.asarray(rng.standard_normal(C))
    y_ref = ell_spmv(diag, off, mesh.cell_neighbors, x, mesh.neighbor_offsets)
    y_pal = shift_spmv(diag, off, mesh.neighbor_offsets, x, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_ref), rtol=1e-12, atol=1e-13
    )


def test_multiblock_boundaries():
    """C large enough for several grid blocks; offsets crossing lane and
    block boundaries."""
    C = 128 * 700  # > 2 blocks of 256 rows
    rng = np.random.default_rng(1)
    offsets = (-130, -1, 1, 130, 0, 0)
    K = len(offsets)
    idx = np.arange(C)
    off = np.zeros((C, K))
    nbrs = np.tile(idx[:, None], (1, K))
    for k, d in enumerate(offsets[:4]):
        tgt = idx + d
        ok = (tgt >= 0) & (tgt < C)
        off[ok, k] = rng.standard_normal(ok.sum())
        nbrs[ok, k] = tgt[ok]
    diag = jnp.asarray(rng.standard_normal(C))
    x = jnp.asarray(rng.standard_normal(C))
    offj = jnp.asarray(off)
    y_ref = ell_spmv(diag, offj, jnp.asarray(nbrs, jnp.int32), x, offsets)
    y_pal = shift_spmv(diag, offj, offsets, x, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_ref), rtol=1e-12, atol=1e-12
    )
