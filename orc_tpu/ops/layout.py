"""TPU-layout-safe gathers.

XLA assigns gather outputs a row-major layout, and TPU tiles the two
minor dims to (8 sublanes, 128 lanes). Gathering mesh tables the naive
way therefore materializes hugely padded buffers:

- ``face_vals[cell_faces]`` -> [C,K] with K(=6) on lanes: 21.3x padding;
- ``vel[face_owner]``       -> [F,3] with 3 on lanes: 42.7x padding;
- ``normal[cell_faces]``    -> [C,K,3]: 42.7x padding.

Measured on v5e (scripts/bench_layout2.py, 4.2M cells f32): a gather
expansion of two face arrays costs 6.56 GiB of temps in naive layout vs
0.09 GiB when the gather is emitted with the big gathered dimension
LAST (lanes = cells/faces) and transposed back logically — XLA folds
that transpose into the consumers, so the padded buffer never exists.
This was the single-chip scale ceiling (2048^2 f32 OOM, BASELINE.md).

``take(x, idx)`` is the drop-in replacement for ``x[idx]`` used at
every gather site in the assembly/gradient/interpolation graphs.
"""

from __future__ import annotations

import jax.numpy as jnp


def take(x, idx):
    """``x[idx]`` with a TPU-layout-safe gather (see module docstring).

    Supports x of shape [N, *feat] (feat of ndim 0..2) and idx of shape
    [] / [F] / [C, K]; returns ``x[idx]`` exactly (pure layout change).
    """
    feat = x.shape[1:]
    if not feat:
        if idx.ndim <= 1:
            return x[idx]  # 1-D output: no padded minor dim
        # [C,K] index: gather [K,C] (lanes=C), transpose back.
        return x[idx.T].T
    # Flatten features and put them in FRONT so the gathered big dim
    # stays minor, then restore the logical order.
    xt = x.reshape((x.shape[0], -1)).T  # [pf, N]
    if idx.ndim <= 1:
        g = xt[:, idx]  # [pf, F]
        return g.T.reshape(idx.shape + feat)
    g = xt[:, idx.T]  # [pf, K, C]
    return jnp.transpose(g, (2, 1, 0)).reshape(idx.shape + feat)
