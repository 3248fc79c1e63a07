"""Residual-history regression against the pinned round-1 fixture.

BASELINE.json's correctness target is a residual-history match at 1e-6
relative tolerance on couette_flow_128x64x1. The Rust reference cannot
be built here, so the pinned trajectory is this framework's own f64
run (scripts/gen_residual_fixture.py). Any change to SIMPLE semantics
must reproduce it or consciously regenerate the fixture.
"""

import os

import numpy as np
import pytest

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "residual_history_couette_r1.npz"
)


def test_history_matches_fixture(reference_mesh_dir):
    if not os.path.exists(FIXTURE):
        pytest.skip("fixture not generated")
    import scripts.gen_residual_fixture as gen

    history = gen.build()
    from orc_tpu.solver.simple import stack_history

    hs = stack_history(history)
    with np.load(FIXTURE) as z:
        for field in (
            "vel_avg",
            "p_corr_norm",
            "vel_corr_norm",
            "mom_residual",
            "pc_residual",
            "peclet_avg",
        ):
            got = np.asarray(getattr(hs, field))
            want = z[field]
            np.testing.assert_allclose(
                got, want, rtol=1e-6, atol=1e-300,
                err_msg=f"history field {field} drifted from the pinned "
                "round-1 trajectory (regenerate the fixture if the change "
                "is intentional: scripts/gen_residual_fixture.py)",
            )
        assert not z["diverged"].any()
