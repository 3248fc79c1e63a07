"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths can
be exercised without TPU hardware (`shard_map` over a fake mesh). Real
TPU execution is covered by bench.py / the driver's compile checks.
"""

import os

# Must be set before jax import. Force CPU: the ambient environment sets
# JAX_PLATFORMS=axon (the tunneled TPU), which is reserved for bench runs
# — running the test suite over the tunnel is slow and flaky.
# ORC_TPU_TEST_PLATFORM overrides (used to run the ORC_TPU_SLOW-gated
# flagship validation on the real chip, where it takes minutes).
os.environ["JAX_PLATFORMS"] = os.environ.get(
    "ORC_TPU_TEST_PLATFORM", "cpu"
)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent XLA compile cache for the suite. Two reasons: (1) reruns
# skip ~240 CPU compiles (minutes saved); (2) the XLA CPU JIT has
# segfaulted nondeterministically late in full-suite runs (hundreds of
# in-process compilations; the same tests pass standalone — observed
# twice in round 4, different tests each time) and cache hits remove
# most compile work from the process. Override with ORC_TPU_TEST_CACHE
# (set to empty to disable).
_cache = os.environ.get("ORC_TPU_TEST_CACHE", "/tmp/orc_tpu_test_cache")
if _cache:
    import jax  # noqa: E402

    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update(
        "jax_persistent_cache_min_entry_size_bytes", -1
    )

REFERENCE_EXAMPLES = "/root/reference/examples"


@pytest.fixture(scope="session")
def reference_mesh_dir():
    if not os.path.isdir(REFERENCE_EXAMPLES):
        pytest.skip("reference example meshes not available")
    return REFERENCE_EXAMPLES


@pytest.fixture(scope="session")
def small_box():
    """3x3x3 unit box, generated analytically."""
    from orc_tpu.mesh import structured_box_mesh

    return structured_box_mesh(3, 3, 3)


def assert_allclose(a, b, rtol=1e-12, atol=1e-12, **kw):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol, **kw)
