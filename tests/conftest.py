"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(shard_map over a Mesh, ppermute halo exchange) execute without TPU hardware.
Must run before jax initializes its backends.
"""

import os

# force CPU even when the environment preselects a TPU platform.  The axon
# sitecustomize hook re-registers its backend and overrides JAX_PLATFORMS, so
# the env var alone is NOT enough — jax.config.update after import is.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def lenna():
    """512×512 BGR u8 sample image (reference: sample_image/lenna.png)."""
    cv2 = pytest.importorskip("cv2")
    path = "/root/reference/sample_image/lenna.png"
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        pytest.skip("lenna.png not available")
    return np.asarray(img)
