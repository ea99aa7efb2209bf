"""Test config: force the true-CPU backend with 8 virtual devices.

The container pre-registers the remote `axon` TPU backend via
sitecustomize; tests must run on local CPU (with a virtual 8-device mesh
for sharding tests), so we override the platform before any backend use.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_device_mesh():
    from jax.sharding import Mesh

    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual CPU devices, got {len(devices)}"
    return Mesh(np.array(devices), ("chains",))


def std_normal_logp_grad(q):
    """The shared test model: iid standard normal (reference tests/test_utils.py:19-28)."""
    import jax.numpy as jnp

    return -0.5 * jnp.sum(q ** 2), -q
