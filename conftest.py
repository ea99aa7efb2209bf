"""Root pytest config: select the JAX backend for ALL collected tests.

This must live at the repo root (not only ``tests/``) so that doctest
runs (``make doctest`` → ``pytest --doctest-modules littlemcmc_tpu``)
get the same backend forcing as the unit suite. Note the container's
``sitecustomize`` registers the remote TPU plugin in a way that ignores
``JAX_PLATFORMS``; only ``jax.config.update("jax_platforms", ...)``
actually selects the backend.

Set ``LMC_TEST_PLATFORM=tpu`` (see ``make test-tpu``) to run on the real
chip; the default is local CPU with an 8-device virtual mesh.
"""

import os

_PLATFORM = os.environ.get("LMC_TEST_PLATFORM", "cpu").lower()

if _PLATFORM == "cpu":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

if _PLATFORM == "tpu":
    # Don't force a literal platform name: TPU plugins register under
    # different names (plain "tpu"; the remote tunnel here is "axon").
    # The environment default already selects the chip, and
    # jax.default_backend() reports "tpu" either way.
    pass
else:
    jax.config.update("jax_platforms", _PLATFORM)
