"""3-parameter linear regression: the reference's cross-framework test model.

Mirrors the model used by the reference's framework cookbook and
``tests/test_various_frameworks.py:25-82`` (y = b0 + b1*x + N(0, exp(2*log_sigma)),
true params [0.5, 2.0, log(0.5)]), so users can compare ports 1:1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LinearRegression"]


class LinearRegression:
    """Gaussian linear regression with flat priors; q = [b0, b1, log_sigma]."""

    ndim = 3

    def __init__(self, n_points: int = 50, seed: int = 0, dtype=jnp.float32):
        rng = np.random.RandomState(seed)
        x = np.linspace(-1, 1, n_points)
        true = dict(b0=0.5, b1=2.0, sigma=0.5)
        y = true["b0"] + true["b1"] * x + true["sigma"] * rng.randn(n_points)
        self._x = jnp.asarray(x, dtype)
        self._y = jnp.asarray(y, dtype)
        self.dtype = dtype
        self.true_params = np.array([true["b0"], true["b1"], np.log(true["sigma"])])

    def logp(self, q: jax.Array) -> jax.Array:
        b0, b1, log_sigma = q[0], q[1], q[2]
        mu = b0 + b1 * self._x
        n = self._x.shape[0]
        return (
            -n * log_sigma
            - 0.5 * jnp.sum((self._y - mu) ** 2) * jnp.exp(-2.0 * log_sigma)
        )

    def logp_grad(self, q: jax.Array):
        return jax.value_and_grad(self.logp)(q)

    def batched_logp_grad(self, q: jax.Array):
        """Chain-batched ``(logp, grad)`` for ``q: (chains, n)``."""
        return jax.vmap(self.logp_grad)(q)
