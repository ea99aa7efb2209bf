"""Unit tests for log-space math utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from littlemcmc_tpu.math import log1mexp, logbern, logdiffexp


def test_log1mexp_matches_numpy():
    x = np.array([1e-4, 0.1, 0.5, 0.683, 1.0, 5.0, 50.0])
    expected = np.log1p(-np.exp(-x))
    got = np.asarray(log1mexp(jnp.asarray(x, jnp.float64 if jax.config.x64_enabled else jnp.float32)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_logdiffexp():
    a, b = 2.0, 1.0
    expected = np.log(np.exp(a) - np.exp(b))
    got = float(logdiffexp(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_logbern_probability():
    keys = jax.random.split(jax.random.key(0), 4000)
    log_p = jnp.log(0.3)
    hits = jax.vmap(lambda k: logbern(k, log_p))(keys)
    rate = float(jnp.mean(hits))
    assert abs(rate - 0.3) < 0.03


def test_logbern_extremes_and_nan():
    key = jax.random.key(1)
    assert bool(logbern(key, jnp.asarray(0.0)))  # p = 1 always true
    assert not bool(logbern(key, jnp.asarray(-jnp.inf)))  # p = 0 never
    assert not bool(logbern(key, jnp.asarray(jnp.nan)))  # NaN -> False, no raise
