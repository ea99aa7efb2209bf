"""Pallas kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from littlemcmc_tpu.models import CorrelatedGaussian
from littlemcmc_tpu.ops import quadform_logp_grad


def test_quadform_matches_reference_math():
    m = CorrelatedGaussian(10, rho=0.6, scale_range=(0.5, 2.0))
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(32, 10).astype(np.float32))
    logp, grad = quadform_logp_grad(q, jnp.asarray(m.prec, jnp.float32))
    assert logp.shape == (32,)
    assert grad.shape == (32, 10)

    expect_logp, expect_grad = jax.vmap(m.logp_grad)(q)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(expect_logp), rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(expect_grad), rtol=2e-4, atol=1e-4)


def test_quadform_odd_shapes_padding():
    """Non-tile-aligned chains and dims must be handled by padding."""
    m = CorrelatedGaussian(7, rho=0.3, scale_range=(0.8, 1.2))
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(5, 7).astype(np.float32))
    logp, grad = quadform_logp_grad(q, jnp.asarray(m.prec, jnp.float32))
    expect_logp, expect_grad = jax.vmap(m.logp_grad)(q)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(expect_logp), rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(expect_grad), rtol=2e-4, atol=1e-4)


def test_batched_model_pallas_flag():
    m = CorrelatedGaussian(6, use_pallas=True)
    q = jnp.asarray(np.random.RandomState(2).randn(4, 6).astype(np.float32))
    logp_p, grad_p = m.batched_logp_grad(q)
    m2 = CorrelatedGaussian(6, use_pallas=False)
    logp_x, grad_x = m2.batched_logp_grad(q)
    np.testing.assert_allclose(np.asarray(logp_p), np.asarray(logp_x), rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grad_p), np.asarray(grad_x), rtol=2e-4, atol=1e-4)


def test_logistic_pallas_matches_xla():
    from littlemcmc_tpu.models import LogisticRegression, german_credit_synthetic

    X, y = german_credit_synthetic(300, 9)
    m_p = LogisticRegression(X, y, prior_scale=5.0, use_pallas=True)
    m_x = LogisticRegression(X, y, prior_scale=5.0)
    q = jnp.asarray(np.random.RandomState(3).randn(6, m_p.ndim).astype(np.float32) * 0.3)
    lp_p, g_p = m_p.batched_logp_grad(q)
    lp_x, g_x = m_x.batched_logp_grad(q)
    np.testing.assert_allclose(np.asarray(lp_p), np.asarray(lp_x), rtol=3e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=3e-4, atol=1e-3)


def test_nuts_with_batched_pallas_model_end_to_end():
    import littlemcmc_tpu as lmc
    from littlemcmc_tpu.models import LogisticRegression, german_credit_synthetic

    X, y = german_credit_synthetic(200, 5)
    m = LogisticRegression(X, y, prior_scale=5.0, use_pallas=True)
    step = lmc.NUTS(model_ndim=m.ndim, batched_logp_dlogp_func=m.batched_logp_grad)
    trace, stats = lmc.sample(
        logp_dlogp_func=m.logp_grad, model_ndim=m.ndim, draws=100, tune=100,
        chains=2, step=step, random_seed=8, progressbar=False,
    )
    assert trace.shape == (2, 100, m.ndim)
    assert stats["diverging"].mean() < 0.1
