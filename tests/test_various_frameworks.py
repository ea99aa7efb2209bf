"""Cross-framework model adapters, end-to-end.

Counterpart of the reference's ``tests/test_various_frameworks.py``: the
same 3-parameter linear-regression model supplied from JAX (native),
NumPy (host callback), and PyTorch (host callback), each sampled
end-to-end. The reference only asserted shapes (which is how its broken
mp path shipped — SURVEY.md §2); here the three posteriors must also
*agree with each other* within MC error.
"""

import numpy as np
import pytest

import littlemcmc_tpu as lmc

# fixed synthetic dataset (reference test_various_frameworks.py:25-53 uses
# the same true coefficients b0=1, b1=2, log_sigma=-1)
_RNG = np.random.RandomState(0)
_X = _RNG.randn(50)
_Y = 1.0 + 2.0 * _X + np.exp(-1.0) * _RNG.randn(50)
_TRUE = np.array([1.0, 2.0, -1.0])


def _np_logp_dlogp(q):
    b0, b1, log_sigma = q
    sigma2 = np.exp(2 * log_sigma)
    resid = _Y - (b0 + b1 * _X)
    n = _X.shape[0]
    logp = -n * log_sigma - 0.5 * np.sum(resid ** 2) / sigma2
    d0 = np.sum(resid) / sigma2
    d1 = np.sum(resid * _X) / sigma2
    dls = -n + np.sum(resid ** 2) / sigma2
    return logp, np.array([d0, d1, dls])


def _jax_logp_dlogp(q):
    import jax.numpy as jnp

    x = jnp.asarray(_X, q.dtype)
    y = jnp.asarray(_Y, q.dtype)
    b0, b1, log_sigma = q[0], q[1], q[2]
    sigma2 = jnp.exp(2 * log_sigma)
    resid = y - (b0 + b1 * x)
    n = x.shape[0]
    logp = -n * log_sigma - 0.5 * jnp.sum(resid ** 2) / sigma2
    d0 = jnp.sum(resid) / sigma2
    d1 = jnp.sum(resid * x) / sigma2
    dls = -n + jnp.sum(resid ** 2) / sigma2
    return logp, jnp.stack([d0, d1, dls])


def _sample(f, chains=4, draws=500, tune=500, seed=11):
    trace, stats = lmc.sample(
        logp_dlogp_func=f, model_ndim=3, draws=draws, tune=tune,
        chains=chains, random_seed=seed, progressbar=False,
    )
    return np.asarray(trace).reshape(-1, 3), stats


def _check_posterior(flat, label):
    mean = flat.mean(axis=0)
    # posterior concentrates near the true generating parameters
    assert np.abs(mean - _TRUE).max() < 0.3, (label, mean)
    assert flat.std(axis=0).max() < 1.0, (label, flat.std(axis=0))
    return mean


def test_jax_native():
    flat, stats = _sample(_jax_logp_dlogp)
    _check_posterior(flat, "jax")
    assert stats["diverging"].mean() < 0.02


def test_numpy_host_callback():
    f = lmc.from_numpy_callable(_np_logp_dlogp, model_ndim=3)
    flat, _ = _sample(f, chains=2, draws=300, tune=300)
    _check_posterior(flat, "numpy")


def test_torch_host_callback():
    torch = pytest.importorskip("torch")

    def torch_logp_dlogp(q):
        q = q.detach().to(torch.float64).requires_grad_(True)
        x = torch.from_numpy(_X)
        y = torch.from_numpy(_Y)
        b0, b1, log_sigma = q[0], q[1], q[2]
        sigma2 = torch.exp(2 * log_sigma)
        resid = y - (b0 + b1 * x)
        logp = -x.shape[0] * log_sigma - 0.5 * torch.sum(resid ** 2) / sigma2
        (grad,) = torch.autograd.grad(logp, q)
        return logp, grad

    f = lmc.from_torch_callable(torch_logp_dlogp, model_ndim=3)
    flat, _ = _sample(f, chains=2, draws=300, tune=300)
    _check_posterior(flat, "torch")


def test_frameworks_agree():
    """The three adapters target the same posterior: means within MC error."""
    flat_jax, _ = _sample(_jax_logp_dlogp)
    f_np = lmc.from_numpy_callable(_np_logp_dlogp, model_ndim=3)
    flat_np, _ = _sample(f_np, chains=2, draws=300, tune=300, seed=13)
    assert np.abs(flat_jax.mean(axis=0) - flat_np.mean(axis=0)).max() < 0.1
