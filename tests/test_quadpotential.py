"""Quadpotential tests: algebra, momentum distributions, Welford, adaptation.

Modeled on the reference's most thorough test file
(``tests/test_quadpotential.py``): velocity/energy equivalence across
parameterizations, momentum sampling distribution checks, Welford vs exact
moments (including warm starts), and adaptation-window mechanics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from littlemcmc_tpu.quadpotential import (
    PositiveDefiniteError,
    QuadPotentialDiag,
    QuadPotentialDiagAdapt,
    QuadPotentialFull,
    QuadPotentialFullAdapt,
    QuadPotentialFullInv,
    WelfordCovariance,
    WelfordVariance,
    quad_potential,
)


def _dense_cov(n, seed=3):
    rng = np.random.RandomState(seed)
    L = rng.randn(n, n) * 0.2 + np.eye(n)
    return np.tril(L) @ np.tril(L).T


def test_quad_potential_factory_pd_check():
    with pytest.raises(PositiveDefiniteError):
        quad_potential(np.array([1.0, -1.0]), is_cov=True)
    with pytest.raises(PositiveDefiniteError):
        quad_potential(np.diag([1.0, np.nan]), is_cov=False)


def test_diag_cov_vs_precision_equivalence():
    """Diag(C, cov) and Diag(1/C, precision) must give identical dynamics."""
    v = np.array([0.5, 1.0, 4.0], np.float32)
    pot_cov = quad_potential(v, is_cov=True)
    pot_prec = quad_potential(1.0 / v, is_cov=False)
    p = jnp.asarray([1.0, -2.0, 0.5])
    np.testing.assert_allclose(
        np.asarray(pot_cov.velocity(p)), np.asarray(pot_prec.velocity(p)), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(pot_cov.kinetic(p)), float(pot_prec.kinetic(p)), rtol=1e-6
    )


def test_full_cov_vs_precision_equivalence():
    cov = _dense_cov(4).astype(np.float32)
    prec = np.linalg.inv(cov).astype(np.float32)
    pot_cov = quad_potential(cov, is_cov=True)
    pot_prec = quad_potential(prec, is_cov=False)
    p = jnp.asarray(np.random.RandomState(0).randn(4), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(pot_cov.velocity(p)), np.asarray(pot_prec.velocity(p)), rtol=2e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        float(pot_cov.kinetic(p)), float(pot_prec.kinetic(p)), rtol=2e-3
    )


def test_diag_full_agree_on_diagonal_matrix():
    v = np.array([0.5, 2.0, 1.5], np.float32)
    pot_d = QuadPotentialDiag.create(jnp.asarray(v))
    pot_f = QuadPotentialFull.create(jnp.diag(jnp.asarray(v)))
    p = jnp.asarray([0.3, -1.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(pot_d.velocity(p)), np.asarray(pot_f.velocity(p)), rtol=1e-5
    )


@pytest.mark.parametrize("kind", ["diag", "full", "fullinv"])
def test_momentum_sampling_distribution(kind):
    """Momentum must be N(0, M) where the metric 'cov' is M^{-1}.

    Mirrors the reference's 1000-draw distribution checks
    (``tests/test_quadpotential.py:90-119``).
    """
    n = 3
    cov = _dense_cov(n).astype(np.float32)
    if kind == "diag":
        v = np.diag(cov).astype(np.float32)
        pot = QuadPotentialDiag.create(jnp.asarray(v))
        target = np.diag(1.0 / v)
    elif kind == "full":
        pot = QuadPotentialFull.create(jnp.asarray(cov))
        target = np.linalg.inv(cov)
    else:
        mass = np.linalg.inv(cov).astype(np.float32)
        pot = QuadPotentialFullInv.create(jnp.asarray(mass))
        target = mass

    keys = jax.random.split(jax.random.key(0), 4000)
    samples = np.asarray(jax.vmap(pot.sample_momentum)(keys))
    emp = np.cov(samples.T)
    np.testing.assert_allclose(emp, target, rtol=0.2, atol=0.1)


def test_welford_variance_matches_numpy():
    rng = np.random.RandomState(0)
    xs = rng.randn(120, 4).astype(np.float32) * np.array([1.0, 2.0, 0.5, 3.0], np.float32)
    wv = WelfordVariance.create(4, dtype=jnp.float32)
    for x in xs:
        wv = wv.add_sample(jnp.asarray(x))
    # biased (divide by w_sum) variance, matching the reference's usage
    np.testing.assert_allclose(
        np.asarray(wv.current_variance()), xs.var(axis=0), rtol=1e-3
    )
    np.testing.assert_allclose(np.asarray(wv.current_mean()), xs.mean(axis=0), rtol=1e-3, atol=1e-4)


def test_welford_variance_warm_start():
    """Initial mean/var with weight w behaves like w pseudo-observations."""
    xs = np.array([[1.0], [2.0], [3.0]], np.float32)
    w0 = 10.0
    mu0, var0 = np.array([0.5], np.float32), np.array([2.0], np.float32)
    wv = WelfordVariance.create(1, mu0, var0, w0, dtype=jnp.float32)
    for x in xs:
        wv = wv.add_sample(jnp.asarray(x))

    # replicate sequentially in numpy
    w_sum, mean, raw = w0, mu0.astype(np.float64), var0.astype(np.float64) * w0
    for x in xs:
        w_sum += 1.0
        old = x - mean
        mean = mean + old / w_sum
        raw = raw + old * (x - mean)
    np.testing.assert_allclose(np.asarray(wv.current_variance()), raw / w_sum, rtol=1e-4)


def test_welford_covariance_matches_numpy():
    rng = np.random.RandomState(1)
    xs = rng.randn(200, 3).astype(np.float32)
    wc = WelfordCovariance.create(3, dtype=jnp.float32)
    for x in xs:
        wc = wc.add_sample(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(wc.current_covariance()), np.cov(xs.T), rtol=1e-2, atol=1e-3
    )


def test_diag_adapt_learns_variance():
    """After many updates the metric diag approaches the sample variance."""
    rng = np.random.RandomState(0)
    true_var = np.array([0.25, 4.0], np.float32)
    pot = QuadPotentialDiagAdapt.create(2, initial_weight=10.0,
                                        initial_mean=jnp.zeros(2),
                                        initial_diag=jnp.ones(2))
    tuning = jnp.asarray(True)
    for _ in range(300):
        x = jnp.asarray(rng.randn(2).astype(np.float32) * np.sqrt(true_var))
        pot = pot.update(x, x, tuning)
    np.testing.assert_allclose(np.asarray(pot.var), true_var, rtol=0.35)
    assert int(pot.n_samples) == 300


def test_diag_adapt_window_swap():
    """Foreground/background swap happens at n_samples % window == 0."""
    pot = QuadPotentialDiagAdapt.create(1, initial_weight=10.0,
                                        initial_mean=jnp.zeros(1),
                                        initial_diag=jnp.ones(1),
                                        adaptation_window=5)
    tuning = jnp.asarray(True)
    for i in range(6):
        pot = pot.update(jnp.asarray([1.0 + i]), jnp.zeros(1), tuning)
    # The swap happens at the 6th update (old n_samples == 5 == window),
    # *after* adding that sample to both windows: the foreground becomes
    # the old background (6 samples, no warm-start weight) and the
    # background is reset fresh.
    assert float(pot.fg.w_sum) == 6.0
    assert float(pot.bg.w_sum) == 0.0
    pot = pot.update(jnp.asarray([9.0]), jnp.zeros(1), tuning)
    assert float(pot.bg.w_sum) == 1.0


def test_diag_adapt_no_update_when_not_tuning():
    pot = QuadPotentialDiagAdapt.create(2)
    pot2 = pot.update(jnp.asarray([5.0, 5.0]), jnp.zeros(2), jnp.asarray(False))
    np.testing.assert_allclose(np.asarray(pot2.var), np.asarray(pot.var))
    assert int(pot2.n_samples) == 0


def test_full_adapt_learns_covariance():
    rng = np.random.RandomState(2)
    L = np.array([[1.0, 0.0], [0.8, 0.6]], np.float32)
    true_cov = L @ L.T
    pot = QuadPotentialFullAdapt.create(2, initial_mean=jnp.zeros(2),
                                        initial_cov=jnp.eye(2), initial_weight=10.0)
    tuning = jnp.asarray(True)
    for _ in range(400):
        x = jnp.asarray((L @ rng.randn(2)).astype(np.float32))
        pot = pot.update(x, x, tuning)
    np.testing.assert_allclose(np.asarray(pot.cov), true_cov, rtol=0.4, atol=0.15)
    assert not bool(pot.chol_failed)
    # Cholesky factor consistent with cov
    np.testing.assert_allclose(
        np.asarray(pot.chol @ pot.chol.T), np.asarray(pot.cov), rtol=1e-3, atol=1e-4
    )


def test_full_adapt_shrinkage_formula():
    """regularize=True applies Stan-style shrinkage toward 1e-3*I.

    cov == w/(w+5) * raw_cov + 1e-3 * 5/(w+5) * I, with raw_cov taken
    from an unregularized twin fed the same samples.
    """
    rng = np.random.RandomState(7)
    kw = dict(initial_mean=jnp.zeros(3), initial_cov=jnp.eye(3), initial_weight=1.0)
    reg = QuadPotentialFullAdapt.create(3, regularize=True, **kw)
    raw = QuadPotentialFullAdapt.create(3, regularize=False, **kw)
    tuning = jnp.asarray(True)
    k = 12
    for _ in range(k):
        x = jnp.asarray(rng.randn(3).astype(np.float32))
        reg = reg.update(x, x, tuning)
        raw = raw.update(x, x, tuning)
    w = k + 1.0  # warm-start counts one pseudo-sample
    shrink = w / (w + 5.0)
    expected = shrink * np.asarray(raw.cov) + 1e-3 * (1.0 - shrink) * np.eye(3)
    np.testing.assert_allclose(np.asarray(reg.cov), expected, rtol=1e-5, atol=1e-7)


def test_full_adapt_shrinkage_keeps_rank_deficient_cov_pd():
    """ndim > samples-in-window: the raw sample covariance is singular
    (Cholesky produces non-finite entries); the shrunk one stays PD.

    This is the failure mode behind the round-1 per-chain full-adapt
    overdispersion (BENCH var_ratio 1.39 -> 1.00 with shrinkage): at
    ndim ~ window size the windowed estimate is (near-)singular.
    """
    rng = np.random.RandomState(8)
    n, k = 8, 4
    wc = WelfordCovariance.create(n, dtype=jnp.float32)
    for _ in range(k):
        wc = wc.add_sample(jnp.asarray(rng.randn(n).astype(np.float32)))
    raw_cov = np.asarray(wc.current_covariance())
    # rank <= k-1 < n: the raw estimate is singular and unusable as a metric
    assert np.linalg.matrix_rank(raw_cov, tol=1e-5) < n
    assert not np.all(np.isfinite(np.asarray(jnp.linalg.cholesky(jnp.asarray(raw_cov)))))
    # the shrunk estimate (same formula as QuadPotentialFullAdapt.update)
    w = float(wc.n_samples)
    shrink = w / (w + 5.0)
    reg_cov = shrink * raw_cov + 1e-3 * (1.0 - shrink) * np.eye(n)
    assert np.linalg.eigvalsh(reg_cov).min() > 0
    assert np.all(np.isfinite(np.linalg.cholesky(reg_cov)))


def test_full_adapt_window_doubles():
    pot = QuadPotentialFullAdapt.create(2, adaptation_window=4)
    tuning = jnp.asarray(True)
    rng = np.random.RandomState(3)
    for _ in range(6):
        pot = pot.update(jnp.asarray(rng.randn(2).astype(np.float32)), jnp.zeros(2), tuning)
    assert int(pot.window) == 8  # doubled once after the first window
    assert int(pot.prev_update) == 4


def test_adaptation_under_vmap():
    """Per-chain adaptation must vectorize: two chains, different data."""
    pots = jax.vmap(lambda m: QuadPotentialDiagAdapt.create(2, initial_mean=m,
                                                            initial_diag=jnp.ones(2),
                                                            initial_weight=1.0))(jnp.zeros((2, 2)))
    xs = jnp.asarray([[1.0, 1.0], [10.0, 10.0]], jnp.float32)
    upd = jax.vmap(lambda p, x: p.update(x, x, jnp.asarray(True)))(pots, xs)
    var = np.asarray(upd.var)
    assert var[1, 0] > var[0, 0]  # bigger sample -> bigger variance estimate
