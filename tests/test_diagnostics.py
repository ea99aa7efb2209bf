"""Diagnostics tests: R-hat and bulk ESS behave correctly on known cases."""

import numpy as np

from littlemcmc_tpu.utils import ess_bulk, split_rhat, summary


def test_rhat_iid_near_one():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 1000)
    r = split_rhat(x)
    assert 0.99 < r < 1.02


def test_rhat_detects_nonmixing():
    rng = np.random.RandomState(1)
    x = rng.randn(4, 500)
    x[0] += 5.0  # one chain stuck elsewhere
    assert split_rhat(x) > 1.5


def test_ess_iid_close_to_n():
    rng = np.random.RandomState(2)
    c, n = 4, 2000
    x = rng.randn(c, n)
    ess = ess_bulk(x)
    assert 0.5 * c * n < ess < 1.6 * c * n


def test_ess_autocorrelated_much_smaller():
    rng = np.random.RandomState(3)
    c, n, rho = 4, 2000, 0.95
    x = np.zeros((c, n))
    for i in range(1, n):
        x[:, i] = rho * x[:, i - 1] + np.sqrt(1 - rho ** 2) * rng.randn(c)
    ess = ess_bulk(x)
    # theoretical ESS factor (1-rho)/(1+rho) ~ 0.026
    assert ess < 0.15 * c * n
    assert ess > 10


def test_summary_shapes():
    rng = np.random.RandomState(4)
    trace = rng.randn(2, 300, 3)
    s = summary(trace)
    assert s["mean"].shape == (3,)
    assert s["rhat"].shape == (3,)
    assert np.isfinite(s["ess_bulk"]).all()


def test_bfmi_behaviour():
    from littlemcmc_tpu.utils import bfmi
    rng = np.random.RandomState(5)
    # iid energies -> BFMI ~ 2 (diff var = 2*var)
    e_good = rng.randn(2, 2000)
    assert (bfmi(e_good) > 1.5).all()
    # highly autocorrelated energies -> small BFMI
    e_bad = np.cumsum(rng.randn(2, 2000) * 0.01, axis=1) + rng.randn(2, 1)
    assert (bfmi(e_bad) < 0.3).all()


def test_warnings_from_stats_excludes_tuning_columns():
    """tune= drops the tuning columns from every check (regression)."""
    import numpy as np
    from littlemcmc_tpu import warnings_from_stats, WarningType

    chains, tune, draws = 2, 50, 100
    div = np.zeros((chains, tune + draws), bool)
    div[:, :tune] = True  # all tuning draws diverge; sampling is clean
    accept = np.full((chains, tune + draws), 0.8)
    stats = {"diverging": div, "mean_tree_accept": accept}

    warns = warnings_from_stats(stats, tune=tune)
    assert not any(w.kind == WarningType.DIVERGENCES for w in warns)

    warns_no_tune = warnings_from_stats(stats)
    assert any(w.kind == WarningType.DIVERGENCES for w in warns_no_tune)

def test_exact_beta_interval():
    """_betainc matches jax.scipy.special.betainc; ppf round-trips.

    The acceptance warning interval is the reference's exact
    ``st.beta(...).interval(0.95)`` (``step_sizes.py:106-110``), not a
    normal approximation.
    """
    import jax
    import numpy as np
    from jax.scipy.special import betainc as jbetainc
    from littlemcmc_tpu.report import _beta_interval_95, _beta_ppf, _betainc

    rng = np.random.default_rng(7)
    with jax.enable_x64():
        for _ in range(200):
            a = float(rng.uniform(0.2, 150.0))
            b = float(rng.uniform(0.2, 150.0))
            x = float(rng.uniform(0.0, 1.0))
            want = float(jbetainc(a, b, x))
            assert abs(_betainc(a, b, x) - want) < 1e-10
        for q in (0.025, 0.5, 0.975):
            for a, b in ((81.0, 21.0), (2.5, 3.5), (1.0, 1.0)):
                p = _beta_ppf(q, a, b)
                assert abs(float(jbetainc(a, b, p)) - q) < 1e-9
    # Beta(1,1) is uniform: exact central interval
    lo, hi = _beta_interval_95(0.0, 0.0)
    np.testing.assert_allclose([lo, hi], [0.025, 0.975], atol=1e-9)
