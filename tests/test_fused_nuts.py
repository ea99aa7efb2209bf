"""Tests for the fused multi-draw NUTS kernel (T transitions/pallas_call).

The tree-building inside each transition is the same code the per-draw
kernel runs (``_run_transition``), already covered by
``test_trajectory_pallas.py``. What is NEW in the fused kernel — and
what these tests pin down — is the on-core *adaptation*: momentum
refresh, dual averaging (reference ``step_sizes.py:85-92``) and the
dual-window Welford metric update (reference ``quadpotential.py:231-245``)
now run inside the kernel. Each test replays the kernel's own per-draw
outputs (accepted positions, acceptance statistics) through the XLA-side
reference implementations and requires the final carried state to match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import littlemcmc_tpu as lmc
from littlemcmc_tpu import models
from littlemcmc_tpu.base import NUTSConfig
from littlemcmc_tpu.ops.fused_nuts_pallas import build_fused_nuts_op
from littlemcmc_tpu.quadpotential import QuadPotentialDiagAdapt
from littlemcmc_tpu.step_sizes import DualAverageState, dual_average_update


def _run_fused(model, C, T, tuning, n_samples0=0.0, window0=101.0, seed=7):
    n = model.ndim
    spec = model.pallas_trajectory_spec()
    cfg = NUTSConfig()
    op = build_fused_nuts_op(spec, n, T, tuning, True, cfg,
                             interpret=True, chain_block=max(8, C))
    rng = np.random.RandomState(seed)
    q = jnp.asarray(0.5 * rng.randn(C, n), jnp.float32)
    lp, g = jax.vmap(model.logp_grad)(q)
    step0 = 0.25 / n ** 0.25
    da0 = dict(
        log_step=jnp.full(C, np.log(step0), jnp.float32),
        log_bar=jnp.full(C, np.log(step0), jnp.float32),
        hbar=jnp.zeros(C, jnp.float32),
        count=jnp.ones(C, jnp.float32),
        mu=jnp.full(C, np.log(10 * step0), jnp.float32),
    )
    # a mid-adaptation Welford state (foreground warm, background cold)
    fg_mean = jnp.asarray(0.05 * rng.randn(C, n), jnp.float32)
    fg_raw = jnp.asarray(10.0 * (1 + 0.1 * rng.rand(C, n)), jnp.float32)
    welford = (
        fg_mean, fg_raw, jnp.full(C, 10.0), jnp.full(C, 100.0),
        jnp.asarray(0.01 * rng.randn(C, n), jnp.float32),
        jnp.asarray(0.5 * rng.rand(C, n), jnp.float32),
        jnp.full(C, float(max(0.0, n_samples0))),
        jnp.full(C, float(max(0.0, n_samples0))),
        jnp.full(C, float(n_samples0)), jnp.full(C, float(window0)),
    )
    var0 = fg_raw / 10.0
    out = op(q, g, lp, jnp.zeros(C), da0["log_step"], da0["log_bar"],
             da0["hbar"], da0["count"], da0["mu"], var0, welford,
             jnp.asarray([seed, seed + 1], jnp.int32))
    return out, da0, welford, var0


def _replay_da(da0, mta, cfg=NUTSConfig(), adapting=True):
    """Apply the XLA-side dual-averaging update per draw."""
    state = DualAverageState(
        log_step=da0["log_step"], log_bar=da0["log_bar"], hbar=da0["hbar"],
        count=da0["count"].astype(jnp.int32), mu=da0["mu"],
    )
    for t in range(mta.shape[0]):
        state = dual_average_update(
            state, jnp.asarray(mta[t]), adapting,
            target=cfg.target_accept, gamma=cfg.gamma, k=cfg.k, t0=cfg.t0,
        )
    return state


def _replay_welford(welford, var0, trace, tuning):
    """Apply QuadPotentialDiagAdapt.update per accepted position."""
    fgm, fgr, fgw, fgw2, bgm, bgr, bgw, bgw2, pn, win = welford
    C, n = fgm.shape
    from littlemcmc_tpu.quadpotential import WelfordVariance

    pot = QuadPotentialDiagAdapt(
        var=var0, stds=jnp.sqrt(var0), inv_stds=1.0 / jnp.sqrt(var0),
        fg=WelfordVariance(w_sum=fgw, w_sum2=fgw2, mean=fgm, raw_var=fgr),
        bg=WelfordVariance(w_sum=bgw, w_sum2=bgw2, mean=bgm, raw_var=bgr),
        n_samples=pn.astype(jnp.int32), window=win.astype(jnp.int32),
    )
    upd = jax.vmap(lambda p, x: p.update(x, x, tuning))
    for t in range(trace.shape[0]):
        pot = upd(pot, jnp.asarray(trace[t]))
    return pot


def test_fused_dual_averaging_matches_reference_update():
    out, da0, _, _ = _run_fused(models.StandardNormal(3), C=16, T=6,
                                tuning=True)
    expect = _replay_da(da0, np.asarray(out["mean_tree_accept"]))
    np.testing.assert_allclose(np.asarray(out["da_log_step"]),
                               np.asarray(expect.log_step), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["da_log_bar"]),
                               np.asarray(expect.log_bar), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["da_hbar"]),
                               np.asarray(expect.hbar), rtol=2e-5, atol=2e-5)
    assert np.all(np.asarray(out["da_count"]) == np.asarray(expect.count))
    # the per-draw step_size stat is exp(log_step after that draw's update)
    assert np.allclose(np.asarray(out["step_size"])[-1],
                       np.exp(np.asarray(out["da_log_step"])), rtol=1e-5)


def test_fused_welford_matches_reference_update():
    out, _, welford, var0 = _run_fused(models.StandardNormal(3), C=16, T=6,
                                       tuning=True)
    pot = _replay_welford(welford, var0, np.asarray(out["trace"]), True)
    np.testing.assert_allclose(np.asarray(out["var"]),
                               np.asarray(pot.var), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out["fg_mean"]),
                               np.asarray(pot.fg.mean), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out["fg_raw"]),
                               np.asarray(pot.fg.raw_var), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["bg_raw"]),
                               np.asarray(pot.bg.raw_var), rtol=2e-5,
                               atol=2e-5)
    assert np.all(np.asarray(out["n_samples"]) == 6)


def test_fused_welford_window_swap():
    """Cross the window=101 boundary inside one fused chunk."""
    out, _, welford, var0 = _run_fused(models.StandardNormal(2), C=8, T=5,
                                       tuning=True, n_samples0=99.0)
    pot = _replay_welford(welford, var0, np.asarray(out["trace"]), True)
    # swap happened at n_samples=101 (pre-add check on draw 3 of 5)
    np.testing.assert_allclose(np.asarray(out["fg_w"]),
                               np.asarray(pot.fg.w_sum), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["bg_w"]),
                               np.asarray(pot.bg.w_sum), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["fg_mean"]),
                               np.asarray(pot.fg.mean), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out["var"]),
                               np.asarray(pot.var), rtol=2e-5, atol=2e-6)
    # the background was freshly reset by the swap: small counts
    assert np.asarray(out["bg_w"]).max() < 5


def test_fused_draw_phase_freezes_adaptation():
    out, da0, welford, var0 = _run_fused(models.StandardNormal(3), C=16, T=4,
                                         tuning=False)
    np.testing.assert_array_equal(np.asarray(out["da_log_step"]),
                                  np.asarray(da0["log_step"]))
    np.testing.assert_array_equal(np.asarray(out["da_count"]),
                                  np.asarray(da0["count"]))
    np.testing.assert_array_equal(np.asarray(out["var"]), np.asarray(var0))
    np.testing.assert_array_equal(np.asarray(out["fg_mean"]),
                                  np.asarray(welford[0]))
    assert np.all(np.asarray(out["n_samples"]) == 0)
    # draws still move and stats flow
    assert np.asarray(out["depth"]).mean() > 0
    assert 0 < np.asarray(out["mean_tree_accept"]).mean() <= 1


def test_fused_momentum_refresh_is_gaussian():
    """Heavy-T sanity: long-run variance of a known target is right."""
    model = models.StandardNormal(4)
    step = lmc.NUTS(model_ndim=4,
                    pallas_trajectory=model.pallas_trajectory_spec(),
                    pallas_interpret=True)
    tr, st = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=4,
                        draws=600, tune=300, chains=16, random_seed=11,
                        step=step, progressbar=False)
    tr = np.asarray(tr).reshape(-1, 4)
    assert abs(tr.mean()) < 0.05
    assert np.all(np.abs(tr.var(0) - 1.0) < 0.12), tr.var(0)
    assert np.asarray(st["diverging"]).mean() < 0.01


# ---------------------------------------------------------------------------
# Fused classic-HMC kernel (ops/fused_hmc_pallas.py)
# ---------------------------------------------------------------------------


def _run_fused_hmc(model, C, T, tuning, seed=7):
    from littlemcmc_tpu.base import HMCConfig
    from littlemcmc_tpu.ops.fused_hmc_pallas import build_fused_hmc_op

    n = model.ndim
    spec = model.pallas_trajectory_spec()
    cfg = HMCConfig()
    op = build_fused_hmc_op(spec, n, T, tuning, True, cfg,
                            interpret=True, chain_block=max(8, C))
    rng = np.random.RandomState(seed)
    q = jnp.asarray(0.5 * rng.randn(C, n), jnp.float32)
    lp, g = jax.vmap(model.logp_grad)(q)
    step0 = 0.25 / n ** 0.25
    da0 = dict(
        log_step=jnp.full(C, np.log(step0), jnp.float32),
        log_bar=jnp.full(C, np.log(step0), jnp.float32),
        hbar=jnp.zeros(C, jnp.float32),
        count=jnp.ones(C, jnp.float32),
        mu=jnp.full(C, np.log(10 * step0), jnp.float32),
    )
    fg_mean = jnp.zeros((C, n), jnp.float32)
    fg_raw = jnp.full((C, n), 10.0, jnp.float32)
    welford = (fg_mean, fg_raw, jnp.full(C, 10.0), jnp.full(C, 100.0),
               jnp.zeros((C, n)), jnp.zeros((C, n)), jnp.zeros(C),
               jnp.zeros(C), jnp.zeros(C), jnp.full(C, 101.0))
    out = op(q, g, lp, jnp.zeros(C), da0["log_step"], da0["log_bar"],
             da0["hbar"], da0["count"], da0["mu"], fg_raw / 10.0, welford,
             jnp.asarray([seed, seed + 1], jnp.int32))
    return out, da0, welford, fg_raw / 10.0


def test_fused_hmc_dual_averaging_matches_reference_update():
    from littlemcmc_tpu.base import HMCConfig

    out, da0, _, _ = _run_fused_hmc(models.StandardNormal(3), C=16, T=6,
                                    tuning=True)
    expect = _replay_da(da0, np.asarray(out["accept"]), cfg=HMCConfig())
    np.testing.assert_allclose(np.asarray(out["da_log_step"]),
                               np.asarray(expect.log_step), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["da_log_bar"]),
                               np.asarray(expect.log_bar), rtol=2e-5,
                               atol=2e-5)
    assert np.all(np.asarray(out["da_count"]) == np.asarray(expect.count))


def test_fused_hmc_welford_tracks_selected_positions():
    out, _, welford, var0 = _run_fused_hmc(models.StandardNormal(3), C=16,
                                           T=6, tuning=True)
    pot = _replay_welford(welford, var0, np.asarray(out["trace"]), True)
    np.testing.assert_allclose(np.asarray(out["var"]),
                               np.asarray(pot.var), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out["fg_mean"]),
                               np.asarray(pot.fg.mean), rtol=2e-5, atol=2e-6)
    assert np.all(np.asarray(out["n_samples"]) == 6)
    # rejected draws must repeat the previous position in the trace
    tr = np.asarray(out["trace"])
    acc = np.asarray(out["accepted"])
    for t in range(1, tr.shape[0]):
        rej = ~acc[t]
        if rej.any():
            np.testing.assert_array_equal(tr[t][rej], tr[t - 1][rej])


def test_fused_hmc_n_steps_respects_bounds():
    from littlemcmc_tpu.base import HMCConfig

    out, _, _, _ = _run_fused_hmc(models.StandardNormal(2), C=8, T=5,
                                  tuning=True)
    nst = np.asarray(out["n_steps"])
    pl_ = np.asarray(out["path_length"])
    ss = np.asarray(out["step_size"])
    cfg = HMCConfig()
    assert nst.min() >= 1 and nst.max() <= cfg.max_steps
    assert pl_.min() >= 0 and pl_.max() <= cfg.path_length


def test_fused_hmc_e2e_posterior():
    """Full sample() through the fused HMC kernel (interpret mode)."""
    model = models.StandardNormal(4)
    step = lmc.HamiltonianMC(model_ndim=4,
                             pallas_trajectory=model.pallas_trajectory_spec(),
                             pallas_interpret=True)
    tr, st = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=4,
                        draws=600, tune=300, chains=16, random_seed=13,
                        step=step, progressbar=False)
    tr = np.asarray(tr).reshape(-1, 4)
    assert abs(tr.mean()) < 0.06
    assert np.all(np.abs(tr.var(0) - 1.0) < 0.15), tr.var(0)
    assert 0.5 < np.asarray(st["accept"]).mean() <= 1.0
    assert set(st) == set(lmc.HamiltonianMC.stats_dtypes[0])


def test_fused_static_diag_metric_e2e():
    """The adapt_metric=False fused branch: a fixed QuadPotentialDiag.

    Exercises the no-Welford input/output layout (separate ref plumbing
    in both fused kernels) and asserts the metric is untouched.
    """
    model = models.StandardNormal(3)
    pot = lmc.QuadPotentialDiag.create(jnp.asarray([1.0, 1.0, 1.0]))
    step = lmc.NUTS(model_ndim=3, potential=pot,
                    pallas_trajectory=model.pallas_trajectory_spec(),
                    pallas_interpret=True)
    tr, st, fs = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=3,
                            draws=400, tune=200, chains=16, random_seed=3,
                            step=step, progressbar=False,
                            return_final_state=True)
    tr = np.asarray(tr).reshape(-1, 3)
    assert abs(tr.mean()) < 0.08
    assert np.all(np.abs(tr.var(0) - 1.0) < 0.15), tr.var(0)
    np.testing.assert_array_equal(np.asarray(fs.potential.v)[0],
                                  np.asarray(pot.v))


def test_fuse_draws_knob():
    """``sample(fuse_draws=...)``: False forces the per-draw engine, True
    raises when the fused engine cannot apply, None auto-selects."""
    model = models.StandardNormal(4)
    step = lmc.NUTS(model_ndim=4,
                    pallas_trajectory=model.pallas_trajectory_spec(),
                    pallas_interpret=True)
    common = dict(logp_dlogp_func=model.logp_grad, model_ndim=4, draws=200,
                  tune=150, chains=16, random_seed=21, step=step,
                  progressbar=False)
    tr_auto, _ = lmc.sample(**common)                      # fused (auto)
    tr_pd, st_pd = lmc.sample(fuse_draws=False, **common)  # forced per-draw
    # the engines use different draw streams: identical results would mean
    # the knob did not actually switch paths
    assert not np.allclose(np.asarray(tr_auto), np.asarray(tr_pd))
    tr = np.asarray(tr_pd).reshape(-1, 4)
    assert abs(tr.mean()) < 0.1 and np.all(np.abs(tr.var(0) - 1.0) < 0.25)

    # per-draw streams are chunk-invariant; asking for the fused engine
    # with no Pallas spec in play must raise, not silently fall back
    with pytest.raises(ValueError, match="fuse_draws=True"):
        lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=4, draws=10,
                   tune=10, chains=4, random_seed=0, progressbar=False,
                   fuse_draws=True, pallas_trajectory=None)


# ---------------------------------------------------------------------------
# Fused dense-metric paths (metric="dense": static Full + pooled draw phase)
# ---------------------------------------------------------------------------


def test_fused_static_dense_metric_e2e():
    """sample() through the fused kernel with a static QuadPotentialFull:
    momentum = Z @ L^{-1} (one matmul) and velocities = P @ cov on core,
    dual averaging on core, both phases fused."""
    from littlemcmc_tpu.quadpotential import QuadPotentialFull

    model = models.CorrelatedGaussian(6, rho=0.7, scale_range=(0.5, 2.0))
    pot = QuadPotentialFull.create(jnp.asarray(model.cov, jnp.float32))
    step = lmc.NUTS(model_ndim=6, potential=pot,
                    pallas_trajectory=model.pallas_trajectory_spec(),
                    pallas_interpret=True)
    tr, st = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=6,
                        chains=16, tune=250, draws=500, random_seed=3,
                        step=step, progressbar=False, fuse_draws=True)
    tr2 = np.asarray(tr).reshape(-1, 6)
    # exact metric => near-ideal sampling of the correlated target
    assert np.abs(tr2.mean(0)).max() < 0.15
    np.testing.assert_allclose(tr2.var(0), model.true_var, rtol=0.25)
    assert np.asarray(st["diverging"]).mean() < 0.01
    # the dense fused engine must actually differ from the per-draw one
    tr_pd, _ = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=6,
                          chains=16, tune=250, draws=500, random_seed=3,
                          step=step, progressbar=False, fuse_draws=False)
    assert not np.allclose(np.asarray(tr), np.asarray(tr_pd))


def test_fused_pooled_dense_e2e():
    """Pooled adapt_full: EVERY phase fused. Tune chunks carry a
    block-local pooled covariance in VMEM and refresh the shared metric
    at chunk boundaries; draw chunks run with the frozen pooled metric.
    The adapted metric must solve the correlated target."""
    model = models.CorrelatedGaussian(5, rho=0.8, scale_range=(0.5, 2.0))
    step = lmc.NUTS(model_ndim=5,
                    pallas_trajectory=model.pallas_trajectory_spec(),
                    pallas_interpret=True)
    tr, st, fs = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=5,
                            chains=32, tune=400, draws=500, random_seed=9,
                            step=step, progressbar=False,
                            init="jitter+adapt_full", cross_chain_adapt=True,
                            fuse_draws=True, progress_every=100,
                            return_final_state=True)
    tr2 = np.asarray(tr).reshape(-1, 5)
    np.testing.assert_allclose(tr2.var(0), model.true_var, rtol=0.3)
    assert np.abs(tr2.mean(0)).max() < 0.2
    assert np.asarray(st["diverging"]).mean() < 0.02
    # adapted dense metric => shallow trees on a correlated target
    assert float(np.asarray(st["depth"])[:, -200:].mean()) <= 4.0
    # the FUSED tune engine ran: its boundary refresh stores the pooled
    # Welford state in replicated per-chain form (identical rows, weight
    # W/C each) — the per-draw pooled engine keeps distinct per-chain
    # accumulators, so identical rows prove the fused path was active
    fgm = np.asarray(fs.potential.fg.mean)
    np.testing.assert_array_equal(fgm, np.broadcast_to(fgm[0], fgm.shape))
    cov = np.asarray(fs.potential.cov)
    np.testing.assert_array_equal(cov, np.broadcast_to(cov[0], cov.shape))
    # pooled-covariance bookkeeping is engine-independent: the summed fg
    # weight after C chains x 400 tune draws must equal the per-draw
    # pooled engine's (same deterministic window schedule)
    _, _, fs_pd = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=5,
                             chains=32, tune=400, draws=50, random_seed=9,
                             step=step, progressbar=False,
                             init="jitter+adapt_full", cross_chain_adapt=True,
                             fuse_draws=False, progress_every=100,
                             return_final_state=True)
    np.testing.assert_allclose(
        float(np.asarray(fs.potential.fg.n_samples).sum()),
        float(np.asarray(fs_pd.potential.fg.n_samples).sum()), rtol=1e-6)
    assert (np.asarray(fs.potential.n_samples)
            == np.asarray(fs_pd.potential.n_samples)).all()
    # adaptation-endpoint parity: the boundary-cadence tune must converge
    # to the per-draw engine's step size (the tune-chunk cap is load-
    # bearing here — without it the step adapts against the initial
    # metric all tune and lands ~2x small; VALIDATION.md config 6)
    step_f = float(np.exp(np.asarray(fs.da.log_bar)).mean())
    step_pd = float(np.exp(np.asarray(fs_pd.da.log_bar)).mean())
    assert abs(np.log(step_f / step_pd)) < np.log(1.35), (step_f, step_pd)


def test_fused_pooled_diag_e2e():
    """Pooled diagonal adaptation fuses EVERY phase: per-chain Welford
    updates on core, pooling once per chunk boundary in the epilogue.
    The final metric must be the exact pooled estimate (identical rows
    across chains)."""
    model = models.StandardNormal(4)
    step = lmc.NUTS(model_ndim=4,
                    pallas_trajectory=model.pallas_trajectory_spec(),
                    pallas_interpret=True)
    tr, st, fs = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=4,
                            chains=32, tune=300, draws=400, random_seed=17,
                            step=step, progressbar=False,
                            cross_chain_adapt=True, fuse_draws=True,
                            progress_every=100, return_final_state=True)
    tr2 = np.asarray(tr).reshape(-1, 4)
    assert np.abs(tr2.mean(0)).max() < 0.1
    assert np.all(np.abs(tr2.var(0) - 1.0) < 0.2)
    assert np.asarray(st["diverging"]).mean() < 0.01
    # chunk-boundary pooling happened: every chain carries the same var
    var = np.asarray(fs.potential.var)
    np.testing.assert_allclose(var, np.broadcast_to(var[0], var.shape),
                               rtol=0, atol=0)
    assert np.all(np.abs(var[0] - 1.0) < 0.35)  # adapted toward N(0,1)


def test_fused_hmc_static_dense_metric_e2e():
    """Classic HMC through the fused kernel with a static dense metric."""
    from littlemcmc_tpu.quadpotential import QuadPotentialFull

    model = models.CorrelatedGaussian(5, rho=0.7, scale_range=(0.5, 2.0))
    pot = QuadPotentialFull.create(jnp.asarray(model.cov, jnp.float32))
    step = lmc.HamiltonianMC(model_ndim=5, potential=pot, path_length=2.0,
                             pallas_trajectory=model.pallas_trajectory_spec(),
                             pallas_interpret=True)
    tr, st = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=5,
                        chains=16, tune=250, draws=500, random_seed=5,
                        step=step, progressbar=False, fuse_draws=True)
    tr2 = np.asarray(tr).reshape(-1, 5)
    np.testing.assert_allclose(tr2.var(0), model.true_var, rtol=0.3)
    assert np.abs(tr2.mean(0)).max() < 0.2
    assert np.asarray(st["diverging"]).mean() < 0.01


def test_fused_hmc_pooled_diag_e2e():
    """Pooled diagonal HMC: every phase fused, pooling at chunk boundaries."""
    model = models.StandardNormal(4)
    step = lmc.HamiltonianMC(model_ndim=4, path_length=2.0,
                             pallas_trajectory=model.pallas_trajectory_spec(),
                             pallas_interpret=True)
    tr, st = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=4,
                        chains=32, tune=300, draws=400, random_seed=23,
                        step=step, progressbar=False, cross_chain_adapt=True,
                        fuse_draws=True, progress_every=100)
    tr2 = np.asarray(tr).reshape(-1, 4)
    assert np.abs(tr2.mean(0)).max() < 0.1
    assert np.all(np.abs(tr2.var(0) - 1.0) < 0.25)


def test_fused_hmc_pooled_dense_e2e():
    """Pooled adapt_full through the fused HMC kernel: tune chunks carry
    the block-local pooled covariance (shared with the NUTS kernel),
    draw chunks run with the frozen pooled metric. The per-draw
    cross-check also covers the dense fallback: with fuse_draws=False
    the per-draw HMC path must drop to the XLA trajectory (the per-draw
    Pallas HMC path is diagonal-only) instead of erroring."""
    model = models.CorrelatedGaussian(4, rho=0.7, scale_range=(0.5, 2.0))
    step = lmc.HamiltonianMC(model_ndim=4, path_length=2.0,
                             pallas_trajectory=model.pallas_trajectory_spec(),
                             pallas_interpret=True)
    kwargs = dict(
        logp_dlogp_func=model.logp_grad, model_ndim=4, chains=32,
        tune=400, draws=400, random_seed=31, step=step, progressbar=False,
        init="jitter+adapt_full", cross_chain_adapt=True,
        progress_every=100, return_final_state=True,
    )
    tr, st, fs = lmc.sample(fuse_draws=True, **kwargs)
    tr2 = np.asarray(tr).reshape(-1, 4)
    np.testing.assert_allclose(tr2.var(0), model.true_var, rtol=0.35)
    assert np.abs(tr2.mean(0)).max() < 0.25
    cov = np.asarray(fs.potential.cov)
    np.testing.assert_array_equal(cov, np.broadcast_to(cov[0], cov.shape))
    # engine-independent weight bookkeeping vs the per-draw pooled engine
    _, _, fs_pd = lmc.sample(fuse_draws=False, **{**kwargs, "draws": 40})
    np.testing.assert_allclose(
        float(np.asarray(fs.potential.fg.n_samples).sum()),
        float(np.asarray(fs_pd.potential.fg.n_samples).sum()), rtol=1e-6)


def test_fused_dense_multi_block():
    """Dense fused op with chains split over multiple grid blocks: the
    shared (Npad, Npad) cov/L^-1 blocks are re-read per block and the
    per-block draw streams stay decorrelated."""
    model = models.CorrelatedGaussian(4, rho=0.6, scale_range=(0.5, 2.0))
    n = model.ndim
    cov = jnp.asarray(model.cov, jnp.float32)
    chol = jnp.linalg.cholesky(cov)
    linv = jax.scipy.linalg.solve_triangular(chol, jnp.eye(n), lower=True)
    cfg = NUTSConfig()
    C, T = 32, 6
    op = build_fused_nuts_op(model.pallas_trajectory_spec(), n, T,
                             tuning=False, adapt_metric=False, config=cfg,
                             interpret=True, chain_block=8,  # 4 blocks
                             metric="dense")
    rng = np.random.RandomState(2)
    q = jnp.asarray(0.3 * rng.randn(C, n), jnp.float32)
    lp, g = jax.vmap(model.logp_grad)(q)
    step0 = np.float32(np.log(0.4))
    out = op(q, g, lp, jnp.zeros(C), jnp.full(C, step0), jnp.full(C, step0),
             jnp.zeros(C), jnp.ones(C), jnp.full(C, step0 + np.log(10.0)),
             cov, None, jnp.asarray([5, 6], jnp.int32), linv=linv)
    tr = np.asarray(out["trace"])          # (T, C, n)
    assert tr.shape == (T, C, n)
    assert np.isfinite(tr).all()
    assert np.asarray(out["diverging"]).mean() < 0.1
    # block PRNG decorrelation: block 0 (chains 0..7) and block 1 (8..15)
    # must not replay the same stream
    assert not np.allclose(tr[:, 0], tr[:, 8])
    # every chain moved (nonzero acceptance across T draws)
    assert (np.abs(tr[-1] - np.asarray(q)).max(axis=1) > 0).all()


requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled (Mosaic) fused kernels need real TPU; CPU runs the "
           "interpret-mode tests above",
)


@requires_tpu
def test_tpu_fused_pooled_dense_mosaic():
    """Compiled adapt_dense NUTS kernel on chip (fuse_draws=True pins the
    Mosaic lowering of the block-local pooled covariance — MXU rows-
    contractions, SMEM f32 counter scratch, per-block output writes —
    instead of letting a probe failure silently fall back)."""
    model = models.CorrelatedGaussian(8, rho=0.6, scale_range=(0.5, 2.0))
    step = lmc.NUTS(model_ndim=8,
                    pallas_trajectory=model.pallas_trajectory_spec())
    tr, st, fs = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=8,
                            chains=256, tune=300, draws=300, random_seed=41,
                            step=step, progressbar=False,
                            init="jitter+adapt_full", cross_chain_adapt=True,
                            fuse_draws=True, return_final_state=True)
    tr2 = np.asarray(tr).reshape(-1, 8)
    vr = tr2.var(0) / model.true_var
    assert vr.min() > 0.8 and vr.max() < 1.25, vr
    assert np.asarray(st["diverging"]).mean() < 0.01
    cov = np.asarray(fs.potential.cov)
    np.testing.assert_array_equal(cov, np.broadcast_to(cov[0], cov.shape))


@requires_tpu
def test_tpu_fused_hmc_pooled_dense_mosaic():
    """Compiled adapt_dense HMC kernel on chip (see the NUTS twin)."""
    model = models.CorrelatedGaussian(8, rho=0.6, scale_range=(0.5, 2.0))
    step = lmc.HamiltonianMC(model_ndim=8, path_length=2.0,
                             pallas_trajectory=model.pallas_trajectory_spec())
    tr, st = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=8,
                        chains=256, tune=300, draws=300, random_seed=43,
                        step=step, progressbar=False,
                        init="jitter+adapt_full", cross_chain_adapt=True,
                        fuse_draws=True)
    tr2 = np.asarray(tr).reshape(-1, 8)
    vr = tr2.var(0) / model.true_var
    assert vr.min() > 0.75 and vr.max() < 1.3, vr


def _replay_pooled_dense(dense_welford, trace, mult):
    """Sequential pooled Welford bookkeeping in float64.

    Every chain's accepted position joins BOTH global windows each draw
    (the pooled form of reference ``quadpotential.py:486-521``), then the
    shared window swap runs once per draw.
    """
    fgm, fgr, fgw, bgm, bgr, bgw, ns, pu, win = [
        np.asarray(x, np.float64) for x in dense_welford]

    def add(m, r, w, x):
        w1 = w + 1.0
        d = x - m
        m1 = m + d / w1
        return m1, r + np.outer(d, x - m1), w1

    T, C, n = trace.shape
    for t in range(T):
        for c in range(C):
            fgm, fgr, fgw = add(fgm, fgr, fgw, trace[t, c])
            bgm, bgr, bgw = add(bgm, bgr, bgw, trace[t, c])
        if ns - pu >= win:
            fgm, fgr, fgw = bgm, bgr, bgw
            bgm, bgr, bgw = np.zeros(n), np.zeros((n, n)), 0.0
            pu = ns.copy()
            win = np.floor(win * mult)
        ns = ns + 1.0
    return fgm, fgr, fgw, bgm, bgr, bgw, ns, pu, win


def test_fused_pooled_dense_welford_matches_replay():
    """adapt_dense: block-local pooled covariance accumulation in VMEM.

    Combine the per-block kernel outputs (``combine_dense_welford``) and
    require the result to equal a sequential pooled Welford replay of the
    kernel's own trace — including a mid-chunk window swap — across two
    grid blocks (block-local states seeded with 1/B of the global state).
    """
    from littlemcmc_tpu.ops.fused_nuts_pallas import combine_dense_welford

    model = models.CorrelatedGaussian(4, rho=0.6, scale_range=(0.5, 2.0))
    n = model.ndim
    cov = jnp.asarray(model.cov, jnp.float32)
    chol = jnp.linalg.cholesky(cov)
    linv = jax.scipy.linalg.solve_triangular(chol, jnp.eye(n), lower=True)
    cfg = NUTSConfig()
    C, T, mult = 16, 8, 2.0
    op = build_fused_nuts_op(model.pallas_trajectory_spec(), n, T,
                             tuning=True, adapt_metric=False, config=cfg,
                             window_multiplier=mult, interpret=True,
                             chain_block=8,  # 2 blocks
                             metric="dense", adapt_dense=True)
    rng = np.random.RandomState(4)
    q = jnp.asarray(0.4 * rng.randn(C, n), jnp.float32)
    lp, g = jax.vmap(model.logp_grad)(q)
    A = rng.randn(n, 2 * n).astype(np.float32)
    Bm = rng.randn(n, 2 * n).astype(np.float32)
    f32 = jnp.float32
    dense_welford = (
        jnp.asarray(0.1 * rng.randn(n), f32),    # fg mean
        jnp.asarray(A @ A.T, f32),               # fg raw scatter
        jnp.asarray(12.0, f32),                  # fg weight
        jnp.asarray(0.05 * rng.randn(n), f32),   # bg mean
        jnp.asarray(0.25 * (Bm @ Bm.T), f32),    # bg raw scatter
        jnp.asarray(6.0, f32),                   # bg weight
        jnp.asarray(3.0, f32),                   # n_samples
        jnp.asarray(0.0, f32),                   # prev_update
        jnp.asarray(5.0, f32),                   # window -> swap at draw 2
    )
    step0 = np.float32(np.log(0.3))
    out = op(q, g, lp, jnp.zeros(C), jnp.full(C, step0), jnp.full(C, step0),
             jnp.zeros(C), jnp.ones(C), jnp.full(C, step0 + np.log(10.0)),
             cov, None, jnp.asarray([11, 12], jnp.int32), linv=linv,
             dense_welford=dense_welford)
    # shared counters crossed the swap: pu latched at 5, window doubled
    assert float(out["n_samples"]) == 3.0 + T
    assert float(out["prev_update"]) == 5.0
    assert float(out["window"]) == 10.0

    trace = np.asarray(out["trace"], np.float64)
    rfgm, rfgr, rfgw, rbgm, rbgr, rbgw, _, _, _ = _replay_pooled_dense(
        dense_welford, trace, mult)
    c_fg = dense_welford[0]
    Wf, Mf, Rf = combine_dense_welford(out["dense_fg_w"],
                                       out["dense_fg_mean"],
                                       out["dense_fg_raw"], c_fg)
    Wb, Mb, Rb = combine_dense_welford(out["dense_bg_w"],
                                       out["dense_bg_mean"],
                                       out["dense_bg_raw"], c_fg)
    np.testing.assert_allclose(float(Wf), rfgw, rtol=1e-6)
    np.testing.assert_allclose(float(Wb), rbgw, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(Mf), rfgm, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Rf), rfgr, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(Mb), rbgm, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Rb), rbgr, rtol=1e-3, atol=1e-3)


def test_fused_vmem_autoshrink(monkeypatch):
    """Large-n dense blocks must auto-reduce the chain block to fit the
    VMEM budget (the estimate at Npad=256, RW=256 exceeds 13 MiB). The
    chosen row count is visible through the per-block output stacking:
    B = chains / RW."""
    from littlemcmc_tpu.ops.fused_nuts_pallas import shrink_chain_block

    # pin the default budget: an ambient LMC_FUSED_VMEM_BUDGET override
    # (a documented operator knob) must not flip this test
    monkeypatch.delenv("LMC_FUSED_VMEM_BUDGET", raising=False)

    # unit: the halving respects divisibility and the >= 8-row floor
    est = lambda rw: rw * 100_000  # 256 rows -> 25.6 MB
    assert shrink_chain_block(512, 256, 1, est, 13 * 2 ** 20, "t") == 128
    assert shrink_chain_block(512, 256, 1, lambda rw: 1, 13 * 2 ** 20,
                              "t") == 256  # fits: untouched
    # even the smallest valid divisor over budget: proceed at the floor
    assert shrink_chain_block(16, 16, 1, est, 1, "t") == 8

    # integration: a 200-d (Npad=256) adapt_dense kernel at the default
    # max_treedepth=10 picks RW < 256. The block choice is shape-visible
    # (B = chains / RW on the per-block outputs), so eval_shape suffices
    # — no kernel execution.
    n, C, T = 200, 512, 1
    model = models.CorrelatedGaussian(n, rho=0.3)
    cov = jnp.asarray(model.cov, jnp.float32)
    chol = jnp.linalg.cholesky(cov)
    linv = jax.scipy.linalg.solve_triangular(chol, jnp.eye(n), lower=True)
    cfg = NUTSConfig()
    op = build_fused_nuts_op(model.pallas_trajectory_spec(), n, T,
                             tuning=True, adapt_metric=False, config=cfg,
                             interpret=True, metric="dense",
                             adapt_dense=True)
    rng = np.random.RandomState(8)
    q = jnp.asarray(0.1 * rng.randn(C, n), jnp.float32)
    lp, g = jax.vmap(model.logp_grad)(q)
    f32 = jnp.float32
    zeros_n = jnp.zeros(n, f32)
    dense_welford = (zeros_n, jnp.eye(n, dtype=f32) * 10.0,
                     jnp.asarray(10.0, f32), zeros_n,
                     jnp.zeros((n, n), f32), jnp.asarray(0.0, f32),
                     jnp.asarray(0.0, f32), jnp.asarray(0.0, f32),
                     jnp.asarray(101.0, f32))
    step0 = np.float32(np.log(0.05))
    shapes = jax.eval_shape(
        lambda *a, **k: op(*a, **k),
        q, g, lp, jnp.zeros(C), jnp.full(C, step0), jnp.full(C, step0),
        jnp.zeros(C), jnp.ones(C), jnp.full(C, step0 + np.log(10.0)),
        cov, None, jnp.asarray([3, 4], jnp.int32), linv=linv,
        dense_welford=dense_welford)
    B = shapes["dense_fg_mean"].shape[0]
    assert B >= 4, f"expected auto-shrunk blocks (RW <= 128), got B={B}"


def test_fused_runtime_failure_falls_back_to_per_draw(monkeypatch):
    """A fused chunk that fails at run time (e.g. a per-config Mosaic
    VMEM overflow the capability probe cannot see) must fall back to the
    per-draw engine mid-run in auto mode — and surface the error under
    an explicit fuse_draws=True."""
    import littlemcmc_tpu.nuts as nuts_mod

    real = nuts_mod.build_fused_nuts_runner_factory

    def broken(*a, **k):
        factory = real(*a, **k)

        def bad_factory(chunk, tuning, collect):
            factory(chunk, tuning, collect)  # the real build still works

            def bad_runner(states):
                raise RuntimeError("synthetic Mosaic compile failure")

            return bad_runner

        return bad_factory

    monkeypatch.setattr(nuts_mod, "build_fused_nuts_runner_factory", broken)
    model = models.StandardNormal(3)
    step = lmc.NUTS(model_ndim=3,
                    pallas_trajectory=model.pallas_trajectory_spec(),
                    pallas_interpret=True)
    kwargs = dict(logp_dlogp_func=model.logp_grad, model_ndim=3, chains=16,
                  tune=100, draws=150, random_seed=3, step=step,
                  progressbar=False, progress_every=50)
    tr, st = lmc.sample(**kwargs)  # auto: falls back, completes
    tr2 = np.asarray(tr).reshape(-1, 3)
    assert tr2.shape == (16 * 150, 3)
    assert abs(tr2.mean()) < 0.1 and abs(tr2.var() - 1.0) < 0.2
    with pytest.raises(RuntimeError, match="synthetic Mosaic"):
        lmc.sample(fuse_draws=True, **kwargs)


def test_fused_probe_interpret_mode():
    """The capability probes pass in interpret mode, and interpret-mode
    auto-selection trusts them without compiling anything."""
    from littlemcmc_tpu.ops import fused_probe

    assert fused_probe.probe_cos(interpret=True)
    assert fused_probe.probe_grid_scratch(interpret=True)
    assert fused_probe.probe_smem_accumulate(interpret=True)
    assert fused_probe.probe_stat_io_layout(interpret=True)
    assert fused_probe.probe_block_outputs_3d(interpret=True)
    assert fused_probe.fused_engine_supported(interpret=True)


def test_fused_probe_covers_every_kernel_layout():
    """Every BlockSpec shape class the fused ops declare has a compiling
    miniature probe, and the probe gate actually calls those probes.

    Guards the contract at sampling.py's engine auto-selection: a Mosaic
    layout regression must flip fused_engine_supported() before the
    first fused chunk, not crash mid-run (the round-3 failure mode —
    probes passed while the real kernel's 16-lane 3-D stats block could
    not compile on the v5e)."""
    import inspect

    from littlemcmc_tpu.ops import fused_hmc_pallas, fused_nuts_pallas
    from littlemcmc_tpu.ops import fused_probe

    for mod in (fused_nuts_pallas, fused_hmc_pallas):
        declared = mod.BLOCKSPEC_LAYOUTS
        missing = declared - set(fused_probe.PROBED_LAYOUTS)
        assert not missing, (
            f"{mod.__name__} declares BlockSpec layout classes with no "
            f"probe: {sorted(missing)}")

    # every probe PROBED_LAYOUTS points at exists and is exercised by
    # the fused_engine_supported() gate (directly or via lowrank gate)
    gate_src = inspect.getsource(fused_probe.fused_engine_supported)
    for layout, probe_name in fused_probe.PROBED_LAYOUTS.items():
        probe = getattr(fused_probe, probe_name, None)
        assert callable(probe), (layout, probe_name)
        assert probe_name in gate_src or probe_name == "probe_thin_factor", \
            f"probe {probe_name} (layout {layout!r}) not called by gate"
    # the low-rank factor layout is gated separately
    lr_src = inspect.getsource(fused_probe.lowrank_kernel_supported)
    assert "probe_thin_factor" in lr_src


def test_fused_probe_failure_gates_auto_selection(monkeypatch):
    """When the Mosaic probe reports unsupported, sample(fuse_draws=None)
    must degrade to the per-draw engine (never touch the fused factory);
    an explicit fuse_draws=True bypasses the probe."""
    from littlemcmc_tpu.ops import fused_probe
    import littlemcmc_tpu.nuts as nuts_mod

    model = models.StandardNormal(2)
    step = lmc.NUTS(model_ndim=2,
                    pallas_trajectory=model.pallas_trajectory_spec(),
                    pallas_interpret=True)
    monkeypatch.setattr(fused_probe, "fused_engine_supported",
                        lambda interpret=False: False)

    def _explode(*a, **k):
        raise AssertionError("fused factory must not be built when the "
                             "capability probe fails in auto mode")

    monkeypatch.setattr(nuts_mod, "build_fused_nuts_runner_factory",
                        _explode)
    tr, _ = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=2,
                       chains=8, tune=50, draws=50, random_seed=3,
                       step=step, progressbar=False, fuse_draws=None)
    assert tr.shape == (8, 50, 2)

    # explicit opt-in bypasses the probe (and uses the real factory)
    monkeypatch.undo()
    monkeypatch.setattr(fused_probe, "fused_engine_supported",
                        lambda interpret=False: False)
    tr2, _ = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=2,
                        chains=8, tune=50, draws=50, random_seed=3,
                        step=step, progressbar=False, fuse_draws=True,
                        progress_every=25)
    assert tr2.shape == (8, 50, 2)


def test_auto_election_routes_unpacked_perchain_diag_to_per_draw(monkeypatch):
    """Auto mode (fuse_draws=None) must NOT build the fused factory for
    an unpacked (pack == 1) per-chain diag config — the measured losing
    case (AB_FUSED.json: 0.65-0.83x at n=100) — while fuse_draws=True
    still forces it."""
    import littlemcmc_tpu.nuts as nuts_mod
    from littlemcmc_tpu.ops import fused_probe

    n = 20  # n + 4 > 16 lanes => natural_pack == 1
    model = models.CorrelatedGaussian(n)
    step = lmc.NUTS(model_ndim=n,
                    pallas_trajectory=model.pallas_trajectory_spec(),
                    pallas_interpret=True)
    monkeypatch.setattr(fused_probe, "fused_engine_supported",
                        lambda interpret=False: True)

    def _explode(*a, **k):
        raise AssertionError("auto mode must route unpacked per-chain "
                             "diag to the per-draw engine")

    monkeypatch.setattr(nuts_mod, "build_fused_nuts_runner_factory", _explode)
    tr, _ = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=n,
                       chains=16, tune=40, draws=40, random_seed=2,
                       step=step, progressbar=False, fuse_draws=None)
    assert tr.shape == (16, 40, n)

    # explicit fuse_draws=True still builds the fused factory
    monkeypatch.undo()
    tr2, _ = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=n,
                        chains=16, tune=40, draws=40, random_seed=2,
                        step=step, progressbar=False, fuse_draws=True)
    assert tr2.shape == (16, 40, n)


def test_fused_pooled_lowrank_e2e():
    """Pooled adapt_lowrank: EVERY phase fused. Tune chunks run the
    per-chain diagonal Welford on core with the shared factor frozen;
    boundaries refresh the factor (weighted batch observation + batch
    subspace iteration). Draw chunks run with the frozen spiked metric."""
    model = models.SpikedGaussian(16, rank=2, spikes=(64.0, 16.0))
    step = lmc.NUTS(model_ndim=16,
                    pallas_trajectory=model.pallas_trajectory_spec(),
                    pallas_interpret=True)
    common = dict(logp_dlogp_func=model.logp_grad, model_ndim=16,
                  chains=32, tune=300, random_seed=9, step=step,
                  progressbar=False, init="jitter+adapt_lowrank",
                  cross_chain_adapt=True, progress_every=50,
                  return_final_state=True)
    tr, st, fs = lmc.sample(draws=400, fuse_draws=True, **common)
    flat = np.asarray(tr).reshape(-1, 16)
    vr = flat.var(0) / model.true_var
    assert vr.min() > 0.9 and vr.max() < 1.1, vr
    assert np.abs(flat.mean(0) / np.sqrt(model.true_var)).max() < 0.12
    assert np.asarray(st["diverging"]).mean() < 0.02
    # the shared factor is replicated (pooled) and orthonormal
    vecs = np.asarray(fs.potential.vecs)
    np.testing.assert_array_equal(vecs, np.broadcast_to(vecs[0], vecs.shape))
    V = vecs[0]
    # CholeskyQR's rank-loss jitter leaves orthonormality at ~2e-5
    np.testing.assert_allclose(V.T @ V, np.eye(V.shape[1]), atol=1e-4)
    lam = np.asarray(fs.potential.lam[0])
    assert lam.max() > 1.5, lam  # the spike was learned
    # diag Welford bookkeeping is engine-independent (same deterministic
    # window schedule as the per-draw pooled engine)
    _, _, fs_pd = lmc.sample(draws=50, fuse_draws=False, **common)
    np.testing.assert_allclose(
        float(np.asarray(fs.potential.fg.w_sum).sum()),
        float(np.asarray(fs_pd.potential.fg.w_sum).sum()), rtol=1e-6)
    # adaptation-endpoint parity: boundary-cadence factor refresh must
    # land near the per-draw engine's adapted step size
    step_f = float(np.exp(np.asarray(fs.da.log_bar)).mean())
    step_pd = float(np.exp(np.asarray(fs_pd.da.log_bar)).mean())
    assert abs(np.log(step_f / step_pd)) < np.log(1.5), (step_f, step_pd)


def test_fused_hmc_pooled_lowrank_e2e():
    """Pooled adapt_lowrank through the fused classic-HMC kernel: same
    boundary-cadence factor refresh as the NUTS engine, momentum drawn
    on core via the thin factor matmuls."""
    model = models.SpikedGaussian(16, rank=2, spikes=(64.0, 16.0))
    step = lmc.HamiltonianMC(model_ndim=16, max_steps=64,
                             pallas_trajectory=model.pallas_trajectory_spec(),
                             pallas_interpret=True)
    tr, st, fs = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=16,
                            chains=32, tune=300, draws=400, random_seed=5,
                            step=step, progressbar=False,
                            init="jitter+adapt_lowrank",
                            cross_chain_adapt=True, fuse_draws=True,
                            progress_every=50, return_final_state=True)
    flat = np.asarray(tr).reshape(-1, 16)
    vr = flat.var(0) / model.true_var
    assert vr.min() > 0.88 and vr.max() < 1.12, vr
    assert np.asarray(st["diverging"]).mean() < 0.02
    assert 0.6 < float(np.asarray(st["accept"]).mean()) < 0.98
    lam = np.asarray(fs.potential.lam[0])
    assert lam.max() > 1.5, lam  # the spike was learned
    vecs = np.asarray(fs.potential.vecs)
    np.testing.assert_array_equal(vecs, np.broadcast_to(vecs[0], vecs.shape))


def test_fused_lowrank_midrun_fallback_is_statistically_exact(monkeypatch):
    """Fail the fused lowrank engine AFTER its first tune chunk: the
    epilogue has marked the ring buffer stale (buf_fill=0) and advanced
    the counters, so the per-draw engine that takes over must refill
    the buffer before trusting it (the review-found failure mode was a
    basis dragged toward the standardized mean by zero buffer rows).
    The run must complete with correct moments."""
    import littlemcmc_tpu.nuts as nuts_mod

    real = nuts_mod.build_fused_nuts_runner_factory

    def breaks_after_first(*a, **k):
        factory = real(*a, **k)
        calls = {"n": 0}

        def flaky_factory(chunk, tuning, collect):
            runner = factory(chunk, tuning, collect)

            def flaky_runner(states):
                calls["n"] += 1
                if calls["n"] > 1:
                    raise RuntimeError("synthetic mid-run Mosaic failure")
                return runner(states)

            return flaky_runner

        flaky_factory.tune_chunk_cap = getattr(factory, "tune_chunk_cap",
                                               None)
        return flaky_factory

    monkeypatch.setattr(nuts_mod, "build_fused_nuts_runner_factory",
                        breaks_after_first)
    model = models.SpikedGaussian(12, rank=2, spikes=(25.0, 9.0))
    step = lmc.NUTS(model_ndim=12,
                    pallas_trajectory=model.pallas_trajectory_spec(),
                    pallas_interpret=True)
    tr, st = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=12,
                        chains=32, tune=300, draws=300, random_seed=21,
                        step=step, progressbar=False,
                        init="jitter+adapt_lowrank", cross_chain_adapt=True,
                        progress_every=50)
    flat = np.asarray(tr).reshape(-1, 12)
    vr = flat.var(0) / model.true_var
    assert vr.min() > 0.88 and vr.max() < 1.12, vr
    assert np.asarray(st["diverging"]).mean() < 0.02


def test_fused_draws_are_chunk_invariant():
    """The fused engines' draw streams are keyed on (seed, global
    iteration), not on chunk boundaries: sampling the same seed with two
    different ``progress_every`` chunkings must produce bitwise-equal
    traces (the reference property that draws depend only on the seed,
    ``sampling.py:496-497``; pooled metrics are exempt — their metric
    refresh cadence is boundary-based by design and documented)."""
    model = models.StandardNormal(4)

    def run(progress_every, sampler):
        step = sampler(model_ndim=4,
                       pallas_trajectory=model.pallas_trajectory_spec(),
                       pallas_interpret=True)
        return lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=4,
                          draws=120, tune=90, chains=16, random_seed=33,
                          step=step, progressbar=False, fuse_draws=True,
                          progress_every=progress_every)

    for sampler in (lmc.NUTS, lmc.HamiltonianMC):
        tr_a, st_a = run(70, sampler)
        tr_b, st_b = run(25, sampler)
        np.testing.assert_array_equal(np.asarray(tr_a), np.asarray(tr_b))
        for k in st_a:
            np.testing.assert_array_equal(np.asarray(st_a[k]),
                                          np.asarray(st_b[k]), err_msg=k)
