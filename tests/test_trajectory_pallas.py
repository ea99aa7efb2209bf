"""Tests for the whole-trajectory Pallas NUTS kernel.

The on-core PRNG (``pltpu.prng_seed``) has no CPU lowering, but the
kernel's randomness source is pluggable: under ``interpret=True`` it
uses a murmur3 counter stream in plain XLA ops, so CPU CI exercises the
full merge/U-turn/packing logic (the ``test_interpret_*`` tests below),
including under the 8-device mesh ``shard_map``. The TPU-gated tests
re-validate the same logic with the on-core PRNG on real hardware
(``make test-tpu``).

Statistical parity vs the XLA tree (validated on TPU v5e, 4096 chains x
20 draws at fixed step/metric on the 100-d correlated Gaussian):
mean_tree_accept 0.7806 vs 0.7814 (+-0.0006), depth 6.092 vs 6.092,
tree_size 73.69 vs 73.72 — see git history for the harness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import littlemcmc_tpu as lmc
from littlemcmc_tpu import models
from littlemcmc_tpu.ops import PallasModelSpec
from littlemcmc_tpu.ops.nuts_trajectory_pallas import padded_dim

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="on-core PRNG path needs real TPU (CPU runs the interpret tests)",
)


def test_model_specs_construct():
    for model in (models.StandardNormal(3), models.CorrelatedGaussian(16)):
        spec = model.pallas_trajectory_spec()
        assert isinstance(spec, PallasModelSpec)
        assert spec.ndim == model.ndim
        # memoized: identity-stable so kernel caches hit
        assert model.pallas_trajectory_spec() is spec


def test_padded_dim_leaves_room_for_scalars():
    # 4 packed scalars must fit in the padding lanes
    assert padded_dim(1) == 128
    assert padded_dim(124) == 128
    assert padded_dim(125) == 256
    assert padded_dim(252) == 256


def test_rejects_adaptive_dense_metric():
    """Per-chain adaptive dense metrics cannot run in the kernel (VMEM)."""
    model = models.CorrelatedGaussian(8)
    pot = lmc.QuadPotentialFullAdapt.create(8)
    step = lmc.NUTS(model_ndim=8, potential=pot,
                    pallas_trajectory=model.pallas_trajectory_spec())
    with pytest.raises(ValueError, match="diagonal metric"):
        lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=8,
                   draws=4, tune=4, chains=8, random_seed=0, step=step,
                   progressbar=False)


def _stationary_trajectory_inputs(model, C, seed=0, eps=0.4):
    """(q, p, grad, logp, eps, var) drawn from the stationary phase-space
    distribution of ``model`` with a unit diagonal metric."""
    kq, kp = jax.random.split(jax.random.key(seed))
    q = jax.random.normal(kq, (C, model.ndim), jnp.float32)
    lp = jax.vmap(model.logp)(q)
    g = jax.vmap(lambda x: model.logp_grad(x)[1])(q)
    p = jax.random.normal(kp, (C, model.ndim), jnp.float32)
    var = jnp.ones((C, model.ndim), jnp.float32)
    return q, p, g, lp, jnp.full((C,), eps, jnp.float32), var


def test_interpret_trajectory_parity_vs_xla_tree():
    """CPU parity: the interpret-mode kernel (counter PRNG) must match the
    XLA tree statistically on a full trajectory from stationarity —
    proposal moments, depth, leaf count, and acceptance exercise the
    merge/U-turn/packing logic end to end."""
    from littlemcmc_tpu.base import NUTSConfig
    from littlemcmc_tpu.math import log1mexp
    from littlemcmc_tpu.nuts import PhaseState, run_nuts_tree
    from littlemcmc_tpu.ops import build_trajectory_op

    N, C, MD = 4, 1024, 6
    model = models.StandardNormal(N)
    traj = build_trajectory_op(model.pallas_trajectory_spec(), N, MD, 1000.0,
                               interpret=True)
    q, p, g, lp, eps, var = _stationary_trajectory_inputs(model, C)
    mdc = jnp.full((C,), MD, jnp.int32)
    out = jax.tree.map(np.asarray, traj(q, p, g, lp, eps, mdc, var, jnp.int32(3)))

    pots = jax.vmap(lambda _: lmc.QuadPotentialDiag.create(
        jnp.ones(N, jnp.float32)))(jnp.arange(C))
    start = PhaseState(q, p, g, 0.5 * jnp.sum(p * p, axis=1) - lp, lp)
    keys = jax.random.split(jax.random.key(7), C)
    res = jax.tree.map(np.asarray, run_nuts_tree(
        keys, start, eps, mdc, pots, jax.vmap(model.logp_grad),
        NUTSConfig(max_treedepth=MD)))

    ls = jnp.asarray(out["log_size"])
    mta = np.where(out["log_size"] > 0,
                   np.exp(out["log_weighted_accept_sum"]
                          - (out["log_size"] + np.asarray(log1mexp(ls)))), 0.0)
    # stationarity: both proposals are exactly N(0, 1) marginally
    assert abs(out["q"].mean()) < 0.1 and abs(res.prop_q.mean()) < 0.1
    np.testing.assert_allclose(out["q"].var(), res.prop_q.var(), rtol=0.15)
    # engine-vs-engine statistics (measured: depth 3.22 vs 3.20,
    # accept 0.9782 vs 0.9781, leaves 8.93 vs 8.81 at this seed)
    np.testing.assert_allclose(out["depth"].mean(), res.depth.mean(), rtol=0.1)
    np.testing.assert_allclose(mta.mean(), res.mean_tree_accept.mean(), atol=0.03)
    np.testing.assert_allclose(out["n_leaves"].mean(), res.n_proposals.mean(),
                               rtol=0.1)
    assert out["diverging"].mean() == res.diverging.mean() == 0.0


def test_interpret_trajectory_deterministic_given_seed():
    from littlemcmc_tpu.ops import build_trajectory_op

    N, C, MD = 3, 64, 5
    model = models.StandardNormal(N)
    traj = build_trajectory_op(model.pallas_trajectory_spec(), N, MD, 1000.0,
                               interpret=True)
    q, p, g, lp, eps, var = _stationary_trajectory_inputs(model, C, seed=2)
    mdc = jnp.full((C,), MD, jnp.int32)
    a = jax.tree.map(np.asarray, traj(q, p, g, lp, eps, mdc, var, jnp.int32(11)))
    b = jax.tree.map(np.asarray, traj(q, p, g, lp, eps, mdc, var, jnp.int32(11)))
    c = jax.tree.map(np.asarray, traj(q, p, g, lp, eps, mdc, var, jnp.int32(12)))
    np.testing.assert_array_equal(a["q"], b["q"])
    np.testing.assert_array_equal(a["depth"], b["depth"])
    assert not np.array_equal(a["q"], c["q"])  # seed actually feeds the stream


def test_natural_pack_factors():
    from littlemcmc_tpu.ops.nuts_trajectory_pallas import natural_pack

    assert natural_pack(1) == 16   # 8-lane segments
    assert natural_pack(4) == 16
    assert natural_pack(10) == 8   # 16-lane segments (n+4 = 14)
    assert natural_pack(28) == 4
    assert natural_pack(60) == 2
    assert natural_pack(61) == 1   # n+4 > 64: packing buys nothing


@pytest.mark.parametrize("model_name,pack", [
    ("std4", 8), ("std4", 16), ("funnel", 8), ("eight_schools", 8),
])
def test_packed_trajectory_matches_unpacked(model_name, pack):
    """Lane-packed (K chains per 128-lane row) trajectories must equal the
    unpacked layout chain-for-chain: the counter PRNG seeds per chain
    index, so the same trees are built in both layouts."""
    from littlemcmc_tpu.ops import build_trajectory_op

    model = {"std4": models.StandardNormal(4),
             "funnel": models.NealsFunnel(10),
             "eight_schools": models.EightSchools()}[model_name]
    N, C, MD = model.ndim, 128, 5
    spec = model.pallas_trajectory_spec()
    kq, kp = jax.random.split(jax.random.key(1))
    q = jax.random.normal(kq, (C, N), jnp.float32) * 0.5
    lp = jax.vmap(model.logp)(q)
    g = jax.vmap(lambda x: model.logp_grad(x)[1])(q)
    p = jax.random.normal(kp, (C, N), jnp.float32)
    args = (q, p, g, lp, jnp.full((C,), 0.25, jnp.float32),
            jnp.full((C,), MD, jnp.int32), jnp.ones((C, N), jnp.float32),
            jnp.int32(5))
    o1 = jax.tree.map(np.asarray, build_trajectory_op(
        spec, N, MD, 1000.0, interpret=True, pack=1, chain_block=C)(*args))
    ok = jax.tree.map(np.asarray, build_trajectory_op(
        spec, N, MD, 1000.0, interpret=True, pack=pack, chain_block=C)(*args))
    np.testing.assert_array_equal(o1["depth"], ok["depth"])
    np.testing.assert_array_equal(o1["n_leaves"], ok["n_leaves"])
    np.testing.assert_allclose(o1["q"], ok["q"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(o1["logp"], ok["logp"], rtol=1e-3, atol=1e-3)


def test_packed_requires_packed_fn_and_diag_metric():
    from littlemcmc_tpu.ops import build_trajectory_op

    bare = PallasModelSpec(lambda q: (q[:, :1], -q), (), 4)
    with pytest.raises(ValueError, match="packed_fn"):
        build_trajectory_op(bare, 4, 5, 1000.0, pack=8)
    spec = models.StandardNormal(4).pallas_trajectory_spec()
    with pytest.raises(ValueError, match="diagonal"):
        build_trajectory_op(spec, 4, 5, 1000.0, pack=8, metric="dense")


def test_packed_e2e_sample_with_consts():
    """Full sample() on the packed path for a model with packed consts.

    Regression: packed_consts runs at kernel-build time *inside* the jit
    trace of the scan body; returning jnp (device) arrays there leaked
    tracers through the build_trajectory_op cache.
    """
    m = models.EightSchools()
    step = lmc.NUTS(model_ndim=10, target_accept=0.9,
                    pallas_trajectory=m.pallas_trajectory_spec(),
                    pallas_interpret=True)
    # chains=64 -> pack=8 (8 rows of 8 chains)
    tr, st = lmc.sample(logp_dlogp_func=m.logp_grad, model_ndim=10,
                        chains=64, tune=100, draws=150, random_seed=4,
                        step=step, progressbar=False)
    assert tr.shape == (64, 150, 10)
    assert 0.5 < np.asarray(st["mean_tree_accept"])[:, -50:].mean() < 0.99


def test_interpret_e2e_sample():
    """Full sample() through the interpret-mode trajectory kernel."""
    model = models.StandardNormal(4)
    step = lmc.NUTS(model_ndim=4,
                    pallas_trajectory=model.pallas_trajectory_spec(),
                    pallas_interpret=True)
    trace, stats = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=4,
                              draws=300, tune=150, chains=16, random_seed=5,
                              step=step, progressbar=False)
    tr = np.asarray(trace)
    assert abs(tr.mean()) < 0.1
    assert 0.85 < tr.var() < 1.15
    assert 0.6 < np.asarray(stats["mean_tree_accept"])[:, -100:].mean() < 0.95
    assert np.asarray(stats["diverging"]).mean() < 0.01


def test_interpret_composes_with_mesh():
    """Interpret-mode kernel under shard_map over the 8-device CPU mesh."""
    from jax.sharding import Mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU backend")
    model = models.StandardNormal(4)
    step = lmc.NUTS(model_ndim=4,
                    pallas_trajectory=model.pallas_trajectory_spec(),
                    pallas_interpret=True)
    mesh = Mesh(np.array(jax.devices()), ("chains",))
    trace, stats = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=4,
                              draws=200, tune=100, chains=64, random_seed=6,
                              step=step, mesh=mesh, progressbar=False)
    tr = np.asarray(trace)
    assert abs(tr.mean()) < 0.1
    assert 0.85 < tr.var() < 1.15
    assert 0.6 < np.asarray(stats["mean_tree_accept"])[:, -100:].mean() < 0.95


@requires_tpu
def test_trajectory_outputs_consistent():
    from littlemcmc_tpu.ops import build_trajectory_op

    N, C = 16, 64
    model = models.CorrelatedGaussian(N)
    spec = model.pallas_trajectory_spec()
    traj = build_trajectory_op(spec, N, 8, 1000.0)
    key = jax.random.key(0)
    q = jax.random.normal(key, (C, N), jnp.float32)
    lp = jax.vmap(model.logp)(q)
    g = jax.vmap(lambda x: model.logp_grad(x)[1])(q)
    p = jax.random.normal(jax.random.key(1), (C, N), jnp.float32)
    var = jnp.ones((C, N), jnp.float32)
    out = traj(q, p, g, lp, jnp.full((C,), 0.1, jnp.float32),
               jnp.full((C,), 8, jnp.int32), var, jnp.int32(3))
    # proposal grad/logp must match a fresh model eval at the proposal —
    # to the kernel model's precision: the spec computes its matvec via
    # the bf16x3 split (math.dot_f32x3), whose error is relative to the
    # ROW norm (cancellation leaves small elements carrying ~|row|*5e-6
    # absolute), so the per-element gate scales with each row's largest
    # gradient component. The gate is proposal identity, not precision.
    lp2, g2 = jax.vmap(model.logp_grad)(out["q"])
    g2n = np.asarray(g2)
    tol = 5e-5 * np.abs(g2n).max(axis=1, keepdims=True) + 1e-4
    assert (np.abs(np.asarray(out["grad"]) - g2n) <= tol).all()
    np.testing.assert_allclose(np.asarray(out["logp"]), np.asarray(lp2),
                               rtol=1e-4, atol=2e-3)
    d = np.asarray(out["depth"])
    assert (d >= 0).all() and (d <= 8).all()
    assert np.isfinite(np.asarray(out["energy"])).all()


@requires_tpu
def test_pallas_path_posterior_parity():
    C, N = 256, 25
    model = models.CorrelatedGaussian(N)
    step = lmc.NUTS(model_ndim=N,
                    pallas_trajectory=model.pallas_trajectory_spec())
    trace, stats = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=N,
                              draws=500, tune=400, chains=C, random_seed=7,
                              step=step, progressbar=False)
    tr = np.asarray(trace)
    assert np.abs(tr.mean(axis=(0, 1))).max() < 0.15
    vr = tr.var(axis=(0, 1)) / model.true_var
    assert vr.min() > 0.8 and vr.max() < 1.25
    assert np.asarray(stats["diverging"]).mean() < 0.01
    mta = np.asarray(stats["mean_tree_accept"])
    assert 0.6 < mta[:, -200:].mean() < 0.95


@requires_tpu
def test_pallas_path_composes_with_mesh():
    """The trajectory op is shard_map-wrapped over the chain mesh."""
    from jax.sharding import Mesh

    C, N = 128, 16
    model = models.CorrelatedGaussian(N)
    mesh = Mesh(np.array(jax.devices()[:1]), ("chains",))
    step = lmc.NUTS(model_ndim=N,
                    pallas_trajectory=model.pallas_trajectory_spec())
    trace, stats = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=N,
                              draws=200, tune=200, chains=C, random_seed=3,
                              step=step, mesh=mesh, progressbar=False)
    tr = np.asarray(trace)
    assert np.abs(tr.mean(axis=(0, 1))).max() < 0.3
    assert 0.6 < np.asarray(stats["mean_tree_accept"])[:, -100:].mean() < 0.95


@requires_tpu
def test_dense_metric_pallas_path():
    """Static shared dense metric runs in the trajectory kernel."""
    C, N = 128, 16
    model = models.CorrelatedGaussian(N)
    pot = lmc.QuadPotentialFull.create(jnp.asarray(model.cov, jnp.float32))
    step = lmc.NUTS(model_ndim=N, potential=pot,
                    pallas_trajectory=model.pallas_trajectory_spec())
    trace, stats = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=N,
                              draws=300, tune=200, chains=C, random_seed=4,
                              step=step, progressbar=False)
    tr = np.asarray(trace)
    vr = tr.reshape(-1, N).var(axis=0) / model.true_var
    # perfect metric: near-iid sampling, tight variances
    assert vr.min() > 0.85 and vr.max() < 1.2
    assert np.asarray(stats["diverging"]).mean() < 0.01


@requires_tpu
def test_pooled_dense_metric_pallas_path():
    """Cross-chain pooled adaptive dense metric runs in the kernel."""
    C, N = 128, 16
    model = models.CorrelatedGaussian(N)
    step = lmc.NUTS(model_ndim=N,
                    pallas_trajectory=model.pallas_trajectory_spec())
    trace, stats = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=N,
                              draws=400, tune=300, chains=C, random_seed=6,
                              step=step, init="jitter+adapt_full",
                              cross_chain_adapt=True, progressbar=False)
    tr = np.asarray(trace)
    vr = tr.reshape(-1, N).var(axis=0) / model.true_var
    assert vr.min() > 0.8 and vr.max() < 1.25
    assert np.asarray(stats["diverging"]).mean() < 0.01


@requires_tpu
def test_pallas_path_checkpoint_resume_bit_identical(tmp_path):
    """The PER-DRAW kernel re-seeds its PRNG from the chain keys each
    draw, so a resumed run reproduces the full run's tail bit-for-bit.
    fuse_draws=False pins the engine: the fused engine's streams depend
    on chunk boundaries by documented design (sample() docstring), so on
    backends where it auto-selects this contract belongs to the per-draw
    path only (fused resume is covered statistically in
    test_checkpoint.py::test_interrupt_between_fused_chunks)."""
    ckpt = str(tmp_path / "ckpt")
    model = models.CorrelatedGaussian(8)
    step = lmc.NUTS(model_ndim=8,
                    pallas_trajectory=model.pallas_trajectory_spec())
    kwargs = dict(logp_dlogp_func=model.logp_grad, model_ndim=8,
                  draws=60, tune=40, chains=16, random_seed=17,
                  step=step, progressbar=False, fuse_draws=False)
    t_full, _ = lmc.sample(checkpoint_dir=ckpt, checkpoint_every=30, **kwargs)
    t_resumed, _ = lmc.sample(checkpoint_dir=ckpt, resume=True, **kwargs)
    assert t_resumed.shape == (16, 10, 8)
    np.testing.assert_array_equal(np.asarray(t_resumed),
                                  np.asarray(t_full)[:, -10:, :])


def test_unblockable_chain_count_raises_value_error():
    """Chain counts with no usable block divisor must raise the friendly
    ValueError, not ZeroDivisionError (regression: CB halved to 0)."""
    from littlemcmc_tpu.ops import build_trajectory_op

    model = models.StandardNormal(4)
    spec = model.pallas_trajectory_spec()
    traj = build_trajectory_op(spec, 4, 4, 1000.0, interpret=True, pack=2)
    C = 25  # odd: no divisor compatible with K=2
    q = jnp.zeros((C, 4), jnp.float32)
    v = jnp.zeros((C,), jnp.float32)
    with pytest.raises(ValueError, match="chains=25"):
        traj(q, q, q, v, v + 0.1, jnp.full((C,), 4, jnp.int32),
             jnp.ones((C, 4), jnp.float32), jnp.int32(0))


def test_interpret_lowrank_metric_pallas_path():
    """Pooled low-rank metric in the trajectory kernel (interpret mode).

    The spiked Gaussian is the target the metric exists for; the pooled
    factor (shared V/λ/α + per-chain stds) runs as metric="lowrank"
    inside the kernel. Gates: correct variances, near-zero divergences,
    and visibly shallower trees than the diag metric on the same target.
    """
    C, N = 64, 16
    model = models.SpikedGaussian(N, rank=2, spikes=(100.0, 25.0))
    step = lmc.NUTS(model_ndim=N,
                    pallas_trajectory=model.pallas_trajectory_spec(),
                    pallas_interpret=True)
    trace, stats = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=N,
                              draws=300, tune=300, chains=C, random_seed=9,
                              step=step, init="jitter+adapt_lowrank",
                              cross_chain_adapt=True, progressbar=False)
    tr = np.asarray(trace)
    vr = tr.reshape(-1, N).var(axis=0) / model.true_var
    assert vr.min() > 0.8 and vr.max() < 1.25, vr
    assert np.asarray(stats["diverging"]).mean() < 0.01

    step_d = lmc.NUTS(model_ndim=N,
                      pallas_trajectory=model.pallas_trajectory_spec(),
                      pallas_interpret=True)
    _, stats_d = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=N,
                            draws=300, tune=300, chains=C, random_seed=9,
                            step=step_d, init="jitter+adapt_diag",
                            progressbar=False)
    depth_lr = float(np.mean(np.asarray(stats["depth"])))
    depth_d = float(np.mean(np.asarray(stats_d["depth"])))
    assert depth_lr < depth_d - 0.4, (depth_lr, depth_d)


def test_interpret_lowrank_composes_with_mesh():
    """metric="lowrank" under shard_map: per-chain stds shard over the
    chain axis, the pooled factor replicates."""
    from jax.sharding import Mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU backend")
    N = 16
    model = models.SpikedGaussian(N, rank=2, spikes=(64.0, 16.0))
    step = lmc.NUTS(model_ndim=N,
                    pallas_trajectory=model.pallas_trajectory_spec(),
                    pallas_interpret=True)
    mesh = Mesh(np.array(jax.devices()), ("chains",))
    trace, stats = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=N,
                              draws=200, tune=200, chains=64, random_seed=10,
                              step=step, mesh=mesh,
                              init="jitter+adapt_lowrank",
                              cross_chain_adapt=True, progressbar=False)
    tr = np.asarray(trace)
    vr = tr.reshape(-1, N).var(axis=0) / model.true_var
    assert vr.min() > 0.8 and vr.max() < 1.25, vr
    assert np.asarray(stats["diverging"]).mean() < 0.01


@requires_tpu
def test_lowrank_metric_pallas_path():
    """Cross-chain pooled low-rank metric in the kernel on real TPU."""
    C, N = 128, 16
    model = models.SpikedGaussian(N, rank=2, spikes=(100.0, 25.0))
    step = lmc.NUTS(model_ndim=N,
                    pallas_trajectory=model.pallas_trajectory_spec())
    trace, stats = lmc.sample(logp_dlogp_func=model.logp_grad, model_ndim=N,
                              draws=400, tune=300, chains=C, random_seed=9,
                              step=step, init="jitter+adapt_lowrank",
                              cross_chain_adapt=True, progressbar=False)
    tr = np.asarray(trace)
    vr = tr.reshape(-1, N).var(axis=0) / model.true_var
    assert vr.min() > 0.8 and vr.max() < 1.25
    assert np.asarray(stats["diverging"]).mean() < 0.01
