"""Tests for the whole-trajectory Pallas HMC kernel.

CPU CI runs the interpret-mode kernel (counter PRNG); `make test-tpu`
re-validates the on-core path on the chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import littlemcmc_tpu as lmc
from littlemcmc_tpu import models

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="on-core PRNG path needs real TPU (CPU runs the interpret tests)",
)


def _pallas_hmc_step(model, **kw):
    return lmc.HamiltonianMC(model_ndim=model.ndim,
                             pallas_trajectory=model.pallas_trajectory_spec(),
                             pallas_interpret=jax.default_backend() != "tpu",
                             **kw)


def test_interpret_hmc_trajectory_matches_direct():
    """One batch of trajectories: positions/flags must satisfy the HMC
    contract (selected = accepted ? end : start; per-chain step counts)."""
    from littlemcmc_tpu.ops.hmc_trajectory_pallas import build_hmc_trajectory_op

    m = models.StandardNormal(4)
    C = 64
    traj = build_hmc_trajectory_op(m.pallas_trajectory_spec(), 4, 1000.0,
                                   interpret=True)
    kq, kp = jax.random.split(jax.random.key(0))
    q = jax.random.normal(kq, (C, 4), jnp.float32)
    lp = jax.vmap(m.logp)(q)
    g = jax.vmap(lambda x: m.logp_grad(x)[1])(q)
    p = jax.random.normal(kp, (C, 4), jnp.float32)
    n_steps = jnp.asarray(np.random.RandomState(1).randint(1, 9, C), jnp.int32)
    out = jax.tree.map(np.asarray, traj(
        q, p, g, lp, jnp.full((C,), 0.3, jnp.float32), n_steps,
        jnp.ones((C, 4), jnp.float32), jnp.int32(3)))
    # rejected chains keep the start position exactly
    rej = ~out["accepted"]
    np.testing.assert_array_equal(out["q"][rej], np.asarray(q)[rej])
    # accepted chains moved (n_steps >= 1 always)
    assert (np.abs(out["q"][out["accepted"]] -
                   np.asarray(q)[out["accepted"]]).max(axis=1) > 0).all()
    # selected logp consistent with a fresh model eval
    lp2 = np.asarray(jax.vmap(m.logp)(jnp.asarray(out["q"])))
    np.testing.assert_allclose(out["logp"], lp2, rtol=1e-4, atol=1e-4)
    assert out["diverging"].mean() == 0.0
    assert 0.2 < out["accepted"].mean() <= 1.0


def test_interpret_hmc_e2e_posterior_parity():
    """sample() through the Pallas HMC kernel matches the XLA HMC path."""
    m = models.CorrelatedGaussian(16)
    # target_accept rides on the step constructors: sample() ignores
    # step-method kwargs when an explicit step is given (warns)
    kw = dict(logp_dlogp_func=m.logp_grad, model_ndim=16, chains=32,
              tune=300, draws=600, random_seed=5, progressbar=False)
    tr_p, st_p = lmc.sample(step=_pallas_hmc_step(m, target_accept=0.7), **kw)
    tr_x, st_x = lmc.sample(
        step=lmc.HamiltonianMC(model_ndim=16, target_accept=0.7), **kw)
    vr_p = tr_p.reshape(-1, 16).var(0) / m.true_var
    vr_x = tr_x.reshape(-1, 16).var(0) / m.true_var
    assert vr_p.min() > 0.8 and vr_p.max() < 1.25
    assert abs(np.asarray(st_p["accept"]).mean()
               - np.asarray(st_x["accept"]).mean()) < 0.05
    assert abs(np.asarray(st_p["n_steps"]).mean()
               - np.asarray(st_x["n_steps"]).mean()) < 1.0
    assert np.asarray(st_p["diverging"]).mean() < 0.01
    # stats dict carries the reference's HMC names/dtypes
    for name in ("accept", "accepted", "path_length", "n_steps", "energy"):
        assert st_p[name].shape == (32, 600)


def test_interpret_hmc_composes_with_mesh():
    from jax.sharding import Mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU backend")
    m = models.StandardNormal(4)
    mesh = Mesh(np.array(jax.devices()), ("chains",))
    tr, st = lmc.sample(logp_dlogp_func=m.logp_grad, model_ndim=4,
                        chains=128, tune=200, draws=300, random_seed=2,
                        step=_pallas_hmc_step(m), mesh=mesh,
                        progressbar=False)
    assert abs(tr.mean()) < 0.1
    assert 0.85 < tr.var() < 1.15


def test_pallas_hmc_dense_metric_paths():
    """The *per-draw* Pallas HMC engine is diagonal-only; with a dense
    metric the per-draw path (fuse_draws=False) drops the trajectory
    spec and runs the XLA trajectory instead of erroring, while the
    default auto path runs the fused dense engine."""
    m = models.CorrelatedGaussian(8)
    pot = lmc.QuadPotentialFull.create(jnp.asarray(m.cov, jnp.float32))
    step = lmc.HamiltonianMC(model_ndim=8, potential=pot,
                             pallas_trajectory=m.pallas_trajectory_spec(),
                             pallas_interpret=True)
    tr_pd, _ = lmc.sample(logp_dlogp_func=m.logp_grad, model_ndim=8,
                          chains=8, tune=4, draws=4, random_seed=0,
                          step=step, progressbar=False, fuse_draws=False)
    assert np.asarray(tr_pd).shape == (8, 4, 8)
    assert np.isfinite(np.asarray(tr_pd)).all()
    tr, _ = lmc.sample(logp_dlogp_func=m.logp_grad, model_ndim=8, chains=8,
                       tune=8, draws=8, random_seed=0, step=step,
                       progressbar=False)  # auto: fused dense engine
    assert np.asarray(tr).shape == (8, 8, 8)


@requires_tpu
def test_tpu_hmc_pallas_posterior():
    m = models.EightSchools()
    step = lmc.HamiltonianMC(model_ndim=10, target_accept=0.9,
                             pallas_trajectory=m.pallas_trajectory_spec())
    tr, st = lmc.sample(logp_dlogp_func=m.logp_grad, model_ndim=10,
                        chains=256, tune=400, draws=800, random_seed=6,
                        step=step, progressbar=False)
    mu = tr[:, :, 0]
    assert 3.0 < mu.mean() < 6.5  # reference: 4.55 +- 3.2
    assert np.asarray(st["diverging"]).mean() < 0.05
