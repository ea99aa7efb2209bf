"""NUTS kernel-level tests: tree mechanics, divergences, adaptation wiring.

The kernel is chain-batched by construction; single-chain behavior is
tested with a batch of one.
"""

import jax
import jax.numpy as jnp
import numpy as np

import littlemcmc_tpu as lmc
from littlemcmc_tpu.base import init_chain_state
from littlemcmc_tpu.nuts import build_nuts_kernel
from littlemcmc_tpu.sampling import _make_adaptive_potential
from tests.conftest import std_normal_logp_grad


def _make_states(ndim=2, config=None, seed=0, q0=None, chains=1):
    """A batch of `chains` identical-start chains with distinct keys."""
    config = config or lmc.NUTSConfig()
    q0 = jnp.zeros(ndim) if q0 is None else q0

    def init_one(k):
        pot = _make_adaptive_potential(ndim, q0, False, jnp.float32)
        return init_chain_state(k, q0, pot, config, std_normal_logp_grad)

    keys = jax.random.split(jax.random.key(seed), chains)
    return jax.vmap(init_one)(keys)


def test_single_transition_moves_and_updates():
    config = lmc.NUTSConfig()
    kernel = build_nuts_kernel(std_normal_logp_grad, config)
    states = _make_states(config=config)
    new_states, info = jax.jit(kernel)(states, jnp.asarray(True))
    assert int(new_states.iter_count[0]) == 1
    assert int(new_states.potential.n_samples[0]) == 1
    assert int(new_states.da.count[0]) == 2
    assert 1 <= int(info.depth[0]) <= config.max_treedepth
    assert int(info.tree_size[0]) >= 1
    assert bool(info.tune[0])
    # logp cached in state equals the proposal's
    np.testing.assert_allclose(
        float(new_states.logp[0]), float(info.model_logp[0]), rtol=1e-6
    )


def test_no_adaptation_when_not_tuning():
    config = lmc.NUTSConfig()
    kernel = build_nuts_kernel(std_normal_logp_grad, config)
    states = _make_states(config=config)
    new_states, info = jax.jit(kernel)(states, jnp.asarray(False))
    assert int(new_states.potential.n_samples[0]) == 0
    assert int(new_states.da.count[0]) == 1
    assert not bool(info.tune[0])


def test_divergent_step_stays_put():
    """A cliff density must produce a divergence and keep the position.

    Counterpart of the reference's divergence semantics: the divergent
    first doubling leaves the proposal at the start and reports
    ``diverging=True`` with ``mean_tree_accept=0`` (``nuts.py:370-375``,
    ``nuts.py:419-425``).
    """

    def cliff_logp(q):
        logp = -0.5e8 * jnp.sum(q ** 2)
        return logp, -1e8 * q

    config = lmc.NUTSConfig(adapt_step_size=False, step_scale=1.0)
    kernel = build_nuts_kernel(cliff_logp, config)
    pot = _make_adaptive_potential(1, jnp.zeros(1), False, jnp.float32)
    q0 = jnp.asarray([1e-4])

    def init_one(k):
        return init_chain_state(k, q0, pot, config, cliff_logp)

    states = jax.vmap(init_one)(jax.random.split(jax.random.key(1), 2))
    new_states, info = jax.jit(kernel)(states, jnp.asarray(False))
    assert bool(info.diverging.all())
    assert float(info.mean_tree_accept.max()) == 0.0
    np.testing.assert_array_equal(np.asarray(new_states.q), np.asarray(states.q))


def test_early_max_treedepth_schedule():
    """First 200 tuning iters cap depth at early_max_treedepth (nuts.py:205-208)."""
    config = lmc.NUTSConfig(max_treedepth=4, early_max_treedepth=2, adapt_step_size=False,
                            step_scale=1e-4)  # tiny steps -> always hits the cap
    kernel = build_nuts_kernel(std_normal_logp_grad, config)
    states = _make_states(config=config, q0=jnp.asarray([1.0, 1.0]))
    s, info = jax.jit(kernel)(states, jnp.asarray(True))
    assert int(info.depth[0]) == 2  # early cap
    # push iter_count past the early window
    s = s.replace(iter_count=jnp.full_like(s.iter_count, 300))
    _, info2 = jax.jit(kernel)(s, jnp.asarray(True))
    assert int(info2.depth[0]) == 4
    # post-tune always uses the full cap
    _, info3 = jax.jit(kernel)(states, jnp.asarray(False))
    assert int(info3.depth[0]) == 4
    assert bool(info3.reached_max_treedepth[0])


def test_mixed_early_window_chains():
    """Chains with different iter_counts get per-chain depth caps."""
    config = lmc.NUTSConfig(max_treedepth=4, early_max_treedepth=2, adapt_step_size=False,
                            step_scale=1e-4)
    kernel = build_nuts_kernel(std_normal_logp_grad, config)
    states = _make_states(config=config, q0=jnp.asarray([1.0, 1.0]), chains=2)
    states = states.replace(iter_count=jnp.asarray([0, 300], jnp.int32))
    _, info = jax.jit(kernel)(states, jnp.asarray(True))
    assert int(info.depth[0]) == 2
    assert int(info.depth[1]) == 4


def test_tree_statistics_consistency():
    config = lmc.NUTSConfig()
    kernel = build_nuts_kernel(std_normal_logp_grad, config)
    states = _make_states(ndim=3, seed=9, q0=jnp.asarray([0.5, -0.5, 1.0]), chains=8)
    _, info = jax.jit(kernel)(states, jnp.asarray(False))
    depth = np.asarray(info.depth)
    tree_size = np.asarray(info.tree_size)
    assert (tree_size <= 2.0 ** depth).all()
    assert (tree_size >= 1).all()
    assert np.isfinite(np.asarray(info.energy)).all()
    assert (np.asarray(info.mean_tree_accept) >= 0).all()
    assert (np.asarray(info.mean_tree_accept) <= 1.0 + 1e-6).all()


def test_energy_error_definition():
    config = lmc.NUTSConfig()
    kernel = build_nuts_kernel(std_normal_logp_grad, config)
    states = _make_states(ndim=2, seed=5, q0=jnp.asarray([0.3, 0.3]))
    _, info = jax.jit(kernel)(states, jnp.asarray(False))
    assert abs(float(info.energy_error[0])) < config.Emax or bool(info.diverging[0])


def test_batched_chains_independent():
    """Chains in one batch must evolve independently (distinct keys)."""
    config = lmc.NUTSConfig()
    kernel = build_nuts_kernel(std_normal_logp_grad, config)
    states = _make_states(ndim=2, seed=3, chains=4)
    s1, _ = jax.jit(kernel)(states, jnp.asarray(False))
    qs = np.asarray(s1.q)
    # all chains moved to different places
    assert len({tuple(np.round(row, 6)) for row in qs}) == 4
