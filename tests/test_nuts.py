"""NUTS kernel-level tests: tree mechanics, divergences, adaptation wiring."""

import jax
import jax.numpy as jnp
import numpy as np

import littlemcmc_tpu as lmc
from littlemcmc_tpu.base import init_chain_state
from littlemcmc_tpu.nuts import build_nuts_kernel
from littlemcmc_tpu.sampling import _make_adaptive_potential
from tests.conftest import std_normal_logp_grad


def _make_state(ndim=2, config=None, seed=0, q0=None):
    config = config or lmc.NUTSConfig()
    pot = _make_adaptive_potential(ndim, jnp.zeros(ndim), False, jnp.float32)
    q0 = jnp.zeros(ndim) if q0 is None else q0
    return init_chain_state(jax.random.key(seed), q0, pot, config, std_normal_logp_grad)


def test_single_transition_moves_and_updates():
    config = lmc.NUTSConfig()
    kernel = build_nuts_kernel(std_normal_logp_grad, config)
    state = _make_state(config=config)
    new_state, info = jax.jit(kernel)(state, jnp.asarray(True))
    assert int(new_state.iter_count) == 1
    assert int(new_state.potential.n_samples) == 1
    assert int(new_state.da.count) == 2
    assert 1 <= int(info.depth) <= config.max_treedepth
    assert int(info.tree_size) >= 1
    assert bool(info.tune)
    # logp cached in state equals the proposal's
    np.testing.assert_allclose(float(new_state.logp), float(info.model_logp), rtol=1e-6)


def test_no_adaptation_when_not_tuning():
    config = lmc.NUTSConfig()
    kernel = build_nuts_kernel(std_normal_logp_grad, config)
    state = _make_state(config=config)
    new_state, info = jax.jit(kernel)(state, jnp.asarray(False))
    assert int(new_state.potential.n_samples) == 0
    assert int(new_state.da.count) == 1
    assert not bool(info.tune)


def test_divergent_step_stays_put():
    """A cliff density must produce a divergence and keep the position.

    Counterpart of the reference's divergence semantics: the divergent
    first doubling leaves the proposal at the start and reports
    ``diverging=True`` with ``mean_tree_accept=0`` (``nuts.py:370-375``,
    ``nuts.py:419-425``).
    """

    def cliff_logp(q):
        # Extremely stiff quadratic: any reasonable step diverges.
        logp = -0.5e8 * jnp.sum(q ** 2)
        return logp, -1e8 * q

    config = lmc.NUTSConfig(adapt_step_size=False, step_scale=1.0)
    kernel = build_nuts_kernel(cliff_logp, config)
    pot = _make_adaptive_potential(1, jnp.zeros(1), False, jnp.float32)
    q0 = jnp.asarray([1e-4])
    state = init_chain_state(jax.random.key(1), q0, pot, config, cliff_logp)
    new_state, info = jax.jit(kernel)(state, jnp.asarray(False))
    assert bool(info.diverging)
    assert float(info.mean_tree_accept) == 0.0
    np.testing.assert_array_equal(np.asarray(new_state.q), np.asarray(q0))


def test_early_max_treedepth_schedule():
    """First 200 tuning iters cap depth at early_max_treedepth (nuts.py:205-208)."""
    config = lmc.NUTSConfig(max_treedepth=4, early_max_treedepth=2, adapt_step_size=False,
                            step_scale=1e-4)  # tiny steps -> always hits the cap
    kernel = build_nuts_kernel(std_normal_logp_grad, config)
    state = _make_state(config=config, q0=jnp.asarray([1.0, 1.0]))
    s, info = jax.jit(kernel)(state, jnp.asarray(True))
    assert int(info.depth) == 2  # early cap
    # push iter_count past the early window
    s = s.replace(iter_count=jnp.asarray(300, jnp.int32))
    _, info2 = jax.jit(kernel)(s, jnp.asarray(True))
    assert int(info2.depth) == 4
    # post-tune always uses the full cap
    _, info3 = jax.jit(kernel)(state, jnp.asarray(False))
    assert int(info3.depth) == 4
    assert bool(info3.reached_max_treedepth)


def test_tree_statistics_consistency():
    """tree_size <= 2^depth - 1 ... actually <= 2^depth; energies finite."""
    config = lmc.NUTSConfig()
    kernel = build_nuts_kernel(std_normal_logp_grad, config)
    state = _make_state(ndim=3, seed=3, q0=jnp.asarray([0.5, -0.5, 1.0]))
    state_b = jax.tree.map(lambda x: jnp.broadcast_to(x, (8,) + x.shape), state)
    # distinct keys per chain
    state_b = state_b.replace(rng_key=jax.random.split(jax.random.key(9), 8))
    bk = jax.jit(jax.vmap(kernel, in_axes=(0, None)))
    _, info = bk(state_b, jnp.asarray(False))
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
    state = _make_state(ndim=2, seed=5, q0=jnp.asarray([0.3, 0.3]))
    _, info = jax.jit(kernel)(state, jnp.asarray(False))
    # |energy_error| <= |max_energy_error| is not guaranteed in general
    # (max is over the whole trajectory, error is at the proposal), but
    # the proposal's error can't exceed Emax without a divergence.
    assert abs(float(info.energy_error)) < config.Emax or bool(info.diverging)
