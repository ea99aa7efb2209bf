"""Dual-averaging step-size adaptation: compare against a NumPy replica."""

import jax.numpy as jnp
import numpy as np

from littlemcmc_tpu.step_sizes import dual_average_init, dual_average_update

TARGET, GAMMA, K, T0 = 0.8, 0.05, 0.75, 10.0


def numpy_dual_average(initial_step, accepts):
    """Straight NumPy implementation of Hoffman & Gelman Alg. 5."""
    log_step = np.log(initial_step)
    log_bar = log_step
    hbar = 0.0
    count = 1
    mu = np.log(10 * initial_step)
    out = []
    for a in accepts:
        w = 1.0 / (count + T0)
        hbar = (1 - w) * hbar + w * (TARGET - a)
        log_step = mu - hbar * np.sqrt(count) / GAMMA
        mk = count ** (-K)
        log_bar = mk * log_step + (1 - mk) * log_bar
        count += 1
        out.append((log_step, log_bar))
    return out


def test_matches_numpy_sequence():
    accepts = [0.5, 0.9, 1.0, 0.2, 0.8, 0.77, 0.95]
    state = dual_average_init(0.25)
    ref = numpy_dual_average(0.25, accepts)
    for a, (ls, lb) in zip(accepts, ref):
        state = dual_average_update(
            state, jnp.asarray(a), jnp.asarray(True),
            target=TARGET, gamma=GAMMA, k=K, t0=T0,
        )
        np.testing.assert_allclose(float(state.log_step), ls, rtol=1e-4)
        np.testing.assert_allclose(float(state.log_bar), lb, rtol=1e-4)
    assert int(state.count) == len(accepts) + 1


def test_frozen_after_tuning():
    state = dual_average_init(0.25)
    state = dual_average_update(state, jnp.asarray(0.2), jnp.asarray(True),
                                target=TARGET, gamma=GAMMA, k=K, t0=T0)
    frozen = dual_average_update(state, jnp.asarray(0.99), jnp.asarray(False),
                                 target=TARGET, gamma=GAMMA, k=K, t0=T0)
    np.testing.assert_allclose(float(frozen.log_step), float(state.log_step))
    assert int(frozen.count) == int(state.count)


def test_current_selects_tuned_vs_bar():
    state = dual_average_init(0.25)
    for a in [0.2, 0.3, 0.1]:
        state = dual_average_update(state, jnp.asarray(a), jnp.asarray(True),
                                    target=TARGET, gamma=GAMMA, k=K, t0=T0)
    eps_tune = float(state.current(jnp.asarray(True)))
    eps_frozen = float(state.current(jnp.asarray(False)))
    np.testing.assert_allclose(eps_tune, np.exp(float(state.log_step)), rtol=1e-6)
    np.testing.assert_allclose(eps_frozen, np.exp(float(state.log_bar)), rtol=1e-6)
    # low acceptance -> step size shrinks below initial
    assert eps_tune < 0.25
