"""Leapfrog integrator tests: reversibility and energy bookkeeping.

Mirrors the reference's key integrator property test (reversibility,
``tests/test_hmc.py:23-40``): integrate n steps forward then n steps with
-ε and land back at the start.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from littlemcmc_tpu.integration import compute_state, leapfrog
from littlemcmc_tpu.quadpotential import QuadPotentialDiag, QuadPotentialFull


def logp_grad(q):
    return -0.5 * jnp.sum(q ** 2), -q


@pytest.mark.parametrize("epsilon", [0.01, 0.1])
@pytest.mark.parametrize("n_steps", [1, 2, 3, 4, 20])
def test_leapfrog_reversible(epsilon, n_steps):
    ndim = 5
    key = jax.random.key(42)
    kq, kp = jax.random.split(key)
    q = jax.random.normal(kq, (ndim,))
    p = jax.random.normal(kp, (ndim,))
    pot = QuadPotentialDiag.create(jnp.full((ndim,), 0.7))

    state = compute_state(pot, logp_grad, q, p)

    fwd = state
    for _ in range(n_steps):
        fwd = leapfrog(pot, logp_grad, jnp.asarray(epsilon), fwd)
    back = fwd
    for _ in range(n_steps):
        back = leapfrog(pot, logp_grad, jnp.asarray(-epsilon), back)

    np.testing.assert_allclose(np.asarray(back.q), np.asarray(state.q), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(back.p), np.asarray(state.p), rtol=1e-4, atol=1e-5)


def test_energy_definition():
    ndim = 3
    q = jnp.asarray([0.5, -1.0, 2.0])
    p = jnp.asarray([1.0, 0.0, -0.5])
    var = jnp.asarray([0.5, 1.0, 2.0])
    pot = QuadPotentialDiag.create(var)
    state = compute_state(pot, logp_grad, q, p)

    logp = -0.5 * float(jnp.sum(q ** 2))
    kinetic = 0.5 * float(jnp.sum(var * p ** 2))
    np.testing.assert_allclose(float(state.energy), kinetic - logp, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state.v), np.asarray(var * p), rtol=1e-6)
    np.testing.assert_allclose(float(state.model_logp), logp, rtol=1e-5)


def test_energy_conservation_small_step():
    """Leapfrog on a Gaussian should conserve energy to O(eps^2)."""
    ndim = 4
    key = jax.random.key(0)
    q = jax.random.normal(key, (ndim,))
    p = jax.random.normal(jax.random.key(1), (ndim,))
    pot = QuadPotentialFull.create(jnp.eye(ndim) * 0.8 + 0.1)
    state = compute_state(pot, logp_grad, q, p)
    s = state
    for _ in range(100):
        s = leapfrog(pot, logp_grad, jnp.asarray(0.01), s)
    assert abs(float(s.energy) - float(state.energy)) < 1e-2


def test_final_velocity_matches_final_momentum():
    """The returned v must be M^{-1} p_final (used by U-turn checks)."""
    ndim = 3
    pot = QuadPotentialDiag.create(jnp.asarray([0.5, 1.5, 2.0]))
    state = compute_state(pot, logp_grad, jnp.ones(ndim), jnp.ones(ndim))
    nxt = leapfrog(pot, logp_grad, jnp.asarray(0.1), state)
    np.testing.assert_allclose(
        np.asarray(nxt.v), np.asarray(pot.velocity(nxt.p)), rtol=1e-6
    )


@pytest.mark.parametrize("scheme", ["two_stage", "three_stage"])
def test_higher_order_reversible(scheme):
    ndim = 4
    q = jax.random.normal(jax.random.key(2), (ndim,))
    p = jax.random.normal(jax.random.key(3), (ndim,))
    pot = QuadPotentialDiag.create(jnp.full((ndim,), 1.3))
    state = compute_state(pot, logp_grad, q, p)
    fwd = state
    for _ in range(10):
        fwd = leapfrog(pot, logp_grad, jnp.asarray(0.1), fwd, scheme)
    back = fwd
    for _ in range(10):
        back = leapfrog(pot, logp_grad, jnp.asarray(-0.1), back, scheme)
    np.testing.assert_allclose(np.asarray(back.q), np.asarray(state.q), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(back.p), np.asarray(state.p), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("scheme", ["two_stage", "three_stage"])
def test_higher_order_smaller_energy_error(scheme):
    """At equal *model-eval budget*, minimal-norm schemes beat leapfrog.

    Per step: leapfrog = 1 eval, two_stage = 2, three_stage = 3. Compare
    energy drift per eval with the same total path length.
    """
    ndim = 6
    q = jax.random.normal(jax.random.key(4), (ndim,))
    p = jax.random.normal(jax.random.key(5), (ndim,))
    pot = QuadPotentialDiag.create(jnp.ones(ndim))
    start = compute_state(pot, logp_grad, q, p)

    def max_err(sch, eps, n):
        s, worst = start, 0.0
        for _ in range(n):
            s = leapfrog(pot, logp_grad, jnp.asarray(eps), s, sch)
            worst = max(worst, abs(float(s.energy) - float(start.energy)))
        return worst

    n_evals = {"two_stage": 2, "three_stage": 3}[scheme]
    base = max_err("leapfrog", 0.25, 24)
    # same eval budget: n steps = 24 / n_evals at step size 0.25 * n_evals
    high = max_err(scheme, 0.25 * n_evals, 24 // n_evals)
    assert high < base
