"""Leapfrog integration as pure functions over an immutable phase-space state.

TPU-native counterpart of the reference's ``littlemcmc/integration.py``.
The reference's ``CpuLeapfrogIntegrator`` raises ``IntegrationError`` on
scipy LinAlg failures (``integration.py:86-98``); under XLA there are no
exceptions — non-finite values propagate through the state and are caught
by the samplers' divergence masks (NaN energy ⇒ infinite energy change ⇒
divergence), which reproduces the reference's divergence statistics.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax

__all__ = ["IntegratorState", "compute_state", "leapfrog"]

LogpGradFn = Callable[[jax.Array], Tuple[jax.Array, jax.Array]]


class IntegratorState(NamedTuple):
    """Phase-space point (reference ``integration.py:25``)."""

    q: jax.Array  # position, (n,)
    p: jax.Array  # momentum, (n,)
    v: jax.Array  # velocity = M^{-1} p, (n,)
    q_grad: jax.Array  # d logp / dq, (n,)
    energy: jax.Array  # scalar: kinetic - logp
    model_logp: jax.Array  # scalar


def compute_state(
    potential, logp_grad_fn: LogpGradFn, q: jax.Array, p: jax.Array
) -> IntegratorState:
    """Evaluate Hamiltonian functions at ``(q, p)`` (reference ``integration.py:52-66``)."""
    logp, grad = logp_grad_fn(q)
    v = potential.velocity(p)
    kinetic = potential.kinetic(p, v)
    return IntegratorState(q, p, v, grad, kinetic - logp, logp)


def recompute_with_momentum(
    potential, state_q: jax.Array, q_grad: jax.Array, logp: jax.Array, p: jax.Array
) -> IntegratorState:
    """Build a fresh trajectory start reusing a cached ``(logp, grad)``.

    The reference re-evaluates the model at the current position every draw
    (``base_hmc.py:143`` → ``integration.py:62``) even though the value is
    identical to the previous proposal's; caching it saves one model
    evaluation per draw at no statistical cost.
    """
    v = potential.velocity(p)
    kinetic = potential.kinetic(p, v)
    return IntegratorState(state_q, p, v, q_grad, kinetic - logp, logp)


def leapfrog(
    potential, logp_grad_fn: LogpGradFn, epsilon: jax.Array, state: IntegratorState
) -> IntegratorState:
    """One kick-drift-kick leapfrog step (reference ``integration.py:100-121``).

    Like the reference, the returned velocity is ``M^{-1} p_final`` (the
    reference's ``velocity_energy`` overwrites ``v_new`` in place at
    ``integration.py:118``), which is what the NUTS U-turn checks consume.
    """
    dt = 0.5 * epsilon

    # Half momentum step.
    p = state.p + dt * state.q_grad
    # Whole position step.
    v_half = potential.velocity(p)
    q = (state.q + epsilon * v_half).astype(state.q.dtype)
    # Half momentum step with the fresh gradient.
    logp, grad = logp_grad_fn(q)
    p = p + dt * grad

    v = potential.velocity(p)
    kinetic = potential.kinetic(p, v)
    return IntegratorState(q, p, v, grad, kinetic - logp, logp)
