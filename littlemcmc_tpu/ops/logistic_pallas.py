"""Fused Bayesian-logistic-regression logp+grad Pallas kernel.

One model evaluation is two MXU matmuls with an elementwise sigmoid in
between:

    logits = q @ Xbᵀ            (C, N)
    loglik = Σ_n [ y·logits − softplus(logits) ]
    grad   = (y − σ(logits)) @ Xb − q / prior_scale²

XLA would materialize the ``(C, N)`` logits to HBM between the two
matmuls; this kernel keeps them in VMEM for a chain tile, reading ``q``
once and writing only ``(logp, grad)`` — the hot call of BASELINE
config 4 (every leapfrog of every chain).

Shapes are padded to MXU tiles; padded *rows* (fake data points) use
``y = 0`` with an all-zeros design row, contributing ``-softplus(0)``
per row — a constant subtracted off after the kernel. Padded parameter
columns are zero and contribute nothing.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..math import round_up

__all__ = ["make_logistic_logp_grad"]

_CHAIN_TILE = 256
_LANE = 128




def _kernel(q_ref, xbt_ref, xb_ref, y_ref, prior_prec_ref, logp_ref, grad_ref):
    q = q_ref[:]  # (T, P)
    logits = jnp.dot(q, xbt_ref[:], precision="highest",
                     preferred_element_type=jnp.float32)  # (T, N)
    y = y_ref[:]  # (1, N)
    loglik = jnp.sum(
        y * logits - jax.nn.softplus(logits), axis=1, keepdims=True
    )  # (T, 1)
    prior_prec = prior_prec_ref[0, 0]
    logprior = -0.5 * prior_prec * jnp.sum(q * q, axis=1, keepdims=True)
    logp_ref[:] = loglik + logprior

    resid = y - jax.nn.sigmoid(logits)  # (T, N)
    grad_ref[:] = (
        jnp.dot(resid, xb_ref[:], precision="highest",
                preferred_element_type=jnp.float32)
        - prior_prec * q
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused(q_pad, xbt_pad, xb_pad, y_pad, prior_prec, interpret=False):
    C, P = q_pad.shape
    N = y_pad.shape[1]
    grid = (C // _CHAIN_TILE,)
    logp, grad = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_CHAIN_TILE, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((_CHAIN_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHAIN_TILE, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, 1), jnp.float32),
            jax.ShapeDtypeStruct((C, P), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * C * N * P,
            bytes_accessed=4 * (C * P * 2 + 2 * N * P + C),
            transcendentals=2 * C * N,
        ),
        interpret=interpret,
    )(q_pad, xbt_pad, xb_pad, y_pad, prior_prec)
    return logp, grad


def make_logistic_logp_grad(Xb, y, prior_scale: float):
    """Build the batched fused ``(logp, grad)`` for the logistic model.

    ``Xb``: (N, p) design matrix (intercept folded in); ``y``: (N,) in
    {0, 1}. Returns ``f(q: (C, p)) -> (logp (C,), grad (C, p))``.
    """
    import numpy as np

    Xb = np.asarray(Xb, np.float32)
    y = np.asarray(y, np.float32)
    N, P = Xb.shape
    N_pad = round_up(N, _LANE)
    P_pad = round_up(P, _LANE)

    xb_pad = np.zeros((N_pad, P_pad), np.float32)
    xb_pad[:N, :P] = Xb
    y_pad = np.zeros((1, N_pad), np.float32)
    y_pad[0, :N] = y
    xbt_pad = jnp.asarray(xb_pad.T)
    xb_pad = jnp.asarray(xb_pad)
    y_pad = jnp.asarray(y_pad)
    # Padded rows have logits 0 and y 0: each contributes -softplus(0).
    pad_const = (N_pad - N) * math.log(2.0)
    prior_prec = jnp.asarray([[1.0 / prior_scale ** 2]], jnp.float32)

    def batched_logp_grad(q: jax.Array):
        C, p = q.shape
        C_pad = round_up(C, _CHAIN_TILE)
        q_pad = jnp.zeros((C_pad, P_pad), jnp.float32).at[:C, :P].set(
            q.astype(jnp.float32)
        )
        interpret = jax.default_backend() != "tpu"
        logp, grad = _fused(q_pad, xbt_pad, xb_pad, y_pad, prior_prec,
                            interpret=interpret)
        return (logp[:C, 0] + pad_const).astype(q.dtype), grad[:C, :P].astype(q.dtype)

    return batched_logp_grad
