"""Fused quadratic-form logp+grad Pallas kernel.

For a zero-mean Gaussian with precision matrix Λ:
``grad = -Λ q`` and ``logp = ½ q·grad`` — one (C, n) x (n, n) matmul on
the MXU plus a fused rowsum, reading ``q`` exactly once. This is the hot
call of the correlated-Gaussian benchmark (BASELINE config 2): every
leapfrog step of every chain evaluates it.

Design notes (see /opt/skills/guides/pallas_guide.md):
- operands are zero-padded to MXU/VPU tiles (n → multiple of 128, chain
  tile 256 rows); zero padding keeps the math exact,
- the precision matrix lives in VMEM once per program and is reused by
  the whole chain tile,
- ``preferred_element_type=float32`` keeps MXU accumulation in f32.

On non-TPU backends the caller should use the plain XLA formulation
(``interpret=True`` is used automatically on CPU so tests exercise the
same code path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..math import round_up

__all__ = ["quadform_logp_grad"]

_CHAIN_TILE = 256
_LANE = 128




def _kernel(q_ref, prec_ref, logp_ref, grad_ref):
    q = q_ref[:]
    grad = -jnp.dot(q, prec_ref[:], precision="highest",
                    preferred_element_type=jnp.float32)
    grad_ref[:] = grad
    # logp = 0.5 * rowsum(q * grad); padding columns contribute zeros.
    logp_ref[:] = 0.5 * jnp.sum(q * grad, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _quadform_padded(q_pad: jax.Array, prec_pad: jax.Array, interpret: bool = False):
    C, n_pad = q_pad.shape
    grid = (C // _CHAIN_TILE,)
    logp, grad = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_CHAIN_TILE, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_CHAIN_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHAIN_TILE, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, 1), jnp.float32),
            jax.ShapeDtypeStruct((C, n_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * C * n_pad * n_pad + 2 * C * n_pad,
            bytes_accessed=4 * (C * n_pad * 2 + n_pad * n_pad + C),
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_pad, prec_pad)
    return logp, grad


def quadform_logp_grad(q: jax.Array, prec: jax.Array):
    """Batched fused ``(logp, grad)`` for ``logp = -½ qᵀΛq``.

    ``q``: (chains, n) positions; ``prec``: (n, n) precision matrix.
    Returns ``(logp (chains,), grad (chains, n))``. Shapes are padded to
    TPU tiles internally; chains should be a multiple of 256 for best
    efficiency (smaller batches are padded).
    """
    C, n = q.shape
    n_pad = round_up(n, _LANE)
    C_pad = round_up(C, _CHAIN_TILE)
    q_pad = jnp.zeros((C_pad, n_pad), jnp.float32).at[:C, :n].set(q.astype(jnp.float32))
    prec_pad = jnp.zeros((n_pad, n_pad), jnp.float32).at[:n, :n].set(
        prec.astype(jnp.float32)
    )
    interpret = jax.default_backend() != "tpu"
    logp, grad = _quadform_padded(q_pad, prec_pad, interpret=interpret)
    return logp[:C, 0].astype(q.dtype), grad[:C, :n].astype(q.dtype)
