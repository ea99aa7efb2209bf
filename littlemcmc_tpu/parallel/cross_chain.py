"""Cross-chain mass-matrix adaptation: pool Welford statistics over chains.

A strict extension over the reference (whose chains adapt in isolation,
one process each): with hundreds-to-thousands of vectorized chains, the
pooled position statistics give a far lower-variance metric estimate per
tuning window. Each chain keeps its own Welford accumulators (so window
swaps stay exact); only the *metric* (``var``/``stds`` or ``cov``/
``chol``) is recomputed from the cross-chain pooled moments each tuning
step. Under a ``chains``-sharded mesh the pooling reductions become XLA
collectives (psum over ICI) automatically.

Pooled moments use the standard parallel Welford combination
(Chan et al.): ``W = Σ w_c``, ``M = Σ w_c m_c / W``,
``raw = Σ raw_c + Σ w_c (m_c - M)²`` (outer products in the dense case).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..quadpotential import QuadPotentialDiagAdapt, QuadPotentialFullAdapt

__all__ = ["cross_chain_potential_pool"]


def _pooled_diag(pot: QuadPotentialDiagAdapt):
    w = pot.fg.w_sum  # (C,)
    W = jnp.sum(w)
    M = jnp.sum(w[:, None] * pot.fg.mean, axis=0) / W
    raw = jnp.sum(pot.fg.raw_var, axis=0) + jnp.sum(
        w[:, None] * (pot.fg.mean - M) ** 2, axis=0
    )
    return raw / W  # biased (divide-by-W), matching the per-chain estimator


def _pooled_cov(pot: QuadPotentialFullAdapt):
    n = pot.fg.n_samples  # (C,)
    N = jnp.sum(n)
    M = jnp.sum(n[:, None] * pot.fg.mean, axis=0) / N
    d = pot.fg.mean - M  # (C, n)
    raw = jnp.sum(pot.fg.raw_cov, axis=0) + jnp.einsum("c,ci,cj->ij", n, d, d)
    return raw / (N - 1.0)


def cross_chain_potential_pool(potential, tuning):
    """Overwrite each chain's metric with the cross-chain pooled estimate.

    ``potential`` is a chain-batched metric pytree (leading axis = chains).
    No-op for static metrics and when ``tuning`` is False.
    """
    if isinstance(potential, QuadPotentialDiagAdapt):
        var = _pooled_diag(potential)  # (n,)
        stds = jnp.sqrt(var)
        C = potential.var.shape[0]
        bvar = jnp.broadcast_to(var, (C,) + var.shape)
        bstds = jnp.broadcast_to(stds, (C,) + stds.shape)
        pooled = potential.replace(var=bvar, stds=bstds, inv_stds=1.0 / bstds)
    elif isinstance(potential, QuadPotentialFullAdapt):
        cov = _pooled_cov(potential)  # (n, n)
        chol = jnp.linalg.cholesky(cov)
        ok = jnp.all(jnp.isfinite(chol))
        C = potential.cov.shape[0]
        bcov = jnp.broadcast_to(cov, (C,) + cov.shape)
        bchol = jnp.broadcast_to(chol, (C,) + chol.shape)
        pooled = potential.replace(
            cov=jnp.where(ok, bcov, potential.cov),
            chol=jnp.where(ok, bchol, potential.chol),
        )
    else:
        return potential

    return jax.tree.map(lambda p, s: jnp.where(tuning, p, s), pooled, potential)
