"""Quadpotentials (mass matrices / metrics) as immutable JAX pytrees.

TPU-native re-design of the reference's ``littlemcmc/quadpotential.py``.
The reference implements metrics as mutable Python objects updated in
place per draw; here every metric is a ``flax.struct.dataclass`` pytree
whose ``update`` returns a *new* state, so the whole adaptation loop can
live inside ``jax.lax.scan``, be ``vmap``-ed over thousands of chains, and
be sharded over a ``chains`` mesh axis with ``jax.sharding``.

Semantics parity notes (file:line cites refer to /root/reference):

- ``QuadPotentialDiagAdapt`` — dual-window Welford variance adaptation
  with foreground/background swap every ``adaptation_window`` samples
  (``quadpotential.py:148-245``). The sample variance of the position is
  used directly as the *inverse* mass-matrix diagonal.
- ``QuadPotentialFullAdapt`` — Stan-style dense covariance adaptation with
  Cholesky refresh every ``update_window`` steps and window doubling
  (``quadpotential.py:471-555``). Cholesky failures are latched in a
  ``chol_failed`` flag (surfaced by ``raise_ok``) instead of deferred
  exceptions (``quadpotential.py:521-526``).
- Static metrics ``QuadPotentialDiag`` / ``QuadPotentialFull`` /
  ``QuadPotentialFullInv`` mirror ``quadpotential.py:346-468``.

Unlike the reference (which mixes float32 metric state with float64
chain state, ``quadpotential.py:175-177``), dtype here follows the
position dtype uniformly — float32 by default, which is what TPU VPU/MXU
units execute natively.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from .math import tree_select
import numpy as np
from flax import struct

__all__ = [
    "quad_potential",
    "QuadPotentialDiag",
    "QuadPotentialFull",
    "QuadPotentialFullInv",
    "QuadPotentialDiagAdapt",
    "QuadPotentialFullAdapt",
    "PositiveDefiniteError",
    "partial_check_positive_definite",
]


class PositiveDefiniteError(ValueError):
    """Raised when a scaling matrix fails the simple PD check."""

    def __init__(self, msg, idx):
        super().__init__(msg)
        self.idx = idx
        self.msg = msg

    def __str__(self):
        return "Scaling is not positive definite: %s. Check indexes %s." % (
            self.msg,
            self.idx,
        )


def partial_check_positive_definite(C) -> None:
    """Simple partial PD check on the diagonal (reference ``quadpotential.py:68-77``).

    Runs host-side at construction time (outside jit), so it can raise.
    """
    C = np.asarray(C)
    d = C if C.ndim == 1 else np.diag(C)
    (i,) = np.nonzero(np.logical_or(np.isnan(d), d <= 0))
    if len(i):
        raise PositiveDefiniteError("Simple check failed. Diagonal contains negatives", i)




# ---------------------------------------------------------------------------
# Welford accumulators (online mean/variance/covariance) as pytrees.
# ---------------------------------------------------------------------------


@struct.dataclass
class WelfordVariance:
    """Online weighted mean/variance (reference ``quadpotential.py:294-343``)."""

    w_sum: jax.Array  # scalar
    w_sum2: jax.Array  # scalar
    mean: jax.Array  # (n,)
    raw_var: jax.Array  # (n,)

    @classmethod
    def create(
        cls,
        n: int,
        initial_mean: Optional[jax.Array] = None,
        initial_variance: Optional[jax.Array] = None,
        initial_weight: float = 0.0,
        dtype=jnp.float32,
    ) -> "WelfordVariance":
        w = jnp.asarray(initial_weight, dtype)
        mean = jnp.zeros(n, dtype) if initial_mean is None else jnp.asarray(initial_mean, dtype)
        var = (
            jnp.zeros(n, dtype)
            if initial_variance is None
            else jnp.asarray(initial_variance, dtype)
        )
        return cls(w_sum=w, w_sum2=w * w, mean=mean, raw_var=var * w)

    def add_sample(self, x: jax.Array, weight: float = 1.0) -> "WelfordVariance":
        """One Welford update (reference ``quadpotential.py:324-332``)."""
        w_sum = self.w_sum + weight
        prop = weight / w_sum
        old_diff = x - self.mean
        mean = self.mean + prop * old_diff
        new_diff = x - mean
        return WelfordVariance(
            w_sum=w_sum,
            w_sum2=self.w_sum2 + weight * weight,
            mean=mean,
            raw_var=self.raw_var + weight * old_diff * new_diff,
        )

    def current_variance(self) -> jax.Array:
        """Biased (divide-by-``w_sum``) variance, as the reference uses for the metric."""
        return self.raw_var / self.w_sum

    def current_mean(self) -> jax.Array:
        return self.mean


@struct.dataclass
class WelfordCovariance:
    """Online mean/covariance, Stan-math style (reference ``quadpotential.py:563-615``)."""

    n_samples: jax.Array  # scalar count (initial weight included)
    mean: jax.Array  # (n,)
    raw_cov: jax.Array  # (n, n)

    @classmethod
    def create(
        cls,
        n: int,
        initial_mean: Optional[jax.Array] = None,
        initial_covariance: Optional[jax.Array] = None,
        initial_weight: float = 0.0,
        dtype=jnp.float32,
    ) -> "WelfordCovariance":
        w = jnp.asarray(initial_weight, dtype)
        mean = jnp.zeros(n, dtype) if initial_mean is None else jnp.asarray(initial_mean, dtype)
        cov = (
            jnp.eye(n, dtype=dtype)
            if initial_covariance is None
            else jnp.asarray(initial_covariance, dtype)
        )
        return cls(n_samples=w, mean=mean, raw_cov=cov * w)

    def add_sample(self, x: jax.Array, weight: float = 1.0) -> "WelfordCovariance":
        """One update; the count always increments by 1 (reference ``:598-604``)."""
        n = self.n_samples + 1.0
        old_diff = x - self.mean
        mean = self.mean + old_diff / n
        new_diff = x - mean
        return WelfordCovariance(
            n_samples=n,
            mean=mean,
            raw_cov=self.raw_cov + weight * jnp.outer(new_diff, old_diff),
        )

    def current_covariance(self) -> jax.Array:
        """Unbiased (divide-by-``n-1``) covariance (reference ``:606-612``)."""
        return self.raw_cov / (self.n_samples - 1.0)

    def current_mean(self) -> jax.Array:
        return self.mean


# ---------------------------------------------------------------------------
# Static metrics.
# ---------------------------------------------------------------------------


@struct.dataclass
class QuadPotentialDiag:
    """Fixed diagonal metric; ``v`` is the inverse-mass diagonal.

    Mirrors reference ``quadpotential.py:346-387``.
    """

    v: jax.Array
    s: jax.Array
    inv_s: jax.Array

    @classmethod
    def create(cls, v, dtype=None) -> "QuadPotentialDiag":
        v = jnp.asarray(v, dtype)
        s = jnp.sqrt(v)
        return cls(v=v, s=s, inv_s=1.0 / s)

    def velocity(self, p: jax.Array) -> jax.Array:
        return self.v * p

    def kinetic(self, p: jax.Array, velocity: Optional[jax.Array] = None) -> jax.Array:
        if velocity is None:
            velocity = self.velocity(p)
        return 0.5 * jnp.dot(p, velocity)

    def sample_momentum(self, key: jax.Array) -> jax.Array:
        return jax.random.normal(key, self.s.shape, self.s.dtype) * self.inv_s

    def update(self, sample, grad, tuning):
        return self

    def raise_ok(self) -> None:
        return None


@struct.dataclass
class QuadPotentialFull:
    """Fixed dense metric parameterized by a covariance (= inverse mass) matrix.

    ``velocity = cov @ p``; momentum is drawn with the Cholesky transpose
    solve (reference ``quadpotential.py:430-468``).
    """

    cov: jax.Array
    chol: jax.Array  # lower Cholesky of cov

    @classmethod
    def create(cls, cov, dtype=None) -> "QuadPotentialFull":
        cov = jnp.asarray(cov, dtype)
        return cls(cov=cov, chol=jnp.linalg.cholesky(cov))

    def velocity(self, p: jax.Array) -> jax.Array:
        # exact-f32: bf16 MXU inputs bias the sampled density (the kinetic
        # energy would no longer match the momentum-sampling density)
        return jnp.dot(self.cov, p, precision="highest",
                       preferred_element_type=self.cov.dtype)

    def kinetic(self, p: jax.Array, velocity: Optional[jax.Array] = None) -> jax.Array:
        if velocity is None:
            velocity = self.velocity(p)
        return 0.5 * jnp.dot(p, velocity)

    def sample_momentum(self, key: jax.Array) -> jax.Array:
        n = jax.random.normal(key, (self.cov.shape[0],), self.cov.dtype)
        return jax.scipy.linalg.solve_triangular(self.chol.T, n, lower=False)

    def update(self, sample, grad, tuning):
        return self

    def raise_ok(self) -> None:
        return None


@struct.dataclass
class QuadPotentialFullInv:
    """Fixed dense metric parameterized by the mass (precision) matrix itself.

    ``velocity = A^{-1} p`` via Cholesky solves; momentum ``p = L n``
    (reference ``quadpotential.py:390-427``).
    """

    chol: jax.Array  # lower Cholesky of the mass matrix A

    @classmethod
    def create(cls, A, dtype=None) -> "QuadPotentialFullInv":
        A = jnp.asarray(A, dtype)
        return cls(chol=jnp.linalg.cholesky(A))

    def velocity(self, p: jax.Array) -> jax.Array:
        return jax.scipy.linalg.cho_solve((self.chol, True), p)

    def kinetic(self, p: jax.Array, velocity: Optional[jax.Array] = None) -> jax.Array:
        if velocity is None:
            velocity = self.velocity(p)
        return 0.5 * jnp.dot(p, velocity)

    def sample_momentum(self, key: jax.Array) -> jax.Array:
        n = jax.random.normal(key, (self.chol.shape[0],), self.chol.dtype)
        return jnp.dot(self.chol, n, precision="highest",
                       preferred_element_type=self.chol.dtype)

    def update(self, sample, grad, tuning):
        return self

    def raise_ok(self) -> None:
        return None


# ---------------------------------------------------------------------------
# Adaptive metrics.
# ---------------------------------------------------------------------------


@struct.dataclass
class QuadPotentialDiagAdapt:
    """Diagonal metric adapted from sample variances, dual-window Welford.

    Functional rewrite of reference ``quadpotential.py:148-245``. All of the
    reference's mutable attributes are pytree leaves; the window swap is a
    data-dependent ``where`` instead of Python control flow, so the update
    is scan/vmap/pjit-compatible.
    """

    var: jax.Array  # inverse-mass diagonal (the sample variance)
    stds: jax.Array
    inv_stds: jax.Array
    fg: WelfordVariance
    bg: WelfordVariance
    n_samples: jax.Array  # int32 scalar
    window: jax.Array  # int32 scalar, current adaptation window
    window_multiplier: float = struct.field(pytree_node=False, default=1.0)

    @classmethod
    def create(
        cls,
        n: int,
        initial_mean=None,
        initial_diag=None,
        initial_weight: float = 0.0,
        adaptation_window: int = 101,
        adaptation_window_multiplier: float = 1.0,
        dtype=jnp.float32,
    ) -> "QuadPotentialDiagAdapt":
        if initial_mean is None:
            initial_mean = jnp.zeros(n, dtype)
        if initial_diag is None:
            # Reference defaults to identity with weight 1 (quadpotential.py:178-180).
            initial_diag = jnp.ones(n, dtype)
            initial_weight = 1.0
        initial_diag = jnp.asarray(initial_diag, dtype)
        fg = WelfordVariance.create(n, initial_mean, initial_diag, initial_weight, dtype)
        bg = WelfordVariance.create(n, dtype=dtype)
        return cls(
            var=initial_diag,
            stds=jnp.sqrt(initial_diag),
            inv_stds=1.0 / jnp.sqrt(initial_diag),
            fg=fg,
            bg=bg,
            n_samples=jnp.asarray(0, jnp.int32),
            window=jnp.asarray(adaptation_window, jnp.int32),
            window_multiplier=float(adaptation_window_multiplier),
        )

    def velocity(self, p: jax.Array) -> jax.Array:
        return self.var * p

    def kinetic(self, p: jax.Array, velocity: Optional[jax.Array] = None) -> jax.Array:
        if velocity is None:
            velocity = self.velocity(p)
        return 0.5 * jnp.dot(p, velocity)

    def sample_momentum(self, key: jax.Array) -> jax.Array:
        vals = jax.random.normal(key, self.stds.shape, self.stds.dtype)
        return self.inv_stds * vals

    def update(self, sample: jax.Array, grad: jax.Array, tuning) -> "QuadPotentialDiagAdapt":
        """One adaptation step (no-op when ``tuning`` is False).

        Order matches reference ``quadpotential.py:231-245``: add sample to
        both windows, refresh the metric from the foreground, then swap
        windows when ``n_samples % window == 0``.
        """
        fg = self.fg.add_sample(sample)
        bg = self.bg.add_sample(sample)
        var = fg.current_variance()
        stds = jnp.sqrt(var)

        swap = (self.n_samples > 0) & (jnp.mod(self.n_samples, self.window) == 0)
        fresh = WelfordVariance.create(self.var.shape[0], dtype=self.var.dtype)
        new_fg = tree_select(swap, bg, fg)
        new_bg = tree_select(swap, fresh, bg)
        new_window = jnp.where(
            swap,
            (self.window.astype(jnp.float32) * self.window_multiplier).astype(jnp.int32),
            self.window,
        )

        updated = QuadPotentialDiagAdapt(
            var=var,
            stds=stds,
            inv_stds=1.0 / stds,
            fg=new_fg,
            bg=new_bg,
            n_samples=self.n_samples + 1,
            window=new_window,
            window_multiplier=self.window_multiplier,
        )
        return tree_select(tuning, updated, self)

    def raise_ok(self) -> None:
        """Host-side check mirroring reference ``quadpotential.py:247-291``."""
        stds = np.asarray(jax.device_get(self.stds))
        if np.any(stds == 0):
            index = np.where(stds == 0)[0]
            raise ValueError(
                "Mass matrix contains zeros on the diagonal.\n"
                + "\n".join(f"The derivative of RV ravel()[{i}] is zero." for i in index)
            )
        if np.any(~np.isfinite(stds)):
            index = np.where(~np.isfinite(stds))[0]
            raise ValueError(
                "Mass matrix contains non-finite values on the diagonal.\n"
                + "\n".join(f"The derivative of RV ravel()[{i}] is non-finite." for i in index)
            )


@struct.dataclass
class QuadPotentialFullAdapt:
    """Dense metric adapted from sample covariances (Stan-style).

    Functional rewrite of reference ``quadpotential.py:471-555``. The
    Cholesky refresh runs every ``update_window`` tuning steps; a failed
    (non-finite) factorization keeps the previous factor and latches
    ``chol_failed`` — the functional analogue of the reference's deferred
    ``_chol_error`` (``quadpotential.py:521-526,557-560``).
    """

    cov: jax.Array
    chol: jax.Array
    chol_failed: jax.Array  # bool scalar
    fg: WelfordCovariance
    bg: WelfordCovariance
    n_samples: jax.Array  # int32
    prev_update: jax.Array  # int32
    window: jax.Array  # int32, doubles each swap
    window_multiplier: float = struct.field(pytree_node=False, default=2.0)
    update_window: int = struct.field(pytree_node=False, default=1)
    regularize: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(
        cls,
        n: int,
        initial_mean=None,
        initial_cov=None,
        initial_weight: float = 0.0,
        adaptation_window: int = 101,
        adaptation_window_multiplier: float = 2.0,
        update_window: int = 1,
        regularize: bool = True,
        dtype=jnp.float32,
    ) -> "QuadPotentialFullAdapt":
        if initial_mean is None:
            initial_mean = jnp.zeros(n, dtype)
        if initial_cov is None:
            initial_cov = jnp.eye(n, dtype=dtype)
            initial_weight = 1.0
        initial_cov = jnp.asarray(initial_cov, dtype)
        fg = WelfordCovariance.create(n, initial_mean, initial_cov, initial_weight, dtype)
        bg = WelfordCovariance.create(n, dtype=dtype)
        return cls(
            cov=initial_cov,
            chol=jnp.linalg.cholesky(initial_cov),
            chol_failed=jnp.asarray(False),
            fg=fg,
            bg=bg,
            n_samples=jnp.asarray(0, jnp.int32),
            prev_update=jnp.asarray(0, jnp.int32),
            window=jnp.asarray(adaptation_window, jnp.int32),
            window_multiplier=float(adaptation_window_multiplier),
            update_window=int(update_window),
            regularize=bool(regularize),
        )

    def velocity(self, p: jax.Array) -> jax.Array:
        # exact-f32: bf16 MXU inputs bias the sampled density (the kinetic
        # energy would no longer match the momentum-sampling density)
        return jnp.dot(self.cov, p, precision="highest",
                       preferred_element_type=self.cov.dtype)

    def kinetic(self, p: jax.Array, velocity: Optional[jax.Array] = None) -> jax.Array:
        if velocity is None:
            velocity = self.velocity(p)
        return 0.5 * jnp.dot(p, velocity)

    def sample_momentum(self, key: jax.Array) -> jax.Array:
        n = jax.random.normal(key, (self.cov.shape[0],), self.cov.dtype)
        return jax.scipy.linalg.solve_triangular(self.chol.T, n, lower=False)

    def update(self, sample: jax.Array, grad: jax.Array, tuning) -> "QuadPotentialFullAdapt":
        """One adaptation step, matching reference ``quadpotential.py:528-555``."""
        delta = self.n_samples - self.prev_update
        fg = self.fg.add_sample(sample)
        bg = self.bg.add_sample(sample)

        do_refresh = jnp.mod(delta + 1, self.update_window) == 0
        cov_new = fg.current_covariance()
        if self.regularize:
            # Stan-style shrinkage toward a small diagonal prior
            # (stan::mcmc::covar_adaptation): with w draws in the window,
            #   cov <- w/(w+5) * cov + 1e-3 * 5/(w+5) * I.
            # The reference reproduces Stan's *estimator* but drops this
            # regularization (quadpotential.py:471-560); at ndim ~ window
            # size the raw sample covariance is near-singular and per-chain
            # adapted runs ship visibly overdispersed posteriors.
            w = fg.n_samples
            shrink = w / (w + 5.0)
            eye = jnp.eye(cov_new.shape[0], dtype=cov_new.dtype)
            cov_new = shrink * cov_new + (1e-3 * (1.0 - shrink)) * eye
        chol_new = jnp.linalg.cholesky(cov_new)
        chol_ok = jnp.all(jnp.isfinite(chol_new))
        cov = jnp.where(do_refresh, cov_new, self.cov)
        chol = jnp.where(do_refresh & chol_ok, chol_new, self.chol)
        chol_failed = self.chol_failed | (do_refresh & ~chol_ok)

        swap = delta >= self.window
        fresh = WelfordCovariance.create(self.cov.shape[0], dtype=self.cov.dtype)
        new_fg = tree_select(swap, bg, fg)
        new_bg = tree_select(swap, fresh, bg)
        prev_update = jnp.where(swap, self.n_samples, self.prev_update)
        window = jnp.where(
            swap,
            (self.window.astype(jnp.float32) * self.window_multiplier).astype(jnp.int32),
            self.window,
        )

        updated = QuadPotentialFullAdapt(
            cov=cov,
            chol=chol,
            chol_failed=chol_failed,
            fg=new_fg,
            bg=new_bg,
            n_samples=self.n_samples + 1,
            prev_update=prev_update,
            window=window,
            window_multiplier=self.window_multiplier,
            update_window=self.update_window,
            regularize=self.regularize,
        )
        return tree_select(tuning, updated, self)

    def raise_ok(self) -> None:
        if bool(jax.device_get(jnp.any(self.chol_failed))):
            raise ValueError("Cholesky factorization of the adapted mass matrix failed.")


Potential = Union[
    QuadPotentialDiag,
    QuadPotentialFull,
    QuadPotentialFullInv,
    QuadPotentialDiagAdapt,
    QuadPotentialFullAdapt,
]


def quad_potential(C, is_cov: bool) -> Potential:
    """Build a static metric from a scaling vector/matrix.

    Mirrors reference ``quadpotential.py:33-65`` minus the (broken) sparse
    branch: a 1-D ``C`` is a diagonal, 2-D is dense; ``is_cov`` selects
    covariance vs precision parameterization.
    """
    if type(C).__module__.startswith("scipy.sparse"):
        # The reference's sparse branch is dead code (it references an
        # undefined QuadPotentialSparse, ``quadpotential.py:49-53``);
        # sparse metrics are explicitly unsupported here.
        raise ValueError("Sparse scaling matrices are not supported.")
    C = jnp.asarray(C)
    partial_check_positive_definite(C)
    if C.ndim == 1:
        return QuadPotentialDiag.create(C if is_cov else 1.0 / C)
    if is_cov:
        return QuadPotentialFull.create(C)
    return QuadPotentialFullInv.create(C)


def isquadpotential(value) -> bool:
    """Check whether an object is one of the metric pytrees."""
    return isinstance(
        value,
        (
            QuadPotentialDiag,
            QuadPotentialFull,
            QuadPotentialFullInv,
            QuadPotentialDiagAdapt,
            QuadPotentialFullAdapt,
        ),
    )
