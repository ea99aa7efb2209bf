"""Auto-lowering of arbitrary JAX models into the Pallas trajectory kernel.

The reference's whole premise is "bring your own logp"
(``/root/reference/docs/tutorials/quickstart.rst:37-49``): the user hands
``sample()`` a callable and the library supplies the sampler. The
whole-trajectory Pallas kernel (:mod:`.nuts_trajectory_pallas`) inlines
the model into the kernel body, which round 1 only wired up for the
built-in model zoo (hand-written padded-width model fns). This module
closes that gap: :func:`make_pallas_model_spec` turns *any* traceable
JAX ``logp_dlogp_func`` / ``logp_fn`` into a
:class:`~.nuts_trajectory_pallas.PallasModelSpec`, and
:func:`probe_spec` compile-checks the model body through Mosaic in well
under a second so ``sample()`` can fall back to the XLA tree (with a log
line) when the model contains something Mosaic cannot lower.

How it works:

1. The per-chain function is traced once with ``jax.make_jaxpr`` at
   shape ``(ndim,)``. Closure-captured arrays (data matrices, observed
   vectors, hyperparameters) surface as jaxpr *consts* — Pallas kernels
   cannot close over traced arrays ("captures constants" error), so the
   consts are extracted here and become VMEM-resident kernel inputs via
   the spec's ``consts`` mechanism. 0-d/1-d consts are reshaped to 2-d
   (Mosaic vectors are sublane x lane) and restored inside the kernel.
2. Inside the kernel the jaxpr is replayed under ``jax.vmap`` over the
   chain-block rows of the padded state: per-sample rank-1 intermediates
   become rank-2 batched ops, which is exactly what Mosaic wants.
3. Before differentiation, the traced jaxpr is replayed through
   :func:`stable_substitute`: ``custom_jvp_call`` eqns that are
   *semantically verified* to compute ``logaddexp`` (which also covers
   ``jax.nn.softplus`` and ``log_sigmoid`` — both reduce to it) are
   replaced by algebraically identical numerically-stable forms, because
   the originals carry custom-JVP residual computations whose
   transposed/select-heavy VJPs crash the Mosaic compiler (measured on
   v5e, jax 0.9). The rewrite touches only this trace's jaxpr — no
   module globals, safe under concurrent tracing from other threads.

4. The batched jaxpr is replayed inside the kernel through a small
   rewriting interpreter (:func:`_replay`) that fixes two measured
   Mosaic crashes (v5e, jax 0.9): ``transpose`` of boolean arrays
   (``vmap`` inserts them to reconcile batch dims around ``select_n``;
   rewritten to an f32 transpose plus a compare) and rank-1
   ``dot_general`` with ``([0], [0])`` contractions (produced by
   input-independent cotangents; the emitted
   ``#tpu.dot_dimension_numbers`` attribute fails to parse — rewritten
   to a rank-2 NN matmul plus reshape).

5. Group-indexed models — the hierarchical random-intercept shape that
   dominates real Bayesian workloads (``theta[groups]`` gathers,
   ``segment_sum`` scatter-adds) — are rewritten into one-hot indicator
   **matmuls** (``operand @ onehot.T`` / ``updates @ onehot``): Mosaic
   has no gather/scatter lowering for dynamic lane indexing, but an
   indicator contraction is exactly what the MXU is for. The indicator
   is built on-core from ``broadcasted_iota`` + compare, and the dots
   run at ``Precision.HIGHEST`` so the rewrite is bit-faithful for
   in-bounds indices (one-hot products are exact in the bf16x3+
   decomposition).

Not every model lowers (e.g. host callbacks via
:func:`littlemcmc_tpu.model.from_numpy_callable`, or gathers with
batched/multi-axis index vectors beyond the forms below). That is what
the probe is for: lowering is attempted against the real backend on a
tiny block and any failure selects the XLA tree instead.
"""

from __future__ import annotations

import functools
import logging
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .nuts_trajectory_pallas import PallasModelSpec, padded_dim

__all__ = ["make_pallas_model_spec", "probe_spec", "stable_substitute"]

_log = logging.getLogger("littlemcmc_tpu")

from jax.core import eval_jaxpr as _eval_jaxpr
from jax.extend.core import Literal as _Literal

# Call-like primitives whose inner jaxpr the rewriting interpreter must
# recurse into (a bool transpose hiding inside a pjit would otherwise
# reach Mosaic unrewritten).
_CALL_PRIMS = ("pjit", "jit", "closed_call", "core_call", "custom_jvp_call",
               "custom_vjp_call", "custom_vjp_call_jaxpr", "remat", "checkpoint")


def _inner_closed_jaxpr(eqn):
    for key in ("jaxpr", "call_jaxpr"):
        inner = eqn.params.get(key)
        if inner is not None:
            return inner
    return None


def _safe_dot_general(a, b, *, dimension_numbers, **params):
    """dot_general with the rank-1 ([0],[0]) contraction rewritten.

    Mosaic (v5e, jax 0.9) fails to parse the ``#tpu.dot_dimension_numbers``
    attribute it emits for a rank-1 lhs contracted on dim 0 (seen for
    cotangents that do not depend on the batched input, e.g. the grad of
    ``sum(X @ b)``). Promote to a rank-2 NN matmul and squeeze.

    The user's own ``precision`` setting is preserved (the XLA tree path
    evaluates the same function with the same setting, so the two paths
    sample the same density). Models sensitive to bf16 MXU inputs should
    request ``precision="highest"`` in their own dots — see NOTES.md on
    the measured 7% variance bias.
    """
    import jax.lax as lax

    (lc, rc), (lb, rb) = dimension_numbers
    # The rewritten rank-1 dots are forced to exact f32: XLA evaluates
    # rank-1 contractions as exact multiply-reduces even at default
    # precision, while the Mosaic MXU truncates their inputs to bf16 —
    # measured 5e-2 relative gradient error on constant-cotangent grads
    # (e.g. grad of sum(y * (X @ b))). They are tiny, so this is free.
    exact = dict(params, precision=lax.Precision.HIGHEST)
    if a.ndim == 1 and not lb and tuple(lc) == (0,):
        out = lax.dot_general(
            a.reshape(1, a.shape[0]), b,
            dimension_numbers=(((1,), tuple(rc)), ((), ())), **exact)
        return out.reshape(out.shape[1:])
    if b.ndim == 1 and not rb and tuple(rc) == (0,):
        out = lax.dot_general(
            a, b.reshape(b.shape[0], 1),
            dimension_numbers=((tuple(lc), (0,)), ((), ())), **exact)
        return out.reshape(out.shape[:-1])
    return lax.dot_general(a, b, dimension_numbers=dimension_numbers, **params)


def _onehot(idx, n: int, dtype):
    """(m, n) indicator matrix from an (m,) or (m, 1) integer vector.

    Built from ``broadcasted_iota`` + compare + ``where`` — all of which
    Mosaic lowers — instead of any dynamic-index op. Out-of-bounds rows
    are all-zero (callers only see in-bounds indices: the traced index
    arrays are closure constants, and :func:`probe_spec` value-checks
    the whole model against the XLA evaluation anyway).
    """
    import jax.lax as lax

    idx2 = idx.reshape(idx.shape[0], 1).astype(jnp.int32)
    iota = lax.broadcasted_iota(jnp.int32, (idx.shape[0], n), 1)
    return jnp.where(iota == idx2, jnp.asarray(1, dtype), jnp.asarray(0, dtype))


def _dot_exact(a, b):
    import jax.lax as lax

    # one-hot contractions must be exact: a bf16-truncated operand would
    # corrupt the gathered values themselves, not just round a sum
    return _safe_dot_general(
        a, b, dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST)


def _rewrite_gather(operand, indices, params):
    """Gathers-of-full-slices as one-hot matmuls; None if unsupported.

    Covers every form ``jax.vmap`` produces for ``theta[groups]`` /
    ``jnp.take(x, idx, axis=...)`` on rank<=2 operands with a single
    static index vector — the hierarchical-model shapes. Output equals
    ``jnp.take`` for in-bounds indices.
    """
    dn = params["dimension_numbers"]
    ss = tuple(params["slice_sizes"])
    if (dn.operand_batching_dims or dn.start_indices_batching_dims
            or indices.ndim != 2 or indices.shape[1] != 1
            or len(dn.start_index_map) != 1):
        return None
    axis = int(dn.start_index_map[0])
    if tuple(dn.collapsed_slice_dims) != (axis,):
        return None
    # full slices on every non-indexed dim
    if any(ss[d] != operand.shape[d] for d in range(operand.ndim) if d != axis) \
            or ss[axis] != 1:
        return None
    oh = _onehot(indices, operand.shape[axis], operand.dtype)  # (m, n_axis)
    off = tuple(dn.offset_dims)
    if operand.ndim == 1:                       # v[idx] -> (m,)
        return _dot_exact(oh, operand) if off == () else None
    if operand.ndim == 2 and axis == 1 and off == (0,):
        return _dot_exact(operand, oh.T)        # (B, n)[:, idx] -> (B, m)
    if operand.ndim == 2 and axis == 0 and off == (1,):
        return _dot_exact(oh, operand)          # (k, p)[idx, :] -> (m, p)
    return None


def _rewrite_scatter_add(operand, indices, updates, params):
    """The matching scatter-adds (gather VJPs, ``segment_sum``)."""
    dn = params["dimension_numbers"]
    if (dn.operand_batching_dims or dn.scatter_indices_batching_dims
            or indices.ndim != 2 or indices.shape[1] != 1
            or len(dn.scatter_dims_to_operand_dims) != 1):
        return None
    axis = int(dn.scatter_dims_to_operand_dims[0])
    if tuple(dn.inserted_window_dims) != (axis,):
        return None
    oh = _onehot(indices, operand.shape[axis], operand.dtype)  # (m, n_axis)
    uwd = tuple(dn.update_window_dims)
    if operand.ndim == 1 and uwd == ():         # segment_sum -> (n,)
        return operand + _dot_exact(updates, oh)
    if operand.ndim == 2 and axis == 1 and uwd == (0,):
        return operand + _dot_exact(updates, oh)   # (B, m) -> (B, n)
    if operand.ndim == 2 and axis == 0 and uwd == (1,):
        return operand + _dot_exact(oh.T, updates)  # (m, p) -> (k, p)
    return None


def _replay(jaxpr, consts, *args):
    """Replay a jaxpr with Mosaic-friendly rewrites of known-bad eqns."""
    import jax.lax as lax

    env = {}

    def read(v):
        return v.val if isinstance(v, _Literal) else env[v]

    for v, c in zip(jaxpr.constvars, consts):
        env[v] = c
    for v, a in zip(jaxpr.invars, args):
        env[v] = a
    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        name = eqn.primitive.name
        inner = _inner_closed_jaxpr(eqn) if name in _CALL_PRIMS else None
        if inner is not None:
            n_explicit = len(inner.jaxpr.invars)
            outs = _replay(inner.jaxpr, inner.consts, *invals[:n_explicit])
        elif name == "transpose" and invals[0].dtype == jnp.bool_:
            ft = lax.transpose(invals[0].astype(jnp.float32),
                               eqn.params["permutation"])
            outs = [ft > 0.5]
        elif name == "dot_general":
            outs = [_safe_dot_general(invals[0], invals[1], **eqn.params)]
        elif name == "gather":
            out = _rewrite_gather(invals[0], invals[1], eqn.params)
            outs = [out] if out is not None else [
                eqn.primitive.bind(*invals, **eqn.params)]
        elif name == "scatter-add":
            out = _rewrite_scatter_add(invals[0], invals[1], invals[2],
                                       eqn.params)
            outs = [out] if out is not None else [
                eqn.primitive.bind(*invals, **eqn.params)]
        else:
            outs = eqn.primitive.bind(*invals, **eqn.params)
            if not eqn.primitive.multiple_results:
                outs = [outs]
        if not isinstance(outs, (list, tuple)):
            outs = [outs]
        for v, o in zip(eqn.outvars, outs):
            env[v] = o
    return [read(v) for v in jaxpr.outvars]


def _stable_logaddexp(a, b):
    """``logaddexp`` with plain-op VJP, exact gradients everywhere.

    The shift is ``stop_gradient(max(a, b))`` — it cancels
    mathematically, so ``d/da log(exp(a-s) + exp(b-s))`` is the exact
    softmax weight ``exp(a-m)/(exp(a-m)+exp(b-m))`` *including at ties*
    (a ``max``/``abs`` formulation picks a subgradient at ``a == b``
    where the true function is smooth). Infinity corners are guarded:
    ``a - s`` would be NaN at ``(-inf, -inf)`` / ``(inf, inf)``, but the
    result is just ``m`` there (matches ``jnp.logaddexp``), and the
    unselected branch's log argument is pinned to 1 so no NaN reaches
    the VJP.
    """
    import jax.lax as lax

    m = jnp.maximum(a, b)
    inf = jnp.isinf(m)
    shift = lax.stop_gradient(jnp.where(inf, 0.0, m))
    s = jnp.exp(a - shift) + jnp.exp(b - shift)
    return jnp.where(inf, m, shift + jnp.log(jnp.where(inf, 1.0, s)))


def _is_logaddexp_call(eqn) -> bool:
    """True iff a ``custom_jvp_call`` eqn computes ``logaddexp``.

    Matched *semantically*, not by eqn-pattern: the primal ``call_jaxpr``
    is evaluated concretely on probe values spanning the function's
    branch regimes (small / moderate / large ``|a - b|`` and the equal
    case) and compared against ``np.logaddexp``. This is what makes the
    substitution robust across JAX versions — and it matches every
    carrier of the measured Mosaic-hostile custom-JVP residuals at once,
    since ``jax.nn.softplus(x)`` traces to ``logaddexp(x, 0)`` and
    ``jax.nn.log_sigmoid(x)`` to ``-softplus(-x)``.
    """
    if eqn.primitive.name != "custom_jvp_call" or len(eqn.outvars) != 1:
        return False
    if eqn.params.get("num_consts", 0) or len(eqn.invars) != 2:
        return False
    inner = _inner_closed_jaxpr(eqn)
    if inner is None:
        return False
    avals = [v.aval for v in eqn.invars]
    if any(not jnp.issubdtype(a.dtype, jnp.floating) for a in avals):
        return False
    try:
        # The replay runs under an active trace, where primitive binds
        # stage instead of evaluating; ensure_compile_time_eval makes
        # this probe evaluation concrete (and keeps its values out of
        # the traced jaxpr).
        rng = np.random.RandomState(0)
        with jax.ensure_compile_time_eval():
            for scale in (0.5, 5.0, 50.0, 0.0):
                vals = [np.asarray(rng.randn(*a.shape) * scale, a.dtype)
                        for a in avals]
                out = _eval_jaxpr(inner.jaxpr, inner.consts, *vals)
                ref = np.logaddexp(*vals)
                got = np.asarray(out[0])
                # identification tolerance, not a precision gate: any
                # non-logaddexp differs at O(1), while backend
                # transcendentals legitimately differ from float64
                # numpy by ~1e-4 in f32 (measured 6.3e-5 on the v5e —
                # the tighter round-3 gate silently disabled the
                # substitution on TPU, the one backend it exists for)
                if (len(out) != 1 or got.shape != ref.shape
                        or not np.allclose(got, ref, rtol=1e-4, atol=2e-4)):
                    return False
    except Exception:
        return False
    return True


# Scopes the substitution replay descends into looking for logaddexp
# calls (jax.nn.softplus / log_sigmoid wrap theirs in named jit scopes).
# custom_jvp/vjp/remat are deliberately NOT recursed pre-differentiation:
# inlining them would discard user autodiff rules and remat policies, so
# unmatched ones are re-bound verbatim via ``get_bind_params``.
_TRANSPARENT_CALL_PRIMS = ("pjit", "jit", "closed_call", "core_call")


def _replay_substituting(jaxpr, consts, *args):
    """Replay a jaxpr, substituting logaddexp custom-JVP calls.

    Pre-differentiation counterpart of :func:`_replay`: run *before*
    ``jax.value_and_grad`` so the stable form's plain-op VJP is what gets
    differentiated, replacing the measured Mosaic-hostile custom-JVP
    residuals of ``logaddexp`` / ``softplus`` / ``log_sigmoid`` (v5e,
    jax 0.9). Context-safe by construction — rewrites this trace's jaxpr
    only, no module globals (the round-2 ``mosaic_friendly_calls``
    monkey-patches this replaces leaked the swap to concurrent traces in
    other threads).
    """
    env = {}

    def read(v):
        return v.val if isinstance(v, _Literal) else env[v]

    for v, c in zip(jaxpr.constvars, consts):
        env[v] = c
    for v, a in zip(jaxpr.invars, args):
        env[v] = a
    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        name = eqn.primitive.name
        inner = (_inner_closed_jaxpr(eqn)
                 if name in _TRANSPARENT_CALL_PRIMS else None)
        if inner is not None:
            n_explicit = len(inner.jaxpr.invars)
            outs = _replay_substituting(inner.jaxpr, inner.consts,
                                        *invals[:n_explicit])
        elif _is_logaddexp_call(eqn):
            outs = [_stable_logaddexp(*invals)]
        else:
            subfuns, bind_params = eqn.primitive.get_bind_params(eqn.params)
            outs = eqn.primitive.bind(*subfuns, *invals, **bind_params)
            if not eqn.primitive.multiple_results:
                outs = [outs]
        for v, o in zip(eqn.outvars, outs):
            env[v] = o
    return [read(v) for v in jaxpr.outvars]


def stable_substitute(fn: Callable, ndim: int, dtype=jnp.float32) -> Callable:
    """Value-identical wrapper of ``fn`` with stable logaddexp forms.

    Traces ``fn`` once at shape ``(ndim,)`` and returns a callable that
    replays the jaxpr with every (semantically verified) ``logaddexp``
    custom-JVP call — including those inside ``jax.nn.softplus`` /
    ``log_sigmoid`` — replaced by an algebraically identical form whose
    VJP is plain exp/select ops that Mosaic lowers. Other custom-JVP/VJP
    rules and remat policies are preserved verbatim. Thread-safe: no
    module state is touched.
    """
    closed0 = jax.make_jaxpr(fn)(jax.ShapeDtypeStruct((int(ndim),), dtype))

    def substituted(q):
        outs = _replay_substituting(closed0.jaxpr, closed0.consts, q)
        return outs[0] if len(outs) == 1 else tuple(outs)

    return substituted


def _const_to_2d(c: jax.Array) -> jax.Array:
    c = jnp.asarray(c)
    if c.ndim == 0:
        return c.reshape(1, 1)
    if c.ndim == 1:
        return c.reshape(1, c.shape[0])
    return c


def make_pallas_model_spec(
    logp_dlogp_func: Optional[Callable] = None,
    ndim: Optional[int] = None,
    *,
    logp_fn: Optional[Callable] = None,
    dtype=jnp.float32,
    stable_swaps: bool = True,
) -> PallasModelSpec:
    """Build a :class:`PallasModelSpec` from an arbitrary JAX model.

    Parameters mirror the ``sample()`` model contract (reference
    ``sampling.py:35-53``): give either ``logp_dlogp_func(q) -> (logp,
    grad)`` or a scalar ``logp_fn(q)`` (differentiated with
    ``jax.value_and_grad``), plus ``ndim``. The function must be
    traceable pure JAX (host callbacks cannot be inlined into a TPU
    kernel — :func:`probe_spec` will reject them).

    The returned spec is *unprobed*: pass it through :func:`probe_spec`
    (or let ``sample()`` do it) before relying on it, since not every
    model body survives Mosaic lowering.
    """
    if (logp_dlogp_func is None) == (logp_fn is None):
        raise ValueError("provide exactly one of logp_dlogp_func / logp_fn")
    if ndim is None:
        raise ValueError("ndim is required")
    ndim = int(ndim)

    # ``stable_swaps=True`` (default): substitute logaddexp-family
    # custom-JVP calls at the jaxpr level via :func:`stable_substitute`.
    # For ``logp_fn`` the substitution runs BEFORE value_and_grad, so the
    # stable form's plain-op VJP is what gets differentiated. For a
    # user-supplied pair fn, any *internal* jax.grad already ran inside
    # the user's code, so only primal calls can be substituted; if the
    # baked-in custom-JVP residuals don't survive Mosaic, probe_spec
    # falls back to the XLA tree (logged). ``stable_swaps=False`` skips
    # substitution and relies on _replay's kernel-level rewrites alone
    # (the bool-transpose and rank-1-dot fixes may subsume it —
    # TPU-verifiable via tests/test_autospec.py's no-swaps probe).
    if logp_fn is not None:
        base = (stable_substitute(logp_fn, ndim, dtype) if stable_swaps
                else logp_fn)
        fn0 = jax.value_and_grad(base)
    else:
        fn0 = (stable_substitute(logp_dlogp_func, ndim, dtype)
               if stable_swaps else logp_dlogp_func)
    closed = jax.make_jaxpr(fn0)(jax.ShapeDtypeStruct((ndim,), dtype))
    out_avals = closed.out_avals
    if (
        len(out_avals) != 2
        or out_avals[0].shape != ()
        or out_avals[1].shape != (ndim,)
    ):
        raise ValueError(
            "logp_dlogp_func must map (ndim,) -> (scalar logp, (ndim,) grad); "
            f"traced output shapes were {[a.shape for a in out_avals]}"
        )
    const_shapes = [np.shape(c) for c in closed.consts]
    const_dtypes = [jnp.asarray(c).dtype for c in closed.consts]
    consts2d = tuple(_const_to_2d(c) for c in closed.consts)
    jaxpr = closed.jaxpr
    npad = padded_dim(ndim)

    # Consts become explicit args of the batched jaxpr (traced per chain
    # block below), so the batched trace captures nothing.
    def f_pure(q, *cs):
        return _eval_jaxpr(jaxpr, cs, q)

    batched_cache: dict = {}

    def _batched_jaxpr(cb: int):
        if cb not in batched_cache:
            closed_b = jax.make_jaxpr(
                jax.vmap(f_pure, in_axes=(0,) + (None,) * len(const_shapes))
            )(
                jax.ShapeDtypeStruct((cb, ndim), dtype),
                *[jax.ShapeDtypeStruct(s, d)
                  for s, d in zip(const_shapes, const_dtypes)],
            )
            batched_cache[cb] = closed_b
        return batched_cache[cb]

    def fn(q_pad, *cs2d):
        cs = [c.reshape(s) for c, s in zip(cs2d, const_shapes)]
        closed_b = _batched_jaxpr(q_pad.shape[0])
        lp, g = _replay(closed_b.jaxpr, closed_b.consts,
                        q_pad[:, :ndim], *cs)
        # widen the gradient back to the kernel's padded lane width; the
        # kernel masks the padding columns, so zeros are just convention
        return lp[:, None], jnp.pad(g, ((0, 0), (0, npad - ndim)))

    return PallasModelSpec(fn, consts2d, ndim)


def probe_spec(spec: PallasModelSpec, chain_block: int = 8) -> bool:
    """Compile-and-run the spec's model body through Mosaic; True iff ok.

    Wraps ``spec.fn`` in a minimal ``pallas_call`` (no trajectory
    machinery — that part is known-good) on the default backend and
    checks the computed ``(logp, grad)`` against a plain-XLA replay of
    the same function on random inputs. Runs in ~0.5 s on TPU; any
    Mosaic lowering error, compile crash, or numerical mismatch returns
    False (callers fall back to the XLA tree).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = spec.ndim
    npad = padded_dim(n)
    cb = int(chain_block)
    consts = spec.consts

    def kernel(q_ref, *rest):
        const_refs = rest[: len(consts)]
        lp_ref, g_ref = rest[len(consts):]
        cs = tuple(r[:] for r in const_refs)
        lp, g = spec.fn(q_ref[:], *cs)
        lp_ref[:] = jnp.broadcast_to(lp, (cb, npad))
        g_ref[:] = g

    q = np.zeros((cb, npad), np.float32)
    # Probe rows span three input scales (0.1 / 1 / 5): a model whose
    # branches (jnp.where regimes, clipping, tail approximations) only
    # activate away from the origin must match the XLA evaluation there
    # too before the lowered kernel is trusted.
    q[:, :n] = np.random.RandomState(0).randn(cb, n)
    scales = np.asarray([0.1, 1.0, 5.0], np.float32)
    q[:, :n] *= scales[np.arange(cb) % scales.size, None]
    qd = jnp.asarray(q)
    try:
        lp, g = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(consts)),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((cb, npad), jnp.float32)] * 2,
        )(qd, *consts)
        lp_ref, g_ref = jax.jit(spec.fn)(qd, *consts)
        lp, g, lp_ref, g_ref = jax.device_get((lp, g, lp_ref, g_ref))
    except Exception as e:  # Mosaic lowering/compile errors are varied
        _log.info("Pallas model probe failed (%s); using the XLA tree.",
                  type(e).__name__)
        _log.debug("Pallas model probe failure detail: %s", e)
        return False
    # Tolerances allow for Mosaic-vs-XLA default matmul precision
    # differences (~1e-3 relative on f32 inputs); logic errors are gross.
    if not (
        np.allclose(lp[:, :1], lp_ref[:, :1], rtol=5e-3, atol=1e-3)
        and np.allclose(g[:, :n], g_ref[:, :n], rtol=5e-3, atol=1e-3)
    ):
        _log.warning(
            "Pallas model probe produced values diverging from the XLA "
            "evaluation; using the XLA tree."
        )
        return False
    return True


# sample()'s auto-selection cache: one probe per (model callable, ndim).
# Small on purpose: each entry pins the callable plus its extracted
# closure constants (device arrays) for the process lifetime. Define the
# model function once (not inside a loop) to actually hit this cache.
@functools.lru_cache(maxsize=8)
def _cached_auto_spec(user_fn, ndim: int, is_logp_only: bool):
    try:
        if is_logp_only:
            spec = make_pallas_model_spec(ndim=ndim, logp_fn=user_fn)
        else:
            spec = make_pallas_model_spec(user_fn, ndim)
    except Exception as e:
        _log.info("Model not auto-lowerable to the Pallas trajectory kernel "
                  "(%s); using the XLA tree.", type(e).__name__)
        _log.debug("Auto-lowering failure detail: %s", e)
        return None
    return spec if probe_spec(spec) else None


def try_auto_spec(user_fn, ndim: int, is_logp_only: bool = False):
    """Best-effort auto-lowered spec for ``sample()``; None on any failure.

    Memoized on the user callable so repeated ``sample()`` calls reuse
    the traced jaxpr and the probe verdict. Unhashable callables are
    probed once per call (no cache) rather than rejected.
    """
    try:
        return _cached_auto_spec(user_fn, int(ndim), bool(is_logp_only))
    except TypeError:  # unhashable callable
        try:
            if is_logp_only:
                spec = make_pallas_model_spec(ndim=ndim, logp_fn=user_fn)
            else:
                spec = make_pallas_model_spec(user_fn, ndim)
        except Exception:
            return None
        return spec if probe_spec(spec) else None
