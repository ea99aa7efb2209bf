"""No-U-Turn sampler as a fixed-shape, XLA-compilable transition kernel.

TPU-native re-architecture of the reference's recursive NUTS
(``littlemcmc/nuts.py``). The reference builds the binary trajectory tree
with Python recursion (``nuts.py:377-417``) and data-dependent early
returns; XLA cannot trace unbounded recursion, so here the same tree is
built *iteratively*:

- the outer tree-doubling loop (``nuts.py:212-217`` / ``extend`` at
  ``nuts.py:284-342``) is a ``lax.while_loop`` over tree depth;
- each subtree of ``2^depth`` leaves is built by a second
  ``lax.while_loop`` over leaves with an explicit merge *stack* of at most
  ``max_treedepth`` frames — a post-order traversal that replays the
  reference's recursion exactly: leaf ``i`` triggers one merge per
  trailing one-bit of ``i``, reproducing every internal node of
  ``_build_subtree`` (``nuts.py:377-417``) in the same order, with the
  same multinomial proposal swaps and the same 3-way generalized U-turn
  checks (``nuts.py:332-340, 389-398``);
- divergences (``|ΔE| ≥ Emax``, NaN ⇒ ∞; ``nuts.py:353-358``) and turning
  are boolean masks instead of exceptions.

Everything is fixed-shape, so the kernel can be ``vmap``-ed over thousands
of chains and sharded over a ``chains`` mesh axis. Under ``vmap`` the
while-loops run until the slowest lane finishes, with finished lanes
masked — the standard batched-NUTS execution model on accelerators.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .base import ChainState, NUTSConfig, finish_step, start_of_trajectory
from .integration import IntegratorState, leapfrog
from .math import logbern, logdiffexp

__all__ = ["NUTSConfig", "NUTSInfo", "build_nuts_kernel"]

LogpGradFn = Callable[[jax.Array], Tuple[jax.Array, jax.Array]]


class Proposal(NamedTuple):
    """Candidate next position (reference ``nuts.py:243``)."""

    q: jax.Array
    q_grad: jax.Array
    energy: jax.Array
    logp: jax.Array


class Boundary(NamedTuple):
    """Momentum/velocity at a subtree end — all the U-turn checks need.

    The reference stores full states at subtree boundaries
    (``nuts.py:246-248``); only ``p`` and ``v`` are ever read by the
    termination criterion, so the merge stack stores just these two
    vectors per end — ~35% less HBM traffic per merge at scale.
    """

    p: jax.Array
    v: jax.Array


class TreeNode(NamedTuple):
    """A completed subtree, boundaries in integration order (``nuts.py:246-248``)."""

    left: Boundary
    right: Boundary
    p_sum: jax.Array
    proposal: Proposal
    log_size: jax.Array
    log_weighted_accept_sum: jax.Array


class NUTSInfo(NamedTuple):
    """Per-draw sampler statistics; names match reference ``nuts.py:87-101``."""

    depth: jax.Array
    step_size: jax.Array
    tune: jax.Array
    mean_tree_accept: jax.Array
    step_size_bar: jax.Array
    tree_size: jax.Array
    diverging: jax.Array
    energy_error: jax.Array
    energy: jax.Array
    max_energy_error: jax.Array
    model_logp: jax.Array
    # Extra (not in the reference's stats dict): exact bookkeeping for the
    # TREEDEPTH warning, which the reference keeps as a mutable counter
    # (``nuts.py:218-220``).
    reached_max_treedepth: jax.Array


def _tree_select(pred, on_true, on_false):
    return jax.tree.map(lambda t, f: jnp.where(pred, t, f), on_true, on_false)


def _is_turning(p_sum: jax.Array, v_left: jax.Array, v_right: jax.Array) -> jax.Array:
    """Generalized U-turn criterion (reference ``nuts.py:335, 391``)."""
    return (jnp.dot(p_sum, v_left) <= 0) | (jnp.dot(p_sum, v_right) <= 0)


def _leaf_node(state: IntegratorState, energy_change: jax.Array) -> TreeNode:
    """Single-leapfrog subtree (reference ``_single_step``, ``nuts.py:359-368``)."""
    # log_p_accept_weighted = -ΔE + min(0, -ΔE): saturated Metropolis accept
    # probability with Boltzmann weight (``nuts.py:363``).
    lpaw = -energy_change + jnp.minimum(0.0, -energy_change)
    proposal = Proposal(state.q, state.q_grad, state.energy, state.model_logp)
    end = Boundary(state.p, state.v)
    return TreeNode(
        left=end,
        right=end,
        p_sum=state.p,
        proposal=proposal,
        log_size=-energy_change,
        log_weighted_accept_sum=lpaw,
    )


def _merge_nodes(
    key: jax.Array, t1: TreeNode, t2: TreeNode, check_extra: jax.Array
) -> Tuple[TreeNode, jax.Array]:
    """Merge two adjacent complete subtrees (integration order: t1 then t2).

    Replays one internal node of the reference recursion
    (``nuts.py:389-407``): full-span U-turn check, the two cross-subtree
    checks when both children have depth ≥ 1 (``check_extra``), log-space
    weight accumulation, and the multinomial proposal swap.
    """
    p_sum = t1.p_sum + t2.p_sum
    turning = _is_turning(p_sum, t1.left.v, t2.right.v)
    p_sum1 = t1.p_sum + t2.left.p
    turning1 = _is_turning(p_sum1, t1.left.v, t2.left.v)
    p_sum2 = t1.right.p + t2.p_sum
    turning2 = _is_turning(p_sum2, t1.right.v, t2.right.v)
    turning = turning | (check_extra & (turning1 | turning2))

    log_size = jnp.logaddexp(t1.log_size, t2.log_size)
    lwas = jnp.logaddexp(
        t1.log_weighted_accept_sum, t2.log_weighted_accept_sum
    )
    take2 = logbern(key, t2.log_size - log_size)
    proposal = _tree_select(take2, t2.proposal, t1.proposal)
    node = TreeNode(
        left=t1.left,
        right=t2.right,
        p_sum=p_sum,
        proposal=proposal,
        log_size=log_size,
        log_weighted_accept_sum=lwas,
    )
    return node, turning


class _SubtreeResult(NamedTuple):
    node: TreeNode
    end_state: IntegratorState  # full state at the integration-order far end
    n_leaves: jax.Array
    max_energy_change: jax.Array
    diverging: jax.Array
    turning: jax.Array


class _BuildCarry(NamedTuple):
    key: jax.Array
    leaf_idx: jax.Array
    cur: IntegratorState
    node: TreeNode
    stack: TreeNode  # each leaf has an extra leading dim of size max_treedepth
    height: jax.Array
    n_leaves: jax.Array
    max_energy_change: jax.Array
    diverging: jax.Array
    turning: jax.Array


def _build_subtree(
    key: jax.Array,
    edge: IntegratorState,
    depth: jax.Array,
    epsilon: jax.Array,
    start_energy: jax.Array,
    max_energy_change0: jax.Array,
    potential,
    logp_grad_fn: LogpGradFn,
    config: NUTSConfig,
) -> _SubtreeResult:
    """Build a complete subtree of ``2^depth`` leapfrog steps from ``edge``.

    Iterative equivalent of ``_Tree._build_subtree`` (``nuts.py:377-417``).
    On divergence or turning the build stops; per the reference's abort
    semantics, only ``n_leaves`` (the ``n_proposals`` count), the flags,
    and ``max_energy_change`` are meaningful to the caller in that case
    (``nuts.py:316-319``).
    """
    n_total = jnp.left_shift(jnp.asarray(1, jnp.int32), depth)
    # One extra "trash" slot: aborted iterations write there instead of
    # select-copying the whole stack, letting XLA update the stack buffer
    # in place inside the while loop.
    max_stack = config.max_treedepth
    trash = jnp.asarray(max_stack, jnp.int32)
    emax = jnp.asarray(config.Emax, edge.q.dtype)

    dummy_node = _leaf_node(edge, jnp.asarray(0.0, edge.energy.dtype))
    stack0 = jax.tree.map(
        lambda x: jnp.zeros((max_stack + 1,) + jnp.shape(x), jnp.asarray(x).dtype),
        dummy_node,
    )

    def push(stack, node, h):
        return jax.tree.map(
            lambda s, x: lax.dynamic_update_index_in_dim(s, x, h, 0), stack, node
        )

    def peek(stack, h):
        return jax.tree.map(lambda s: lax.dynamic_index_in_dim(s, h, 0, keepdims=False), stack)

    def cond(c: _BuildCarry):
        return (~c.diverging) & (~c.turning) & (c.leaf_idx < n_total)

    def body(c: _BuildCarry) -> _BuildCarry:
        new_state = leapfrog(potential, logp_grad_fn, epsilon, c.cur)
        energy_change = new_state.energy - start_energy
        energy_change = jnp.where(jnp.isnan(energy_change), jnp.inf, energy_change)
        mec = jnp.where(
            jnp.abs(energy_change) > jnp.abs(c.max_energy_change),
            energy_change,
            c.max_energy_change,
        )
        diverging = ~(jnp.abs(energy_change) < emax)
        n_leaves = c.n_leaves + 1

        leaf = _leaf_node(new_state, energy_change)

        # Merge once per trailing one-bit of leaf_idx: exactly the internal
        # nodes the reference recursion completes after this leaf. A
        # divergent leaf aborts before any merging (``nuts.py:379-383``).
        def merge_cond(mc):
            key_, j, node_, h, turning_ = mc
            more = jnp.bitwise_and(jnp.right_shift(c.leaf_idx, j), 1) == 1
            return (~turning_) & more

        def merge_body(mc):
            key_, j, node_, h, turning_ = mc
            key_, k_merge = jax.random.split(key_)
            t1 = peek(c.stack, h - 1)
            merged, turning_new = _merge_nodes(k_merge, t1, node_, check_extra=j >= 1)
            return (key_, j + 1, merged, h - 1, turning_new)

        key1, _, node, height, turning = lax.while_loop(
            merge_cond,
            merge_body,
            (c.key, jnp.where(diverging, 31, 0).astype(jnp.int32), leaf,
             c.height, jnp.asarray(False)),
        )
        # (j starts at 31 when diverging: leaf_idx >> 31 == 0, so no merges run.)
        turning = turning & ~diverging

        ok = (~diverging) & (~turning)
        stack = push(c.stack, node, jnp.where(ok, height, trash))
        height = jnp.where(ok, height + 1, c.height)

        return _BuildCarry(
            key=key1,
            leaf_idx=c.leaf_idx + 1,
            cur=new_state,
            node=node,
            stack=stack,
            height=height,
            n_leaves=n_leaves,
            max_energy_change=mec,
            diverging=diverging,
            turning=turning,
        )

    init = _BuildCarry(
        key=key,
        leaf_idx=jnp.asarray(0, jnp.int32),
        cur=edge,
        node=dummy_node,
        stack=stack0,
        height=jnp.asarray(0, jnp.int32),
        n_leaves=jnp.asarray(0, jnp.int32),
        max_energy_change=max_energy_change0,
        diverging=jnp.asarray(False),
        turning=jnp.asarray(False),
    )
    out = lax.while_loop(cond, body, init)

    # Clean completion leaves exactly one frame on the stack.
    final_node = peek(out.stack, jnp.maximum(out.height - 1, 0))
    return _SubtreeResult(
        node=final_node,
        end_state=out.cur,
        n_leaves=out.n_leaves,
        max_energy_change=out.max_energy_change,
        diverging=out.diverging,
        turning=out.turning,
    )


class _TreeCarry(NamedTuple):
    key: jax.Array
    left: IntegratorState
    right: IntegratorState
    p_sum: jax.Array
    proposal: Proposal
    log_size: jax.Array
    log_weighted_accept_sum: jax.Array
    depth: jax.Array
    n_proposals: jax.Array
    max_energy_change: jax.Array
    diverging: jax.Array
    turning: jax.Array


class TreeResult(NamedTuple):
    proposal: Proposal
    depth: jax.Array
    n_proposals: jax.Array
    mean_tree_accept: jax.Array
    max_energy_change: jax.Array
    diverging: jax.Array
    turning: jax.Array
    reached_max_treedepth: jax.Array


def run_nuts_tree(
    key: jax.Array,
    start: IntegratorState,
    step_size: jax.Array,
    max_depth: jax.Array,
    potential,
    logp_grad_fn: LogpGradFn,
    config: NUTSConfig,
) -> TreeResult:
    """One full NUTS trajectory: iterative tree doubling from ``start``.

    Equivalent of ``NUTS._hamiltonian_step`` + ``_Tree.extend``
    (``nuts.py:204-224, 284-342``).
    """
    init_proposal = Proposal(start.q, start.q_grad, start.energy, start.model_logp)
    dtype = start.energy.dtype

    def cond(c: _TreeCarry):
        return (~c.diverging) & (~c.turning) & (c.depth < max_depth)

    def body(c: _TreeCarry) -> _TreeCarry:
        key, k_dir, k_sub, k_swap = jax.random.split(c.key, 4)
        go_right = jax.random.bernoulli(k_dir)
        eps_signed = jnp.where(go_right, step_size, -step_size)
        edge = _tree_select(go_right, c.right, c.left)

        sub = _build_subtree(
            k_sub,
            edge,
            c.depth,
            eps_signed,
            start.energy,
            c.max_energy_change,
            potential,
            logp_grad_fn,
            config,
        )
        ok = (~sub.diverging) & (~sub.turning)
        node = sub.node

        # Multinomial swap against the *old* tree weight (``nuts.py:321-323``).
        take_new = logbern(k_swap, node.log_size - c.log_size)
        proposal = _tree_select(take_new, node.proposal, c.proposal)
        log_size = jnp.logaddexp(c.log_size, node.log_size)
        lwas = jnp.logaddexp(c.log_weighted_accept_sum, node.log_weighted_accept_sum)
        p_sum = c.p_sum + node.p_sum

        # New span boundaries in position order: the subtree's far end
        # (integration-order ``right`` = its last integrated full state)
        # replaces the extended edge.
        new_left = _tree_select(go_right, c.left, sub.end_state)
        new_right = _tree_select(go_right, sub.end_state, c.right)

        # 3-way generalized U-turn check (``nuts.py:332-340``).
        turning_full = _is_turning(p_sum, new_left.v, new_right.v)
        p_sum1 = jnp.where(go_right, c.p_sum + node.left.p, node.p_sum + c.left.p)
        v1a = jnp.where(go_right, c.left.v, node.right.v)
        v1b = jnp.where(go_right, node.left.v, c.left.v)
        turning1 = _is_turning(p_sum1, v1a, v1b)
        p_sum2 = jnp.where(go_right, c.right.p + node.p_sum, node.left.p + c.p_sum)
        v2a = jnp.where(go_right, c.right.v, node.left.v)
        v2b = jnp.where(go_right, node.right.v, c.right.v)
        turning2 = _is_turning(p_sum2, v2a, v2b)
        turning_new = turning_full | turning1 | turning2

        return _TreeCarry(
            key=key,
            left=_tree_select(ok, new_left, c.left),
            right=_tree_select(ok, new_right, c.right),
            p_sum=jnp.where(ok, p_sum, c.p_sum),
            proposal=_tree_select(ok, proposal, c.proposal),
            log_size=jnp.where(ok, log_size, c.log_size),
            log_weighted_accept_sum=jnp.where(ok, lwas, c.log_weighted_accept_sum),
            depth=c.depth + 1,
            n_proposals=c.n_proposals + sub.n_leaves,
            max_energy_change=sub.max_energy_change,
            diverging=sub.diverging,
            turning=jnp.where(ok, turning_new, sub.turning),
        )

    init = _TreeCarry(
        key=key,
        left=start,
        right=start,
        p_sum=start.p,
        proposal=init_proposal,
        log_size=jnp.asarray(0.0, dtype),
        log_weighted_accept_sum=jnp.asarray(-jnp.inf, dtype),
        depth=jnp.asarray(0, jnp.int32),
        n_proposals=jnp.asarray(0, jnp.int32),
        max_energy_change=jnp.asarray(0.0, dtype),
        diverging=jnp.asarray(False),
        turning=jnp.asarray(False),
    )
    out = lax.while_loop(cond, body, init)

    # mean_tree_accept with the initial state's unit weight removed
    # (``nuts.py:419-425``).
    mean_tree_accept = jnp.where(
        out.log_size > 0,
        jnp.exp(out.log_weighted_accept_sum - logdiffexp(out.log_size, 0.0)),
        0.0,
    )
    reached_max = (~out.diverging) & (~out.turning)
    return TreeResult(
        proposal=out.proposal,
        depth=out.depth,
        n_proposals=out.n_proposals,
        mean_tree_accept=mean_tree_accept,
        max_energy_change=out.max_energy_change,
        diverging=out.diverging,
        turning=out.turning,
        reached_max_treedepth=reached_max,
    )


@functools.lru_cache(maxsize=512)
def build_nuts_kernel(logp_grad_fn: LogpGradFn, config: NUTSConfig = NUTSConfig()):
    """Build the one-draw NUTS transition ``kernel(state, tuning) -> (state, info)``.

    Counterpart of ``BaseHMC._astep`` + ``NUTS._hamiltonian_step``
    (``base_hmc.py:140-190``, ``nuts.py:204-224``), as a pure function
    suitable for ``vmap`` over chains and ``lax.scan`` over draws.
    Memoized on ``(logp_grad_fn, config)`` so repeated drivers reuse the
    same kernel object (and therefore downstream jit caches).
    """

    def kernel(state: ChainState, tuning: jax.Array) -> Tuple[ChainState, NUTSInfo]:
        key, k_momentum, k_tree, k_sr = jax.random.split(state.rng_key, 4)
        start = start_of_trajectory(state, k_momentum)

        adapting = jnp.logical_and(tuning, config.adapt_step_size)
        step_size = state.da.current(adapting)
        if config.step_rand is not None:
            step_size = config.step_rand(step_size, k_sr)

        # Early-treedepth schedule: first `early_window` tuning iterations
        # cap the tree at `early_max_treedepth` (``nuts.py:205-208``).
        early = jnp.logical_and(tuning, state.iter_count < config.early_window)
        max_depth = jnp.where(early, config.early_max_treedepth, config.max_treedepth)

        tree = run_nuts_tree(
            k_tree, start, step_size, max_depth, state.potential, logp_grad_fn, config
        )

        new_state = finish_step(
            state,
            key,
            tree.proposal.q,
            tree.proposal.q_grad,
            tree.proposal.logp,
            tree.mean_tree_accept,
            tuning,
            config,
        )

        info = NUTSInfo(
            depth=tree.depth,
            step_size=jnp.exp(new_state.da.log_step),
            tune=tuning,
            mean_tree_accept=tree.mean_tree_accept,
            step_size_bar=jnp.exp(new_state.da.log_bar),
            tree_size=tree.n_proposals.astype(start.q.dtype),
            diverging=tree.diverging,
            energy_error=tree.proposal.energy - start.energy,
            energy=tree.proposal.energy,
            max_energy_error=tree.max_energy_change,
            model_logp=tree.proposal.logp,
            reached_max_treedepth=jnp.logical_and(
                tree.reached_max_treedepth, jnp.logical_not(tuning)
            ),
        )
        return new_state, info

    return kernel
