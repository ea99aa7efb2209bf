"""No-U-Turn sampler as a natively chain-batched, fixed-shape XLA kernel.

TPU-native re-architecture of the reference's recursive NUTS
(``littlemcmc/nuts.py``). The reference builds the binary trajectory tree
with Python recursion (``nuts.py:377-417``); XLA cannot trace unbounded
recursion, so the same tree is built *iteratively* with an explicit merge
stack — a post-order traversal that replays the reference's recursion
exactly: leaf ``i`` triggers one merge per trailing one-bit of ``i``,
reproducing every internal node of ``_build_subtree`` in order, with the
same multinomial proposal swaps and the same 3-way generalized U-turn
checks (``nuts.py:332-340, 389-398``).

The kernel is **batched over chains by construction** rather than via
``vmap``. The key observation making this efficient on TPU: every chain
that is still extending its tree follows the *same* schedule — at outer
iteration ``d`` all active chains build a ``2^d``-leaf subtree, process
leaves in the same order, perform merges at the same leaf indices, and
push/pop at the same stack heights. All loop control (depth, leaf index,
merge count, stack height) is therefore *scalar*, per-chain divergence
from the schedule is handled with boolean masks, and every stack access
is a static-stride ``dynamic_update_slice`` at a scalar index — **no
per-lane gathers or scatters**, which a ``vmap``-ed per-chain stack would
require (slow and fault-prone on TPU). All bulk data is ``(chains, n)``,
exactly the 2-D layout the VPU tiles natively.

The hot-loop working set is kept deliberately *slim* so XLA can keep the
while-loop carries VMEM-resident (HBM traffic per leaf is what bounds
throughput once the model itself is cheap; measured: a bare fused
leapfrog at 1024x100 costs ~1.8 us, so every extra (chains, n) array
written per leaf costs ~30% of a leapfrog):

- the merge stack stores per subtree only ``(left_p, right_p, p_sum,
  proposal q)`` — velocities at subtree boundaries are *recomputed* from
  the stored momenta at each U-turn check (for diagonal metrics this
  fuses into the dot product and costs no extra memory traffic; the
  reference instead stores full ``State`` objects at every boundary,
  ``nuts.py:246-248``);
- the proposal's gradient is not carried through the tree at all — it is
  recomputed with one extra batched model evaluation per transition when
  the accepted proposal is known (the reference caches it in ``State``);
- the integrator carry drops the velocity field (the leapfrog
  re-derives it from ``p`` internally).

Divergences (``|ΔE| ≥ Emax``, NaN ⇒ ∞; reference ``nuts.py:353-358``) and
turning are boolean masks instead of exceptions. Chains stopped early are
frozen by masking; the loops run until the slowest chain finishes — the
standard batched-NUTS execution model on accelerators.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .base import ChainState, NUTSConfig
from .math import log1mexp
from .step_sizes import dual_average_update

__all__ = ["NUTSConfig", "NUTSInfo", "build_nuts_kernel"]

LogpGradFn = Callable[[jax.Array], Tuple[jax.Array, jax.Array]]


class PhaseState(NamedTuple):
    """Slim phase-space point for the NUTS hot loop; batched (C, ...).

    The velocity is intentionally absent (recomputed from ``p`` where
    needed) — see the module docstring.
    """

    q: jax.Array
    p: jax.Array
    q_grad: jax.Array
    energy: jax.Array
    logp: jax.Array


class TreeNode(NamedTuple):
    """A completed subtree, boundaries in integration order; batched.

    ``left_p``/``right_p`` are the momenta at the subtree's two ends —
    all the U-turn criterion needs besides ``p_sum``. For *diagonal*
    metrics the boundary velocities ``left_v``/``right_v`` are ``None``
    (recomputing ``v = var * p`` fuses into the U-turn dot products, so
    storing them would only add stack traffic); for dense metrics they
    are stored (recomputing would cost an (n, n) matvec per check).
    ``q``/``energy``/``logp`` are the subtree's multinomial proposal
    (reference ``nuts.py:243-248``).
    """

    left_p: jax.Array
    right_p: jax.Array
    left_v: Optional[jax.Array]
    right_v: Optional[jax.Array]
    p_sum: jax.Array
    q: jax.Array
    energy: jax.Array
    logp: jax.Array
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


def _mwhere(mask, a, b):
    """``where`` with a (C,) mask broadcast against (C, ...) leaves."""
    def sel(x, y):
        m = mask.reshape(mask.shape + (1,) * (jnp.ndim(x) - mask.ndim))
        return jnp.where(m, x, y)

    return jax.tree.map(sel, a, b)


def _rowdot(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.sum(a * b, axis=-1)


def _split_each(keys: jax.Array, num: int):
    """Split a (C,) key batch into ``num`` (C,) key batches."""
    out = jax.vmap(lambda k: jax.random.split(k, num))(keys)
    return tuple(out[:, i] for i in range(num))


def _logbern_b(keys: jax.Array, log_p: jax.Array) -> jax.Array:
    """Per-chain Bernoulli in log space; NaN log_p yields False."""
    u = jax.vmap(jax.random.uniform)(keys)
    return jnp.log(u) < log_p


def _leaf_node(state: PhaseState, energy_change: jax.Array,
               v: Optional[jax.Array] = None) -> TreeNode:
    """Single-leapfrog subtree (reference ``_single_step``, ``nuts.py:359-368``).

    ``v`` is the leaf's velocity when the metric is dense (stored in the
    node); ``None`` for diagonal metrics (recomputed at the checks).
    """
    # log_p_accept_weighted = -ΔE + min(0, -ΔE): saturated Metropolis accept
    # probability with Boltzmann weight (``nuts.py:363``).
    lpaw = -energy_change + jnp.minimum(0.0, -energy_change)
    return TreeNode(
        left_p=state.p,
        right_p=state.p,
        left_v=v,
        right_v=v,
        p_sum=state.p,
        q=state.q,
        energy=state.energy,
        logp=state.logp,
        log_size=-energy_change,
        log_weighted_accept_sum=lpaw,
    )


def _make_batched_potential_ops(potential):
    velocity = jax.vmap(lambda pot, p: pot.velocity(p))
    kinetic = jax.vmap(lambda pot, p, v: pot.kinetic(p, v))
    return (
        lambda p: velocity(potential, p),
        lambda p, v: kinetic(potential, p, v),
    )


def _leapfrog_b(velocity_b, kinetic_b, logp_grad_b, epsilon, state: PhaseState,
                scheme: str = "leapfrog") -> Tuple[PhaseState, jax.Array]:
    """Batched symplectic step (reference ``integration.py:100-121`` for
    the default scheme; higher-order palindromic splittings otherwise).

    Also returns the final velocity (already computed for the kinetic
    energy) so dense-metric callers can store it without a second matvec.
    """
    from .integration import INTEGRATOR_COEFFS

    b, a = INTEGRATOR_COEFFS[scheme]
    eps = epsilon[:, None]
    p = state.p + (b[0] * eps) * state.q_grad
    q, logp, grad = state.q, state.logp, state.q_grad
    for i, ai in enumerate(a):
        v = velocity_b(p)
        q = (q + (ai * eps) * v).astype(state.q.dtype)
        logp, grad = logp_grad_b(q)
        p = p + (b[i + 1] * eps) * grad
    v = velocity_b(p)
    kin = kinetic_b(p, v)
    return PhaseState(q, p, grad, kin - logp, logp), v


def _merge_nodes(keys, t1: TreeNode, t2: TreeNode, check_extra,
                 velocity_b) -> Tuple[TreeNode, jax.Array]:
    """Merge two adjacent complete subtrees (integration order: t1 then t2).

    Replays one internal node of the reference recursion
    (``nuts.py:389-407``): full-span U-turn check, the two cross-subtree
    checks when both children have depth ≥ 1 (``check_extra``), log-space
    weight accumulation, and the multinomial proposal swap. Batched; the
    returned ``turning`` is per-chain. Boundary velocities come from the
    nodes when stored (dense metrics) and are otherwise recomputed from
    the momenta (diagonal metrics — the multiply fuses into the dots).
    """
    if t1.left_v is not None:
        v_1l, v_1r = t1.left_v, t1.right_v
        v_2l, v_2r = t2.left_v, t2.right_v
    else:
        v_1l = velocity_b(t1.left_p)
        v_1r = velocity_b(t1.right_p)
        v_2l = velocity_b(t2.left_p)
        v_2r = velocity_b(t2.right_p)

    p_sum = t1.p_sum + t2.p_sum
    turning = (_rowdot(p_sum, v_1l) <= 0) | (_rowdot(p_sum, v_2r) <= 0)
    p_sum1 = t1.p_sum + t2.left_p
    turning1 = (_rowdot(p_sum1, v_1l) <= 0) | (_rowdot(p_sum1, v_2l) <= 0)
    p_sum2 = t1.right_p + t2.p_sum
    turning2 = (_rowdot(p_sum2, v_1r) <= 0) | (_rowdot(p_sum2, v_2r) <= 0)
    turning = turning | (check_extra & (turning1 | turning2))

    log_size = jnp.logaddexp(t1.log_size, t2.log_size)
    lwas = jnp.logaddexp(
        t1.log_weighted_accept_sum, t2.log_weighted_accept_sum
    )
    take2 = _logbern_b(keys, t2.log_size - log_size)
    t2m = take2[:, None]
    node = TreeNode(
        left_p=t1.left_p,
        right_p=t2.right_p,
        left_v=t1.left_v,
        right_v=t2.right_v,
        p_sum=p_sum,
        q=jnp.where(t2m, t2.q, t1.q),
        energy=jnp.where(take2, t2.energy, t1.energy),
        logp=jnp.where(take2, t2.logp, t1.logp),
        log_size=log_size,
        log_weighted_accept_sum=lwas,
    )
    return node, turning


class _BuildCarry(NamedTuple):
    keys: jax.Array  # (C,)
    leaf_idx: jax.Array  # scalar
    height: jax.Array  # scalar
    cur: PhaseState  # batched; aborted lanes carry garbage (masked)
    stack: TreeNode  # leading stack dim (max_treedepth,), then batch
    building: jax.Array  # (C,) still building this subtree
    n_leaves: jax.Array  # (C,)
    max_energy_change: jax.Array  # (C,)
    diverging: jax.Array  # (C,)
    turning: jax.Array  # (C,)


class _SubtreeResult(NamedTuple):
    node: TreeNode
    end_state: PhaseState
    stack: TreeNode  # scratch, returned so the caller can thread it
    n_leaves: jax.Array
    max_energy_change: jax.Array
    diverging: jax.Array
    turning: jax.Array


def _build_subtree(
    keys,
    edge: PhaseState,
    depth,
    epsilon,
    active,
    start_energy,
    max_energy_change0,
    stack0: TreeNode,
    velocity_b,
    kinetic_b,
    logp_grad_b,
    config: NUTSConfig,
    store_velocity: bool = False,
) -> _SubtreeResult:
    """Build a complete subtree of ``2^depth`` leapfrogs from ``edge``.

    Iterative equivalent of ``_Tree._build_subtree`` (``nuts.py:377-417``),
    batched: ``depth``/``leaf_idx``/``height`` are scalars shared by all
    chains; ``active``/``building`` masks freeze chains that aborted. On
    abort only ``n_leaves``, the flags and ``max_energy_change`` are
    meaningful to the caller (reference abort semantics, ``nuts.py:316-319``).

    ``stack0`` is the caller-owned scratch stack: its contents are never
    read before being written (every ``peek`` follows a ``push`` to that
    slot), so it is threaded through the trajectory loop instead of being
    re-materialized — zeroing a fresh (max_treedepth, C, n)-sized stack on
    every doubling costs tens of MB of HBM writes per draw at scale.
    """
    n_total = jnp.left_shift(jnp.asarray(1, jnp.int32), depth)
    emax = jnp.asarray(config.Emax, edge.q.dtype)
    C = edge.q.shape[0]

    def push(stack, node, h):
        return jax.tree.map(
            lambda s, x: lax.dynamic_update_index_in_dim(s, x, h, 0), stack, node
        )

    def peek(stack, h):
        return jax.tree.map(
            lambda s: lax.dynamic_index_in_dim(s, h, 0, keepdims=False), stack
        )

    def cond(c: _BuildCarry):
        return (c.leaf_idx < n_total) & jnp.any(c.building)

    def body(c: _BuildCarry) -> _BuildCarry:
        # NOTE: aborted (non-building) lanes are NOT frozen — they keep
        # integrating garbage (possibly NaN) positions. Every downstream
        # consumer of their values is masked (div_leaf/mec/n_leaves below
        # by `building`, their stack lanes and final subtree node by the
        # caller's `ok`), so masking the state itself would only add
        # (C, n)-sized read traffic to the hot loop.
        new_state, v_new = _leapfrog_b(
            velocity_b, kinetic_b, logp_grad_b, epsilon, c.cur, config.integrator
        )

        energy_change = new_state.energy - start_energy
        energy_change = jnp.where(jnp.isnan(energy_change), jnp.inf, energy_change)
        upd = c.building & (jnp.abs(energy_change) > jnp.abs(c.max_energy_change))
        mec = jnp.where(upd, energy_change, c.max_energy_change)
        div_leaf = c.building & ~(jnp.abs(energy_change) < emax)
        n_leaves = c.n_leaves + c.building.astype(jnp.int32)

        node = _leaf_node(new_state, energy_change,
                          v=v_new if store_velocity else None)

        # Merge once per trailing one-bit of leaf_idx — the internal nodes
        # the reference recursion completes after this leaf. The schedule
        # (indices, heights) is scalar; chains that diverged at this leaf
        # or turned at an earlier merge stop applying updates
        # (``nuts.py:379-383``).
        def merge_cond(mc):
            keys_, j, node_, h, merging_ = mc
            more = jnp.bitwise_and(jnp.right_shift(c.leaf_idx, j), 1) == 1
            return more & jnp.any(merging_)

        def merge_body(mc):
            keys_, j, node_, h, merging_ = mc
            keys_next, k_merge = _split_each(keys_, 2)
            t1 = peek(c.stack, h - 1)
            merged, turning_new = _merge_nodes(
                k_merge, t1, node_, check_extra=j >= 1, velocity_b=velocity_b
            )
            # Lanes that stopped merging (turned at an earlier merge this
            # leaf, or aborted earlier) take the merged garbage and the
            # advanced keys unmasked: neither is read again this subtree,
            # and the tree-level key chain is separate.
            merging_ = merging_ & ~turning_new
            return (keys_next, j + 1, merged, h - 1, merging_)

        merging0 = c.building & ~div_leaf
        keys1, _, node, height, merging_out = lax.while_loop(
            merge_cond,
            merge_body,
            (c.keys, jnp.asarray(0, jnp.int32), node, c.height, merging0),
        )
        turned = merging0 & ~merging_out  # turned at some merge this leaf

        building = c.building & ~div_leaf & ~turned
        # Push at the scalar post-merge height. Aborted/frozen chains write
        # garbage into their lanes of this slot; they never read it again
        # (the stack is fresh per subtree and they stay masked out).
        stack = push(c.stack, node, height)

        return _BuildCarry(
            keys=keys1,
            leaf_idx=c.leaf_idx + 1,
            height=height + 1,
            cur=new_state,
            stack=stack,
            building=building,
            n_leaves=n_leaves,
            max_energy_change=mec,
            diverging=c.diverging | div_leaf,
            turning=c.turning | turned,
        )

    init = _BuildCarry(
        keys=keys,
        leaf_idx=jnp.asarray(0, jnp.int32),
        height=jnp.asarray(0, jnp.int32),
        cur=edge,
        stack=stack0,
        building=active,
        n_leaves=jnp.zeros((C,), jnp.int32),
        max_energy_change=max_energy_change0,
        diverging=jnp.zeros((C,), bool),
        turning=jnp.zeros((C,), bool),
    )
    out = lax.while_loop(cond, body, init)

    # Clean completion leaves exactly one frame on the stack (slot 0).
    final_node = peek(out.stack, 0)
    return _SubtreeResult(
        node=final_node,
        end_state=out.cur,
        stack=out.stack,
        n_leaves=out.n_leaves,
        max_energy_change=out.max_energy_change,
        diverging=out.diverging,
        turning=out.turning,
    )


class _TreeCarry(NamedTuple):
    keys: jax.Array
    stack: TreeNode  # scratch for subtree builds, allocated once
    left: PhaseState
    right: PhaseState
    left_v: Optional[jax.Array]  # edge velocities; None for diag metrics
    right_v: Optional[jax.Array]
    p_sum: jax.Array
    prop_q: jax.Array
    prop_energy: jax.Array
    prop_logp: jax.Array
    log_size: jax.Array
    log_weighted_accept_sum: jax.Array
    depth: jax.Array  # scalar schedule depth
    depth_c: jax.Array  # (C,) per-chain extends performed (the `depth` stat)
    n_proposals: jax.Array
    max_energy_change: jax.Array
    diverging: jax.Array
    turning: jax.Array


class TreeResult(NamedTuple):
    prop_q: jax.Array
    prop_energy: jax.Array
    prop_logp: jax.Array
    depth: jax.Array
    n_proposals: jax.Array
    mean_tree_accept: jax.Array
    max_energy_change: jax.Array
    diverging: jax.Array
    turning: jax.Array
    reached_max_treedepth: jax.Array


def run_nuts_tree(
    keys,
    start: PhaseState,
    step_size,
    max_depth_c,
    potential,
    logp_grad_b,
    config: NUTSConfig,
) -> TreeResult:
    """One full batched NUTS trajectory: iterative tree doubling.

    Equivalent of ``NUTS._hamiltonian_step`` + ``_Tree.extend``
    (``nuts.py:204-224, 284-342``). ``max_depth_c`` is per-chain (early
    tree-depth schedule); the scalar loop runs to the largest.
    """
    velocity_b, kinetic_b = _make_batched_potential_ops(potential)
    C = start.q.shape[0]
    dtype = start.energy.dtype
    max_depth_sched = jnp.max(max_depth_c)
    # Diagonal metrics recompute boundary velocities at the checks (the
    # elementwise multiply fuses into the dots); dense metrics store them
    # (recomputing would cost an (n, n) matvec per check).
    store_v = _diag_inverse_mass(potential) is None

    def cond(c: _TreeCarry):
        active = (~c.diverging) & (~c.turning) & (c.depth_c < max_depth_c)
        return (c.depth < max_depth_sched) & jnp.any(active)

    def body(c: _TreeCarry) -> _TreeCarry:
        active = (~c.diverging) & (~c.turning) & (c.depth_c < max_depth_c)
        keys_next, k_dir, k_sub, k_swap = _split_each(c.keys, 4)
        keys1 = _mwhere(active, keys_next, c.keys)

        go_right = jax.vmap(jax.random.bernoulli)(k_dir)
        eps_signed = jnp.where(go_right, step_size, -step_size)
        edge = _mwhere(go_right, c.right, c.left)

        sub = _build_subtree(
            k_sub, edge, c.depth, eps_signed, active,
            start.energy, c.max_energy_change, c.stack,
            velocity_b, kinetic_b, logp_grad_b, config,
            store_velocity=store_v,
        )
        ok = active & ~sub.diverging & ~sub.turning
        node = sub.node

        # Multinomial swap against the *old* tree weight (``nuts.py:321-323``).
        take_new = ok & _logbern_b(k_swap, node.log_size - c.log_size)
        tm = take_new[:, None]
        prop_q = jnp.where(tm, node.q, c.prop_q)
        prop_energy = jnp.where(take_new, node.energy, c.prop_energy)
        prop_logp = jnp.where(take_new, node.logp, c.prop_logp)
        log_size = jnp.where(ok, jnp.logaddexp(c.log_size, node.log_size), c.log_size)
        lwas = jnp.where(
            ok,
            jnp.logaddexp(c.log_weighted_accept_sum, node.log_weighted_accept_sum),
            c.log_weighted_accept_sum,
        )
        p_sum = jnp.where(ok[:, None], c.p_sum + node.p_sum, c.p_sum)

        # New span boundaries in position order: the subtree's far end (its
        # last integrated full state) replaces the extended edge.
        new_left = _mwhere(ok & ~go_right, sub.end_state, c.left)
        new_right = _mwhere(ok & go_right, sub.end_state, c.right)
        if store_v:
            v_end = velocity_b(sub.end_state.p)  # once per doubling
            okm = ok[:, None]
            new_left_v = jnp.where(okm & ~go_right[:, None], v_end, c.left_v)
            new_right_v = jnp.where(okm & go_right[:, None], v_end, c.right_v)
        else:
            new_left_v = new_right_v = None

        # 3-way generalized U-turn check on the merged span
        # (``nuts.py:332-340``). Boundary velocities: stored for dense
        # metrics, recomputed after selecting the momenta otherwise.
        go = go_right[:, None]
        if store_v:
            v_left, v_right = new_left_v, new_right_v
            v1a = jnp.where(go, c.left_v, node.right_v)
            v1b = jnp.where(go, node.left_v, c.left_v)
            v2a = jnp.where(go, c.right_v, node.left_v)
            v2b = jnp.where(go, node.right_v, c.right_v)
        else:
            v_left = velocity_b(new_left.p)
            v_right = velocity_b(new_right.p)
            p1a = jnp.where(go, c.left.p, node.right_p)
            p1b = jnp.where(go, node.left_p, c.left.p)
            v1a, v1b = velocity_b(p1a), velocity_b(p1b)
            p2a = jnp.where(go, c.right.p, node.left_p)
            p2b = jnp.where(go, node.right_p, c.right.p)
            v2a, v2b = velocity_b(p2a), velocity_b(p2b)
        turning_full = (_rowdot(p_sum, v_left) <= 0) | (_rowdot(p_sum, v_right) <= 0)
        p_sum1 = jnp.where(go, c.p_sum + node.left_p, node.p_sum + c.left.p)
        turning1 = (_rowdot(p_sum1, v1a) <= 0) | (_rowdot(p_sum1, v1b) <= 0)
        p_sum2 = jnp.where(go, c.right.p + node.p_sum, node.left_p + c.p_sum)
        turning2 = (_rowdot(p_sum2, v2a) <= 0) | (_rowdot(p_sum2, v2b) <= 0)
        turning_new = turning_full | turning1 | turning2

        return _TreeCarry(
            keys=keys1,
            stack=sub.stack,
            left=new_left,
            right=new_right,
            left_v=new_left_v,
            right_v=new_right_v,
            p_sum=p_sum,
            prop_q=prop_q,
            prop_energy=prop_energy,
            prop_logp=prop_logp,
            log_size=log_size,
            log_weighted_accept_sum=lwas,
            depth=c.depth + 1,
            depth_c=c.depth_c + active.astype(jnp.int32),
            n_proposals=c.n_proposals + jnp.where(active, sub.n_leaves, 0),
            max_energy_change=jnp.where(active, sub.max_energy_change, c.max_energy_change),
            diverging=c.diverging | (active & sub.diverging),
            turning=c.turning | (active & jnp.where(ok, turning_new, sub.turning)),
        )

    v_start = velocity_b(start.p) if store_v else None
    zero_node = _leaf_node(start, jnp.zeros((C,), dtype), v=v_start)
    stack0 = jax.tree.map(
        lambda x: jnp.zeros((config.max_treedepth,) + jnp.shape(x), x.dtype), zero_node
    )
    init = _TreeCarry(
        keys=keys,
        stack=stack0,
        left=start,
        right=start,
        left_v=v_start,
        right_v=v_start,
        p_sum=start.p,
        prop_q=start.q,
        prop_energy=start.energy,
        prop_logp=start.logp,
        log_size=jnp.zeros((C,), dtype),
        log_weighted_accept_sum=jnp.full((C,), -jnp.inf, dtype),
        depth=jnp.asarray(0, jnp.int32),
        depth_c=jnp.zeros((C,), jnp.int32),
        n_proposals=jnp.zeros((C,), jnp.int32),
        max_energy_change=jnp.zeros((C,), dtype),
        diverging=jnp.zeros((C,), bool),
        turning=jnp.zeros((C,), bool),
    )
    out = lax.while_loop(cond, body, init)

    # mean_tree_accept with the initial state's unit weight removed
    # (``nuts.py:419-425``).
    mean_tree_accept = jnp.where(
        out.log_size > 0,
        jnp.exp(
            out.log_weighted_accept_sum - (out.log_size + log1mexp(out.log_size))
        ),
        0.0,
    )
    reached_max = (~out.diverging) & (~out.turning)
    return TreeResult(
        prop_q=out.prop_q,
        prop_energy=out.prop_energy,
        prop_logp=out.prop_logp,
        depth=out.depth_c,
        n_proposals=out.n_proposals,
        mean_tree_accept=mean_tree_accept,
        max_energy_change=out.max_energy_change,
        diverging=out.diverging,
        turning=out.turning,
        reached_max_treedepth=reached_max,
    )


def _diag_inverse_mass(potential):
    """Inverse-mass diagonal of a (batched) diagonal metric, or None."""
    from .quadpotential import QuadPotentialDiag, QuadPotentialDiagAdapt

    if isinstance(potential, QuadPotentialDiagAdapt):
        return potential.var
    if isinstance(potential, QuadPotentialDiag):
        return potential.v
    return None


def _shared_dense_cov(potential, pooled: bool = False):
    """Shared covariance of a dense metric (batched), or None.

    ``QuadPotentialFull`` always qualifies: its covariance is fixed and
    the chain batch carries a broadcast copy, so row 0 is the shared
    matrix. ``QuadPotentialFullAdapt`` qualifies only under cross-chain
    pooled adaptation (``pooled=True``): the driver overwrites every
    chain's metric with the pooled estimate each tuning step, so row 0
    is the shared matrix at every kernel entry. Per-chain adaptive dense
    covariances cannot fit the trajectory kernel's VMEM budget.
    """
    from .quadpotential import QuadPotentialFull, QuadPotentialFullAdapt

    if isinstance(potential, QuadPotentialFull):
        return potential.cov[0]
    if pooled and isinstance(potential, QuadPotentialFullAdapt):
        return potential.cov[0]
    return None


def _shared_lowrank_factor(potential, pooled: bool = False):
    """``(stds, V, lam, alpha)`` of a pooled low-rank metric, or None.

    Only the *pooled* ``QuadPotentialLowRankAdapt`` qualifies: the
    driver overwrites every chain's basis/eigenvalues/diagonal with the
    cross-chain pooled estimate each tuning step, so row 0 carries the
    shared factor at every kernel entry (the same contract as the
    pooled dense path, :func:`_shared_dense_cov`). Per-chain low-rank
    adaptation keeps a distinct basis per chain — a ``(C, n, k)`` VMEM
    resident the kernel does not model — and runs the XLA tree.
    """
    from .quadpotential import QuadPotentialLowRankAdapt

    if pooled and isinstance(potential, QuadPotentialLowRankAdapt):
        return (potential.stds, potential.vecs[0], potential.lam[0],
                potential.alpha[0])
    return None


@functools.lru_cache(maxsize=512)
def build_nuts_kernel(
    logp_grad_fn: LogpGradFn,
    config: NUTSConfig = NUTSConfig(),
    batched_logp_grad_fn: Optional[LogpGradFn] = None,
    trajectory_spec=None,
    mesh=None,
    chain_axis: str = "chains",
    pooled_metric: bool = False,
    trajectory_interpret: bool = False,
):
    """Build the chain-batched NUTS transition ``kernel(states, tuning)``.

    Counterpart of ``BaseHMC._astep`` + ``NUTS._hamiltonian_step``
    (``base_hmc.py:140-190``, ``nuts.py:204-224``). ``states`` is a
    :class:`~littlemcmc_tpu.base.ChainState` with a leading ``chains``
    axis on every leaf; the kernel returns ``(new_states, NUTSInfo)`` with
    the same batching. Memoized on its arguments so repeated drivers
    reuse jit caches.

    ``batched_logp_grad_fn`` optionally overrides the model evaluation
    with a natively-batched ``(C, n) -> ((C,), (C, n))`` implementation
    (e.g. a fused Pallas kernel); the default is ``vmap`` of the
    per-chain function.

    ``trajectory_spec`` (a :class:`littlemcmc_tpu.ops.PallasModelSpec`)
    switches the whole tree-building trajectory to the single-kernel
    Pallas fast path (VMEM-resident merge stack, model inlined into the
    kernel; requires a diagonal metric and float32). Statistically
    identical to the XLA path; uses the on-core PRNG instead of
    threefry, so draws differ bitwise.

    ``mesh``/``chain_axis``: when the chain batch is sharded over a
    multi-device mesh, GSPMD cannot auto-partition the pallas_call, so
    the trajectory op is wrapped in ``shard_map`` over the chain axis —
    each device builds trees for its own chain shard (chains never
    interact inside a trajectory) with a per-device-decorrelated PRNG
    seed.
    """
    logp_grad_b = (
        batched_logp_grad_fn
        if batched_logp_grad_fn is not None
        else jax.vmap(logp_grad_fn)
    )

    def kernel(states: ChainState, tuning) -> Tuple[ChainState, NUTSInfo]:
        key_next, k_mom, k_tree, k_sr = _split_each(states.rng_key, 4)

        # Fresh momentum and the trajectory start (cached model eval).
        p0 = jax.vmap(lambda pot, k: pot.sample_momentum(k))(states.potential, k_mom)
        v0 = jax.vmap(lambda pot, p: pot.velocity(p))(states.potential, p0)
        kin = jax.vmap(lambda pot, p, v: pot.kinetic(p, v))(states.potential, p0, v0)
        start = PhaseState(states.q, p0, states.q_grad, kin - states.logp, states.logp)

        adapting = jnp.logical_and(tuning, config.adapt_step_size)
        step_size = states.da.current(adapting)  # (C,)
        if config.step_rand is not None:
            step_size = jax.vmap(config.step_rand)(step_size, k_sr)

        # Early-treedepth schedule: first `early_window` tuning iterations
        # cap the tree at `early_max_treedepth` (``nuts.py:205-208``).
        early = jnp.logical_and(tuning, states.iter_count < config.early_window)
        max_depth_c = jnp.where(
            early, config.early_max_treedepth, config.max_treedepth
        ).astype(jnp.int32)

        if trajectory_spec is not None:
            var_b = _diag_inverse_mass(states.potential)
            if var_b is not None:
                metric = "diag"
            else:
                var_b = _shared_dense_cov(states.potential,
                                          pooled=pooled_metric)
                if var_b is not None:
                    metric = "dense"
                else:
                    var_b = _shared_lowrank_factor(states.potential,
                                                   pooled=pooled_metric)
                    if var_b is None:
                        raise ValueError(
                            "the Pallas trajectory path requires a diagonal "
                            "metric (QuadPotentialDiag / "
                            "QuadPotentialDiagAdapt), a static shared dense "
                            "metric (QuadPotentialFull), a cross-chain pooled "
                            "adaptive dense metric (QuadPotentialFullAdapt "
                            "with cross_chain_adapt=True), or a cross-chain "
                            "pooled low-rank metric (QuadPotentialLowRankAdapt "
                            "with cross_chain_adapt=True)"
                        )
                    metric = "lowrank"
            from .ops.nuts_trajectory_pallas import (build_trajectory_op,
                                                     resolve_pack)

            # Lane packing: small-n models share 128-lane rows between
            # K chains (the VPU otherwise idles ~90% of each vector op
            # at n ~ 10). Requires a packed_fn, a diagonal metric, and a
            # chain count that still blocks into >= 8 rows. The kernel
            # blocks the per-device chain shard under a mesh (chains are
            # sharded over the chain axis only).
            n_model = start.q.shape[-1]
            n_chain_devs = 1
            if mesh is not None:
                n_chain_devs = (mesh.shape[chain_axis]
                                if chain_axis in mesh.shape else mesh.size)
            C_local = start.q.shape[0] // n_chain_devs
            pack = (resolve_pack(trajectory_spec, n_model, C_local)
                    if metric == "diag" else 1)
            traj_op = build_trajectory_op(
                trajectory_spec,
                n_model,
                config.max_treedepth,
                config.Emax,
                config.integrator,
                chain_block=(config.chain_block or
                             (256 * pack if pack > 1 else 512)),
                metric=metric,
                interpret=trajectory_interpret,
                pack=pack,
            )
            # both 32-bit words of chain 0's fresh per-draw key: 64 bits
            # of per-draw entropy for the kernel's on-core PRNG
            seed = jax.random.key_data(k_tree)[0].astype(jnp.int32)
            if mesh is not None:
                # GSPMD cannot partition the pallas_call; shard_map it so
                # each device runs the kernel on its own chain shard.
                from jax import shard_map
                from jax.sharding import PartitionSpec

                Pc = PartitionSpec(chain_axis)
                Pr = PartitionSpec()

                def traj_local(q, p, g, lp, eps, mdc, var, sd):
                    # decorrelate the per-device PRNG streams
                    dev = jax.lax.axis_index(chain_axis).astype(jnp.int32)
                    sd = sd + jnp.stack([dev * jnp.int32(1000003),
                                         jnp.int32(0)])
                    return traj_op(q, p, g, lp, eps, mdc, var, sd)

                if metric == "diag":
                    Pv = Pc
                elif metric == "lowrank":
                    # per-chain stds shard; the pooled factor replicates
                    Pv = (Pc, Pr, Pr, Pr)
                else:
                    Pv = Pr  # shared cov replicates
                traj_call = shard_map(
                    traj_local, mesh=mesh,
                    in_specs=(Pc, Pc, Pc, Pc, Pc, Pc, Pv, Pr),
                    out_specs=Pc,
                    # pallas_call outputs carry no varying-mesh-axis
                    # metadata; every output is chain-sharded by
                    # construction (out_specs above)
                    check_vma=False,
                )
            else:
                traj_call = traj_op
            outs = traj_call(
                start.q, start.p, start.q_grad, start.logp,
                step_size, max_depth_c, var_b, seed,
            )
            dtype = start.q.dtype
            log_size = outs["log_size"].astype(dtype)
            lwas = outs["log_weighted_accept_sum"].astype(dtype)
            mta = jnp.where(
                log_size > 0,
                jnp.exp(lwas - (log_size + log1mexp(log_size))),
                0.0,
            )
            tree = TreeResult(
                prop_q=outs["q"].astype(dtype),
                prop_energy=outs["energy"].astype(dtype),
                prop_logp=outs["logp"].astype(dtype),
                depth=outs["depth"],
                n_proposals=outs["n_leaves"],
                mean_tree_accept=mta,
                max_energy_change=outs["max_energy_change"].astype(dtype),
                diverging=outs["diverging"],
                turning=outs["turning"],
                reached_max_treedepth=(~outs["diverging"]) & (~outs["turning"]),
            )
            prop_logp = tree.prop_logp
            prop_grad = outs["grad"].astype(dtype)
        else:
            tree = run_nuts_tree(
                k_tree, start, step_size, max_depth_c,
                states.potential, logp_grad_b, config,
            )

            # The proposal's gradient was not carried through the tree (see
            # module docstring); recompute it once at the accepted position.
            # (Deterministic model ⇒ identical to the value the reference
            # caches in its State objects.)
            prop_logp, prop_grad = logp_grad_b(tree.prop_q)

        # Adaptation updates (``base_hmc.py:161-162``).
        da = dual_average_update(
            states.da,
            tree.mean_tree_accept,
            adapting,
            target=config.target_accept,
            gamma=config.gamma,
            k=config.k,
            t0=config.t0,
        )
        potential = jax.vmap(lambda pot, q, g: pot.update(q, g, tuning))(
            states.potential, tree.prop_q, prop_grad
        )

        new_states = ChainState(
            rng_key=key_next,
            q=tree.prop_q,
            q_grad=prop_grad,
            logp=prop_logp,
            potential=potential,
            da=da,
            iter_count=states.iter_count + 1,
        )

        info = NUTSInfo(
            depth=tree.depth,
            step_size=jnp.exp(da.log_step),
            tune=jnp.broadcast_to(tuning, tree.depth.shape),
            mean_tree_accept=tree.mean_tree_accept,
            step_size_bar=jnp.exp(da.log_bar),
            tree_size=tree.n_proposals.astype(start.q.dtype),
            diverging=tree.diverging,
            energy_error=tree.prop_energy - start.energy,
            energy=tree.prop_energy,
            max_energy_error=tree.max_energy_change,
            model_logp=tree.prop_logp,
            reached_max_treedepth=jnp.logical_and(
                tree.reached_max_treedepth, jnp.logical_not(tuning)
            ),
        )
        return new_states, info

    return kernel


def _fused_welford_tuple(pot):
    """Flatten a ``QuadPotentialDiagAdapt`` into the fused op's layout."""
    return (pot.fg.mean, pot.fg.raw_var, pot.fg.w_sum, pot.fg.w_sum2,
            pot.bg.mean, pot.bg.raw_var, pot.bg.w_sum, pot.bg.w_sum2,
            pot.n_samples.astype(jnp.float32), pot.window.astype(jnp.float32))


def _pool_dense_welford(pot):
    """Global pooled moments from a chain-batched ``QuadPotentialFullAdapt``.

    Exact Chan combination over chains for both windows (the same math
    as :func:`littlemcmc_tpu.parallel.cross_chain._pooled_cov`, kept as
    full ``(mean, raw, weight)`` states). Runs at the global jit level,
    so GSPMD lowers the chain reductions to psums over a sharded mesh.
    """
    f32 = jnp.float32

    def pool(wf):
        nc = wf.n_samples.astype(f32)  # (C,)
        N = jnp.sum(nc)
        M = jnp.sum(nc[:, None] * wf.mean, axis=0) / jnp.maximum(N, 1e-30)
        d = wf.mean - M
        raw = jnp.sum(wf.raw_cov, axis=0) + jnp.einsum("c,ci,cj->ij", nc, d, d)
        return M, raw, N

    fgM, fgR, fgW = pool(pot.fg)
    bgM, bgR, bgW = pool(pot.bg)
    return (fgM, fgR, fgW, bgM, bgR, bgW,
            pot.n_samples[0].astype(f32),
            pot.prev_update[0].astype(f32),
            pot.window[0].astype(f32))


def _scale_dense_welford(dense_welford, n_devices):
    """Pre-scale the extensive leaves of the pooled-dense Welford tuple.

    The fused kernel seeds each of its LOCAL B blocks with 1/B of the
    state it receives; with D devices the exact-combine identity needs
    1/(D*B) per block, so the sharded caller scales the raw scatters and
    weights (means and counters are intensive) by 1/D first.
    """
    dw = list(dense_welford)
    for i in (1, 2, 4, 5):  # fg_raw, fg_w, bg_raw, bg_w
        dw[i] = dw[i] / n_devices
    return tuple(dw)


def _dense_boundary_potential(pot, outs, c_fg, C):
    """Chunk-boundary pooled-dense metric refresh from fused outputs.

    Chan-combines the per-block (and, under GSPMD, per-device) Welford
    states the fused kernel wrote, refreshes the shared metric with the
    pooled covariance estimator (``cross_chain._pooled_cov``: raw/(N-1))
    + Cholesky — keeping the previous factor on a non-finite
    factorization (reference ``quadpotential.py:506-510``) — and stores
    the pooled state in replicated per-chain form: each chain carries
    1/C of the weight at the pooled mean, so Chan-combining C such rows
    reproduces the global state exactly and the per-draw and fused
    engines interoperate mid-run.
    """
    from .ops.fused_nuts_pallas import combine_dense_welford
    from .quadpotential import WelfordCovariance

    Wf, Mf, Rf = combine_dense_welford(
        outs["dense_fg_w"], outs["dense_fg_mean"], outs["dense_fg_raw"], c_fg)
    Wb, Mb, Rb = combine_dense_welford(
        outs["dense_bg_w"], outs["dense_bg_mean"], outs["dense_bg_raw"], c_fg)
    cov_new = Rf / jnp.maximum(Wf - 1.0, 1.0)
    chol_new = jnp.linalg.cholesky(cov_new)
    ok = jnp.all(jnp.isfinite(chol_new))
    bcast = lambda m: jnp.broadcast_to(m, (C,) + m.shape)
    Cf = jnp.asarray(float(C), jnp.float32)
    return pot.replace(
        cov=jnp.where(ok, bcast(cov_new), pot.cov),
        chol=jnp.where(ok, bcast(chol_new), pot.chol),
        chol_failed=pot.chol_failed | ~ok,
        fg=WelfordCovariance(n_samples=jnp.full((C,), Wf / Cf),
                             mean=bcast(Mf), raw_cov=bcast(Rf / Cf)),
        bg=WelfordCovariance(n_samples=jnp.full((C,), Wb / Cf),
                             mean=bcast(Mb), raw_cov=bcast(Rb / Cf)),
        n_samples=jnp.full((C,), outs["n_samples"].astype(jnp.int32)),
        prev_update=jnp.full((C,), outs["prev_update"].astype(jnp.int32)),
        window=jnp.full((C,), outs["window"].astype(jnp.int32)),
    )


def build_fused_nuts_runner_factory(
    config: NUTSConfig,
    trajectory_spec,
    potential_template,
    model_ndim: int,
    local_chains: int,
    mesh=None,
    chain_axis: str = "chains",
    interpret: bool = False,
    pooled: bool = False,
):
    """Chunk-runner factory for the fused multi-draw Pallas NUTS kernel.

    Returns ``factory(chunk, tuning, collect) -> run_chunk`` with the
    same contract as the driver's ``_make_chunk_runner``:
    ``run_chunk(states) -> (new_states, (qs, NUTSInfo) | None, ndiv)``.
    One ``pallas_call`` executes all ``chunk`` transitions with momentum
    refresh, dual averaging, and dual-window Welford adaptation on core
    (see :mod:`littlemcmc_tpu.ops.fused_nuts_pallas`); this erases the
    per-draw launch + XLA-epilogue cost that dominated small-model
    throughput (measured 17x between raw kernel and e2e in round 2).

    ``potential_template`` is a single-chain instance of the metric used
    only for static structure (adaptive vs static, diagonal vs dense,
    window multiplier). Supported:

    - diagonal (``QuadPotentialDiag`` / ``QuadPotentialDiagAdapt``,
      non-pooled): every phase fused, adaptation on core;
    - static dense (``QuadPotentialFull``): every phase fused — momentum
      is one MXU matmul against ``L^{-1}``, velocities matmuls against
      the shared covariance; dual averaging stays on core;
    - pooled diagonal (``pooled=True`` + ``QuadPotentialDiagAdapt``):
      every phase fused — the exact per-chain Welford updates run on
      core and the epilogue pools the shared metric once per chunk
      boundary (instead of once per draw);
    - pooled dense (``pooled=True`` + ``QuadPotentialFullAdapt``): every
      phase fused. Tune chunks carry a block-local pooled Welford
      covariance in VMEM (one MXU rows-contraction per draw, window
      swaps on core); the epilogue Chan-combines blocks and devices
      exactly and refreshes the metric (pooled covariance + Cholesky) at
      the chunk boundary. Mid-chunk the metric is frozen — Stan's
      boundary-cadence adaptation rather than the reference's every-draw
      refresh; boundaries re-synchronize to the exact pooled estimate.
      Draw chunks run with the frozen post-tune metric.
    """
    from .quadpotential import (QuadPotentialDiag, QuadPotentialDiagAdapt,
                                QuadPotentialFull, QuadPotentialFullAdapt,
                                QuadPotentialLowRankAdapt,
                                WelfordVariance)
    from .ops.fused_nuts_pallas import build_fused_nuts_op
    from .ops.nuts_trajectory_pallas import resolve_pack
    from .step_sizes import DualAverageState

    diag_adapt = isinstance(potential_template, QuadPotentialDiagAdapt)
    diag_static = isinstance(potential_template, QuadPotentialDiag)
    dense_static = isinstance(potential_template, QuadPotentialFull)
    dense_pooled = pooled and isinstance(potential_template,
                                         QuadPotentialFullAdapt)
    lowrank_pooled = pooled and isinstance(potential_template,
                                           QuadPotentialLowRankAdapt)
    if not (diag_adapt or diag_static or dense_static or dense_pooled
            or lowrank_pooled):
        raise ValueError(
            "the fused NUTS kernel requires a diagonal metric, a static "
            "dense metric (QuadPotentialFull), or a cross-chain pooled "
            "adaptive metric")
    dense = dense_static or dense_pooled
    metric = ("dense" if dense
              else "lowrank" if lowrank_pooled else "diag")
    lowrank_k = potential_template.rank if lowrank_pooled else 0
    # On-core dual-window Welford: per-chain *diagonal* adaptation — which
    # pooled diag adaptation also is (pooling keeps per-chain accumulators
    # and only recomputes the shared metric from the pooled fg moments,
    # parallel/cross_chain.py). Fused pooled-diag tune chunks therefore run
    # the exact per-chain updates on core and pool once per chunk boundary
    # in the epilogue instead of once per draw: mid-chunk, chains ride
    # their own per-chain estimate (the reference's non-pooled behavior);
    # at every boundary — including the one that freezes the draw-phase
    # metric — the estimate is the exact pooled one.
    # The low-rank metric's diagonal part follows the same scheme (its
    # fg/bg Welford leaves are the diag accumulators), so its tune chunks
    # also run the per-chain updates on core; the shared factor stays
    # frozen per chunk and refreshes at boundaries.
    adapt_metric = diag_adapt or lowrank_pooled
    window_multiplier = (potential_template.window_multiplier
                         if (adapt_metric or dense_pooled) else 1.0)
    pack = resolve_pack(trajectory_spec, model_ndim, local_chains) \
        if not (dense or lowrank_pooled) else 1

    @functools.lru_cache(maxsize=64)
    def factory(chunk: int, tuning: bool, collect: bool):
        adapt_dense = bool(tuning) and dense_pooled
        op = build_fused_nuts_op(
            trajectory_spec, model_ndim, chunk, bool(tuning),
            adapt_metric, config, window_multiplier,
            chain_block=(config.chain_block or 256),
            interpret=interpret, pack=pack, collect_trace=bool(collect),
            metric=metric, adapt_dense=adapt_dense, lowrank_k=lowrank_k,
        )

        def call_op(states: ChainState, seed, dense_welford=None):
            pot = states.potential
            linv = None
            lowrank_fac = None
            if dense:
                # shared metric: row 0 is every chain's matrix (static, or
                # pooled-overwritten each chunk boundary). L^{-1} turns the
                # momentum draw into a matmul; one small triangular solve
                # per chunk, nothing per draw.
                var = pot.cov[0]
                linv = jax.scipy.linalg.solve_triangular(
                    pot.chol[0], jnp.eye(var.shape[0], dtype=var.dtype),
                    lower=True)
            elif lowrank_pooled:
                # per-chain variance rows; the shared factor (row 0 — the
                # pool keeps every chain identical) freezes for the chunk
                var = pot.var
                lowrank_fac = (pot.vecs[0], pot.lam[0], pot.alpha[0])
            elif diag_adapt:
                var = pot.var
            else:
                var = pot.v
            welford = _fused_welford_tuple(pot) if adapt_metric else None
            return op(
                states.q, states.q_grad, states.logp,
                states.iter_count.astype(jnp.float32),
                states.da.log_step, states.da.log_bar, states.da.hbar,
                states.da.count.astype(jnp.float32), states.da.mu,
                var, welford, seed, linv=linv, dense_welford=dense_welford,
                lowrank_fac=lowrank_fac,
            )

        if mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec

            Pc = PartitionSpec(chain_axis)
            Pr = PartitionSpec()

            def call_local(states, seed, dense_welford=None):
                dev = jax.lax.axis_index(chain_axis).astype(jnp.int32)
                seed = seed + jnp.stack([dev * jnp.int32(1000003),
                                         jnp.int32(0)])
                return call_op(states, seed, dense_welford)

            # per-draw streams are (T, C, ...): chain-sharded on axis 1;
            # pooled-dense block states are device-stacked on axis 0 and
            # the shared counters replicated; everything else is
            # chain-batched state, sharded on axis 0. Keyed by NAME (a
            # shape[0] == chunk heuristic mis-shards when the chunk
            # length coincides with another dimension).
            _PER_DRAW = frozenset({"trace", "energy", "model_logp", "depth", "n_leaves", "diverging", "turning", "max_energy_change", "energy_error", "mean_tree_accept", "step_size", "step_size_bar"})
            _REPLICATED = frozenset({"n_samples", "prev_update", "window"}
                                    if adapt_dense else ())

            def sharded_call(states, seed, dense_welford=None):
                from jax.tree_util import tree_map_with_path

                in_specs = (jax.tree.map(lambda _: Pc, states,
                                         is_leaf=lambda x: x is None), Pr)
                args = (states, seed)
                if dense_welford is not None:
                    nd = float(mesh.shape[chain_axis]
                               if chain_axis in mesh.shape else mesh.size)
                    dense_welford = _scale_dense_welford(dense_welford, nd)
                    in_specs += (jax.tree.map(lambda _: Pr, dense_welford),)
                    args += (dense_welford,)
                out_shapes = jax.eval_shape(call_op, *args)
                out_specs = tree_map_with_path(
                    lambda path, sh: (PartitionSpec(None, chain_axis)
                                      if str(path[0].key) in _PER_DRAW
                                      else Pr if str(path[0].key) in _REPLICATED
                                      else Pc),
                    out_shapes,
                )
                return shard_map(
                    call_local, mesh=mesh, in_specs=in_specs,
                    out_specs=out_specs, check_vma=False,
                )(*args)

            runner_call = sharded_call
        else:
            runner_call = call_op

        @jax.jit
        def run_chunk(states: ChainState):
            # Chunk-invariant draw streams (reference property: draws
            # depend only on the seed, ``sampling.py:496-497``). The
            # kernel's per-draw stream is
            #   seed0 = w0 + i_blk*7919 + t*15485863
            # with ``t`` the in-chunk grid index; folding
            # ``iter0*15485863`` into ``w0`` keys the stream on the
            # GLOBAL iteration index, and deriving ``(w0, w1)`` from the
            # chain key by a fixed fold (never advancing the key across
            # chunks) removes the chunk count from the derivation — so
            # ``progress_every`` cannot change the draws.
            k0 = jax.tree.map(lambda x: x[0], states.rng_key)
            words = jax.random.key_data(
                jax.random.fold_in(k0, 0x46AE)).astype(jnp.int32)
            iter0 = states.iter_count.reshape(-1)[0].astype(jnp.int32)
            seed = jnp.stack(
                [words[0] + iter0 * jnp.int32(15485863), words[1]])
            key_next = states.rng_key
            dense_welford = (_pool_dense_welford(states.potential)
                             if adapt_dense else None)
            if dense_welford is not None:
                outs = runner_call(states, seed, dense_welford)
            else:
                outs = runner_call(states, seed)

            da = DualAverageState(
                log_step=outs["da_log_step"],
                log_bar=outs["da_log_bar"],
                hbar=outs["da_hbar"],
                count=outs["da_count"].astype(jnp.int32),
                mu=outs["da_mu"],
            )
            if adapt_metric:
                var = outs["var"]
                stds = jnp.sqrt(var)
                fg = WelfordVariance(
                    w_sum=outs["fg_w"], w_sum2=outs["fg_w2"],
                    mean=outs["fg_mean"], raw_var=outs["fg_raw"])
                bg = WelfordVariance(
                    w_sum=outs["bg_w"], w_sum2=outs["bg_w2"],
                    mean=outs["bg_mean"], raw_var=outs["bg_raw"])
                if lowrank_pooled:
                    # diag part updated on core; the factor leaves ride
                    # along frozen and refresh at the boundary below.
                    # buf_fill=0 marks the ring buffer stale: the fused
                    # kernel never maintains it, so a mid-run fallback to
                    # the per-draw engine must refill before trusting it
                    potential = states.potential.replace(
                        var=var, stds=stds, inv_stds=1.0 / stds,
                        fg=fg, bg=bg,
                        n_samples=outs["n_samples"].astype(jnp.int32),
                        window=outs["window"].astype(jnp.int32),
                        buf_fill=jnp.zeros_like(states.potential.buf_fill),
                    )
                    if tuning:
                        from .parallel.cross_chain import (
                            lowrank_boundary_refresh)

                        potential = lowrank_boundary_refresh(
                            potential, outs["q"])
                else:
                    potential = QuadPotentialDiagAdapt(
                        var=var, stds=stds, inv_stds=1.0 / stds,
                        fg=fg, bg=bg,
                        n_samples=outs["n_samples"].astype(jnp.int32),
                        window=outs["window"].astype(jnp.int32),
                        window_multiplier=window_multiplier,
                    )
                    if pooled and tuning:
                        # chunk-boundary pooling: recompute the shared
                        # metric from the cross-chain fg moments (GSPMD
                        # turns the reductions into psums over a sharded
                        # mesh)
                        from .parallel.cross_chain import (
                            cross_chain_potential_pool)

                        potential = cross_chain_potential_pool(
                            potential, jnp.asarray(True))
            elif adapt_dense:
                potential = _dense_boundary_potential(
                    states.potential, outs, dense_welford[0],
                    states.q.shape[0])
            else:
                potential = states.potential

            new_states = ChainState(
                rng_key=key_next,
                q=outs["q"],
                q_grad=outs["grad"],
                logp=outs["logp"],
                potential=potential,
                da=da,
                iter_count=outs["iter_count"].astype(jnp.int32),
            )

            tuning_arr = jnp.full(outs["depth"].shape, bool(tuning))
            info = NUTSInfo(
                depth=outs["depth"],
                step_size=outs["step_size"],
                tune=tuning_arr,
                mean_tree_accept=outs["mean_tree_accept"],
                step_size_bar=outs["step_size_bar"],
                tree_size=outs["n_leaves"].astype(jnp.float32),
                diverging=outs["diverging"],
                energy_error=outs["energy_error"],
                energy=outs["energy"],
                max_energy_error=outs["max_energy_change"],
                model_logp=outs["model_logp"],
                reached_max_treedepth=((~outs["diverging"])
                                       & (~outs["turning"])
                                       & (~tuning_arr)),
            )
            ndiv = jnp.sum(info.diverging).astype(jnp.int32)
            out = (outs["trace"], info) if collect else None
            return new_states, out, ndiv

        return run_chunk

    if dense_pooled or lowrank_pooled:
        # Boundary-cadence adaptation: the shared metric (covariance /
        # low-rank factor) refreshes only at chunk boundaries, so cap
        # fused TUNE chunks to keep a Stan-like refresh cadence (~6+
        # refreshes over a default-length tune; with C pooled chains each
        # boundary already sees C*cap fresh samples — and each low-rank
        # boundary runs one batch subspace-iteration step, which needs a
        # handful of iterations to converge). Without the cap a
        # single-chunk tune would adapt the step size against the initial
        # metric for the whole phase (measured: final step 0.53 vs 1.00,
        # trees ~2x deeper in the draw phase). The schedule refines the
        # flat cap with early boundaries (10/20/50) — see
        # base.pooled_tune_schedule; TUNE_PHASE_PROBE.json for the
        # measured deep-tree prefix it removes.
        factory.tune_chunk_cap = 50
        from .base import pooled_tune_schedule

        factory.tune_chunk_schedule = pooled_tune_schedule
    return factory
