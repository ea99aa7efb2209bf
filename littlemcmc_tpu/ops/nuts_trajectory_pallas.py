"""Whole-trajectory NUTS as a single Pallas TPU kernel.

The batched XLA NUTS kernel (:mod:`littlemcmc_tpu.nuts`) is bounded by
HBM traffic: every leapfrog writes several ``(chains, n)`` arrays into
the merge stack and working state, which XLA keeps in HBM because the
combined while-loop carry is tens of MB. This kernel instead runs the
*entire* tree-building trajectory of one NUTS transition inside one
``pallas_call``, with the merge stack, edge states, and proposal all in
VMEM scratch — HBM is touched only for the per-transition inputs and
outputs. The model's ``(logp, grad)`` is *inlined* into the kernel (the
caller provides a Pallas-traceable function), so a leapfrog is one MXU
matmul plus a handful of VPU ops on VMEM-resident data.

Chains are processed in blocks (grid over the chain axis) so each
block's working set fits the 16 MB of VMEM; this also shrinks the
lock-step tail (each block waits only for its own deepest tree, not the
global deepest — the dominant cost of batched NUTS).

Layout notes (all driven by the 16 MB VMEM budget — a ``(CB, 1)``
buffer is physically padded to ``(CB, 128)``, so scalars must share
lanes):

- All per-chain scalars are ``(CB, 1)`` *slices* of shared ``(CB, 128)``
  column-packed buffers (one f32, one i32), broadcasting directly
  against ``(CB, Npad)`` rows.
- The merge stack holds per subtree ``(left_p, right_p, p_sum)`` as
  plain ``(D, CB, Npad)`` arrays, and the proposal ``q`` in a fourth
  array whose *padding lanes* carry the subtree's four scalars
  (proposal energy, proposal logp, log_size, log_weighted_accept_sum)
  at columns ``n .. n+3``.
- Per-chain scalar inputs and outputs are column-packed ``(C, 8)`` /
  ``(C, 16)`` f32 arrays (one buffer each instead of a dozen padded
  ones).
- Randomness is pluggable: the on-core PRNG (``pltpu.prng_random_bits``,
  seeded per (draw, chain-block)) on TPU, or a murmur3 counter stream in
  plain XLA ops under ``interpret=True`` (CPU CI). Either way draws are
  deterministic given the seed but are a different stream from the XLA
  path's threefry — the paths are statistically, not bitwise, identical.

Semantics replayed from the reference (littlemcmc ``nuts.py``): the
multinomial proposal swaps (``nuts.py:321-323, 404-407``), the 3-way
generalized U-turn checks (``nuts.py:332-340, 389-398``), divergence on
``|ΔE| ≥ Emax`` with NaN ⇒ ∞ (``nuts.py:353-358``), and the per-chain
early-treedepth cap (``nuts.py:205-208``). Merges are performed
*in place* on the stack (slot ``h-1 ← merge(slot h-1, slot h)``), the
same post-order traversal as the XLA kernel.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..math import round_up

from ..integration import INTEGRATOR_COEFFS

__all__ = ["PallasModelSpec", "build_trajectory_op", "padded_dim"]

_LANE = 128
_N_SCALARS = 4  # packed per stack slot: energy, logp, log_size, lwas

# column indices in the packed (C, 8) scalar input
_IN_LOGP, _IN_EPS, _IN_MAXDEPTH = 0, 1, 2
_N_IN = 8
# column indices in the packed (C, 16) scalar output
(_O_ENERGY, _O_LOGP, _O_LS, _O_LW, _O_MEC,
 _O_DEPTH, _O_NLV, _O_DIV, _O_TURN) = range(9)
_N_OUT = 16
# columns in the f32 scalar scratch
_S_CE, _S_CLP, _S_PRE, _S_PRLP = range(4)
# columns in the i32 scalar scratch
_M_BLD, _M_MRG, _M_SDV, _M_STN, _M_RNG = range(5)




def padded_dim(n: int) -> int:
    """Padded feature width used by the trajectory kernel for ``n`` params.

    Model constants that multiply against positions (e.g. a precision
    matrix) must be zero-padded to this width.
    """
    return round_up(n + _N_SCALARS, _LANE)


def usable_chain_count(chains: int, chain_block: int = 512) -> bool:
    """Whether the trajectory kernel can block ``chains`` (divisor >= 8).

    Mirrors the CB-resolution rule in :func:`build_trajectory_op`: start
    at ``min(chain_block, chains)`` and halve until it divides.
    """
    cb = min(chain_block, chains)
    while chains % cb:
        cb //= 2
    return cb >= 8


class PallasModelSpec:
    """An inlineable model for the whole-trajectory Pallas kernel.

    ``fn(q_pad, *consts) -> (logp, grad)`` is traced *inside* the kernel:
    ``q_pad`` is ``(CB, Npad)`` with columns ``n:`` zero, ``logp`` must be
    ``(CB, 1)`` and ``grad`` ``(CB, Npad)`` (padding columns of the grad
    are masked off by the kernel, so the fn may leave garbage there).
    ``consts`` are arrays resident in VMEM for the whole trajectory
    (e.g. a padded precision matrix); every row block sees the full
    arrays. Hash/eq are identity so kernel builders can be memoized.

    Small-n models may additionally provide a *lane-packed* variant
    (``pack > 1`` in :func:`build_trajectory_op` packs ``K`` chains per
    128-lane VPU row, each in a ``SEG = 128 // K``-lane segment):

    - ``packed_fn(q, h, *consts) -> (logp, grad)`` with ``q``
      ``(rows, 128)`` (each row = K chains), ``logp`` ``(rows, K)``
      (one per segment), ``grad`` ``(rows, 128)``. ``h`` is a helper
      namespace: ``h.segsum(x)`` per-segment row sums ``-> (rows, K)``,
      ``h.bc(s)`` broadcast ``(rows, K) -> (rows, 128)``, ``h.colm``
      within-segment column iota, plus ``h.K``, ``h.SEG``, ``h.n``.
    - ``packed_consts(K, SEG) -> tuple`` builds the matching VMEM
      constants (e.g. data rows tiled once per segment).
    """

    def __init__(self, fn: Callable, consts: Tuple[jax.Array, ...], ndim: int,
                 packed_fn: Optional[Callable] = None,
                 packed_consts: Optional[Callable] = None):
        self.fn = fn
        self.consts = tuple(consts)
        self.ndim = int(ndim)
        self.packed_fn = packed_fn
        self.packed_consts = packed_consts


def _uniform(shape):
    """U(0, 1) from the on-core PRNG; strictly inside (0, 1).

    ``prng_random_bits`` returns *signed* int32 — bitcast to uint32 first
    so the shift is logical, not arithmetic (a signed shift yields values
    in (-0.5, 0.5): wrong sign half the time).
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    bits24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)  # top bits zero
    return (bits24.astype(jnp.float32) + 0.5) * (1.0 / (1 << 24))


def _fmix32(x):
    """murmur3 32-bit finalizer on uint32 arrays (plain XLA ops).

    Drives the pluggable *counter* PRNG (``prng="counter"``) that serves
    interpret mode: ``pltpu.prng_seed`` has no CPU lowering, so CPU CI
    runs the kernel's merge/U-turn/packing logic with this stream
    instead. Statistically equivalent, not bitwise.
    """
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> jnp.uint32(16))
    return x


class _PackHelpers:
    """Segment helpers handed to lane-packed model fns."""

    def __init__(self, segsum, bc, colm, K, SEG, n, qmask):
        self.segsum = segsum
        self.bc = bc
        self.colm = colm
        self.K = K
        self.SEG = SEG
        self.n = n
        self.qmask = qmask


class _Lanes:
    """Lane-layout helpers shared by the per-draw and fused kernels.

    Encapsulates the packed-row plumbing: per-chain scalar <-> lane-row
    conversion, segment sums/broadcasts, and the stack-slot scalar
    packing. K = 1: a chain owns its whole row; scalars are ``(RW, 1)``
    columns and numpy broadcasting does the rest. K > 1: per-chain
    scalars are ``(RW, K)``; segment sums and broadcasts are MXU dots
    against iota-built 0/1 indicator matrices (cheap:
    ``(RW, Npad) @ (Npad, K)`` and back).
    """

    def __init__(self, n, Npad, RW, K):
        SEG = Npad // K
        self.n, self.Npad, self.RW, self.K, self.SEG = n, Npad, RW, K, SEG
        col = lax.broadcasted_iota(jnp.int32, (RW, Npad), 1)
        colm = col % SEG if K > 1 else col  # within-segment column
        self.col, self.colm = col, colm
        self.qmask = colm < n

        if K == 1:
            def finite(x):
                return x

            def segsum(x):
                return jnp.sum(x, axis=1, keepdims=True)

            def bc(s):
                return s  # (RW, 1) broadcasts natively

            def bcb(m):
                return m
        else:
            li = lax.broadcasted_iota(jnp.int32, (Npad, K), 0)
            ji = lax.broadcasted_iota(jnp.int32, (Npad, K), 1)
            seg_ind_t = (li // SEG == ji).astype(jnp.float32)  # (Npad, K)
            lj = lax.broadcasted_iota(jnp.int32, (K, Npad), 0)
            lc = lax.broadcasted_iota(jnp.int32, (K, Npad), 1)
            seg_ind = (lc // SEG == lj).astype(jnp.float32)    # (K, Npad)

            def finite(x):
                # Aborted chains integrate inf/NaN garbage by design (all
                # consumers are masked), but a 0/1-indicator dot computes
                # 0 * inf = NaN and would poison the chain's row-mates
                # (measured: ~1.6% spurious divergences on the funnel).
                # Clamp to +-1e30: the owning segment still sums to a
                # huge |dE| and trips its own divergence check; segment
                # sums stay < 128 * 1e30 (no overflow), neighbors exact.
                return jnp.clip(jnp.where(jnp.isnan(x), 1e30, x),
                                -1e30, 1e30)

            # exact-f32 dots: these carry energies, step sizes, and
            # log-weights; default (bf16-input) MXU precision truncates
            # them enough to fake divergences on wide-dynamic-range
            # targets (measured: funnel-10d at 94% divergence rate)
            def segsum(x):
                return jnp.dot(finite(x), seg_ind_t, precision="highest",
                               preferred_element_type=jnp.float32)

            def bc(s):
                return jnp.dot(finite(s), seg_ind, precision="highest",
                               preferred_element_type=jnp.float32)

            def bcb(m):
                return bc(m.astype(jnp.float32)) > 0.5

        self.finite = finite
        self.segsum = segsum
        self.bc = bc
        self.bcb = bcb

        n_sc = _N_SCALARS
        qmask = self.qmask
        if K == 1:
            def pack_slot(qv, e, lp_, ls, lw):
                x = jnp.where(qmask, qv, 0.0)
                x = x + e * (col == n) + lp_ * (col == n + 1)
                x = x + ls * (col == n + 2) + lw * (col == n + 3)
                return x

            def unpack_slot(x):
                qv = jnp.where(qmask, x, 0.0)
                return (qv, x[:, n:n + 1], x[:, n + 1:n + 2],
                        x[:, n + 2:n + 3], x[:, n + 3:n + 4])
        else:
            # one (Npad, 4K) indicator: lane (j*SEG + n + c) <-> scalar
            # (c, chain j); pack/unpack of all four slot scalars is a
            # single MXU dot each way
            ul = lax.broadcasted_iota(jnp.int32, (Npad, n_sc * K), 0)
            um = lax.broadcasted_iota(jnp.int32, (Npad, n_sc * K), 1)
            slot_ind_t = (ul == (um % K) * SEG + n + um // K).astype(
                jnp.float32)  # (Npad, 4K)
            sl = lax.broadcasted_iota(jnp.int32, (n_sc * K, Npad), 0)
            sc = lax.broadcasted_iota(jnp.int32, (n_sc * K, Npad), 1)
            slot_ind = (sc == (sl % K) * SEG + n + sl // K).astype(
                jnp.float32)  # (4K, Npad)

            def pack_slot(qv, e, lp_, ls, lw):
                scal = jnp.concatenate([e, lp_, ls, lw], axis=1)  # (RW, 4K)
                return jnp.where(qmask, qv, 0.0) + jnp.dot(
                    finite(scal), slot_ind, precision="highest",
                    preferred_element_type=jnp.float32)

            def unpack_slot(x):
                u = jnp.dot(finite(x), slot_ind_t, precision="highest",
                            preferred_element_type=jnp.float32)
                return (jnp.where(qmask, x, 0.0), u[:, 0:K], u[:, K:2 * K],
                        u[:, 2 * K:3 * K], u[:, 3 * K:4 * K])

        self.pack_slot = pack_slot
        self.unpack_slot = unpack_slot

    def make_model(self, model_fn, consts):
        """Wrap the spec's model fn: pads masked, helpers for packed fns."""
        qmask = self.qmask
        if self.K == 1:
            def model(q):
                logp, grad = model_fn(q, *consts)
                return logp, jnp.where(qmask, grad, 0.0)
        else:
            helpers = _PackHelpers(self.segsum, self.bc, self.colm,
                                   self.K, self.SEG, self.n, qmask)

            def model(q):
                logp, grad = model_fn(q, helpers, *consts)
                return logp, jnp.where(qmask, grad, 0.0)
        return model

    def make_velocities(self, V, metric):
        """(velE, velC): energy-critical and decision-only velocity fns."""
        if metric == "diag":
            # per-chain inverse-mass diagonal: velocity = V * p (fuses)
            def velE(p_):
                return V * p_

            return velE, velE
        # shared covariance (inverse mass): velocity = p @ COV.
        # Energy-critical velocities (drift, kinetic) use the bf16x3
        # split (f32-grade, ~2^-21 relative — Mosaic has no 3-pass HIGH
        # and "highest" costs 6 passes; at realistic tree depths the two
        # velocity matmuls per leaf are ~2/3 of the dense kernel's MXU
        # time). U-turn *decision* velocities use the fast default (any
        # deterministic stopping rule is valid, and the decisions are
        # insensitive at the 1e-3 level).
        from ..math import dot_f32x3

        def velE(p_):
            return dot_f32x3(p_, V)

        def velC(p_):
            return jnp.dot(p_, V, preferred_element_type=jnp.float32)

        return velE, velC


def _make_counter_uniform(lanes, si, seed0_expr, seed1_expr):
    """Counter PRNG (interpret-mode / CPU CI path).

    Per-lane salt from (seed words, block id, chain index), a shared call
    counter in the i32 scratch (zero-initialized by the transition),
    murmur3-mixed per call. Plain XLA ops, lowers everywhere. Supports
    per-chain ``(RW, K)`` draws and full-row ``(RW, Npad)`` draws (the
    fused kernel's momentum refresh) off the same counter with
    stream-separated salts.
    """
    RW, K, Npad = lanes.RW, lanes.K, lanes.Npad
    row_i = lax.broadcasted_iota(jnp.int32, (RW, K), 0)
    seg_i = lax.broadcasted_iota(jnp.int32, (RW, K), 1)
    lane = row_i * K + seg_i
    base = seed0_expr
    s1u = (jnp.asarray(seed1_expr).astype(jnp.uint32)
           * jnp.uint32(0x9E3779B9))
    salt = _fmix32((base + lane * 101027).astype(jnp.uint32) ^ s1u)
    row_r = lax.broadcasted_iota(jnp.int32, (RW, Npad), 0)
    col_r = lax.broadcasted_iota(jnp.int32, (RW, Npad), 1)
    lane_r = row_r * Npad + col_r
    salt_row = _fmix32(
        (base + lane_r * 65063 + 17).astype(jnp.uint32) ^ s1u)

    def uniform(shape):
        c = si[:, _M_RNG * K:(_M_RNG + 1) * K] + 1
        si[:, _M_RNG * K:(_M_RNG + 1) * K] = c
        s = salt_row if shape == (RW, Npad) else salt
        cc = c[:, 0:1].astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
        x = _fmix32(s ^ cc)
        # top 8 bits cleared -> exact through int32 (Mosaic has no
        # direct uint32 -> f32 cast, so this also lowers on TPU)
        bits24 = (x >> jnp.uint32(8)).astype(jnp.int32)
        return (bits24.astype(jnp.float32) + 0.5) * (1.0 / (1 << 24))

    return uniform


def _run_transition(lanes, refs, model, uniform, velE, velC, Emax,
                    q0v, p0v, g0v, lp0, E0, eps_v, mdc_v):
    """One whole NUTS transition operating on VMEM scratch refs.

    Shared by the per-draw kernel (one transition per ``pallas_call``)
    and the fused kernel (T transitions per call, one per grid step).
    Inputs are *values*: the start state ``(q0v, p0v, g0v, lp0, E0)``,
    per-chain step sizes ``eps_v`` and depth caps ``mdc_v`` (both
    ``(RW, K)``). On return the proposal lives in ``refs['pr_q']`` /
    ``sf`` columns ``_S_PRE``/``_S_PRLP``, and the packed output block
    ``refs['so']`` holds the tree accumulators (``_O_LS`` .. ``_O_TURN``).
    """
    RW, K, Npad = lanes.RW, lanes.K, lanes.Npad
    segsum, bc, bcb = lanes.segsum, lanes.bc, lanes.bcb
    pack_slot, unpack_slot = lanes.pack_slot, lanes.unpack_slot
    neg_inf = float("-inf")

    l_q, l_p, l_g = refs["l_q"], refs["l_p"], refs["l_g"]
    r_q, r_p, r_g = refs["r_q"], refs["r_p"], refs["r_g"]
    c_q, c_p, c_g = refs["c_q"], refs["c_p"], refs["c_g"]
    pr_q, psum = refs["pr_q"], refs["psum"]
    sf, si, so = refs["sf"], refs["si"], refs["so"]
    s_lp, s_rp, s_ps, s_q = refs["s_lp"], refs["s_rp"], refs["s_ps"], refs["s_q"]

    l_q[:] = q0v; l_p[:] = p0v; l_g[:] = g0v
    r_q[:] = q0v; r_p[:] = p0v; r_g[:] = g0v
    pr_q[:] = q0v
    psum[:] = p0v
    ocol = lax.broadcasted_iota(jnp.int32, (RW, _N_OUT * K), 1)
    si[:] = jnp.zeros((RW, _LANE), jnp.int32)
    # packed accumulators: ls=0, lw=-inf, mec=0, depth=0, nlv=0, div=0, trn=0
    so[:] = jnp.where(ocol // K == _O_LW, neg_inf, 0.0)

    max_sched = jnp.max(mdc_v).astype(jnp.int32)

    def sfc(c):
        return sf[:, c * K:(c + 1) * K]

    def soc(c):
        return so[:, c * K:(c + 1) * K]

    def set_sf(c, v):
        sf[:, c * K:(c + 1) * K] = v

    def set_so(c, v):
        so[:, c * K:(c + 1) * K] = v

    def sic(c):
        return si[:, c * K:(c + 1) * K]

    def set_si(c, v):
        si[:, c * K:(c + 1) * K] = v

    # f32 scalar scratch init: c_e, c_lp, pr_e, pr_lp
    sf[:] = jnp.zeros((RW, _LANE), jnp.float32)
    set_sf(_S_CE, E0)
    set_sf(_S_PRE, E0)
    set_sf(_S_CLP, lp0)
    set_sf(_S_PRLP, lp0)

    b_coef, a_coef = refs["coeffs"]

    def rowdot(a, bb):
        return segsum(a * bb)

    def logbern(log_p):
        # NaN log_p yields False (reference math.py:21-25 raises; we mask)
        return jnp.log(uniform((RW, K))) < log_p

    def outer_body(carry):
            depth, _ = carry
            active = ((soc(_O_DIV) == 0) & (soc(_O_TURN) == 0)
                      & (soc(_O_DEPTH) < mdc_v))
            go_right = uniform((RW, K)) < 0.5
            go_right_b = bcb(go_right)
            epss = bc(jnp.where(go_right, eps_v, -eps_v))
            c_q[:] = jnp.where(go_right_b, r_q[:], l_q[:])
            c_p[:] = jnp.where(go_right_b, r_p[:], l_p[:])
            c_g[:] = jnp.where(go_right_b, r_g[:], l_g[:])
            set_si(_M_BLD, active.astype(jnp.int32))
            set_si(_M_SDV, jnp.zeros((RW, K), jnp.int32))
            set_si(_M_STN, jnp.zeros((RW, K), jnp.int32))
            n_total = jnp.left_shift(jnp.int32(1), depth)

            def leaf_body(lcarry):
                leaf_idx, h, _ = lcarry
                bld = sic(_M_BLD) != 0

                # --- one symplectic step (reference integration.py:100-121) ---
                pn = c_p[:] + (b_coef[0] * epss) * c_g[:]
                qn = c_q[:]
                lpn = sfc(_S_CLP)
                gn = c_g[:]
                for i, ai in enumerate(a_coef):
                    qn = qn + (ai * epss) * velE(pn)
                    lpn, gn = model(qn)
                    pn = pn + (b_coef[i + 1] * epss) * gn
                en = 0.5 * segsum(pn * velE(pn)) - lpn

                # Aborted lanes are NOT frozen: they keep integrating
                # garbage, but every consumer of their values is masked
                # (by `bld` below, by `ok` at the tree level), and the
                # freeze's read-modify-write costs more than it saves.
                c_q[:] = qn
                c_p[:] = pn
                c_g[:] = gn
                set_sf(_S_CE, en)
                set_sf(_S_CLP, lpn)

                dE = en - E0
                dE = jnp.where(jnp.isnan(dE), jnp.inf, dE)
                upd = bld & (jnp.abs(dE) > jnp.abs(soc(_O_MEC)))
                set_so(_O_MEC, jnp.where(upd, dE, soc(_O_MEC)))
                div_leaf = bld & ~(jnp.abs(dE) < Emax)
                set_so(_O_NLV, soc(_O_NLV) + bld.astype(jnp.float32))

                # Leaf-level stack slots hold left_p == right_p == p_sum,
                # so an *even* leaf (no immediate merge) writes only s_ps
                # and s_q; an *odd* leaf is never pushed at all — its
                # first merge consumes it straight from the working
                # registers (peeled below). Slots at height < h are always
                # merge results and carry all three momenta. (Aborted
                # lanes still write garbage into slots they never read.)
                lpaw = -dE + jnp.minimum(0.0, -dE)
                leaf_q_packed = pack_slot(c_q[:], sfc(_S_CE), sfc(_S_CLP),
                                          -dE, lpaw)

                set_si(_M_MRG, (bld & ~div_leaf).astype(jnp.int32))
                is_odd = (leaf_idx & 1) == 1
                go_m0 = jnp.sum(sic(_M_MRG)) > 0

                @pl.when(jnp.logical_not(is_odd))
                def _push_leaf():
                    s_ps[pl.ds(h, 1)] = c_p[:].reshape(1, RW, Npad)
                    s_q[pl.ds(h, 1)] = leaf_q_packed.reshape(1, RW, Npad)

                @pl.when(is_odd & go_m0)
                def _first_merge():
                    # leaf (+) leaf: t1 = the even leaf at slot h-1
                    # (lp == rp == ps, one momentum read), t2 = this
                    # leaf, still in registers. The overlap U-turn
                    # checks are identities here (ps1 == ps2 == ps), so
                    # 2 metric applications + 2 dots suffice — vs the
                    # generic merge's 8 reads / 4 velC / 6 dots.
                    mrg = sic(_M_MRG) != 0
                    t1_p = s_ps[pl.ds(h - 1, 1)].reshape(RW, Npad)
                    t1_q, t1_e, t1_lpp, t1_ls, t1_lw = unpack_slot(
                        s_q[pl.ds(h - 1, 1)].reshape(RW, Npad))
                    t2_p = c_p[:]
                    ps = t1_p + t2_p
                    turn = ((rowdot(ps, velC(t1_p)) <= 0)
                            | (rowdot(ps, velC(t2_p)) <= 0))
                    t2_ls = -dE
                    ls = jnp.logaddexp(t1_ls, t2_ls)
                    lw = jnp.logaddexp(t1_lw, lpaw)
                    take2 = logbern(t2_ls - ls)
                    mq = jnp.where(bcb(take2), c_q[:], t1_q)
                    me = jnp.where(take2, sfc(_S_CE), t1_e)
                    mlp = jnp.where(take2, sfc(_S_CLP), t1_lpp)
                    s_lp[pl.ds(h - 1, 1)] = t1_p.reshape(1, RW, Npad)
                    s_rp[pl.ds(h - 1, 1)] = t2_p.reshape(1, RW, Npad)
                    s_ps[pl.ds(h - 1, 1)] = ps.reshape(1, RW, Npad)
                    s_q[pl.ds(h - 1, 1)] = pack_slot(
                        mq, me, mlp, ls, lw).reshape(1, RW, Npad)
                    set_si(_M_MRG, (mrg & ~turn).astype(jnp.int32))

                # --- remaining in-place merges: one per trailing one-bit
                # of leaf_idx past bit 0; both inputs are merged slots ---

                def merge_body(mc):
                    j, hh, _ = mc
                    mrg = sic(_M_MRG) != 0
                    t1_lp = s_lp[pl.ds(hh - 1, 1)].reshape(RW, Npad)
                    t1_rp = s_rp[pl.ds(hh - 1, 1)].reshape(RW, Npad)
                    t1_ps = s_ps[pl.ds(hh - 1, 1)].reshape(RW, Npad)
                    t1_q, t1_e, t1_lpp, t1_ls, t1_lw = unpack_slot(
                        s_q[pl.ds(hh - 1, 1)].reshape(RW, Npad))
                    t2_lp = s_lp[pl.ds(hh, 1)].reshape(RW, Npad)
                    t2_rp = s_rp[pl.ds(hh, 1)].reshape(RW, Npad)
                    t2_ps = s_ps[pl.ds(hh, 1)].reshape(RW, Npad)
                    t2_q, t2_e, t2_lpp, t2_ls, t2_lw = unpack_slot(
                        s_q[pl.ds(hh, 1)].reshape(RW, Npad))

                    # 3-way generalized U-turn (reference nuts.py:389-398);
                    # boundary velocities recomputed from momenta, each
                    # metric application done once and reused across the
                    # span + overlap checks (j starts at 1 — the j == 0
                    # leaf-leaf merge is peeled into _first_merge).
                    vt1lp = velC(t1_lp)
                    vt1rp = velC(t1_rp)
                    vt2lp = velC(t2_lp)
                    vt2rp = velC(t2_rp)
                    ps = t1_ps + t2_ps
                    turn = ((rowdot(ps, vt1lp) <= 0)
                            | (rowdot(ps, vt2rp) <= 0))
                    ps1 = t1_ps + t2_lp
                    turn1 = ((rowdot(ps1, vt1lp) <= 0)
                             | (rowdot(ps1, vt2lp) <= 0))
                    ps2 = t1_rp + t2_ps
                    turn2 = ((rowdot(ps2, vt1rp) <= 0)
                             | (rowdot(ps2, vt2rp) <= 0))
                    turn = turn | turn1 | turn2

                    ls = jnp.logaddexp(t1_ls, t2_ls)
                    lw = jnp.logaddexp(t1_lw, t2_lw)
                    take2 = logbern(t2_ls - ls)
                    mq = jnp.where(bcb(take2), t2_q, t1_q)
                    me = jnp.where(take2, t2_e, t1_e)
                    mlp = jnp.where(take2, t2_lpp, t1_lpp)

                    s_lp[pl.ds(hh - 1, 1)] = t1_lp.reshape(1, RW, Npad)
                    s_rp[pl.ds(hh - 1, 1)] = t2_rp.reshape(1, RW, Npad)
                    s_ps[pl.ds(hh - 1, 1)] = ps.reshape(1, RW, Npad)
                    s_q[pl.ds(hh - 1, 1)] = pack_slot(mq, me, mlp, ls, lw).reshape(
                        1, RW, Npad)

                    nxt_mrg = (mrg & ~turn).astype(jnp.int32)
                    set_si(_M_MRG, nxt_mrg)
                    go_m = jnp.sum(nxt_mrg) > 0
                    return (j + 1, hh - 1, go_m)

                def merge_cond(mc):
                    j, hh, go_m = mc
                    more = jnp.bitwise_and(
                        jnp.right_shift(leaf_idx, j), jnp.int32(1)) == 1
                    return more & go_m

                go_m1 = is_odd & (jnp.sum(sic(_M_MRG)) > 0)
                _, h_post, _ = lax.while_loop(
                    merge_cond, merge_body,
                    (jnp.int32(1), h - is_odd.astype(jnp.int32), go_m1))

                merging0 = bld & ~div_leaf
                turned = merging0 & ~(sic(_M_MRG) != 0)
                # lanes with no merges scheduled keep m_mrg set: turned=False
                set_si(_M_SDV, jnp.maximum(sic(_M_SDV), div_leaf.astype(jnp.int32)))
                set_si(_M_STN, jnp.maximum(sic(_M_STN), turned.astype(jnp.int32)))
                nxt_bld = (bld & ~div_leaf & ~turned).astype(jnp.int32)
                set_si(_M_BLD, nxt_bld)
                go_l = jnp.sum(nxt_bld) > 0
                return (leaf_idx + 1, h_post + 1, go_l)

            def leaf_cond(lcarry):
                leaf_idx, _, go_l = lcarry
                return (leaf_idx < n_total) & go_l

            go_l0 = jnp.sum(sic(_M_BLD)) > 0
            lax.while_loop(leaf_cond, leaf_body,
                           (jnp.int32(0), jnp.int32(0), go_l0))

            # the completed subtree is stack slot 0; a depth-0 subtree is
            # a bare leaf whose slot holds only s_ps/s_q (lp == rp == ps)
            n_ps = s_ps[pl.ds(0, 1)].reshape(RW, Npad)
            leaf_tree = depth == 0
            n_lp = jnp.where(leaf_tree, n_ps,
                             s_lp[pl.ds(0, 1)].reshape(RW, Npad))
            n_rp = jnp.where(leaf_tree, n_ps,
                             s_rp[pl.ds(0, 1)].reshape(RW, Npad))
            n_q, n_e, n_lpp, n_ls, n_lw = unpack_slot(
                s_q[pl.ds(0, 1)].reshape(RW, Npad))

            sdiv = sic(_M_SDV) != 0
            strn = sic(_M_STN) != 0
            ok = active & ~sdiv & ~strn

            # multinomial swap vs the old tree weight (nuts.py:321-323)
            take_new = ok & logbern(n_ls - soc(_O_LS))
            pr_q[:] = jnp.where(bcb(take_new), n_q, pr_q[:])
            set_sf(_S_PRE, jnp.where(take_new, n_e, sfc(_S_PRE)))
            set_sf(_S_PRLP, jnp.where(take_new, n_lpp, sfc(_S_PRLP)))
            set_so(_O_LS, jnp.where(ok, jnp.logaddexp(soc(_O_LS), n_ls),
                                    soc(_O_LS)))
            set_so(_O_LW, jnp.where(ok, jnp.logaddexp(soc(_O_LW), n_lw),
                                    soc(_O_LW)))
            old_ps = psum[:]
            ok_b = bcb(ok)
            psum[:] = jnp.where(ok_b, old_ps + n_ps, old_ps)

            upd_l = bcb(ok & ~go_right)
            upd_r = bcb(ok & go_right)
            old_l_p = l_p[:]
            old_r_p = r_p[:]
            l_q[:] = jnp.where(upd_l, c_q[:], l_q[:])
            l_p[:] = jnp.where(upd_l, c_p[:], l_p[:])
            l_g[:] = jnp.where(upd_l, c_g[:], l_g[:])
            r_q[:] = jnp.where(upd_r, c_q[:], r_q[:])
            r_p[:] = jnp.where(upd_r, c_p[:], r_p[:])
            r_g[:] = jnp.where(upd_r, c_g[:], r_g[:])

            # 3-way U-turn on the merged span (nuts.py:332-340)
            pst = psum[:]
            tf = (rowdot(pst, velC(l_p[:])) <= 0) | (rowdot(pst, velC(r_p[:])) <= 0)
            ps1 = jnp.where(go_right_b, old_ps + n_lp, n_ps + old_l_p)
            p1a = jnp.where(go_right_b, old_l_p, n_rp)
            p1b = jnp.where(go_right_b, n_lp, old_l_p)
            t1c = (rowdot(ps1, velC(p1a)) <= 0) | (rowdot(ps1, velC(p1b)) <= 0)
            ps2 = jnp.where(go_right_b, old_r_p + n_ps, n_lp + old_ps)
            p2a = jnp.where(go_right_b, old_r_p, n_lp)
            p2b = jnp.where(go_right_b, n_rp, old_r_p)
            t2c = (rowdot(ps2, velC(p2a)) <= 0) | (rowdot(ps2, velC(p2b)) <= 0)
            turning_new = tf | t1c | t2c

            # masks stay int/float valued: Mosaic cannot select between
            # i1 vector values
            sel_turn = jnp.where(ok, turning_new.astype(jnp.float32),
                                 strn.astype(jnp.float32))
            set_so(_O_TURN, jnp.maximum(soc(_O_TURN),
                                        jnp.where(active, sel_turn, 0.0)))
            set_so(_O_DIV, jnp.maximum(soc(_O_DIV),
                                       jnp.where(active & sdiv, 1.0, 0.0)))
            set_so(_O_DEPTH, soc(_O_DEPTH) + active.astype(jnp.float32))

            nxt = ((soc(_O_DIV) == 0) & (soc(_O_TURN) == 0)
                   & (soc(_O_DEPTH) < mdc_v))
            cont = ((depth + 1) < max_sched) & jnp.any(nxt)
            return (depth + 1, cont)

    def outer_cond(carry):
        depth, cont = carry
        return cont

    cont0 = max_sched > 0
    lax.while_loop(outer_cond, outer_body, (jnp.int32(0), cont0))


def lowrank_fac_rows(k: int) -> int:
    """Rows of the shared low-rank factor block: ``k`` ``Vᵀ`` rows plus a
    λ row and an α row, padded to the f32 sublane tile. The single
    source of truth for every kernel's VMEM estimate and packing."""
    return ((k + 2 + 7) // 8) * 8


def build_lowrank_fac(Vf, lam_f, alpha_f, n: int, Npad: int):
    """Pack ``(V, λ, α)`` into the ``(FR, Npad)`` factor block the
    kernels slice (:func:`_make_lowrank_velocities`)."""
    k = Vf.shape[1]
    facp = jnp.zeros((lowrank_fac_rows(k), Npad), jnp.float32)
    facp = facp.at[:k, :n].set(Vf.astype(jnp.float32).T)
    facp = facp.at[k, :k].set(lam_f.astype(jnp.float32))
    facp = facp.at[k + 1, :].set(jnp.asarray(alpha_f, jnp.float32))
    return facp


def _make_lowrank_velocities(stds, fac, kf: int):
    """Velocity closures for the spiked (low-rank+diag) metric.

    ``stds`` is the per-chain ``(RW, Npad)`` diagonal scale (zero past
    column n); ``fac`` is the shared factor block: rows ``0..kf-1`` hold
    ``Vᵀ`` (zero past column n), row ``kf`` holds the eigenvalues λ in
    lanes ``0..kf-1``, row ``kf+1`` holds the residual-bulk α broadcast
    into every lane. ``velocity(p) = S(α x + V((λ−α)·(Vᵀx)))`` with
    ``x = S p`` — two elementwise rows plus two thin ``(RW, Npad) x
    (Npad, kf)``-shaped MXU matmuls, the same construct family as the
    dense metric's ``p @ COV``. Only static lane slices are used
    (Mosaic has no dynamic lane indexing).
    """
    Vt = fac[:kf, :]                      # (kf, Npad)
    lam_k = fac[kf:kf + 1, :kf]           # (1, kf)
    alpha_row = fac[kf + 1:kf + 2, :]     # (1, Npad), α in every lane
    alpha_k = fac[kf + 1:kf + 2, :kf]     # (1, kf)

    def _vel(p_, precision):
        x = stds * p_
        c = jax.lax.dot_general(
            x, Vt, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        y = alpha_row * x + jnp.dot(
            c * (lam_k - alpha_k), Vt,
            precision=precision, preferred_element_type=jnp.float32)
        return stds * y

    def velE(p_):
        return _vel(p_, "highest")

    def velC(p_):
        # U-turn decisions tolerate the fast default (see make_velocities)
        return _vel(p_, None)

    return velE, velC


def _build_kernel_body(model_fn, n_consts, n, Npad, CB, D, Emax, coeffs,
                       metric="diag", prng="tpu", pack=1, lowrank_k=0):
    """The per-draw kernel: one NUTS transition per ``pallas_call``."""
    del D  # stack depth is carried by the scratch ref shapes
    K = int(pack)           # chains per VPU row
    RW = CB // K            # physical rows per block
    SEG = Npad // K         # lanes per chain segment
    assert CB % K == 0 and Npad % K == 0 and SEG >= n + _N_SCALARS

    def kernel(seed_ref, q0, p0, g0, sin, var, *rest):
        if metric == "lowrank":
            fac_ref, rest = rest[0], rest[1:]
        consts_refs = rest[:n_consts]
        q_out, g_out, so = rest[n_consts:n_consts + 3]
        (l_q, l_p, l_g, r_q, r_p, r_g, c_q, c_p, c_g, pr_q, psum,
         sf, si, s_lp, s_rp, s_ps, s_q) = rest[n_consts + 3:]

        # 64 bits of per-draw entropy (both threefry key words) plus the
        # block id folded into the first word (prng_seed takes at most
        # two values): 32 bits alone would birthday-collide within ~77k
        # draws, replaying identical direction/swap streams.
        if prng == "tpu":
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 7919, seed_ref[1])
        consts = tuple(r[:] for r in consts_refs)
        lanes = _Lanes(n, Npad, RW, K)
        model = lanes.make_model(model_fn, consts)
        if metric == "lowrank":
            velE, velC = _make_lowrank_velocities(var[:], fac_ref[:],
                                                  lowrank_k)
        else:
            velE, velC = lanes.make_velocities(var[:], metric)

        refs = dict(
            l_q=l_q, l_p=l_p, l_g=l_g, r_q=r_q, r_p=r_p, r_g=r_g,
            c_q=c_q, c_p=c_p, c_g=c_g, pr_q=pr_q, psum=psum,
            sf=sf, si=si, so=so,
            s_lp=s_lp, s_rp=s_rp, s_ps=s_ps, s_q=s_q, coeffs=coeffs,
        )
        if prng == "tpu":
            uniform = _uniform
        else:
            uniform = _make_counter_uniform(
                lanes, si, seed_ref[0] + pl.program_id(0) * 7919, seed_ref[1])

        q = q0[:]
        p = p0[:]
        # per-chain scalar c lives in columns [c*K, (c+1)*K) of its buffer
        lp = sin[:, _IN_LOGP * K:(_IN_LOGP + 1) * K]
        eps_v = sin[:, _IN_EPS * K:(_IN_EPS + 1) * K]
        mdc_v = sin[:, _IN_MAXDEPTH * K:(_IN_MAXDEPTH + 1) * K]  # f32, small ints
        E0 = 0.5 * lanes.segsum(p * velE(p)) - lp

        _run_transition(lanes, refs, model, uniform, velE, velC, Emax,
                        q, p, g0[:], lp, E0, eps_v, mdc_v)

        q_out[:] = pr_q[:]
        lp_f, g_f = model(pr_q[:])
        del lp_f  # identical to the stored proposal logp (deterministic model)
        g_out[:] = g_f
        so[:, _O_ENERGY * K:(_O_ENERGY + 1) * K] = sf[:, _S_PRE * K:(_S_PRE + 1) * K]
        so[:, _O_LOGP * K:(_O_LOGP + 1) * K] = sf[:, _S_PRLP * K:(_S_PRLP + 1) * K]

    return kernel


def resolve_pack(spec: "PallasModelSpec", n: int, local_chains: int) -> int:
    """Lane-pack factor for a run: ``natural_pack`` demoted until the
    per-device chain shard still blocks into >= 8 rows. Shared by the
    NUTS and HMC kernel builders."""
    pack = 1
    if spec.packed_fn is not None:
        pack = natural_pack(n)
        while pack > 1 and local_chains % (8 * pack) != 0:
            pack //= 2
    return pack


def natural_pack(n: int, max_pack: int = 16) -> int:
    """Largest lane-packing factor for an ``n``-parameter model.

    K chains share a 128-lane row in segments of ``SEG = 128 // K``
    lanes; each segment needs ``n + 4`` lanes (params + slot scalars).
    Returns 1 when packing buys nothing (``n + 4 > 64``).
    """
    k = 1
    seg = _LANE
    while (
        k * 2 <= max_pack
        and seg // 2 >= n + _N_SCALARS
    ):
        k *= 2
        seg //= 2
    return k


@functools.lru_cache(maxsize=128)
def build_trajectory_op(
    spec: PallasModelSpec,
    n: int,
    max_treedepth: int,
    Emax: float,
    integrator: str = "leapfrog",
    chain_block: int = 512,
    interpret: bool = False,
    vmem_limit_bytes: int = 64 * 1024 * 1024,
    metric: str = "diag",
    prng: str | None = None,
    pack: int = 1,
):
    """Build ``traj(q, p, grad, logp, eps, max_depth_c, var, seed)``.

    Returns a jit-compatible function mapping the per-draw trajectory
    inputs (all ``(C, n)`` / ``(C,)``, plus a scalar int32 seed) to a
    dict of per-chain outputs (proposal q/grad/energy/logp, tree
    log-weights, depth, leaf count, divergence/turning flags, max
    energy change). Chains are processed in blocks of ``chain_block``
    (reduced to a divisor of C if needed).

    ``metric``: ``"diag"`` (``var`` is the per-chain ``(C, n)``
    inverse-mass diagonal), ``"dense"`` (``var`` is one ``(n, n)``
    covariance shared by all chains; velocities become matmuls in the
    kernel), or ``"lowrank"`` (``var`` is a ``(stds, V, lam, alpha)``
    tuple: per-chain ``(C, n)`` diagonal scales plus a shared
    orthonormal ``(n, k)`` basis, ``(k,)`` eigenvalues, and scalar
    residual bulk — the pooled ``QuadPotentialLowRankAdapt`` factor;
    velocities are thin ``(CB, Npad) @ (Npad, k)`` matmuls).

    ``prng``: ``"tpu"`` (on-core ``pltpu.prng_*``, TPU only) or
    ``"counter"`` (murmur3 counter stream in plain XLA ops — the only
    source that lowers under ``interpret=True``, so CPU CI can exercise
    the kernel's merge/U-turn/packing logic). Default: ``"counter"``
    when ``interpret`` else ``"tpu"``.

    ``pack``: lane-packing factor K. With K > 1, K chains share each
    128-lane VPU row (``SEG = 128 // K`` lanes per chain) so small-n
    models stop wasting ~90% of every vector op; requires a diagonal
    metric and a spec with a ``packed_fn``. See :func:`natural_pack`.
    """
    if prng is None:
        prng = "counter" if interpret else "tpu"
    coeffs = INTEGRATOR_COEFFS[integrator]
    K = int(pack)
    D = max_treedepth
    if K > 1:
        if metric != "diag":
            raise ValueError("lane packing requires a diagonal metric")
        if spec.packed_fn is None:
            raise ValueError("this PallasModelSpec has no packed_fn; "
                             "build with pack=1")
        Npad = _LANE
        SEG = Npad // K
        if SEG < n + _N_SCALARS:
            raise ValueError(
                f"pack={K} leaves {SEG}-lane segments but the model needs "
                f"{n + _N_SCALARS}; use pack <= {natural_pack(n)}")
        model_fn = spec.packed_fn
        consts = tuple(spec.packed_consts(K, SEG)) if spec.packed_consts else ()
    else:
        Npad = padded_dim(n)
        SEG = Npad
        model_fn = spec.fn
        consts = spec.consts
    n_consts = len(consts)

    def traj(q, p, grad, logp, eps, max_depth_c, var, seed):
        C = q.shape[0]
        CB = min(chain_block, C)
        while CB >= 1 and (C % CB or CB % K):
            CB //= 2
        if CB < 1 or CB // K < 8:
            raise ValueError(
                f"chains={C} has no usable chain-block divisor with >= 8 "
                f"rows at pack={K}; choose a chain count divisible by "
                f"{8 * K} (ideally a multiple of {chain_block}) for the "
                f"Pallas trajectory path"
            )
        if CB < min(chain_block, C):
            import logging

            logging.getLogger("littlemcmc_tpu").warning(
                "Pallas trajectory: chains=%d is not divisible by "
                "chain_block=%d; running %d sequential blocks of %d chains "
                "(choose a multiple of %d chains for peak throughput).",
                C, chain_block, C // CB, CB, chain_block,
            )
        RW = CB // K       # rows per block
        RT = C // K        # rows total

        f32 = jnp.float32

        def pack_rows(x2d):
            # (C, n) -> (RT, Npad): K chains per row, one SEG-lane segment
            # each, zero-padded past column n. K = 1 degenerates to the
            # plain pad (SEG == Npad).
            xp = jnp.pad(x2d.astype(f32), ((0, 0), (0, SEG - n)))
            return xp.reshape(RT, K * SEG)

        def pack_scal(v):
            return v.astype(f32).reshape(RT, K)

        qp = pack_rows(q)
        pp = pack_rows(p)
        gp = pack_rows(grad)
        facp = None
        lowrank_k = 0
        if metric == "diag":
            vp = pack_rows(var)
        elif metric == "lowrank":
            # var = (stds, V, lam, alpha): per-chain diagonal scale plus
            # the shared spiked factor, packed into one (FR, Npad) block
            # (Vᵀ rows, a λ row, an α-broadcast row)
            stds, Vf, lam_f, alpha_f = var
            vp = pack_rows(stds)
            lowrank_k = Vf.shape[1]
            facp = build_lowrank_fac(Vf, lam_f, alpha_f, n, Npad)
        else:  # shared (n, n) covariance, zero-padded square (K == 1)
            vp = jnp.pad(var.astype(f32), ((0, Npad - n), (0, Npad - n)))
        sin_w = _N_IN * K
        sin = jnp.zeros((RT, sin_w), f32)
        sin = sin.at[:, _IN_LOGP * K:(_IN_LOGP + 1) * K].set(pack_scal(logp))
        sin = sin.at[:, _IN_EPS * K:(_IN_EPS + 1) * K].set(pack_scal(eps))
        sin = sin.at[:, _IN_MAXDEPTH * K:(_IN_MAXDEPTH + 1) * K].set(
            pack_scal(max_depth_c))
        seed1 = jnp.asarray(seed, jnp.int32).reshape(-1)
        if seed1.shape[0] < 2:  # accept scalar seeds; duplicate the word
            seed1 = jnp.concatenate([seed1, seed1])
        seed1 = seed1[:2]

        grid = (RT // RW,)
        row_spec = pl.BlockSpec((RW, Npad), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        var_spec = (row_spec if metric in ("diag", "lowrank")
                    else pl.BlockSpec((Npad, Npad), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        fac_specs = []
        fac_args = []
        if metric == "lowrank":
            fac_specs = [pl.BlockSpec(facp.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)]
            fac_args = [facp]
        in_spec = pl.BlockSpec((RW, sin_w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        out_sc_spec = pl.BlockSpec((RW, _N_OUT * K), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
        const_specs = [
            pl.BlockSpec(cc.shape, (lambda i, _nd=cc.ndim: (0,) * _nd),
                         memory_space=pltpu.VMEM)
            for cc in consts
        ]

        out_shapes = [
            jax.ShapeDtypeStruct((RT, Npad), f32),         # proposal q
            jax.ShapeDtypeStruct((RT, Npad), f32),         # proposal grad
            jax.ShapeDtypeStruct((RT, _N_OUT * K), f32),   # packed scalars
        ]
        out_specs = [row_spec, row_spec, out_sc_spec]

        scratch = (
            [pltpu.VMEM((RW, Npad), f32)] * 11      # l/r/c states, pr_q, psum
            + [pltpu.VMEM((RW, _LANE), f32)]        # packed f32 scalars
            + [pltpu.VMEM((RW, _LANE), jnp.int32)]  # packed i32 masks
            + [pltpu.VMEM((D, RW, Npad), f32)] * 4  # merge stacks
        )

        kernel = _build_kernel_body(
            model_fn, n_consts, n, Npad, CB, D, float(Emax), coeffs,
            metric=metric, prng=prng, pack=K, lowrank_k=lowrank_k,
        )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      row_spec, row_spec, row_spec, in_spec, var_spec]
                     + fac_specs + const_specs,
            out_shape=out_shapes,
            out_specs=out_specs,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_bytes),
            interpret=interpret,
        )(seed1, qp, pp, gp, sin, vp, *fac_args, *consts)

        q_o, g_o, so = outs

        def unpack_rows(x):
            return x.reshape(C, SEG)[:, :n]

        def so_col(c):
            return so[:, c * K:(c + 1) * K].reshape(C)

        return dict(
            q=unpack_rows(q_o),
            grad=unpack_rows(g_o),
            energy=so_col(_O_ENERGY),
            logp=so_col(_O_LOGP),
            log_size=so_col(_O_LS),
            log_weighted_accept_sum=so_col(_O_LW),
            max_energy_change=so_col(_O_MEC),
            depth=so_col(_O_DEPTH).astype(jnp.int32),
            n_leaves=so_col(_O_NLV).astype(jnp.int32),
            diverging=so_col(_O_DIV) != 0,
            turning=so_col(_O_TURN) != 0,
        )

    return traj
