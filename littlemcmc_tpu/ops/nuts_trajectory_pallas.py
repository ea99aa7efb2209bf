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
from typing import Callable, Tuple

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
    """

    def __init__(self, fn: Callable, consts: Tuple[jax.Array, ...], ndim: int):
        self.fn = fn
        self.consts = tuple(consts)
        self.ndim = int(ndim)


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


def _build_kernel_body(model_fn, n_consts, n, Npad, CB, D, Emax, coeffs,
                       metric="diag", prng="tpu"):
    b_coef, a_coef = coeffs
    neg_inf = float("-inf")

    def kernel(seed_ref, q0, p0, g0, sin, var, *rest):
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
        col = lax.broadcasted_iota(jnp.int32, (CB, Npad), 1)
        qmask = col < n

        def model(q):
            logp, grad = model_fn(q, *consts)
            return logp, jnp.where(qmask, grad, 0.0)

        def pack(qv, e, lp_, ls, lw):
            x = jnp.where(qmask, qv, 0.0)
            x = x + e * (col == n) + lp_ * (col == n + 1)
            x = x + ls * (col == n + 2) + lw * (col == n + 3)
            return x

        def unpack(x):
            qv = jnp.where(qmask, x, 0.0)
            return (qv, x[:, n:n + 1], x[:, n + 1:n + 2],
                    x[:, n + 2:n + 3], x[:, n + 3:n + 4])

        V = var[:]
        if metric == "diag":
            # per-chain inverse-mass diagonal: velocity = V * p (fuses)
            def velE(p_):
                return V * p_

            velC = velE
        else:
            # shared covariance (inverse mass): velocity = p @ COV.
            # Energy-critical velocities (drift, kinetic) use exact f32;
            # U-turn *decision* velocities may use the fast default (any
            # deterministic stopping rule is valid, and the decisions are
            # insensitive at the 1e-3 level).
            def velE(p_):
                return jnp.dot(p_, V, precision="highest",
                               preferred_element_type=jnp.float32)

            def velC(p_):
                return jnp.dot(p_, V, preferred_element_type=jnp.float32)

        q = q0[:]
        p = p0[:]
        lp = sin[:, _IN_LOGP:_IN_LOGP + 1]
        eps_v = sin[:, _IN_EPS:_IN_EPS + 1]
        mdc_v = sin[:, _IN_MAXDEPTH:_IN_MAXDEPTH + 1]  # f32, small ints
        E0 = 0.5 * jnp.sum(p * velE(p), axis=1, keepdims=True) - lp

        l_q[:] = q; l_p[:] = p; l_g[:] = g0[:]
        r_q[:] = q; r_p[:] = p; r_g[:] = g0[:]
        pr_q[:] = q
        psum[:] = p
        ocol = lax.broadcasted_iota(jnp.int32, (CB, _N_OUT), 1)
        # f32 scalar scratch: c_e, c_lp, pr_e, pr_lp
        fcol = lax.broadcasted_iota(jnp.int32, (CB, _LANE), 1)
        sf[:] = (E0 * ((fcol == _S_CE) | (fcol == _S_PRE)).astype(jnp.float32)
                 + lp * ((fcol == _S_CLP) | (fcol == _S_PRLP)).astype(jnp.float32))
        si[:] = jnp.zeros((CB, _LANE), jnp.int32)
        # packed accumulators: ls=0, lw=-inf, mec=0, depth=0, nlv=0, div=0, trn=0
        so[:] = jnp.where(ocol == _O_LW, neg_inf, 0.0)

        max_sched = jnp.max(mdc_v).astype(jnp.int32)

        def sfc(c):
            return sf[:, c:c + 1]

        def soc(c):
            return so[:, c:c + 1]

        def set_sf(c, v):
            sf[:, c:c + 1] = v

        def set_so(c, v):
            so[:, c:c + 1] = v

        def sic(c):
            return si[:, c:c + 1]

        def set_si(c, v):
            si[:, c:c + 1] = v

        if prng == "tpu":
            uniform = _uniform
        else:
            # Counter PRNG (interpret-mode / CPU CI path): per-lane salt
            # from (seed words, block id, lane), a shared call counter in
            # the i32 scratch (zero-initialized above), murmur3-mixed per
            # call. Plain XLA ops only, so it lowers everywhere.
            lane = lax.broadcasted_iota(jnp.int32, (CB, 1), 0)
            base = seed_ref[0] + pl.program_id(0) * 7919
            salt = _fmix32(
                (base + lane * 101027).astype(jnp.uint32)
                ^ (jnp.asarray(seed_ref[1]).astype(jnp.uint32)
                   * jnp.uint32(0x9E3779B9))
            )

            def uniform(shape):
                del shape  # every consumer draws (CB, 1)
                c = sic(_M_RNG) + 1
                set_si(_M_RNG, c)
                x = _fmix32(salt ^ (c.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)))
                return ((x >> jnp.uint32(8)).astype(jnp.float32) + 0.5) * (
                    1.0 / (1 << 24))

        def rowdot(a, bb):
            return jnp.sum(a * bb, axis=1, keepdims=True)

        def logbern(log_p):
            # NaN log_p yields False (reference math.py:21-25 raises; we mask)
            return jnp.log(uniform((CB, 1))) < log_p

        def outer_body(carry):
            depth, _ = carry
            active = ((soc(_O_DIV) == 0) & (soc(_O_TURN) == 0)
                      & (soc(_O_DEPTH) < mdc_v))
            go_right = uniform((CB, 1)) < 0.5
            epss = jnp.where(go_right, eps_v, -eps_v)
            c_q[:] = jnp.where(go_right, r_q[:], l_q[:])
            c_p[:] = jnp.where(go_right, r_p[:], l_p[:])
            c_g[:] = jnp.where(go_right, r_g[:], l_g[:])
            set_si(_M_BLD, active.astype(jnp.int32))
            set_si(_M_SDV, jnp.zeros((CB, 1), jnp.int32))
            set_si(_M_STN, jnp.zeros((CB, 1), jnp.int32))
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
                en = 0.5 * jnp.sum(pn * velE(pn), axis=1, keepdims=True) - lpn

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

                # push the leaf at height h (aborted lanes write garbage
                # into slots they never read again)
                lpaw = -dE + jnp.minimum(0.0, -dE)
                s_lp[pl.ds(h, 1)] = c_p[:].reshape(1, CB, Npad)
                s_rp[pl.ds(h, 1)] = c_p[:].reshape(1, CB, Npad)
                s_ps[pl.ds(h, 1)] = c_p[:].reshape(1, CB, Npad)
                s_q[pl.ds(h, 1)] = pack(
                    c_q[:], sfc(_S_CE), sfc(_S_CLP), -dE, lpaw
                ).reshape(1, CB, Npad)

                # --- in-place merges: one per trailing one-bit of leaf_idx ---
                set_si(_M_MRG, (bld & ~div_leaf).astype(jnp.int32))

                def merge_body(mc):
                    j, hh, _ = mc
                    mrg = sic(_M_MRG) != 0
                    t1_lp = s_lp[pl.ds(hh - 1, 1)].reshape(CB, Npad)
                    t1_rp = s_rp[pl.ds(hh - 1, 1)].reshape(CB, Npad)
                    t1_ps = s_ps[pl.ds(hh - 1, 1)].reshape(CB, Npad)
                    t1_q, t1_e, t1_lpp, t1_ls, t1_lw = unpack(
                        s_q[pl.ds(hh - 1, 1)].reshape(CB, Npad))
                    t2_lp = s_lp[pl.ds(hh, 1)].reshape(CB, Npad)
                    t2_rp = s_rp[pl.ds(hh, 1)].reshape(CB, Npad)
                    t2_ps = s_ps[pl.ds(hh, 1)].reshape(CB, Npad)
                    t2_q, t2_e, t2_lpp, t2_ls, t2_lw = unpack(
                        s_q[pl.ds(hh, 1)].reshape(CB, Npad))

                    # 3-way generalized U-turn (reference nuts.py:389-398);
                    # boundary velocities recomputed from momenta.
                    ps = t1_ps + t2_ps
                    turn = ((rowdot(ps, velC(t1_lp)) <= 0)
                            | (rowdot(ps, velC(t2_rp)) <= 0))
                    ps1 = t1_ps + t2_lp
                    turn1 = ((rowdot(ps1, velC(t1_lp)) <= 0)
                             | (rowdot(ps1, velC(t2_lp)) <= 0))
                    ps2 = t1_rp + t2_ps
                    turn2 = ((rowdot(ps2, velC(t1_rp)) <= 0)
                             | (rowdot(ps2, velC(t2_rp)) <= 0))
                    turn = turn | ((j >= 1) & (turn1 | turn2))

                    ls = jnp.logaddexp(t1_ls, t2_ls)
                    lw = jnp.logaddexp(t1_lw, t2_lw)
                    take2 = logbern(t2_ls - ls)
                    mq = jnp.where(take2, t2_q, t1_q)
                    me = jnp.where(take2, t2_e, t1_e)
                    mlp = jnp.where(take2, t2_lpp, t1_lpp)

                    s_lp[pl.ds(hh - 1, 1)] = t1_lp.reshape(1, CB, Npad)
                    s_rp[pl.ds(hh - 1, 1)] = t2_rp.reshape(1, CB, Npad)
                    s_ps[pl.ds(hh - 1, 1)] = ps.reshape(1, CB, Npad)
                    s_q[pl.ds(hh - 1, 1)] = pack(mq, me, mlp, ls, lw).reshape(
                        1, CB, Npad)

                    nxt_mrg = (mrg & ~turn).astype(jnp.int32)
                    set_si(_M_MRG, nxt_mrg)
                    go_m = jnp.sum(nxt_mrg) > 0
                    return (j + 1, hh - 1, go_m)

                def merge_cond(mc):
                    j, hh, go_m = mc
                    more = jnp.bitwise_and(
                        jnp.right_shift(leaf_idx, j), jnp.int32(1)) == 1
                    return more & go_m

                go_m0 = jnp.sum(sic(_M_MRG)) > 0
                _, h_post, _ = lax.while_loop(
                    merge_cond, merge_body, (jnp.int32(0), h, go_m0))

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

            # the completed subtree is stack slot 0
            n_lp = s_lp[pl.ds(0, 1)].reshape(CB, Npad)
            n_rp = s_rp[pl.ds(0, 1)].reshape(CB, Npad)
            n_ps = s_ps[pl.ds(0, 1)].reshape(CB, Npad)
            n_q, n_e, n_lpp, n_ls, n_lw = unpack(
                s_q[pl.ds(0, 1)].reshape(CB, Npad))

            sdiv = sic(_M_SDV) != 0
            strn = sic(_M_STN) != 0
            ok = active & ~sdiv & ~strn

            # multinomial swap vs the old tree weight (nuts.py:321-323)
            take_new = ok & logbern(n_ls - soc(_O_LS))
            pr_q[:] = jnp.where(take_new, n_q, pr_q[:])
            set_sf(_S_PRE, jnp.where(take_new, n_e, sfc(_S_PRE)))
            set_sf(_S_PRLP, jnp.where(take_new, n_lpp, sfc(_S_PRLP)))
            set_so(_O_LS, jnp.where(ok, jnp.logaddexp(soc(_O_LS), n_ls),
                                    soc(_O_LS)))
            set_so(_O_LW, jnp.where(ok, jnp.logaddexp(soc(_O_LW), n_lw),
                                    soc(_O_LW)))
            old_ps = psum[:]
            psum[:] = jnp.where(ok, old_ps + n_ps, old_ps)

            upd_l = ok & ~go_right
            upd_r = ok & go_right
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
            ps1 = jnp.where(go_right, old_ps + n_lp, n_ps + old_l_p)
            p1a = jnp.where(go_right, old_l_p, n_rp)
            p1b = jnp.where(go_right, n_lp, old_l_p)
            t1c = (rowdot(ps1, velC(p1a)) <= 0) | (rowdot(ps1, velC(p1b)) <= 0)
            ps2 = jnp.where(go_right, old_r_p + n_ps, n_lp + old_ps)
            p2a = jnp.where(go_right, old_r_p, n_lp)
            p2b = jnp.where(go_right, n_rp, old_r_p)
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

        q_out[:] = pr_q[:]
        lp_f, g_f = model(pr_q[:])
        del lp_f  # identical to the stored proposal logp (deterministic model)
        g_out[:] = g_f
        set_so(_O_ENERGY, sfc(_S_PRE))
        set_so(_O_LOGP, sfc(_S_PRLP))

    return kernel


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
):
    """Build ``traj(q, p, grad, logp, eps, max_depth_c, var, seed)``.

    Returns a jit-compatible function mapping the per-draw trajectory
    inputs (all ``(C, n)`` / ``(C,)``, plus a scalar int32 seed) to a
    dict of per-chain outputs (proposal q/grad/energy/logp, tree
    log-weights, depth, leaf count, divergence/turning flags, max
    energy change). Chains are processed in blocks of ``chain_block``
    (reduced to a divisor of C if needed).

    ``metric``: ``"diag"`` (``var`` is the per-chain ``(C, n)``
    inverse-mass diagonal) or ``"dense"`` (``var`` is one ``(n, n)``
    covariance shared by all chains; velocities become matmuls in the
    kernel).

    ``prng``: ``"tpu"`` (on-core ``pltpu.prng_*``, TPU only) or
    ``"counter"`` (murmur3 counter stream in plain XLA ops — the only
    source that lowers under ``interpret=True``, so CPU CI can exercise
    the kernel's merge/U-turn/packing logic). Default: ``"counter"``
    when ``interpret`` else ``"tpu"``.
    """
    if prng is None:
        prng = "counter" if interpret else "tpu"
    coeffs = INTEGRATOR_COEFFS[integrator]
    Npad = padded_dim(n)
    D = max_treedepth
    model_fn = spec.fn
    consts = spec.consts
    n_consts = len(consts)

    def traj(q, p, grad, logp, eps, max_depth_c, var, seed):
        C = q.shape[0]
        CB = min(chain_block, C)
        while C % CB:
            CB //= 2
        if CB < 8:
            raise ValueError(
                f"chains={C} has no usable chain-block divisor >= 8; choose "
                f"a chain count divisible by a power of two >= 8 (ideally a "
                f"multiple of {chain_block}) for the Pallas trajectory path"
            )
        if CB < min(chain_block, C):
            import logging

            logging.getLogger("littlemcmc_tpu").warning(
                "Pallas trajectory: chains=%d is not divisible by "
                "chain_block=%d; running %d sequential blocks of %d chains "
                "(choose a multiple of %d chains for peak throughput).",
                C, chain_block, C // CB, CB, chain_block,
            )

        f32 = jnp.float32
        padw = ((0, 0), (0, Npad - n))
        qp = jnp.pad(q.astype(f32), padw)
        pp = jnp.pad(p.astype(f32), padw)
        gp = jnp.pad(grad.astype(f32), padw)
        if metric == "diag":
            vp = jnp.pad(var.astype(f32), padw)
        else:  # shared (n, n) covariance, zero-padded square
            vp = jnp.pad(var.astype(f32), ((0, Npad - n), (0, Npad - n)))
        sin = jnp.zeros((C, _N_IN), f32)
        sin = sin.at[:, _IN_LOGP].set(logp.astype(f32))
        sin = sin.at[:, _IN_EPS].set(eps.astype(f32))
        sin = sin.at[:, _IN_MAXDEPTH].set(max_depth_c.astype(f32))
        seed1 = jnp.asarray(seed, jnp.int32).reshape(-1)
        if seed1.shape[0] < 2:  # accept scalar seeds; duplicate the word
            seed1 = jnp.concatenate([seed1, seed1])
        seed1 = seed1[:2]

        grid = (C // CB,)
        row_spec = pl.BlockSpec((CB, Npad), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        var_spec = (row_spec if metric == "diag"
                    else pl.BlockSpec((Npad, Npad), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        in_spec = pl.BlockSpec((CB, _N_IN), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        out_sc_spec = pl.BlockSpec((CB, _N_OUT), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
        const_specs = [
            pl.BlockSpec(cc.shape, (lambda i, _nd=cc.ndim: (0,) * _nd),
                         memory_space=pltpu.VMEM)
            for cc in consts
        ]

        out_shapes = [
            jax.ShapeDtypeStruct((C, Npad), f32),    # proposal q
            jax.ShapeDtypeStruct((C, Npad), f32),    # proposal grad
            jax.ShapeDtypeStruct((C, _N_OUT), f32),  # packed scalars
        ]
        out_specs = [row_spec, row_spec, out_sc_spec]

        scratch = (
            [pltpu.VMEM((CB, Npad), f32)] * 11      # l/r/c states, pr_q, psum
            + [pltpu.VMEM((CB, _LANE), f32)]        # packed f32 scalars
            + [pltpu.VMEM((CB, _LANE), jnp.int32)]  # packed i32 masks
            + [pltpu.VMEM((D, CB, Npad), f32)] * 4  # merge stacks
        )

        kernel = _build_kernel_body(
            model_fn, n_consts, n, Npad, CB, D, float(Emax), coeffs,
            metric=metric, prng=prng,
        )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      row_spec, row_spec, row_spec, in_spec, var_spec]
                     + const_specs,
            out_shape=out_shapes,
            out_specs=out_specs,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_bytes),
            interpret=interpret,
        )(seed1, qp, pp, gp, sin, vp, *consts)

        q_o, g_o, so = outs
        return dict(
            q=q_o[:, :n],
            grad=g_o[:, :n],
            energy=so[:, _O_ENERGY],
            logp=so[:, _O_LOGP],
            log_size=so[:, _O_LS],
            log_weighted_accept_sum=so[:, _O_LW],
            max_energy_change=so[:, _O_MEC],
            depth=so[:, _O_DEPTH].astype(jnp.int32),
            n_leaves=so[:, _O_NLV].astype(jnp.int32),
            diverging=so[:, _O_DIV] != 0,
            turning=so[:, _O_TURN] != 0,
        )

    return traj
