"""T NUTS transitions per ``pallas_call``: the fused-draw kernel.

Round-2 measurement: the raw whole-trajectory kernel runs eight schools
at 9.66M transitions/s but end-to-end ``sample()`` reaches 556k — a 17×
gap paid per draw in the ``pallas_call`` launch plus the XLA epilogue
around it (threefry momentum refresh, dual-averaging update, Welford
metric update, stats assembly, ``lax.scan`` bookkeeping). This module
amortizes all of it: one ``pallas_call`` runs ``T`` transitions for each
chain block, with

- the chain state (position, gradient, logp) resident in VMEM scratch
  across draws,
- on-core momentum refresh (Box–Muller over the kernel PRNG — the XLA
  path's threefry normals are a different stream, so the two paths are
  statistically, not bitwise, identical),
- on-core dual averaging (the exact reference update,
  ``step_sizes.py:85-92``) and dual-window diagonal Welford adaptation
  (the exact ``QuadPotentialDiagAdapt`` semantics,
  ``quadpotential.py:231-245``: add to both windows, refresh the metric
  from the foreground, swap at window boundaries),
- the per-iteration early-treedepth schedule (``nuts.py:205-208``)
  computed from the in-kernel iteration counter,
- the trace and per-draw stats written to ``(T, …)`` outputs via the
  grid (grid = (chain blocks, T); TPU grids iterate sequentially on
  core, so scratch persists across the ``T`` steps of a block).

The transition itself is :func:`.nuts_trajectory_pallas._run_transition`
— the same code the per-draw kernel runs, so tree semantics are
identical by construction.

Layout: everything from the per-draw kernel, plus per-chain adaptation
scalars column-packed into two extra ``(RW, 128)`` f32 scratch buffers
and the Welford mean/raw-variance rows in four ``(RW, Npad)`` scratch
buffers. The default chain block is 256 rows (vs the per-draw kernel's
512): the extra state rows must fit the same 16 MB of VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..integration import INTEGRATOR_COEFFS
from .nuts_trajectory_pallas import (
    _LANE,
    _N_OUT,
    _N_SCALARS,
    _O_DEPTH,
    _O_DIV,
    _O_ENERGY,
    _O_LOGP,
    _O_LS,
    _O_LW,
    _O_MEC,
    _O_NLV,
    _O_TURN,
    _S_PRE,
    _S_PRLP,
    _Lanes,
    _make_counter_uniform,
    _make_lowrank_velocities,
    _run_transition,
    _uniform,
    build_lowrank_fac,
    lowrank_fac_rows,
    natural_pack,
    padded_dim,
)

__all__ = ["build_fused_nuts_op", "BLOCKSPEC_LAYOUTS"]

# Every BlockSpec/scratch shape class this op's pallas_call uses, by the
# names of fused_probe.PROBED_LAYOUTS. tests/test_fused_nuts.py pins that
# each class here has a compiling miniature probe, so a Mosaic layout
# regression flips fused_engine_supported() *before* the first fused
# chunk instead of crashing the kernel on chip (the round-3 failure:
# probes passed while the real 16-lane 3-D stats block could not
# compile — BENCH_r03 tail).
BLOCKSPEC_LAYOUTS = frozenset({
    "smem_scalar_in",    # seed / pooled-Welford scalars in SMEM
    "rows_2d",           # (RW, Npad) chain-row blocks idx (i, 0)
    "scal16_2d",         # (RW, 16*K) packed scalar blocks idx (i, 0)
    "trace_3d",          # (1, RW, Npad) trace blocks idx (t, i, 0)
    "stats_2d_flat",     # (RW, 16*K) stats blocks idx (t*B + i, 0)
    "const_nd",          # grid-invariant const blocks idx (0,)*nd
    "sq_2d",             # (Npad, Npad) dense-metric blocks idx (0, 0)
    "fac_2d",            # (FR, Npad) shared low-rank factor block
    "mean_3d",           # (1, 8, Npad) pooled-mean outputs idx (i, 0, 0)
    "sq_3d",             # (1, Npad, Npad) pooled-raw outputs idx (i, 0, 0)
    "lane_3d",           # (1, 8, 128) counter-row outputs idx (i, 0, 0)
    "smem_f32_scratch",  # SMEM f32 vector scratch (_N_WSC window ctrs)
})

# extra packed stat columns (9..15 are free in the per-draw layout)
_O_EE, _O_MTA, _O_SS, _O_SSB = 9, 10, 11, 12

# packed scalar-state columns: buffer A (8 slots at K <= 16)
_A_LP, _A_ITER, _A_DLS, _A_DLB, _A_DHB, _A_DCNT, _A_DMU, _A_FW = range(8)
# buffer B
_B_FW2, _B_BW, _B_BW2, _B_PN, _B_PWIN = range(5)
_N_SC_IN = 16  # scalar input/output columns (13 used)

_TWO_PI = 6.283185307179586


def _log1mexp(x):
    """``log(1 - exp(-x))`` for x > 0, Mosaic-lowerable.

    Same two-branch scheme as math.py, but Mosaic has no ``expm1``
    lowering: the small branch uses ``exp(x) - 1`` guarded by a series
    for tiny ``x`` (``log(-expm1(-x)) ≈ log(x) - x/2`` with O(x²)
    error), keeping f32 accuracy through the cancellation region.
    """
    safe_small = jnp.where(x < 0.683, x, 1.0)
    safe_large = jnp.where(x < 0.683, 1.0, x)
    safe_tiny = jnp.maximum(safe_small, 1e-30)  # log(0) guard
    small = jnp.where(
        x < 1e-4,
        jnp.log(safe_tiny) - 0.5 * safe_small,
        jnp.log(jnp.maximum(1.0 - jnp.exp(-safe_small), 1e-30)),
    )
    # plain log(1 - e^{-x}) on the large branch: e^{-x} <= 0.5 there, no
    # cancellation (and no dependence on a Mosaic log1p lowering)
    return jnp.where(x < 0.683, small, jnp.log(1.0 - jnp.exp(-safe_large)))


def _boxmuller_std(lanes, uniform):
    """On-core standard-normal rows (Box–Muller); padding lanes zeroed."""
    RW, Npad = lanes.RW, lanes.Npad
    u1 = uniform((RW, Npad))
    u2 = uniform((RW, Npad))
    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)
    return jnp.where(lanes.qmask, z, 0.0)


def _boxmuller_momentum(lanes, uniform, V):
    """On-core momentum refresh: p ~ N(0, M) for the diagonal metric.

    Padding lanes zeroed (their ``V`` entries are zero-padding, not
    variances).
    """
    z = _boxmuller_std(lanes, uniform)
    qmask = lanes.qmask
    return jnp.where(qmask, z / jnp.sqrt(jnp.where(qmask, V, 1.0)), 0.0)


def _dense_momentum(lanes, uniform, linv):
    """Momentum for a shared dense metric: ``P = Z @ L^{-1}``.

    The XLA potential draws ``p = L^{-T} z`` per chain
    (``QuadPotentialFull.sample_momentum``, reference
    ``quadpotential.py:430-468``); in row convention that is one MXU
    matmul against the precomputed triangular inverse. Exact f32: the
    momentum must be drawn from the same density the kinetic energy
    measures, so bf16 truncation is not acceptable here.
    """
    z = _boxmuller_std(lanes, uniform)
    return jnp.dot(z, linv, precision="highest",
                   preferred_element_type=jnp.float32)


def _lowrank_momentum(lanes, uniform, stds, fac, kf: int):
    """Momentum for the spiked (low-rank+diag) metric: ``p = S⁻¹C^{−1/2}ζ``.

    ``C^{−1/2}ζ = α^{−1/2}ζ + V((λ^{−1/2}−α^{−1/2})·(Vᵀζ))`` — the same
    thin factor matmuls as the velocities
    (:func:`..nuts_trajectory_pallas._make_lowrank_velocities`), drawn
    from the density the kinetic energy ``½pᵀΣ̂p`` measures (exact f32).
    Padding lanes are zeroed (their ``stds`` entries are zero-padding).
    """
    z = _boxmuller_std(lanes, uniform)
    Vt = fac[:kf, :]
    lam_k = fac[kf:kf + 1, :kf]
    alpha_row = fac[kf + 1:kf + 2, :]
    alpha_k = fac[kf + 1:kf + 2, :kf]
    c = jax.lax.dot_general(
        z, Vt, dimension_numbers=(((1,), (1,)), ((), ())),
        precision="highest", preferred_element_type=jnp.float32)
    y = alpha_row ** -0.5 * z + jnp.dot(
        c * (lam_k ** -0.5 - alpha_k ** -0.5), Vt,
        precision="highest", preferred_element_type=jnp.float32)
    qmask = lanes.qmask
    return jnp.where(qmask, y / jnp.where(qmask, stds, 1.0), 0.0)


# SMEM scalar slots for the pooled-dense Welford state (block-local)
_W_FGW, _W_BGW, _W_NS, _W_PU, _W_WIN = range(5)
_N_WSC = 8

# Conservative per-kernel VMEM budget for auto-sizing the chain block.
# TPU cores expose ~16 MiB of VMEM; leave headroom for Mosaic's internal
# allocations. Override with LMC_FUSED_VMEM_BUDGET (bytes).
def _fused_vmem_budget() -> int:
    import os

    return int(os.environ.get("LMC_FUSED_VMEM_BUDGET", 13 * 2 ** 20))


def shrink_chain_block(C, CB, K, est_bytes, budget, log_tag):
    """Halve the chain block while the VMEM estimate exceeds the budget.

    ``est_bytes(RW)`` is the kernel's conservative resident-bytes
    estimate for an ``RW``-row block (scratch + double-buffered I/O
    blocks). Stops at the smallest valid divisor (>= 8 rows, divides C,
    multiple of K); if even that exceeds the budget the caller proceeds
    anyway — the driver's runtime fallback catches a genuine overflow.
    """
    import logging

    shrunk = False
    while est_bytes(CB // K) > budget:
        cand = CB // 2
        while cand >= K * 8 and (C % cand or cand % K):
            cand //= 2
        if cand < K * 8:
            break
        CB = cand
        shrunk = True
    if shrunk:
        logging.getLogger("littlemcmc_tpu").info(
            "%s: chain block auto-reduced to %d chains/block "
            "(VMEM estimate %.1f MiB within budget %.1f MiB)",
            log_tag, CB, est_bytes(CB // K) / 2 ** 20, budget / 2 ** 20)
    return CB


def _tn_dot(a, b):
    """``(R, N) x (R, M) -> (N, M)`` rows-contraction, exact f32.

    The pooled-covariance accumulation: one MXU matmul per draw in place
    of ``RW`` outer products. ``precision="highest"`` because bf16-
    truncated inputs bias the variance estimate (measured 7% in round 1).
    """
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        precision="highest", preferred_element_type=jnp.float32)


def _dense_welford_batch_add(x, m_s, r_s, wsc, slot):
    """Chan-combine a ``(RW, Npad)`` draw batch into one Welford window.

    ``m_s`` is an ``(8, Npad)`` scratch whose row 0 holds the running
    mean; ``r_s`` the ``(Npad, Npad)`` raw scatter ``Σ (x-m)(x-m)^T``;
    ``wsc[slot]`` the weight. Exact batched form of ``RW`` sequential
    ``WelfordCovariance.add_sample`` calls (quadpotential.py:162-172;
    Chan et al. parallel combination): padding lanes stay zero because
    ``x``'s and the seeds' padding lanes are zero.
    """
    RWf = float(x.shape[0])
    W = wsc[slot]
    Wn = W + RWf
    xm = jnp.sum(x, axis=0, keepdims=True) * (1.0 / RWf)  # (1, Npad)
    raw_b = _tn_dot(x - xm, x - xm)
    d = xm - m_s[0:1, :]
    m_s[0:1, :] = m_s[0:1, :] + d * (RWf / Wn)
    r_s[:] = r_s[:] + raw_b + (W * RWf / Wn) * _tn_dot(d, d)
    wsc[slot] = Wn


def _dense_welford_swap_and_count(fgm_s, fgr_s, bgm_s, bgr_s, wsc, mult):
    """Window bookkeeping after the adds (quadpotential.py:486-521).

    The reference computes ``delta = n_samples - prev_update`` *before*
    incrementing and swaps fg <- bg when ``delta >= window`` (after the
    sample was added to both windows); the schedule is shared by every
    chain under pooling, so one scalar decision moves the block-local
    matrices.
    """
    ns = wsc[_W_NS]
    swap = (ns - wsc[_W_PU]) >= wsc[_W_WIN]

    @pl.when(swap)
    def _swap():
        fgm_s[:] = bgm_s[:]
        fgr_s[:] = bgr_s[:]
        bgm_s[:] = jnp.zeros_like(bgm_s)
        bgr_s[:] = jnp.zeros_like(bgr_s)
        wsc[_W_FGW] = wsc[_W_BGW]
        wsc[_W_BGW] = 0.0
        wsc[_W_PU] = ns
        wsc[_W_WIN] = jnp.floor(wsc[_W_WIN] * mult)

    wsc[_W_NS] = ns + 1.0


def _adapt_dense_inputs(dense_welford, B, Npad, n, pad_sq):
    """Block-seed inputs + specs for the pooled-dense Welford state.

    Each block is seeded with 1/B of the (device-local share of the)
    global pooled state — the exact-combine identity Σ_b (state/B ⊕
    samples_b) = state ⊕ all samples makes per-block accumulation
    lossless. Shared verbatim by the NUTS and HMC fused ops.
    """
    f32 = jnp.float32
    (dfm, dfr, dfw, dbm, dbr, dbw, dns, dpu, dwin) = dense_welford

    def pad_mean_rows(v):  # (n,) -> (8, Npad), row 0
        vp = jnp.pad(jnp.asarray(v, f32), (0, Npad - n))
        return jnp.pad(vp[None, :], ((0, 7), (0, 0)))

    mean_spec = pl.BlockSpec((8, Npad), lambda i, t: (0, 0),
                             memory_space=pltpu.VMEM)
    sq_spec = pl.BlockSpec((Npad, Npad), lambda i, t: (0, 0),
                           memory_space=pltpu.VMEM)
    Bf = float(B)
    inputs = [pad_mean_rows(dfm), pad_sq(dfr) / Bf,
              pad_mean_rows(dbm), pad_sq(dbr) / Bf,
              jnp.stack([jnp.asarray(dfw, f32) / Bf,
                         jnp.asarray(dbw, f32) / Bf,
                         jnp.asarray(dns, f32),
                         jnp.asarray(dpu, f32),
                         jnp.asarray(dwin, f32),
                         jnp.zeros((), f32), jnp.zeros((), f32),
                         jnp.zeros((), f32)])]
    in_specs = [mean_spec, sq_spec, mean_spec, sq_spec,
                pl.BlockSpec(memory_space=pltpu.SMEM)]
    return inputs, in_specs


def _adapt_dense_outputs(B, Npad):
    """Per-block output shapes + specs for the pooled-dense state."""
    f32 = jnp.float32
    mean_out = pl.BlockSpec((1, 8, Npad), lambda i, t: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    sq_out = pl.BlockSpec((1, Npad, Npad), lambda i, t: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    lane_out = pl.BlockSpec((1, 8, _LANE), lambda i, t: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((B, 8, Npad), f32),     # fg mean
        jax.ShapeDtypeStruct((B, Npad, Npad), f32),  # fg raw
        jax.ShapeDtypeStruct((B, 8, Npad), f32),     # bg mean
        jax.ShapeDtypeStruct((B, Npad, Npad), f32),  # bg raw
        jax.ShapeDtypeStruct((B, 8, _LANE), f32),    # counters
    ]
    return out_shapes, [mean_out, sq_out, mean_out, sq_out, lane_out]


def _adapt_dense_scratch(Npad):
    """Block-local pooled-Welford scratch (fg/bg mean + raw, counters)."""
    f32 = jnp.float32
    return [pltpu.VMEM((8, Npad), f32), pltpu.VMEM((Npad, Npad), f32),
            pltpu.VMEM((8, Npad), f32), pltpu.VMEM((Npad, Npad), f32),
            pltpu.SMEM((_N_WSC,), f32)]


def _adapt_dense_results(outs_tail, n):
    """Result-dict entries from the 5 per-block pooled-dense outputs."""
    dwmf, dwrf, dbmf, dbrf, wscf = outs_tail
    return dict(
        dense_fg_mean=dwmf[:, 0, :n],          # (B, n)
        dense_fg_raw=dwrf[:, :n, :n],          # (B, n, n)
        dense_fg_w=wscf[:, 0, _W_FGW],         # (B,)
        dense_bg_mean=dbmf[:, 0, :n],
        dense_bg_raw=dbrf[:, :n, :n],
        dense_bg_w=wscf[:, 0, _W_BGW],
        n_samples=wscf[0, 0, _W_NS],           # shared counters
        prev_update=wscf[0, 0, _W_PU],
        window=wscf[0, 0, _W_WIN],
    )


def _scalars_to_rows(vals, rows, width):
    """Spread a scalar list across lanes of row 0 of an ``(rows, width)``."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
    srow = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 0)
    out = jnp.zeros((rows, width), jnp.float32)
    for i, v in enumerate(vals):
        out = jnp.where((lane == i) & (srow == 0), v, out)
    return out


def combine_dense_welford(W, m, r, center):
    """Exactly combine stacked Welford states ``(B, ...)`` into one.

    Sum-form centered at ``center`` (the chunk-start pooled mean, known
    and identical everywhere), so the reduction is a plain sum — GSPMD
    turns it into a psum over a sharded leading axis. Returns
    ``(W_tot, mean, raw)``.
    """
    W_tot = jnp.sum(W)
    d = m - center  # (B, n)
    S1 = jnp.sum(W[:, None] * d, axis=0)
    S2 = jnp.sum(r + W[:, None, None] * (d[:, :, None] * d[:, None, :]),
                 axis=0)
    mean = center + S1 / jnp.maximum(W_tot, 1e-30)
    md = mean - center
    raw = S2 - W_tot * jnp.outer(md, md)
    return W_tot, mean, raw


def _da_update_cols(sac, set_sa, mta, config):
    """On-core dual averaging (reference ``step_sizes.py:85-92``).

    Reads/writes the ``sa`` scalar columns; returns the updated
    ``(log_step, log_bar)`` for the step-size stats.
    """
    cnt = sac(_A_DCNT)
    w = 1.0 / (cnt + float(config.t0))
    hb = (1.0 - w) * sac(_A_DHB) + w * (float(config.target_accept) - mta)
    ls_new = sac(_A_DMU) - hb * jnp.sqrt(cnt) / float(config.gamma)
    mk = jnp.exp(-float(config.k) * jnp.log(cnt))
    lb_new = mk * ls_new + (1.0 - mk) * sac(_A_DLB)
    set_sa(_A_DHB, hb)
    set_sa(_A_DLS, ls_new)
    set_sa(_A_DLB, lb_new)
    set_sa(_A_DCNT, cnt + 1.0)
    return ls_new, lb_new


def _welford_update_rows(lanes, x, var_s, fgm_s, fgv_s, bgm_s, bgv_s,
                         sac, set_sa, sbc, set_sb, mult):
    """On-core dual-window Welford step (``quadpotential.py:231-245``).

    Adds ``x`` to both windows, refreshes ``var_s`` from the (pre-swap)
    foreground, swaps fg <- bg at window boundaries.
    """
    bc, bcb, qmask = lanes.bc, lanes.bcb, lanes.qmask
    fw = sac(_A_FW) + 1.0
    old_diff = x - fgm_s[:]
    fmean = fgm_s[:] + bc(1.0 / fw) * old_diff
    fraw = fgv_s[:] + old_diff * (x - fmean)
    fw2 = sbc(_B_FW2) + 1.0
    var_new = fraw * bc(1.0 / fw)

    bw = sbc(_B_BW) + 1.0
    bold = x - bgm_s[:]
    bmean = bgm_s[:] + bc(1.0 / bw) * bold
    braw = bgv_s[:] + bold * (x - bmean)
    bw2 = sbc(_B_BW2) + 1.0

    pn = sbc(_B_PN)
    win = sbc(_B_PWIN)
    # f32 modulo via floor: counts stay far below 2^24 (exact)
    at_boundary = (pn - win * jnp.floor(pn / win)) == 0.0
    swap = (pn > 0) & at_boundary
    swap_b = bcb(swap)
    fgm_s[:] = jnp.where(swap_b, bmean, fmean)
    fgv_s[:] = jnp.where(swap_b, braw, fraw)
    bgm_s[:] = jnp.where(swap_b, 0.0, bmean)
    bgv_s[:] = jnp.where(swap_b, 0.0, braw)
    set_sa(_A_FW, jnp.where(swap, bw, fw))
    set_sb(_B_FW2, jnp.where(swap, bw2, fw2))
    set_sb(_B_BW, jnp.where(swap, 0.0, bw))
    set_sb(_B_BW2, jnp.where(swap, 0.0, bw2))
    set_sb(_B_PN, pn + 1.0)
    set_sb(_B_PWIN, jnp.where(swap, jnp.floor(win * mult), win))
    # metric refresh from the (pre-swap) foreground, like the reference:
    # var = fg.current_variance() before the swap
    var_s[:] = jnp.where(qmask, var_new, 0.0)


@functools.lru_cache(maxsize=64)
def build_fused_nuts_op(
    spec,
    n: int,
    T: int,
    tuning: bool,
    adapt_metric: bool,
    config,
    window_multiplier: float = 1.0,
    chain_block: int = 256,
    interpret: bool = False,
    vmem_limit_bytes: int = 64 * 1024 * 1024,
    prng: Optional[str] = None,
    pack: int = 1,
    collect_trace: bool = True,
    metric: str = "diag",
    adapt_dense: bool = False,
    lowrank_k: int = 0,
):
    """Build the fused runner ``fused(args...) -> dict`` for one phase.

    ``tuning`` and ``adapt_metric`` are *static*: the driver compiles one
    program per phase (the chunked driver already runs tune and draw
    phases as separate compiled chunks). ``config`` is the frozen
    :class:`~littlemcmc_tpu.base.NUTSConfig`; ``config.step_rand`` must
    be None (the jitter hook runs in XLA on the per-draw path).

    Inputs of the returned function (all f32, chain-batched):
    ``q, grad, logp, iter_count, da(5 leaves), var`` and, when
    ``adapt_metric``, the 8 Welford leaves + ``n_samples, window``;
    plus a ``(2,)`` int32 seed. Returns a dict with the ``(T, C, n)``
    trace, 13 ``(T, C)`` stat streams, and every updated state leaf.

    ``metric="lowrank"`` (``lowrank_k`` = rank): the spiked pooled
    metric. ``var`` carries the per-chain *variance* rows (adapting on
    core under ``adapt_metric`` exactly like diag), and ``lowrank_fac``
    the shared ``(V, λ, α)`` factor — frozen for the whole chunk;
    velocities and the momentum draw are the thin factor matmuls of the
    per-draw kernel. The caller refreshes the factor at chunk
    boundaries (batch subspace iteration), the same boundary-cadence
    scheme as ``adapt_dense``.

    ``adapt_dense`` (requires ``metric="dense"`` + ``tuning``): pooled
    dense adaptation on core. Each grid block carries a block-local
    pooled Welford covariance state in VMEM — seeded with 1/B of the
    global pooled moments, updated per draw with one MXU rows-
    contraction, window-swapped on core — and writes it out per block;
    the caller Chan-combines blocks (and devices) exactly, so the
    chunk-boundary pooled estimate equals a per-draw pooled engine's.
    The *metric* (cov / ``L^{-1}``) stays frozen within the chunk —
    Stan's boundary-cadence adaptation rather than the reference's
    every-draw refresh; every chunk boundary re-synchronizes exactly.
    """
    if config.step_rand is not None:
        raise ValueError("the fused NUTS kernel does not support step_rand")
    if metric not in ("diag", "dense", "lowrank"):
        raise ValueError(f"unknown metric {metric!r}")
    dense = metric == "dense"
    lowrank = metric == "lowrank"
    if dense and adapt_metric:
        # per-CHAIN dense adaptation has no VMEM-resident representation;
        # pooled dense adaptation is adapt_dense (shared block state).
        raise ValueError("the fused NUTS kernel adapts diagonal metrics "
                         "per chain; dense adaptation must be pooled "
                         "(adapt_dense) or frozen (QuadPotentialFull)")
    if adapt_dense and (not dense or not tuning or adapt_metric):
        raise ValueError("adapt_dense requires metric='dense', tuning=True "
                         "and per-chain adapt_metric=False")
    if lowrank and (adapt_dense or lowrank_k < 1):
        raise ValueError("metric='lowrank' requires lowrank_k >= 1 and no "
                         "adapt_dense (the factor is frozen per chunk)")
    if (dense or lowrank) and pack != 1:
        raise ValueError("lane packing requires a diagonal metric")
    if prng is None:
        prng = "counter" if interpret else "tpu"
    coeffs = INTEGRATOR_COEFFS[config.integrator]
    Emax = float(config.Emax)
    K = int(pack)
    D = int(config.max_treedepth)
    adapting = bool(tuning) and bool(config.adapt_step_size)
    mult = float(window_multiplier)

    if K > 1:
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

    def kernel(seed_ref, *rest):
        linv0 = None
        fac0 = None
        dwm0 = dwr0 = dbm0 = dbr0 = wscal0 = None
        if adapt_metric:
            q0, g0, sin, var0, fgm0, fgv0, bgm0, bgv0 = rest[:8]
            rest = rest[8:]
        elif adapt_dense:
            (q0, g0, sin, var0, linv0, dwm0, dwr0, dbm0, dbr0,
             wscal0) = rest[:10]
            rest = rest[10:]
        elif dense:
            q0, g0, sin, var0, linv0 = rest[:5]  # var0 = shared cov
            rest = rest[5:]
        else:
            q0, g0, sin, var0 = rest[:4]
            rest = rest[4:]
        if lowrank:
            # shared (FR, Npad) factor block: Vᵀ rows, λ row, α row —
            # frozen for the whole chunk (boundary-cadence refresh)
            fac0 = rest[0]
            rest = rest[1:]
        consts_refs = rest[:n_consts]
        rest = rest[n_consts:]
        if adapt_metric:
            (tr_q, st, qf, gf, soutf, varf, fgmf, fgvf, bgmf, bgvf) = rest[:10]
            rest = rest[10:]
        elif adapt_dense:
            (tr_q, st, qf, gf, soutf, dwmf, dwrf, dbmf, dbrf,
             wscf) = rest[:10]
            rest = rest[10:]
        else:
            tr_q, st, qf, gf, soutf = rest[:5]
            rest = rest[5:]
        (l_q, l_p, l_g, r_q, r_p, r_g, c_q, c_p, c_g, pr_q, psum,
         sf, si, s_lp, s_rp, s_ps, s_q, q_s, g_s, sa, sb) = rest[:21]
        wrows = rest[21:]
        if adapt_metric:
            var_s, fgm_s, fgv_s, bgm_s, bgv_s = wrows
        elif adapt_dense:
            dwm_s, dwr_s, dbm_s, dbr_s, wsc = wrows

        i_blk = pl.program_id(0)
        t = pl.program_id(1)
        RW = q_s.shape[0]
        # the per-(t, i) trace block is (1, RW, Npad); a 2-D ref view lets
        # the shared transition code treat it like the per-draw buffers.
        # The stats block is natively 2-D (RW, 16*K): Mosaic cannot slice a
        # sub-128 lane width out of a 3-D block (tiling is (1, 128) there),
        # so stats use a (T*RT, 16*K)-flattened layout indexed (t*B + i, 0).
        st2 = st
        tr2 = tr_q.at[0]

        def sinc(c):
            return sin[:, c * K:(c + 1) * K]

        def sac(c):
            return sa[:, c * K:(c + 1) * K]

        def set_sa(c, v):
            sa[:, c * K:(c + 1) * K] = v

        def sbc(c):
            return sb[:, c * K:(c + 1) * K]

        def set_sb(c, v):
            sb[:, c * K:(c + 1) * K] = v

        def stc(c):
            return st2[:, c * K:(c + 1) * K]

        def set_st(c, v):
            st2[:, c * K:(c + 1) * K] = v

        @pl.when(t == 0)
        def _load_state():
            q_s[:] = q0[:]
            g_s[:] = g0[:]
            sa[:] = jnp.zeros((RW, _LANE), jnp.float32)
            sb[:] = jnp.zeros((RW, _LANE), jnp.float32)
            for c in range(8):
                sa[:, c * K:(c + 1) * K] = sinc(c)
            for c in range(5):
                sb[:, c * K:(c + 1) * K] = sinc(8 + c)
            if adapt_metric:
                var_s[:] = var0[:]
                fgm_s[:] = fgm0[:]
                fgv_s[:] = fgv0[:]
                bgm_s[:] = bgm0[:]
                bgv_s[:] = bgv0[:]
            if adapt_dense:
                dwm_s[:] = dwm0[:]
                dwr_s[:] = dwr0[:]
                dbm_s[:] = dbm0[:]
                dbr_s[:] = dbr0[:]
                for _k in range(5):
                    wsc[_k] = wscal0[_k]

        # per-(block, draw) PRNG stream: both threefry words plus the
        # grid position folded in (t stride chosen so i/t mixes collide
        # for no (i, t) pair within a call)
        seed0 = seed_ref[0] + i_blk * 7919 + t * 15485863
        if prng == "tpu":
            pltpu.prng_seed(seed0, seed_ref[1])

        lanes = _Lanes(n, Npad, RW, K)
        model = lanes.make_model(model_fn, tuple(r[:] for r in consts_refs))
        V = var_s[:] if adapt_metric else var0[:]
        if lowrank:
            # per-chain scale from the (possibly adapting) variance rows;
            # padding entries are zero so the scale masks itself
            stds_lr = jnp.sqrt(V)
            velE, velC = _make_lowrank_velocities(stds_lr, fac0[:],
                                                  lowrank_k)
        else:
            velE, velC = lanes.make_velocities(V, metric)
        if prng == "tpu":
            uniform = _uniform
        else:
            uniform = _make_counter_uniform(lanes, si, seed0, seed_ref[1])

        refs = dict(
            l_q=l_q, l_p=l_p, l_g=l_g, r_q=r_q, r_p=r_p, r_g=r_g,
            c_q=c_q, c_p=c_p, c_g=c_g, pr_q=pr_q, psum=psum,
            sf=sf, si=si, so=st2,
            s_lp=s_lp, s_rp=s_rp, s_ps=s_ps, s_q=s_q, coeffs=coeffs,
        )

        q = q_s[:]
        g = g_s[:]
        lp = sac(_A_LP)
        qmask = lanes.qmask

        # --- on-core momentum refresh (Box–Muller) -----------------------
        # Counter-PRNG note: _run_transition zeroes the i32 scratch (the
        # shared call counter) at its start, so the momentum draws here
        # would collide with the transition's own stream (same salt, same
        # counter values). Stream-separate by salting the momentum draws
        # with an extra seed offset.
        if prng == "tpu":
            mom_uniform = _uniform
        else:
            mom_uniform = _make_counter_uniform(
                lanes, si, seed0 + 1013904223, seed_ref[1])
            si[:, 0:_LANE] = jnp.zeros((RW, _LANE), jnp.int32)
        if dense:
            p = _dense_momentum(lanes, mom_uniform, linv0[:])
        elif lowrank:
            p = _lowrank_momentum(lanes, mom_uniform, stds_lr, fac0[:],
                                  lowrank_k)
        else:
            p = _boxmuller_momentum(lanes, mom_uniform, V)

        E0 = 0.5 * lanes.segsum(p * velE(p)) - lp

        # --- step size and depth schedule (static-phase branches) --------
        eps_v = jnp.exp(sac(_A_DLS)) if adapting else jnp.exp(sac(_A_DLB))
        if tuning:
            early = sac(_A_ITER) < float(config.early_window)
            mdc_v = jnp.where(early, float(config.early_max_treedepth),
                              float(config.max_treedepth))
        else:
            mdc_v = jnp.full((RW, K), float(config.max_treedepth), jnp.float32)

        _run_transition(lanes, refs, model, uniform, velE, velC, Emax,
                        q, p, g, lp, E0, eps_v, mdc_v)

        prop_q = pr_q[:]
        prop_e = sf[:, _S_PRE * K:(_S_PRE + 1) * K]
        prop_lp = sf[:, _S_PRLP * K:(_S_PRLP + 1) * K]
        lp_f, g_f = model(prop_q)
        del lp_f  # deterministic model: equals the stored proposal logp

        # --- stats: mean_tree_accept + energies (nuts.py:419-435) --------
        ls = stc(_O_LS)
        lw = stc(_O_LW)
        mta = jnp.where(ls > 0, jnp.exp(lw - (ls + _log1mexp(ls))), 0.0)
        set_st(_O_ENERGY, prop_e)
        set_st(_O_LOGP, prop_lp)
        set_st(_O_EE, prop_e - E0)
        set_st(_O_MTA, mta)

        # --- on-core dual averaging (step_sizes.py:85-92) ----------------
        if adapting:
            ls_new, lb_new = _da_update_cols(sac, set_sa, mta, config)
        else:
            ls_new = sac(_A_DLS)
            lb_new = sac(_A_DLB)
        set_st(_O_SS, jnp.exp(ls_new))
        set_st(_O_SSB, jnp.exp(lb_new))

        # --- on-core dual-window Welford (quadpotential.py:231-245) ------
        if adapt_metric and tuning:
            # prop_q's padding lanes are zero by construction
            _welford_update_rows(lanes, prop_q, var_s, fgm_s, fgv_s,
                                 bgm_s, bgv_s, sac, set_sa, sbc, set_sb,
                                 mult)
        if adapt_dense:
            # pooled dense Welford (quadpotential.py:486-521, block-local):
            # add the draw batch to both windows, then the shared swap
            _dense_welford_batch_add(prop_q, dwm_s, dwr_s, wsc, _W_FGW)
            _dense_welford_batch_add(prop_q, dbm_s, dbr_s, wsc, _W_BGW)
            _dense_welford_swap_and_count(dwm_s, dwr_s, dbm_s, dbr_s,
                                          wsc, mult)

        # --- advance the chain state -------------------------------------
        set_sa(_A_ITER, sac(_A_ITER) + 1.0)
        set_sa(_A_LP, prop_lp)
        q_s[:] = prop_q
        g_s[:] = g_f
        tr2[:] = prop_q

        @pl.when(t == T - 1)
        def _store_state():
            qf[:] = q_s[:]
            gf[:] = g_s[:]
            out = jnp.zeros((RW, _N_SC_IN * K), jnp.float32)
            soutf[:] = out
            for c in range(8):
                soutf[:, c * K:(c + 1) * K] = sac(c)
            for c in range(5):
                soutf[:, (8 + c) * K:(9 + c) * K] = sbc(c)
            if adapt_metric:
                varf[:] = var_s[:]
                fgmf[:] = fgm_s[:]
                fgvf[:] = fgv_s[:]
                bgmf[:] = bgm_s[:]
                bgvf[:] = bgv_s[:]
            if adapt_dense:
                dwmf.at[0][:] = dwm_s[:]
                dwrf.at[0][:] = dwr_s[:]
                dbmf.at[0][:] = dbm_s[:]
                dbrf.at[0][:] = dbr_s[:]
                wscf.at[0][:] = _scalars_to_rows(
                    [wsc[_k] for _k in range(5)], 8, _LANE)

    def fused(q, grad, logp, iter_count, da_log_step, da_log_bar, da_hbar,
              da_count, da_mu, var, welford, seed, linv=None,
              dense_welford=None, lowrank_fac=None):
        """Run T transitions. ``welford`` is None or the 10-tuple
        ``(fg_mean, fg_raw, fg_w, fg_w2, bg_mean, bg_raw, bg_w, bg_w2,
        n_samples, window)``. Dense metric: ``var`` is the shared
        ``(n, n)`` covariance and ``linv`` its inverse lower Cholesky
        factor ``L^{-1}`` (momentum transform). ``dense_welford``
        (required iff ``adapt_dense``) is the 9-tuple of *global pooled*
        moments ``(fg_mean (n,), fg_raw (n, n), fg_w, bg_mean, bg_raw,
        bg_w, n_samples, prev_update, window)`` — scalars as 0-d f32;
        the result dict gains per-block states ``dense_fg_mean (B, n)``,
        ``dense_fg_raw (B, n, n)``, ``dense_fg_w (B,)`` (+ bg) and the
        shared counters ``n_samples, prev_update, window`` for the
        caller to combine with :func:`combine_dense_welford`."""
        if dense and linv is None:
            raise ValueError("metric='dense' requires linv")
        if adapt_dense and dense_welford is None:
            raise ValueError("adapt_dense requires dense_welford")
        if lowrank and lowrank_fac is None:
            raise ValueError("metric='lowrank' requires lowrank_fac "
                             "(V, lam, alpha)")
        C = q.shape[0]
        CB = min(chain_block * K, C)
        while CB >= 1 and (C % CB or CB % K):
            CB //= 2
        if CB < 1 or CB // K < 8:
            raise ValueError(
                f"chains={C} has no usable chain-block divisor with >= 8 "
                f"rows at pack={K} for the fused NUTS kernel")

        const_bytes = sum(int(np.prod(cc.shape)) * 4 for cc in consts)

        def _est_bytes(RWc):
            # KEEP IN SYNC with the scratch/in/out lists below. Blocks
            # whose index map varies over the grid are double-buffered by
            # Mosaic (x2: the (i,...)-mapped chain rows and (t,...)-mapped
            # draw streams); grid-invariant blocks (shared matrices,
            # pooled seeds, consts) and scratch count once.
            row = RWc * Npad * 4
            lane = RWc * _LANE * 4
            sq = Npad * Npad * 4
            mrow = 8 * Npad * 4
            scratch = (11 * row + 2 * lane + 4 * D * row + 2 * row
                       + 2 * lane
                       + (5 * row if adapt_metric else 0)
                       + ((2 * sq + 2 * mrow) if adapt_dense else 0))
            varying = 2 * row + RWc * _N_SC_IN * K * 4       # q, g, sin
            varying += 0 if dense else row                   # diag var rows
            varying += 4 * row if adapt_metric else 0        # welford rows
            varying += (row + RWc * _N_OUT * K * 4 + 2 * row
                        + RWc * _N_SC_IN * K * 4)            # tr/st/qf/gf/sout
            varying += 5 * row if adapt_metric else 0        # welford out
            varying += (2 * sq + 2 * mrow + 8 * _LANE * 4) \
                if adapt_dense else 0                        # per-block outs
            invariant = const_bytes
            invariant += 2 * sq if dense else 0              # cov + linv
            invariant += (2 * sq + 2 * mrow) if adapt_dense else 0  # seeds
            if lowrank:
                invariant += lowrank_fac_rows(lowrank_k) * Npad * 4
            return scratch + 2 * varying + invariant

        CB = shrink_chain_block(C, CB, K, _est_bytes, _fused_vmem_budget(),
                                "fused NUTS kernel")
        RW = CB // K
        RT = C // K
        f32 = jnp.float32

        def pack_rows(x2d):
            xp = jnp.pad(x2d.astype(f32), ((0, 0), (0, SEG - n)))
            return xp.reshape(RT, K * SEG)

        def pack_scal(v):
            return jnp.broadcast_to(jnp.asarray(v, f32), (C,)).reshape(RT, K)

        scal_cols = [
            logp, iter_count, da_log_step, da_log_bar, da_hbar, da_count,
            da_mu,
        ]
        if welford is not None:
            fgm, fgv, fgw, fgw2, bgm, bgv, bgw, bgw2, pn, win = welford
            scal_cols += [fgw, fgw2, bgw, bgw2, pn, win]
        else:
            scal_cols += [jnp.zeros(C)] * 6
        sin = jnp.concatenate([pack_scal(v) for v in scal_cols]
                              + [jnp.zeros((RT, (16 - len(scal_cols)) * K), f32)],
                              axis=1)

        seed1 = jnp.asarray(seed, jnp.int32).reshape(-1)
        if seed1.shape[0] < 2:
            seed1 = jnp.concatenate([seed1, seed1])
        seed1 = seed1[:2]

        grid = (RT // RW, T)
        row_in = pl.BlockSpec((RW, Npad), lambda i, t: (i, 0),
                              memory_space=pltpu.VMEM)
        sin_spec = pl.BlockSpec((RW, _N_SC_IN * K), lambda i, t: (i, 0),
                                memory_space=pltpu.VMEM)
        # collect_trace=False (tune phase with discard_tuned_samples):
        # every draw writes the same (0, i) block, which stays VMEM-local
        # until the block index changes — one HBM flush per chain block
        # instead of one per draw.
        T_out = T if collect_trace else 1
        tr_idx = ((lambda i, t: (t, i, 0)) if collect_trace
                  else (lambda i, t: (0, i, 0)))
        tr_spec = pl.BlockSpec((1, RW, Npad), tr_idx,
                               memory_space=pltpu.VMEM)
        # 2-D flattened stats layout: 3-D blocks with a 16-lane last dim
        # fail Mosaic's (1, 128) tiling ("Slice shape along dimension 2
        # must be aligned to tiling (128), but is 16" — BENCH_r03 tail);
        # a 2-D (RW, 16*K) block over (T*RT, 16*K) rows compiles and
        # avoids the 8x lane padding of a 128-wide 3-D block.
        n_blk = RT // RW
        st_spec = pl.BlockSpec((RW, _N_OUT * K),
                               lambda i, t, _b=n_blk: (t * _b + i, 0),
                               memory_space=pltpu.VMEM)
        const_specs = [
            pl.BlockSpec(cc.shape, (lambda i, t, _nd=cc.ndim: (0,) * _nd),
                         memory_space=pltpu.VMEM)
            for cc in consts
        ]

        if dense:
            def pad_sq(m):
                return jnp.pad(m.astype(f32),
                               ((0, Npad - n), (0, Npad - n)))

            sq_spec = pl.BlockSpec((Npad, Npad), lambda i, t: (0, 0),
                                   memory_space=pltpu.VMEM)
            inputs = [pack_rows(q), pack_rows(grad), sin, pad_sq(var),
                      pad_sq(linv)]
            in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                        row_in, row_in, sin_spec, sq_spec, sq_spec]
        else:
            inputs = [pack_rows(q), pack_rows(grad), sin, pack_rows(var)]
            in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                        row_in, row_in, sin_spec, row_in]
        if welford is not None:
            inputs += [pack_rows(fgm), pack_rows(fgv), pack_rows(bgm),
                       pack_rows(bgv)]
            in_specs += [row_in] * 4
        if lowrank:
            facp = build_lowrank_fac(*lowrank_fac, n, Npad)
            inputs += [facp]
            in_specs += [pl.BlockSpec(facp.shape, lambda i, t: (0, 0),
                                      memory_space=pltpu.VMEM)]
        B = (RT // RW)
        if adapt_dense:
            d_in, d_specs = _adapt_dense_inputs(dense_welford, B, Npad, n,
                                                pad_sq)
            inputs += d_in
            in_specs += d_specs
        in_specs += const_specs

        out_shapes = [
            jax.ShapeDtypeStruct((T_out, RT, Npad), f32),      # trace
            jax.ShapeDtypeStruct((T * RT, _N_OUT * K), f32),   # stats
            jax.ShapeDtypeStruct((RT, Npad), f32),             # final q
            jax.ShapeDtypeStruct((RT, Npad), f32),             # final grad
            jax.ShapeDtypeStruct((RT, _N_SC_IN * K), f32),     # final scalars
        ]
        out_specs = [tr_spec, st_spec, row_in, row_in, sin_spec]
        if adapt_metric:
            out_shapes += [jax.ShapeDtypeStruct((RT, Npad), f32)] * 5
            out_specs += [row_in] * 5
        if adapt_dense:
            d_shapes, d_outspecs = _adapt_dense_outputs(B, Npad)
            out_shapes += d_shapes
            out_specs += d_outspecs

        scratch = (
            [pltpu.VMEM((RW, Npad), f32)] * 11       # transition rows
            + [pltpu.VMEM((RW, _LANE), f32)]         # sf
            + [pltpu.VMEM((RW, _LANE), jnp.int32)]   # si
            + [pltpu.VMEM((D, RW, Npad), f32)] * 4   # merge stacks
            + [pltpu.VMEM((RW, Npad), f32)] * 2      # q_s, g_s
            + [pltpu.VMEM((RW, _LANE), f32)] * 2     # sa, sb
            + ([pltpu.VMEM((RW, Npad), f32)] * 5 if adapt_metric else [])
            + (_adapt_dense_scratch(Npad) if adapt_dense else [])
        )

        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_shape=out_shapes,
            out_specs=out_specs,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_bytes,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(seed1, *inputs, *consts)

        tr, stp, qf, gf, soutf = outs[:5]

        def unrow(x):
            return x.reshape(C, SEG)[:, :n]

        def sc(buf, c):
            return buf[:, c * K:(c + 1) * K].reshape(-1)

        stp3 = stp.reshape(T, RT, _N_OUT * K)

        def stat(c):
            return stp3[:, :, c * K:(c + 1) * K].reshape(T, C)

        res = dict(
            trace=(tr.reshape(T, C, SEG)[:, :, :n] if collect_trace
                   else None),
            q=unrow(qf),
            grad=unrow(gf),
            logp=sc(soutf, _A_LP),
            iter_count=sc(soutf, _A_ITER),
            da_log_step=sc(soutf, _A_DLS),
            da_log_bar=sc(soutf, _A_DLB),
            da_hbar=sc(soutf, _A_DHB),
            da_count=sc(soutf, _A_DCNT),
            da_mu=sc(soutf, _A_DMU),
            energy=stat(_O_ENERGY),
            model_logp=stat(_O_LOGP),
            depth=stat(_O_DEPTH).astype(jnp.int32),
            n_leaves=stat(_O_NLV).astype(jnp.int32),
            diverging=stat(_O_DIV) != 0,
            turning=stat(_O_TURN) != 0,
            max_energy_change=stat(_O_MEC),
            energy_error=stat(_O_EE),
            mean_tree_accept=stat(_O_MTA),
            step_size=stat(_O_SS),
            step_size_bar=stat(_O_SSB),
        )
        if adapt_metric:
            varf, fgmf, fgvf, bgmf, bgvf = outs[5:]
            res.update(
                var=unrow(varf),
                fg_mean=unrow(fgmf),
                fg_raw=unrow(fgvf),
                bg_mean=unrow(bgmf),
                bg_raw=unrow(bgvf),
                fg_w=sc(soutf, 7),
                fg_w2=sc(soutf, 8),
                bg_w=sc(soutf, 9),
                bg_w2=sc(soutf, 10),
                n_samples=sc(soutf, 11),
                window=sc(soutf, 12),
            )
        if adapt_dense:
            res.update(_adapt_dense_results(outs[5:], n))
        return res

    return fused
