"""T classic-HMC transitions per ``pallas_call`` (the HMC fused kernel).

The HMC counterpart of :mod:`.fused_nuts_pallas`: one kernel launch runs
``T`` transitions per chain block with momentum refresh (Box–Muller),
the jittered path length (reference ``hmc.py:141-143``) drawn on core,
the per-chain leapfrog loop and Metropolis accept from
:func:`.hmc_trajectory_pallas.run_hmc_trajectory_values`, and dual
averaging + dual-window Welford adaptation updated in VMEM between
draws. Eliminates the per-draw launch + XLA-epilogue cost the same way
the NUTS fused kernel does.

Note the path length is now drawn from the kernel PRNG instead of XLA
threefry — identically distributed, different stream, so the fused and
per-draw HMC paths are statistically (not bitwise) identical.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..integration import INTEGRATOR_COEFFS
from .fused_nuts_pallas import (
    BLOCKSPEC_LAYOUTS,
    _A_DCNT,
    _A_DHB,
    _A_DLB,
    _A_DLS,
    _A_DMU,
    _A_FW,
    _A_ITER,
    _A_LP,
    _B_BW,
    _B_BW2,
    _B_FW2,
    _B_PN,
    _B_PWIN,
    _N_SC_IN,
    _W_BGW,
    _W_FGW,
    _adapt_dense_inputs,
    _adapt_dense_outputs,
    _adapt_dense_results,
    _adapt_dense_scratch,
    _boxmuller_momentum,
    _da_update_cols,
    _dense_momentum,
    _dense_welford_batch_add,
    _dense_welford_swap_and_count,
    _fused_vmem_budget,
    _lowrank_momentum,
    _scalars_to_rows,
    _welford_update_rows,
    shrink_chain_block,
)
from .hmc_trajectory_pallas import run_hmc_trajectory_values
from .nuts_trajectory_pallas import (
    _LANE,
    _N_SCALARS,
    _Lanes,
    _make_counter_uniform,
    _make_lowrank_velocities,
    _uniform,
    build_lowrank_fac,
    lowrank_fac_rows,
    natural_pack,
    padded_dim,
)

__all__ = ["build_fused_hmc_op", "BLOCKSPEC_LAYOUTS"]

# The fused HMC op uses exactly the NUTS op's BlockSpec shape classes
# (same row/trace/stats/const/dense/low-rank layouts, fewer scratch
# buffers) — re-exported so tests pin probe coverage for both ops.

# packed stat columns (x K), 16 slots
(_H_SS, _H_NST, _H_SSB, _H_ACC, _H_DIV, _H_EE, _H_EN, _H_PL, _H_ACCD,
 _H_LP) = range(10)
_N_OUT = 16


@functools.lru_cache(maxsize=64)
def build_fused_hmc_op(
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
    """Build the fused HMC runner for one phase (see module docstring).

    Same contract as :func:`.fused_nuts_pallas.build_fused_nuts_op`
    (including ``metric="dense"`` with the frozen shared covariance +
    ``L^{-1}`` momentum transform, and ``adapt_dense`` block-local
    pooled-covariance adaptation), with HMC's stat streams (step_size,
    n_steps, accept, path_length, accepted, ...) in place of the tree
    stats.
    """
    if config.step_rand is not None:
        raise ValueError("the fused HMC kernel does not support step_rand")
    if metric not in ("diag", "dense", "lowrank"):
        raise ValueError(f"unknown metric {metric!r}")
    dense = metric == "dense"
    lowrank = metric == "lowrank"
    if dense and adapt_metric:
        raise ValueError("the fused HMC kernel adapts diagonal metrics "
                         "per chain; dense adaptation must be pooled "
                         "(adapt_dense) or frozen")
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
            # shared (FR, Npad) factor block, frozen for the chunk
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
        q_s, g_s, sa, sb, si = rest[:5]
        wrows = rest[5:]
        if adapt_metric:
            var_s, fgm_s, fgv_s, bgm_s, bgv_s = wrows
        elif adapt_dense:
            dwm_s, dwr_s, dbm_s, dbr_s, wsc = wrows

        i_blk = pl.program_id(0)
        t = pl.program_id(1)
        RW = q_s.shape[0]
        # stats block is natively 2-D (RW, 16*K): Mosaic cannot slice a
        # sub-128 lane width out of a 3-D block (see fused_nuts_pallas.py)
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

        seed0 = seed_ref[0] + i_blk * 7919 + t * 15485863
        if prng == "tpu":
            pltpu.prng_seed(seed0, seed_ref[1])

        lanes = _Lanes(n, Npad, RW, K)
        model = lanes.make_model(model_fn, tuple(r[:] for r in consts_refs))
        V = var_s[:] if adapt_metric else var0[:]
        if lowrank:
            stds_lr = jnp.sqrt(V)  # zero padding masks itself
            velE, _ = _make_lowrank_velocities(stds_lr, fac0[:], lowrank_k)
        else:
            velE, _ = lanes.make_velocities(V, metric)
        if prng == "tpu":
            uniform = _uniform
        else:
            si[:, 0:_LANE] = jnp.zeros((RW, _LANE), jnp.int32)
            uniform = _make_counter_uniform(lanes, si, seed0, seed_ref[1])

        q = q_s[:]
        g = g_s[:]
        lp = sac(_A_LP)

        if dense:
            p = _dense_momentum(lanes, uniform, linv0[:])
        elif lowrank:
            p = _lowrank_momentum(lanes, uniform, stds_lr, fac0[:],
                                  lowrank_k)
        else:
            p = _boxmuller_momentum(lanes, uniform, V)

        eps_v = jnp.exp(sac(_A_DLS)) if adapting else jnp.exp(sac(_A_DLB))
        # jittered path length + per-chain step count (hmc.py:141-143)
        path_u = uniform((RW, K))
        path_length = path_u * float(config.path_length)
        nst_v = jnp.clip(jnp.floor(path_length / eps_v), 1.0,
                         float(config.max_steps))

        (q_sel, g_sel, lp_sel, en, dE, acc_stat, accepted, div,
         lp_end) = run_hmc_trajectory_values(
            lanes, model, velE, coeffs, Emax, uniform,
            q, p, g, lp, eps_v, nst_v)

        # --- stats + adaptation -------------------------------------------
        set_st(_H_NST, nst_v)
        set_st(_H_ACC, acc_stat)
        set_st(_H_DIV, div.astype(jnp.float32))
        set_st(_H_EE, dE)
        set_st(_H_EN, en)
        set_st(_H_PL, path_length)
        set_st(_H_ACCD, accepted.astype(jnp.float32))
        set_st(_H_LP, lp_end)

        if adapting:
            ls_new, lb_new = _da_update_cols(sac, set_sa, acc_stat, config)
        else:
            ls_new = sac(_A_DLS)
            lb_new = sac(_A_DLB)
        set_st(_H_SS, jnp.exp(ls_new))
        set_st(_H_SSB, jnp.exp(lb_new))

        if adapt_metric and tuning:
            _welford_update_rows(lanes, q_sel, var_s, fgm_s, fgv_s,
                                 bgm_s, bgv_s, sac, set_sa, sbc, set_sb,
                                 mult)
        if adapt_dense:
            _dense_welford_batch_add(q_sel, dwm_s, dwr_s, wsc, _W_FGW)
            _dense_welford_batch_add(q_sel, dbm_s, dbr_s, wsc, _W_BGW)
            _dense_welford_swap_and_count(dwm_s, dwr_s, dbm_s, dbr_s,
                                          wsc, mult)

        set_sa(_A_ITER, sac(_A_ITER) + 1.0)
        set_sa(_A_LP, lp_sel)
        q_s[:] = q_sel
        g_s[:] = g_sel
        tr2[:] = q_sel

        @pl.when(t == T - 1)
        def _store_state():
            qf[:] = q_s[:]
            gf[:] = g_s[:]
            soutf[:] = jnp.zeros((RW, _N_SC_IN * K), jnp.float32)
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
        """Run T HMC transitions; same input contract as the NUTS fused op."""
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
                f"rows at pack={K} for the fused HMC kernel")

        const_bytes = sum(int(np.prod(cc.shape)) * 4 for cc in consts)

        def _est_bytes(RWc):
            # KEEP IN SYNC with the scratch/in/out lists below (counting
            # rules as in the NUTS op: grid-varying blocks doubled,
            # grid-invariant blocks and scratch once).
            row = RWc * Npad * 4
            lane = RWc * _LANE * 4
            sq = Npad * Npad * 4
            mrow = 8 * Npad * 4
            scratch = (2 * row + 3 * lane
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
                                "fused HMC kernel")
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
        sin = jnp.concatenate(
            [pack_scal(v) for v in scal_cols]
            + [jnp.zeros((RT, (16 - len(scal_cols)) * K), f32)], axis=1)

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
        # 2-D flattened stats layout — Mosaic rejects 3-D blocks with a
        # 16-lane last dim (BENCH_r03 tail); see fused_nuts_pallas.py.
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
            [pltpu.VMEM((RW, Npad), f32)] * 2        # q_s, g_s
            + [pltpu.VMEM((RW, _LANE), f32)] * 2     # sa, sb
            + [pltpu.VMEM((RW, _LANE), jnp.int32)]   # si (counter PRNG)
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
            step_size=stat(_H_SS),
            step_size_bar=stat(_H_SSB),
            n_steps=stat(_H_NST).astype(jnp.int32),
            accept=stat(_H_ACC),
            diverging=stat(_H_DIV) != 0,
            energy_error=stat(_H_EE),
            energy=stat(_H_EN),
            path_length=stat(_H_PL),
            accepted=stat(_H_ACCD) != 0,
            model_logp=stat(_H_LP),
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
