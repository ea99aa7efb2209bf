"""Whole-trajectory classic HMC as a single Pallas TPU kernel.

The counterpart of :mod:`.nuts_trajectory_pallas` for the
``HamiltonianMC`` step method (reference ``hmc.py:140-182``): one
``pallas_call`` integrates every chain's jittered-length trajectory with
the working state in VMEM and the model inlined, then Metropolis-accepts
on core. Strictly simpler than the NUTS kernel — no merge stack, no
U-turn machinery — so the working state rides in plain while-loop
carries instead of scratch.

Shares the NUTS kernel's layout machinery: the same
:class:`~.nuts_trajectory_pallas.PallasModelSpec` models (including
``packed_fn`` lane packing for small n), the same pluggable PRNG (on-core
on TPU, murmur3 counter under ``interpret=True``), and the same
exact-f32 + ``finite()``-clamped indicator dots for packed segment math.

Semantics replayed from the reference (``hmc.py:140-182``): per-chain
``n_steps`` is computed by the XLA wrapper (jittered path length over
threefry, identically distributed to the XLA path's draw — different
key-consumption order, so not bitwise-equal); each chain integrates its
own ``n_steps`` leapfrogs (lanes past their count are frozen);
divergence on non-finite end energy or ``|ΔE| > Emax`` with NaN ⇒ −inf
energy change (``hmc.py:151-162``); accept w.p. ``min(1, exp(ΔE))``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..integration import INTEGRATOR_COEFFS
from .nuts_trajectory_pallas import (
    _LANE,
    _N_SCALARS,
    _Lanes,
    _uniform,
    PallasModelSpec,
    padded_dim,
)

__all__ = ["build_hmc_trajectory_op"]

# columns (x K) in the packed scalar input
_IN_LOGP, _IN_EPS, _IN_NSTEPS = 0, 1, 2
_N_IN = 4
# columns (x K) in the packed scalar output
(_O_EN, _O_DE, _O_ACCSTAT, _O_ACCEPTED, _O_DIV, _O_LOGP,
 _O_LOGP_END) = range(7)
_N_OUT = 8


def run_hmc_trajectory_values(lanes, model, velE, coeffs, Emax, uniform,
                              q0v, p0v, g0v, lp0, eps_v, nst_v):
    """One fixed-count-per-chain HMC trajectory + Metropolis accept.

    Pure value-level (no refs), shared by the per-draw and fused HMC
    kernels. Returns ``(q_sel, g_sel, lp_sel, en, dE, acc_stat,
    accepted, div, lp_end)`` — the Metropolis-selected state plus the
    end-state statistics (reference ``hmc.py:140-171`` semantics).
    """
    b_coef, a_coef = coeffs
    bc, bcb, segsum = lanes.bc, lanes.bcb, lanes.segsum
    RW, K = lanes.RW, lanes.K
    epsb = bc(eps_v)
    E0 = 0.5 * segsum(p0v * velE(p0v)) - lp0
    max_sched = jnp.max(nst_v)

    def body(carry):
        t, q, p, g, lp = carry
        live = t < nst_v  # (RW, K) — each chain runs its own count
        pn = p + (b_coef[0] * epsb) * g
        qn = q
        lpn = lp
        gn = g
        for i, ai in enumerate(a_coef):
            qn = qn + (ai * epsb) * velE(pn)
            lpn, gn = model(qn)
            pn = pn + (b_coef[i + 1] * epsb) * gn
        lb = bcb(live)
        q = jnp.where(lb, qn, q)
        p = jnp.where(lb, pn, p)
        g = jnp.where(lb, gn, g)
        lp = jnp.where(live, lpn, lp)
        return (t + 1.0, q, p, g, lp)

    def cond(carry):
        t = carry[0]
        return t < max_sched

    _, q, p, g, lp = lax.while_loop(
        cond, body, (jnp.float32(0.0), q0v, p0v, g0v, lp0))

    en = 0.5 * segsum(p * velE(p)) - lp
    dE = E0 - en  # reference: energy_change = start - end (hmc.py:158)
    dE = jnp.where(jnp.isnan(dE), float("-inf"), dE)
    div = (~jnp.isfinite(en)) | (jnp.abs(dE) > Emax)
    acc_stat = jnp.minimum(1.0, jnp.exp(dE))
    u = uniform((RW, K))
    accepted = (~div) & (u < acc_stat)
    accb = bcb(accepted)
    q_sel = jnp.where(accb, q, q0v)
    g_sel = jnp.where(accb, g, g0v)
    lp_sel = jnp.where(accepted, lp, lp0)
    return q_sel, g_sel, lp_sel, en, dE, acc_stat, accepted, div, lp


def _build_hmc_kernel_body(model_fn, n_consts, n, Npad, CB, Emax, coeffs,
                           prng="tpu", pack=1):
    K = int(pack)
    RW = CB // K
    SEG = Npad // K
    assert CB % K == 0 and Npad % K == 0 and SEG >= n + _N_SCALARS

    def kernel(seed_ref, q0, p0, g0, sin, var, *rest):
        consts_refs = rest[:n_consts]
        q_out, g_out, so = rest[n_consts:]

        if prng == "tpu":
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 7919, seed_ref[1])
        lanes = _Lanes(n, Npad, RW, K)
        model = lanes.make_model(model_fn, tuple(r[:] for r in consts_refs))
        velE, _ = lanes.make_velocities(var[:], "diag")

        if prng == "tpu":
            uniform = _uniform
        else:
            # value-carried counter (no i32 scratch in the HMC kernel):
            # a one-element closure cell stands in for the scratch column
            counter = [jnp.zeros((RW, K), jnp.int32)]

            def uniform(shape, _c=counter):
                # murmur3 counter stream, same construction as
                # _make_counter_uniform but with the counter in a cell
                from .nuts_trajectory_pallas import _fmix32

                row_i = lax.broadcasted_iota(jnp.int32, (RW, K), 0)
                seg_i = lax.broadcasted_iota(jnp.int32, (RW, K), 1)
                lane = row_i * K + seg_i
                base = seed_ref[0] + pl.program_id(0) * 7919
                salt = _fmix32(
                    (base + lane * 101027).astype(jnp.uint32)
                    ^ (jnp.asarray(seed_ref[1]).astype(jnp.uint32)
                       * jnp.uint32(0x9E3779B9))
                )
                _c[0] = _c[0] + 1
                x = _fmix32(salt ^ (_c[0].astype(jnp.uint32)
                                    * jnp.uint32(0x9E3779B9)))
                bits24 = (x >> jnp.uint32(8)).astype(jnp.int32)
                return (bits24.astype(jnp.float32) + 0.5) * (1.0 / (1 << 24))

        lp = sin[:, _IN_LOGP * K:(_IN_LOGP + 1) * K]
        eps_v = sin[:, _IN_EPS * K:(_IN_EPS + 1) * K]
        nst_v = sin[:, _IN_NSTEPS * K:(_IN_NSTEPS + 1) * K]  # f32, small ints

        (q_sel, g_sel, lp_sel, en, dE, acc_stat, accepted, div,
         lp_end) = run_hmc_trajectory_values(
            lanes, model, velE, coeffs, Emax, uniform,
            q0[:], p0[:], g0[:], lp, eps_v, nst_v)

        q_out[:] = q_sel
        g_out[:] = g_sel
        so[:, _O_EN * K:(_O_EN + 1) * K] = en
        so[:, _O_DE * K:(_O_DE + 1) * K] = dE
        so[:, _O_ACCSTAT * K:(_O_ACCSTAT + 1) * K] = acc_stat
        so[:, _O_ACCEPTED * K:(_O_ACCEPTED + 1) * K] = accepted.astype(jnp.float32)
        so[:, _O_DIV * K:(_O_DIV + 1) * K] = div.astype(jnp.float32)
        so[:, _O_LOGP * K:(_O_LOGP + 1) * K] = lp_sel
        so[:, _O_LOGP_END * K:(_O_LOGP_END + 1) * K] = lp_end

    return kernel


@functools.lru_cache(maxsize=128)
def build_hmc_trajectory_op(
    spec: PallasModelSpec,
    n: int,
    Emax: float,
    integrator: str = "leapfrog",
    chain_block: int = 512,
    interpret: bool = False,
    vmem_limit_bytes: int = 64 * 1024 * 1024,
    prng: str | None = None,
    pack: int = 1,
):
    """Build ``traj(q, p, grad, logp, eps, n_steps, var, seed)`` for HMC.

    Inputs are per-chain ``(C, n)`` / ``(C,)`` arrays plus a scalar int32
    seed; ``n_steps`` is the per-chain leapfrog count (computed by the
    caller from the jittered path length, reference ``hmc.py:141-143``).
    Returns a dict with the *selected* (Metropolis) position/gradient/
    logp and the end-state energy, energy change, acceptance statistic,
    and accepted/diverging flags. Diagonal metrics only.
    """
    if prng is None:
        prng = "counter" if interpret else "tpu"
    coeffs = INTEGRATOR_COEFFS[integrator]
    K = int(pack)
    if K > 1:
        if spec.packed_fn is None:
            raise ValueError("this PallasModelSpec has no packed_fn; "
                             "build with pack=1")
        Npad = _LANE
        SEG = Npad // K
        if SEG < n + _N_SCALARS:
            raise ValueError(f"pack={K} leaves {SEG}-lane segments but the "
                             f"model needs {n + _N_SCALARS}")
        model_fn = spec.packed_fn
        consts = tuple(spec.packed_consts(K, SEG)) if spec.packed_consts else ()
    else:
        Npad = padded_dim(n)
        SEG = Npad
        model_fn = spec.fn
        consts = spec.consts
    n_consts = len(consts)

    def traj(q, p, grad, logp, eps, n_steps, var, seed):
        C = q.shape[0]
        CB = min(chain_block, C)
        while CB >= 1 and (C % CB or CB % K):
            CB //= 2
        if CB < 1 or CB // K < 8:
            raise ValueError(
                f"chains={C} has no usable chain-block divisor with >= 8 "
                f"rows at pack={K}; choose a chain count divisible by "
                f"{8 * K} for the Pallas HMC trajectory path"
            )
        RW = CB // K
        RT = C // K

        f32 = jnp.float32

        def pack_rows(x2d):
            xp = jnp.pad(x2d.astype(f32), ((0, 0), (0, SEG - n)))
            return xp.reshape(RT, K * SEG)

        def pack_scal(v):
            return v.astype(f32).reshape(RT, K)

        qp, pp, gp, vp = (pack_rows(x) for x in (q, p, grad, var))
        sin = jnp.zeros((RT, _N_IN * K), f32)
        sin = sin.at[:, _IN_LOGP * K:(_IN_LOGP + 1) * K].set(pack_scal(logp))
        sin = sin.at[:, _IN_EPS * K:(_IN_EPS + 1) * K].set(pack_scal(eps))
        sin = sin.at[:, _IN_NSTEPS * K:(_IN_NSTEPS + 1) * K].set(
            pack_scal(n_steps))
        seed1 = jnp.asarray(seed, jnp.int32).reshape(-1)
        if seed1.shape[0] < 2:
            seed1 = jnp.concatenate([seed1, seed1])
        seed1 = seed1[:2]

        grid = (RT // RW,)
        row_spec = pl.BlockSpec((RW, Npad), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        in_spec = pl.BlockSpec((RW, _N_IN * K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        out_sc_spec = pl.BlockSpec((RW, _N_OUT * K), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
        const_specs = [
            pl.BlockSpec(cc.shape, (lambda i, _nd=np.ndim(cc): (0,) * _nd),
                         memory_space=pltpu.VMEM)
            for cc in consts
        ]

        kernel = _build_hmc_kernel_body(
            model_fn, n_consts, n, Npad, CB, float(Emax), coeffs,
            prng=prng, pack=K,
        )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      row_spec, row_spec, row_spec, in_spec, row_spec]
                     + const_specs,
            out_shape=[
                jax.ShapeDtypeStruct((RT, Npad), f32),
                jax.ShapeDtypeStruct((RT, Npad), f32),
                jax.ShapeDtypeStruct((RT, _N_OUT * K), f32),
            ],
            out_specs=[row_spec, row_spec, out_sc_spec],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_bytes),
            interpret=interpret,
        )(seed1, qp, pp, gp, sin, vp, *consts)

        q_o, g_o, so = outs

        def unpack_rows(x):
            return x.reshape(C, SEG)[:, :n]

        def so_col(c):
            return so[:, c * K:(c + 1) * K].reshape(C)

        return dict(
            q=unpack_rows(q_o),
            grad=unpack_rows(g_o),
            logp=so_col(_O_LOGP),
            logp_end=so_col(_O_LOGP_END),
            energy=so_col(_O_EN),
            energy_change=so_col(_O_DE),
            accept_stat=so_col(_O_ACCSTAT),
            accepted=so_col(_O_ACCEPTED) != 0,
            diverging=so_col(_O_DIV) != 0,
        )

    return traj
