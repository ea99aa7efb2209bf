"""Headline benchmark: NUTS effective-samples/sec on one TPU chip.

Config: BASELINE.json #2 — 100-d correlated Gaussian, 1024 vectorized
chains, 500 tune + 1000 draws, NUTS defaults. The adaptive metric is
part of the algorithm (the reference ships adapt_diag AND adapt_full,
init_nuts sampling.py:578-597): the bench runs the per-draw and fused
engines on the diag metric plus the per-draw engine on the pooled
adaptive dense metric (cross-chain Welford covariance — it decorrelates
this target, collapsing mean tree size 72 -> 7 and raising ESS/draw to
nominal; scripts/flagship_dense_ab.py), and elects the engine with the
highest measured min-bulk-ESS/s. All engines' walls and the winner's
statistical gates are reported.

Metric: min-over-dims bulk ESS per second of on-device sampling time
(compile excluded via a warm cache re-run; the run is deterministic so
the re-run reproduces the same draws). Baseline: the reference
littlemcmc's sequential CPU path on the same target, measured on this
machine by scripts/measure_reference_baseline.py (the reference has no
accelerator path; its multiprocessing mode is broken — SURVEY.md §2).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CHAINS = 1024
TUNE = 500
DRAWS = 1000
NDIM = 100

# Reference ESS/s on this config (measured, REFERENCE_BASELINE.json).
_FALLBACK_BASELINE_ESS_PER_SEC = 159.78


def _baseline_ess_per_sec() -> float:
    """Best reference ESS/s on this target across its metrics
    (diag and — when measured — adapt_full), so the engine election on
    our side is compared against the reference's best algorithm too."""
    path = os.path.join(REPO, "REFERENCE_BASELINE.json")
    try:
        with open(path) as f:
            rows = json.load(f)["results"]
        vals = [rows[k]["ess_per_sec_min_dim"]
                for k in ("corr_gaussian_100d", "corr_gaussian_100d_full")
                if k in rows]
        return float(max(vals))
    except Exception:
        return _FALLBACK_BASELINE_ESS_PER_SEC


def _backend_reachable(timeout_s: float = 240.0) -> bool:
    """Probe the default JAX backend in a subprocess with a hard timeout.

    The tunneled TPU backend here can hang *indefinitely* (not error)
    when the relay's far side dies; a hung bench would record nothing at
    all. A subprocess is the only reliable guard — an in-process thread
    stuck in the PJRT RPC cannot be cancelled.
    """
    import subprocess

    code = ("import jax, jax.numpy as jnp; x = jnp.ones((8, 8)); "
            "(x @ x).block_until_ready(); print('BENCH_BACKEND_OK')")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
        return "BENCH_BACKEND_OK" in r.stdout
    except Exception:
        return False


def main():
    if not _backend_reachable():
        # No measurement is possible; say so instead of hanging forever.
        print(json.dumps({
            "metric": "min_bulk_ess_per_sec_corr_gaussian_100d_1024chains",
            "value": 0.0,
            "unit": "ESS/s",
            "vs_baseline": 0.0,
            "error": ("JAX backend unreachable within 240s (TPU tunnel "
                      "down) — no measurement possible this run; see "
                      "BENCH_r02.json for the last recorded on-chip "
                      "result"),
        }))
        return

    import jax
    import jax.numpy as jnp

    import littlemcmc_tpu as lmc
    from littlemcmc_tpu import models
    from littlemcmc_tpu.sampling import _make_init_fn
    from littlemcmc_tpu.model import as_logp_grad
    from littlemcmc_tpu.utils.diagnostics import ess_bulk

    model = models.CorrelatedGaussian(NDIM)
    logp_grad = as_logp_grad(model.logp_grad)
    # Whole-trajectory Pallas fast path: the full NUTS tree build runs as
    # one TPU kernel with the merge stack in VMEM and the model inlined
    # (littlemcmc_tpu/ops/nuts_trajectory_pallas.py).
    step = lmc.NUTS(model_ndim=NDIM,
                    pallas_trajectory=model.pallas_trajectory_spec())

    key = jax.random.key(42)
    k_init, k_chains = jax.random.split(key)
    starts = 2.0 * jax.random.uniform(k_init, (CHAINS, NDIM), jnp.float32) - 1.0
    chain_keys = jax.random.split(k_chains, CHAINS)

    # Chunked execution: long single XLA executions are killed by the
    # remote-TPU transport, and chunking also matches production use
    # (progress + checkpoints). One tune chunk + one draw chunk compile.
    from littlemcmc_tpu.sampling import (_make_adaptive_potential,
                                         _make_chunk_runner)

    CHUNK = 250
    assert TUNE % CHUNK == 0 and DRAWS % CHUNK == 0

    def tune_plan(fac):
        """Tune chunking = the production path's. Fused pooled factories
        carry a boundary schedule (the chunking IS the metric-refresh
        cadence — base.pooled_tune_schedule); others run uniform
        CHUNK-length tune chunks."""
        sched = getattr(fac, "tune_chunk_schedule", None)
        cap = getattr(fac, "tune_chunk_cap", None)
        plan, t, runners = [], 0, {}
        while t < TUNE:
            c = min(TUNE - t, CHUNK)
            if sched is not None:
                c = min(c, sched(t))
            elif cap:
                c = min(c, cap)
            if c not in runners:
                runners[c] = fac(c, True, False)
            plan.append(runners[c])
            t += c
        return plan

    def run_engine(tune_runners, draw_chunk, states0):
        """Warm-up + timed run (min of 2 repeats against the tunnel's
        dispatch jitter); returns (wall times, draws, stats)."""
        t0 = time.perf_counter()
        s = states0
        for tc in dict.fromkeys(tune_runners):  # each distinct program
            s, _, _ = tc(s)
        s2, out, _ = draw_chunk(s)
        jax.block_until_ready(out)
        warm = time.perf_counter() - t0

        tune_seconds = draw_seconds = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            s = states0
            for tc in tune_runners:
                s, _, _ = tc(s)
            jax.block_until_ready(s)
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            outs_i = []
            for _ in range(DRAWS // CHUNK):
                s, out, _ = draw_chunk(s)
                outs_i.append(out)
            jax.block_until_ready(s)
            ds = time.perf_counter() - t0
            if ts + ds < tune_seconds + draw_seconds:
                tune_seconds, draw_seconds = ts, ds
            outs = outs_i  # deterministic: every repeat draws the same
        return warm, tune_seconds, draw_seconds, outs

    def init_states(kind):
        init_fn = _make_init_fn(step.config, logp_grad, NDIM, kind,
                                jnp.float32, False)
        return init_fn(chain_keys, starts)

    states_diag = init_states("diag")

    # Engine A: per-draw trajectory kernel in a lax.scan, diag metric.
    kernel = step.build_kernel(logp_grad)
    engines = {
        "per_draw_diag": (
            [_make_chunk_runner(kernel, CHUNK, True, False, False)]
            * (TUNE // CHUNK),
            _make_chunk_runner(kernel, CHUNK, False, True, False),
            states_diag,
        )
    }
    # Engine B: fused multi-draw kernel (CHUNK transitions/pallas_call,
    # on-core momentum/dual-averaging/Welford), diag metric.
    try:
        from littlemcmc_tpu.nuts import build_fused_nuts_runner_factory

        pot_template = _make_adaptive_potential(
            NDIM, jnp.zeros(NDIM), False, jnp.float32)
        fused_factory = build_fused_nuts_runner_factory(
            step.config, model.pallas_trajectory_spec(), pot_template,
            NDIM, CHAINS)
        engines["fused_diag"] = (tune_plan(fused_factory),
                                 fused_factory(CHUNK, False, True),
                                 states_diag)
    except Exception as e:  # pragma: no cover - fused path unavailable
        print(f"# fused engine unavailable: {e}", flush=True)
    # Engine C: per-draw kernel on the pooled adaptive dense metric
    # (cross-chain Welford covariance; reference algorithm adapt_full,
    # init_nuts sampling.py:588-597, pooled across chains as only a
    # vectorized sampler can). Decorrelates this target: mean tree size
    # drops 72 -> 7 and ESS/draw reaches nominal.
    try:
        kernel_dense = step.build_kernel(logp_grad, pooled_metric=True)
        engines["per_draw_dense_pooled"] = (
            [_make_chunk_runner(kernel_dense, CHUNK, True, False, True)]
            * (TUNE // CHUNK),
            _make_chunk_runner(kernel_dense, CHUNK, False, True, True),
            init_states("full"),
        )
    except Exception as e:  # pragma: no cover
        print(f"# dense-pooled engine unavailable: {e}", flush=True)
    # Engine D: fused multi-draw kernel on the pooled dense metric —
    # block-local pooled Welford covariance in VMEM, exact Chan combine +
    # one shared Cholesky per chunk boundary, momentum via an L^{-1}
    # matmul (no per-draw triangular solves).
    try:
        pot_full = _make_adaptive_potential(
            NDIM, jnp.zeros(NDIM), "full", jnp.float32)
        fused_dense_factory = build_fused_nuts_runner_factory(
            step.config, model.pallas_trajectory_spec(), pot_full,
            NDIM, CHAINS, pooled=True)
        engines["fused_dense_pooled"] = (
            tune_plan(fused_dense_factory),
            fused_dense_factory(CHUNK, False, True),
            init_states("full"),
        )
    except Exception as e:  # pragma: no cover
        print(f"# fused dense-pooled engine unavailable: {e}", flush=True)

    results_by_engine = {}
    for name, (tc, dc, s0) in engines.items():
        try:
            warm_e, tune_s, draw_s, outs_e = run_engine(tc, dc, s0)
        except Exception as e:
            print(f"# engine {name} failed: {type(e).__name__}: {e}",
                  flush=True)
            continue
        results_by_engine[name] = (warm_e, tune_s, draw_s, outs_e)

    # Election is by measured min-bulk-ESS/s (engines on different
    # metrics produce different ESS per draw, so wall alone is wrong).
    ess_by_engine = {}
    trace_by_engine = {}
    for name, (warm_e, tune_s, draw_s, outs_e) in results_by_engine.items():
        qs = np.concatenate(
            [np.asarray(jax.device_get(o[0])) for o in outs_e], axis=0)
        tr = qs.transpose(1, 0, 2)  # (chains, draws, ndim)
        ess_arr = np.array([ess_bulk(tr[:, :, i]) for i in range(NDIM)])
        ess_by_engine[name] = float(np.nanmin(ess_arr))
        trace_by_engine[name] = tr

    def score(name):
        w = results_by_engine[name]
        return ess_by_engine[name] / (w[1] + w[2])

    best = max(results_by_engine, key=score)
    warm, tune_seconds, draw_seconds, outs = results_by_engine[best]
    sample_seconds = tune_seconds + draw_seconds
    engine_walls = {k: round(v[1] + v[2], 2)
                    for k, v in results_by_engine.items()}
    engine_ess_per_sec = {k: round(score(k), 1) for k in results_by_engine}

    trace = trace_by_engine[best]
    diverging = np.concatenate(
        [np.asarray(jax.device_get(o[1].diverging)) for o in outs], axis=0
    )

    min_ess = ess_by_engine[best]
    ess_per_sec = min_ess / sample_seconds
    transitions_per_sec = CHAINS * (TUNE + DRAWS) / sample_seconds

    # --- Roofline: measure "fast" against the chip, not just the CPU
    # baseline. Draw phase only (tree sizes are collected there).
    # v5e public peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM. The model
    # matmuls run at precision="highest" (~6 bf16 passes per f32
    # product), so the physical MXU ceiling for exact-f32 is ~197/6.
    tree_sizes = np.concatenate(
        [np.asarray(jax.device_get(o[1].tree_size)) for o in outs], axis=0
    )  # (draws, chains)
    NPAD = 128  # kernel's padded lane width for NDIM=100
    leaps_effective = float(tree_sizes.sum())
    # lock-step execution: every chain in a block integrates until the
    # block's deepest tree finishes (2 blocks of 512; global max is a
    # close upper bound)
    leaps_executed = float(tree_sizes.max(axis=1).sum() * CHAINS)
    # one (Npad,)x(Npad,Npad) model matvec per leaf; the dense metric
    # adds two velocity matvecs of the same shape
    n_matvecs = 3 if "dense" in best else 1
    flop_per_leap = 2.0 * NPAD * NPAD * n_matvecs
    model_tflops = leaps_executed * flop_per_leap / draw_seconds / 1e12
    # HBM bytes/transition: the Pallas kernel touches HBM only for the
    # per-transition inputs/outputs (states + scalars; the merge stack
    # lives in VMEM); plus the XLA-side trace/stats writes.
    kernel_bytes = (6 * CHAINS * NPAD + 24 * CHAINS) * 4  # per draw, all chains
    trace_bytes = (CHAINS * NDIM + 12 * CHAINS) * 4
    hbm_gb_s = DRAWS * (kernel_bytes + trace_bytes) / draw_seconds / 1e9
    roofline = {
        "draw_seconds": round(draw_seconds, 2),
        "leapfrogs_per_sec_effective": round(leaps_effective / draw_seconds),
        "leapfrogs_per_sec_executed_lockstep": round(leaps_executed / draw_seconds),
        "lockstep_efficiency": round(leaps_effective / leaps_executed, 3),
        "model_matmul_tflops_algorithmic": round(model_tflops, 3),
        "mxu_pct_of_bf16_peak": round(100 * model_tflops / 197.0, 2),
        "mxu_pct_of_exact_f32_peak": round(100 * model_tflops / (197.0 / 6), 2),
        "hbm_gb_per_sec": round(hbm_gb_s, 2),
        "hbm_pct_of_peak": round(100 * hbm_gb_s / 819.0, 3),
        "time_per_executed_leapfrog_us": round(
            draw_seconds / (leaps_executed / CHAINS) * 1e6, 2),
    }

    baseline = _baseline_ess_per_sec()
    result = {
        "metric": "NUTS bulk-ESS/s (min over dims), 100-d corr Gaussian, "
                  f"{CHAINS} chains, 1 chip",
        "value": round(ess_per_sec, 1),
        "unit": "ESS/s",
        "vs_baseline": round(ess_per_sec / baseline, 2),
        "extra": {
            "sample_seconds": round(sample_seconds, 2),
            "engine": best,
            "engine_walls_seconds": engine_walls,
            "engine_min_ess_per_sec": engine_ess_per_sec,
            "roofline": roofline,
            "compile_plus_first_run_seconds": round(warm, 2),
            "transitions_per_sec": round(transitions_per_sec, 1),
            "min_ess_bulk": round(min_ess, 1),
            "divergence_rate": round(float(diverging.mean()), 5),
            "posterior_mean_abs": round(float(np.abs(trace.mean(axis=(0, 1))).mean()), 4),
            "posterior_var_ratio": round(
                float((trace.reshape(-1, NDIM).var(axis=0) / model.true_var).mean()), 3
            ),
            "baseline_ess_per_sec_reference_cpu": baseline,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
