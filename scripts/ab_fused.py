"""A/B: fused multi-draw engine vs per-draw engine, end-to-end sample().

The round-2 verdict's #1 done-criterion: eight-schools and config-1
end-to-end transitions/s must reach >=2x the round-2 (per-draw) numbers
with the fused engine. This measures both engines through the public
``sample(fuse_draws=...)`` knob on the real backend and writes
AB_FUSED.json at the repo root.

Run (on TPU): python scripts/ab_fused.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Round-2 per-draw BENCH_SUITE.json transitions/s on the same configs
# (the >=2x gate's denominators). corr_gaussian_100d_full_pooled is the
# VERDICT #2 target (per-chain row 14.8k; pooled per-draw row 56.5k).
R02 = {"std_normal_1d": 315263.1, "eight_schools_10k_chains": 555711.0,
       "corr_gaussian_100d_diag": 59113.6,
       "corr_gaussian_100d_full_pooled": 56489.2,
       # no round-2 pooled-diag suite row: compare against the per-chain
       # diag row, the closest per-draw ancestor of this config
       "corr_gaussian_100d_diag_pooled": 59113.6}


def run(name, model, chains, tune, draws, target_accept, fuse, **extra):
    import littlemcmc_tpu as lmc

    common = dict(
        logp_dlogp_func=model.logp_grad, model_ndim=model.ndim,
        chains=chains, random_seed=42, progressbar=False,
        progress_every=250, target_accept=target_accept,
        pallas_trajectory=model.pallas_trajectory_spec(), fuse_draws=fuse,
        **extra,
    )
    lmc.sample(tune=250, draws=250, **common)  # warm the jit caches
    t0 = time.perf_counter()
    trace, stats = lmc.sample(tune=tune, draws=draws, **common)
    wall = time.perf_counter() - t0
    tps = chains * (tune + draws) / wall
    div = float(np.asarray(stats["diverging"]).mean())
    print(f"{name} fuse={fuse}: {tps:,.0f} trans/s  wall={wall:.2f}s "
          f"div={div:.4f}", flush=True)
    return {"transitions_per_sec": round(tps, 1), "wall_s": round(wall, 2),
            "divergence_rate": round(div, 5)}


def main():
    import jax

    from littlemcmc_tpu import models

    configs = {
        "std_normal_1d": (models.StandardNormal(1), 1024, 500, 1000, 0.8, {}),
        "corr_gaussian_100d_diag": (
            models.CorrelatedGaussian(100), 1024, 500, 1000, 0.8, {}),
        "eight_schools_10k_chains": (
            models.EightSchools(), 10240, 500, 500, 0.95, {}),
        # pooled diag: EVERY phase fused (per-chain Welford on core,
        # pooling once per chunk boundary) — new in round 3
        "corr_gaussian_100d_diag_pooled": (
            models.CorrelatedGaussian(100), 1024, 500, 1000, 0.8,
            {"cross_chain_adapt": True}),
        # pooled dense: EVERY phase fused — tune chunks carry the
        # block-local pooled covariance on core (round-3 adapt_dense)
        "corr_gaussian_100d_full_pooled": (
            models.CorrelatedGaussian(100), 256, 500, 1000, 0.8,
            {"init": "jitter+adapt_full", "cross_chain_adapt": True}),
    }
    out = {"backend": jax.default_backend(), "results": {}}
    for name, (model, chains, tune, draws, ta, extra) in configs.items():
        row = {}
        for fuse in (False, None):
            label = "per_draw" if fuse is False else "fused_auto"
            row[label] = run(name, model, chains, tune, draws, ta, fuse,
                             **extra)
        ratio = (row["fused_auto"]["transitions_per_sec"]
                 / row["per_draw"]["transitions_per_sec"])
        row["fused_over_perdraw"] = round(ratio, 2)
        row["r02_transitions_per_sec"] = R02[name]
        row["fused_over_r02"] = round(
            row["fused_auto"]["transitions_per_sec"] / R02[name], 2)
        out["results"][name] = row
        print(f"{name}: fused/per-draw = {ratio:.2f}x, "
              f"fused/r02 = {row['fused_over_r02']:.2f}x", flush=True)

    path = os.path.join(REPO, "AB_FUSED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
