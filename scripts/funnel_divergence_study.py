"""Why does the centered funnel diverge 2.2x more than the reference?

VERDICT r4 item 5: VALIDATION config 4 (Neal's funnel 10-d, centered,
target 0.9) records divergence rate 0.0381 ours vs 0.0175 reference —
alongside *better* neck coverage (v std 2.57 vs 2.13, v q05 -3.21 vs
-1.86 against the exact -4.94). Two candidate causes:

1. **Coverage**: divergences on the funnel happen in the neck (v < 0,
   curvature e^{-v}); a sampler that visits the neck more diverges more
   *at equal quality*. Test: compare P(divergence) conditioned on neck
   occupancy, and the occupancy itself.
2. **Precision**: we default to f32; the reference is f64 end-to-end.
   f32 gradient error in the neck could produce spurious |dE| > Emax.
   Test: the identical f32 config re-run with dtype=float64.

Arms (512 chains x 3000 draws, 1000 tune, seed 4 — the exact VALIDATION
config-4 shape): f32 / f64 / f32 @ target 0.95. Writes
FUNNEL_DIVERGENCE_STUDY.json with, per arm: divergence rate, v-coverage
stats, accept, depth, step size, neck occupancy P(v < -2), and the
divergence-given-occupancy decomposition.

Run (TPU or CPU): python scripts/funnel_divergence_study.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHAINS, TUNE, DRAWS = 512, 1000, 3000


def main():
    import jax

    on_tpu = jax.default_backend() != "cpu"
    import jax.numpy as jnp

    import littlemcmc_tpu as lmc
    from littlemcmc_tpu import models

    fm = models.NealsFunnel(10)

    def run(name, dtype, target):
        common = dict(
            logp_dlogp_func=fm.logp_grad, model_ndim=10, tune=TUNE,
            draws=DRAWS, chains=CHAINS, random_seed=4, progressbar=False,
            target_accept=target, compute_convergence_checks=False,
        )
        if on_tpu and dtype == "float32":
            common["pallas_trajectory"] = fm.pallas_trajectory_spec()
            common["progress_every"] = 1000
        if dtype == "float64":
            common["dtype"] = jnp.float64
        t0 = time.perf_counter()
        trace, stats = lmc.sample(**common)
        wall = time.perf_counter() - t0
        tr = np.asarray(trace)
        v = tr[:, :, 0]  # (chains, draws)
        div = np.asarray(stats["diverging"])  # (chains, draws)
        neck = v < -2.0
        row = {
            "dtype": dtype,
            "target_accept": target,
            "wall_s": round(wall, 1),
            "divergence_rate": round(float(div.mean()), 5),
            "v_mean": round(float(v.mean()), 3),
            "v_std": round(float(v.std()), 3),
            "v_q05": round(float(np.percentile(v, 5)), 3),
            "v_q95": round(float(np.percentile(v, 95)), 3),
            "mean_accept": round(float(
                np.asarray(stats["mean_tree_accept"]).mean()), 4),
            "mean_depth": round(float(
                np.asarray(stats["depth"]).mean()), 3),
            "mean_final_step": round(float(
                np.asarray(stats["step_size"]).mean()), 5),
            # decomposition: occupancy x conditional divergence rate
            "p_neck": round(float(neck.mean()), 5),
            "p_div_given_neck": round(
                float(div[neck].mean()) if neck.any() else 0.0, 5),
            "p_div_given_not_neck": round(float(div[~neck].mean()), 5),
        }
        print(name, json.dumps(row), flush=True)
        return row

    out = {"backend": jax.default_backend(),
           "config": {"chains": CHAINS, "tune": TUNE, "draws": DRAWS,
                      "model": "NealsFunnel(10) centered", "seed": 4},
           "reference_row": {
               "divergence_rate": 0.0175, "v_std": 2.130, "v_q05": -1.855,
               "mean_accept": 0.642, "mean_depth": 3.14,
               "note": "VALIDATION.md config 4 (2 chains x 3000, f64, "
                       "cores=1 sequential path)"},
           "arms": {}}
    path = os.path.join(REPO, "FUNNEL_DIVERGENCE_STUDY.json")
    for name, dtype, target in (
            ("f32_t090", "float32", 0.9),
            ("f64_t090", "float64", 0.9),
            ("f32_t095", "float32", 0.95)):
        out["arms"][name] = run(name, dtype, target)
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
