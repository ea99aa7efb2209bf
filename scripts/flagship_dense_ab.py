"""Flagship config with the pooled adaptive dense metric, end-to-end.

The diag-metric flagship builds 72-leaf trees (DEPTH_REBLOCK_STUDY):
the AR(1) correlation structure forces deep trajectories a diagonal
mass matrix cannot remove. The pooled QuadPotentialFullAdapt
(cross-chain Welford covariance, shared Cholesky) decorrelates the
target, collapsing tree depth AND raising ESS/draw — the algorithmic
win the reference documents as adapt_full (init_nuts, sampling.py:588).

Measures min-bulk-ESS/s through public sample() for diag vs pooled
dense at the flagship shape. Run on TPU: python scripts/flagship_dense_ab.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHAINS = 1024
TUNE = 500
DRAWS = 1000
NDIM = 100


def main():
    import jax

    import littlemcmc_tpu as lmc
    from littlemcmc_tpu import models
    from littlemcmc_tpu.utils.diagnostics import ess_bulk

    model = models.CorrelatedGaussian(NDIM)

    configs = {
        "diag": {},
        "dense_pooled": {"init": "jitter+adapt_full",
                         "cross_chain_adapt": True},
        "dense_pooled_fused": {"init": "jitter+adapt_full",
                               "cross_chain_adapt": True,
                               "fuse_draws": True},
    }
    for name, extra in configs.items():
        common = dict(
            logp_dlogp_func=model.logp_grad, model_ndim=NDIM, chains=CHAINS,
            random_seed=42, progressbar=False, progress_every=250,
            pallas_trajectory=model.pallas_trajectory_spec(), **extra,
        )
        try:
            lmc.sample(tune=250, draws=250, **common)  # warm compile caches
            t0 = time.perf_counter()
            trace, stats = lmc.sample(tune=TUNE, draws=DRAWS, **common)
            wall = time.perf_counter() - t0
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        div = float(np.asarray(stats["diverging"]).mean())
        ts = np.asarray(stats["tree_size"])
        vr = float((trace.reshape(-1, NDIM).var(axis=0) / model.true_var).mean())
        ess = np.array([ess_bulk(trace[:, :, i]) for i in range(NDIM)])
        print(f"{name}: wall={wall:.2f}s  min_ess/s={np.nanmin(ess) / wall:,.0f}"
              f"  min_ess={np.nanmin(ess):,.0f}  div={div:.4f}  "
              f"var_ratio={vr:.4f}  mean_tree={ts.mean():.1f}", flush=True)


if __name__ == "__main__":
    main()
