"""Sweep chain_block for the FUSED pooled-dense engine on the flagship.

`CB_SWEEP.json` (round 4) swept the per-draw trajectory kernel and
predates the bf16x3 matvec; the headline engine is now the fused
pooled-dense kernel at its default chain_block=256 (VMEM-shrunk when
the estimate overflows). This sweeps the now-plumbed `NUTS(chain_block=)`
knob through public `sample()` with device-only timing.

Run on TPU: python scripts/fused_cb_sweep.py  (writes FUSED_CB_SWEEP.json)
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHAINS, TUNE, DRAWS, N = 1024, 500, 1000, 100
BLOCKS = (64, 128, 256, 512)


def main():
    import jax

    import littlemcmc_tpu as lmc
    from littlemcmc_tpu import models

    model = models.CorrelatedGaussian(N)
    out = {"backend": jax.default_backend(), "chains": CHAINS,
           "tune": TUNE, "draws": DRAWS,
           "timing": "device-only via sample(perf_report=...), min of 3; "
                     "compile excluded by a warm run", "results": {}}
    path = os.path.join(REPO, "FUSED_CB_SWEEP.json")
    for cb in BLOCKS:
        step = lmc.NUTS(model_ndim=N, chain_block=cb,
                        pallas_trajectory=model.pallas_trajectory_spec())
        common = dict(
            logp_dlogp_func=model.logp_grad, model_ndim=N, chains=CHAINS,
            random_seed=42, progressbar=False, progress_every=250,
            init="jitter+adapt_full", cross_chain_adapt=True,
            fuse_draws=True, step=step, compute_convergence_checks=False,
        )
        lmc.sample(tune=TUNE, draws=250, perf_report={}, **common)  # warm
        best = None
        for _ in range(3):
            rep = {}
            lmc.sample(tune=TUNE, draws=DRAWS, perf_report=rep, **common)
            best = rep if best is None or (rep["sample_seconds"]
                                           < best["sample_seconds"]) else best
        row = {"engine": best["engine"],
               "device_sample_s": round(best["sample_seconds"], 3),
               "transitions_per_sec": round(
                   CHAINS * (TUNE + DRAWS) / best["sample_seconds"], 1)}
        out["results"][str(cb)] = row
        print(cb, json.dumps(row), flush=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
