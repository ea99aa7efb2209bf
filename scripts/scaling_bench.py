"""Chain-scaling sweep on one chip: transitions/s vs chain count.

The reference's only scaling axis is OS processes (at most `cores`
chains active); here chains are vectorized lanes, so single-chip
throughput should scale near-linearly until the VPU/MXU saturate.
Device-only methodology (compile and host transfers excluded), 100-d
correlated Gaussian with the Pallas trajectory kernel.

Run: python scripts/scaling_bench.py  (writes BENCH_SCALING.json)
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = 100
TUNE, DRAWS = 300, 300
CHAIN_COUNTS = (256, 1024, 4096, 16384)


def main():
    import jax

    import littlemcmc_tpu as lmc
    from littlemcmc_tpu import models
    from littlemcmc_tpu.model import as_logp_grad
    from littlemcmc_tpu.sampling import _make_init_fn, _make_chunk_runner

    model = models.CorrelatedGaussian(N)
    logp_grad = as_logp_grad(model.logp_grad)

    results = {}
    for chains in CHAIN_COUNTS:
        step = lmc.NUTS(model_ndim=N,
                        pallas_trajectory=model.pallas_trajectory_spec())
        kernel = step.build_kernel(logp_grad)
        init_fn = _make_init_fn(step.config, logp_grad, N, False,
                                jax.numpy.float32, False)
        key = jax.random.key(7)
        k_init, k_chains = jax.random.split(key)
        starts = 2.0 * jax.random.uniform(
            k_init, (chains, N), jax.numpy.float32) - 1.0
        states = init_fn(jax.random.split(k_chains, chains), starts)

        tune_chunk = _make_chunk_runner(kernel, TUNE, True, False, False)
        draw_chunk = _make_chunk_runner(kernel, DRAWS, False, False, False)
        # warm (compile)
        s, _, _ = tune_chunk(states)
        s2, _, _ = draw_chunk(s)
        jax.block_until_ready(s2.q)
        t0 = time.perf_counter()
        s, _, _ = tune_chunk(states)
        s2, _, nd = draw_chunk(s)
        jax.block_until_ready(s2.q)
        wall = time.perf_counter() - t0
        tps = chains * (TUNE + DRAWS) / wall
        results[str(chains)] = {
            "chains": chains,
            "device_seconds": round(wall, 2),
            "transitions_per_sec": round(tps, 1),
            "per_chain_transitions_per_sec": round(tps / chains, 2),
        }
        print(json.dumps(results[str(chains)]))

    base = results[str(CHAIN_COUNTS[0])]["transitions_per_sec"]
    for c in CHAIN_COUNTS:
        r = results[str(c)]
        r["scaling_efficiency_vs_%d" % CHAIN_COUNTS[0]] = round(
            r["transitions_per_sec"] / base / (c / CHAIN_COUNTS[0]), 3)

    out = os.path.join(REPO, "BENCH_SCALING.json")
    with open(out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "ndim": N,
                   "results": results}, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
