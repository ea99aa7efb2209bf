"""Sweep the trajectory kernel's chain_block on the flagship config.

DEPTH_REBLOCK_STUDY.json showed executed leapfrogs drop 1.44x going
from 512-chain to 64-chain blocks (each block waits only for its own
deepest tree; depth is per-draw random so sorting can't help, but
smaller blocks always do). This measures real wall time per block size
through the per-draw engine, after the merge-path micro-opts.

Run on TPU: python scripts/cb_sweep.py [blocks...]
"""

import json
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
CHUNK = 250


def main():
    import jax
    import jax.numpy as jnp

    import littlemcmc_tpu as lmc
    from littlemcmc_tpu import models
    from littlemcmc_tpu.model import as_logp_grad
    from littlemcmc_tpu.sampling import _make_chunk_runner, _make_init_fn

    blocks = [int(a) for a in sys.argv[1:]] or [512, 256, 128, 64, 32]
    model = models.CorrelatedGaussian(NDIM)
    logp_grad = as_logp_grad(model.logp_grad)

    out = {}
    for cb in blocks:
        step = lmc.NUTS(model_ndim=NDIM,
                        pallas_trajectory=model.pallas_trajectory_spec(),
                        chain_block=cb)
        key = jax.random.key(42)
        k_init, k_chains = jax.random.split(key)
        starts = (2.0 * jax.random.uniform(k_init, (CHAINS, NDIM),
                                           jnp.float32) - 1.0)
        chain_keys = jax.random.split(k_chains, CHAINS)
        init_fn = _make_init_fn(step.config, logp_grad, NDIM, False,
                                jnp.float32, False)
        states0 = init_fn(chain_keys, starts)
        kernel = step.build_kernel(logp_grad)
        tc = _make_chunk_runner(kernel, CHUNK, True, False, False)
        dc = _make_chunk_runner(kernel, CHUNK, False, True, False)

        s, _, _ = tc(states0)
        s2, o, _ = dc(s)
        jax.block_until_ready(o)

        t0 = time.perf_counter()
        s = states0
        for _ in range(TUNE // CHUNK):
            s, _, _ = tc(s)
        jax.block_until_ready(s)
        tune_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = []
        for _ in range(DRAWS // CHUNK):
            s, o, _ = dc(s)
            outs.append(o)
        jax.block_until_ready(s)
        draw_s = time.perf_counter() - t0
        wall = tune_s + draw_s
        qs = np.concatenate([np.asarray(jax.device_get(o[0])) for o in outs])
        div = float(np.concatenate(
            [np.asarray(jax.device_get(o[1].diverging)) for o in outs]).mean())
        vr = float((qs.reshape(-1, NDIM).var(axis=0) / model.true_var).mean())
        out[cb] = {"wall_s": round(wall, 3), "tune_s": round(tune_s, 3),
                   "draw_s": round(draw_s, 3),
                   "transitions_per_sec": round(CHAINS * (TUNE + DRAWS) / wall, 1),
                   "divergence_rate": round(div, 5),
                   "posterior_var_ratio": round(vr, 3)}
        print(f"cb={cb}: {out[cb]}", flush=True)

    with open(os.path.join(REPO, "CB_SWEEP.json"), "w") as f:
        json.dump({"backend": jax.default_backend(), "chains": CHAINS,
                   "results": out}, f, indent=2)
    print("wrote CB_SWEEP.json")


if __name__ == "__main__":
    main()
