"""Measure whether depth-correlated chain re-blocking can cut lockstep waste.

The flagship roofline (BENCH_r04) shows lockstep efficiency 0.193: ~80%
of executed leapfrogs in the per-draw trajectory kernel integrate chains
whose own tree already finished, because every chain block waits for the
block's deepest tree. If per-chain tree size is *predictable* (driven by
the frozen post-tune step size), sorting chains into blocks by predicted
depth makes shallow blocks finish early — pure win, since per-leaf cost
is flat in live-lane count (NOTES.md round-3 measurement).

This script runs the flagship config once, collects the (draws, chains)
tree-size matrix + per-chain step sizes, and *simulates* executed-leapfrog
totals for block sizes x ordering policies:

- identity (today's layout)
- sorted once by adapted step size (zero per-draw cost)
- re-sorted every chunk by the previous chunk's mean tree size
- oracle: per-draw perfect sort (upper bound)

Writes DEPTH_REBLOCK_STUDY.json. Run on the TPU: python scripts/depth_reblock_study.py
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


def executed(ts, order, cb):
    """Total executed leapfrogs with chains laid out in ``order``,
    block size ``cb``: per draw, each block runs to its own max."""
    t = ts[:, order]                      # (draws, chains)
    b = t.reshape(t.shape[0], -1, cb)     # (draws, blocks, cb)
    return float(b.max(axis=2).sum() * cb)


def main():
    import jax
    import jax.numpy as jnp

    import littlemcmc_tpu as lmc
    from littlemcmc_tpu import models
    from littlemcmc_tpu.model import as_logp_grad
    from littlemcmc_tpu.sampling import _make_chunk_runner, _make_init_fn

    model = models.CorrelatedGaussian(NDIM)
    logp_grad = as_logp_grad(model.logp_grad)
    step = lmc.NUTS(model_ndim=NDIM,
                    pallas_trajectory=model.pallas_trajectory_spec())

    key = jax.random.key(42)
    k_init, k_chains = jax.random.split(key)
    starts = 2.0 * jax.random.uniform(k_init, (CHAINS, NDIM), jnp.float32) - 1.0
    chain_keys = jax.random.split(k_chains, CHAINS)
    init_fn = _make_init_fn(step.config, logp_grad, NDIM, False, jnp.float32,
                            False)
    s = init_fn(chain_keys, starts)

    kernel = step.build_kernel(logp_grad)
    tune_chunk = _make_chunk_runner(kernel, CHUNK, True, False, False)
    draw_chunk = _make_chunk_runner(kernel, CHUNK, False, True, False)

    t0 = time.time()
    for _ in range(TUNE // CHUNK):
        s, _, _ = tune_chunk(s)
    outs = []
    for _ in range(DRAWS // CHUNK):
        s, out, _ = draw_chunk(s)
        outs.append(out)
    jax.block_until_ready(s)
    print(f"sampled in {time.time() - t0:.1f}s", flush=True)

    ts = np.concatenate([np.asarray(jax.device_get(o[1].tree_size))
                         for o in outs], axis=0).astype(np.float64)
    # frozen post-tune step size per chain
    eps = np.exp(np.asarray(jax.device_get(s.da.log_bar)).reshape(-1))

    draws, chains = ts.shape
    eff_total = float(ts.sum())
    ident = np.arange(chains)

    per_chain_mean = ts.mean(axis=0)
    r_eps = float(np.corrcoef(np.log(eps), per_chain_mean)[0, 1])
    # chunk-to-chunk predictability of per-chain mean depth
    m1 = ts[:CHUNK].mean(axis=0)
    m2 = ts[CHUNK:2 * CHUNK].mean(axis=0)
    r_chunk = float(np.corrcoef(m1, m2)[0, 1])

    results = {
        "tree_size_mean": float(ts.mean()),
        "tree_size_p50_p90_p99_max": [float(np.percentile(ts, p))
                                      for p in (50, 90, 99)] + [float(ts.max())],
        "per_chain_mean_spread": [float(per_chain_mean.min()),
                                  float(per_chain_mean.max())],
        "corr_logeps_vs_mean_tree": r_eps,
        "corr_chunk1_vs_chunk2_mean_tree": r_chunk,
        "policies": {},
    }

    for cb in (64, 128, 256, 512):
        pol = {}
        pol["identity"] = eff_total / executed(ts, ident, cb)
        o_eps = np.argsort(-eps)  # small eps = deep trees; grouping is
        # what matters, direction is cosmetic
        pol["sort_by_eps_once"] = eff_total / executed(ts, o_eps, cb)
        # re-sort at every chunk boundary by prev-chunk mean tree size
        tot = executed(ts[:CHUNK], o_eps, cb)  # first chunk: eps order
        for c0 in range(CHUNK, draws, CHUNK):
            prev = ts[c0 - CHUNK:c0].mean(axis=0)
            o = np.argsort(-prev)
            tot += executed(ts[c0:c0 + CHUNK], o, cb)
        pol["resort_each_chunk"] = eff_total / tot
        # oracle: per-draw perfect sort
        srt = np.sort(ts, axis=1)
        b = srt.reshape(draws, -1, cb)
        pol["oracle_per_draw"] = eff_total / float(b.max(axis=2).sum() * cb)
        results["policies"][f"cb={cb}"] = {k: round(v, 3)
                                           for k, v in pol.items()}
        print(f"cb={cb}: " + "  ".join(f"{k}={v:.3f}"
                                       for k, v in pol.items()), flush=True)

    out_path = os.path.join(REPO, "DEPTH_REBLOCK_STUDY.json")
    with open(out_path, "w") as f:
        json.dump({"backend": jax.default_backend(), "chains": CHAINS,
                   "tune": TUNE, "draws": DRAWS, "chunk": CHUNK,
                   "results": results}, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
