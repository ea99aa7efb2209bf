"""A/B the flagship model matvec at 6-pass vs 3-pass MXU precision.

The trajectory kernel's per-leaf cost at RW=512 is ~60% the model's
(512,128)@(128,128) matvec at precision="highest" (6 bf16 passes).
"high" (3 passes) carries ~2^-21 relative error — invisible next to
f32's 2^-24 at MCMC scales — and halves the MXU time. This measures
wall + posterior gates for both through the per-draw engine.

Run on TPU: python scripts/precision_ab.py
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
CHUNK = 250


def main():
    import jax
    import jax.numpy as jnp

    import littlemcmc_tpu as lmc
    from littlemcmc_tpu import models
    from littlemcmc_tpu.model import as_logp_grad
    from littlemcmc_tpu.ops import PallasModelSpec
    from littlemcmc_tpu.ops.nuts_trajectory_pallas import padded_dim
    from littlemcmc_tpu.sampling import _make_chunk_runner, _make_init_fn
    from littlemcmc_tpu.utils.diagnostics import ess_bulk

    model = models.CorrelatedGaussian(NDIM)
    logp_grad = as_logp_grad(model.logp_grad)
    npad = padded_dim(NDIM)
    prec_pad = jnp.zeros((npad, npad), jnp.float32)
    prec_pad = prec_pad.at[:NDIM, :NDIM].set(
        jnp.asarray(model.prec, jnp.float32))

    def make_spec(precision):
        def fn(q, prec):
            g = -jnp.dot(q, prec, precision=precision,
                         preferred_element_type=jnp.float32)
            return 0.5 * jnp.sum(q * g, axis=1, keepdims=True), g

        return PallasModelSpec(fn, (prec_pad,), NDIM)

    for precision in ("highest", "high"):
        spec = make_spec(precision)
        step = lmc.NUTS(model_ndim=NDIM, pallas_trajectory=spec)
        key = jax.random.key(42)
        k1, k2 = jax.random.split(key)
        starts = 2.0 * jax.random.uniform(k1, (CHAINS, NDIM), jnp.float32) - 1.0
        init_fn = _make_init_fn(step.config, logp_grad, NDIM, False,
                                jnp.float32, False)
        s0 = init_fn(jax.random.split(k2, CHAINS), starts)
        kernel = step.build_kernel(logp_grad)
        tc = _make_chunk_runner(kernel, CHUNK, True, False, False)
        dc = _make_chunk_runner(kernel, CHUNK, False, True, False)

        s, _, _ = tc(s0)
        s2, o, _ = dc(s)
        jax.block_until_ready(o)

        t0 = time.perf_counter()
        s = s0
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
        trace = qs.transpose(1, 0, 2)
        div = float(np.concatenate(
            [np.asarray(jax.device_get(o[1].diverging)) for o in outs]).mean())
        ts = np.concatenate(
            [np.asarray(jax.device_get(o[1].tree_size)) for o in outs])
        vr = float((trace.reshape(-1, NDIM).var(axis=0) / model.true_var).mean())
        ess = np.array([ess_bulk(trace[:, :, i]) for i in range(NDIM)])
        print(f"{precision}: wall={wall:.2f}s (tune {tune_s:.2f} draw "
              f"{draw_s:.2f})  min_ess/s={np.nanmin(ess) / wall:,.0f}  "
              f"div={div:.4f}  var_ratio={vr:.4f}  "
              f"mean_tree={ts.mean():.1f}", flush=True)


if __name__ == "__main__":
    main()
