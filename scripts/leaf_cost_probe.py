"""Isolate the per-leaf fixed overhead of the trajectory kernel.

Forces every chain to build a full depth-10 tree (tiny step size, so no
U-turns and no divergences): every lane executes all 1023 leaves, so
lockstep waste is zero and wall/leaf is the pure per-leaf cost. The gap
to the bare fused leapfrog (~1.8 us at these shapes, nuts.py:28-30) is
the kernel's fixed overhead: merge machinery, stack traffic, early-exit
reductions, scalar bookkeeping.

Run on TPU: python scripts/leaf_cost_probe.py [max_depth] [chain_block]
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHAINS = 1024
NDIM = 100
DRAWS = 8


def main():
    import jax
    import jax.numpy as jnp

    from littlemcmc_tpu import models
    from littlemcmc_tpu.ops.nuts_trajectory_pallas import build_trajectory_op

    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cb = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    model = models.CorrelatedGaussian(NDIM)
    spec = model.pallas_trajectory_spec()
    traj = build_trajectory_op(spec, NDIM, depth, 1e12, "leapfrog",
                               chain_block=cb)

    q = jnp.zeros((CHAINS, NDIM), jnp.float32)
    logp0, grad0 = jax.vmap(model.logp_grad)(q)
    p = jax.random.normal(jax.random.key(0), (CHAINS, NDIM), jnp.float32)
    eps = jnp.full((CHAINS,), 1e-4, jnp.float32)
    mdc = jnp.full((CHAINS,), depth, jnp.float32)
    var = jnp.ones((CHAINS, NDIM), jnp.float32)

    @jax.jit
    def run(q, p, grad0, logp0, seed0):
        def body(c, acc):
            r = traj(q, p, grad0, logp0, eps, mdc, var, seed0 + c)
            return acc + r["n_leaves"].astype(jnp.int32)

        return jax.lax.fori_loop(0, DRAWS, body,
                                 jnp.zeros((CHAINS,), jnp.int32))

    leaves = run(q, p, grad0, logp0, jnp.int32(1))
    jax.block_until_ready(leaves)
    t0 = time.perf_counter()
    leaves = run(q, p, grad0, logp0, jnp.int32(50000))
    jax.block_until_ready(leaves)
    wall = time.perf_counter() - t0

    lv = np.asarray(leaves)
    n_blocks = CHAINS // cb
    full = (2 ** depth - 1)
    # every lane must have executed the full schedule
    per_iter_us = wall / (DRAWS * full * n_blocks) * 1e6
    per_chain_leaf_ns = wall / (DRAWS * full * CHAINS) * 1e9
    print(f"depth={depth} cb={cb}: wall={wall:.3f}s  "
          f"leaves/lane={lv.max()}/{full * DRAWS}  "
          f"us/block-leaf={per_iter_us:.2f}  ns/chain-leaf={per_chain_leaf_ns:.0f}",
          flush=True)


if __name__ == "__main__":
    main()
