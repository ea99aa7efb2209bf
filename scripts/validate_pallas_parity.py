"""Statistical-parity harness: Pallas trajectory kernel vs the XLA tree.

Runs both NUTS implementations at a *fixed* step size and metric from
exact posterior samples of the 100-d correlated Gaussian (so there is no
adaptation feedback), and compares the per-transition statistics. The
two paths share all arithmetic except the tree-building execution engine
and the RNG stream, so with 4096 chains x 20 draws any real semantic
difference shows up as a multi-sigma gap in mean_tree_accept / depth /
tree_size (this harness caught an on-core-PRNG sign bug that standard
posterior-moment tests missed).

Run on TPU: python scripts/validate_pallas_parity.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from littlemcmc_tpu.models import CorrelatedGaussian
    from littlemcmc_tpu.model import as_logp_grad
    from littlemcmc_tpu.nuts import build_nuts_kernel, NUTSConfig
    from littlemcmc_tpu.base import init_chain_state
    from littlemcmc_tpu.quadpotential import QuadPotentialDiag

    C, N, DRAWS = 4096, 100, 20
    model = CorrelatedGaussian(N)
    lg = as_logp_grad(model.logp_grad)
    cfg = NUTSConfig(adapt_step_size=False, step_scale=0.2 * (N ** 0.25))

    rng = np.random.RandomState(3)
    L = np.linalg.cholesky(model.cov)
    q0 = (rng.randn(C, N) @ L.T).astype(np.float32)
    pot = QuadPotentialDiag.create(jnp.asarray(model.true_var, jnp.float32))
    ks = jax.random.split(jax.random.key(5), C)
    states = jax.vmap(lambda k, q: init_chain_state(k, q, pot, cfg, lg))(
        ks, jnp.asarray(q0))

    results = {}
    for name, spec in (("xla", None), ("pallas", model.pallas_trajectory_spec())):
        kernel = build_nuts_kernel(lg, cfg, None, spec)

        @jax.jit
        def run(states, kernel=kernel):
            def body(s, _):
                s2, info = kernel(s, jnp.asarray(False))
                return s2, (info.mean_tree_accept, info.depth, info.tree_size)
            return lax.scan(body, states, None, length=DRAWS)

        _, (mta, dep, tsz) = run(states)
        mta, dep, tsz = map(np.asarray, (mta, dep, tsz))
        se = mta.std() / np.sqrt(mta.size)
        results[name] = (mta.mean(), se, dep.mean(), tsz.mean())
        print(f"{name:7s}: accept={mta.mean():.4f}±{se:.4f} "
              f"depth={dep.mean():.3f} tree_size={tsz.mean():.2f}")

    gap = abs(results["xla"][0] - results["pallas"][0])
    tol = 5 * (results["xla"][1] + results["pallas"][1])
    ok = gap < tol and abs(results["xla"][2] - results["pallas"][2]) < 0.1
    print(f"accept gap {gap:.4f} (tolerance {tol:.4f}) -> "
          f"{'PARITY OK' if ok else 'PARITY FAILED'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
