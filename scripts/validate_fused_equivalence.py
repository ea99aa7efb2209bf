"""Statistical equivalence of the fused multi-draw engines vs per-draw.

The fused engines draw momentum/path-lengths from the on-core PRNG and
adapt on core, so they are different *streams* than the per-draw
engines — equivalence is statistical, not bitwise. This runs both
engines through the public ``sample(fuse_draws=...)`` knob on the same
configs and prints a markdown table of exact-moment z-scores (against
MC standard errors from bulk ESS) plus the adaptation endpoints, for
VALIDATION.md config 6.

Runs anywhere (CPU interpret mode included): pass ``--interpret`` off
TPU. ~10 min on CPU.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

INTERPRET = "--interpret" in sys.argv

if INTERPRET:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp  # noqa: E402

import littlemcmc_tpu as lmc  # noqa: E402
from littlemcmc_tpu import models  # noqa: E402
from littlemcmc_tpu.utils.diagnostics import ess_bulk  # noqa: E402


def run(model, fuse, seed, chains, tune, draws, **extra):
    step = lmc.NUTS(model_ndim=model.ndim,
                    pallas_trajectory=model.pallas_trajectory_spec(),
                    pallas_interpret=INTERPRET)
    t0 = time.perf_counter()
    tr, st = lmc.sample(
        logp_dlogp_func=model.logp_grad, model_ndim=model.ndim,
        chains=chains, tune=tune, draws=draws, random_seed=seed,
        step=step, progressbar=False, fuse_draws=fuse,
        progress_every=max(50, draws // 4), **extra)
    wall = time.perf_counter() - t0
    tr = np.asarray(tr)
    flat = tr.reshape(-1, model.ndim)
    ess = np.array([ess_bulk(tr[:, :, i]) for i in range(model.ndim)])
    return dict(
        mean=flat.mean(0), var=flat.var(0), ess=ess, wall=wall,
        accept=float(np.asarray(st["mean_tree_accept"]).mean()),
        depth=float(np.asarray(st["depth"]).mean()),
        step=float(np.asarray(st["step_size"])[:, -1].mean()),
        div=float(np.asarray(st["diverging"]).mean()),
    )


def zrow(r, true_mean, true_var):
    # MC standard errors from ESS: se(mean) = sd/sqrt(ess);
    # se(var) ~ var * sqrt(2/ess)
    zm = np.abs(r["mean"] - true_mean) / np.sqrt(r["var"] / r["ess"])
    zv = np.abs(r["var"] - true_var) / (true_var * np.sqrt(2.0 / r["ess"]))
    return zm.max(), zv.max()


def main():
    chains, tune, draws = (64, 300, 1500) if INTERPRET else (512, 500, 2000)

    print("### engine equivalence: 4-d standard normal, diag adaptation\n")
    m1 = models.StandardNormal(4)
    rows = []
    for fuse, label in ((False, "per-draw"), (None, "fused")):
        r = run(m1, fuse, seed=31, chains=chains, tune=tune, draws=draws)
        zm, zv = zrow(r, 0.0, 1.0)
        rows.append((label, r, zm, zv))
    print("| engine | max z(mean) | max z(var) | accept | depth | "
          "final step | min ESS |")
    print("|---|---|---|---|---|---|---|")
    for label, r, zm, zv in rows:
        print(f"| {label} | {zm:.2f} | {zv:.2f} | {r['accept']:.3f} | "
              f"{r['depth']:.2f} | {r['step']:.3f} | {r['ess'].min():.0f} |")

    print("\n### engine equivalence: 5-d correlated Gaussian, pooled "
          "adapt_full (every phase fused)\n")
    m2 = models.CorrelatedGaussian(5, rho=0.8, scale_range=(0.5, 2.0))
    rows = []
    for fuse, label in ((False, "per-draw"), (None, "fused")):
        r = run(m2, fuse, seed=37, chains=chains, tune=tune, draws=draws,
                init="jitter+adapt_full", cross_chain_adapt=True)
        zm, zv = zrow(r, 0.0, m2.true_var)
        rows.append((label, r, zm, zv))
    print("| engine | max z(mean) | max z(var) | accept | depth | "
          "final step | min ESS |")
    print("|---|---|---|---|---|---|---|")
    for label, r, zm, zv in rows:
        print(f"| {label} | {zm:.2f} | {zv:.2f} | {r['accept']:.3f} | "
              f"{r['depth']:.2f} | {r['step']:.3f} | {r['ess'].min():.0f} |")

    print("\n### engine equivalence: 16-d spiked Gaussian, pooled "
          "adapt_lowrank (every phase fused)\n")
    m3 = models.SpikedGaussian(16, rank=2, spikes=(64.0, 16.0))
    rows = []
    for fuse, label in ((False, "per-draw"), (None, "fused")):
        r = run(m3, fuse, seed=41, chains=chains, tune=tune, draws=draws,
                init="jitter+adapt_lowrank", cross_chain_adapt=True)
        zm, zv = zrow(r, 0.0, m3.true_var)
        rows.append((label, r, zm, zv))
    print("| engine | max z(mean) | max z(var) | accept | depth | "
          "final step | min ESS |")
    print("|---|---|---|---|---|---|---|")
    for label, r, zm, zv in rows:
        print(f"| {label} | {zm:.2f} | {zv:.2f} | {r['accept']:.3f} | "
              f"{r['depth']:.2f} | {r['step']:.3f} | {r['ess'].min():.0f} |")


if __name__ == "__main__":
    main()
