"""One-command multi-host pod-slice benchmark / scaling-efficiency report.

The day real multi-chip TPU hardware is available, the >=80%
linear-chain-scaling gate (BASELINE.json) is one command away:

    # on every host of the slice (or via your pod launcher):
    python scripts/pod_bench.py                       # TPU pod slice
    # local rehearsal on one machine (2 processes x 4 virtual CPU devs):
    python scripts/pod_bench.py --local-rehearsal

On a Cloud TPU pod slice ``jax.distributed.initialize()`` auto-discovers
the coordinator and process ids from the TPU environment; elsewhere pass
``--coordinator host:port --num-processes N --process-id i`` explicitly.

Every process runs the same program: one global chain mesh over all
devices, the standard 100-d correlated-Gaussian config (BASELINE
config 2) scaled so each device carries ``--chains-per-device`` chains,
cross-chain pooled adaptation ON (the collectives cross ICI/DCN — that
is the thing being measured). Process 0 writes ``BENCH_POD.json`` with
transitions/s and the scaling efficiency vs the recorded single-device
rate.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)



def run(args):
    import jax

    N = args.ndim
    TUNE = DRAWS = args.iters

    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    elif args.multihost:
        jax.distributed.initialize()  # TPU pod: env auto-discovery

    import numpy as np
    from jax.sharding import Mesh

    import littlemcmc_tpu as lmc
    from littlemcmc_tpu import models

    n_dev = jax.device_count()
    chains = args.chains_per_device * n_dev
    mesh = Mesh(np.array(jax.devices()), ("chains",))
    model = models.CorrelatedGaussian(N)
    kw = dict(
        logp_dlogp_func=model.logp_grad, model_ndim=N, chains=chains,
        tune=TUNE, draws=DRAWS, random_seed=11, progressbar=False,
        mesh=mesh, cross_chain_adapt=True,
    )

    # warm-up/compile
    t0 = time.perf_counter()
    lmc.sample(**{**kw, "tune": 2, "draws": 2})
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    trace, stats = lmc.sample(**kw)
    wall = time.perf_counter() - t0
    tps = chains * (TUNE + DRAWS) / wall

    tr = np.asarray(trace).reshape(-1, N)
    var_ratio = float((tr.var(0) / model.true_var).mean())

    if jax.process_index() == 0:
        out = {
            "config": f"{N}-d correlated Gaussian, pooled diag adapt",
            "devices": n_dev,
            "processes": jax.process_count(),
            "chains": chains,
            "tune": TUNE,
            "draws": DRAWS,
            "wall_seconds": round(wall, 3),
            "compile_seconds": round(compile_s, 3),
            "transitions_per_sec": round(tps, 1),
            "transitions_per_sec_per_device": round(tps / n_dev, 1),
            "var_ratio_mean": round(var_ratio, 4),
            "backend": jax.default_backend(),
        }
        if args.single_device_tps:
            out["scaling_efficiency_vs_1dev"] = round(
                tps / (args.single_device_tps * n_dev), 4)
        path = os.path.join(REPO, args.out)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))


_REHEARSAL = r"""
import os, sys
pid = int(os.environ["POD_BENCH_PID"])
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
sys.argv = ["pod_bench.py", "--coordinator", "127.0.0.1:%PORT%",
            "--num-processes", "2", "--process-id", str(pid),
            "--chains-per-device", "4", "--ndim", "8", "--iters", "100",
            "--out", "BENCH_POD_REHEARSAL.json"]
__file__ = %SELF%
exec(compile(open(__file__).read(), __file__, "exec"))
"""


def local_rehearsal():
    """2 OS processes x 4 virtual CPU devices each, Gloo over localhost."""
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    code = (_REHEARSAL.replace("%PORT%", str(port))
            .replace("%SELF%", repr(os.path.abspath(__file__))))
    env = dict(os.environ)
    procs = []
    for pid in range(2):
        e = dict(env, POD_BENCH_PID=str(pid))
        procs.append(subprocess.Popen([sys.executable, "-c", code], env=e,
                                      cwd=REPO))
    rc = [p.wait(timeout=1200) for p in procs]
    if any(rc):
        raise SystemExit(f"rehearsal failed: exit codes {rc}")
    print("rehearsal OK ->", os.path.join(REPO, "BENCH_POD_REHEARSAL.json"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--multihost", action="store_true",
                    help="jax.distributed auto-init (TPU pod env)")
    ap.add_argument("--chains-per-device", type=int, default=1024)
    ap.add_argument("--ndim", type=int, default=100)
    ap.add_argument("--iters", type=int, default=300,
                    help="tune and draw count (each)")
    ap.add_argument("--single-device-tps", type=float, default=None,
                    help="recorded 1-device transitions/s for the "
                         "efficiency ratio")
    ap.add_argument("--out", default="BENCH_POD.json")
    ap.add_argument("--local-rehearsal", action="store_true")
    args = ap.parse_args()
    if args.local_rehearsal:
        local_rehearsal()
    else:
        run(args)


if __name__ == "__main__":
    main()
