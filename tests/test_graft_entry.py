"""Driver entry-point tests: entry() compiles and dryrun_multichip runs.

The dryrun tests each run in their own subprocess: the multichip
training-step compile is the largest XLA CPU compilation in the suite,
and running it in-process after ~200 accumulated test compilations
segfaulted the XLA CPU compiler deterministically (at the same suite
position in three round-5 full-suite runs, while the identical test
passes in isolation). Subprocess isolation gives the compile a fresh
process and keeps the failure mode debuggable.
"""

import os
import subprocess
import sys

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    q, e = jax.jit(fn)(*args)
    assert q.shape == (256, 100)
    assert np.isfinite(np.asarray(e)).all()


_DRYRUN_WORKER = r"""
import os
os.environ.pop("JAX_PLATFORMS", None)
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {repo!r})
import __graft_entry__ as g
g.dryrun_multichip({n})
print("DRYRUN_OK")
"""


def _run_dryrun(n):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _DRYRUN_WORKER.format(repo=REPO, n=n)],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "DRYRUN_OK" in proc.stdout


def test_dryrun_multichip_8():
    _run_dryrun(8)


def test_dryrun_multichip_2():
    _run_dryrun(2)
