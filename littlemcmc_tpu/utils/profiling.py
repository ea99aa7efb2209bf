"""Profiling hooks: JAX device traces and throughput summaries.

The reference's only observability is a progress bar (SURVEY.md §5);
here a sampling run can be wrapped in a real device profile, viewable in
TensorBoard/XProf/Perfetto.
"""

from __future__ import annotations

import contextlib
from typing import Dict

import jax
import numpy as np

__all__ = ["device_trace", "throughput_report"]


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a JAX profiler trace of everything inside the block.

    View with ``tensorboard --logdir <log_dir>`` or upload the
    ``.trace.json.gz`` to Perfetto.
    """
    with jax.profiler.trace(log_dir):
        yield


def throughput_report(
    trace: np.ndarray,
    stats: Dict[str, np.ndarray],
    wall_seconds: float,
    tune: int = 0,
) -> Dict[str, float]:
    """Transitions/s, leapfrogs/s and ESS/s for a finished run."""
    from .diagnostics import ess_bulk

    chains, draws, ndim = trace.shape
    transitions = chains * (draws + tune)
    leapfrogs = float(np.asarray(stats.get("tree_size", np.ones((1,)))).sum())
    ess = np.array([ess_bulk(trace[:, :, i]) for i in range(ndim)])
    return {
        "wall_seconds": wall_seconds,
        "transitions_per_sec": transitions / wall_seconds,
        "leapfrogs_per_sec_post_tune": leapfrogs / wall_seconds,
        "min_ess_bulk": float(np.nanmin(ess)),
        "ess_per_sec_min_dim": float(np.nanmin(ess) / wall_seconds),
    }
