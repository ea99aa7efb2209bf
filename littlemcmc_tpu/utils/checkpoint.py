"""Checkpoint/resume for the full sampler state via Orbax.

The reference has no checkpointing (sampling is one-shot into a
preallocated ndarray, ``sampling.py:284,500``). Here the entire sampler
state — positions, cached model evals, Welford buffers, dual-averaging
state, PRNG keys, iteration counters — is one pytree (``ChainState``), so
snapshot/restore is a single Orbax call and a killed run can resume
mid-tuning with bit-identical continuation.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_checkpoint"]

_META_NAME = "littlemcmc_tpu_meta.json"


def _ckpt_path(directory: str, step: int) -> str:
    return os.path.join(os.path.abspath(directory), f"step_{step:08d}")


def save_checkpoint(directory: str, states, step: int, meta: Optional[Dict[str, Any]] = None) -> str:
    """Snapshot a chain-state pytree (and JSON metadata) at ``step``."""
    import orbax.checkpoint as ocp

    path = _ckpt_path(directory, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(states), force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, _META_NAME), "w") as f:
        json.dump({"step": step, **(meta or {})}, f)
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    """Most recent ``step_*`` checkpoint path in ``directory``, or None."""
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    steps = sorted(
        d for d in os.listdir(directory)
        if d.startswith("step_") and os.path.isdir(os.path.join(directory, d))
    )
    return os.path.join(directory, steps[-1]) if steps else None


def restore_checkpoint(path: str, template):
    """Restore a chain-state pytree saved by :func:`save_checkpoint`.

    ``template`` is a matching pytree (e.g. a freshly-initialized state)
    giving structure/shape/dtype. Returns ``(states, meta)``.
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()

    def _abstract(x):
        # Preserve the template's sharding (a mesh-sharded run must come
        # back sharded, not gathered onto the default device).
        sharding = getattr(x, "sharding", None)
        return jax.ShapeDtypeStruct(np.shape(x), x.dtype, sharding=sharding)

    abstract = jax.tree.map(_abstract, template)
    states = ckptr.restore(path, abstract)
    meta_file = os.path.join(path, _META_NAME)
    meta = {}
    if os.path.exists(meta_file):
        with open(meta_file) as f:
            meta = json.load(f)
    return states, meta
