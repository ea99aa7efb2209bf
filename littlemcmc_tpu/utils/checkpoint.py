"""Checkpoint/resume for the full sampler state via Orbax.

The reference has no checkpointing (sampling is one-shot into a
preallocated ndarray, ``sampling.py:284,500``). Here the entire sampler
state — positions, cached model evals, Welford buffers, dual-averaging
state, PRNG keys, iteration counters — is one pytree (``ChainState``), so
snapshot/restore is a single Orbax call and a killed run can resume
mid-tuning with bit-identical continuation.

Multi-process (multi-host) runs are supported: every process calls
:func:`save_checkpoint` with the globally-sharded state (the sampler's
host loop runs identically on every process), Orbax writes each
process's addressable shards, and process 0 writes the metadata.
``directory`` must be on a filesystem shared by all processes.

Typed PRNG keys are stored as their raw key data (Orbax cannot serialize
extended dtypes); :func:`restore_checkpoint` rewraps them.
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


def _is_key(x) -> bool:
    try:
        return jax.numpy.issubdtype(x.dtype, jax.dtypes.prng_key)
    except Exception:
        return False


def _unkey(tree):
    """Typed PRNG key leaves -> raw uint32 key data (serializable)."""
    return jax.tree.map(
        lambda x: jax.random.key_data(x) if _is_key(x) else x, tree
    )


def _rekey(tree, template):
    """Rewrap raw key data wherever the template holds a typed key."""
    return jax.tree.map(
        lambda t, x: jax.random.wrap_key_data(x) if _is_key(t) else x,
        template, tree,
    )


def save_checkpoint(directory: str, states, step: int, meta: Optional[Dict[str, Any]] = None) -> str:
    """Snapshot a chain-state pytree (and JSON metadata) at ``step``."""
    import orbax.checkpoint as ocp

    path = _ckpt_path(directory, step)
    ckptr = ocp.StandardCheckpointer()
    payload = _unkey(states)
    if jax.process_count() == 1:
        # single host: detach from the device so the snapshot cannot
        # alias live buffers
        payload = jax.device_get(payload)
    # multi-host: pass the globally-sharded arrays straight through —
    # Orbax writes each process's addressable shards (all processes must
    # call save; `directory` must be on a shared filesystem)
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
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
    giving structure/shape/dtype/sharding. Returns ``(states, meta)``.
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    data_template = _unkey(template)

    def _abstract(x):
        # Preserve the template's sharding (a mesh-sharded run must come
        # back sharded, not gathered onto the default device).
        sharding = getattr(x, "sharding", None)
        return jax.ShapeDtypeStruct(np.shape(x), x.dtype, sharding=sharding)

    abstract = jax.tree.map(_abstract, data_template)
    states = _rekey(ckptr.restore(path, abstract), template)
    meta_file = os.path.join(path, _META_NAME)
    meta = {}
    if os.path.exists(meta_file):
        with open(meta_file) as f:
            meta = json.load(f)
    return states, meta
