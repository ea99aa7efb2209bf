"""Device-mesh helpers for chain-parallel sampling."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["chain_mesh", "shard_chains"]


def chain_mesh(n_devices: Optional[int] = None, axis: str = "chains") -> Mesh:
    """A 1-D mesh over (the first ``n_devices``) local devices.

    MCMC chains are embarrassingly parallel, so a single ``chains`` axis is
    the right mesh for every scale: 1 chip (size-1 mesh), one host's chips,
    or a multi-host pod slice (see :func:`global_chain_mesh`).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_chains(tree, mesh: Mesh, axis: str = "chains"):
    """Place a chain-batched pytree with its leading axis sharded over ``axis``."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
