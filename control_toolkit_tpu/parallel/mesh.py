"""Device-mesh helpers for rollout sharding.

The framework's on-device parallel axis is the rollout population K (SURVEY
§2: the only data-parallel dimension; H is sequential).  A 1-D mesh over
axis ``"k"`` shards every per-rollout state leaf ``[K, ...]`` across chips;
XLA inserts the ICI collectives for the cross-K reductions (MPPI softmax
sums, top-k elite selection, CEM refits).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROLLOUT_AXIS = "k"


def make_rollout_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or given) devices, axis name 'k'."""
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), (ROLLOUT_AXIS,))


def rollout_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """NamedSharding placing axis 0 (K) on the mesh, rest replicated."""
    return NamedSharding(mesh, P(ROLLOUT_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
