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


DCN_AXIS = "slice"


def make_multislice_mesh(
    n_slices: int, devices: Optional[Sequence] = None
) -> Mesh:
    """2-D mesh ('slice', 'k') for multi-slice deployments.

    The rollout population shards over BOTH axes (PartitionSpec composite
    axis): the cross-K reductions then lower to a two-stage psum — fast
    all-reduce over ICI inside each slice, then a small scalar combine over
    DCN between slices.  On a single host this is exercised with virtual
    devices; on real pods, pass the actual device list in slice-major order.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if len(devs) % n_slices != 0:
        raise ValueError(f"{len(devs)} devices not divisible into {n_slices} slices")
    per_slice = len(devs) // n_slices
    arr = np.array(devs).reshape(n_slices, per_slice)
    return Mesh(arr, (DCN_AXIS, ROLLOUT_AXIS))


def population_spec(mesh: Mesh, ndim: int) -> P:
    """PartitionSpec sharding axis 0 (K) over every mesh axis."""
    axes = tuple(mesh.axis_names)
    first = axes if len(axes) > 1 else axes[0]
    return P(first, *([None] * (ndim - 1)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
