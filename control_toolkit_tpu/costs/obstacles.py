"""Shared circular-obstacle penalty for planar navigation costs.

Each of ``N_OBSTACLES`` obstacles is three SCALAR attributes
(obs<i>_x, obs<i>_y, obs<i>_r), so positions and radii move at runtime
through the same attrs pipeline as targets — and, because every attribute
is a scalar, a cost using this mixin stays eligible for the fused Pallas
kernels (attrs ride the SMEM parameter vector).

Penalty: smooth hinge ``obstacle_weight * max(0, 1 - d^2/r_margin^2)^2``
per obstacle, where r_margin = r + clearance — zero outside the margin,
quadratic ramp inside, C1-continuous (sampling- and gradient-optimizer
friendly).  Inactive obstacles: r = 0 or parked far away (the defaults).
"""
from __future__ import annotations

import jax.numpy as jnp

N_OBSTACLES = 3

OBSTACLE_ATTR_KEYS = tuple(
    f"obs{i}_{c}" for i in range(N_OBSTACLES) for c in ("x", "y", "r")
)
OBSTACLE_ATTR_DEFAULTS = {}
for _i in range(N_OBSTACLES):
    OBSTACLE_ATTR_DEFAULTS.update(
        {f"obs{_i}_x": 1e6, f"obs{_i}_y": 1e6, f"obs{_i}_r": 0.0}
    )
del _i

OBSTACLE_CONFIG_KEYS = ("obstacle_weight", "clearance")
OBSTACLE_CONFIG_DEFAULTS = {"obstacle_weight": 200.0, "clearance": 0.15}


def obstacle_penalty(x, y, params):
    """Summed smooth-hinge penalty over all obstacles at position (x, y)."""
    w = params["cost"]
    attrs = params["attrs"]
    pen = 0.0
    for i in range(N_OBSTACLES):
        ox = attrs.get(f"obs{i}_x", jnp.float32(1e6))
        oy = attrs.get(f"obs{i}_y", jnp.float32(1e6))
        orr = attrs.get(f"obs{i}_r", jnp.float32(0.0))
        margin = orr + w["clearance"]
        d2 = (x - ox) ** 2 + (y - oy) ** 2
        h = jnp.maximum(0.0, 1.0 - d2 / (margin * margin))
        pen = pen + h * h
    return w["obstacle_weight"] * pen
