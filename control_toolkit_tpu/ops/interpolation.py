"""Inducing-point control-sequence interpolation.

Capability parity with the reference Interpolator
(/root/reference/others/Interpolator.py:7-106): control sequences are sampled
at inducing points spaced ``period`` steps apart and linearly upsampled to the
full MPC horizon.  TPU-native redesign: the interpolation is a single
precomputed ``[P, H]`` matrix applied with one einsum — a clean MXU matmul
batched over rollouts and control channels, with no per-channel matrix copy
(the reference materializes a [P,H,U] tensor and permutes twice).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np


def num_inducing_points(horizon: int, period: int) -> int:
    """Number of inducing points covering a horizon.

    Same formula as the reference (Interpolator.py:79-84):
    ``ceil((H-1)/p) + 1`` so the first point sits at step 0 and points are
    spaced ``p`` steps apart, covering at least the full horizon.
    """
    return int(math.ceil((horizon - 1) / period)) + 1


def interpolation_matrix(horizon: int, period: int) -> np.ndarray:
    """Build the ``[P, H]`` linear-interpolation matrix.

    Row p holds the weight of inducing point p for every horizon step h:
    step h lies between inducing points ``h // period`` and ``h // period + 1``
    with fractional position ``(h % period) / period``.
    """
    p_count = num_inducing_points(horizon, period)
    mat = np.zeros((p_count, horizon), dtype=np.float32)
    for h in range(horizon):
        left = h // period
        frac = (h % period) / period
        if left + 1 < p_count:
            mat[left, h] = 1.0 - frac
            mat[left + 1, h] = frac
        else:
            mat[left, h] = 1.0
    return mat


@dataclass(frozen=True)
class Interpolator:
    """Precomputed inducing-point upsampler.

    ``interpolate`` maps ``[K, P, U] -> [K, H, U]``.  With ``period == 1``
    it is the identity (reference Interpolator.py:31-33).
    """

    horizon: int
    period: int
    matrix: jnp.ndarray = field(repr=False)  # [P, H]

    @classmethod
    def build(cls, horizon: int, period: int) -> "Interpolator":
        if period < 1:
            raise ValueError("period_interpolation_inducing_points must be >= 1")
        mat = jnp.asarray(interpolation_matrix(horizon, period))
        return cls(horizon=horizon, period=period, matrix=mat)

    @property
    def number_of_interpolation_inducing_points(self) -> int:
        return self.matrix.shape[0]

    def interpolate(self, y: jnp.ndarray) -> jnp.ndarray:
        """Upsample inducing-point controls to the full horizon.

        y: [..., P, U] -> [..., H, U].  One contraction over P — XLA maps it
        onto the MXU; for period==1 this is skipped entirely.
        """
        if self.period == 1:
            return y
        return jnp.einsum("...pu,ph->...hu", y, self.matrix)


if __name__ == "__main__":
    # Micro-benchmark, parity with the reference Interpolator __main__
    # (/root/reference/others/Interpolator.py:109-142).
    import argparse
    import time

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--horizon", type=int, default=43)
    ap.add_argument("--period", type=int, default=10)
    ap.add_argument("--batch", type=int, default=2000)
    ap.add_argument("--inputs", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10000)
    args = ap.parse_args()

    interp = Interpolator.build(args.horizon, args.period)
    P = interp.number_of_interpolation_inducing_points
    y = jnp.asarray(
        np.random.default_rng(0).normal(size=(args.batch, P, args.inputs)),
        dtype=jnp.float32,
    )
    f = jax.jit(interp.interpolate)
    jax.block_until_ready(f(y))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = f(y)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(
        f"interpolate[{args.batch},{P},{args.inputs}]->[{args.batch},"
        f"{args.horizon},{args.inputs}] x{args.iters}: {dt:.3f}s total, "
        f"{dt/args.iters*1e6:.2f} us/call ({jax.default_backend()})"
    )
