"""Fast transcendental approximations for the rollout hot path.

The sampling optimizers' rollouts are VPU/transcendental-bound on TPU (the
rk4 cartpole kernel evaluates sin/cos 8x per horizon step); XLA's exact
sin/cos lower to long polynomial + Payne-Hanek reduction sequences.  These
degree-9/10 least-squares polynomials with a single Cody-Waite-style mod-2pi
reduction are ~3-5x cheaper and accurate to ~1e-5 in float32 over |x| <= 50
— far below the process/actuation noise floor of sampling-based MPC
(typical perturbation stdev ~0.2).

Opt-in: predictors select them via ``fast_math`` (models/dynamics.py
``.fast`` variants); measured on TPU v5e they cut the fully-loaded MPPI
step at K=1M from 9.7 ms to 6.2 ms.  Everything is plain jnp, so the same
code lowers in XLA, Pallas/Mosaic kernels, and interpret mode.
"""
from __future__ import annotations

import jax.numpy as jnp

_TWO_PI = 6.283185307179586
_INV_TWO_PI = 1.0 / _TWO_PI

# Least-squares fits on Chebyshev nodes over [-pi, pi] (see commit message /
# tests for the fit): max f64 error 5.9e-6 (sin), 7.9e-7 (cos); f32 with
# range reduction <= ~1.1e-5 over |x| <= 50.
_SIN_C = (
    0.9999791148945326,
    -0.16662401538302676,
    0.008308849931229436,
    -0.00019263169952705723,
    2.14704961562231e-06,
)
_COS_C = (
    0.9999992107409235,
    -0.49999421315021114,
    0.04165977758578502,
    -0.0013858789204321562,
    2.420293205122177e-05,
    -2.1972921877546382e-07,
)


def _reduce(x):
    return x - _TWO_PI * jnp.round(x * _INV_TWO_PI)


def fast_sincos(x):
    """(sin x, cos x) sharing one range reduction — the cheap path when a
    model needs both (every planar mechanism does)."""
    r = _reduce(x)
    r2 = r * r
    s = r * (_SIN_C[0] + r2 * (_SIN_C[1] + r2 * (_SIN_C[2] + r2 * (
        _SIN_C[3] + r2 * _SIN_C[4]))))
    c = _COS_C[0] + r2 * (_COS_C[1] + r2 * (_COS_C[2] + r2 * (
        _COS_C[3] + r2 * (_COS_C[4] + r2 * _COS_C[5]))))
    return s, c


def fast_sin(x):
    r = _reduce(x)
    r2 = r * r
    return r * (_SIN_C[0] + r2 * (_SIN_C[1] + r2 * (_SIN_C[2] + r2 * (
        _SIN_C[3] + r2 * _SIN_C[4]))))


def fast_cos(x):
    r = _reduce(x)
    r2 = r * r
    return _COS_C[0] + r2 * (_COS_C[1] + r2 * (_COS_C[2] + r2 * (
        _COS_C[3] + r2 * (_COS_C[4] + r2 * _COS_C[5]))))
