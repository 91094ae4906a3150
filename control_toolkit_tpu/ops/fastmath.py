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

import jax
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


_LN2 = 0.6931471805599453
# Least-squares fit of log2(1+t) on [0,1) (Chebyshev nodes, degree 6):
# max abs error 2.1e-6 in log2 => 1.5e-6 in ln — exact in the exponent, so
# the ABSOLUTE error holds for all positive finite f32 inputs.
_LOG2_C = (
    2.1237408918309273e-06,
    1.4424753148220764,
    -0.7175578724221764,
    0.45552708806115005,
    -0.2746232576172888,
    0.11929823770627786,
    -0.02512320328611391,
)


def fast_log(x):
    """Natural log via exponent extraction + mantissa polynomial.

    ``ln x = ln2 * (e + log2(m))`` with ``x = m * 2^e``, ``m in [1,2)``
    pulled out with integer bit ops (no transcendental lowering).  Finite
    positive normal f32 only — exactly the Box-Muller use case
    (``u in (2^-25, 1]``); denormals/zero/negative are not handled.
    """
    bits = jax.lax.bitcast_convert_type(
        jnp.asarray(x, jnp.float32), jnp.int32
    )
    e = jax.lax.shift_right_logical(bits, jnp.int32(23)) - jnp.int32(127)
    m_bits = (bits & jnp.int32(0x7FFFFF)) | jnp.int32(0x3F800000)
    m = jax.lax.bitcast_convert_type(m_bits, jnp.float32)
    t = m - 1.0
    p = _LOG2_C[0] + t * (_LOG2_C[1] + t * (_LOG2_C[2] + t * (
        _LOG2_C[3] + t * (_LOG2_C[4] + t * (_LOG2_C[5] + t * _LOG2_C[6])))))
    return _LN2 * (e.astype(jnp.float32) + p)
