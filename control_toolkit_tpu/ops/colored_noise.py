"""Power-law (colored) Gaussian noise on device.

``powerlaw_psd_gaussian`` draws zero-mean, unit-variance Gaussian noise
whose power spectral density follows ``(1/f)^beta`` over the LAST axis —
the sampling distribution of the iCEM planner (Pinneri et al., "Sample-
efficient Cross-Entropy Method for Real-time Planning", CoRL 2020).
``beta=0`` is white noise; ``beta=2`` is Brownian-like, strongly
time-correlated action sequences that explore low-frequency controls —
exactly what underactuated swing-up tasks need.

Algorithm: Timmer & Koenig 1995 frequency-domain synthesis (the same
construction as the public ``colorednoise`` package, re-derived here for
JAX): scale independent Gaussian spectral coefficients by ``f^(-beta/2)``,
fix the DC/Nyquist bins to keep the time-domain signal real with the
correct magnitude, inverse rFFT, and divide by the analytic output sigma
so the result has unit variance for every ``beta``.

TPU note: the horizon FFT is tiny (H <= 1024) and runs in XLA; the whole
draw stays inside the optimizer's jitted step, fused with the population
clip.  No reference-toolkit counterpart (the reference samples white noise
only, e.g. /root/reference/Optimizers/optimizer_cem_tf.py:66-70).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def powerlaw_psd_gaussian(
    key: jax.Array, exponent, n: int, shape: tuple = ()
) -> jax.Array:
    """Gaussian ``(1/f)^exponent`` noise of length ``n`` on the last axis.

    Args:
      key: PRNG key.
      exponent: spectral exponent beta (0 = white, 1 = pink, 2 = red).
        May be a traced scalar — frequencies are static, so a dynamic beta
        costs one elementwise power, no recompile.
      n: number of time samples (static).
      shape: leading batch shape.

    Returns:
      ``[*shape, n]`` float32 array, zero-mean unit-variance per element
      in expectation, correlated along the last axis.
    """
    n = int(n)
    if n < 2:
        # Degenerate horizon: spectrum shaping is meaningless; plain white.
        return jax.random.normal(key, (*shape, n), jnp.float32)

    f = jnp.fft.rfftfreq(n).astype(jnp.float32)          # [F], f[0]=0
    fmin = 1.0 / n
    # Clamp the DC bin to the lowest resolvable frequency so beta>0 does
    # not blow up at f=0 (colorednoise's s_scale[:ix] = s_scale[ix]).
    s_scale = jnp.where(f < fmin, fmin, f) ** (-jnp.asarray(exponent) / 2.0)

    # Analytic std of the synthesized signal, EXACT per ensemble element:
    # each paired bin contributes 4*s_k^2 to n^2*Var (conjugate-symmetric
    # pair), the real-only DC and (even-n) Nyquist bins contribute 2*s^2
    # after their sqrt(2) magnitude fix below.  The public `colorednoise`
    # package drops the DC term from its sigma, which leaves beta=2 noise
    # ~14% over unit variance; we keep DC random (constant-offset
    # exploration is exactly what swing-up wants) and normalize exactly.
    coef = jnp.full((f.shape[0],), 4.0, jnp.float32)
    coef = coef.at[0].set(2.0)
    if n % 2 == 0:
        coef = coef.at[-1].set(2.0)
    sigma = jnp.sqrt(jnp.sum(coef * s_scale**2)) / n

    kr, ki = jax.random.split(key)
    F = f.shape[0]
    sr = jax.random.normal(kr, (*shape, F), jnp.float32) * s_scale
    si = jax.random.normal(ki, (*shape, F), jnp.float32) * s_scale
    # Real signal constraints: DC bin is real (and double-weighted since it
    # has no conjugate partner); same for the Nyquist bin when n is even.
    si = si.at[..., 0].set(0.0)
    sr = sr.at[..., 0].multiply(jnp.sqrt(2.0))
    if n % 2 == 0:
        si = si.at[..., -1].set(0.0)
        sr = sr.at[..., -1].multiply(jnp.sqrt(2.0))

    y = jnp.fft.irfft(sr + 1j * si, n=n, axis=-1).astype(jnp.float32)
    return y / sigma
