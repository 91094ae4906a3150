"""Shared struct-of-arrays ODE steppers for the Pallas kernels.

Every kernel (modular cost rollout, fused/semi-fused MPPI, fused CEM)
integrates the same way: component-tuple state, euler or rk4, optional
substeps.  One factory keeps the three kernels bitwise-consistent.
"""
from __future__ import annotations

from typing import Callable


def tadd(a, b):
    return tuple(x + y for x, y in zip(a, b))


def tscale(a, c):
    return tuple(c * x for x in a)


def make_soa_stepper(
    derivs_soa: Callable,
    integrator: str,
    dt: float,
    intermediate_steps: int = 1,
) -> Callable:
    """Return ``one_step(xs, us, p) -> xs`` advancing the component-tuple
    state by ``dt`` (``intermediate_steps`` sub-steps of euler/rk4)."""
    sub_dt = dt / intermediate_steps

    def euler(xs, us, p):
        new = tadd(xs, tscale(derivs_soa(xs, us, p), sub_dt))
        # Mosaic layout anchor.  Kernels initialise the state components as
        # scalar splats (jnp.full of an SMEM scalar -> REPLICATED vector
        # layout).  Under euler on chain plants (e.g. a double integrator,
        # pos' = pos + dt*vel) a component can stay replicated for the first
        # loop iteration(s) while others go full, so the fori_loop carry
        # layout diverges between iterations and Mosaic dies with "Invalid
        # relayout: Non-singleton logical dimension is replicated in
        # destination but not in source" (round-4 notes).  rk4 never hits
        # this because every output component picks up control dependence
        # (full layout) within one step.  Adding a FULL-layout zero
        # (us[0] carries the per-rollout noise, so it is never replicated)
        # forces every component to the full layout immediately; the MLIR
        # arith dialect does not fold float x*0 without fastmath, and
        # x + 0.0*u is bitwise x (only -0.0 -> +0.0).  Anchoring with
        # 0.0*xs[i] (tried first) does NOT work: that anchor is itself
        # replicated.
        anchor = us[0] * 0.0
        return tuple(x + anchor for x in new)

    def rk4(xs, us, p):
        k1 = derivs_soa(xs, us, p)
        k2 = derivs_soa(tadd(xs, tscale(k1, 0.5 * sub_dt)), us, p)
        k3 = derivs_soa(tadd(xs, tscale(k2, 0.5 * sub_dt)), us, p)
        k4 = derivs_soa(tadd(xs, tscale(k3, sub_dt)), us, p)
        incr = tadd(tadd(k1, tscale(k2, 2.0)), tadd(tscale(k3, 2.0), k4))
        return tadd(xs, tscale(incr, sub_dt / 6.0))

    if integrator == "rk4":
        base = rk4
    elif integrator == "euler":
        base = euler
    else:
        # Validate like the scan path (predictors.INTEGRATORS KeyError):
        # silently mapping an unknown name to euler would break the
        # kernel-vs-scan bitwise contract the moment a new integrator is
        # added there but not here.
        raise ValueError(
            f"unknown SOA integrator {integrator!r} (rk4 | euler)"
        )

    def one_step(xs, us, p):
        for _ in range(intermediate_steps):
            xs = base(xs, us, p)
        return xs

    return one_step
