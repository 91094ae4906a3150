"""Fully-fused CEM sampling+rollout+cost as one Pallas TPU kernel.

CEM's population is sampled fresh each outer iteration from a per-(h,u)
diagonal Gaussian — there is no inducing-point compression to exploit, so
the modular path materializes the [K,H,U] sample tensor in HBM every
iteration.  This kernel generates the samples IN VMEM from a counter-based
PRNG (splitmix32 + Box-Muller, shared with ops/pallas_mppi.py), rolls them
out and writes only the [K] cost vector; the elite refit then needs just
the ``cem_best_k`` elite rows, which XLA REGENERATES exactly from the same
counters (``_normals_from_counter`` is a pure elementwise function of the
counter).  Zero population bytes ever touch HBM.

Like fused MPPI, the counter PRNG is not bit-compatible with jax.random, so
this path is opt-in (CEMOptimizer fully_fused flag) and validated against
an XLA recomputation from the identical counters plus closed loops.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from control_toolkit_tpu.ops.pallas_mppi import (
    DEFAULT_TILE_K,
    ROWS,
    _normals,
    _normals_from_counter,
)
from control_toolkit_tpu.ops.soa_integrators import make_soa_stepper

_FNV = 0x01000193


def build_fused_cem(
    derivs_soa: Callable,
    stage_cost_soa: Callable,      # (xs, us, prev_us, pdict) -> [R, C]
    terminal_cost_soa: Callable,   # (xs, pdict) -> [R, C]
    num_states: int,
    num_controls: int,
    horizon: int,
    param_keys: Sequence[str],
    action_low,
    action_high,
    integrator: str = "rk4",
    intermediate_steps: int = 1,
    tile_k: int = DEFAULT_TILE_K,
    interpret: bool = False,
    fast_sampling: bool = False,
):
    """Build (make_run, regen_controls).

    ``make_run(K) -> run(s0 [S], mue [H,U], std [H,U], pvec [N], seed2 [2])
    -> costs2d [ROWS, K//ROWS]`` — one CEM sampling+scoring pass; cost
    element [r, t*C + c] belongs to rollout (tile t, sublane r, lane c),
    whose per-(h,j) noise counter is
    ``seed*FNV + (off+t)*H*tile_k*U + j*H*tile_k + (h*ROWS + r)*C + c``.

    ``regen_controls(seed2, flat_idx [k], mue, std, K) -> [k, H, U]``
    rebuilds the CLIPPED sampled controls of chosen rollouts in XLA from
    those counters (flat_idx indexes costs2d.reshape(-1), row-major).
    """
    S, U, H = num_states, num_controls, horizon
    assert tile_k % ROWS == 0
    C = tile_k // ROWS
    low = tuple(
        float(v)
        for v in np.broadcast_to(np.asarray(action_low, np.float32).reshape(-1), (U,))
    )
    high = tuple(
        float(v)
        for v in np.broadcast_to(np.asarray(action_high, np.float32).reshape(-1), (U,))
    )
    stride = H * tile_k  # counters per (tile, input)

    def unpack(pvec_ref):
        return {k: pvec_ref[i] for i, k in enumerate(param_keys)}

    def make_run(K: int, dt: float):
        assert K % tile_k == 0, f"K={K} not divisible by tile {tile_k}"
        n_tiles = K // tile_k
        one_step = make_soa_stepper(
            derivs_soa, integrator, dt, intermediate_steps
        )

        def kernel(seed_ref, pvec_ref, s0_ref, mue_ref, std_ref, cost_ref, z_ref):
            p = unpack(pvec_ref)
            tile_id = (seed_ref[1] + pl.program_id(0)).astype(jnp.uint32)
            seed = seed_ref[0].astype(jnp.uint32)
            for j in range(U):
                base = (seed * jnp.uint32(_FNV)
                        + tile_id * jnp.uint32(stride * U)
                        + jnp.uint32(j * stride))
                z_ref[j] = _normals(base, (H * ROWS, C), fast=fast_sampling)

            xs = tuple(jnp.full((ROWS, C), s0_ref[i]) for i in range(S))
            prev_us = tuple(
                jnp.full((ROWS, C), p[f"__u_prev_{j}"]) for j in range(U)
            )
            acc = jnp.zeros((ROWS, C), jnp.float32)

            def body(h, carry):
                xs, prev_us, acc = carry
                us = []
                for j in range(U):
                    z = z_ref[j, pl.ds(h * ROWS, ROWS), :]        # [R, C]
                    u = jnp.clip(
                        mue_ref[h * U + j] + std_ref[h * U + j] * z,
                        low[j], high[j],
                    )
                    us.append(u)
                us = tuple(us)
                acc = acc + stage_cost_soa(xs, us, prev_us, p)
                xs = one_step(xs, us, p)
                return xs, us, acc

            xs, _, acc = jax.lax.fori_loop(0, H, body, (xs, prev_us, acc))
            cost_ref[:, :] = (acc + terminal_cost_soa(xs, p)) / (H + 1)

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,  # seed2, pvec, s0, mue_flat, std_flat
            grid=(n_tiles,),
            in_specs=[],
            out_specs=pl.BlockSpec((ROWS, C), lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((U, H * ROWS, C), jnp.float32)],
        )

        def run(s0, mue, std, pvec, seed2):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((ROWS, K // ROWS), jnp.float32),
                grid_spec=gs,
                interpret=interpret,
            )(seed2, pvec, s0, mue.reshape(-1), std.reshape(-1))

        return jax.jit(run)

    low_vec = jnp.asarray(low, jnp.float32)
    high_vec = jnp.asarray(high, jnp.float32)

    def regen_controls(seed2, flat_idx, mue, std, K: int):
        """Rebuild the clipped sampled controls of rollouts ``flat_idx``."""
        TC = K // ROWS                     # columns of costs2d
        r = flat_idx // TC                  # [k]
        rem = flat_idx % TC
        t = rem // C
        c = rem % C
        seed = seed2[0].astype(jnp.uint32)
        off = seed2[1].astype(jnp.uint32)
        j = jnp.arange(U, dtype=jnp.uint32)
        base = (seed * jnp.uint32(_FNV)
                + (off + t.astype(jnp.uint32))[:, None] * jnp.uint32(stride * U)
                + j[None, :] * jnp.uint32(stride))                    # [k, U]
        h = jnp.arange(H, dtype=jnp.uint32)
        idx = ((h[None, :] * ROWS + r.astype(jnp.uint32)[:, None]) * C
               + c.astype(jnp.uint32)[:, None])                       # [k, H]
        counter = base[:, None, :] + idx[:, :, None]                  # [k, H, U]
        z = _normals_from_counter(counter, fast=fast_sampling)
        return jnp.clip(mue[None] + std[None] * z, low_vec, high_vec)

    return make_run, regen_controls


def build_fused_cem_cols(
    derivs_soa: Callable,
    stage_cost_soa: Callable,
    terminal_cost_soa: Callable,
    num_states: int,
    num_controls: int,
    horizon: int,
    param_keys: Sequence[str],
    slot_keys: Sequence[str],
    action_low,
    action_high,
    k_per_session: int,
    integrator: str = "rk4",
    intermediate_steps: int = 1,
    tile_k: int = DEFAULT_TILE_K,
    interpret: bool = False,
    fast_sampling: bool = False,
):
    """Columns-mode fully-fused CEM for batched sessions (B independent
    MPC sessions in ONE sampling+rollout+cost launch per outer iteration,
    zero population bytes in HBM).

    Each lane column holds ROWS rollouts of ONE session (the layout of
    ops/pallas_mppi.py ``kernel1_cols``); per-session context arrives as
    per-column VMEM rows: initial state ``s0_cols [T,S,C]``, distribution
    ``mue_cols``/``std_cols [T,H*U,C]`` (rows ordered ``h*U + j``),
    ``pslot_cols [T,n_sk,C]`` (attrs + u_prev, ``slot_keys`` order) and
    ``seedcw_cols [T,2,C]`` int32 (row 0 = the session's PRNG seed, row 1
    = the session-local column index ``cw``).  The per-element noise
    counter is session-local —
    ``seed_b*FNV + j*H*K_sess + (h*ROWS + r)*cps + cw`` — so a session's
    samples depend only on its own seed (results independent of B), and
    ``regen_cols(seed_b, k_loc, mue_b, std_b)`` rebuilds any session
    rollout ``k_loc = r*cps + cw`` bit-exactly in XLA for the elite refit.

    Returns ``(make_run_cols, regen_cols)`` with
    ``make_run_cols(K_total, dt) -> run(pvec_shared, s0_cols, mue_cols,
    std_cols, pslot_cols, seedcw_cols) -> costs2d [ROWS, K_total//ROWS]``
    (cost element ``[r, b*cps + cw]`` is session b's rollout
    ``r*cps + cw``).
    """
    S, U, H = num_states, num_controls, horizon
    assert tile_k % ROWS == 0
    C = tile_k // ROWS
    K_sess = int(k_per_session)
    assert K_sess % ROWS == 0
    cps = K_sess // ROWS
    HK = H * K_sess
    slot_keys = tuple(slot_keys)
    shared_keys = [k for k in param_keys if k not in slot_keys]
    assert shared_keys, "columns-mode fused CEM expects >=1 shared param"
    low = tuple(
        float(v)
        for v in np.broadcast_to(np.asarray(action_low, np.float32).reshape(-1), (U,))
    )
    high = tuple(
        float(v)
        for v in np.broadcast_to(np.asarray(action_high, np.float32).reshape(-1), (U,))
    )

    def make_run_cols(K_total: int, dt: float):
        assert K_total % tile_k == 0, f"{K_total} % {tile_k}"
        n_tiles = K_total // tile_k
        n_sk = len(slot_keys)
        one_step = make_soa_stepper(
            derivs_soa, integrator, dt, intermediate_steps
        )

        def kernel(pvec_ref, s0_ref, mue_ref, std_ref, pslot_ref,
                   seedcw_ref, cost_ref, z_ref):
            p = {k: pvec_ref[i] for i, k in enumerate(shared_keys)}
            pslot = pslot_ref[:, :]
            for i, k in enumerate(slot_keys):
                p[k] = pslot[i : i + 1, :]                  # [1, C] rows
            seed = seedcw_ref[0:1, :].astype(jnp.uint32)    # [1, C]
            cw = seedcw_ref[1:2, :].astype(jnp.uint32)
            rows_iota = jax.lax.broadcasted_iota(
                jnp.uint32, (H * ROWS, C), 0
            )
            for j in range(U):
                counter = (
                    seed * jnp.uint32(_FNV) + jnp.uint32(j * HK)
                    + rows_iota * jnp.uint32(cps) + cw
                )
                z_ref[j] = _normals_from_counter(counter, fast=fast_sampling)

            s0 = s0_ref[:, :]                               # [S, C]
            xs = tuple(
                jnp.broadcast_to(s0[i : i + 1, :], (ROWS, C)) for i in range(S)
            )
            prev_us = tuple(
                jnp.broadcast_to(p[f"__u_prev_{j}"], (ROWS, C))
                for j in range(U)
            )
            acc = jnp.zeros((ROWS, C), jnp.float32)

            def body(h, carry):
                xs, prev_us, acc = carry
                us = []
                for j in range(U):
                    z = z_ref[j, pl.ds(h * ROWS, ROWS), :]          # [R, C]
                    u = jnp.clip(
                        mue_ref[pl.ds(h * U + j, 1), :]
                        + std_ref[pl.ds(h * U + j, 1), :] * z,
                        low[j], high[j],
                    )
                    us.append(u)
                us = tuple(us)
                acc = acc + stage_cost_soa(xs, us, prev_us, p)
                xs = one_step(xs, us, p)
                return xs, us, acc

            xs, _, acc = jax.lax.fori_loop(0, H, body, (xs, prev_us, acc))
            cost_ref[:, :] = (acc + terminal_cost_soa(xs, p)) / (H + 1)

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,      # shared pvec
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((None, S, C), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, H * U, C), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, H * U, C), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, n_sk, C), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 2, C), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ROWS, C), lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((U, H * ROWS, C), jnp.float32)],
        )

        def run(pvec, s0_cols, mue_cols, std_cols, pslot_cols, seedcw_cols):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(
                    (ROWS, K_total // ROWS), jnp.float32
                ),
                grid_spec=gs,
                interpret=interpret,
            )(pvec, s0_cols, mue_cols, std_cols, pslot_cols, seedcw_cols)

        return jax.jit(run)

    low_vec = jnp.asarray(low, jnp.float32)
    high_vec = jnp.asarray(high, jnp.float32)

    def regen_cols(seed_b, k_loc, mue_b, std_b):
        """Rebuild session rollouts ``k_loc [k]`` ( = r*cps + cw) from the
        session's seed — bit-exact vs the kernel's in-VMEM samples."""
        r = (k_loc // cps).astype(jnp.uint32)
        cw = (k_loc % cps).astype(jnp.uint32)
        seed = seed_b.astype(jnp.uint32)
        j = jnp.arange(U, dtype=jnp.uint32)
        h = jnp.arange(H, dtype=jnp.uint32)
        row = h[None, :, None] * jnp.uint32(ROWS) + r[:, None, None]  # [k,H,1]
        counter = (
            seed * jnp.uint32(_FNV)
            + j[None, None, :] * jnp.uint32(HK)
            + row * jnp.uint32(cps)
            + cw[:, None, None]
        )                                                             # [k,H,U]
        z = _normals_from_counter(counter, fast=fast_sampling)
        return jnp.clip(mue_b[None] + std_b[None] * z, low_vec, high_vec)

    return make_run_cols, regen_cols
