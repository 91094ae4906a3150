"""Fully-fused MPPI control step as two Pallas TPU kernels.

The modular path (ops/pallas_rollout.py) streams the sampled perturbation
tensor [K,H,U] through HBM several times (sample, interpolate, clip,
correction cost, weighted average).  This module fuses the ENTIRE MPPI
update:

  pass 1 (per K-tile, everything in VMEM):
      counter-based PRNG -> Box-Muller normals at the inducing points ->
      interpolation matmul (MXU) -> clip to bounds -> H-step ODE rollout
      with stage cost + MPPI correction-cost accumulation
      -> write ONLY the per-rollout trajectory-cost vector.
  XLA glue: rho = min(S), a = sum(exp(-(S-rho)/LBD))  (tiny [K] reductions,
      psum-able across a sharded mesh).
  pass 2 (per K-tile): REGENERATE the identical perturbations from the same
      counters, weight them with exp(-(S-rho)/LBD)/a, and emit per-tile
      partial sums [n_tiles, H, U]; XLA sums the partials and updates the
      nominal plan.

Layout: each tile of ``tile_k`` rollouts is held as [8, C] blocks
(C = tile_k/8) so every VPU op runs on full 8x128 tiles — a flat
[1, tile_k] row would waste 7/8 of every vector cycle.  Cross-row
reductions in pass 2 are expressed as two small constant matmuls
(block-diagonal select + 8-block sum) instead of relayouts, which Mosaic
cannot lower inside kernels.

The counter-based PRNG (splitmix32 + Box-Muller) is NOT bit-compatible
with jax.random.normal, so this path is opt-in (MPPIOptimizer fully_fused
flag); it is validated statistically and in closed loop
(tests/test_pallas_mppi.py).

A SEMI-FUSED mode (``make_run.external``) keeps jax.random sampling (the
draw uses the tile layout, so it is statistically — not bitwise — equal to
the modular path's (K,P,U) draws): noise is drawn OUTSIDE at the inducing
points ([n_tiles, U, P*R, C] — 5-10x smaller than the [K,H,U] delta
tensor) and the kernel fuses interpolation, clip, rollout and cost.  The weighted average runs in XLA on the
inducing-point tensor using the linearity of interpolation
(sum_k w_k (W eps_k) == W (sum_k w_k eps_k)), so the full-horizon
perturbations never exist in HBM at all.  This is MPPIOptimizer's default
fast path on TPU.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from control_toolkit_tpu.ops.soa_integrators import (
    make_soa_stepper,
    tadd as _tadd,      # re-exported: pallas_cem and tests import these
    tscale as _tscale,
)

DEFAULT_TILE_K = 2048
ROWS = 8  # VPU sublane count; per-tile arrays are [ROWS, tile_k // ROWS]
_TWO_PI = 6.283185307179586


def _splitmix32(x: jnp.ndarray) -> jnp.ndarray:
    """Counter-based hash (splitmix32 finalizer) on uint32 arrays.

    Self-contained so the SAME bits regenerate in both kernel passes and in
    interpret mode on any backend (pltpu.prng_seed has no CPU lowering).
    """
    x = x * jnp.uint32(0x9E3779B9)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
    return x


def _normals_from_counter(counter: jnp.ndarray, fast: bool = False) -> jnp.ndarray:
    """Box-Muller standard normal for each uint32 counter element.

    Pure elementwise function of the counter, so any subset of a kernel's
    noise can be REGENERATED exactly in XLA from the same counters (used by
    fused CEM to rebuild only the elite rows).

    ``fast=True`` swaps the exact log/cos for the polynomial versions
    (ops/fastmath.py, ~2e-6 log / ~1e-5 trig error — far below sampling
    noise).  The flag must match between a kernel and its XLA regeneration:
    builders thread one ``fast_sampling`` value into both.

    Measured (v5e, fused CEM K=1M H=50): perf-NEUTRAL — replacing the whole
    noise path with a constant fill saves only ~1.1 ms of the 8 ms pass,
    and that remainder is the splitmix32 integer hashing (uint32 multiplies
    on the VPU), not the log/cos this flag replaces.  Kept because it costs
    nothing and documents the negative result; do not expect kernel-side
    sampling wins from cheaper transcendentals."""
    bits1 = _splitmix32(counter)
    bits2 = _splitmix32(counter + jnp.uint32(0x7F4A7C15))
    # uint32 -> uniform via the top 24 bits; u1 in (0, 1], u2 in [0, 1).
    # Mosaic has no uint32->f32 cast: go through int32 (value < 2^24 fits).
    eight = jnp.uint32(8)
    i1 = jax.lax.shift_right_logical(bits1, eight).astype(jnp.int32)
    i2 = jax.lax.shift_right_logical(bits2, eight).astype(jnp.int32)
    u1 = (i1.astype(jnp.float32) + 1.0) * (1.0 / 16777216.0)
    u2 = i2.astype(jnp.float32) * (1.0 / 16777216.0)
    if fast:
        from control_toolkit_tpu.ops.fastmath import fast_cos, fast_log

        # fast_log(1.0) can land at +2e-6 (poly error), which would make the
        # sqrt NaN — and u1 == 1.0 occurs at rate 2^-24 per draw, i.e. a few
        # times per K=1M step.  Clamp the radicand at 0.
        r = jnp.sqrt(jnp.maximum(-2.0 * fast_log(u1), 0.0))
        return r * fast_cos(_TWO_PI * u2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def _normals(counter_base: jnp.ndarray, shape, fast: bool = False) -> jnp.ndarray:
    """Box-Muller standard normals keyed by a per-element uint32 counter."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    idx = rows * jnp.uint32(shape[1]) + cols
    return _normals_from_counter(counter_base + idx, fast=fast)


def build_fused_mppi_step(
    derivs_soa: Callable,
    stage_cost_soa: Callable,      # (xs, us, prev_us, pdict) -> [R, C]
    terminal_cost_soa: Callable,   # (xs, pdict) -> [R, C]
    num_states: int,
    num_controls: int,
    horizon: int,
    num_inducing: int,
    interp_matrix: np.ndarray,     # [P, H]
    dt: float,
    param_keys: Sequence[str],
    cc_weight: float, R: float, NU: float, LBD: float,
    stdev: float,
    action_low, action_high,
    integrator: str = "rk4",
    intermediate_steps: int = 1,
    tile_k: int = DEFAULT_TILE_K,
    interpret: bool = False,
    fast_sampling: bool = False,
    slot_extra_keys: Sequence[str] = (),
):
    """Build ``make_run(K) -> step(s0 [S], u_nom [H,U], pvec [N], seed [1])
    -> (new_u_nom [H,U], costs [K])`` implementing one full MPPI update."""
    S, U, H, P = num_states, num_controls, horizon, num_inducing
    assert tile_k % ROWS == 0
    C = tile_k // ROWS
    # Per-input action bounds, baked in as static constants (control limits
    # are construction-time config).  Scalars broadcast to all U inputs.
    low = tuple(
        float(v)
        for v in np.broadcast_to(np.asarray(action_low, np.float32).reshape(-1), (U,))
    )
    high = tuple(
        float(v)
        for v in np.broadcast_to(np.asarray(action_high, np.float32).reshape(-1), (U,))
    )

    # Constant operands (small, passed as VMEM inputs — Mosaic kernels can't
    # capture array constants):
    W_np = np.asarray(interp_matrix, np.float32)            # [P, H]
    # Block interpolation: delta_full [H*R, C] = Wk @ z [P*R, C] with
    # Wk = kron(W.T, eye(R)).
    Wk_np = np.kron(W_np.T, np.eye(ROWS, dtype=np.float32))     # [H*R, P*R]
    # Pass-2 helpers: select the matching sublane then sum each 8-row block.
    eyemask_np = np.tile(np.eye(ROWS, dtype=np.float32), (H, 1))  # [H*R, R]
    blocksum_np = np.kron(np.eye(H, dtype=np.float32),
                          np.ones((1, ROWS), np.float32))         # [H, H*R]

    def unpack(pvec_ref):
        return {k: pvec_ref[i] for i, k in enumerate(param_keys)}

    # Split for the columnwise (batched-session) kernel: attrs and u_prev
    # vary per MPC session, dynamics/cost constants are shared — except
    # ``slot_extra_keys`` ("d_<name>" / "c_<name>" entries): per-session
    # dynamics constants (heterogeneous-fleet serving) and cost weights
    # (kernel-path hyperparameter grids), riding as pslot rows like the
    # attrs (the SOA arithmetic broadcasts their [1, C] rows).  The
    # partition rule lives in ONE place (function-level import: the
    # optimizers package imports this module's builders lazily).
    from control_toolkit_tpu.optimizers.base import partition_packed_keys

    shared_keys, slot_keys = partition_packed_keys(
        param_keys, slot_extra_keys
    )

    one_step = make_soa_stepper(derivs_soa, integrator, dt, intermediate_steps)

    def gen_delta_into(seed_ref, wk_ref, delta_ref):
        """Perturbations for this tile into VMEM scratch [U, H*R, C].

        Counter base unique per (seed, GLOBAL tile, control dim): both
        passes regenerate identical noise, and under sharding each device
        offsets its tile ids (seed_ref[1]) so the sharded run produces
        bitwise the same population as the single-device run.
        """
        tile_id = (seed_ref[1] + pl.program_id(0)).astype(jnp.uint32)
        seed = seed_ref[0].astype(jnp.uint32)
        Wk = wk_ref[:, :]                                   # [H*R, P*R]
        stride = jnp.uint32(P * tile_k)
        for j in range(U):
            base = (seed * jnp.uint32(0x01000193)
                    + tile_id * stride * jnp.uint32(U)
                    + jnp.uint32(j) * stride)
            z = _normals(base, (P * ROWS, C), fast=fast_sampling) * stdev  # [P*R, C]
            delta_ref[j] = jnp.dot(Wk, z, preferred_element_type=jnp.float32)

    # ---------------- pass 1: rollout + cost -------------------------------
    # s0 and u_nom ride in SMEM (scalar prefetch): dynamic scalar reads from
    # degenerate VMEM blocks crash the Mosaic compiler.
    def rollout_cost_core(p, s0_ref, unom_ref, cost_ref, delta_ref,
                          xterm_ref=None):
        """Shared H-step rollout + stage/correction cost accumulation over a
        [ROWS, C] tile, reading per-step perturbations from delta_ref.
        With ``xterm_ref`` ([S, ROWS, C]) the terminal states are emitted
        too — consumed by a post-terminal hook (learned value terminal)
        evaluated outside the kernel (costs/base.py post_terminal_cost)."""
        xs = tuple(jnp.full((ROWS, C), s0_ref[i]) for i in range(S))
        prev_us = tuple(
            jnp.full((ROWS, C), p[f"__u_prev_{j}"]) for j in range(U)
        )
        acc = jnp.zeros((ROWS, C), jnp.float32)
        corr = jnp.zeros((ROWS, C), jnp.float32)

        def body(h, carry):
            xs, prev_us, acc, corr = carry
            us, dus = [], []
            for j in range(U):
                d = delta_ref[j, pl.ds(h * ROWS, ROWS), :]       # [R, C]
                un = unom_ref[h * U + j]                          # SMEM scalar
                u = jnp.clip(un + d, low[j], high[j])
                us.append(u)
                dus.append(d)
            us = tuple(us)
            acc = acc + stage_cost_soa(xs, us, prev_us, p)
            # MPPI correction cost (reference optimizer_mppi.py:154-155).
            for j in range(U):
                corr = corr + cc_weight * (
                    0.5 * (1.0 - 1.0 / NU) * R * dus[j] * dus[j]
                    + R * us[j] * dus[j]
                    + 0.5 * R * us[j] * us[j]
                )
            xs = one_step(xs, us, p)
            return xs, us, acc, corr

        xs, _, acc, corr = jax.lax.fori_loop(0, H, body, (xs, prev_us, acc, corr))
        cost_ref[:, :] = (acc + terminal_cost_soa(xs, p)) / (H + 1) + corr
        if xterm_ref is not None:
            for i in range(S):
                xterm_ref[i] = xs[i]

    def kernel1(seed_ref, pvec_ref, s0_ref, unom_ref, wk_ref, cost_ref, delta_ref):
        p = unpack(pvec_ref)
        gen_delta_into(seed_ref, wk_ref, delta_ref)
        rollout_cost_core(p, s0_ref, unom_ref, cost_ref, delta_ref)

    # Semi-fused variant: perturbations sampled OUTSIDE with jax.random at
    # the inducing points (same PRNG family as the modular path, but drawn
    # in tile layout — statistically, not bitwise, equal to the modular
    # path's (K,P,U) draws) and streamed in as [U, P*R, C] tiles — the
    # kernel fuses interpolation (MXU matmul), clip, rollout and cost, so
    # neither the [K,H,U] delta tensor nor the Q transpose ever touches HBM.
    def kernel1_ext(pvec_ref, s0_ref, unom_ref, eps_ref, wk_ref, cost_ref,
                    delta_ref):
        p = unpack(pvec_ref)
        Wk = wk_ref[:, :]
        for j in range(U):
            delta_ref[j] = jnp.dot(
                Wk, eps_ref[0, j], preferred_element_type=jnp.float32
            )
        rollout_cost_core(p, s0_ref, unom_ref, cost_ref, delta_ref)

    # emit_terminal twin: second output block [S, ROWS, C] carries x_H.
    def kernel1_ext_emit(pvec_ref, s0_ref, unom_ref, eps_ref, wk_ref,
                         cost_ref, xterm_ref, delta_ref):
        p = unpack(pvec_ref)
        Wk = wk_ref[:, :]
        for j in range(U):
            delta_ref[j] = jnp.dot(
                Wk, eps_ref[0, j], preferred_element_type=jnp.float32
            )
        rollout_cost_core(p, s0_ref, unom_ref, cost_ref, delta_ref,
                          xterm_ref=xterm_ref)

    # Columnwise-context variant (batched sessions): initial state, nominal
    # plan, attrs and u_prev vary PER ROLLOUT COLUMN (each lane column of a
    # tile holds ROWS rollouts of ONE session), arriving as small VMEM row
    # operands instead of SMEM scalars.  One launch then evaluates many
    # independent MPC sessions packed along the lane axis — the kernel
    # itself is session-agnostic; the caller lays sessions out contiguously
    # along the global column order and reduces per session outside.
    def kernel1_cols(pvec_ref, s0_ref, unom_ref, pslot_ref, eps_ref, wk_ref,
                     cost_ref, delta_ref, xterm_ref=None):
        # The per-column operands use None-dim BlockSpecs, so refs arrive
        # with the tile dim already dropped: s0 [S, C], unom [U*H, C],
        # pslot [n_sk, C], eps [U, P*ROWS, C].  With ``xterm_ref``
        # ([S, ROWS, C]) the terminal states are emitted too, for a
        # post-terminal hook (learned value terminal) evaluated per
        # session outside the kernel.
        p = {k: pvec_ref[i] for i, k in enumerate(shared_keys)}
        pslot = pslot_ref[:, :]                             # [n_sk, C]
        for i, k in enumerate(slot_keys):
            p[k] = pslot[i:i + 1, :]                        # [1, C] rows
        Wk = wk_ref[:, :]
        for j in range(U):
            delta_ref[j] = jnp.dot(
                Wk, eps_ref[j], preferred_element_type=jnp.float32
            )
        s0 = s0_ref[:, :]                                   # [S, C]
        xs = tuple(
            jnp.broadcast_to(s0[i:i + 1, :], (ROWS, C)) for i in range(S)
        )
        prev_us = tuple(
            jnp.broadcast_to(p[f"__u_prev_{j}"], (ROWS, C)) for j in range(U)
        )
        acc = jnp.zeros((ROWS, C), jnp.float32)
        corr = jnp.zeros((ROWS, C), jnp.float32)

        def body(h, carry):
            xs, prev_us, acc, corr = carry
            us, dus = [], []
            for j in range(U):
                d = delta_ref[j, pl.ds(h * ROWS, ROWS), :]  # [R, C]
                un = unom_ref[pl.ds(j * H + h, 1), :]       # [1, C] row
                u = jnp.clip(un + d, low[j], high[j])
                us.append(u)
                dus.append(d)
            us = tuple(us)
            acc = acc + stage_cost_soa(xs, us, prev_us, p)
            for j in range(U):
                corr = corr + cc_weight * (
                    0.5 * (1.0 - 1.0 / NU) * R * dus[j] * dus[j]
                    + R * us[j] * dus[j]
                    + 0.5 * R * us[j] * us[j]
                )
            xs = one_step(xs, us, p)
            return xs, us, acc, corr

        xs, _, acc, corr = jax.lax.fori_loop(0, H, body, (xs, prev_us, acc, corr))
        cost_ref[:, :] = (acc + terminal_cost_soa(xs, p)) / (H + 1) + corr
        if xterm_ref is not None:
            for i in range(S):
                xterm_ref[i] = xs[i]

    # emit_terminal twin of the columnwise kernel (outputs ordered
    # cost, xterm ahead of the delta scratch, per pallas_call convention).
    def kernel1_cols_emit(pvec_ref, s0_ref, unom_ref, pslot_ref, eps_ref,
                          wk_ref, cost_ref, xterm_ref, delta_ref):
        kernel1_cols(pvec_ref, s0_ref, unom_ref, pslot_ref, eps_ref, wk_ref,
                     cost_ref, delta_ref, xterm_ref=xterm_ref)

    # ---------------- pass 2: weighted perturbation sums -------------------
    def kernel2(seed_ref, red_ref, wk_ref, eyemask_ref, blocksum_ref,
                cost_ref, out_ref, delta_ref):
        # red_ref: [2] = (rho, a)
        gen_delta_into(seed_ref, wk_ref, delta_ref)
        rho = red_ref[0]
        a = red_ref[1]
        w = jnp.exp(-(cost_ref[:, :] - rho) * (1.0 / LBD)) / a      # [R, C]
        cols = []
        for j in range(U):
            d = delta_ref[j]                                        # [H*R, C]
            # prod[i, r] = sum_c d[i, c] * w[r, c]
            prod = jnp.dot(d, w.T, preferred_element_type=jnp.float32)  # [H*R, R]
            # keep only the matching sublane, then lane-reduce
            sel = jnp.sum(prod * eyemask_ref[:, :], axis=1, keepdims=True)  # [H*R, 1]
            # sum each 8-row block -> [H, 1]
            out_h = jnp.dot(blocksum_ref[:, :], sel,
                            preferred_element_type=jnp.float32)
            cols.append(out_h[:, 0])
        out_ref[0] = jnp.stack(cols, axis=-1)                       # [H, U]

    def make_run(K: int, mesh=None, axis=None):
        """K rollouts total; with ``mesh`` the population splits over its
        sharding axes via shard_map — each device runs its local tiles and
        the softmax reductions ride psum/pmin collectives (ICI within a
        slice; for a 2-D ('slice','k') mesh the scalar combine crosses DCN).
        Noise counters are global-tile-based, so sharded and unsharded runs
        are bitwise equal regardless of mesh topology.

        ``axis``: mesh axis name or tuple of names to shard K over
        (default: ALL mesh axes, in mesh order)."""
        assert K % tile_k == 0, f"K={K} not divisible by tile {tile_k}"
        if mesh is not None:
            if axis is None:
                axes = tuple(mesh.axis_names)
            elif isinstance(axis, str):
                axes = (axis,)
            else:
                axes = tuple(axis)
            n_dev = int(np.prod([mesh.shape[a] for a in axes]))
        else:
            axes = ()
            n_dev = 1
        assert K % (tile_k * n_dev) == 0, "K must divide evenly across devices"
        n_tiles = K // tile_k // n_dev  # tiles per device
        Wk = jnp.asarray(Wk_np)
        eyemask = jnp.asarray(eyemask_np)
        blocksum = jnp.asarray(blocksum_np)
        K_local = K // n_dev

        gs1 = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,  # seed, pvec, s0, unom_flat
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((H * ROWS, P * ROWS), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ROWS, C), lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((U, H * ROWS, C), jnp.float32)],
        )
        gs2 = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # seed, (rho, a)
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((H * ROWS, P * ROWS), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H * ROWS, ROWS), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, H * ROWS), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROWS, C), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, U), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((U, H * ROWS, C), jnp.float32)],
        )

        def local_step(s0, u_nom, pvec, seed2):
            """One device's share: seed2 = [seed, tile_offset]."""
            costs2d = pl.pallas_call(
                kernel1,
                out_shape=jax.ShapeDtypeStruct((ROWS, K_local // ROWS), jnp.float32),
                grid_spec=gs1,
                interpret=interpret,
            )(seed2, pvec, s0, u_nom.reshape(-1), Wk)

            rho_l = jnp.min(costs2d)
            if mesh is not None:
                rho = jax.lax.pmin(rho_l, axes)
            else:
                rho = rho_l
            wsum_l = jnp.sum(jnp.exp(-(costs2d - rho) / LBD))
            if mesh is not None:
                wsum = jax.lax.psum(wsum_l, axes)
            else:
                wsum = wsum_l
            red = jnp.stack([rho, wsum])

            partials = pl.pallas_call(
                kernel2,
                out_shape=jax.ShapeDtypeStruct((n_tiles, H, U), jnp.float32),
                grid_spec=gs2,
                interpret=interpret,
            )(seed2, red, Wk, eyemask, blocksum, costs2d)
            b = jnp.sum(partials, axis=0)                      # [H, U]
            if mesh is not None:
                b = jax.lax.psum(b, axes)
            u_nom_new = jnp.clip(
                u_nom + b, jnp.asarray(low, jnp.float32), jnp.asarray(high, jnp.float32)
            )
            return u_nom_new, costs2d.reshape(-1)

        if mesh is None:
            @jax.jit
            def step(s0, u_nom, pvec, seed):
                seed2 = jnp.concatenate([seed.reshape(1), jnp.zeros(1, jnp.int32)])
                return local_step(s0, u_nom, pvec, seed2)
            return step

        from jax.sharding import PartitionSpec as PS
        try:
            from jax import shard_map  # jax >= 0.8
        except ImportError:
            from jax.experimental.shard_map import shard_map

        def sharded(s0, u_nom, pvec, seed):
            # Linear device index over the sharding axes (mesh-order major)
            # so each device's global tile offset is unique and contiguous.
            dev = jnp.zeros((), jnp.int32)
            for a in axes:
                dev = dev * mesh.shape[a] + jax.lax.axis_index(a)
            off = (dev * n_tiles).astype(jnp.int32)
            seed2 = jnp.concatenate([seed.reshape(1), off.reshape(1)])
            return local_step(s0, u_nom, pvec, seed2)

        costs_spec = PS(axes if len(axes) > 1 else axes[0])
        inner = shard_map(
            sharded, mesh=mesh,
            in_specs=(PS(), PS(), PS(), PS()),
            out_specs=(PS(), costs_spec),
            check_vma=False,  # pallas_call outputs carry no vma annotation
        )
        return jax.jit(inner)

    def make_cost_run(K: int, mesh=None, axis=None,
                      emit_terminal: bool = False):
        """Semi-fused mode: external jax.random noise at the inducing points.

        Returns ``cost(s0 [S], u_nom [H,U], pvec [N], eps) -> costs2d`` where
        ``eps`` is the PRE-SCALED perturbation tensor in tile layout
        [n_tiles, U, P*ROWS, C] and ``costs2d`` is [ROWS, n_tiles*C]
        (element [r, t*C + c] = rollout (t, r, c)).  The caller computes the
        softmax weights and exploits the LINEARITY of interpolation to take
        the weighted average over the small inducing-point tensor:
        sum_k w_k (W eps_k) == W (sum_k w_k eps_k).

        ``emit_terminal=True`` returns ``(costs2d, xterm)`` with ``xterm``
        [S, ROWS, n_tiles*C] — the terminal states in the SAME tile layout
        as costs2d, for a post-terminal hook (learned value terminal)
        added to costs2d before the softmax.
        """
        assert K % tile_k == 0, f"K={K} not divisible by tile {tile_k}"
        if mesh is not None:
            if axis is None:
                axes = tuple(mesh.axis_names)
            elif isinstance(axis, str):
                axes = (axis,)
            else:
                axes = tuple(axis)
            n_dev = int(np.prod([mesh.shape[a] for a in axes]))
        else:
            axes = ()
            n_dev = 1
        assert K % (tile_k * n_dev) == 0, "K must divide evenly across devices"
        n_tiles = K // tile_k // n_dev  # tiles per device
        K_local = K // n_dev
        Wk = jnp.asarray(Wk_np)

        out_specs = [pl.BlockSpec((ROWS, C), lambda i, *_: (0, i),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((ROWS, K_local // ROWS), jnp.float32)]
        if emit_terminal:
            out_specs.append(pl.BlockSpec((S, ROWS, C), lambda i, *_: (0, 0, i),
                                          memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((S, ROWS, K_local // ROWS), jnp.float32)
            )
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # pvec, s0, unom_flat
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, U, P * ROWS, C), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H * ROWS, P * ROWS), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs if emit_terminal else out_specs[0],
            scratch_shapes=[pltpu.VMEM((U, H * ROWS, C), jnp.float32)],
        )

        def local_cost(s0, u_nom, pvec, eps):
            return pl.pallas_call(
                kernel1_ext_emit if emit_terminal else kernel1_ext,
                out_shape=out_shape if emit_terminal else out_shape[0],
                grid_spec=gs,
                interpret=interpret,
            )(pvec, s0, u_nom.reshape(-1), eps, Wk)

        if mesh is None:
            return jax.jit(local_cost)

        from jax.sharding import PartitionSpec as PS
        try:
            from jax import shard_map  # jax >= 0.8
        except ImportError:
            from jax.experimental.shard_map import shard_map

        first = axes if len(axes) > 1 else axes[0]
        inner = shard_map(
            local_cost, mesh=mesh,
            in_specs=(PS(), PS(), PS(), PS(first, None, None, None)),
            out_specs=(
                (PS(None, first), PS(None, None, first))
                if emit_terminal else PS(None, first)
            ),
            check_vma=False,
        )
        return jax.jit(inner)

    def make_cost_run_cols(K: int, emit_terminal: bool = False):
        """Columnwise semi-fused cost kernel over K total rollouts.

        Returns ``cost(pvec [N_shared], s0_cols [T,S,C], unom_cols
        [T,U*H,C], pslot_cols [T,n_sk,C], eps [T,U,P*ROWS,C]) -> costs2d
        [ROWS, T*C]``.  ``unom_cols`` rows are ordered ``j*H + h``;
        ``pslot_cols`` rows follow ``slot_keys`` (exposed as
        ``make_run.slot_keys``).  All per-column operands are tiny relative
        to eps (they repeat each session's scalars over its K/ROWS
        columns), so the batched launch stays bandwidth-dominated by the
        same tensors as the single-session kernel.

        ``emit_terminal=True`` returns ``(costs2d, xterm)`` with ``xterm``
        [S, ROWS, T*C] — terminal states in the same tile layout as
        costs2d, for a post-terminal hook (learned value terminal) added
        per session before the softmax."""
        assert K % tile_k == 0, f"K={K} not divisible by tile {tile_k}"
        n_tiles = K // tile_k
        n_sk = len(slot_keys)
        assert shared_keys, "columnwise kernel expects >=1 shared param"
        Wk = jnp.asarray(Wk_np)

        out_specs = [pl.BlockSpec((ROWS, C), lambda i, *_: (0, i),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((ROWS, K // ROWS), jnp.float32)]
        if emit_terminal:
            out_specs.append(pl.BlockSpec((S, ROWS, C),
                                          lambda i, *_: (0, 0, i),
                                          memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((S, ROWS, K // ROWS), jnp.float32)
            )
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # shared pvec
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((None, S, C), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, U * H, C), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, n_sk, C), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, U, P * ROWS, C), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H * ROWS, P * ROWS), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs if emit_terminal else out_specs[0],
            scratch_shapes=[pltpu.VMEM((U, H * ROWS, C), jnp.float32)],
        )

        def cost_cols(pvec, s0_cols, unom_cols, pslot_cols, eps):
            return pl.pallas_call(
                kernel1_cols_emit if emit_terminal else kernel1_cols,
                out_shape=out_shape if emit_terminal else out_shape[0],
                grid_spec=gs,
                interpret=interpret,
            )(pvec, s0_cols, unom_cols, pslot_cols, eps, Wk)

        return jax.jit(cost_cols)

    make_run.external = make_cost_run
    make_run.cols = make_cost_run_cols
    make_run.shared_keys = shared_keys
    make_run.slot_keys = slot_keys
    return make_run
