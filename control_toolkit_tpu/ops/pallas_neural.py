"""Pallas TPU kernel: fused rollout + cost for LEARNED (MLP) dynamics.

The reference's flagship predictor is a trained network (SI_Toolkit GRU/MLP
names in Control_Toolkit_ASF_Template/config_controllers.yml:8).  The XLA
scan path evaluates it as H sequential matmuls whose [K, hidden]
activations round-trip HBM every layer of every horizon step — at K=262k,
H=50, a 32x32 net that is ~2 GB of traffic per optimizer iteration, all
bandwidth-bound.  This kernel keeps a TILE_K-rollout slice of the
recurrence entirely in VMEM: per step it evaluates the MLP on the MXU in
transposed form and accrues the stage cost on the VPU, writing only the
final [K] cost vector to HBM.

Layout: identical to ops/pallas_rollout.py — state components are SOA rows
[1, TILE_K] (lanes = rollouts), so the cost function's ``*_soa`` primitives
are reused unchanged.  The network runs on stacked rows: activations are
[feat, TILE_K] with weights pre-transposed host-side to [out, in], making
each layer one MXU ``dot_general`` with the full lane dimension utilized
(the feature dim underfills MXU rows at width<128 — still a ~10x win over
the HBM-bound scan because the traffic disappears, not because the MXU is
full; see docs/KERNELS.md roofline).

Weights ride as whole-array VMEM operands (constant index_map — resident
across grid steps, ~KBs for the net sizes the reference names); scalar cost
params/attrs/u_prev ride in SMEM scalar prefetch exactly like the ODE
kernel, so weight UPDATES (online sysid, checkpoint swap) and cost
hot-reloads never recompile.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_NEURAL_TILE_K = 8192
_MIN_NEURAL_TILE_K = 2048


def neural_tile_for(K: int, n_shard_devices: int = 1) -> int:
    """Largest eligible tile for a (possibly sharded) population.

    Measured (v5e, mlp-32-32, K=262k, H=50): the kernel is per-step
    DEPENDENCY-bound — each horizon step is a handful of microsecond-scale
    matmuls, so fewer/larger grid tiles amortize the serial chain: tile
    2048 → 3.54 ms, 4096 → 2.34, 8192 → 2.11, 16384 → 2.20 (VMEM pressure
    turns it around).  8192 is the sweet spot; fall back by halving until
    the per-device shard tiles evenly.  Returns 0 if even the minimum tile
    doesn't divide (caller keeps the scan path)."""
    per_dev = K // max(1, n_shard_devices)
    tile = DEFAULT_NEURAL_TILE_K
    while tile >= _MIN_NEURAL_TILE_K:
        if per_dev % tile == 0 and K % (tile * max(1, n_shard_devices)) == 0:
            return tile
        tile //= 2
    return 0


def ensemble_tile_for(K: int, n_members: int, n_shard_devices: int = 1) -> int:
    """Tile for the ensemble form of the neural kernel: the per-tile member
    mapping (tile i -> member i // tiles_per_member) needs every member
    block to tile evenly, i.e. (K / E) % tile == 0.

    Sharded meshes compose when the member blocks NEST inside the device
    shards — E % n_dev == 0, so device d owns members
    [d*E/D, (d+1)*E/D) whole: the stacked weight operands shard on their
    member axis and each device runs a local E/D-member kernel over its
    K/D rollouts (Optimizer._build_pallas_ensemble_cost).  Shards that
    would split a member block mid-device return 0 (caller keeps the
    member-vmapped scan)."""
    if n_members < 1 or K % n_members:
        return 0
    if n_shard_devices > 1 and n_members % n_shard_devices:
        return 0
    per_member = K // n_members
    tile = DEFAULT_NEURAL_TILE_K
    while tile >= _MIN_NEURAL_TILE_K:
        if per_member % tile == 0:
            return tile
        tile //= 2
    return 0


def mlp_layer_count(net: Dict) -> int:
    return sum(1 for k in net if k.startswith("w"))


def flatten_mlp_weights(net: Dict) -> List[jnp.ndarray]:
    """Order the MLP parameter dict into the kernel's operand list:
    [w0^T [out,in], b0 [out,1], w1^T, b1, ...,
     (norm_in_mean [in,1], norm_in_std), (norm_out_mean [out,1], norm_out_std)]
    Norm entries appear only when present in the dict (trained checkpoints
    carry them; random inits don't)."""
    ops: List[jnp.ndarray] = []
    n = mlp_layer_count(net)
    for i in range(n):
        ops.append(jnp.asarray(net[f"w{i}"], jnp.float32).T)
        ops.append(jnp.reshape(jnp.asarray(net[f"b{i}"], jnp.float32), (-1, 1)))
    if "norm_in_mean" in net:
        ops.append(jnp.reshape(jnp.asarray(net["norm_in_mean"], jnp.float32), (-1, 1)))
        ops.append(jnp.reshape(jnp.asarray(net["norm_in_std"], jnp.float32), (-1, 1)))
    if "norm_out_mean" in net:
        ops.append(jnp.reshape(jnp.asarray(net["norm_out_mean"], jnp.float32), (-1, 1)))
        ops.append(jnp.reshape(jnp.asarray(net["norm_out_std"], jnp.float32), (-1, 1)))
    return ops


def flatten_ensemble_mlp_weights(net: Dict) -> List[jnp.ndarray]:
    """``flatten_mlp_weights`` for a STACKED ensemble dict (leading member
    axis E on every leaf): same operand order, each with shape
    [E, <flatten_mlp_weights shape>].  The runner's per-tile member
    index_map then slices one member's block per grid tile."""
    ops: List[jnp.ndarray] = []
    n = mlp_layer_count(net)
    E = net["w0"].shape[0]
    for i in range(n):
        ops.append(jnp.transpose(jnp.asarray(net[f"w{i}"], jnp.float32), (0, 2, 1)))
        ops.append(jnp.reshape(jnp.asarray(net[f"b{i}"], jnp.float32), (E, -1, 1)))
    if "norm_in_mean" in net:
        ops.append(jnp.reshape(jnp.asarray(net["norm_in_mean"], jnp.float32), (E, -1, 1)))
        ops.append(jnp.reshape(jnp.asarray(net["norm_in_std"], jnp.float32), (E, -1, 1)))
    if "norm_out_mean" in net:
        ops.append(jnp.reshape(jnp.asarray(net["norm_out_mean"], jnp.float32), (E, -1, 1)))
        ops.append(jnp.reshape(jnp.asarray(net["norm_out_std"], jnp.float32), (E, -1, 1)))
    return ops


def mlp_rows(ws, a, n_layers, activation=jnp.tanh, norm_in=None,
             norm_out=None, mxu_bf16=False):
    """Evaluate a flatten_mlp_weights MLP on stacked rows ``a [feat, T]``
    (lanes = rollouts): each layer is one MXU ``dot_general`` with the
    pre-transposed [out, in] weight.  The single source of the row-MLP
    used by the forward neural kernel, its gradient twin and the residual
    kernels."""
    if norm_in is not None:
        a = (a - norm_in[0]) / norm_in[1]
    for i in range(n_layers):
        lhs, rhs = ws[2 * i], a
        if mxu_bf16:
            # bf16 operands, f32 accumulation: one MXU pass instead of the
            # f32 multi-pass — pays when matmul-issue-bound.
            lhs = lhs.astype(jnp.bfloat16)
            rhs = rhs.astype(jnp.bfloat16)
        a = jax.lax.dot_general(
            lhs, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + ws[2 * i + 1]
        if i < n_layers - 1:
            a = activation(a)
    if norm_out is not None:
        a = a * norm_out[1] + norm_out[0]
    return a


def build_neural_cost_rollout_kernel(
    stage_cost_soa: Callable,     # (xs, us, prev_us, p) -> [1, T]
    terminal_cost_soa: Callable,  # (xs, p) -> [1, T]
    num_states: int,
    num_controls: int,
    horizon: int,
    param_keys: Sequence[str],    # packed scalar params (cost/attrs/u_prev)
    n_layers: int,
    predict_delta: bool = True,
    has_norm_in: bool = False,
    has_norm_out: bool = False,
    activation: Callable = jnp.tanh,
    tile_k: int = DEFAULT_NEURAL_TILE_K,
    interpret: bool = False,
    mxu_bf16: bool = False,
    slot_keys: Sequence[str] = (),
    n_members: int = None,
    emit_terminal: bool = False,
):
    """Build ``fn(s0 [K,S], Q [K,H,U], pvec [N], *weights) -> cost [K]`` for
    an MLP next-state model ``x' = x + net([x,u])`` (or absolute form).

    ``n_members`` switches to the ENSEMBLE form (PETS TS-inf blockwise
    member assignment, models/ensemble_predictor.py): weights arrive
    stacked with a leading member axis (``flatten_ensemble_mlp_weights``)
    and grid tile i computes under member ``i // tiles_per_member`` — the
    same contiguous-block layout the predictor's vmapped scan uses, so an
    E-member ensemble costs EXACTLY one net's FLOPs per rollout.  Requires
    (K / E) % tile_k == 0 (``ensemble_tile_for``).

    ``weights`` is the ``flatten_mlp_weights`` operand list.  Semantics match
    NeuralPredictor.single_step (models/neural_predictor.py) composed with
    the reference trajectory-cost reduction (mean over H stage + terminal).

    ``slot_keys`` switches to the batched-session ("columns") form: the
    listed params (attrs / u_prev — anything varying per MPC session) leave
    the shared SMEM vector and arrive per-LANE as one extra VMEM operand
    ``pslot [n_slot, K]`` right after Q: ``fn(s0, Q, pvec_shared, pslot,
    *weights)``.  s0 and Q are already per-rollout, so B sessions pack by
    simple concatenation along K — no alignment between a session's K and
    the tile is needed, only ``(B*K) % tile_k == 0``.
    """
    S, U, H = num_states, num_controls, horizon
    n_w = 2 * n_layers + (2 if has_norm_in else 0) + (2 if has_norm_out else 0)
    slot_keys = tuple(slot_keys)
    n_slot = len(slot_keys)
    shared_keys = [k for k in param_keys if k not in slot_keys]

    def kernel(pvec_ref, s0_ref, q_ref, *rest):
        if n_slot:
            pslot_ref, rest = rest[0], rest[1:]
        w_refs = rest[:n_w]
        cost_ref = rest[n_w]
        xterm_ref = rest[n_w + 1] if emit_terminal else None
        p = {k: pvec_ref[i] for i, k in enumerate(shared_keys)}
        for i, k in enumerate(slot_keys):
            p[k] = pslot_ref[i:i + 1, :]                   # [1, T] row

        idx = 2 * n_layers
        norm_in = w_refs[idx : idx + 2] if has_norm_in else None
        idx += 2 if has_norm_in else 0
        norm_out = w_refs[idx : idx + 2] if has_norm_out else None

        xs = tuple(s0_ref[i : i + 1, :] for i in range(S))
        prev_us = tuple(
            p[f"__u_prev_{j}"] if f"__u_prev_{j}" in slot_keys
            else jnp.full((1, tile_k), p[f"__u_prev_{j}"]) for j in range(U)
        )
        acc = jnp.zeros((1, tile_k), jnp.float32)

        # Ensemble operands carry a leading member axis; the runner's
        # index_map already selected this tile's member block of extent 1.
        sel = (lambda r: r[0]) if n_members else (lambda r: r[:])
        ws = [sel(r) for r in w_refs[: 2 * n_layers]]
        norm_in_v = [sel(r) for r in norm_in] if norm_in is not None else None
        norm_out_v = [sel(r) for r in norm_out] if norm_out is not None else None

        def net_step(xs, us):
            a = jnp.concatenate(xs + us, axis=0)          # [S+U, T]
            a = mlp_rows(ws, a, n_layers, activation,
                         norm_in=norm_in_v, norm_out=norm_out_v,
                         mxu_bf16=mxu_bf16)
            if predict_delta:
                return tuple(xs[i] + a[i : i + 1, :] for i in range(S))
            return tuple(a[i : i + 1, :] for i in range(S))

        def body(h, carry):
            xs, prev_us, acc = carry
            u_slab = q_ref[h]                              # [U, T]
            us = tuple(u_slab[j : j + 1, :] for j in range(U))
            acc = acc + stage_cost_soa(xs, us, prev_us, p)
            xs = net_step(xs, us)
            return xs, us, acc

        xs, _, acc = jax.lax.fori_loop(0, H, body, (xs, prev_us, acc))
        cost_ref[0:1, :] = (acc + terminal_cost_soa(xs, p)) / (H + 1)
        if emit_terminal:
            for i in range(S):
                xterm_ref[i : i + 1, :] = xs[i]

    return _make_runner(kernel, S, U, H, n_w, tile_k, interpret, n_slot,
                        n_members=n_members, emit_terminal=emit_terminal)


def _make_runner(kernel, S, U, H, n_w, tile_k, interpret, n_slot=0,
                 n_lane_ops=0, n_members=None, emit_terminal=False):
    """Shared pallas_call wrapper: fn(s0 [K,S], Q [K,H,U], pvec, *ops) —
    with ``n_slot`` > 0, fn(s0, Q, pvec, pslot [n_slot, K], *ops).
    ``n_lane_ops`` marks the LAST n operands of the weight list as
    per-LANE arrays ``[rows, K]`` (sliced per tile like pslot) instead of
    whole-array resident operands — used for per-session recurrent hidden
    columns in the batched (columns) recurrent kernel.
    ``n_members`` (ensemble form): every weight operand has a leading
    member axis; tile i fetches member block ``i // tiles_per_member``.
    ``emit_terminal``: second output, the terminal states ``x_H [K, S]``
    (for a learned terminal value evaluated outside the kernel)."""

    @jax.jit
    def run(s0: jnp.ndarray, Q: jnp.ndarray, pvec: jnp.ndarray,
            *rest: jnp.ndarray) -> jnp.ndarray:
        K = s0.shape[0]
        assert K % tile_k == 0, f"K={K} not divisible by tile_k={tile_k}"
        if n_slot:
            pslot, weights = rest[0], rest[1:]
            slot_ops = (pslot,)
            slot_specs = [
                pl.BlockSpec((n_slot, tile_k), lambda i, pv: (0, i),
                             memory_space=pltpu.VMEM)
            ]
        else:
            weights, slot_ops, slot_specs = rest, (), []
        assert len(weights) == n_w, (len(weights), n_w)
        n_tiles = K // tile_k
        if n_members:
            assert K % n_members == 0 and (K // n_members) % tile_k == 0, (
                f"ensemble kernel needs (K/E) % tile == 0; K={K}, "
                f"E={n_members}, tile={tile_k}")
        tpm = (K // n_members) // tile_k if n_members else 0
        s0_t = s0.T                        # [S, K]
        q_t = jnp.transpose(Q, (1, 2, 0))  # [H, U, K]

        w_specs = []
        for idx, w in enumerate(weights):
            if idx >= n_w - n_lane_ops:         # per-lane [rows, K]
                assert w.shape[1] == K, (w.shape, K)
                w_specs.append(pl.BlockSpec(
                    (w.shape[0], tile_k), lambda i, pv: (0, i),
                    memory_space=pltpu.VMEM,
                ))
            elif n_members:                     # member block per tile
                assert w.shape[0] == n_members, (w.shape, n_members)
                w_specs.append(pl.BlockSpec(
                    (1,) + w.shape[1:],
                    (lambda i, pv, _nd=w.ndim: (i // tpm,) + (0,) * (_nd - 1)),
                    memory_space=pltpu.VMEM,
                ))
            else:
                w_specs.append(pl.BlockSpec(
                    w.shape, (lambda i, pv, _nd=w.ndim: (0,) * _nd),
                    memory_space=pltpu.VMEM,
                ))
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((S, tile_k), lambda i, pv: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, U, tile_k), lambda i, pv: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ] + slot_specs + w_specs,
            out_specs=[
                pl.BlockSpec((1, tile_k), lambda i, pv: (0, i),
                             memory_space=pltpu.VMEM),
            ] + ([
                pl.BlockSpec((S, tile_k), lambda i, pv: (0, i),
                             memory_space=pltpu.VMEM),
            ] if emit_terminal else []),
        )
        out_shape = [jax.ShapeDtypeStruct((1, K), jnp.float32)]
        if emit_terminal:
            out_shape.append(jax.ShapeDtypeStruct((S, K), jnp.float32))
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid_spec=gs,
            interpret=interpret,
        )(pvec, s0_t, q_t, *slot_ops, *weights)
        if emit_terminal:
            return out[0][0], out[1].T
        return out[0][0]

    return run


def build_residual_cost_rollout_kernel(
    derivs_soa: Callable,
    stage_cost_soa: Callable,
    terminal_cost_soa: Callable,
    num_states: int,
    num_controls: int,
    horizon: int,
    dt: float,
    param_keys: Sequence[str],
    n_layers: int,
    integrator: str = "rk4",
    intermediate_steps: int = 1,
    activation: Callable = jnp.tanh,
    tile_k: int = DEFAULT_NEURAL_TILE_K,
    interpret: bool = False,
    slot_keys: Sequence[str] = (),
    emit_terminal: bool = False,
):
    """Fused rollout+cost for the RESIDUAL predictor ('ODE+res',
    models/residual_predictor.py): ``x' = ode_step(x, u) + mlp([x, u])``.

    The analytic base's scalar constants ride in the SMEM pvec exactly like
    the pure-ODE kernel (ops/pallas_rollout.py); the residual MLP weights
    are resident VMEM operands (flatten_mlp_weights order, no norm
    entries), so every online-sysid install (models/online_sysid.py) flows
    in without recompiling — the adaptive-MPC hot path stays compiled.
    """
    from control_toolkit_tpu.ops.soa_integrators import make_soa_stepper

    S, U, H = num_states, num_controls, horizon
    n_w = 2 * n_layers
    slot_keys = tuple(slot_keys)
    n_slot = len(slot_keys)
    shared_keys = [k for k in param_keys if k not in slot_keys]
    one_step_ode = make_soa_stepper(derivs_soa, integrator, dt,
                                    intermediate_steps)

    def kernel(pvec_ref, s0_ref, q_ref, *rest):
        if n_slot:
            pslot_ref, rest = rest[0], rest[1:]
        w_refs = rest[:n_w]
        cost_ref = rest[n_w]
        xterm_ref = rest[n_w + 1] if emit_terminal else None
        p = {k: pvec_ref[i] for i, k in enumerate(shared_keys)}
        for i, k in enumerate(slot_keys):
            p[k] = pslot_ref[i : i + 1, :]
        ws = [r[:] for r in w_refs]

        xs = tuple(s0_ref[i : i + 1, :] for i in range(S))
        prev_us = tuple(
            p[f"__u_prev_{j}"] if f"__u_prev_{j}" in slot_keys
            else jnp.full((1, tile_k), p[f"__u_prev_{j}"]) for j in range(U)
        )
        acc = jnp.zeros((1, tile_k), jnp.float32)

        def res_step(xs, us):
            xb = one_step_ode(xs, us, p)
            a = mlp_rows(ws, jnp.concatenate(xs + us, axis=0), n_layers,
                         activation)
            return tuple(xb[i] + a[i : i + 1, :] for i in range(S))

        def body(h, carry):
            xs, prev_us, acc = carry
            u_slab = q_ref[h]
            us = tuple(u_slab[j : j + 1, :] for j in range(U))
            acc = acc + stage_cost_soa(xs, us, prev_us, p)
            xs = res_step(xs, us)
            return xs, us, acc

        xs, _, acc = jax.lax.fori_loop(0, H, body, (xs, prev_us, acc))
        cost_ref[0:1, :] = (acc + terminal_cost_soa(xs, p)) / (H + 1)
        if emit_terminal:
            for i in range(S):
                xterm_ref[i : i + 1, :] = xs[i]

    return _make_runner(kernel, S, U, H, n_w, tile_k, interpret, n_slot,
                        emit_terminal=emit_terminal)


# ----------------------------------------------------- recurrent dynamics
def flatten_rnn_weights(net: Dict, hidden) -> List[jnp.ndarray]:
    """Operand list for the recurrent kernel: per cell (wi^T, bi, wh^T, bh),
    then (wo^T, bo), then the CURRENT per-layer hidden state as columns.
    The hidden operands are the live batch-1 hidden (advanced host-side by
    predictor.update each tick) — operands, not trace-time constants, so the
    recurrence sees the real state without recompiling."""
    ops: List[jnp.ndarray] = []
    n_cells = sum(1 for k in net if k.startswith("cell"))
    for i in range(n_cells):
        c = net[f"cell{i}"]
        ops.append(jnp.asarray(c["wi"], jnp.float32).T)
        ops.append(jnp.reshape(jnp.asarray(c["bi"], jnp.float32), (-1, 1)))
        ops.append(jnp.asarray(c["wh"], jnp.float32).T)
        ops.append(jnp.reshape(jnp.asarray(c["bh"], jnp.float32), (-1, 1)))
    ops.append(jnp.asarray(net["wo"], jnp.float32).T)
    ops.append(jnp.reshape(jnp.asarray(net["bo"], jnp.float32), (-1, 1)))
    for h in hidden:  # per-layer [1, Hd] (GRU) or [1, 2Hd] (LSTM)
        ops.append(jnp.reshape(jnp.asarray(h, jnp.float32), (-1, 1)))
    return ops


def build_recurrent_cost_rollout_kernel(
    stage_cost_soa: Callable,
    terminal_cost_soa: Callable,
    num_states: int,
    num_controls: int,
    horizon: int,
    param_keys: Sequence[str],
    hiddens: Sequence[int],     # per-layer hidden sizes
    kind: str,                  # "gru" | "lstm"
    predict_delta: bool = True,
    tile_k: int = DEFAULT_NEURAL_TILE_K,
    interpret: bool = False,
    slot_keys: Sequence[str] = (),
    hidden_per_lane: bool = False,
    emit_terminal: bool = False,
):
    """Fused rollout+cost for stacked GRU/LSTM next-state models.

    Semantics match NeuralPredictor.rollout's recurrent branch
    (models/neural_predictor.py): per horizon step the [x,u] input runs
    through the stacked cells, the output head produces the delta (or
    absolute) next state, and the per-layer hidden state — initialized from
    the predictor's live batch-1 hidden, broadcast across the tile — stays
    entirely in VMEM registers across the horizon loop.  The XLA scan path
    round-trips [K, 3H] gate tensors through HBM every step; here only Q in
    and cost out touch HBM.

    ``slot_keys`` + ``hidden_per_lane`` switch to the batched-session
    ("columns") form: per-session attrs/u_prev arrive as a per-lane
    ``pslot [n_slot, K]`` operand after Q (cf. the MLP kernel), and the
    per-layer hidden operands become per-LANE arrays ``[Hd(|2Hd), K]`` —
    each lane column carries ITS session's live hidden instead of the
    shared batch-1 broadcast, so B sessions with independent RNN states
    pack into one launch.
    """
    S, U, H = num_states, num_controls, horizon
    n_cells = len(hiddens)
    if kind not in ("gru", "lstm"):
        raise ValueError(f"kind must be gru|lstm, got {kind!r}")
    n_w = 4 * n_cells + 2 + n_cells  # cell mats + head + hidden columns
    slot_keys = tuple(slot_keys)
    n_slot = len(slot_keys)
    shared_keys = [k for k in param_keys if k not in slot_keys]

    def kernel(pvec_ref, s0_ref, q_ref, *rest):
        if n_slot:
            pslot_ref, rest = rest[0], rest[1:]
        w_refs = rest[:n_w]
        cost_ref = rest[n_w]
        xterm_ref = rest[n_w + 1] if emit_terminal else None
        p = {k: pvec_ref[i] for i, k in enumerate(shared_keys)}
        for i, k in enumerate(slot_keys):
            p[k] = pslot_ref[i : i + 1, :]                    # [1, T] row

        head_wo = w_refs[4 * n_cells][:]       # [S, d_last]
        head_bo = w_refs[4 * n_cells + 1][:]   # [S, 1]
        h0_refs = w_refs[4 * n_cells + 2:]

        xs = tuple(s0_ref[i : i + 1, :] for i in range(S))
        prev_us = tuple(
            p[f"__u_prev_{j}"] if f"__u_prev_{j}" in slot_keys
            else jnp.full((1, tile_k), p[f"__u_prev_{j}"]) for j in range(U)
        )
        if hidden_per_lane:
            # Each lane already carries its session's hidden columns.
            hs = tuple(h0_refs[i][:, :] for i in range(n_cells))
        else:
            # Broadcast the batch-1 hidden columns across the tile.
            hs = tuple(
                jnp.broadcast_to(h0_refs[i][:], (h0_refs[i].shape[0], tile_k))
                for i in range(n_cells)
            )
        acc = jnp.zeros((1, tile_k), jnp.float32)

        def cell(i, inp, state):
            wi = w_refs[4 * i][:]       # [G*Hd, in]
            bi = w_refs[4 * i + 1][:]   # [G*Hd, 1]
            wh = w_refs[4 * i + 2][:]   # [G*Hd, Hd]
            bh = w_refs[4 * i + 3][:]   # [G*Hd, 1]
            Hd = hiddens[i]
            if kind == "gru":
                h = state
                gi = jax.lax.dot_general(
                    wi, inp, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) + bi
                gh = jax.lax.dot_general(
                    wh, h, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) + bh
                r = jax.nn.sigmoid(gi[:Hd] + gh[:Hd])
                z = jax.nn.sigmoid(gi[Hd:2 * Hd] + gh[Hd:2 * Hd])
                n = jnp.tanh(gi[2 * Hd:] + r * gh[2 * Hd:])
                h_new = (1.0 - z) * n + z * h
                return h_new, h_new
            else:
                h, c = state[:Hd], state[Hd:]
                g = (
                    jax.lax.dot_general(
                        wi, inp, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) + bi
                    + jax.lax.dot_general(
                        wh, h, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) + bh
                )
                i_g = jax.nn.sigmoid(g[:Hd])
                f_g = jax.nn.sigmoid(g[Hd:2 * Hd])
                g_g = jnp.tanh(g[2 * Hd:3 * Hd])
                o_g = jax.nn.sigmoid(g[3 * Hd:])
                c_new = f_g * c + i_g * g_g
                h_new = o_g * jnp.tanh(c_new)
                return h_new, jnp.concatenate([h_new, c_new], axis=0)

        def body(h, carry):
            xs, hs, prev_us, acc = carry
            u_slab = q_ref[h]
            us = tuple(u_slab[j : j + 1, :] for j in range(U))
            acc = acc + stage_cost_soa(xs, us, prev_us, p)

            inp = jnp.concatenate(xs + us, axis=0)   # [S+U, T]
            new_hs = []
            for i in range(n_cells):
                inp, st = cell(i, inp, hs[i])
                new_hs.append(st)
            out = jax.lax.dot_general(
                head_wo, inp, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + head_bo
            if predict_delta:
                xs = tuple(xs[i] + out[i : i + 1, :] for i in range(S))
            else:
                xs = tuple(out[i : i + 1, :] for i in range(S))
            return xs, tuple(new_hs), us, acc

        xs, _, _, acc = jax.lax.fori_loop(
            0, H, body, (xs, hs, prev_us, acc)
        )
        cost_ref[0:1, :] = (acc + terminal_cost_soa(xs, p)) / (H + 1)
        if emit_terminal:
            for i in range(S):
                xterm_ref[i : i + 1, :] = xs[i]

    return _make_runner(
        kernel, S, U, H, n_w, tile_k, interpret, n_slot,
        n_lane_ops=n_cells if hidden_per_lane else 0,
        emit_terminal=emit_terminal,
    )


# ----------------------------------------------------- sparse-GP dynamics
def gp_tile_for(K: int, n_shard_devices: int = 1, num_inducing: int = 128) -> int:
    """Tile for the GP kernel: like ``neural_tile_for`` but capped so the
    [M, tile] kernel-block intermediates (g, d2, k) stay ~4 MB each in
    VMEM.  Returns 0 if no eligible tile divides the per-device shard."""
    tile = DEFAULT_NEURAL_TILE_K
    while tile > _MIN_NEURAL_TILE_K and num_inducing * tile * 4 > (4 << 20):
        tile //= 2
    if num_inducing * tile * 4 > (4 << 20):
        # Even the floor tile blows the VMEM budget (large inducing sets):
        # reject so the gate keeps the XLA scan path instead of engaging a
        # kernel whose Mosaic compile would fail — same final check as
        # gp_grad_tile_for / gp_grad_tile_dividing (ops/pallas_grad.py).
        return 0
    per_dev = K // max(1, n_shard_devices)
    while tile >= _MIN_NEURAL_TILE_K:
        if per_dev % tile == 0 and K % (tile * max(1, n_shard_devices)) == 0:
            return tile
        tile //= 2
    return 0


GP_N_OPERANDS = 8


def flatten_gp_weights(gp: Dict) -> List[jnp.ndarray]:
    """Operand list for the GP kernel, precomputed host-side from the
    GPPredictor params (models/gp_predictor.py fit_gp_dynamics):

    [Zs [M,D] (inducing inputs / lengthscales), zn2 [M,1] (row norms of Zs),
     alphaT [S,M], in_mean [D,1], inv_in [D,1] (1/(in_std*lengthscales)),
     out_mean [S,1], out_std [S,1], var [1,1]]

    The normalization and lengthscale divides collapse into one affine
    input transform: an = (raw - in_mean) * inv_in == ((raw-mean)/std)/ls,
    exactly GPPredictor.single_step composed with _rbf."""
    ls = jnp.asarray(gp["lengthscales"], jnp.float32)
    Zs = jnp.asarray(gp["Z"], jnp.float32) / ls
    zn2 = jnp.sum(Zs * Zs, axis=1, keepdims=True)
    alphaT = jnp.asarray(gp["alpha"], jnp.float32).T
    in_mean = jnp.reshape(jnp.asarray(gp["in_mean"], jnp.float32), (-1, 1))
    inv_in = jnp.reshape(
        1.0 / (jnp.asarray(gp["in_std"], jnp.float32) * ls), (-1, 1))
    out_mean = jnp.reshape(jnp.asarray(gp["out_mean"], jnp.float32), (-1, 1))
    out_std = jnp.reshape(jnp.asarray(gp["out_std"], jnp.float32), (-1, 1))
    var = jnp.reshape(jnp.asarray(gp["variance"], jnp.float32), (1, 1))
    return [Zs, zn2, alphaT, in_mean, inv_in, out_mean, out_std, var]


def build_gp_cost_rollout_kernel(
    stage_cost_soa: Callable,
    terminal_cost_soa: Callable,
    num_states: int,
    num_controls: int,
    horizon: int,
    param_keys: Sequence[str],
    tile_k: int = DEFAULT_NEURAL_TILE_K,
    interpret: bool = False,
    slot_keys: Sequence[str] = (),
    emit_terminal: bool = False,
):
    """Fused rollout+cost for sparse-GP dynamics ``x' = x + GP([x,u])``.

    Semantics match GPPredictor.single_step (models/gp_predictor.py): per
    horizon step the kernel block k(x, Z) = var*exp(-0.5*d2) is computed as
    two MXU matmuls ([M,D]@[D,T] distances, [S,M]@[M,T] posterior mean)
    with the exp on the VPU — all [M,T] intermediates stay in VMEM.  The
    XLA scan path materializes the [K,M] kernel block (and the exp input)
    in HBM every horizon step, which is the dominant cost at K>=262k.

    ``slot_keys`` switches to the batched-session ("columns") form exactly
    like the MLP kernel.
    """
    S, U, H = num_states, num_controls, horizon
    n_w = GP_N_OPERANDS
    slot_keys = tuple(slot_keys)
    n_slot = len(slot_keys)
    shared_keys = [k for k in param_keys if k not in slot_keys]

    def kernel(pvec_ref, s0_ref, q_ref, *rest):
        if n_slot:
            pslot_ref, rest = rest[0], rest[1:]
        w_refs = rest[:n_w]
        cost_ref = rest[n_w]
        xterm_ref = rest[n_w + 1] if emit_terminal else None
        Zs, zn2, alphaT, in_mean, inv_in, out_mean, out_std, var = (
            r[:] for r in w_refs)
        var_s = var[0, 0]
        p = {k: pvec_ref[i] for i, k in enumerate(shared_keys)}
        for i, k in enumerate(slot_keys):
            p[k] = pslot_ref[i : i + 1, :]

        xs = tuple(s0_ref[i : i + 1, :] for i in range(S))
        prev_us = tuple(
            p[f"__u_prev_{j}"] if f"__u_prev_{j}" in slot_keys
            else jnp.full((1, tile_k), p[f"__u_prev_{j}"]) for j in range(U)
        )
        acc = jnp.zeros((1, tile_k), jnp.float32)

        def gp_step(xs, us):
            a = jnp.concatenate(xs + us, axis=0)           # [D, T]
            an = (a - in_mean) * inv_in
            g = jax.lax.dot_general(
                Zs, an, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [M, T]
            an2 = jnp.sum(an * an, axis=0, keepdims=True)  # [1, T]
            d2 = jnp.maximum(an2 - 2.0 * g + zn2, 0.0)
            kmat = var_s * jnp.exp(-0.5 * d2)              # [M, T]
            delta = jax.lax.dot_general(
                alphaT, kmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * out_std + out_mean
            return tuple(xs[i] + delta[i : i + 1, :] for i in range(S))

        def body(h, carry):
            xs, prev_us, acc = carry
            u_slab = q_ref[h]
            us = tuple(u_slab[j : j + 1, :] for j in range(U))
            acc = acc + stage_cost_soa(xs, us, prev_us, p)
            xs = gp_step(xs, us)
            return xs, us, acc

        xs, _, acc = jax.lax.fori_loop(0, H, body, (xs, prev_us, acc))
        cost_ref[0:1, :] = (acc + terminal_cost_soa(xs, p)) / (H + 1)
        if emit_terminal:
            for i in range(S):
                xterm_ref[i : i + 1, :] = xs[i]

    return _make_runner(kernel, S, U, H, n_w, tile_k, interpret, n_slot,
                        emit_terminal=emit_terminal)
