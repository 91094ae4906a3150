"""MPPI — Model Predictive Path Integral optimizer.

Capability parity with the reference optimizer_mppi
(/root/reference/Optimizers/optimizer_mppi.py:13-231), Williams et al. 2017:

* perturbations sampled at inducing points with stdev ``SQRTRHOINV/sqrt(dt)``
  then linearly interpolated to the horizon (reference :170-179),
* nominal plan shifted one step each tick before perturbation (:184),
* MPPI correction cost ``cc_weight*(0.5*(1-1/NU)*R*du^2 + R*u*du + 0.5*R*u^2)``
  summed over horizon and inputs (:154-155),
* reward-weighted average with softmax ``exp(-(S-min S)/LBD)`` (:163-168),
* optional single-trajectory replay of the optimal plan (:199-202).

TPU-native redesign: the entire step — sample, interpolate (MXU matmul),
scan rollout, cost, softmax reduction, nominal update — is ONE jitted pure
function over an explicit state pytree.  The cross-K reductions (min, sum)
become ``psum``-style collectives automatically when the state is sharded
over a device mesh.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.ops.interpolation import Interpolator
from control_toolkit_tpu.optimizers.base import Optimizer, split_slot_keys
from control_toolkit_tpu.utils import registry


class MPPIState(NamedTuple):
    key: jax.Array
    u_nom: jax.Array   # [1, H, U] nominal plan
    u_prev: jax.Array  # [U] last applied control


def make_correction_cost(cc_weight: float, R: float, NU: float):
    """MPPI-specific control-cost term (reference optimizer_mppi.py:154-155);
    shared with the mppi-var variant."""
    def correction_cost(u, delta_u):
        return jnp.sum(
            cc_weight
            * (0.5 * (1.0 - 1.0 / NU) * R * delta_u**2
               + R * u * delta_u + 0.5 * R * u**2),
            axis=(1, 2),
        )
    return correction_cost


def make_weight_fn(weighting: str, LBD: float):
    """Rollout-averaging weights ``w(costs, axes)`` for the MPPI update.

    ``weighting`` selects how trajectory costs map to averaging weights
    over the population ``axes`` (other axes are independent sessions):

    * ``"softmax"`` — the reference rule ``exp(-(S - min S)/LBD)``
      (optimizer_mppi.py:163-168).  Temperature LBD must scale with the
      stage-cost magnitude (docs/TUNING.md).
    * ``"rank"`` / ``"rank:<frac>"`` — temperature-free truncated
      log-rank weights (the CMA-ES recombination shape): the best
      ``h = ceil(frac*K)`` rollouts get ``ln(h+0.5) - ln(rank+1)``, the
      rest zero (frac defaults to 0.5).  Invariant to any monotone
      rescaling of the cost, so it needs no LBD tuning and cannot hit
      the softmax collapse/near-uniform regimes.  (On acrobot it is the
      best MPPI-family config found but does NOT rescue the family —
      the additive-perturbation structure is the limit; EVAL.md.)
    * ``"topk"`` / ``"topk:<frac>"`` — reference softmax truncated to
      the best ``ceil(frac*K)`` rollouts (frac defaults to 0.1): keeps
      temperature shaping among the elites but stops the long tail of
      near-uniform weights from cancelling the update.

    Weights are unnormalized; callers divide by their sum.  Rank/top-k
    cost two [N] argsorts per update in XLA — negligible next to the
    rollouts, and outside the Pallas kernels (the semi-fused kernels
    return per-rollout costs; only the fully-fused MPPI kernel bakes the
    softmax in, so it gates on ``weighting == "softmax"``).
    """
    parts = weighting.split(":")
    mode = parts[0]
    if mode not in ("softmax", "rank", "topk"):
        raise ValueError(
            f"unknown MPPI weighting {weighting!r} "
            "(softmax | rank[:frac] | topk[:frac])"
        )
    if mode == "softmax" and len(parts) > 1:
        raise ValueError(
            f"softmax weighting takes no fraction: {weighting!r} "
            "(did you mean rank:<frac> or topk:<frac>?)"
        )
    frac = float(parts[1]) if len(parts) > 1 else (0.5 if mode == "rank"
                                                   else 0.1)
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"weighting fraction must be in (0, 1]: {weighting!r}")

    def weights(S, axes):
        axes = tuple(a % S.ndim for a in axes)
        if mode == "softmax":
            rho = jnp.min(S, axis=axes, keepdims=True)
            return jnp.exp(-(S - rho) * (1.0 / LBD))
        rest = [a for a in range(S.ndim) if a not in axes]
        perm = rest + list(axes)
        St = jnp.transpose(S, perm)
        shp = St.shape
        flat = St.reshape(shp[: len(rest)] + (-1,))
        n = flat.shape[-1]
        h = max(1, int(np.ceil(frac * n)))
        order = jnp.argsort(flat, axis=-1)
        ranks = jnp.argsort(order, axis=-1)
        if mode == "rank":
            w = jnp.maximum(
                np.log(h + 0.5)
                - jnp.log(ranks.astype(jnp.float32) + 1.0),
                0.0,
            )
        else:  # topk: truncated softmax
            rho = jnp.min(flat, axis=-1, keepdims=True)
            w = jnp.where(
                ranks < h, jnp.exp(-(flat - rho) * (1.0 / LBD)), 0.0
            )
        w = w.reshape(shp)
        inv = np.argsort(perm)
        return jnp.transpose(w, inv)

    return weights


def make_semi_fused_update(cost_kernel, pack, W_mat, LBD, low, high,
                           ROWS, T, C, P, U,
                           post=None, cost_params=None, horizon=None,
                           weighting="softmax"):
    """The semi-fused MPPI nominal update shared by MPPI and mppi-var:
    run the fused interp+rollout+cost kernel on tile-layout perturbations,
    softmax-weight them, average at the INDUCING points (linearity of
    interpolation), interpolate once, clip.  Returns (u_nom_new, costs2d).

    One definition on purpose: mppi-var's semi-fused path differs only in
    how eps is scaled (per-input sigma) and in its extra adaptation step —
    the update body itself must never be able to drift between the two
    optimizers (see ops/pallas_mppi.py for the layout algebra).

    ``post`` (with ``cost_params``/``horizon``): the cost's post-terminal
    hook (learned value terminal, costs/base.py) — the kernel must then be
    built with ``emit_terminal=True`` so it also returns the terminal
    states, and ``post(x_H)/(H+1)`` joins costs2d BEFORE the softmax."""
    weight_fn = make_weight_fn(weighting, LBD)

    def update(s, u_nom, u_prev, params, eps):
        pvec = pack(params, u_prev)
        if post is None:
            costs2d = cost_kernel(s[0], u_nom[0], pvec, eps)  # [R, T*C]
        else:
            costs2d, xterm = cost_kernel(s[0], u_nom[0], pvec, eps)
            x = jnp.moveaxis(xterm, 0, -1)                    # [R, T*C, S]
            costs2d = costs2d + post(x, cost_params(params)) / (horizon + 1)
        w = weight_fn(costs2d, (0, 1))
        a = jnp.sum(w)
        # Weighted average over inducing points, then interpolate:
        # sum_k w_k (W eps_k) == W (sum_k w_k eps_k).
        w3 = w.reshape(ROWS, T, C)
        eps5 = eps.reshape(T, U, P, ROWS, C)
        ws = jnp.einsum("rtc,tuprc->up", w3, eps5) / a       # [U, P]
        b = jnp.einsum("ph,up->hu", W_mat, ws)               # [H, U]
        return jnp.clip(u_nom + b[None], low, high), costs2d
    return update


def make_reward_weighted_average(LBD: float, weighting: str = "softmax"):
    """Softmax over the K rollouts (reference :163-168), or the rank /
    top-k variants (``make_weight_fn``).  With K sharded over a mesh the
    softmax reductions lower to ICI psums; rank/top-k add an argsort,
    which XLA lowers to a (heavier) sharded sort — still population-axis
    collective-friendly."""
    weight_fn = make_weight_fn(weighting, LBD)

    def reward_weighted_average(S, delta_u):
        w = weight_fn(S, (0,))
        a = jnp.sum(w, axis=0)
        return jnp.sum(w[:, None, None] * delta_u, axis=0) / a
    return reward_weighted_average


@registry.optimizers.register("mppi")
@registry.optimizers.register("mppi-optimize-tf")
class MPPIOptimizer(Optimizer):
    """MPPI, optionally with Adam refinement of the nominal plan.

    With ``optim_steps > 0`` this is the 'mppi-optimize' variant the
    reference documents in its optimizer config
    (Control_Toolkit_ASF_Template/config_optimizers.yml:63-79: mppi_LR,
    adam betas, gradmax_clip, optim_steps): after the softmax-weighted
    update, the nominal plan takes ``optim_steps`` Adam steps on the
    trajectory cost through the differentiable rollout.
    """

    def __init__(
        self,
        *,
        cc_weight: float = 1.0,
        R: float = 1.0,
        LBD: float = 100.0,
        NU: float = 1000.0,
        SQRTRHOINV: float = 0.03,
        period_interpolation_inducing_points: int = 10,
        fully_fused: bool = False,
        semi_fused: bool = True,
        bounded_update: bool = False,
        weighting: str = "softmax",
        optim_steps: int = 0,
        mppi_LR: float = 0.02,
        adam_beta_1: float = 0.9,
        adam_beta_2: float = 0.999,
        adam_epsilon: float = 1e-7,
        gradmax_clip: float = 1000.0,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.cc_weight = float(cc_weight)
        self.R = float(R)
        self.LBD = float(LBD)
        self.NU = float(NU)
        # Cost -> averaging-weight rule (make_weight_fn): reference
        # softmax, or temperature-free rank / truncated top-k — the
        # acrobot remedy (EVAL round-4 negative: softmax averaging
        # cancels on chaotic plants).  Validated eagerly so a typo fails
        # at construction, not at first step.
        self.weighting = str(weighting)
        make_weight_fn(self.weighting, float(LBD))
        self._SQRTRHOINV = float(SQRTRHOINV)
        self.period_interpolation_inducing_points = int(period_interpolation_inducing_points)
        # EXPERIMENTAL opt-in: entire MPPI update as two Pallas kernels with
        # in-kernel perturbation generation (ops/pallas_mppi.py).  Uses a
        # counter-based PRNG, so results are statistically (not bitwise)
        # equivalent to the modular path.  The default modular Pallas path
        # is the supported fast path.
        self.fully_fused = bool(fully_fused)
        # Default TPU fast path: jax.random noise at inducing points +
        # fused interpolation/rollout/cost kernel (ops/pallas_mppi.py
        # make_run.external).  Set False to fall back to the modular
        # XLA-interpolation + cost-kernel path.
        self.semi_fused = bool(semi_fused)
        # Reference MPPI adds the weighted average of the RAW perturbations
        # to the nominal (optimizer_mppi.py:163-168,184-190); when sampling
        # stdev is large relative to a tight/asymmetric action box, the
        # clipped tail's unbounded raw deltas bias the nominal toward the
        # near bound.  bounded_update instead sets the nominal to the
        # weighted average of the EXECUTED (clipped) controls — a convex
        # combination that stays strictly inside the box, replacing the
        # unbounded raw-tail drift with a bias bounded by the sampling
        # spread.  Opt-in because it departs from reference semantics, and
        # it forces the scan path (interpolation linearity no longer
        # applies).
        self.bounded_update = bool(bounded_update)
        self.optim_steps = int(optim_steps)
        self.mppi_LR = float(mppi_LR)
        self.adam_beta_1 = float(adam_beta_1)
        self.adam_beta_2 = float(adam_beta_2)
        self.adam_epsilon = float(adam_epsilon)
        self.gradmax_clip = float(gradmax_clip)

    def configure(self, num_states, num_control_inputs, dt=None, **kwargs):
        if dt is None:
            raise ValueError("MPPI requires dt (mpc_timestep)")
        # Same scaling as reference: SQRTRHODTINV = SQRTRHOINV / sqrt(dt).
        self.SQRTRHODTINV = self._SQRTRHOINV / float(np.sqrt(dt))
        self.interp = Interpolator.build(
            self.mpc_horizon, self.period_interpolation_inducing_points
        )
        super().configure(num_states, num_control_inputs, dt=dt, **kwargs)

    def _init_state(self, key):
        # Nominal plan initialized at mid-range action (reference :227-231).
        u_mid = 0.5 * (self.action_low + self.action_high)
        u_nom = jnp.broadcast_to(
            u_mid, (1, self.mpc_horizon, self.num_control_inputs)
        ).astype(jnp.float32)
        return MPPIState(
            key=key,
            u_nom=u_nom,
            u_prev=jnp.zeros((self.num_control_inputs,), jnp.float32),
        )

    def _apply_policy_guess(self, state, plan):
        """Seed the nominal plan from a heuristic-policy rollout (base
        Optimizer ``initial_guess_policy``; _replace keeps the mppi-var
        subclass' extra stdev field intact)."""
        return state._replace(u_nom=plan[None].astype(state.u_nom.dtype))

    def _build_fused_mppi(self, interpret: bool = False, tile_k: int = None,
                          build_step: bool = True, slot_extra_keys=()):
        """Bind dynamics + cost into the fully-fused two-pass MPPI kernel.

        Returns ``(kernel_step, pack, make_run)``; ``build_step=False``
        skips constructing the two-pass kernel_step (the semi-fused path
        only needs ``make_run.external``).  Legacy 2-tuple unpacking still
        works because callers index positions 0/1.
        """
        import numpy as np

        from control_toolkit_tpu.ops.pallas_mppi import (
            DEFAULT_TILE_K, build_fused_mppi_step,
        )

        U = self.num_control_inputs
        param_keys, pack, derivs, stage_soa, terminal_soa, pred = (
            self._soa_bindings()
        )

        make_run = build_fused_mppi_step(
            derivs, stage_soa, terminal_soa,
            num_states=self.num_states, num_controls=U,
            horizon=self.mpc_horizon,
            num_inducing=self.interp.number_of_interpolation_inducing_points,
            interp_matrix=np.asarray(self.interp.matrix),
            dt=pred.dt, param_keys=param_keys,
            cc_weight=self.cc_weight, R=self.R, NU=self.NU, LBD=self.LBD,
            stdev=self.SQRTRHODTINV,
            action_low=self.action_low, action_high=self.action_high,
            integrator=pred.integrator,
            intermediate_steps=pred.intermediate_steps,
            tile_k=tile_k or DEFAULT_TILE_K,
            interpret=interpret,
            fast_sampling=bool(getattr(pred, "fast_math", False)),
            slot_extra_keys=slot_extra_keys,
        )
        self._last_fused_make_run = make_run  # kept for test convenience
        kernel_step = None
        if build_step:
            if self._mesh is not None:
                # Population splits over the mesh; global-tile-keyed noise
                # makes the sharded step bitwise equal to single-device.
                kernel_step = make_run(
                    self.num_rollouts, mesh=self._mesh, axis=self._shard_axes
                )
            else:
                kernel_step = make_run(self.num_rollouts)

        return kernel_step, pack, make_run

    def _can_fully_fuse(self) -> bool:
        # The eligibility gate must use the SAME tile constant the fused
        # MPPI kernels are built with (pallas_mppi's, not pallas_rollout's
        # — they are independent knobs that merely happen to agree today).
        from control_toolkit_tpu.ops.pallas_mppi import DEFAULT_TILE_K

        return (
            self.fully_fused
            # The fused kernel implements only the softmax update; the
            # mppi-optimize Adam refinement (optim_steps > 0) needs the
            # modular path, otherwise the refinement would silently drop.
            and self.optim_steps == 0
            # The fused kernels implement reference raw-delta averaging
            # with the softmax baked in-body; rank/top-k weighting takes
            # the semi-fused path (costs come back to XLA anyway).
            and not self.bounded_update
            and self.weighting == "softmax"
            and not self.optimizer_logging
            and not self.calculate_optimal_trajectory
            and self._can_use_pallas()
            # The fully-fused kernels evaluate the cost entirely in-body
            # (no terminal-state output yet) — a post-terminal hook
            # (learned value terminal) keeps the semi-fused path, whose
            # kernel emits x_H for V evaluated outside.
            and self._post_terminal_fn() is None
            and self.num_rollouts % DEFAULT_TILE_K == 0
        )

    def _make_batched_semi_fused_step(self, num_slots: int,
                                      interpret: bool = False,
                                      tile_k: int = None,
                                      per_slot_dyn=(), per_slot_cost=()):
        """B-session semi-fused MPPI step for BatchedMPC (kernel path).

        All B sessions' rollouts pack into ONE columnwise kernel launch
        (ops/pallas_mppi.py make_run.cols): session b occupies lane columns
        [b*K/8, (b+1)*K/8) of the global tile order, its per-session
        context (initial state, shifted nominal, attrs, u_prev) rides as
        VMEM rows, and the softmax reduction + inducing-point weighted
        average run per session in XLA on the reshaped column blocks.
        Per-session PRNG streams are preserved: session b's perturbations
        are drawn from ITS MPPIState key, so results don't depend on B.

        Returns ``(step, update_from_eps)`` where ``step(states, s, dyn,
        cost, attrs) -> (u [B,U], states', costs [B,K])`` over the stacked
        (vmap-layout) MPPIState, and ``update_from_eps`` exposes the
        deterministic part for testing with injected noise."""
        from control_toolkit_tpu.models.residual_predictor import (
            ResidualPredictor,
        )
        from control_toolkit_tpu.ops.pallas_mppi import DEFAULT_TILE_K, ROWS

        if isinstance(getattr(self.predictor, "predictor", self.predictor),
                      ResidualPredictor):
            # _soa_bindings resolves the BASE dynamics for residual
            # predictors; this kernel would silently drop the MLP
            # correction. Residual sessions take _make_batched_residual_step.
            raise ValueError(
                "semi-fused batched MPPI covers SOA ODE models; residual "
                "('ODE+res') sessions take _make_batched_residual_step"
            )
        tile = tile_k or DEFAULT_TILE_K
        B, K = int(num_slots), self.num_rollouts
        H, U, S = self.mpc_horizon, self.num_control_inputs, self.num_states
        P = self.interp.number_of_interpolation_inducing_points
        if K % ROWS != 0 or (B * K) % tile != 0:
            raise ValueError(
                f"batched kernel path needs K % {ROWS} == 0 and "
                f"B*K % {tile} == 0; got B={B}, K={K}"
            )
        cps = K // ROWS            # lane columns per session
        T = (B * K) // tile        # tiles
        C = tile // ROWS           # columns per tile

        _, _, make_run = self._build_fused_mppi(
            build_step=False, interpret=interpret, tile_k=tile,
            slot_extra_keys=tuple(f"d_{k}" for k in per_slot_dyn)
            + tuple(f"c_{k}" for k in per_slot_cost),
        )
        # A learned value terminal keeps this kernel path: the columns
        # kernel emits the terminal states and V(x_H) is added per session
        # outside, under the same mean-over-(H+1) normalization as the
        # single-session emit_terminal path (_finalize_cost_kernel).
        post = self._post_terminal_fn()
        cost_cols = make_run.cols(B * K, emit_terminal=post is not None)
        shared_keys, slot_keys = make_run.shared_keys, make_run.slot_keys
        inv_h1 = 1.0 / (H + 1)
        W_mat = jnp.asarray(self.interp.matrix, jnp.float32)   # [P, H]
        low, high = self.action_low, self.action_high
        LBD, stdev = self.LBD, self.SQRTRHODTINV
        weight_fn = make_weight_fn(self.weighting, LBD)
        cf = getattr(self.cost_function, "cost_function", self.cost_function)
        from control_toolkit_tpu.optimizers.base import make_slot_packer

        pack_slots = make_slot_packer(
            shared_keys, slot_keys, getattr(cf, "attr_defaults", {}), B
        )

        def expand_cols(vals):      # [B, n] -> [T, n, C] per-column rows
            n = vals.shape[1]
            cols = jnp.repeat(vals, cps, axis=0)               # [B*cps, n]
            return cols.reshape(T, C, n).transpose(0, 2, 1)

        def update_from_eps(states, s, dyn, cost, attrs, eps):
            unom_b = jnp.concatenate(
                [states.u_nom[:, 0, 1:, :], states.u_nom[:, 0, -1:, :]],
                axis=1,
            )                                                   # [B, H, U]
            pvec, rows = pack_slots(states.u_prev, dyn, cost, attrs)
            pslot_cols = expand_cols(rows)                      # [T, n_sk, C]
            s0_cols = expand_cols(s[:, 0, :])                   # [T, S, C]
            unom_cols = expand_cols(
                unom_b.transpose(0, 2, 1).reshape(B, U * H)     # j*H + h order
            )
            if post is None:
                costs2d = cost_cols(pvec, s0_cols, unom_cols, pslot_cols, eps)
            else:
                costs2d, xterm = cost_cols(
                    pvec, s0_cols, unom_cols, pslot_cols, eps
                )
                # xterm [S, ROWS, B*cps] -> [B*K, S] in the same rollout
                # order as costs (k = r*cps + c within each session), V as
                # one XLA matmul chain, folded in BEFORE the softmax.
                x_flat = (
                    xterm.reshape(S, ROWS, B, cps)
                    .transpose(2, 1, 3, 0)
                    .reshape(B * K, S)
                )
                v = post(x_flat, {"cost": cost, "attrs": attrs}) * inv_h1
                costs2d = costs2d + (
                    v.reshape(B, ROWS, cps)
                    .transpose(1, 0, 2)
                    .reshape(ROWS, B * cps)
                )
            w3 = costs2d.reshape(ROWS, B, cps)
            w = weight_fn(w3, (0, 2))
            a = jnp.sum(w, axis=(0, 2))
            # Per-session weighted average at the inducing points, then one
            # interpolation (linearity — see make_semi_fused_update).
            eps7 = (
                eps.reshape(T, U, P, ROWS, C)
                .transpose(1, 2, 3, 0, 4)
                .reshape(U, P, ROWS, B, cps)
            )
            ws = jnp.einsum("rbc,uprbc->bup", w, eps7) / a[:, None, None]
            b_upd = jnp.einsum("ph,bup->bhu", W_mat, ws)
            u_nom_new = jnp.clip(unom_b + b_upd, low, high)     # [B, H, U]
            costs = w3.transpose(1, 0, 2).reshape(B, K)
            return u_nom_new, costs

        def step(states, s, dyn, cost, attrs):
            keys = jax.vmap(lambda k: jax.random.split(k))(states.key)
            new_keys, sample_keys = keys[:, 0], keys[:, 1]
            eps_slots = jax.vmap(
                lambda k: jax.random.normal(
                    k, (U, P * ROWS, cps), dtype=jnp.float32
                )
            )(sample_keys) * stdev                              # [B,U,PR,cps]
            eps = (
                eps_slots.transpose(1, 2, 0, 3)
                .reshape(U, P * ROWS, T, C)
                .transpose(2, 0, 1, 3)
            )                                                   # [T,U,PR,C]
            u_nom_new, costs = update_from_eps(states, s, dyn, cost, attrs, eps)
            u = u_nom_new[:, 0, :]
            new_states = MPPIState(
                key=new_keys, u_nom=u_nom_new[:, None], u_prev=u
            )
            return u, new_states, costs

        return step, update_from_eps

    def _make_batched_neural_step(self, num_slots: int,
                                  interpret: bool = False,
                                  tile_k: int = None):
        """B-session MPPI step over LEARNED (MLP) dynamics for BatchedMPC.

        All B sessions' rollouts evaluate through ONE columns-mode neural
        kernel launch (ops/pallas_neural.py, ``slot_keys``): s0 and Q are
        per-rollout operands already, so sessions pack by concatenation
        along K; per-session attrs and u_prev ride as a per-lane
        ``pslot [n_sk, B*K]`` VMEM operand; sampling, interpolation,
        correction cost and the per-session softmax update stay in XLA.
        Per-session PRNG streams are preserved (each session draws its
        modular-layout ``[K, P, U]`` noise from ITS MPPIState key), so a
        session's results don't depend on B.

        Returns ``(step, update_from_eps)`` as _make_batched_semi_fused_step
        does; ``update_from_eps(states, s, dyn, cost, attrs, delta_b)``
        takes injected inducing-point noise ``[B, K, P, U]`` for testing.
        """
        from control_toolkit_tpu.ops.pallas_neural import (
            build_neural_cost_rollout_kernel,
            flatten_mlp_weights,
            mlp_layer_count,
            neural_tile_for,
        )

        B, K = int(num_slots), self.num_rollouts
        H, U, S = self.mpc_horizon, self.num_control_inputs, self.num_states
        tk = tile_k or neural_tile_for(B * K)
        if tk == 0:
            raise ValueError(
                f"batched neural kernel needs a tile dividing B*K; "
                f"got B={B}, K={K}"
            )

        param_keys, _, _, stage_soa, terminal_soa, pred = self._soa_bindings(
            include_dyn=False
        )
        if pred.recurrent:
            raise NotImplementedError(
                "batched neural kernel covers MLP models; recurrent "
                "predictors are stateful and take the vmapped path"
            )
        shared_keys, slot_keys = split_slot_keys(param_keys)
        net = pred.net_params
        post = self._post_terminal_fn()
        kernel = build_neural_cost_rollout_kernel(
            stage_soa, terminal_soa,
            num_states=S, num_controls=U, horizon=H,
            param_keys=param_keys, n_layers=mlp_layer_count(net),
            predict_delta=pred.predict_delta,
            has_norm_in="norm_in_mean" in net,
            has_norm_out="norm_out_mean" in net,
            tile_k=tk, interpret=interpret, slot_keys=slot_keys,
            emit_terminal=post is not None,
        )
        return self._batched_columns_step_from_kernel(
            B, kernel, lambda dyn: flatten_mlp_weights(dyn["net"]),
            shared_keys, slot_keys, post=post,
        )

    def _make_batched_residual_step(self, num_slots: int,
                                    interpret: bool = False,
                                    tile_k: int = None,
                                    per_slot_dyn=(), per_slot_cost=()):
        """B-session MPPI step over the RESIDUAL ('ODE+res') predictor —
        the adaptive-MPC fleet form: one columns-mode residual kernel
        launch (ops/pallas_neural.build_residual_cost_rollout_kernel,
        ``slot_keys``) evaluates all B sessions' rollouts.  Base scalar
        constants ride the SMEM pvec, and ``per_slot_dyn`` moves chosen
        base constants to per-lane rows — each robot plans against ITS
        sysid'd plant; the residual MLP weights are shared VMEM operands
        (installs swap without recompiling)."""
        from control_toolkit_tpu.ops.pallas_neural import (
            build_residual_cost_rollout_kernel,
            flatten_mlp_weights,
            mlp_layer_count,
            neural_tile_for,
        )

        B, K = int(num_slots), self.num_rollouts
        H, U, S = self.mpc_horizon, self.num_control_inputs, self.num_states
        tk = tile_k or neural_tile_for(B * K)
        if tk == 0:
            raise ValueError(
                f"batched residual kernel needs a tile dividing B*K; "
                f"got B={B}, K={K}"
            )

        param_keys, _, derivs, stage_soa, terminal_soa, pred = (
            self._soa_bindings()
        )
        shared_keys, slot_keys = split_slot_keys(
            param_keys, per_slot_dyn, per_slot_cost
        )
        n_layers = mlp_layer_count(pred._res)
        post = self._post_terminal_fn()
        kernel = build_residual_cost_rollout_kernel(
            derivs, stage_soa, terminal_soa,
            num_states=S, num_controls=U, horizon=H, dt=pred.dt,
            param_keys=param_keys, n_layers=n_layers,
            integrator=pred.integrator,
            intermediate_steps=pred.intermediate_steps,
            tile_k=tk, interpret=interpret, slot_keys=slot_keys,
            emit_terminal=post is not None,
        )
        return self._batched_columns_step_from_kernel(
            B, kernel, lambda dyn: flatten_mlp_weights(dyn["res"]),
            shared_keys, slot_keys,
            dyn_leaves_fn=lambda dyn: dyn["base"], post=post,
        )

    def _make_batched_gp_step(self, num_slots: int,
                              interpret: bool = False,
                              tile_k: int = None):
        """B-session MPPI step over sparse-GP dynamics for BatchedMPC —
        the GP analogue of ``_make_batched_neural_step``: one columns-mode
        GP kernel launch (ops/pallas_neural.py
        build_gp_cost_rollout_kernel, ``slot_keys``) evaluates all B
        sessions' rollouts; the [B*K, M] RBF kernel blocks the XLA scan
        writes to HBM every horizon step stay in VMEM.  GP params are
        shared whole-array operands (a re-fit swaps in without
        recompiling)."""
        from control_toolkit_tpu.ops.pallas_neural import (
            build_gp_cost_rollout_kernel,
            flatten_gp_weights,
            gp_tile_for,
        )

        B, K = int(num_slots), self.num_rollouts
        H, U, S = self.mpc_horizon, self.num_control_inputs, self.num_states
        pred = getattr(self.predictor, "predictor", self.predictor)
        M = int(pred.gp_params["Z"].shape[0])
        tk = tile_k or gp_tile_for(B * K, 1, M)
        if tk == 0:
            raise ValueError(
                f"batched GP kernel needs a tile dividing B*K; "
                f"got B={B}, K={K}"
            )

        param_keys, _, _, stage_soa, terminal_soa, _ = self._soa_bindings(
            include_dyn=False
        )
        shared_keys, slot_keys = split_slot_keys(param_keys)
        post = self._post_terminal_fn()
        kernel = build_gp_cost_rollout_kernel(
            stage_soa, terminal_soa,
            num_states=S, num_controls=U, horizon=H,
            param_keys=param_keys,
            tile_k=tk, interpret=interpret, slot_keys=slot_keys,
            emit_terminal=post is not None,
        )
        return self._batched_columns_step_from_kernel(
            B, kernel, lambda dyn: flatten_gp_weights(dyn["gp"]),
            shared_keys, slot_keys, post=post,
        )

    def _batched_columns_step_from_kernel(self, B, kernel, weights_fn,
                                          shared_keys, slot_keys,
                                          dyn_leaves_fn=None, post=None):
        """Shared tail of the columns-mode batched MPPI steps: per-session
        sampling/interpolation/softmax in XLA around ONE packed kernel
        launch.  ``weights_fn(dyn)`` flattens the model-specific VMEM
        operand list (MLP layers / GP params); ``dyn_leaves_fn(dyn)``
        selects the scalar-leaf subtree the packer reads (the residual
        predictor's base constants — identity otherwise).  ``post``: a
        learned value terminal — the kernel was built with
        ``emit_terminal=True`` and V(x_H)/(H+1) joins the per-session
        costs BEFORE the softmax, as in the semi-fused columns path."""
        K = self.num_rollouts
        H, U = self.mpc_horizon, self.num_control_inputs
        P = self.interp.number_of_interpolation_inducing_points
        interp = self.interp
        low, high = self.action_low, self.action_high
        LBD, stdev = self.LBD, self.SQRTRHODTINV
        weight_fn = make_weight_fn(self.weighting, LBD)
        correction_cost = make_correction_cost(self.cc_weight, self.R, self.NU)
        cf = getattr(self.cost_function, "cost_function", self.cost_function)
        from control_toolkit_tpu.optimizers.base import make_slot_packer

        pack_slots = make_slot_packer(
            shared_keys, slot_keys, getattr(cf, "attr_defaults", {}), B, K
        )
        dyn_leaves_fn = dyn_leaves_fn or (lambda dyn: dyn)

        def update_from_eps(states, s, dyn, cost, attrs, delta_b):
            unom_b = jnp.concatenate(
                [states.u_nom[:, 0, 1:, :], states.u_nom[:, 0, -1:, :]],
                axis=1,
            )                                                   # [B, H, U]
            delta = interp.interpolate(
                delta_b.reshape(B * K, P, U)
            ).reshape(B, K, H, U)
            u_run = jnp.clip(unom_b[:, None] + delta, low, high)
            Q = u_run.reshape(B * K, H, U)
            s0 = jnp.repeat(s[:, 0, :], K, axis=0)              # [B*K, S]

            pvec, pslot = pack_slots(
                states.u_prev, dyn_leaves_fn(dyn), cost, attrs
            )

            if post is None:
                base = kernel(
                    s0, Q, pvec, pslot, *weights_fn(dyn)
                ).reshape(B, K)
            else:
                base, x_T = kernel(s0, Q, pvec, pslot, *weights_fn(dyn))
                base = (
                    base + post(x_T, {"cost": cost, "attrs": attrs})
                    * (1.0 / (H + 1))
                ).reshape(B, K)
            costs = base + jax.vmap(correction_cost)(u_run, delta)

            w = weight_fn(costs, (1,))
            a = jnp.sum(w, axis=1)
            upd = jnp.einsum("bk,bkhu->bhu", w, delta) / a[:, None, None]
            u_nom_new = jnp.clip(unom_b + upd, low, high)
            return u_nom_new, costs

        def step(states, s, dyn, cost, attrs):
            keys = jax.vmap(lambda k: jax.random.split(k))(states.key)
            new_keys, sample_keys = keys[:, 0], keys[:, 1]
            delta_b = jax.vmap(
                lambda k: jax.random.normal(k, (K, P, U), dtype=jnp.float32)
            )(sample_keys) * stdev                              # [B,K,P,U]
            u_nom_new, costs = update_from_eps(
                states, s, dyn, cost, attrs, delta_b
            )
            u = u_nom_new[:, 0, :]
            new_states = MPPIState(
                key=new_keys, u_nom=u_nom_new[:, None], u_prev=u
            )
            return u, new_states, costs

        return step, update_from_eps

    def _make_batched_recurrent_step(self, num_slots: int,
                                     interpret: bool = False,
                                     tile_k: int = None):
        """B-session MPPI step over RECURRENT (stacked GRU/LSTM) learned
        dynamics for BatchedMPC — the stateful analogue of
        ``_make_batched_neural_step``.

        All B sessions' rollouts evaluate through ONE columns-mode
        recurrent kernel launch (ops/pallas_neural.py ``slot_keys`` +
        ``hidden_per_lane``): each lane column carries ITS session's live
        per-layer hidden, so B sessions with independent RNN states pack
        into one launch; cell/head weights stay shared whole-array
        operands (sysid updates / checkpoint swaps never recompile).
        Sampling, interpolation, correction cost and the per-session
        softmax update stay in XLA; the hidden ADVANCE with the applied
        control remains the caller's batched ``rnn_apply``
        (BatchedMPC's stateful wrapper — reference predictor.update,
        optimizer_mppi.py:195-197).

        Returns ``(step, update_from_eps)`` with ``step(states, s [B,1,S],
        dyn, cost, attrs, hidden) -> (u [B,U], states', costs [B,K])``
        where ``hidden`` is the per-slot tuple of ``[B, 1, Hi]`` leaves.
        """
        from control_toolkit_tpu.ops.pallas_neural import (
            build_recurrent_cost_rollout_kernel,
            flatten_rnn_weights,
            neural_tile_for,
        )
        from control_toolkit_tpu.optimizers.base import make_slot_packer

        B, K = int(num_slots), self.num_rollouts
        H, U, S = self.mpc_horizon, self.num_control_inputs, self.num_states
        P = self.interp.number_of_interpolation_inducing_points
        tk = tile_k or neural_tile_for(B * K)
        if tk == 0:
            raise ValueError(
                f"batched recurrent kernel needs a tile dividing B*K; "
                f"got B={B}, K={K}"
            )

        param_keys, _, _, stage_soa, terminal_soa, pred = self._soa_bindings(
            include_dyn=False
        )
        if not pred.recurrent:
            raise ValueError(
                "batched recurrent step requires a recurrent (GRU/LSTM) "
                "NeuralPredictor; MLP models take _make_batched_neural_step"
            )
        shared_keys, slot_keys = split_slot_keys(param_keys)
        kernel = build_recurrent_cost_rollout_kernel(
            stage_soa, terminal_soa,
            num_states=S, num_controls=U, horizon=H,
            param_keys=param_keys, hiddens=tuple(pred.arch["hiddens"]),
            kind=pred.arch["kind"], predict_delta=pred.predict_delta,
            tile_k=tk, interpret=interpret,
            slot_keys=slot_keys, hidden_per_lane=True,
        )
        cf = getattr(self.cost_function, "cost_function", self.cost_function)
        pack_slots = make_slot_packer(
            shared_keys, slot_keys, getattr(cf, "attr_defaults", {}), B, K
        )

        interp = self.interp
        low, high = self.action_low, self.action_high
        LBD, stdev = self.LBD, self.SQRTRHODTINV
        weight_fn = make_weight_fn(self.weighting, LBD)
        correction_cost = make_correction_cost(self.cc_weight, self.R, self.NU)

        def weight_ops(net, hidden):
            # Shared cell/head operands, then the per-lane hidden columns:
            # [B, 1, Hi] -> each session's hidden repeated over its K lanes.
            ops = flatten_rnn_weights(net, ())
            for h in hidden:
                ops.append(jnp.repeat(h[:, 0, :], K, axis=0).T)  # [Hi, B*K]
            return ops

        def update_from_eps(states, s, dyn, cost, attrs, hidden, delta_b):
            unom_b = jnp.concatenate(
                [states.u_nom[:, 0, 1:, :], states.u_nom[:, 0, -1:, :]],
                axis=1,
            )                                                   # [B, H, U]
            delta = interp.interpolate(
                delta_b.reshape(B * K, P, U)
            ).reshape(B, K, H, U)
            u_run = jnp.clip(unom_b[:, None] + delta, low, high)
            Q = u_run.reshape(B * K, H, U)
            s0 = jnp.repeat(s[:, 0, :], K, axis=0)              # [B*K, S]
            pvec, pslot = pack_slots(states.u_prev, dyn, cost, attrs)
            base = kernel(
                s0, Q, pvec, pslot, *weight_ops(dyn["net"], hidden)
            ).reshape(B, K)
            costs = base + jax.vmap(correction_cost)(u_run, delta)

            w = weight_fn(costs, (1,))
            a = jnp.sum(w, axis=1)
            upd = jnp.einsum("bk,bkhu->bhu", w, delta) / a[:, None, None]
            u_nom_new = jnp.clip(unom_b + upd, low, high)
            return u_nom_new, costs

        def step(states, s, dyn, cost, attrs, hidden):
            keys = jax.vmap(lambda k: jax.random.split(k))(states.key)
            new_keys, sample_keys = keys[:, 0], keys[:, 1]
            delta_b = jax.vmap(
                lambda k: jax.random.normal(k, (K, P, U), dtype=jnp.float32)
            )(sample_keys) * stdev                              # [B,K,P,U]
            u_nom_new, costs = update_from_eps(
                states, s, dyn, cost, attrs, hidden, delta_b
            )
            u = u_nom_new[:, 0, :]
            new_states = MPPIState(
                key=new_keys, u_nom=u_nom_new[:, None], u_prev=u
            )
            return u, new_states, costs

        return step, update_from_eps

    def _make_step_fn(self):
        K, H, U = self.num_rollouts, self.mpc_horizon, self.num_control_inputs
        P = self.interp.number_of_interpolation_inducing_points
        low, high = self.action_low, self.action_high
        cc_weight, R, LBD, NU = self.cc_weight, self.R, self.LBD, self.NU
        stdev = self.SQRTRHODTINV
        interp = self.interp
        want_opt_traj = self.calculate_optimal_trajectory

        correction_cost = make_correction_cost(cc_weight, R, NU)
        reward_weighted_average = make_reward_weighted_average(
            LBD, self.weighting)

        # Fused path: skip trajectory materialization when nobody reads it
        # (logging off).  Saves the [K,H+1,S] HBM round trip per step.
        # On TPU with compatible models, the fused rollout+cost runs as a
        # Pallas kernel holding the integration state in VMEM.
        if self._can_fully_fuse():
            kernel_step, pack, _ = self._build_fused_mppi()

            def fused_step_fn(state: MPPIState, s, params):
                key, sub = jax.random.split(state.key)
                seed = jax.random.randint(sub, (1,), 0, 2**31 - 1, dtype=jnp.int32)
                u_nom = jnp.concatenate(
                    [state.u_nom[:, 1:, :], state.u_nom[:, -1:, :]], axis=1
                )[0]                                             # [H, U]
                pvec = pack(params, state.u_prev)
                u_nom_new, costs = kernel_step(s[0], u_nom, pvec, seed)
                u = u_nom_new[0, :]
                diag = {"u_nom": u_nom_new[None], "J_logged": costs}
                return u, MPPIState(key=key, u_nom=u_nom_new[None], u_prev=u), diag

            return fused_step_fn

        # Shared 'mppi-optimize' Adam refinement of the nominal plan
        # (optim_steps > 0), used by both the semi-fused and scan paths.
        def refine_nominal(u_nom, s, u_prev, params):
            from control_toolkit_tpu.ops.common import (
                adam_init, adam_update, clip_by_norm,
            )

            eval_nom = (
                self._fused_cost if self._can_fuse_rollout()
                else (lambda s_, Q_, up_, p_: self._rollout_and_cost(s_, Q_, up_, p_)[0])
            )

            def nom_cost(un):
                return jnp.sum(eval_nom(s[:1], un, u_prev, params))

            nom_grad = jax.grad(nom_cost)

            def refine(i, carry):
                un, ad = carry
                g = clip_by_norm(nom_grad(un), self.gradmax_clip, axes=(1, 2))
                ad, delta = adam_update(
                    ad, g, self.mppi_LR,
                    self.adam_beta_1, self.adam_beta_2, self.adam_epsilon,
                )
                return jnp.clip(un - delta, low, high), ad

            u_nom, _ = jax.lax.fori_loop(
                0, self.optim_steps, refine, (u_nom, adam_init(u_nom.shape))
            )
            return u_nom

        # Semi-fused path (TPU default): jax.random noise at the inducing
        # points (tile-layout draws — statistically, not bitwise, equal to
        # the modular path), interp+clip+rollout+cost fused in one kernel,
        # softmax average over the small inducing-point tensor in XLA
        # (linearity of interpolation).  See ops/pallas_mppi.py.
        from control_toolkit_tpu.ops.pallas_mppi import (
            DEFAULT_TILE_K, ROWS,
        )

        # _can_use_pallas checks divisibility against pallas_rollout's tile
        # constant; this path builds/tiles with pallas_mppi's.  They agree
        # today but are independent knobs (_can_fully_fuse documents the
        # same trap) — guard explicitly so a retune falls back to the scan
        # instead of crashing in make_run.external.
        semi_fused_tiles_ok = (
            self.num_rollouts
            % (DEFAULT_TILE_K * max(1, self._n_shard_devices())) == 0
        )
        if (self.semi_fused and not self.bounded_update
                and not self.optimizer_logging and self._can_use_pallas()
                and semi_fused_tiles_ok):

            _, pack, make_run = self._build_fused_mppi(build_step=False)
            # Learned value terminal: the kernel emits x_H and V joins the
            # costs before the softmax (make_semi_fused_update post hook).
            post = self._post_terminal_fn()
            if self._mesh is not None:
                cost_kernel = make_run.external(
                    K, mesh=self._mesh, axis=self._shard_axes,
                    emit_terminal=post is not None,
                )
            else:
                cost_kernel = make_run.external(
                    K, emit_terminal=post is not None
                )
            T = K // DEFAULT_TILE_K
            C = DEFAULT_TILE_K // ROWS
            W_mat = jnp.asarray(self.interp.matrix, jnp.float32)  # [P, H]
            sf_update = make_semi_fused_update(
                cost_kernel, pack, W_mat, LBD, low, high, ROWS, T, C, P, U,
                post=post, cost_params=self._cost_params,
                horizon=self.mpc_horizon, weighting=self.weighting,
            )

            def semi_fused_step_fn(state: MPPIState, s, params):
                key, sample_key = jax.random.split(state.key)
                u_nom = jnp.concatenate(
                    [state.u_nom[:, 1:, :], state.u_nom[:, -1:, :]], axis=1
                )
                eps = (
                    jax.random.normal(
                        sample_key, (T, U, P * ROWS, C), dtype=jnp.float32
                    ) * stdev
                )
                u_nom, costs2d = sf_update(s, u_nom, state.u_prev, params, eps)

                if self.optim_steps > 0:
                    u_nom = refine_nominal(u_nom, s, state.u_prev, params)

                u = u_nom[0, 0, :]
                diag = {"u_nom": u_nom, "J_logged": costs2d.reshape(-1)}
                if want_opt_traj:
                    diag["optimal_trajectory"] = self.predictor.rollout(
                        s[:1], u_nom, params["dyn"]
                    )
                return u, MPPIState(key=key, u_nom=u_nom, u_prev=u), diag

            return semi_fused_step_fn

        cost_only = None if self.optimizer_logging else self._make_cost_only()
        fuse = cost_only is not None

        def step_fn(state: MPPIState, s, params):
            key, sample_key = jax.random.split(state.key)
            s_tiled = jnp.tile(s[:1], (K, 1))

            # Shift nominal one step, repeating the tail (reference :184).
            u_nom = jnp.concatenate([state.u_nom[:, 1:, :], state.u_nom[:, -1:, :]], axis=1)

            delta_u = (
                jax.random.normal(sample_key, (K, P, U), dtype=jnp.float32) * stdev
            )
            delta_u = interp.interpolate(delta_u)

            u_run = jnp.clip(u_nom + delta_u, low, high)

            if fuse:
                base_cost = cost_only(s_tiled, u_run, state.u_prev, params)
                traj = None
            else:
                base_cost, traj = self._rollout_and_cost(
                    s_tiled, u_run, state.u_prev, params
                )
            traj_cost = base_cost + correction_cost(u_run, delta_u)

            if self.bounded_update:
                # Weighted average of the EXECUTED controls: a convex
                # combination of in-box candidates, so no clipping-tail bias
                # in either direction (see __init__ note).
                u_nom = reward_weighted_average(traj_cost, u_run)[None]
            else:
                u_nom = jnp.clip(
                    u_nom + reward_weighted_average(traj_cost, delta_u)[None],
                    low, high,
                )

            if self.optim_steps > 0:
                # 'mppi-optimize' refinement: Adam on the nominal plan
                # through the differentiable rollout (fresh moments each
                # tick — the refinement is a local polish of this tick's
                # plan, warm-started by the shifted nominal itself).
                u_nom = refine_nominal(u_nom, s, state.u_prev, params)

            u = u_nom[0, 0, :]

            diag = {"u_nom": u_nom}
            if not fuse:
                diag.update({
                    "Q_logged": u_run,
                    "J_logged": traj_cost,
                    "rollout_trajectories_logged": traj,
                })
            if want_opt_traj:
                diag["optimal_trajectory"] = self.predictor.rollout(
                    s[:1], u_nom, params["dyn"]
                )
            return u, MPPIState(key=key, u_nom=u_nom, u_prev=u), diag

        return step_fn
