"""Batched MPC: many independent control loops advanced by ONE jitted step.

The reference serves one controller per server process; here a single chip
serves B independent MPC sessions (robots, sim instances, clients) as one
vmapped pure step over a stacked state pytree — the TPU-native answer to
"production serving at scale".  Slots are fully independent: each has its
own PRNG stream (fold_in on the slot index), warm-start state and
environment attributes; a boolean mask freezes slots with no pending
request, so idle sessions keep their warm start exactly.

Eligible session kinds take COLUMNWISE batched kernels — one Pallas launch
for all B sessions per evaluation: semi-fused MPPI (rollout+cost),
MLP-predictor MPPI (neural kernel), and RPGD (gradient kernel, one fwd+bwd
launch per Adam iteration).  Everything else vmaps the per-slot step with
the optimizer built ``force_scan=True`` (pallas_call has no vmap batching
rule); the scan paths batch the B*K rollouts into single fused XLA ops.
CEM deliberately stays on the vmap path (measured neutral-to-worse
columnwise — docs/KERNELS.md negative result).  ``configure(mesh=...)``
shard_maps the slot axis over a device mesh with zero collectives
(sessions are independent), composing with the kernel paths.

Stateful (RNN) predictors are supported: each slot carries its own hidden
state (stacked ``[B, 1, Hi]`` leaves), threaded through the vmapped step as
params and advanced with the applied control by one batched ``rnn_apply``
inside the same program — the batched analogue of the reference's
``predictor.update`` (optimizer_mppi.py:195-197).  Masked-off slots keep
their hidden bit-exactly; a slot reset zeroes its hidden alone.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.utils import registry
from control_toolkit_tpu.utils.logging_util import get_logger

logger = get_logger(__name__)


@registry.controllers.register("batched-mpc")
class BatchedMPCController(MPCController):
    """B-slot MPC controller.

    ``configure(num_slots=B, ...)`` builds one optimizer (forced to the
    scan path) and vmaps its pure step over the slot axis.  Use
    ``step_batch(s [B,S], mask [B], attrs_batch)``; the scalar ``step``
    API delegates to slot 0 so the standard controller surface still works.
    """

    def configure(self, *args, num_slots: int = 1, mesh=None,
                  slot_axis=None, per_slot_dyn=(), **kwargs) -> None:
        """``mesh`` shards the SLOT axis over devices: sessions are fully
        independent, so the B-session step runs as a ``shard_map`` with
        B/n_devices sessions per device and ZERO cross-device collectives —
        serving throughput scale-out (BASELINE.md), composing with the
        columnwise kernel paths (each device runs its own one-launch
        batched kernel over its local sessions).  This is distinct from
        ``MPCController.configure(mesh=...)``, which shards a single
        session's rollout population K.  ``slot_axis`` picks the mesh
        axis/axes (default: all).

        ``per_slot_dyn`` names scalar dynamics constants (keys of the
        predictor's param dict, e.g. cartpole ``L``/``m_pole``) that vary
        PER SESSION: each slot then plans against its own model — a
        heterogeneous fleet (every robot slightly different, each slot
        carrying its own sysid'd constants) served by one device step.
        Values start at the predictor defaults and update per slot via
        ``update_slot_dyn``; they ride the batched step as [B] leaves of
        the dyn params (dynamic args — per-slot model updates never
        recompile), and shard with the slot axis under ``mesh``."""
        import jax
        import jax.numpy as jnp

        # Stash the ORIGINAL call (before the force_scan mutation below) so
        # a persistent cost transform (attach_value_terminal) can re-run
        # configure and rebuild the batched program against the wrapped
        # cost.  Re-running configure resets slot states.
        self._configure_stash = (
            args,
            dict(
                kwargs,
                optimizer_config=(
                    dict(kwargs["optimizer_config"])
                    if kwargs.get("optimizer_config") is not None else None
                ),
                num_slots=num_slots, mesh=mesh, slot_axis=slot_axis,
                per_slot_dyn=per_slot_dyn,
            ),
        )

        opt_cfg = kwargs.get("optimizer_config")
        if opt_cfg is None:
            # Load the YAML defaults HERE so force_scan is set before the
            # first build (otherwise a Pallas-eligible step is compiled and
            # immediately discarded by a rebuild).
            from control_toolkit_tpu.utils.config import load_optimizer_config

            name = (
                kwargs.get("optimizer_name")
                or (args[0] if args else None)
                or str(self.config_controller["optimizer"])
            )
            opt_cfg = load_optimizer_config(name)
        opt_cfg = dict(opt_cfg)
        # A user-supplied force_scan also opts OUT of the columnwise
        # batched kernel (the internal force_scan=True below only steers
        # the per-slot step away from the vmap-incompatible Pallas paths).
        self._user_force_scan = bool(opt_cfg.get("force_scan", False))
        opt_cfg["force_scan"] = True
        kwargs["optimizer_config"] = opt_cfg
        super().configure(*args, **kwargs)
        if opt_cfg.get("warmup"):
            logger.warning(
                "warmup=true in batched mode: a single freshly-reset slot "
                "drags EVERY slot through warmup_iterations (the vmapped "
                "loop runs to the max per-slot trip count) — expect "
                "whole-batch latency spikes after slot resets"
            )

        self.num_slots = int(num_slots)
        opt = self.optimizer
        B = self.num_slots

        # Per-slot dynamics constants (heterogeneous fleet models).  For
        # residual ('ODE+res') predictors the scalar constants live in the
        # 'base' subtree of the dyn pytree (the 'res' MLP weights are
        # shared); every per-slot consumer below is subtree-aware.
        from control_toolkit_tpu.models.residual_predictor import (
            ResidualPredictor,
        )

        pred0 = getattr(self.predictor, "predictor", self.predictor)
        self._dyn_subtree = (
            "base" if isinstance(pred0, ResidualPredictor) else None
        )
        self._per_slot_dyn = tuple(per_slot_dyn)
        if self._per_slot_dyn:
            pred = getattr(self.predictor, "predictor", self.predictor)
            if self._dyn_subtree:
                pred = pred.base
            defaults = pred.default_params()
            for k in self._per_slot_dyn:
                if k not in defaults or np.ndim(defaults[k]) != 0:
                    raise ValueError(
                        f"per_slot_dyn key {k!r} is not a scalar dynamics "
                        f"constant of this predictor (have: "
                        f"{sorted(k for k in defaults if np.ndim(defaults[k]) == 0)})"
                    )
            self._slot_dyn_defaults = {
                k: float(defaults[k]) for k in self._per_slot_dyn
            }
            self.slot_dyn: Dict[str, np.ndarray] = {
                k: np.full((B,), v, np.float32)
                for k, v in self._slot_dyn_defaults.items()
            }
        else:
            self._slot_dyn_defaults = {}
            self.slot_dyn = {}
        psd = frozenset(self._per_slot_dyn)

        def dyn_axes(dyn):
            """vmap in_axes / shard_map spec selector for the dyn tree:
            per-slot leaves carry the slot axis, everything else (scalars,
            net-weight subtrees) broadcasts whole.  Residual predictors
            nest the per-slot leaves under the 'base' subtree."""
            sub = self._dyn_subtree
            if sub is not None and psd:
                return {
                    k: ({kk: (0 if kk in psd else None) for kk in dyn[k]}
                        if k == sub else None)
                    for k in dyn
                }
            return {k: (0 if k in psd else None) for k in dyn}

        self._slot_mesh = mesh
        if mesh is not None:
            if slot_axis is None:
                s_axes = tuple(mesh.axis_names)
            elif isinstance(slot_axis, str):
                s_axes = (slot_axis,)
            else:
                s_axes = tuple(slot_axis)
            n_dev = int(np.prod([mesh.shape[a] for a in s_axes]))
            if B % n_dev != 0:
                raise ValueError(
                    f"num_slots={B} must divide evenly over the "
                    f"{n_dev}-device slot mesh"
                )
            self._slot_axes = s_axes
            # Kernel eligibility and builders see the PER-DEVICE session
            # count: inside shard_map each device steps its local shard.
            self._B_build = B // n_dev
        else:
            self._slot_axes, self._B_build = (), B

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as PS

            ax = s_axes if len(s_axes) > 1 else s_axes[0]
            self._slot_sharding = NamedSharding(mesh, PS(ax))
            self._rep_sharding = NamedSharding(mesh, PS())

            def place_slots(tree):
                # Via host numpy so this works in MULTI-PROCESS meshes too
                # (every process computes the identical full array and
                # device_put distributes each process's addressable
                # shards).
                return jax.tree_util.tree_map(
                    lambda x: jax.device_put(
                        np.asarray(x), self._slot_sharding
                    ),
                    tree,
                )

            self._place_slots = place_slots
        else:
            self._slot_sharding = self._rep_sharding = None
            self._place_slots = lambda tree: tree

        self._slot_keys = jax.vmap(
            lambda i: jax.random.fold_in(opt._initial_key, i)
        )(jnp.arange(B))  # one dispatch, not B eager fold_ins
        self.slot_states = self._place_slots(
            jax.vmap(opt._init_state)(self._slot_keys)
        )

        step_fn = opt._make_step_fn()
        self._kernel_path = False

        def freeze(mask, u, new_states, states):
            # Mask-freeze epilogue shared by every batched() variant:
            # idle slots keep their optimizer state bit-exactly and emit
            # u = 0 (a change to the freeze discipline lands on the
            # kernel, vmap and stateful paths together).
            def keep(new, old):
                m = mask.reshape((-1,) + (1,) * (new.ndim - 1))
                return jnp.where(m, new, old)

            states_out = jax.tree_util.tree_map(keep, new_states, states)
            return jnp.where(mask[:, None], u, 0.0), states_out

        self._stateful = bool(getattr(self.predictor, "is_stateful", False))
        if self._stateful:
            # Per-slot RNN hidden, stacked [B, 1, Hi] per leaf: each slot's
            # step sees the reference batch-1 hidden under vmap, and the
            # advance-with-applied-control (reference predictor.update,
            # optimizer_mppi.py:195-197) runs as ONE batched rnn_apply over
            # the B slots inside the same jitted program — the scalar path
            # does this host-side in Optimizer._post_step.
            pred = self.predictor.predictor
            self._rnn_apply_fn = pred._rnn_apply
            self._rnn_state0_fn = pred._rnn_state0
            self._rnn_hiddens = tuple(pred.arch["hiddens"])
            zero = self._rnn_state0_fn(self._rnn_hiddens, 1)
            self.slot_hidden = self._place_slots(tuple(
                jnp.tile(jnp.asarray(h)[None], (B, 1, 1)) for h in zero
            ))
            rnn_apply = self._rnn_apply_fn

            if self._batched_recurrent_eligible():
                # Columnwise recurrent kernel: each lane column carries its
                # session's live hidden; one launch for all B sessions.
                kstep, _ = opt._make_batched_recurrent_step(self._B_build)
                self._kernel_path = True
                logger.info(
                    f"batched-mpc: columnwise kernel path engaged "
                    f"(recurrent {pred.arch['kind'].upper()}, "
                    f"B={self._B_build} x K={opt.num_rollouts} in one launch)"
                )

                inner_step = kstep

            else:

                def inner_step(states, s, dyn, cost, attrs, hidden):
                    def one(st, s_, d, at, h):
                        d = dict(d)
                        d["hidden"] = h
                        return step_fn(
                            st, s_, {"dyn": d, "cost": cost, "attrs": at}
                        )

                    return jax.vmap(
                        one,
                        in_axes=(0, 0, dyn_axes(dyn), {k: 0 for k in attrs}, 0),
                    )(states, s, dyn, attrs, hidden)

            def batched(states, s, dyn, cost, attrs, mask, hidden):
                u, new_states, _ = inner_step(
                    states, s, dyn, cost, attrs, hidden
                )
                # Hidden advance with the applied (pre-freeze) control;
                # frozen slots keep their hidden bit-exactly (same mask
                # discipline as states).
                inp = jnp.concatenate([s[:, 0, :], u], axis=-1)
                _, h_new = rnn_apply(
                    dyn["net"], inp, tuple(h[:, 0, :] for h in hidden)
                )
                hidden_out = tuple(
                    jnp.where(mask[:, None, None], hn[:, None, :], h)
                    for hn, h in zip(h_new, hidden)
                )
                u, states_out = freeze(mask, u, new_states, states)
                return u, states_out, hidden_out

        elif (
            self._batched_kernel_eligible()
            or self._batched_neural_eligible()
            or self._batched_residual_eligible()
            or self._batched_gp_eligible()
            or self._batched_rpgd_eligible()
            or self._batched_gradient_eligible()
            or self._batched_fused_cem_eligible()
            or self._batched_var_eligible()
        ):
            # Fast path: ALL B sessions' rollouts pack into ONE columnwise
            # Pallas launch (per-session context as VMEM rows, per-session
            # softmax / top-k + surgery in XLA) instead of a vmapped
            # per-session step — the vmap path lowers to B small
            # sampling/interp/reduction ops (and for RPGD, B XLA-AD scan
            # backward passes) that the TPU executes poorly.  Per-session
            # PRNG streams are kept, so a session's results don't depend
            # on B.
            # (CEM sessions measured NEUTRAL-to-worse on the columnwise
            # kernel — the full-horizon population must be materialized +
            # transposed per outer iteration, which the vmap-scan path
            # fuses away; see docs/KERNELS.md.  CEM keeps the vmap path;
            # _make_batched_cem_step remains for one-launch compositions.)
            if self._batched_kernel_eligible():
                kstep, _ = opt._make_batched_semi_fused_step(
                    self._B_build, per_slot_dyn=self._per_slot_dyn
                )
                kind = "ODE semi-fused"
                if self._per_slot_dyn:
                    kind += f" (per-slot dyn {list(self._per_slot_dyn)})"
            elif self._batched_neural_eligible():
                kstep, _ = opt._make_batched_neural_step(self._B_build)
                kind = "neural MLP"
            elif self._batched_residual_eligible():
                kstep, _ = opt._make_batched_residual_step(
                    self._B_build, per_slot_dyn=self._per_slot_dyn
                )
                kind = "residual ODE+res"
                if self._per_slot_dyn:
                    kind += f" (per-slot dyn: {', '.join(self._per_slot_dyn)})"
            elif self._batched_gp_eligible():
                kstep, _ = opt._make_batched_gp_step(self._B_build)
                kind = "sparse GP"
            elif self._batched_rpgd_eligible():
                kstep = opt._make_batched_rpgd_step(
                    self._B_build, per_slot_dyn=self._per_slot_dyn
                )
                kind = "RPGD gradient"
            elif self._batched_gradient_eligible():
                kstep = opt._make_batched_gradient_step(
                    self._B_build, per_slot_dyn=self._per_slot_dyn
                )
                kind = "Adam gradient"
            elif self._batched_fused_cem_eligible():
                kstep = opt._make_batched_fused_cem_step(
                    self._B_build, per_slot_dyn=self._per_slot_dyn
                )
                kind = "fully-fused CEM"
                if self._per_slot_dyn:
                    kind += f" (per-slot dyn {list(self._per_slot_dyn)})"
            else:
                kstep = opt._make_batched_var_step(
                    self._B_build, per_slot_dyn=self._per_slot_dyn
                )
                kind = "mppi-var semi-fused"
                if self._per_slot_dyn:
                    kind += f" (per-slot dyn {list(self._per_slot_dyn)})"
            shard_note = (
                f" per device x {B // self._B_build} devices"
                if mesh is not None else ""
            )
            logger.info(
                f"batched-mpc: columnwise kernel path engaged "
                f"({kind}, B={self._B_build} x K={opt.num_rollouts} in one "
                f"launch{shard_note})"
            )
            self._kernel_path = True

            def batched(states, s, dyn, cost, attrs, mask):
                u, new_states, _ = kstep(states, s, dyn, cost, attrs)
                u, states_out = freeze(mask, u, new_states, states)
                return u, states_out

        else:

            def batched(states, s, dyn, cost, attrs, mask):
                u, new_states, _ = jax.vmap(
                    lambda st, s_, d, at: step_fn(
                        st, s_, {"dyn": d, "cost": cost, "attrs": at}
                    ),
                    in_axes=(0, 0, dyn_axes(dyn), {k: 0 for k in attrs}),
                )(states, s, dyn, attrs)
                u, states_out = freeze(mask, u, new_states, states)
                return u, states_out

        if mesh is None:
            self._batched_jit = jax.jit(batched)
        else:
            # Slot-axis SPMD: each device steps its B/n_dev local sessions
            # independently — no collectives at all (sessions never
            # communicate), so scale-out is embarrassingly linear over ICI
            # and, with a ('slice','k')-style mesh, over DCN too.
            from jax.sharding import PartitionSpec as PS
            try:
                from jax import shard_map  # jax >= 0.8
            except ImportError:
                from jax.experimental.shard_map import shard_map

            ax = (
                self._slot_axes if len(self._slot_axes) > 1
                else self._slot_axes[0]
            )
            sb, rep = PS(ax), PS()
            if self._per_slot_dyn:
                # Per-slot dyn leaves shard with the sessions; the rest of
                # the dyn tree (scalars, weight subtrees) replicates.  The
                # spec dict is a pytree prefix keyed on the ASSEMBLED dyn
                # keys (minus the hidden the stateful path strips).
                pred = getattr(self.predictor, "predictor", self.predictor)
                sub = self._dyn_subtree
                if sub is not None:
                    dyn_spec = {
                        k: ({kk: (sb if kk in psd else rep)
                             for kk in pred.base.default_params()}
                            if k == sub else rep)
                        for k in pred.default_params()
                    }
                else:
                    dyn_spec = {
                        k: (sb if k in psd else rep)
                        for k in pred.default_params()
                        if not (self._stateful and k == "hidden")
                    }
            else:
                dyn_spec = rep
            if self._stateful:
                in_specs = (sb, sb, dyn_spec, rep, sb, sb, sb)
                out_specs = (sb, sb, sb)
            else:
                in_specs = (sb, sb, dyn_spec, rep, sb, sb)
                out_specs = (sb, sb)
            self._batched_jit = jax.jit(shard_map(
                batched, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            ))
        # Per-slot attributes, stacked [B].
        self.slot_attrs: Dict[str, np.ndarray] = {
            k: np.full((B,), float(np.asarray(v).reshape(-1)[0]), np.float32)
            for k, v in self.variable_parameters.items()
        }

    def _batched_kernel_eligible(self) -> bool:
        """Columnwise-kernel eligibility: plain semi-fused MPPI over an SOA
        ODE model on TPU, no mesh (the batched kernel is single-chip), and
        the B*K population packs into whole tiles with whole-column
        sessions."""
        from control_toolkit_tpu.ops.pallas_mppi import DEFAULT_TILE_K, ROWS
        from control_toolkit_tpu.optimizers.base import batched_kernel_core_ok
        from control_toolkit_tpu.optimizers.mppi import MPPIOptimizer

        opt = self.optimizer
        return (
            type(opt) is MPPIOptimizer  # variants scale eps differently
            # post_ok: this is the one columns kernel that emits terminal
            # states, so a learned value terminal keeps the kernel path
            # (V added per session outside — optimizers/mppi.py).
            and batched_kernel_core_ok(opt, force_scan=self._user_force_scan,
                                       post_ok=True)
            and opt.semi_fused
            and not opt.bounded_update
            and opt.optim_steps == 0
            and opt._pallas_compatible_model()
            and opt.num_rollouts % ROWS == 0
            and (self._B_build * opt.num_rollouts) % DEFAULT_TILE_K == 0
        )

    def _batched_neural_like_eligible(self, recurrent: bool) -> bool:
        """Shared columnwise NEURAL-kernel eligibility: plain MPPI over a
        f32 NeuralPredictor on an unmeshed TPU, with B*K dividing a neural
        tile; ``recurrent`` selects the MLP form (False) or the
        per-session-hidden GRU/LSTM form (True) — one predicate so a new
        shared condition cannot be added to only one of them."""
        from control_toolkit_tpu.models.neural_predictor import NeuralPredictor
        from control_toolkit_tpu.ops.pallas_neural import neural_tile_for
        from control_toolkit_tpu.optimizers.base import batched_kernel_core_ok
        from control_toolkit_tpu.optimizers.mppi import MPPIOptimizer

        opt = self.optimizer
        pred = getattr(self.predictor, "predictor", self.predictor)
        return (
            type(opt) is MPPIOptimizer
            and not self._per_slot_dyn  # weight-operand kernels share dyn
            # post_ok for the MLP form only: its columns kernel emits
            # terminal states, so a learned value terminal rides (V per
            # session before the softmax); the recurrent kernel doesn't.
            and batched_kernel_core_ok(opt, force_scan=self._user_force_scan,
                                       post_ok=not recurrent)
            and not opt.bounded_update
            and opt.optim_steps == 0
            and isinstance(pred, NeuralPredictor)
            and pred.recurrent == recurrent
            and opt._pallas_neural_compatible_model()
            and neural_tile_for(self._B_build * opt.num_rollouts) > 0
        )

    def _batched_neural_eligible(self) -> bool:
        return self._batched_neural_like_eligible(recurrent=False)

    def _batched_residual_eligible(self) -> bool:
        """Columnwise RESIDUAL-kernel eligibility: plain MPPI over an
        'ODE+res' predictor on an unmeshed TPU with B*K dividing a neural
        tile.  Per-slot dyn IS supported (the per-slot leaves are base
        scalar constants; the residual MLP weights are shared)."""
        from control_toolkit_tpu.ops.pallas_neural import neural_tile_for
        from control_toolkit_tpu.optimizers.base import batched_kernel_core_ok
        from control_toolkit_tpu.optimizers.mppi import MPPIOptimizer

        opt = self.optimizer
        return (
            type(opt) is MPPIOptimizer
            # post_ok: the residual columns kernel emits terminal states
            and batched_kernel_core_ok(opt, force_scan=self._user_force_scan,
                                       post_ok=True)
            and not opt.bounded_update
            and opt.optim_steps == 0
            and opt._pallas_residual_compatible_model()
            and neural_tile_for(self._B_build * opt.num_rollouts) > 0
        )

    def _batched_gp_eligible(self) -> bool:
        """Columnwise GP-kernel eligibility: plain MPPI over a GPPredictor
        on an unmeshed TPU, with B*K packing into whole GP-kernel tiles
        (the same MPPI-shape conditions as the neural gate)."""
        from control_toolkit_tpu.models.gp_predictor import GPPredictor
        from control_toolkit_tpu.ops.pallas_neural import gp_tile_for
        from control_toolkit_tpu.optimizers.base import batched_kernel_core_ok
        from control_toolkit_tpu.optimizers.mppi import MPPIOptimizer

        opt = self.optimizer
        pred = getattr(self.predictor, "predictor", self.predictor)
        return (
            type(opt) is MPPIOptimizer
            and not self._per_slot_dyn  # weight-operand kernels share dyn
            # post_ok: the GP columns kernel emits terminal states
            and batched_kernel_core_ok(opt, force_scan=self._user_force_scan,
                                       post_ok=True)
            and not opt.bounded_update
            and opt.optim_steps == 0
            and isinstance(pred, GPPredictor)
            and opt._pallas_gp_compatible_model()
            and gp_tile_for(
                self._B_build * opt.num_rollouts, 1,
                int(pred.gp_params["Z"].shape[0]),
            ) > 0
        )

    def _batched_rpgd_eligible(self) -> bool:
        """Columnwise RPGD-kernel eligibility: RPGD (any variant — their
        ``_resample``/entropy-gradient overrides apply under the batched
        step too) over an SOA ODE model OR a neural MLP (shared weights
        only — per-slot dyn needs scalar SMEM rows) on an unmeshed TPU,
        warmup off (shared Adam-loop trip count), with B*K packing into
        whole gradient-kernel tiles."""
        from control_toolkit_tpu.optimizers.rpgd import RPGDOptimizer

        from control_toolkit_tpu.optimizers.base import batched_kernel_core_ok

        opt = self.optimizer
        if not (
            isinstance(opt, RPGDOptimizer)
            # post_ok: a plain-MLP value terminal rides the columns
            # gradient kernels in-kernel (_bind_batched_grad_kernels).
            and batched_kernel_core_ok(
                opt, force_scan=self._user_force_scan,
                post_ok=opt._value_grad_spec() is not None)
            and not opt.warmup
            and opt._grad_kernel_model_ok(bool(self._per_slot_dyn))
        ):
            return False
        return opt._grad_kernel_tile_ok(self._B_build * opt.num_rollouts)

    def _batched_fused_cem_eligible(self) -> bool:
        """Columns-mode FULLY-FUSED CEM eligibility: plain CEM with the
        user's ``fully_fused: true`` opt-in (counter-PRNG sampling
        semantics, as single-session), SOA ODE model, unmeshed TPU,
        warmup off, whole tiles.  The modular columns CEM path measured
        neutral-to-worse and stays off (docs/KERNELS.md); the fused form
        never materializes the population in HBM, which removes exactly
        the losing term."""
        from control_toolkit_tpu.ops.pallas_mppi import DEFAULT_TILE_K, ROWS
        from control_toolkit_tpu.optimizers.cem import CEMOptimizer

        from control_toolkit_tpu.optimizers.base import batched_kernel_core_ok

        opt = self.optimizer
        return (
            type(opt) is CEMOptimizer
            and opt.fully_fused
            and batched_kernel_core_ok(opt, force_scan=self._user_force_scan)
            and not opt.warmup
            and opt._pallas_compatible_model()
            and opt.num_rollouts % ROWS == 0
            and (self._B_build * opt.num_rollouts) % DEFAULT_TILE_K == 0
        )

    def _batched_var_eligible(self) -> bool:
        """Columnwise mppi-var eligibility: the base semi-fused conditions
        (the var step reuses the batched MPPI update with per-session
        adaptive sigma scaling + adaptation in XLA)."""
        from control_toolkit_tpu.ops.pallas_mppi import DEFAULT_TILE_K, ROWS
        from control_toolkit_tpu.optimizers.mppi_var import MPPIVarOptimizer

        from control_toolkit_tpu.optimizers.base import batched_kernel_core_ok

        opt = self.optimizer
        return (
            type(opt) is MPPIVarOptimizer
            # post_ok: the var step reuses the batched MPPI update, whose
            # columns kernel emits terminal states (V added per session
            # before the softmax AND the variance-adaptation einsum).
            and batched_kernel_core_ok(opt, force_scan=self._user_force_scan,
                                       post_ok=True)
            and opt.semi_fused
            and opt._pallas_compatible_model()
            and opt.num_rollouts % ROWS == 0
            and (self._B_build * opt.num_rollouts) % DEFAULT_TILE_K == 0
        )

    def _batched_recurrent_eligible(self) -> bool:
        """Recurrent (GRU/LSTM) form of the neural gate: per-session live
        hidden rides per lane column (``hidden_per_lane``)."""
        return self._batched_neural_like_eligible(recurrent=True)

    def _batched_gradient_eligible(self) -> bool:
        """Columnwise gradient-optimizer eligibility: plain gradient-tf
        over an SOA ODE model OR a neural MLP (shared weights only) on an
        unmeshed TPU, warmup off, with B*K packing into whole
        gradient-kernel tiles."""
        from control_toolkit_tpu.optimizers.gradient import GradientOptimizer

        from control_toolkit_tpu.optimizers.base import batched_kernel_core_ok

        opt = self.optimizer
        if not (
            type(opt) is GradientOptimizer
            # post_ok: a plain-MLP value terminal rides the columns
            # gradient kernels in-kernel (_bind_batched_grad_kernels).
            and batched_kernel_core_ok(
                opt, force_scan=self._user_force_scan,
                post_ok=opt._value_grad_spec() is not None)
            and not opt.warmup
            and opt._grad_kernel_model_ok(bool(self._per_slot_dyn))
        ):
            return False
        return opt._grad_kernel_tile_ok(self._B_build * opt.num_rollouts)

    # ---- slot management ---------------------------------------------------
    def slot_key(self, i: int):
        import jax
        return jax.random.fold_in(self.optimizer._initial_key, i)

    def reset_slot(self, i: int) -> None:
        import jax
        new = self.optimizer._init_state(self.slot_key(i))
        self.slot_states = jax.tree_util.tree_map(
            lambda full, n: full.at[i].set(n), self.slot_states, new
        )
        if getattr(self, "_stateful", False):
            # The slot's hidden may carry the divergence (or a stale
            # session) — zero it like the scalar path's reset_state().
            zero = self._rnn_state0_fn(self._rnn_hiddens, 1)
            self.slot_hidden = tuple(
                h.at[i].set(z) for h, z in zip(self.slot_hidden, zero)
            )

    def _dyn_with_slots(self, dyn: Dict, slot_vals: Optional[Dict] = None
                        ) -> Dict:
        """Overlay the per-slot [B] dyn leaves onto the assembled dyn tree
        — at the top level, or inside the residual predictor's 'base'
        subtree."""
        vals = self.slot_dyn if slot_vals is None else slot_vals
        if self._dyn_subtree is not None:
            sub = dict(dyn[self._dyn_subtree], **vals)
            return dict(dyn, **{self._dyn_subtree: sub})
        return dict(dyn, **vals)

    def update_slot_dyn(self, i: int, updated: Optional[Dict]) -> None:
        """Update slot ``i``'s per-session dynamics constants (keys must
        have been named in ``configure(per_slot_dyn=...)``) — e.g. commit a
        per-robot sysid result.  Values are dynamic jit args: no recompile.
        VALIDATES the whole update before committing any key: a mid-dict
        rejection (e.g. one NaN constant) must not leave the slot planning
        with a half-applied, inconsistent model."""
        staged = []
        for k, v in (updated or {}).items():
            if k not in self.slot_dyn:
                logger.warning(
                    f"slot {i}: dynamics constant {k!r} was not named in "
                    "per_slot_dyn at configure time; ignored"
                )
                continue
            flat = np.asarray(v, np.float32).reshape(-1)
            if flat.shape[0] != 1:
                logger.warning(
                    f"slot {i}: dynamics constant {k!r} has {flat.shape[0]} "
                    "elements; per-slot constants are scalars — using "
                    "element 0"
                )
            val = float(flat[0])
            if not np.isfinite(val):
                # np.asarray(None) is silently NaN: a poisoned model would
                # NaN every plan and persist across reset_slot (resets keep
                # the robot's constants by design) — reject instead.
                raise ValueError(
                    f"slot {i}: dynamics constant {k!r} must be finite, "
                    f"got {v!r}"
                )
            staged.append((k, val))
        for k, val in staged:
            self.slot_dyn[k][i] = val

    def reset_slot_dyn(self, i: int) -> None:
        """Return slot ``i``'s dynamics constants to the predictor defaults
        (slot handed to a NEW client — it must not inherit the previous
        robot's model).  Distinct from ``reset_slot``, which resets the
        warm start but keeps the model: a NaN-guard reset of a live robot
        must not forget its sysid'd constants."""
        for k, v in self._slot_dyn_defaults.items():
            self.slot_dyn[k][i] = v

    def update_slot_attributes(self, i: int, updated: Optional[Dict]) -> None:
        for k, v in (updated or {}).items():
            if k not in self.slot_attrs:
                logger.warning(
                    f"slot {i}: attribute {k!r} was not configured at "
                    "construction; ignored (batched attrs are fixed-key)"
                )
                continue
            flat = np.asarray(v, np.float32).reshape(-1)
            if flat.shape[0] != 1:
                logger.warning(
                    f"slot {i}: attribute {k!r} has {flat.shape[0]} elements; "
                    "batched slots hold scalars — using element 0"
                )
            self.slot_attrs[k][i] = float(flat[0])

    # ---- hot path ------------------------------------------------------------
    def step_batch(
        self,
        s_batch: np.ndarray,                       # [B, S]
        mask: Optional[np.ndarray] = None,         # [B] bool; default all on
        updated_attributes: Optional[List[Optional[Dict]]] = None,  # per slot
    ) -> np.ndarray:
        import jax.numpy as jnp

        B = self.num_slots
        if updated_attributes:
            if len(updated_attributes) > B:
                logger.warning(
                    f"step_batch got {len(updated_attributes)} attribute "
                    f"entries for {B} slots; extras ignored"
                )
            for i, upd in enumerate(updated_attributes[:B]):
                self.update_slot_attributes(i, upd)
        if self.cost_function.update_cost_parameters_from_config():
            self._cost_params = None
        params = self._assemble_params()
        if self._per_slot_dyn:
            # Per-session dynamics constants override the shared scalars as
            # [B] leaves (placed with the slot sharding under a mesh, below).
            params = dict(params, dyn=self._dyn_with_slots(params["dyn"]))

        mask_np = (
            np.ones((B,), bool) if mask is None else np.asarray(mask, bool)
        )
        s_np = np.asarray(s_batch, np.float32).reshape(B, 1, -1)
        if self._slot_sharding is not None:
            import jax

            # Explicit global placement: required for multi-PROCESS slot
            # meshes (each process holds the identical full arrays and
            # device_put distributes its addressable shards), and avoids a
            # jit-entry reshard for single-process meshes.
            mask_arr = jax.device_put(mask_np, self._slot_sharding)
            s_dev = jax.device_put(s_np, self._slot_sharding)
            attrs = {
                k: jax.device_put(np.asarray(v), self._slot_sharding)
                for k, v in self.slot_attrs.items()
            }
            if jax.process_count() > 1:
                # Multi-process: every process holds the identical params
                # host-side; the numpy detour lets device_put distribute
                # each process's addressable replica shards.
                params = jax.tree_util.tree_map(
                    lambda v: jax.device_put(
                        np.asarray(v), self._rep_sharding
                    ),
                    params,
                )
            else:
                # Single-process mesh: device-to-device replication only —
                # _assemble_params's cached device leaves must NOT round-
                # trip through host numpy every step.
                params = jax.device_put(params, self._rep_sharding)
            if self._per_slot_dyn:
                # [B] per-session dyn leaves shard with the slots (the
                # shard_map in_specs expect it; replicating then resharding
                # would bounce them through the interconnect every step).
                placed = {
                    k: jax.device_put(
                        np.asarray(self.slot_dyn[k]), self._slot_sharding
                    )
                    for k in self._per_slot_dyn
                }
                params = dict(
                    params,
                    dyn=self._dyn_with_slots(params["dyn"], placed),
                )
        else:
            mask_arr = jnp.asarray(mask_np)
            s_dev = jnp.asarray(s_np)
            attrs = {k: jnp.asarray(v) for k, v in self.slot_attrs.items()}

        if self._stateful:
            # The assembled dyn carries the predictor's own batch-1 hidden
            # (scalar-path plumbing); the batched truth lives in slot_hidden.
            dyn = {k: v for k, v in params["dyn"].items() if k != "hidden"}
            u, self.slot_states, self.slot_hidden = self._batched_jit(
                self.slot_states, s_dev, dyn, params["cost"], attrs, mask_arr,
                self.slot_hidden,
            )
        else:
            u, self.slot_states = self._batched_jit(
                self.slot_states, s_dev, params["dyn"], params["cost"], attrs,
                mask_arr,
            )
        if not u.is_fully_addressable:
            # Slot mesh spanning processes: the full [B, U] control is not
            # locally addressable — allgather it so every process serves
            # every session's reply (gloo/ICI, tiny array).  Gate on
            # addressability, NOT process_count: a local-only mesh inside
            # a distributed job is fully addressable and allgather would
            # wrongly concatenate every process's copy.
            from jax.experimental import multihost_utils

            u_host = np.asarray(
                multihost_utils.process_allgather(u, tiled=True)
            )
        else:
            u_host = np.asarray(u)
        # Per-slot NaN guard (optimizer base does this host-side for the
        # scalar path): a diverged slot commands zero and resets alone.
        bad = ~np.all(np.isfinite(u_host), axis=-1)
        if bad.any():
            # np.asarray of a jax array is a read-only view — copy before
            # zeroing the diverged rows.
            u_host = np.array(u_host)
            for i in np.nonzero(bad)[0]:
                logger.warning(f"slot {i} produced non-finite control; resetting")
                self.reset_slot(int(i))
            u_host[bad] = 0.0
        return u_host

    def step(self, s, time=None, updated_attributes: Optional[Dict] = None):
        """Scalar-controller compatibility: drive slot 0."""
        B = self.num_slots
        s_batch = np.zeros((B, np.asarray(s).reshape(-1).shape[0]), np.float32)
        s_batch[0] = np.asarray(s, np.float32).reshape(-1)
        mask = np.zeros((B,), bool)
        mask[0] = True
        upd = [updated_attributes] + [None] * (B - 1)
        return self.step_batch(s_batch, mask, upd)[0]

    def controller_reset(self) -> None:
        # One vmapped init (same path as configure) instead of B sequential
        # whole-tree .at[i].set copies.
        import jax
        import jax.numpy as jnp

        self.slot_states = self._place_slots(
            jax.vmap(self.optimizer._init_state)(self._slot_keys)
        )
        if getattr(self, "_stateful", False):
            zero = self._rnn_state0_fn(self._rnn_hiddens, 1)
            self.slot_hidden = self._place_slots(tuple(
                jnp.tile(jnp.asarray(h)[None], (self.num_slots, 1, 1))
                for h in zero
            ))
