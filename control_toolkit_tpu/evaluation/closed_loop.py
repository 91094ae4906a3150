"""On-device closed-loop evaluation: controller + plant in ONE program.

The reference runs its closed loops host-side — eager Python alternating
``controller.step`` and ``env.step`` (README.md:199-204 points at downstream
sims).  On TPU through a tunnel that pays a ~25-30 ms program-launch per
tick, which swamps a sub-ms controller step (BENCH_r02's 31.2 ms host-loop
p50 was almost pure dispatch).  TPU-native answer: fuse the whole loop —
optimizer step, plant advance, realized stage cost — into one jitted
``lax.scan`` over T ticks.  One launch per EPISODE, so the measured ms/tick
is real device time, and the same harness doubles as a fast eval bench for
zoo tests (VERDICT r2 item 3).

Stateful (RNN) predictors are supported: the hidden state joins the scan
carry, the per-tick advance with the applied control (reference
``predictor.update``, optimizer_mppi.py:195-197) runs inside the loop body,
and the final hidden is written back to the predictor after the episode.

``run_batch`` runs N episodes in ONE program launch — N independent
optimizer states (per-episode PRNG streams) advanced through T ticks.
That is the TPU-native Monte-Carlo eval sweep: robustness statistics over
initial-condition distributions cost one dispatch instead of N*T.  When
the per-episode optimizer is plain semi-fused MPPI over an SOA ODE model
(unmeshed TPU, tile-divisible N*K), the sweep uses the columnwise batched
kernel — every tick of all N episodes is a single Pallas launch
(optimizers/mppi.py ``_make_batched_semi_fused_step``) — instead of
vmapping N scan-path steps.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ClosedLoop:
    """Fused controller+plant loop for one optimizer and one environment.

    ``run(s0, ticks)`` executes the episode on device and returns host
    arrays; ``run_device(opt_state, s0, params, ticks)`` is the raw jitted
    program for benchmarking (callers time two tick-lengths and take the
    slope — see bench.py's dispatch-free measurement rule).
    """

    def __init__(self, controller, env, actuator_noise: Optional[float] = None,
                 noise_seed: int = 0):
        # Default to the ENVIRONMENT's own actuator noise so the fused loop
        # replicates `env.step` semantics unless explicitly overridden.
        if actuator_noise is None:
            actuator_noise = getattr(env, "actuator_noise", 0.0)
        self.controller = controller
        self.env = env
        self.actuator_noise = float(actuator_noise)
        self._noise_key = jax.random.PRNGKey(noise_seed)
        self._bind()

    def _bind(self):
        """Close over the controller's CURRENT optimizer step and cost.
        Re-run (via ``_ensure_fresh``) whenever the optimizer is rebuilt —
        configure() or attach_value_terminal() — so an existing loop never
        silently evaluates a stale objective; the noise key survives."""
        controller, env = self.controller, self.env
        opt = controller.optimizer
        self.optimizer = opt
        self._opt_epoch = getattr(opt, "_build_epoch", 0)
        self._stateful = bool(
            opt.predictor is not None
            and getattr(opt.predictor, "is_stateful", False)
        )
        rnn_apply = (
            controller.predictor.predictor._rnn_apply if self._stateful else None
        )

        step_fn = opt._make_step_fn()
        cf = controller.cost_function.cost_function
        env_step = env.step_dynamics
        env_dt = env.dt
        a_low = jnp.asarray(env.action_low, jnp.float32)
        a_high = jnp.asarray(env.action_high, jnp.float32)
        noise_scale = self.actuator_noise
        stateful = self._stateful

        def episode(opt_state, s0, params, noise_keys, ticks: int):
            # Un-jitted core: jitted directly for single episodes, vmapped
            # under one jit for Monte-Carlo sweeps.  The RNN hidden (if any)
            # enters through params["dyn"]["hidden"] — the same contract the
            # per-tick step obeys — and is threaded through the carry.
            def body(carry, key):
                opt_state, s, u_prev, hidden = carry
                if stateful:
                    dyn = dict(params["dyn"])
                    dyn["hidden"] = hidden
                    p = {**params, "dyn": dyn}
                else:
                    p = params
                u, opt_state, _ = step_fn(opt_state, s[None, :], p)
                if stateful:
                    # Advance with the COMMANDED control (pre actuator
                    # noise), matching the scalar _post_step hook.
                    inp = jnp.concatenate([s[None, :], u[None, :]], axis=-1)
                    _, hidden = rnn_apply(params["dyn"]["net"], inp, hidden)
                u_applied = u
                if noise_scale > 0.0:
                    u_applied = u + noise_scale * jax.random.normal(key, u.shape)
                u_applied = jnp.clip(u_applied, a_low, a_high)
                stage = cf.stage_cost_step(
                    s[None, :], u_applied[None, :], u_prev[None, :],
                    {"cost": params["cost"], "attrs": params["attrs"]},
                )[0]
                s_next = env_step(s[None, :], u_applied[None, :], env_dt)[0]
                return (opt_state, s_next, u_applied, hidden), (s, u_applied, stage)

            u0 = jnp.zeros((opt.num_control_inputs,), jnp.float32)
            h0 = params["dyn"]["hidden"] if stateful else ()
            (opt_state, sT, _, hT), (ss, us, stage) = jax.lax.scan(
                body, (opt_state, s0, u0, h0), noise_keys, length=ticks
            )
            return opt_state, sT, ss, us, stage, hT

        self._episode = episode
        self._run_device = partial(jax.jit, static_argnames=("ticks",))(episode)

        @partial(jax.jit, static_argnames=("ticks",))
        def run_batch_device(opt_states, s0s, params, noise_keys, ticks: int):
            return jax.vmap(
                lambda st, s0, nk: episode(st, s0, params, nk, ticks)
            )(opt_states, s0s, noise_keys)

        self._run_batch_device = run_batch_device
        self._kernel_sweeps: Dict[int, object] = {}
        self._kernel_swept_runs: Dict[tuple, object] = {}
        self._swept_runs: Dict[Tuple[str, ...], object] = {}

    def _ensure_fresh(self):
        opt = self.controller.optimizer
        if (opt is not self.optimizer
                or getattr(opt, "_build_epoch", 0) != self._opt_epoch):
            self._bind()

    def _swept_run_for(self, swept_paths: Tuple[str, ...], param_axes):
        """Jitted N-episode program with the given params leaves vmapped
        over the episode axis, cached by the swept-leaf path set (the axes
        tree is a pure function of it for a fixed controller)."""
        if swept_paths not in self._swept_runs:
            ep = self._episode

            @partial(jax.jit, static_argnames=("ticks",))
            def swept_run(opt_states, s0s, params, noise_keys, ticks: int):
                return jax.vmap(
                    lambda st, s0, p, nk: ep(st, s0, p, nk, ticks),
                    in_axes=(0, 0, param_axes, 0),
                )(opt_states, s0s, params, noise_keys)

            self._swept_runs[swept_paths] = swept_run
        return self._swept_runs[swept_paths]

    def _swept_kernel_run_for(self, N: int, swept_paths, params):
        """Kernel-path program for a PARAMETER sweep: when the optimizer's
        sweep kind is 'ode' (plain semi-fused MPPI), 'rpgd', or 'gradient'
        (the gradient kinds over SOA ODE models or neural MLPs — neural
        models expose no scalar dyn leaves, so their sweeps are attr/cost
        only) and every swept leaf is a per-episode
        SCALAR the kernel can carry — an attr (already a per-session row)
        or a dynamics constant / cost weight (per-slot pslot rows) — the
        whole grid rides the columnwise kernel: one launch per tick (per
        Adam iteration for the gradient kinds) for all N configs.  Returns
        None when any swept leaf needs the general vmapped path."""
        if self._sweep_kernel_kind(N) not in (
            "ode", "rpgd", "gradient", "residual", "mppi-var", "cem-fused",
        ):
            return None
        from control_toolkit_tpu.models.residual_predictor import (
            ResidualPredictor,
        )
        cf = self.controller.cost_function.cost_function
        pred = getattr(self.optimizer.predictor, "predictor",
                       self.optimizer.predictor)
        attr_keys = set(getattr(cf, "attr_keys", ()))
        dyn_keys, cost_keys = [], []
        for p in swept_paths:
            top, _, leaf = p.partition(".")
            tree = params[top]
            dyn_defaults = pred.default_params() if top == "dyn" else {}
            if (top == "dyn" and leaf.startswith("base.")
                    and isinstance(pred, ResidualPredictor)):
                # Residual ('ODE+res') scalar constants live one level
                # down (dyn.base.<k>); the batched residual/gradient steps
                # take BARE base-key names and nest their per-slot rows
                # under the 'base' subtree themselves (_dyn_with_slots).
                leaf = leaf[len("base."):]
                tree = tree["base"]
                dyn_defaults = dyn_defaults["base"]
            if "." in leaf or getattr(tree[leaf], "ndim", -1) != 1:
                return None           # nested tree or non-array/vector leaf
            if top == "attrs":
                if leaf not in attr_keys:
                    return None       # not a kernel-carried attr row
            elif top == "dyn":
                if leaf not in dyn_defaults:
                    return None
                dyn_keys.append(leaf)
            elif top == "cost":
                if leaf not in getattr(cf, "dynamic_config_keys", ()):
                    return None
                cost_keys.append(leaf)
            else:
                return None
        if not dyn_keys and not cost_keys:
            # Attrs-only sweep: attrs are per-session rows in EVERY kernel
            # sweep, so the plain Monte-Carlo program is byte-identical —
            # share its cache instead of compiling a duplicate (2-250 s
            # per fused compile through the tunnel).
            if N not in self._kernel_sweeps:
                self._kernel_sweeps[N] = self._build_kernel_sweep(N)
            return self._kernel_sweeps[N]
        key = (N, tuple(sorted(dyn_keys)), tuple(sorted(cost_keys)))
        if key not in self._kernel_swept_runs:
            self._kernel_swept_runs[key] = self._build_kernel_sweep(
                N, per_slot_dyn=tuple(dyn_keys), per_slot_cost=tuple(cost_keys)
            )
        return self._kernel_swept_runs[key]

    # ---- columnwise-kernel Monte-Carlo sweep -----------------------------
    def _sweep_kernel_kind(self, N: int) -> Optional[str]:
        """Which columnwise batched kernel the N-episode sweep can take:
        'ode' (semi-fused MPPI over an SOA ODE model), 'neural' (MPPI over
        a non-recurrent f32 MLP predictor), 'gp' (MPPI over a sparse-GP
        predictor), 'rpgd' (RPGD via the columns gradient kernel),
        'cem-fused' (fully_fused CEM via the columns counter-PRNG kernel),
        or None (vmapped scan path).  Mirrors the
        BatchedMPC eligibility gates; unmeshed TPU + stateless predictor +
        tile-divisible N*K required.  Modular (non-fully_fused) CEM sweeps
        keep the vmap path (the materialize+transpose columns CEM step
        measured neutral-to-worse — docs/KERNELS.md);
        ``_build_kernel_sweep`` still accepts one for callers composing
        one-launch sweeps explicitly."""
        from control_toolkit_tpu.models.neural_predictor import NeuralPredictor
        from control_toolkit_tpu.ops.pallas_mppi import DEFAULT_TILE_K, ROWS
        from control_toolkit_tpu.ops.pallas_neural import neural_tile_for
        from control_toolkit_tpu.optimizers.base import batched_kernel_core_ok
        from control_toolkit_tpu.optimizers.cem import CEMOptimizer
        from control_toolkit_tpu.optimizers.gradient import GradientOptimizer
        from control_toolkit_tpu.optimizers.mppi import MPPIOptimizer
        from control_toolkit_tpu.optimizers.mppi_var import MPPIVarOptimizer
        from control_toolkit_tpu.optimizers.rpgd import RPGDOptimizer

        opt = self.optimizer
        # post_ok here, gated per kind below: the semi-fused MPPI columns
        # kernel emits terminal states ('ode' and 'mppi-var', which
        # reuses it) and the columns gradient kernels evaluate a
        # plain-MLP V in-kernel ('rpgd'/'gradient'), so those kinds may
        # carry a learned value terminal; every other kind requires
        # post_free.
        if not batched_kernel_core_ok(
            opt, force_scan=opt.force_scan, stateful=self._stateful,
            post_ok=True,
        ):
            return None
        post_free = opt._post_terminal_fn() is None
        value_ok = post_free or opt._value_grad_spec() is not None

        def tiles_ok():
            return (
                opt._pallas_compatible_model()
                and opt.num_rollouts % ROWS == 0
                and (N * opt.num_rollouts) % DEFAULT_TILE_K == 0
            )

        def grad_tiles_ok():
            # ODE or neural-MLP models (opt._grad_kernel_model_ok); the
            # binder dispatches to the matching kernel family.
            return opt._grad_kernel_model_ok() and opt._grad_kernel_tile_ok(
                N * opt.num_rollouts
            )

        if type(opt) is CEMOptimizer:
            if post_free and opt.fully_fused and not opt.warmup and tiles_ok():
                return "cem-fused"
            return None
        if isinstance(opt, RPGDOptimizer):
            if value_ok and not opt.warmup and grad_tiles_ok():
                return "rpgd"
            return None
        if type(opt) is GradientOptimizer:
            if value_ok and not opt.warmup and grad_tiles_ok():
                return "gradient"
            return None
        if type(opt) is MPPIVarOptimizer:
            # The var step reuses the batched MPPI update (emit_terminal
            # columns kernel), so a value terminal keeps the kernel path.
            if opt.semi_fused and tiles_ok():
                return "mppi-var"
            return None
        if not (
            type(opt) is MPPIOptimizer
            and not opt.bounded_update
            and opt.optim_steps == 0
        ):
            return None
        if opt.semi_fused and tiles_ok():
            return "ode"
        pred = getattr(opt.predictor, "predictor", opt.predictor)
        if (
            # their columns kernels emit terminal states — a value
            # terminal keeps the kernel path (V per episode outside)
            isinstance(pred, NeuralPredictor)
            and not pred.recurrent
            and opt._pallas_neural_compatible_model()
            and neural_tile_for(N * opt.num_rollouts) > 0
        ):
            return "neural"
        from control_toolkit_tpu.models.gp_predictor import GPPredictor
        from control_toolkit_tpu.ops.pallas_neural import gp_tile_for

        if (
            # their columns kernels emit terminal states — a value
            # terminal keeps the kernel path (V per episode outside)
            isinstance(pred, GPPredictor)
            and opt._pallas_gp_compatible_model()
            and gp_tile_for(
                N * opt.num_rollouts, 1, int(pred.gp_params["Z"].shape[0])
            ) > 0
        ):
            return "gp"
        from control_toolkit_tpu.models.residual_predictor import (
            ResidualPredictor,
        )

        if (
            # their columns kernels emit terminal states — a value
            # terminal keeps the kernel path (V per episode outside)
            isinstance(pred, ResidualPredictor)
            and opt._pallas_residual_compatible_model()
            and neural_tile_for(N * opt.num_rollouts) > 0
        ):
            return "residual"
        return None

    def _kernel_sweep_eligible(self, N: int) -> bool:
        return self._sweep_kernel_kind(N) is not None

    def _build_kernel_sweep(self, N: int, interpret: bool = False,
                            tile_k: Optional[int] = None,
                            per_slot_dyn=(), per_slot_cost=()):
        """N-episode sweep with ONE columnwise kernel launch per tick:
        episode b's K rollouts ride lane columns of the shared launch
        (optimizers/mppi.py _make_batched_semi_fused_step for ODE models,
        _make_batched_neural_step for MLP predictors, optimizers/cem.py
        _make_batched_cem_step for CEM — one launch per outer iteration),
        the plant advance + realized stage cost stay in XLA, and the tick
        loop is a lax.scan — so a whole Monte-Carlo sweep is still one
        program."""
        opt = self.optimizer
        # Dispatch on the optimizer/predictor kind (not the eligibility
        # gate, which is backend-dependent — interpret-mode callers run on
        # CPU).
        from control_toolkit_tpu.models.gp_predictor import GPPredictor
        from control_toolkit_tpu.models.neural_predictor import NeuralPredictor
        from control_toolkit_tpu.models.residual_predictor import (
            ResidualPredictor,
        )
        from control_toolkit_tpu.optimizers.cem import CEMOptimizer
        from control_toolkit_tpu.optimizers.mppi_var import MPPIVarOptimizer
        from control_toolkit_tpu.optimizers.rpgd import RPGDOptimizer

        from control_toolkit_tpu.optimizers.gradient import GradientOptimizer
        from control_toolkit_tpu.optimizers.mppi import MPPIOptimizer

        def _is_residual(p):
            return isinstance(p, ResidualPredictor)

        pred = getattr(opt.predictor, "predictor", opt.predictor)
        if (per_slot_dyn or per_slot_cost) and not (
            (type(opt) in (MPPIOptimizer, MPPIVarOptimizer)
             and not isinstance(pred, (NeuralPredictor, GPPredictor)))
            or isinstance(opt, (RPGDOptimizer, GradientOptimizer))
            or type(opt) is CEMOptimizer
        ):
            raise NotImplementedError(
                "per-episode dyn/cost sweeps ride the kernel path only for "
                "plain MPPI / mppi-var / CEM / RPGD / gradient-tf over SOA "
                "ODE models"
            )
        if isinstance(opt, MPPIVarOptimizer):
            kstep = opt._make_batched_var_step(
                N, interpret=interpret, tile_k=tile_k,
                per_slot_dyn=per_slot_dyn, per_slot_cost=per_slot_cost,
            )
        elif isinstance(opt, RPGDOptimizer):
            kstep = opt._make_batched_rpgd_step(
                N, interpret=interpret, tile_k=tile_k,
                per_slot_dyn=per_slot_dyn, per_slot_cost=per_slot_cost,
            )
        elif isinstance(opt, GradientOptimizer):
            kstep = opt._make_batched_gradient_step(
                N, interpret=interpret, tile_k=tile_k,
                per_slot_dyn=per_slot_dyn, per_slot_cost=per_slot_cost,
            )
        elif isinstance(opt, CEMOptimizer):
            if opt.fully_fused:
                kstep = opt._make_batched_fused_cem_step(
                    N, interpret=interpret, tile_k=tile_k,
                    per_slot_dyn=per_slot_dyn, per_slot_cost=per_slot_cost,
                )
            else:
                kstep, _ = opt._make_batched_cem_step(
                    N, interpret=interpret, tile_k=tile_k,
                    per_slot_dyn=per_slot_dyn, per_slot_cost=per_slot_cost,
                )
        elif type(opt) is MPPIOptimizer and isinstance(pred, NeuralPredictor):
            kstep, _ = opt._make_batched_neural_step(
                N, interpret=interpret, tile_k=tile_k
            )
        elif type(opt) is MPPIOptimizer and _is_residual(pred):
            kstep, _ = opt._make_batched_residual_step(
                N, interpret=interpret, tile_k=tile_k,
                per_slot_dyn=per_slot_dyn, per_slot_cost=per_slot_cost,
            )
        elif type(opt) is MPPIOptimizer and isinstance(pred, GPPredictor):
            kstep, _ = opt._make_batched_gp_step(
                N, interpret=interpret, tile_k=tile_k
            )
        elif type(opt) is MPPIOptimizer:
            kstep, _ = opt._make_batched_semi_fused_step(
                N, interpret=interpret, tile_k=tile_k,
                per_slot_dyn=per_slot_dyn, per_slot_cost=per_slot_cost,
            )
        else:
            raise NotImplementedError(
                f"no columnwise batched step exists for "
                f"{type(opt).__name__}; run_batch uses the vmapped episode "
                "path for this optimizer"
            )
        cf = self.controller.cost_function.cost_function
        env_step, env_dt = self.env.step_dynamics, self.env.dt
        a_low = jnp.asarray(self.env.action_low, jnp.float32)
        a_high = jnp.asarray(self.env.action_high, jnp.float32)
        noise_scale = self.actuator_noise
        U = opt.num_control_inputs

        @partial(jax.jit, static_argnames=("ticks",))
        def sweep(opt_states, s0s, params, noise_keys, ticks: int):
            cparams = {"cost": params["cost"], "attrs": params["attrs"]}

            def body(carry, keys_t):
                states, s, u_prev = carry
                u, states, _ = kstep(
                    states, s[:, None, :], params["dyn"], params["cost"],
                    params["attrs"],
                )
                u_applied = u
                if noise_scale > 0.0:
                    u_applied = u + noise_scale * jax.vmap(
                        lambda k: jax.random.normal(k, (U,))
                    )(keys_t)
                u_applied = jnp.clip(u_applied, a_low, a_high)
                stage = cf.stage_cost_step(s, u_applied, u_prev, cparams)
                s_next = env_step(s, u_applied, env_dt)
                return (states, s_next, u_applied), (s, u_applied, stage)

            u0 = jnp.zeros((N, U), jnp.float32)
            keys_tn = jnp.swapaxes(noise_keys, 0, 1)        # [T, N, key]
            (states, sT, _), (ss, us, stage) = jax.lax.scan(
                body, (opt_states, s0s, u0), keys_tn, length=ticks
            )
            # Match the vmapped-episode layout: [N, T, ...].
            return (
                states, sT, jnp.swapaxes(ss, 0, 1), jnp.swapaxes(us, 0, 1),
                jnp.swapaxes(stage, 0, 1), (),
            )

        return sweep

    def run_device(self, opt_state, s0, params, ticks: int):
        """Raw device program (for slope benchmarking): one launch, ``ticks``
        control steps.  Advances the noise key per call (like ``run``) so
        successive episodes draw independent actuator noise."""
        self._ensure_fresh()
        self._noise_key, sub = jax.random.split(self._noise_key)
        keys = jax.random.split(sub, ticks)
        return self._run_device(opt_state, s0, params, keys, ticks)

    def run(self, s0: np.ndarray, ticks: int, reset: bool = True
            ) -> Dict[str, np.ndarray]:
        """Run one episode; returns {'states' [T,S], 'controls' [T,U],
        'stage_costs' [T], 'final_state' [S], 'mean_cost' scalar}."""
        self._ensure_fresh()
        if reset:
            self.optimizer.optimizer_reset()
            if self._stateful:
                self.controller.predictor.predictor.reset_state()
        self._noise_key, sub = jax.random.split(self._noise_key)
        keys = jax.random.split(sub, ticks)
        params = self.controller._assemble_params()
        s0 = jnp.asarray(np.reshape(s0, (-1,)), jnp.float32)
        opt_state, sT, ss, us, stage, hT = self._run_device(
            self.optimizer.opt_state, s0, params, keys, ticks
        )
        self.optimizer.opt_state = opt_state
        if self._stateful:
            # The episode advanced the hidden T times on device; hand the
            # final hidden back so a follow-up per-tick loop (or another
            # episode with reset=False) continues from where this one ended.
            self.controller.predictor.predictor.hidden = hT
        return {
            "states": np.asarray(ss),
            "controls": np.asarray(us),
            "stage_costs": np.asarray(stage),
            "final_state": np.asarray(sT),
            "mean_cost": float(np.mean(np.asarray(stage))),
        }

    def run_batch(self, s0_batch: np.ndarray, ticks: int,
                  return_trajectories: bool = False,
                  mesh=None,
                  sweep_params: Optional[Dict] = None) -> Dict[str, np.ndarray]:
        """Monte-Carlo sweep: N independent episodes in ONE program launch.

        Each episode gets a fresh optimizer state on its own PRNG stream
        (fold_in on the episode index — the same per-instance keying as
        BatchedMPC slots) and an independent actuator-noise stream; the
        controller's own live state is untouched.  Stateful predictors
        start every episode from the CURRENT hidden in the assembled params
        (zeros after a reset) and evolve it per-episode inside the program.

        With ``mesh``, the episode axis shards over every mesh axis
        (episodes are embarrassingly parallel — no cross-episode
        collectives, so the SPMD program is pure per-chip work); N must be
        divisible by the mesh device count.

        ``sweep_params`` turns the Monte-Carlo sweep into a PARAMETER sweep:
        a nested dict overlay (subset of the assembled params tree — 'cost',
        'attrs', 'dyn' leaves) whose leaves carry a leading [N] episode
        axis.  Episode i then runs with row i of every swept leaf — an
        N-point hyperparameter grid (cost weights, targets) or model-
        mismatch robustness study (controller-side dynamics constants vs
        the fixed plant) costs ONE device launch.  This works because every
        swept quantity is already a jit argument (CLAUDE.md invariant), so
        the vmap just adds an episode axis to those leaves — zero
        recompilation relative to changing the value between runs.  When
        the optimizer is plain semi-fused MPPI over an SOA ODE model and
        every swept leaf is a per-episode scalar (attr, dynamics constant,
        or cost weight), the sweep rides the COLUMNWISE KERNEL — one
        Pallas launch per tick evaluates the whole grid, with the swept
        values as per-session pslot rows; anything else (vector leaves,
        net-weight subtrees, other optimizers) takes the vmapped path.

        Returns {'mean_costs' [N], 'stage_costs' [N,T], 'final_states'
        [N,S], 'final_hidden' (stateful only)}, plus 'states' [N,T,S] /
        'controls' [N,T,U] when ``return_trajectories`` (off by default —
        at large N the trajectories dominate the device->host copy).
        """
        self._ensure_fresh()
        opt = self.optimizer
        s0s = jnp.asarray(np.asarray(s0_batch, np.float32))
        if s0s.ndim != 2:
            raise ValueError(f"s0_batch must be [N, S], got {s0s.shape}")
        N = s0s.shape[0]
        # One vmapped dispatch, not N eager fold_ins (each eager dispatch
        # pays the ~25-30 ms host->TPU tunnel launch; N=512 would spend
        # ~15 s on keys alone).  fold_in is deterministic, so the keys are
        # identical to the per-index loop.
        ep_keys = jax.vmap(
            lambda i: jax.random.fold_in(opt._initial_key, i)
        )(jnp.arange(N))
        opt_states = jax.vmap(opt._init_state)(ep_keys)
        self._noise_key, sub = jax.random.split(self._noise_key)
        noise_keys = jax.random.split(sub, N * ticks).reshape(
            (N, ticks) + sub.shape
        )
        params = self.controller._assemble_params()
        param_axes = None
        if sweep_params is not None:
            params, param_axes, swept_paths = _overlay_sweep(
                params, sweep_params, N
            )
            if not swept_paths:
                raise ValueError("sweep_params contains no leaves to sweep")
        if mesh is not None:
            from jax.sharding import NamedSharding

            from control_toolkit_tpu.parallel.mesh import (
                population_spec, replicated,
            )

            n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
            if N % n_dev != 0:
                raise ValueError(
                    f"N={N} episodes not divisible over {n_dev} mesh devices"
                )

            def shard(x):
                return jax.device_put(
                    x, NamedSharding(mesh, population_spec(mesh, jnp.ndim(x)))
                )

            opt_states = jax.tree_util.tree_map(shard, opt_states)
            s0s, noise_keys = shard(s0s), shard(noise_keys)
            rep = replicated(mesh)
            if param_axes is None:
                params = jax.tree_util.tree_map(
                    lambda v: jax.device_put(jnp.asarray(v), rep), params
                )
            else:
                # Swept leaves ([N, ...]) shard along the episode axis like
                # every other per-episode input; unswept leaves replicate.
                params = _place_swept(params, param_axes, shard, rep)
        if param_axes is not None:
            run = None
            if mesh is None:
                run = self._swept_kernel_run_for(N, tuple(swept_paths), params)
            if run is None:
                run = self._swept_run_for(tuple(swept_paths), param_axes)
        else:
            run = self._run_batch_device
            if mesh is None and self._kernel_sweep_eligible(N):
                if N not in self._kernel_sweeps:
                    self._kernel_sweeps[N] = self._build_kernel_sweep(N)
                run = self._kernel_sweeps[N]
        _, sT, ss, us, stage, hT = run(
            opt_states, s0s, params, noise_keys, ticks
        )
        out = {
            "mean_costs": np.asarray(jnp.mean(stage, axis=1)),
            "stage_costs": np.asarray(stage),
            "final_states": np.asarray(sT),
        }
        if self._stateful:
            out["final_hidden"] = tuple(np.asarray(h) for h in hT)
        if return_trajectories:
            out["states"] = np.asarray(ss)
            out["controls"] = np.asarray(us)
        return out


# ---- parameter-sweep overlay helpers ------------------------------------
def _overlay_sweep(params: Dict, sweep: Dict, N: int):
    """Merge a sweep overlay into the assembled params tree.

    ``sweep`` mirrors a subset of ``params``'s dict structure; each of its
    leaves must be an array of shape [N, *base_leaf.shape] (scalars sweep
    as [N]).  Returns (merged_params, vmap_in_axes_prefix_tree,
    sorted_swept_path_list).  Unswept subtrees pass through untouched with
    a ``None`` prefix axis, so arbitrarily-structured leaves (net weight
    dicts, RNN hidden tuples) broadcast whole.
    """
    swept: list = []

    def rec(base, over, path):
        if not isinstance(base, dict):
            raise KeyError(
                f"sweep path '{'.'.join(path)}' descends into a non-dict "
                f"params node ({type(base).__name__})"
            )
        merged, axes = {}, {}
        for k, bv in base.items():
            if k not in over:
                merged[k], axes[k] = bv, None
                continue
            ov = over[k]
            if isinstance(ov, dict):
                merged[k], axes[k] = rec(bv, ov, path + (k,))
                continue
            dotted = ".".join(path + (k,))
            base_arr = jnp.asarray(bv)
            arr = jnp.asarray(ov).astype(base_arr.dtype)
            want = (N,) + base_arr.shape
            if arr.shape != want:
                raise ValueError(
                    f"sweep leaf '{dotted}' has shape {arr.shape}; expected "
                    f"{want} ([N, *base_shape] for N={N} episodes)"
                )
            merged[k], axes[k] = arr, 0
            swept.append(dotted)
        unknown = set(over) - set(base)
        if unknown:
            raise KeyError(
                f"sweep keys {sorted(unknown)} not present in params"
                f"{' at ' + '.'.join(path) if path else ''} "
                f"(have: {sorted(base)})"
            )
        return merged, axes

    merged, axes = rec(params, sweep, ())
    return merged, axes, sorted(swept)


def _place_swept(params, axes, shard_fn, replicated_sharding):
    """Device-place a swept params tree on a mesh: leaves with episode
    axis 0 shard like the other per-episode inputs, axis-None subtrees
    replicate whole."""
    if axes is None:
        return jax.tree_util.tree_map(
            lambda v: jax.device_put(jnp.asarray(v), replicated_sharding),
            params,
        )
    if isinstance(axes, dict):
        return {k: _place_swept(params[k], axes[k], shard_fn,
                                replicated_sharding)
                for k in params}
    assert axes == 0
    return shard_fn(params)
