"""Optimizer base class.

Capability parity with the reference template_optimizer
(/root/reference/Optimizers/__init__.py:10-79): same constructor surface
(predictor, cost_function, control_limits, optimizer_logging, seed,
num_rollouts, mpc_horizon), ``configure(num_states, num_control_inputs)``,
``step(s, time) -> u``, ``optimizer_reset()``, ``optimizer_name`` property and
the ``logging_values`` dict contract (Q_logged/J_logged/
rollout_trajectories_logged/u_logged/s_logged[/trajectory_ages_logged]).

TPU-native redesign: every optimizer is a *pure function*
``_step_fn(state, s, params) -> (u, new_state, diagnostics)`` compiled once
with ``jax.jit`` and an explicit state pytree (Q population, distribution
moments, Adam m/v, PRNG key, step counter).  The mutable-variable surgery of
the reference (tf.Variable assign / Adam get_weights-set_weights) becomes
gather/concat inside the jitted step.  Dynamic quantities (cost weights,
environment attributes, dynamics parameters) are jit *arguments* so nothing
recompiles when they change.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.utils.logging_util import get_logger
from control_toolkit_tpu.utils.rng import make_key

logger = get_logger(__name__)


def partition_packed_keys(param_keys, extra_slot_keys=()):
    """Core of the shared/per-lane partition over ALREADY-PREFIXED extras
    (``d_<name>`` / ``c_<name>``): attrs (``a_*``) and the per-session
    previous control (``__u_prev_*``) are always per-lane; the extras join
    them.  The single source of truth for this partition — used by
    ``split_slot_keys`` and the fused-MPPI kernel builder
    (ops/pallas_mppi.py), so a change to the convention reaches the
    kernels and the packer together."""
    slot_prefixes = ("a_", "__u_prev_")
    extra = frozenset(extra_slot_keys)
    unknown = extra - set(param_keys)
    if unknown:
        raise ValueError(f"per-slot keys {sorted(unknown)} not in "
                         "the packed scalar params")
    slot_keys = [k for k in param_keys
                 if k.startswith(slot_prefixes) or k in extra]
    shared_keys = [k for k in param_keys if k not in slot_keys]
    return shared_keys, slot_keys


def split_slot_keys(param_keys, per_slot_dyn=(), per_slot_cost=()):
    """Partition the packed scalar param keys into ``(shared_keys,
    slot_keys)`` for the columns-mode kernels, from BARE dynamics/cost
    names — pair with ``make_slot_packer``."""
    return partition_packed_keys(
        param_keys,
        tuple(f"d_{k}" for k in per_slot_dyn)
        + tuple(f"c_{k}" for k in per_slot_cost),
    )


def make_slot_packer(shared_keys, slot_keys, attr_defaults, B: int,
                     K: int = None):
    """Operand packer for the columnwise batched-session kernels
    (``slot_keys`` form of ops/pallas_rollout.py / pallas_grad.py /
    pallas_neural.py / pallas_cem.py — the SINGLE source of truth for how
    per-session params leave the shared SMEM vector): shared scalar params
    (dynamics constants, cost weights) pack into ``pvec``; per-session
    params (attrs, u_prev) become one row per slot key.

    Returns ``pack(u_prev_b [B,U], dyn, cost, attrs) -> (pvec,
    rows [B, n_slot])`` when ``K is None`` (callers lay the rows out
    themselves — e.g. the per-COLUMN ``expand_cols`` of the semi-fused /
    fused-CEM kernels), or ``(pvec, pslot [n_slot, B*K])`` in the
    per-LANE layout the flat cost/grad/neural kernels consume."""
    attr_defaults = dict(attr_defaults)

    def pack(u_prev_b, dyn, cost, attrs):
        pvec = jnp.stack([
            jnp.asarray(
                dyn[k[2:]] if k.startswith("d_") else cost[k[2:]],
                jnp.float32,
            ) for k in shared_keys
        ])
        rows = []
        for k in slot_keys:
            if k.startswith(("a_", "d_", "c_")):
                if k.startswith("a_"):
                    v = attrs.get(k[2:])
                    if v is None:
                        v = float(attr_defaults.get(k[2:], 0.0))
                elif k.startswith("d_"):
                    # Per-session dynamics constant (heterogeneous fleet).
                    v = dyn[k[2:]]
                else:
                    # Per-session cost weight (kernel-path parameter grid).
                    v = cost[k[2:]]
                # Scalars broadcast over sessions (shared-attr callers like
                # the Monte-Carlo sweep); [B] arrays pass through.
                rows.append(jnp.broadcast_to(
                    jnp.asarray(v, jnp.float32).reshape(-1), (B,)
                ))
            else:                                   # __u_prev_<j>
                rows.append(u_prev_b[:, int(k.rsplit("_", 1)[1])])
        rows = jnp.stack(rows, axis=1)                      # [B, n_slot]
        if K is None:
            return pvec, rows
        return pvec, jnp.repeat(rows, K, axis=0).T          # [n_slot, B*K]

    return pack


def batched_kernel_core_ok(opt, *, force_scan: bool,
                           stateful: bool = False,
                           post_ok: bool = False) -> bool:
    """The conjunction every columnwise batched-kernel eligibility gate
    shares (BatchedMPC._batched_*_eligible and ClosedLoop's sweep gate
    both build on this — keep it in ONE place so a new condition cannot
    be missed by one consumer): no user force_scan opt-out, stateless
    predictor, no logging / optimal-trajectory replay (per-session
    diagnostics take the vmapped path), and no K-sharding mesh on the
    optimizer.  Model compatibility (SOA ODE vs neural) and tile
    divisibility stay per-gate.

    ``post_ok=True`` admits a post-terminal hook (learned value terminal)
    — only for gates whose batched kernel carries V: the semi-fused MPPI
    columns kernel (emits terminal states; V added per session outside)
    and the columns GRADIENT kernels (plain-MLP V in-kernel with dV/dQ —
    gates pass ``post_ok=opt._value_grad_spec() is not None``).  Every
    other columns kernel neither emits terminals nor backprops through
    the hook, so those sessions keep the vmapped scan and V is never
    dropped."""
    return (
        not force_scan
        and not stateful
        and not opt.optimizer_logging
        and not opt.calculate_optimal_trajectory
        and opt._mesh is None
        and (post_ok or opt._post_terminal_fn() is None)
    )


class Optimizer:
    registered_name: str = "template"

    def __init__(
        self,
        predictor,
        cost_function,
        control_limits: Tuple[np.ndarray, np.ndarray],
        optimizer_logging: bool = False,
        seed: Optional[int] = None,
        num_rollouts: int = 32,
        mpc_horizon: int = 35,
        computation_library: Any = None,  # accepted for API parity; ignored (JAX only)
        calculate_optimal_trajectory: bool = False,
        remat: bool = False,
        force_scan: bool = False,
        logging_lazy: bool = False,
        initial_guess_policy=None,
        risk_weight: float = 0.0,
        robust_eval: Optional[str] = None,
        **kwargs,
    ):
        self.predictor = predictor
        self.cost_function = cost_function
        self.num_rollouts = int(num_rollouts)
        self.mpc_horizon = int(mpc_horizon)
        self.optimizer_logging = bool(optimizer_logging)
        self.calculate_optimal_trajectory = bool(calculate_optimal_trajectory)
        # Rematerialize rollout steps under AD (memory vs FLOPs at big K*H).
        self.remat = bool(remat)
        # Force the lax.scan paths even on TPU (no Pallas kernels) — needed
        # when the step function is vmapped (BatchedMPC serving).
        self.force_scan = bool(force_scan)
        # Keep per-step diagnostics as device arrays (transfer deferred to
        # Controller.get_outputs) instead of syncing [K,H+1,S] every step.
        self.logging_lazy = bool(logging_lazy)
        # Heuristic-policy warm start (reference FORCES
        # initial_trajectory_guess, optimizer_nlp_forces.py:261-279), for
        # sampling/gradient optimizers: a callable (x [S], params) -> u [U]
        # rolled closed-loop through the predictor at the FIRST step after
        # every optimizer_reset; the resulting [H, U] plan seeds the
        # optimizer's warm-start state via the per-class
        # ``_apply_policy_guess`` hook (optimizers without the hook — e.g.
        # iLQR, which has its own richer multi-start mechanism — ignore
        # this attribute).  Constructor-only (a callable can't ride YAML).
        self.initial_guess_policy = initial_guess_policy
        # Risk-averse planning: adds ``risk_weight * disagreement(s, Q)``
        # (the predictor's per-rollout epistemic uncertainty, e.g. the
        # cross-member trajectory std of an EnsemblePredictor) to every
        # trajectory cost — sampling optimizers then prefer plans the model
        # family AGREES on, and gradient optimizers descend the penalty too
        # (disagreement is differentiable).  Requires a predictor exposing
        # ``disagreement`` (validated at configure).
        self.risk_weight = float(risk_weight)
        # Robust evaluation over ensemble members: instead of PETS
        # trajectory sampling (each plan under ONE member), score every
        # plan under ALL E members (``rollout_all_members``) and aggregate:
        # 'mean' (model averaging), 'worst' (min-max robust MPC), or
        # 'cvar:<frac>' (mean of the worst ceil(frac*E) member costs per
        # plan).  Costs E x the rollout FLOPs; composes with risk_weight.
        if robust_eval is not None:
            r = str(robust_eval)
            if not (r in ("mean", "worst") or r.startswith("cvar:")):
                raise ValueError(
                    f"robust_eval must be 'mean', 'worst' or 'cvar:<frac>', "
                    f"got {robust_eval!r}")
            if r.startswith("cvar:"):
                frac = float(r.split(":", 1)[1])
                if not 0.0 < frac <= 1.0:
                    raise ValueError(f"cvar fraction must be in (0, 1], got {frac}")
        self.robust_eval = robust_eval
        self._policy_plan_fn = None
        self._policy_seed_pending = False

        # A typo'd hyperparameter in config_optimizers.yml would otherwise
        # be swallowed silently by **kwargs and the default value used.
        unknown = set(kwargs) - {"mpc_timestep"}
        if unknown:
            logger.warning(
                f"{self.__class__.__name__}: ignoring unknown config keys "
                f"{sorted(unknown)} (check config_optimizers.yml for typos)"
            )

        action_low, action_high = control_limits
        self.action_low = jnp.asarray(action_low, dtype=jnp.float32)
        self.action_high = jnp.asarray(action_high, dtype=jnp.float32)

        self.seed = seed
        self._initial_key = make_key(seed, context=self.__class__.__name__)

        self.num_states: Optional[int] = None
        self.num_control_inputs: Optional[int] = None

        self.logging_values: Dict[str, np.ndarray] = {}
        self.opt_state: Any = None
        self.u: Any = 0.0  # last applied control (reference convention)
        self.optimal_trajectory: Optional[np.ndarray] = None
        self.optimal_control_sequence: Optional[np.ndarray] = None

        self._step_jit = None
        # Optional device pin (jax.Device) — set by the owning controller
        # from its 'device' config key BEFORE configure(); the step, state
        # init, and param assembly all run inside jax.default_device(it).
        self._device = None
        # Optional sharding plan (set via plan_sharding) applied to the state.
        self._shard_state = None
        self._mesh = None          # jax.sharding.Mesh when sharded
        self._shard_axes = ()      # mesh axis names K shards over

    # ---- lifecycle --------------------------------------------------------
    def configure(
        self,
        num_states: int,
        num_control_inputs: int,
        dt: Optional[float] = None,
        predictor_specification: Optional[str] = None,
        default_configure: bool = True,
        **kwargs,
    ) -> None:
        self.num_states = int(num_states)
        self.num_control_inputs = int(num_control_inputs)
        self.dt = dt
        if self.risk_weight and self._disagreement_fn() is None:
            raise ValueError(
                "risk_weight requires a predictor exposing disagreement() "
                "(e.g. an 'ensemble:<net>:<E>' EnsemblePredictor); got "
                f"{type(getattr(self.predictor, 'predictor', self.predictor)).__name__}"
            )
        if self.robust_eval and not hasattr(
            getattr(self.predictor, "predictor", self.predictor),
            "rollout_all_members",
        ):
            raise ValueError(
                "robust_eval requires a predictor exposing "
                "rollout_all_members() (an 'ensemble:<net>:<E>' "
                "EnsemblePredictor); got "
                f"{type(getattr(self.predictor, 'predictor', self.predictor)).__name__}"
            )
        _pred = getattr(self.predictor, "predictor", self.predictor)
        _E = getattr(_pred, "n_members", None)
        if (
            _E and _E > 1 and self.num_rollouts > 1
            and self.num_rollouts % _E != 0
            and not getattr(self, "robust_eval", None)
        ):
            # Silently falling back to ensemble-MEAN dynamics for the whole
            # population (at E x the FLOPs) is a trap — the user asked for
            # trajectory sampling (review finding).
            raise ValueError(
                f"num_rollouts={self.num_rollouts} does not divide over the "
                f"{_E} ensemble members: trajectory sampling needs "
                "num_rollouts % n_members == 0 (pick E in {2,4,8} for "
                "power-of-two populations, or set robust_eval to score "
                "every plan under every member instead)"
            )
        self._build()
        self._log_kernel_path()
        if default_configure:
            self.optimizer_reset()

    def _build(self) -> None:
        """Compile the pure step function. Subclasses construct
        ``self._step_jit`` here from ``self._make_step_fn()``."""
        # Monotone build counter: consumers that close over traces of the
        # step (evaluation.ClosedLoop) compare this to detect a rebuild
        # (configure / attach_value_terminal) and re-bind instead of
        # silently running the stale objective.
        self._build_epoch = getattr(self, "_build_epoch", 0) + 1
        self._step_jit = jax.jit(self._make_step_fn())

    def _make_step_fn(self):
        raise NotImplementedError

    def _init_state(self, key: jax.Array):
        raise NotImplementedError

    def place_state(self, state):
        """Apply this optimizer's placement plan to a state pytree: the
        sharding plan when one exists, else COMMIT to the device pin.

        Must be used for EVERY opt_state assignment (reset and checkpoint
        restore): arrays merely created under default_device are
        uncommitted, while the jitted step's outputs are committed — mixed
        committedness between the first and second call changes the jit
        cache key and forces a full recompile on step 1.
        """
        if self._shard_state is not None:
            return self._shard_state(state)
        if self._device is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self._device), state
            )
        return state

    def optimizer_reset(self) -> None:
        from control_toolkit_tpu.utils.device import device_scope

        with device_scope(self._device):
            self.opt_state = self.place_state(self._init_state(self._initial_key))
            # self.u goes through place_state too: if any path feeds it back
            # as a jit input, a committed-vs-uncommitted flip would change
            # the jit cache key (ADVICE r2).
            self.u = self.place_state(
                jnp.zeros((self.num_control_inputs,), dtype=jnp.float32)
            )
        # Re-arm the policy warm start on every reset (incl. the NaN-guard
        # auto-reset): the next step() re-seeds from the policy rollout.
        self._policy_seed_pending = (
            self.initial_guess_policy is not None
            and hasattr(self, "_apply_policy_guess")
        )

    # ---- heuristic-policy warm start ---------------------------------------
    def _policy_plan(self):
        """Jitted closed-loop rollout of ``initial_guess_policy`` through
        the predictor: (s [1+, S], params) -> [H, U] clipped plan
        (reference FORCES initial_trajectory_guess,
        optimizer_nlp_forces.py:261-279, generalized to the sampling zoo)."""
        if self._policy_plan_fn is None:
            policy = self.initial_guess_policy
            step = getattr(self.predictor, "single_step", None)
            if step is None:
                raise ValueError(
                    "initial_guess_policy requires a predictor exposing "
                    "single_step (ODE / neural predictors)"
                )
            H, U = self.mpc_horizon, self.num_control_inputs
            low, high = self.action_low, self.action_high

            def plan(s, params):
                def body(x, _):
                    u = jnp.clip(
                        jnp.reshape(
                            jnp.asarray(policy(x[0], params), jnp.float32),
                            (U,),
                        ),
                        low, high,
                    )
                    return step(x, u[None], params["dyn"]), u

                _, us = jax.lax.scan(body, s[:1], None, length=H)
                return us

            self._policy_plan_fn = jax.jit(plan)
        return self._policy_plan_fn

    # ---- hot path ---------------------------------------------------------
    def step(self, s: np.ndarray, time=None, params: Optional[Dict] = None) -> np.ndarray:
        """One control step: host state in, host control out.

        Crosses the device boundary exactly twice (s in, u out); diagnostics
        are copied only when optimizer_logging is on (reference hot-path
        structure, optimizer_mppi.py:205-225).
        """
        if self.optimizer_logging:
            self.logging_values = {"s_logged": np.asarray(s).copy()}

        from control_toolkit_tpu.utils.device import device_scope

        with device_scope(self._device):
            s_dev = jnp.atleast_2d(jnp.asarray(s, dtype=jnp.float32))
            params = params if params is not None else self.default_params()
            if self._policy_seed_pending:
                # First step after a reset: seed the warm start from a
                # closed-loop policy rollout (reference FORCES
                # initial_trajectory_guess, optimizer_nlp_forces.py:261-279).
                self._policy_seed_pending = False
                plan = self._policy_plan()(s_dev, params)
                self.opt_state = self.place_state(
                    self._apply_policy_guess(self.opt_state, plan)
                )
            u, self.opt_state, diag = self._step_jit(self.opt_state, s_dev, params)
        self.u = u

        if self.optimizer_logging:
            conv = (lambda v: v) if self.logging_lazy else np.asarray
            for key_name, val in diag.items():
                self.logging_values[key_name] = conv(val)
            self.logging_values["u_logged"] = np.asarray(u)
            if "u_nom" in diag:
                self.optimal_control_sequence = self.logging_values.get("u_nom")
        elif "u_nom" in diag:
            # Keep the device array; fetch only if someone reads it.
            self.optimal_control_sequence = diag["u_nom"]

        if "optimal_trajectory" in diag:
            # Replay of the nominal plan through the predictor (reference
            # calculate_optimal_trajectory, optimizer_mppi.py:199-202).
            self.optimal_trajectory = np.asarray(diag["optimal_trajectory"])
        if "summed_stage_cost" in diag:
            self.summed_stage_cost = np.asarray(diag["summed_stage_cost"])

        u_host = np.asarray(u)
        # NaN guard on the jitted output (SURVEY §5: the reference only
        # nan-guards the embedded path; here every optimizer output is
        # checked at the host boundary — a diverged solve commands zero).
        # Must run BEFORE _post_step: advancing a recurrent predictor's
        # hidden state with a NaN control would poison it permanently.
        if not np.all(np.isfinite(u_host)):
            logger.warning(
                f"{self.__class__.__name__} produced non-finite control "
                f"{u_host}; substituting zeros and resetting optimizer state"
            )
            self.optimizer_reset()
            if self.predictor is not None and getattr(
                self.predictor, "is_stateful", False
            ):
                reset = getattr(
                    getattr(self.predictor, "predictor", self.predictor),
                    "reset_state", None,
                )
                if reset is not None:
                    reset()  # the hidden may already carry the divergence
            u_host = np.zeros_like(u_host)
            u = jnp.asarray(u_host)
            self.u = u

        # The hook runs jax work (RNN hidden advance) — keep it on the pin.
        with device_scope(self._device):
            self._post_step(s_dev, u, diag)
        return u_host

    def _post_step(self, s_dev, u, diag) -> None:
        """Host-side hook after the jitted step (e.g. RNN predictor state
        advance with the applied control — reference predictor.update,
        optimizer_mppi.py:195-197).  Default: advance stateful predictors."""
        if self.predictor is not None and getattr(self.predictor, "update", None):
            self.predictor.update(s_dev[:1], jnp.reshape(u, (1, 1, -1)))

    def default_params(self) -> Dict:
        dyn = self.predictor.default_params() if self.predictor is not None else {}
        cost = (
            self.cost_function.current_params()
            if self.cost_function is not None and getattr(self.cost_function, "cost_function", True) is not None
            else {"cost": {}, "attrs": {}}
        )
        return {"dyn": dyn, "cost": cost["cost"], "attrs": cost["attrs"]}

    # ---- shared pure helpers ---------------------------------------------
    def _cost_params(self, params: Dict) -> Dict:
        return {"cost": params["cost"], "attrs": params["attrs"]}

    def _disagreement_fn(self):
        return getattr(
            getattr(self.predictor, "predictor", self.predictor),
            "disagreement", None,
        )

    def _post_terminal_fn(self):
        """The cost's non-scalar terminal hook (e.g. a learned value net),
        evaluated outside the Pallas kernels on their emitted terminal
        states — None for plain costs (costs/base.py contract)."""
        cf = getattr(self.cost_function, "cost_function", self.cost_function)
        return getattr(cf, "post_terminal_cost", None)

    def _value_grad_spec(self):
        """``{"n_layers": L}`` when the cost is a ValueTerminalCost whose
        V is a plain ``mlp_init``-style tanh MLP — the GRADIENT kernels
        then evaluate AND differentiate V in-kernel (ops/pallas_grad.py
        ``value_spec``): the terminal ``jax.vjp`` seeds the backward sweep
        with dV/dx_H, so RPGD / gradient-tf keep the fused kernel with
        exact dV/dQ.  None otherwise (gradient planning falls back to
        XLA-AD through the scan, where any post-terminal hook
        participates in AD natively)."""
        from control_toolkit_tpu.costs.value_terminal import ValueTerminalCost

        cf = getattr(self.cost_function, "cost_function", self.cost_function)
        if not isinstance(cf, ValueTerminalCost):
            return None
        # A base cost with its OWN post hook would be dropped in-kernel.
        if getattr(cf.base, "post_terminal_cost", None) is not None:
            return None
        net = cf.value_params
        n = sum(1 for k in net if str(k).startswith("w"))
        if n == 0 or set(net) != {f"{c}{i}" for i in range(n) for c in "wb"}:
            return None  # norm-carrying or exotic nets: keep XLA-AD
        return {"n_layers": n}

    def _flatten_value_ops(self, params):
        """flatten_mlp_weights of the live value net, with the (dynamic)
        value scale folded into the last layer — V re-fits and scale
        changes reach the gradient kernels with zero recompiles."""
        from control_toolkit_tpu.ops.pallas_neural import flatten_mlp_weights

        ops = flatten_mlp_weights(params["cost"]["_value_net"])
        scale = params["cost"]["_value_scale"]
        return ops[:-2] + [ops[-2] * scale, ops[-1] * scale]

    def _finalize_cost_kernel(self, raw_call, post):
        """``raw_call(s_tiled, Q, u_prev, params)`` returns ``cost [K]``
        (post is None) or ``(cost [K], x_H [K,S])`` (emit_terminal kernel).
        Folds the post-terminal hook in under the reference
        mean-over-(H+1) normalization — one XLA matmul chain on the
        kernel-emitted terminal states."""
        if post is None:
            return raw_call
        inv = 1.0 / (self.mpc_horizon + 1)

        def cost_fn(s_tiled, Q, u_prev, params):
            cost, x_term = raw_call(s_tiled, Q, u_prev, params)
            return cost + post(x_term, self._cost_params(params)) * inv

        return cost_fn

    @staticmethod
    def _cost_out_specs(post):
        """shard_map out_specs factory for a forward cost kernel: [K] cost,
        plus the [K, S] terminal states when emit_terminal is on."""
        if post is None:
            return lambda PS, first: PS(first)
        return lambda PS, first: (PS(first), PS(first, None))

    def _wrap_risk(self, cost_fn):
        """Add the epistemic-uncertainty penalty to a cost-only evaluator
        (``(s_tiled, Q, u_prev, params) -> [K]``) when risk_weight is on."""
        if not self.risk_weight or cost_fn is None:
            return cost_fn
        w = self.risk_weight
        dis = self._disagreement_fn()

        def wrapped(s_tiled, Q, u_prev, params):
            return cost_fn(s_tiled, Q, u_prev, params) + w * dis(
                s_tiled, Q, params["dyn"]
            )

        return wrapped

    def _robust_aggregate(self, member_costs):
        """[E, K] per-member costs -> [K] per the robust_eval mode."""
        r = str(self.robust_eval)
        if r == "mean":
            return jnp.mean(member_costs, axis=0)
        if r == "worst":
            return jnp.max(member_costs, axis=0)
        frac = float(r.split(":", 1)[1])
        E = member_costs.shape[0]
        n = max(1, int(np.ceil(frac * E)))
        worst = jax.lax.top_k(member_costs.T, n)[0]          # [K, n]
        return jnp.mean(worst, axis=1)

    def _robust_cost_and_members(self, s_tiled, Q, u_prev, params):
        """The single source of the robust member-cost semantics: every
        plan rolls under ALL E members (per-member MEAN dynamics —
        aleatoric heads are not sampled here), per-member trajectory
        costs aggregate per ``robust_eval``.  Returns (cost [K],
        trajs [E, K, H+1, S]).  Differentiable, so gradient optimizers
        descend the robust objective (subgradient through the max)."""
        pred = getattr(self.predictor, "predictor", self.predictor)
        trajs = pred.rollout_all_members(s_tiled, Q, params["dyn"])
        costs = jax.vmap(
            lambda tr: self.cost_function.get_trajectory_cost(
                tr, Q, u_prev, self._cost_params(params)
            )
        )(trajs)                                              # [E, K]
        return self._robust_aggregate(costs), trajs

    def _robust_member_cost(self):
        def cost_fn(s_tiled, Q, u_prev, params):
            return self._robust_cost_and_members(s_tiled, Q, u_prev, params)[0]

        return cost_fn

    def _rollout_and_cost(self, s_tiled, Q, u_prev, params):
        if self.robust_eval:
            cost, trajs = self._robust_cost_and_members(
                s_tiled, Q, u_prev, params
            )
            traj = jnp.mean(trajs, axis=0)  # diagnostics: the mean model
        else:
            traj = self.predictor.rollout(s_tiled, Q, params["dyn"])
            cost = self.cost_function.get_trajectory_cost(
                traj, Q, u_prev, self._cost_params(params)
            )
        if self.risk_weight:
            cost = cost + self.risk_weight * self._disagreement_fn()(
                s_tiled, Q, params["dyn"]
            )
        return cost, traj

    def _can_fuse_rollout(self) -> bool:
        cf = getattr(self.cost_function, "cost_function", self.cost_function)
        return (
            self.predictor is not None
            and self.predictor.single_step is not None
            and cf is not None
            and getattr(cf, "supports_fused_rollout", False)
        )

    def _fused_cost(self, s_tiled, Q, u_prev, params):
        """Trajectory cost without materializing [K,H+1,S] (ops/rollout.py)."""
        from control_toolkit_tpu.ops.rollout import scan_cost_rollout

        cf = getattr(self.cost_function, "cost_function", self.cost_function)
        cp = self._cost_params(params)
        step = self.predictor.single_step

        cost, _ = scan_cost_rollout(
            lambda x, u, p: step(x, u, p["dyn"]),
            lambda x, u, up, p: cf.stage_cost_step(x, u, up, cp),
            lambda x, p: cf.get_terminal_cost(x, cp),
            s_tiled, Q, u_prev, params,
            remat=getattr(self, "remat", False),
        )
        return cost

    def _make_cost_only(self, differentiable: bool = False):
        """Best available cost-only rollout evaluator, or None.

        Preference: Pallas VMEM kernel (TPU) > fused scan > None (caller
        keeps the trajectory path).  Used by sampling optimizers when
        logging is off, so the [K,H+1,S] trajectory is never materialized.
        ``differentiable=True`` excludes the Pallas kernel (no AD rules) —
        gradient-based optimizers differentiate through the fused scan.
        """
        if self.robust_eval:
            # Robust member evaluation replaces the TS rollout entirely
            # (every plan under every member); kernels don't apply.
            return self._wrap_risk(self._robust_member_cost())
        if not differentiable:
            from control_toolkit_tpu.optimizers import kernel_families as kf

            for fam in kf.COST_ORDER:
                if fam.can_use_cost(self):
                    return self._wrap_risk(fam.build_cost(self))
        if self._can_fuse_rollout():
            return self._wrap_risk(self._fused_cost)
        return None

    # ---- kernel-path report (configure-time eligibility notice) ------------
    def kernel_path_report(self):
        """(family, path, reasons) — see kernel_families/report.py."""
        from control_toolkit_tpu.optimizers.kernel_families import report
        return report.kernel_path_report(self)

    def _log_kernel_path(self):
        from control_toolkit_tpu.optimizers.kernel_families import report
        report.log_kernel_path(self)

    # ---- Pallas fused kernel ---------------------------------------------
    # ---- per-family kernel providers (optimizers/kernel_families/) -----
    # The historical method names below are kept as one-line delegations
    # so every caller (optimizer zoo, BatchedMPC, ClosedLoop sweeps,
    # tests) is unchanged; the bodies live in one module per model
    # family.  Adding a family touches kernel_families/, not this class.
    def _pallas_compatible_model(self) -> bool:
        from control_toolkit_tpu.optimizers.kernel_families import ode
        return ode.compatible_model(self)

    def _can_use_pallas(self) -> bool:
        from control_toolkit_tpu.optimizers.kernel_families import ode
        return ode.can_use_cost(self)

    def _n_shard_devices(self) -> int:
        if self._mesh is None:
            return 1
        import numpy as np

        return int(np.prod([self._mesh.shape[a] for a in self._shard_axes]))

    def _soa_bindings(self, include_dyn: bool = True):
        """Common kernel-builder preamble: bind the predictor's SOA dynamics
        and the cost function's SOA primitives, plus the packed scalar
        parameter vector layout (dyn constants, cost weights, attrs,
        previous control) that rides in SMEM scalar prefetch.

        Returns (param_keys, pack, derivs_soa, stage_soa, terminal_soa,
        pred).  ``stage_soa`` includes the control-change term and the
        MAX_COST shift — i.e. reference get_stage_cost semantics.

        ``include_dyn=False`` omits the dynamics constants from the packed
        vector (and returns ``derivs_soa=None``) — used by the neural kernel,
        whose dynamics parameters are weight ARRAYS passed as VMEM operands,
        not SMEM scalars."""
        import jax.numpy as jnp

        from control_toolkit_tpu.models.residual_predictor import (
            ResidualPredictor,
        )

        cf = getattr(self.cost_function, "cost_function", self.cost_function)
        pred = getattr(self.predictor, "predictor", self.predictor)
        U = self.num_control_inputs

        # Residual ('ODE+res') predictors wrap an analytic base whose scalar
        # constants are the SMEM dyn params; the residual MLP weights ride
        # separately as VMEM operands (_build_pallas_residual_*).
        dyn_src = pred.base if isinstance(pred, ResidualPredictor) else pred
        dyn_nested = dyn_src is not pred
        dyn_keys = sorted(dyn_src.default_params()) if include_dyn else []
        cost_keys = sorted(cf.dynamic_config_keys)
        attr_keys = sorted(getattr(cf, "attr_keys", ()))
        param_keys = (
            [f"d_{k}" for k in dyn_keys]
            + [f"c_{k}" for k in cost_keys]
            + [f"a_{k}" for k in attr_keys]
            + [f"__u_prev_{j}" for j in range(U)]
        )

        def split_p(p):
            dyn = {k: p[f"d_{k}"] for k in dyn_keys}
            cp = {
                "cost": {k: p[f"c_{k}"] for k in cost_keys},
                "attrs": {k: p[f"a_{k}"] for k in attr_keys},
            }
            return dyn, cp

        max_cost = cf.MAX_COST

        def stage_soa(xs, us, prev_us, p):
            _, cp = split_p(p)
            return (
                cf._stage_cost_core_soa(xs, us, cp)
                + cf.control_change_cost_soa(us, prev_us, cp)
                - max_cost
            )

        def terminal_soa(xs, p):
            # kernel_terminal_soa = the scalar-operand part; a learned
            # value terminal is added OUTSIDE the kernel on the emitted
            # terminal states (post_terminal_cost, costs/base.py).
            _, cp = split_p(p)
            return cf.kernel_terminal_soa(xs, cp)

        def derivs(xs, us, p):
            dyn, _ = split_p(p)
            return dyn_src.dynamics.soa(xs, us, dyn)

        if not include_dyn:
            derivs = None

        attr_defaults = getattr(cf, "attr_defaults", {})

        def pack(params, u_prev):
            vals = {}
            dyn_leaves = (
                params["dyn"]["base"] if dyn_nested else params["dyn"]
            )
            for k in dyn_keys:
                vals[f"d_{k}"] = dyn_leaves[k]
            for k in cost_keys:
                vals[f"c_{k}"] = params["cost"][k]
            for k in attr_keys:
                # Missing attrs fall back to the COST's declared default so
                # the kernel path optimizes the same objective as the scan
                # path (which hits the cost code's attrs.get default).
                vals[f"a_{k}"] = params["attrs"].get(
                    k, attr_defaults.get(k, 0.0)
                )
            for k in attr_keys:
                if jnp.ndim(vals[f"a_{k}"]) != 0:
                    raise ValueError(
                        f"attribute {k!r} is array-valued; the fused kernel "
                        "path carries attrs as SMEM scalars. Set "
                        "force_scan=True (the scan path supports array "
                        "attributes) or keep this attribute scalar."
                    )
            up = jnp.asarray(u_prev, jnp.float32)
            if up.ndim >= 2 and up.shape[0] > 1:
                raise ValueError(
                    "the Pallas cost path carries u_prev in SMEM scalars and "
                    "supports only a single shared previous control; got "
                    f"shape {up.shape}"
                )
            up = jnp.reshape(up, (-1,))
            for j in range(U):
                vals[f"__u_prev_{j}"] = up[j]
            return jnp.stack(
                [jnp.asarray(vals[k], jnp.float32) for k in param_keys]
            )

        return param_keys, pack, derivs, stage_soa, terminal_soa, pred

    def _build_pallas_cost(self, interpret: bool = False, tile_k: int = None):
        from control_toolkit_tpu.optimizers.kernel_families import ode
        return ode.build_cost(self, interpret=interpret, tile_k=tile_k)

    def _shard_map_kernel(self, kernel, make_out_specs, n_replicated_extra: int = 0,
                          n_member_sharded_extra: int = 0):
        """Wrap a (s0, Q, pvec, *extra) Pallas kernel in shard_map over the
        planned mesh.  XLA does not auto-partition custom kernels, so under
        sharding each device runs its LOCAL K tiles; the rollout kernels
        have NO cross-K reduction — downstream reductions (top-k, softmax)
        stay in XLA and lower to ICI/DCN collectives as usual.

        ``make_out_specs(PS, first) -> out_specs`` builds the output spec(s)
        from the PartitionSpec class and the kernel's K-axis name(s).
        ``n_replicated_extra`` extends in_specs with fully-replicated entries
        (the neural kernel's weight operands).
        ``n_member_sharded_extra`` instead shards the extras' LEADING axis
        over the mesh (the ensemble kernel's stacked member weights: device
        d receives its own whole member blocks — see ensemble_tile_for)."""
        from jax.sharding import PartitionSpec as PS
        try:
            from jax import shard_map
        except ImportError:  # jax < 0.8
            from jax.experimental.shard_map import shard_map

        axes = self._shard_axes
        first = axes if len(axes) > 1 else axes[0]
        return shard_map(
            kernel, mesh=self._mesh,
            in_specs=(PS(first, None), PS(first, None, None), PS())
            + (PS(),) * n_replicated_extra
            + (PS(first),) * n_member_sharded_extra,
            out_specs=make_out_specs(PS, first),
            check_vma=False,  # pallas_call outputs carry no vma annotation
        )

    def _build_pallas_grad(self, interpret: bool = False, tile_k: int = None):
        from control_toolkit_tpu.optimizers.kernel_families import ode
        return ode.build_grad(self, interpret=interpret, tile_k=tile_k)

    def _pallas_neural_compatible_model(self) -> bool:
        from control_toolkit_tpu.optimizers.kernel_families import neural
        return neural.compatible_model(self)

    def _can_use_pallas_neural(self, tile_k: int = None) -> bool:
        from control_toolkit_tpu.optimizers.kernel_families import neural
        return neural.can_use_cost(self, tile_k=tile_k)

    def _build_pallas_neural_cost(self, interpret: bool = False,
                                  tile_k: int = None):
        from control_toolkit_tpu.optimizers.kernel_families import neural
        return neural.build_cost(self, interpret=interpret, tile_k=tile_k)

    def _pallas_ensemble_compatible_model(self) -> bool:
        from control_toolkit_tpu.optimizers.kernel_families import ensemble
        return ensemble.compatible_model(self)

    def _can_use_pallas_ensemble(self, tile_k: int = None) -> bool:
        from control_toolkit_tpu.optimizers.kernel_families import ensemble
        return ensemble.can_use_cost(self, tile_k=tile_k)

    def _build_pallas_ensemble_cost(self, interpret: bool = False,
                                    tile_k: int = None):
        from control_toolkit_tpu.optimizers.kernel_families import ensemble
        return ensemble.build_cost(self, interpret=interpret, tile_k=tile_k)

    def _pallas_gp_compatible_model(self) -> bool:
        from control_toolkit_tpu.optimizers.kernel_families import gp
        return gp.compatible_model(self)

    def _gp_num_inducing(self) -> int:
        from control_toolkit_tpu.optimizers.kernel_families import gp
        return gp.num_inducing(self)

    def _can_use_pallas_gp(self, tile_k: int = None) -> bool:
        from control_toolkit_tpu.optimizers.kernel_families import gp
        return gp.can_use_cost(self, tile_k=tile_k)

    def _build_pallas_gp_cost(self, interpret: bool = False,
                              tile_k: int = None):
        from control_toolkit_tpu.optimizers.kernel_families import gp
        return gp.build_cost(self, interpret=interpret, tile_k=tile_k)

    def _pallas_residual_compatible_model(self) -> bool:
        from control_toolkit_tpu.optimizers.kernel_families import residual
        return residual.compatible_model(self)

    def _can_use_pallas_residual(self, tile_k: int = None) -> bool:
        from control_toolkit_tpu.optimizers.kernel_families import residual
        return residual.can_use_cost(self, tile_k=tile_k)

    def _can_use_pallas_residual_grad(self) -> bool:
        from control_toolkit_tpu.optimizers.kernel_families import residual
        return residual.can_use_grad(self)

    def _residual_kernel_bits(self):
        from control_toolkit_tpu.optimizers.kernel_families import residual
        return residual.kernel_bits(self)

    def _build_pallas_residual_cost(self, interpret: bool = False,
                                    tile_k: int = None):
        from control_toolkit_tpu.optimizers.kernel_families import residual
        return residual.build_cost(self, interpret=interpret, tile_k=tile_k)

    def _build_pallas_residual_grad(self, interpret: bool = False,
                                    tile_k: int = None):
        from control_toolkit_tpu.optimizers.kernel_families import residual
        return residual.build_grad(self, interpret=interpret, tile_k=tile_k)

    def _make_grad_and_cost_only(self):
        """The gradient-path pair every AD optimizer uses:

        ``grad_fn(Q, s_tiled, u_prev, params) -> d(sum_k J_k)/dQ`` and the
        best available ``cost_only`` evaluator (or None when logging is on —
        callers then keep the trajectory path for diagnostics).

        On TPU with an eligible model the gradient comes from a fused
        Pallas forward+backward kernel — ops/pallas_grad.py for analytic
        ODE dynamics (~4x XLA-AD at K=16k) or its neural twin for learned
        MLP dynamics; otherwise jax.grad through the fused scan."""
        if not self.optimizer_logging:
            from control_toolkit_tpu.optimizers import kernel_families as kf

            for fam in kf.GRAD_ORDER:
                if fam.can_use_grad(self):
                    pallas_grad = fam.build_grad(self)

                    def grad_fn(Q, s_tiled, u_prev, params):
                        return pallas_grad(s_tiled, Q, u_prev, params)[1]

                    return grad_fn, self._make_cost_only()

        cost_only = (
            None if self.optimizer_logging
            else self._make_cost_only(differentiable=True)
        )
        eval_cost = cost_only or (
            lambda s, Q, up, p: self._rollout_and_cost(s, Q, up, p)[0]
        )
        grad_fn = jax.grad(
            lambda Q, s, up, p: jnp.sum(eval_cost(s, Q, up, p))
        )
        return grad_fn, cost_only

    def _can_use_pallas_grad(self) -> bool:
        from control_toolkit_tpu.optimizers.kernel_families import ode
        return ode.can_use_grad(self)

    def _ensemble_grad_tile(self) -> int:
        from control_toolkit_tpu.optimizers.kernel_families import ensemble
        return ensemble.grad_tile(self)

    def _can_use_pallas_ensemble_grad(self) -> bool:
        from control_toolkit_tpu.optimizers.kernel_families import ensemble
        return ensemble.can_use_grad(self)

    def _build_pallas_ensemble_grad(self, interpret: bool = False,
                                    tile_k: int = None):
        from control_toolkit_tpu.optimizers.kernel_families import ensemble
        return ensemble.build_grad(self, interpret=interpret, tile_k=tile_k)

    def _can_use_pallas_neural_grad(self) -> bool:
        from control_toolkit_tpu.optimizers.kernel_families import neural
        return neural.can_use_grad(self)

    def _build_pallas_neural_grad(self, interpret: bool = False,
                                  tile_k: int = None):
        from control_toolkit_tpu.optimizers.kernel_families import neural
        return neural.build_grad(self, interpret=interpret, tile_k=tile_k)

    def _can_use_pallas_gp_grad(self) -> bool:
        from control_toolkit_tpu.optimizers.kernel_families import gp
        return gp.can_use_grad(self)

    def _build_pallas_gp_grad(self, interpret: bool = False,
                              tile_k: int = None):
        from control_toolkit_tpu.optimizers.kernel_families import gp
        return gp.build_grad(self, interpret=interpret, tile_k=tile_k)

    def _grad_kernel_model_ok(self, has_per_slot_dyn: bool = False) -> bool:
        """Model-compatibility half of the batched gradient-kernel gates
        (BatchedMPC._batched_{rpgd,gradient}_eligible and the ClosedLoop
        sweep gate): SOA ODE models always qualify; neural MLP and
        sparse-GP models qualify when no per-slot dynamics are requested
        (their parameters ride as shared VMEM operands, so
        heterogeneous-fleet models would need per-lane arrays) and, for
        neural, the net is not recurrent."""
        if self._pallas_compatible_model():
            return True
        # Residual models: per-slot dyn IS supported (the per-slot leaves
        # are the base's scalar constants; only the MLP weights are shared).
        if self._pallas_residual_compatible_model():
            return True
        if has_per_slot_dyn:
            return False
        pred = getattr(self.predictor, "predictor", self.predictor)
        if self._pallas_gp_compatible_model():
            return True
        return (
            self._pallas_neural_compatible_model()
            and not getattr(pred, "recurrent", False)
            # Measured negative (round-5 recheck + shape probe, BENCH_SCALE
            # batched_rpgd_neural): at per-slot K=32 the batched NEURAL
            # gradient kernel loses to the vmapped XLA-AD scan (~1.6 vs
            # ~1.3 ms — tiny per-iteration matmuls pipeline better in XLA),
            # is neutral at K=128 and wins 1.4x at K=512.  Engage the
            # kernel only where it measured >= parity; docs/KERNELS.md.
            and self.num_rollouts >= 128
        )

    def _grad_kernel_tile_ok(self, total_k: int) -> bool:
        """Tile-feasibility half of the batched gradient-kernel gates: a
        VMEM-feasible grad tile must divide ``total_k`` (= B*K for fleets,
        N*K for sweeps).  Sparse-GP models additionally budget the [M, tile]
        RBF blocks the GP backward holds in VMEM — without this the gate
        would admit a fleet whose binder then fails, instead of falling
        back to the vmapped path."""
        from control_toolkit_tpu.models.gp_predictor import GPPredictor
        from control_toolkit_tpu.ops.pallas_grad import (
            gp_grad_tile_dividing,
            grad_tile_dividing,
        )

        pred = getattr(self.predictor, "predictor", self.predictor)
        if isinstance(pred, GPPredictor):
            return gp_grad_tile_dividing(
                self.num_states, self.mpc_horizon,
                self._gp_num_inducing(), total_k,
            ) > 0
        return grad_tile_dividing(
            self.num_states, self.mpc_horizon, total_k
        ) > 0

    def _bind_batched_grad_kernels(self, num_slots: int, tile_k: int = None,
                                   per_slot_dyn=(), per_slot_cost=(),
                                   interpret: bool = False):
        """Columns-mode gradient/cost kernel pair + slot packer for a
        B-session fleet — see kernel_families/batched.py."""
        from control_toolkit_tpu.optimizers.kernel_families import batched
        return batched.bind_batched_grad_kernels(
            self, num_slots, tile_k=tile_k, per_slot_dyn=per_slot_dyn,
            per_slot_cost=per_slot_cost, interpret=interpret,
        )

    # ---- sharding ---------------------------------------------------------
    def plan_sharding(self, mesh, axis: Optional[str] = None) -> None:
        """Shard the rollout population over a device mesh.

        Per-rollout state leaves ([K, ...]) are placed with
        ``NamedSharding(mesh, P(axes, ...))``; XLA then partitions the jitted
        step and inserts the ICI (and, for multi-slice meshes, DCN)
        collectives for top-k / softmax reductions (SURVEY §2 plan).  For a
        1-D mesh the population shards over its single axis; for a 2-D
        ('slice', 'k') mesh it shards over both.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        K = self.num_rollouts
        if axis is not None:
            axes = (axis,) if isinstance(axis, str) else tuple(axis)
        else:
            axes = tuple(mesh.axis_names)
        first = axes if len(axes) > 1 else axes[0]
        self._mesh = mesh
        self._shard_axes = axes

        def place(state):
            def leaf_sharding(x):
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == K:
                    spec = P(first, *([None] * (x.ndim - 1)))
                else:
                    spec = P()
                return jax.device_put(x, NamedSharding(mesh, spec))
            return jax.tree_util.tree_map(leaf_sharding, state)

        self._shard_state = place
        if self.opt_state is not None:
            self.opt_state = place(self.opt_state)
        # Rebuild the step: the Pallas paths must see the sharding decision
        # (they run per-device on the local K shard via shard_map).
        self._build()

    @property
    def optimizer_name(self) -> str:
        return self.registered_name
