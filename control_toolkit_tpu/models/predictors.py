"""Dynamics predictors: horizon rollout of batched control sequences.

Capability parity with SI_Toolkit's PredictorWrapper surface as used by the
reference (configure/predict_core/update/copy + num_states/num_control_inputs;
see /root/reference/Controllers/controller_mpc.py:67-73,
/root/reference/Optimizers/optimizer_mppi.py:133-137,188,195-197).

TPU-native redesign: a predictor is a thin object holding a *pure* rollout
function ``rollout(s0, Q, params) -> [B, H+1, S]`` built on ``lax.scan`` over
the horizon.  No batch-size freezing is needed (XLA specializes per shape);
``copy()`` therefore just returns self for stateless predictors.  Stateful
(RNN) predictors thread their carry explicitly (``init_carry``/``update``).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from control_toolkit_tpu.models.dynamics import DYNAMICS, DynamicsFn
from control_toolkit_tpu.utils.logging_util import get_logger
from control_toolkit_tpu.utils import registry

logger = get_logger(__name__)


def euler_step(f: DynamicsFn, x, u, dt, p):
    return x + dt * f(x, u, p)


def rk4_step(f: DynamicsFn, x, u, dt, p):
    k1 = f(x, u, p)
    k2 = f(x + 0.5 * dt * k1, u, p)
    k3 = f(x + 0.5 * dt * k2, u, p)
    k4 = f(x + dt * k3, u, p)
    return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


INTEGRATORS = {"euler": euler_step, "rk4": rk4_step}


def make_ode_rollout(
    dynamics: DynamicsFn, dt: float, integrator: str = "rk4", intermediate_steps: int = 1
) -> Callable:
    """Build a pure rollout function for an ODE predictor.

    Returns ``rollout(s0 [B,S], Q [B,H,U], params) -> [B,H+1,S]``.  The
    horizon is a ``lax.scan`` (sequential state recurrence — SURVEY §2
    parallelism note); the K-batch rides inside each scan step as one fused
    vector op, which is where the TPU parallelism lives.
    """
    step_fn = INTEGRATORS[integrator]
    sub_dt = dt / intermediate_steps

    def single_step(x, u, params):
        for _ in range(intermediate_steps):
            x = step_fn(dynamics, x, u, sub_dt, params)
        return x

    def rollout(s0: jnp.ndarray, Q: jnp.ndarray, params: Dict) -> jnp.ndarray:
        return scan_rollout(single_step, s0, Q, params)

    rollout.single_step = single_step  # exposed for fused cost rollouts
    return rollout


def scan_rollout(step, s0: jnp.ndarray, Q: jnp.ndarray, params) -> jnp.ndarray:
    """Horizon rollout of any ``step(x [B,S], u [B,U], params) -> [B,S]``
    as one time-major ``lax.scan``: [B,S] x [B,H,U] -> [B,H+1,S] with s0
    prepended.  The single shared body for every single_step-based
    predictor (ODE / neural MLP / sparse-GP / residual) — the recurrent
    nets keep their own scan (hidden rides the carry)."""
    Q_t = jnp.swapaxes(Q, 0, 1)  # [H, B, U]

    def body(x, u):
        x_next = step(x, u, params)
        return x_next, x_next

    _, traj = jax.lax.scan(body, s0, Q_t)
    return jnp.concatenate([s0[:, None, :], jnp.swapaxes(traj, 0, 1)], axis=1)


class Predictor:
    """Base predictor: pure rollout plus optional explicit carry."""

    num_states: int
    num_control_inputs: int

    def rollout(self, s0: jnp.ndarray, Q: jnp.ndarray, params: Optional[Dict] = None) -> jnp.ndarray:
        raise NotImplementedError

    # predict_core alias for parity with the reference naming.
    def predict_core(self, s0, Q, params=None):
        return self.rollout(s0, Q, params)

    def update(self, s, Q0, params=None) -> None:
        """Advance internal (RNN) state with the actually applied control.

        No-op for stateless predictors (reference: predictor.update used by
        MPPI, optimizer_mppi.py:195-197).
        """

    def copy(self) -> "Predictor":
        return self

    def default_params(self) -> Dict:
        return {}

    @property
    def single_step(self):
        """Single-transition fn, or None if this predictor can't expose one
        (then the fused rollout paths fall back to the full-trajectory scan)."""
        return None

    @property
    def is_stateful(self) -> bool:
        """True when the predictor carries mutable internal state (RNN
        hidden) that must be re-threaded into params every control step."""
        return False


@registry.predictors.register("ODE")
class ODEPredictor(Predictor):
    """ODE-integrator predictor over a named built-in dynamics model."""

    def __init__(
        self,
        environment_name: str = "cartpole",
        dt: float = 0.02,
        integrator: str = "rk4",
        intermediate_steps: int = 1,
        dynamics: Optional[DynamicsFn] = None,
        num_states: Optional[int] = None,
        num_control_inputs: Optional[int] = None,
        params: Optional[Dict] = None,
        fast_math: bool = False,
    ):
        if dynamics is not None:
            if num_states is None or num_control_inputs is None:
                raise ValueError("custom dynamics needs num_states/num_control_inputs")
            self.dynamics = dynamics
            self._defaults = dict(params or {})
            self.num_states = num_states
            self.num_control_inputs = num_control_inputs
        else:
            key = environment_name.lower()
            if key not in DYNAMICS:
                raise KeyError(
                    f"No built-in dynamics for environment {environment_name!r}; "
                    f"available: {sorted(DYNAMICS)}"
                )
            fn, defaults, n_s, n_u = DYNAMICS[key]
            self.dynamics = fn
            self._defaults = dict(defaults)
            if params:
                self._defaults.update(params)
            self.num_states = n_s
            self.num_control_inputs = n_u
        # fast_math: polynomial trig (ops/fastmath.py) in BOTH the scan and
        # the Pallas-kernel paths so every evaluator of this predictor sees
        # the same numerics (~1e-5 trig error, big VPU savings on TPU).
        self.fast_math = bool(fast_math)
        if self.fast_math:
            fast = getattr(self.dynamics, "fast", None)
            if fast is not None:
                self.dynamics = fast
            else:
                logger.warning(
                    "fast_math requested but dynamics has no .fast variant; "
                    "using exact trig"
                )
        self.dt = float(dt)
        self.integrator = integrator
        self.intermediate_steps = int(intermediate_steps)
        self.rollout_fn = make_ode_rollout(
            self.dynamics, self.dt, integrator, self.intermediate_steps
        )

    def default_params(self) -> Dict:
        return dict(self._defaults)

    def rollout(self, s0, Q, params=None):
        p = self._defaults if params is None else params
        return self.rollout_fn(s0, Q, p)

    @property
    def single_step(self):
        """Pure single-transition fn (x, u, params) -> x_next, for fused
        rollout+cost paths (ops/rollout.py, ops/pallas_rollout.py)."""
        return self.rollout_fn.single_step


class PredictorWrapper:
    """Deferred-configuration predictor resolver.

    Mirrors the reference PredictorWrapper lifecycle: constructed empty, then
    ``configure(...)`` resolves the predictor specification string.  Spec
    grammar: ``"ODE"`` / ``"ODE_v0"`` (built-in dynamics for the environment,
    rk4), ``"ODE:euler"``, ``"ODE:rk4:2"`` (integrator / substeps),
    ``"ODE:rk4:1:fast"`` (polynomial trig, ops/fastmath.py), or a registered
    custom predictor name.
    """

    def __init__(self):
        self.predictor: Optional[Predictor] = None
        self.num_states: Optional[int] = None
        self.num_control_inputs: Optional[int] = None
        self._spec: Optional[str] = None

    def configure(
        self,
        batch_size: Optional[int] = None,   # accepted for API parity; unused (XLA respecializes)
        horizon: Optional[int] = None,
        dt: float = 0.02,
        predictor_specification: str = "ODE",
        environment_name: str = "cartpole",
        variable_parameters=None,
        **kwargs,
    ) -> None:
        self._spec = predictor_specification or "ODE"
        spec_parts = self._spec.split(":")
        head = spec_parts[0]
        low = head.lower()
        if head in ("ODE", "ODE_v0"):
            # "ODE[:integrator[:substeps]][:fast]"
            opts = list(spec_parts[1:])
            fast_math = "fast" in opts
            opts = [o for o in opts if o != "fast"]
            integrator = opts[0] if len(opts) > 0 else "rk4"
            substeps = int(opts[1]) if len(opts) > 1 else 1
            self.predictor = ODEPredictor(
                environment_name=environment_name,
                dt=dt,
                integrator=integrator,
                intermediate_steps=substeps,
                fast_math=fast_math,
                **kwargs,  # predictor_config (e.g. params= overrides) must
                           # not be silently dropped — every branch forwards
            )
        elif head == "ODE+res":
            # "ODE+res[:integrator[:substeps]][:fast]" — analytic base plus a
            # learned next-state MLP residual (adaptive MPC;
            # models/residual_predictor.py).  Hidden sizes via kwargs.
            opts = list(spec_parts[1:])
            fast_math = "fast" in opts
            opts = [o for o in opts if o != "fast"]
            from control_toolkit_tpu.models.residual_predictor import (
                ResidualPredictor,
            )
            self.predictor = ResidualPredictor(
                environment_name=environment_name,
                dt=dt,
                integrator=opts[0] if len(opts) > 0 else "rk4",
                intermediate_steps=int(opts[1]) if len(opts) > 1 else 1,
                fast_math=fast_math,
                **kwargs,
            )
        elif head == "ensemble" and len(spec_parts) > 1:
            # "ensemble:<net>:<E>[:<path>][:ts1][:prob]" — PETS-style
            # bootstrap ensemble with trajectory sampling
            # (models/ensemble_predictor.py).  E defaults to 5; ':prob'
            # selects Gaussian-head members with propagated aleatoric
            # noise (the PE model class).
            from control_toolkit_tpu.models.ensemble_predictor import (
                EnsemblePredictor,
            )
            opts = []
            for o in spec_parts[2:]:
                lo_ = o.lower()
                if lo_ in ("ts1", "ts-1"):
                    kwargs.setdefault("ts", "1")
                elif lo_ in ("prob", "pe"):
                    kwargs.setdefault("probabilistic", True)
                else:
                    opts.append(o)
            n_members = int(opts.pop(0)) if opts and opts[0].isdigit() else 5
            self.predictor = EnsemblePredictor(
                environment_name=environment_name, dt=dt,
                net_name=spec_parts[1], n_members=n_members,
                path_to_models=opts[0] if opts else None, **kwargs,
            )
        elif head == "neural" and len(spec_parts) > 1:
            # "neural:<net_name>[:<path>][:bf16]"
            opts = list(spec_parts[2:])
            if opts and opts[-1] in ("bf16", "bfloat16", "f32", "float32"):
                kwargs.setdefault("compute_dtype", opts.pop())
            from control_toolkit_tpu.models.neural_predictor import NeuralPredictor
            self.predictor = NeuralPredictor(
                environment_name=environment_name, dt=dt,
                net_name=spec_parts[1],
                path_to_models=opts[0] if opts else None,
                **kwargs,
            )
        elif low.startswith(("gru", "lstm", "mlp")):
            # Bare network name (reference style: 'GRU-6IN-32H1-32H2-5OUT-0')
            # with the same optional segments as the 'neural:' form
            # ('<net>[:<path>][:bf16]') — options must not be silently
            # dropped.
            opts = list(spec_parts[1:])
            if opts and opts[-1] in ("bf16", "bfloat16", "f32", "float32"):
                kwargs.setdefault("compute_dtype", opts.pop())
            from control_toolkit_tpu.models.neural_predictor import NeuralPredictor
            self.predictor = NeuralPredictor(
                environment_name=environment_name, dt=dt, net_name=head,
                path_to_models=opts[0] if opts else None, **kwargs
            )
        elif low.startswith("sgp") or low == "gp":
            # Sparse-GP predictor (reference style: 'SGP_30'); checkpoint path
            # as the second spec segment: "SGP_30:/path/to/gp.npz".  The spec
            # segment wins over a checkpoint kwarg (always popped so it can't
            # arrive twice).
            from control_toolkit_tpu.models.gp_predictor import GPPredictor
            kw_ckpt = kwargs.pop("checkpoint", None)
            ckpt = spec_parts[1] if len(spec_parts) > 1 else kw_ckpt
            self.predictor = GPPredictor(
                environment_name=environment_name, dt=dt, checkpoint=ckpt, **kwargs
            )
        elif head in registry.predictors:
            cls = registry.predictors.get(head)
            self.predictor = cls(environment_name=environment_name, dt=dt, **kwargs)
        else:
            raise KeyError(f"Unknown predictor specification {self._spec!r}")
        self.num_states = self.predictor.num_states
        self.num_control_inputs = self.predictor.num_control_inputs

    def default_params(self) -> Dict:
        return self.predictor.default_params() if self.predictor else {}

    def rollout(self, s0, Q, params=None):
        return self.predictor.rollout(s0, Q, params)

    def predict_core(self, s0, Q, params=None):
        return self.predictor.rollout(s0, Q, params)

    def update(self, s, Q0, params=None):
        return self.predictor.update(s, Q0, params)

    @property
    def single_step(self):
        return self.predictor.single_step if self.predictor else None

    @property
    def is_stateful(self) -> bool:
        return bool(self.predictor) and getattr(self.predictor, "is_stateful", False)

    def copy(self) -> "PredictorWrapper":
        new = PredictorWrapper()
        if self.predictor is not None:
            new.predictor = self.predictor.copy()
            new.num_states = self.num_states
            new.num_control_inputs = self.num_control_inputs
            new._spec = self._spec
        return new
