"""Probabilistic-ensemble dynamics predictor with trajectory sampling (PETS).

The reference's learned predictors come from SI_Toolkit and are always a
SINGLE network (predictor kinds named in
/root/reference/Control_Toolkit_ASF_Template/config_controllers.yml:8); it
has no notion of epistemic model uncertainty.  This module adds the standard
model-based-control answer — an ensemble of independently-initialized,
bootstrap-trained dynamics MLPs with PETS-style trajectory sampling (Chua et
al., NeurIPS 2018) — as a first-class predictor that plugs into every
optimizer in the zoo through the same ``rollout``/``single_step`` protocol
as the other predictors (models/predictors.py).

TPU-native design: the member axis is a LEADING axis on every parameter
leaf, so "evaluate member e" is one ``jax.vmap`` over the stacked params —
XLA turns the E members into E-way batched matmuls on the MXU with zero
gather traffic.  Trajectory-sampling modes:

- ``ts="inf"`` (default, PETS TS-infinity): each rollout keeps one member
  for the whole horizon.  With K divisible by E the population is split
  into E contiguous blocks of K/E rollouts and each block scans under its
  own member — a pure ``vmap`` over the member axis, the cheapest possible
  layout (identical FLOPs to a single net of the same width).
- ``ts="1"`` (PETS TS-1): every rollout re-draws its member each step via a
  counter-based hash (pure function of (rollout, step) — no RNG key has to
  thread through the predictor protocol).  Costs E x FLOPs per step because
  all members evaluate the full batch; use for small nets / when member
  switching matters.

Batches that don't split over members (the batch-1 nominal-trajectory
replay, the policy warm-start plan, an attached environment) fall back to
the ENSEMBLE-MEAN dynamics — the expected model — so every consumer of the
predictor protocol keeps working.

Weights are ordinary params-pytree leaves (``params["dyn"]["net"]``):
re-fits and checkpoint swaps never recompile, exactly like the other
learned predictors.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.models import networks as nets
from control_toolkit_tpu.models.predictors import Predictor
from control_toolkit_tpu.utils import registry
from control_toolkit_tpu.utils.logging_util import get_logger
from control_toolkit_tpu.utils.rng import make_key

logger = get_logger(__name__)

# Knuth multiplicative + golden-ratio constants for the TS-1 member hash.
_HASH_K = np.uint32(2654435761)
_HASH_T = np.uint32(0x9E3779B9)


def ensemble_checkpoint_name(net_name: str, n_members: int) -> str:
    return f"ensemble-{net_name}-x{n_members}.npz"


@registry.predictors.register("ensemble")
class EnsemblePredictor(Predictor):
    """Ensemble of delta-dynamics MLPs with trajectory sampling."""

    def __init__(
        self,
        environment_name: str = "cartpole",
        dt: float = 0.02,
        net_name: str = "mlp-32-32",
        n_members: int = 5,
        num_states: Optional[int] = None,
        num_control_inputs: Optional[int] = None,
        path_to_models: Optional[str] = None,
        predict_delta: bool = True,
        seed: int = 0,
        params: Optional[Dict] = None,
        ts: str = "inf",
        **kwargs,
    ):
        from control_toolkit_tpu.models.dynamics import DYNAMICS

        if num_states is None:
            _, _, num_states, num_control_inputs = DYNAMICS[environment_name.lower()]
        self.num_states = int(num_states)
        self.num_control_inputs = int(num_control_inputs)
        self.dt = float(dt)
        self.net_name = net_name
        self.n_members = int(n_members)
        if self.n_members < 1:
            raise ValueError(f"n_members must be >= 1, got {n_members}")
        self.predict_delta = bool(predict_delta)
        if ts not in ("inf", "1"):
            raise ValueError(f"ts must be 'inf' or '1', got {ts!r}")
        self.ts = ts
        self.arch = nets.parse_net_name(net_name)
        if self.arch["kind"] != "mlp":
            raise ValueError(
                "EnsemblePredictor supports MLP members only (recurrent "
                f"ensembles would need per-member hidden threading); got {net_name!r}"
            )

        in_dim = self.num_states + self.num_control_inputs
        sizes = [in_dim] + list(self.arch["hiddens"]) + [self.num_states]
        if params is not None:
            self.net_params = params
            self._validate_member_axis()
        else:
            ckpt = Path(path_to_models or ".") / ensemble_checkpoint_name(
                net_name, self.n_members
            )
            if ckpt.is_file():
                self.net_params, meta = nets.load_net(ckpt)
                self.predict_delta = bool(meta.get("predict_delta", predict_delta))
                if int(meta.get("n_members", self.n_members)) != self.n_members:
                    raise ValueError(
                        f"checkpoint {ckpt} holds {meta.get('n_members')} members, "
                        f"predictor configured for {self.n_members}"
                    )
                self._validate_member_axis()
                logger.info(f"loaded ensemble {net_name} x{self.n_members} from {ckpt}")
            else:
                key = make_key(seed, "ensemble_predictor")
                keys = jax.random.split(key, self.n_members)
                self.net_params = jax.vmap(lambda k: nets.mlp_init(k, sizes))(keys)
                logger.warning(
                    f"no checkpoint for ensemble {net_name} x{self.n_members}; "
                    "random init"
                )

    def _validate_member_axis(self) -> None:
        E = self.n_members
        for k, v in self.net_params.items():
            if jnp.ndim(v) < 1 or v.shape[0] != E:
                raise ValueError(
                    f"ensemble param leaf {k!r} has shape {jnp.shape(v)}; "
                    f"expected leading member axis of size {E}"
                )

    def default_params(self) -> Dict:
        return {"net": self.net_params}

    # ---- member-local transition -------------------------------------------
    def _member_step(self, net: Dict, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        """One transition under ONE member's (unstacked) params."""
        inp = jnp.concatenate([x, u], axis=-1)
        if "norm_in_mean" in net:
            inp = (inp - net["norm_in_mean"]) / net["norm_in_std"]
        core = {k: v for k, v in net.items() if not k.startswith("norm_")}
        out = nets.mlp_apply(core, inp)
        if "norm_out_mean" in net:
            out = out * net["norm_out_std"] + net["norm_out_mean"]
        return x + out if self.predict_delta else out

    # ---- Predictor protocol --------------------------------------------------
    @property
    def single_step(self):
        """Pure (x, u, params) -> x_next for the fused-scan cost paths.

        Batch sizes divisible by E take blockwise TS-inf member assignment
        (block b of K/E rows scans under member b); anything else — the
        batch-1 nominal replay, the policy warm-start plan, an attached env
        — evaluates all members and returns the ensemble-mean next state.
        Shapes are static under jit, so the branch resolves at trace time.
        """
        E = self.n_members
        member_step = self._member_step

        def step(x, u, p):
            net = p["net"]
            B = x.shape[0]
            if E == 1:
                one = jax.tree_util.tree_map(lambda w: w[0], net)
                return member_step(one, x, u)
            if B % E == 0 and B > 1:
                xe = x.reshape(E, B // E, x.shape[-1])
                ue = u.reshape(E, B // E, u.shape[-1])
                xn = jax.vmap(member_step)(net, xe, ue)
                return xn.reshape(B, x.shape[-1])
            xn_all = jax.vmap(lambda n: member_step(n, x, u))(net)
            return jnp.mean(xn_all, axis=0)

        return step

    def rollout(self, s0, Q, params=None):
        p = self.default_params() if params is None else params
        net = p["net"]
        K, S = s0.shape
        H = Q.shape[1]
        E = self.n_members
        member_step = self._member_step

        if self.ts == "1" and K > 1 and E > 1:
            # TS-1: hash-based member re-draw per (rollout, step).  All
            # members evaluate the full batch (E x FLOPs), then each rollout
            # selects its step member.  Deterministic — no key threading.
            k_idx = jnp.arange(K, dtype=jnp.uint32)
            rows = jnp.arange(K)

            def body(x, inp):
                u, t = inp
                xn_all = jax.vmap(lambda n: member_step(n, x, u))(net)  # [E,K,S]
                m = ((k_idx * _HASH_K) ^ (t * _HASH_T)) % jnp.uint32(E)
                xn = xn_all[m.astype(jnp.int32), rows]
                return xn, xn

            _, traj = jax.lax.scan(
                body, s0,
                (jnp.swapaxes(Q, 0, 1), jnp.arange(H, dtype=jnp.uint32)),
            )
            traj = jnp.swapaxes(traj, 0, 1)
            return jnp.concatenate([s0[:, None, :], traj], axis=1)

        if K % E == 0 and (K > 1 or E == 1):
            # TS-inf blockwise: block e of K/E rollouts under member e.
            xe = s0.reshape(E, K // E, S)
            Qe = Q.reshape(E, K // E, H, Q.shape[-1])

            def member_rollout(n, x0, q):
                def body(x, u):
                    xn = member_step(n, x, u)
                    return xn, xn

                _, tr = jax.lax.scan(body, x0, jnp.swapaxes(q, 0, 1))
                return jnp.concatenate(
                    [x0[:, None, :], jnp.swapaxes(tr, 0, 1)], axis=1
                )

            traj = jax.vmap(member_rollout)(net, xe, Qe)
            return traj.reshape(K, H + 1, S)

        # Ensemble-mean dynamics (batch-1 replay / odd batch sizes).
        step = self.single_step

        def body(x, u):
            xn = step(x, u, p)
            return xn, xn

        _, traj = jax.lax.scan(body, s0, jnp.swapaxes(Q, 0, 1))
        traj = jnp.swapaxes(traj, 0, 1)
        return jnp.concatenate([s0[:, None, :], traj], axis=1)

    # ---- diagnostics ----------------------------------------------------------
    def rollout_all_members(self, s0, Q, params=None) -> jnp.ndarray:
        """Every member rolls the SAME batch: [E, K, H+1, S]."""
        p = self.default_params() if params is None else params
        net = p["net"]
        member_step = self._member_step

        def member_rollout(n):
            def body(x, u):
                xn = member_step(n, x, u)
                return xn, xn

            _, tr = jax.lax.scan(body, s0, jnp.swapaxes(Q, 0, 1))
            return jnp.concatenate([s0[:, None, :], jnp.swapaxes(tr, 0, 1)], axis=1)

        return jax.vmap(member_rollout)(net)

    def disagreement(self, s0, Q, params=None) -> jnp.ndarray:
        """Per-rollout epistemic uncertainty: mean over horizon x states of
        the cross-member std of the predicted trajectory -> [K].  Useful as
        a risk penalty or an exploration signal."""
        trajs = self.rollout_all_members(s0, Q, params)
        return jnp.mean(jnp.std(trajs, axis=0), axis=(1, 2))
