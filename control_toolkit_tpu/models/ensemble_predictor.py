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
_HASH_D = np.uint32(0x85EBCA6B)
_HASH_S = np.uint32(0xC2B2AE35)


def bound_logvar(raw: jnp.ndarray, lo: float = -8.0, hi: float = 2.0) -> jnp.ndarray:
    """Soft-bound a raw log-variance head to [lo, hi] (PETS-style softplus
    squashing — hard clips would kill the gradient outside the band)."""
    lv = hi - jax.nn.softplus(hi - raw)
    return lo + jax.nn.softplus(lv - lo)


def _mix32(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3-style finalizer: decorrelates the structured (k, t, d) seeds."""
    h = h ^ (h >> 16)
    h = h * _HASH_D
    h = h ^ (h >> 13)
    h = h * _HASH_S
    return h ^ (h >> 16)


def counter_normal(rows: jnp.ndarray, t, dims: int, seed: int) -> jnp.ndarray:
    """Deterministic standard-normal draws from a counter hash: one value
    per (row, t, dim), no PRNG key threading (the predictor protocol's
    ``rollout(s0, Q, params)`` has nowhere to carry a key).  Box-Muller on
    two decorrelated 24-bit uniforms.  rows [B] (global rollout indices),
    t scalar step, dims = number of per-row draws -> [B, dims]."""
    r = rows.astype(jnp.uint32)[:, None]
    d = jnp.arange(dims, dtype=jnp.uint32)[None, :]
    base = (r * _HASH_K) ^ (jnp.uint32(t) * _HASH_T) ^ (d * _HASH_D) \
        ^ jnp.uint32(seed)
    h1 = _mix32(base)
    h2 = _mix32(base ^ jnp.uint32(0x6A09E667))
    # 24-bit mantissa uniforms in (0, 1] — u1 must avoid 0 for the log.
    u1 = (h1 >> jnp.uint32(8)).astype(jnp.float32) * (2.0 ** -24) + 2.0 ** -25
    u2 = (h2 >> jnp.uint32(8)).astype(jnp.float32) * (2.0 ** -24)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)


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
        probabilistic: bool = False,
        noise_seed: int = 0,
        **kwargs,
    ):
        """``probabilistic=True`` (the PETS 'PE' model class): members output
        a Gaussian head (mean + soft-bounded log-variance, trained with NLL
        — ``fit_ensemble_mlp_dynamics(probabilistic=True)``) and rollouts
        PROPAGATE the aleatoric noise: x' = x + mean + std * eps with eps
        drawn per (rollout, step, dim) from a counter hash (deterministic,
        key-free).  ``single_step`` is then None so every optimizer cost
        path takes the full noisy ``rollout`` — a mean-propagating fused
        scan would silently drop the sampling semantics.  The batch-1
        nominal replay / odd batches use the noise-free ensemble-mean
        dynamics (the expected model)."""
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
        self.probabilistic = bool(probabilistic)
        self.noise_seed = int(noise_seed)
        self.arch = nets.parse_net_name(net_name)
        if self.arch["kind"] != "mlp":
            raise ValueError(
                "EnsemblePredictor supports MLP members only (recurrent "
                f"ensembles would need per-member hidden threading); got {net_name!r}"
            )

        in_dim = self.num_states + self.num_control_inputs
        out_dim = 2 * self.num_states if self.probabilistic else self.num_states
        sizes = [in_dim] + list(self.arch["hiddens"]) + [out_dim]
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
                if bool(meta.get("probabilistic", self.probabilistic)) != self.probabilistic:
                    raise ValueError(
                        f"checkpoint {ckpt} probabilistic="
                        f"{meta.get('probabilistic')} but predictor configured "
                        f"probabilistic={self.probabilistic} (add/remove the "
                        "':prob' spec token)"
                    )
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
    def _member_heads(self, net: Dict, x: jnp.ndarray, u: jnp.ndarray):
        """Raw heads under ONE member's (unstacked) params: (mean_target,
        std_target) in TARGET space (delta or absolute).  std is None for
        deterministic members; for probabilistic members the log-variance
        head is soft-bounded and the std de-normalizes with the target
        scale (the mean head's norm_out_std)."""
        S = self.num_states
        inp = jnp.concatenate([x, u], axis=-1)
        if "norm_in_mean" in net:
            inp = (inp - net["norm_in_mean"]) / net["norm_in_std"]
        core = {k: v for k, v in net.items() if not k.startswith("norm_")}
        out = nets.mlp_apply(core, inp)
        if not self.probabilistic:
            if "norm_out_mean" in net:
                out = out * net["norm_out_std"] + net["norm_out_mean"]
            return out, None
        mean, raw_lv = out[..., :S], out[..., S:]
        std = jnp.exp(0.5 * bound_logvar(raw_lv))
        if "norm_out_mean" in net:
            mean = mean * net["norm_out_std"] + net["norm_out_mean"]
            std = std * net["norm_out_std"]
        return mean, std

    def _member_step(self, net: Dict, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        """One MEAN transition under ONE member's params (deterministic
        propagation — the aleatoric head, if any, is not sampled here)."""
        mean, _ = self._member_heads(net, x, u)
        return x + mean if self.predict_delta else mean

    def _member_step_noisy(self, net: Dict, x, u, eps) -> jnp.ndarray:
        """One SAMPLED transition: mean + std * eps (probabilistic only)."""
        mean, std = self._member_heads(net, x, u)
        out = mean + std * eps
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

        Probabilistic and TS-1 ensembles return None: a step function has
        no (rollout, step) counter to seed the aleatoric draw or the
        member re-draw, so a fused blockwise/mean scan would silently
        drop the sampling semantics — cost paths must take the full
        ``rollout`` (review finding: ts='1' used to leak onto the fused
        scan as TS-inf).
        """
        if self.probabilistic or self.ts == "1":
            return None
        return self._mean_step

    @property
    def _mean_step(self):
        """(x, u, p) -> x_next under mean propagation: blockwise member
        assignment for splitting batches, ensemble mean otherwise.  The
        deterministic core behind ``single_step`` and the rollout fallback
        (probabilistic predictors use it for the batch-1 replay too —
        the expected model, noise-free)."""
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

        prob = self.probabilistic
        noise_seed = self.noise_seed
        noisy_step = self._member_step_noisy

        if self.ts == "1" and K > 1 and E > 1:
            # TS-1: hash-based member re-draw per (rollout, step).  All
            # members evaluate the full batch (E x FLOPs), then each rollout
            # selects its step member.  Deterministic — no key threading.
            k_idx = jnp.arange(K, dtype=jnp.uint32)
            rows = jnp.arange(K)

            def body(x, inp):
                u, t = inp
                if prob:
                    eps = counter_normal(rows, t, S, noise_seed)
                    xn_all = jax.vmap(
                        lambda n: noisy_step(n, x, u, eps)
                    )(net)                                          # [E,K,S]
                else:
                    xn_all = jax.vmap(lambda n: member_step(n, x, u))(net)
                # _mix32 finalizer: without it, power-of-two E degenerates
                # to (k mod E) XOR (t mod E) — a rigid round-robin, not
                # sampling (review finding).
                m = _mix32((k_idx * _HASH_K) ^ (t * _HASH_T)) % jnp.uint32(E)
                xn = xn_all[m.astype(jnp.int32), rows]
                return xn, xn

            _, traj = jax.lax.scan(
                body, s0,
                (jnp.swapaxes(Q, 0, 1), jnp.arange(H, dtype=jnp.uint32)),
            )
            traj = jnp.swapaxes(traj, 0, 1)
            return jnp.concatenate([s0[:, None, :], traj], axis=1)

        if K % E == 0 and (K > 1 or E == 1):
            # TS-inf blockwise: block e of K/E rollouts under member e;
            # probabilistic members additionally propagate their aleatoric
            # head with per-(global rollout, step, dim) counter noise.
            xe = s0.reshape(E, K // E, S)
            Qe = Q.reshape(E, K // E, H, Q.shape[-1])
            rows_e = jnp.arange(K, dtype=jnp.uint32).reshape(E, K // E)

            def member_rollout(n, x0, q, rows):
                def body(x, inp):
                    u, t = inp
                    if prob:
                        eps = counter_normal(rows, t, S, noise_seed)
                        xn = noisy_step(n, x, u, eps)
                    else:
                        xn = member_step(n, x, u)
                    return xn, xn

                _, tr = jax.lax.scan(
                    body, x0,
                    (jnp.swapaxes(q, 0, 1), jnp.arange(H, dtype=jnp.uint32)),
                )
                return jnp.concatenate(
                    [x0[:, None, :], jnp.swapaxes(tr, 0, 1)], axis=1
                )

            traj = jax.vmap(member_rollout)(net, xe, Qe, rows_e)
            return traj.reshape(K, H + 1, S)

        # Ensemble-mean dynamics (batch-1 replay / odd batch sizes) —
        # noise-free even for probabilistic members (the expected model).
        step = self._mean_step

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
