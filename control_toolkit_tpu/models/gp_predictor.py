"""Gaussian-process dynamics predictor.

The reference's predictor zoo includes GP models selected by name (e.g.
'SGP_30' in Control_Toolkit_ASF_Template/config_controllers.yml:8, the
sparse-GP predictor SI_Toolkit provides).  This module implements that
family TPU-natively: a subset-of-regressors sparse GP with an RBF kernel,
one independent output head per state-delta dimension.

Everything is matmuls: prediction for a batch of B states is
``k(x, Z) @ alpha`` — a [B, M] kernel block against M inducing points times
a precomputed [M, S] weight matrix, which XLA tiles straight onto the MXU.
The GP "parameters" (inducing inputs Z, weights alpha, kernel
hyperparameters, normalization constants) form the predictor params pytree,
so a re-fit swaps in without recompiling the controller.

Fitting (``fit_gp_dynamics``) selects M inducing points, optimizes nothing
iteratively — the SoR posterior mean has the closed form
``alpha = (K_zz + (sigma^2/1) K_zx K_xz / sigma^2)^-1 ...``; we use the
standard projected-process form computed with one Cholesky solve.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.models.predictors import Predictor
from control_toolkit_tpu.utils import registry
from control_toolkit_tpu.utils.logging_util import get_logger

logger = get_logger(__name__)


def _rbf(a: jnp.ndarray, b: jnp.ndarray, lengthscales: jnp.ndarray,
         variance: jnp.ndarray) -> jnp.ndarray:
    """RBF kernel block: a [N, D], b [M, D] -> [N, M]."""
    an = a / lengthscales
    bn = b / lengthscales
    d2 = (
        jnp.sum(an * an, -1, keepdims=True)
        - 2.0 * an @ bn.T
        + jnp.sum(bn * bn, -1)[None, :]
    )
    return variance * jnp.exp(-0.5 * jnp.maximum(d2, 0.0))


def fit_gp_dynamics(
    x: np.ndarray, u: np.ndarray, x_next: np.ndarray,
    num_inducing: int = 256, noise: float = 1e-6, seed: int = 0,
    lengthscale_scale: float = 3.0,
) -> Tuple[Dict, float]:
    """Fit a sparse (projected-process) GP to state deltas.

    Returns (params, normalized MSE on the training set).  Lengthscales are
    set by the median heuristic per input dimension; inducing points are a
    random training subset — the standard cheap initialization.
    """
    inp = np.concatenate([x, u], axis=-1).astype(np.float64)
    target = (x_next - x).astype(np.float64)
    in_mean, in_std = inp.mean(0), inp.std(0) + 1e-8
    t_mean, t_std = target.mean(0), target.std(0) + 1e-8
    Xn = (inp - in_mean) / in_std
    Yn = (target - t_mean) / t_std

    rng = np.random.default_rng(seed)
    M = min(num_inducing, Xn.shape[0])
    Z = Xn[rng.choice(Xn.shape[0], M, replace=False)]

    # median heuristic lengthscales (per normalized dimension)
    sub = Xn[rng.choice(Xn.shape[0], min(512, Xn.shape[0]), replace=False)]
    pd = np.abs(sub[:, None, :] - sub[None, :, :])
    # Median heuristic is too narrow for smooth dynamics surfaces; widen it
    # (empirically ~3x gives interpolation-quality fits at modest M).
    ls = (np.median(pd, axis=(0, 1)) + 1e-3) * lengthscale_scale
    variance = 1.0

    # The fit runs offline in numpy float64: the projected-process normal
    # equations are too ill-conditioned for a float32 solve.
    def np_rbf(a, b):
        an = a / ls
        bn = b / ls
        d2 = ((an * an).sum(-1)[:, None] - 2.0 * an @ bn.T
              + (bn * bn).sum(-1)[None, :])
        return variance * np.exp(-0.5 * np.maximum(d2, 0.0))

    Kzz = np_rbf(Z, Z)
    Kzx = np_rbf(Z, Xn)
    # alpha = (noise*Kzz + Kzx Kxz)^-1 Kzx Y   (projected process, scaled)
    A = noise * Kzz + Kzx @ Kzx.T + 1e-8 * np.eye(M)
    rhs = Kzx @ Yn
    alpha = np.linalg.solve(A, rhs)                       # [M, S]

    pred = np_rbf(Xn, Z) @ alpha
    mse = float(np.mean((pred - Yn) ** 2))
    logger.info(f"GP dynamics fit: M={M}, normalized MSE {mse:.3e}")

    params = {
        "Z": jnp.asarray(Z, jnp.float32),
        "alpha": jnp.asarray(alpha, jnp.float32),
        "lengthscales": jnp.asarray(ls, jnp.float32),
        "variance": jnp.float32(variance),
        "in_mean": jnp.asarray(in_mean, jnp.float32),
        "in_std": jnp.asarray(in_std, jnp.float32),
        "out_mean": jnp.asarray(t_mean, jnp.float32),
        "out_std": jnp.asarray(t_std, jnp.float32),
    }
    return params, mse


@registry.predictors.register("SGP")
@registry.predictors.register("gp")
class GPPredictor(Predictor):
    """Sparse-GP dynamics: x_{t+1} = x_t + GP(x_t, u_t)."""

    def __init__(
        self,
        environment_name: str = "cartpole",
        dt: float = 0.02,
        num_states: Optional[int] = None,
        num_control_inputs: Optional[int] = None,
        params: Optional[Dict] = None,
        checkpoint: Optional[str] = None,
        **kwargs,
    ):
        from control_toolkit_tpu.models.dynamics import DYNAMICS

        # Fill ONLY the Nones from the env defaults: an explicit
        # num_control_inputs must not be clobbered, and num_states alone
        # must not crash on int(None).
        if num_states is None or num_control_inputs is None:
            _, _, s_def, u_def = DYNAMICS[environment_name.lower()]
            num_states = s_def if num_states is None else num_states
            num_control_inputs = (
                u_def if num_control_inputs is None else num_control_inputs
            )
        self.num_states = int(num_states)
        self.num_control_inputs = int(num_control_inputs)
        self.dt = float(dt)
        if params is not None:
            self.gp_params = params
        elif checkpoint:
            data = np.load(checkpoint)
            self.gp_params = {k: jnp.asarray(data[k]) for k in data.files}
            logger.info(f"loaded GP dynamics from {checkpoint}")
        else:
            raise ValueError("GPPredictor needs fitted params or a checkpoint "
                             "(fit with models.gp_predictor.fit_gp_dynamics)")

    def default_params(self) -> Dict:
        return {"gp": self.gp_params}

    @property
    def single_step(self):
        def step(x, u, p):
            g = p["gp"]
            inp = (jnp.concatenate([x, u], -1) - g["in_mean"]) / g["in_std"]
            k = _rbf(inp, g["Z"], g["lengthscales"], g["variance"])
            delta = (k @ g["alpha"]) * g["out_std"] + g["out_mean"]
            return x + delta

        return step

    def rollout(self, s0, Q, params=None):
        from control_toolkit_tpu.models.predictors import scan_rollout

        p = self.default_params() if params is None else params
        return scan_rollout(self.single_step, s0, Q, p)

    def save(self, path) -> None:
        np.savez(path, **{k: np.asarray(v) for k, v in self.gp_params.items()})
