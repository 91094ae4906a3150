"""Generate the TF closed-loop MPPI golden trace (SURVEY §7 hard part 3).

Run manually in a TF-equipped environment:

    python tests/golden/generate_closed_loop_golden.py

Records a T-step closed-loop cartpole MPPI run computed ENTIRELY by
TensorFlow with reference semantics (optimizer_mppi.py:154-190): per tick —
shift nominal, add recorded inducing-point noise interpolated to the
horizon, clip, rollout, trajectory cost with the previously-applied
control, MPPI correction cost, softmax-weighted perturbation average,
nominal clip, plant advance with the applied control.  The noise tensor is
drawn once with numpy and SAVED, so the JAX replay (tests/test_tf_parity.py)
injects identical perturbations — parity covers the LOOP composition
(shift → sample → rollout+cost → update → plant), not just single updates.
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
import tensorflow as tf  # noqa: E402

tf.config.set_visible_devices([], "GPU")

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent.parent))

from generate_golden import tf_rk4, tf_rollout  # noqa: E402
from control_toolkit_tpu.costs.cartpole import CartpoleQuadraticCost  # noqa: E402

W = CartpoleQuadraticCost.DEFAULTS

T_STEPS = 20
K, H, U = 64, 25, 1
PERIOD = 5
DT = 0.02
TARGET = 0.2
LBD = 100.0
CC_WEIGHT, R, NU = 1.0, 1.0, 1000.0
STDEV = 0.2


def interp_matrix(horizon: int, period: int) -> np.ndarray:
    """Reference inducing-point upsampling (Interpolator.py:79-84):
    ceil((H-1)/p)+1 points spaced p steps apart, linear weights."""
    n_pts = int(np.ceil((horizon - 1) / period)) + 1
    mat = np.zeros((n_pts, horizon), dtype=np.float32)
    for h in range(horizon):
        left = h // period
        frac = (h % period) / period
        if left + 1 < n_pts:
            mat[left, h] = 1.0 - frac
            mat[left + 1, h] = frac
        else:
            mat[left, h] = 1.0
    return mat


def tf_trajectory_cost_uprev(traj, Q, u_prev):
    """Reference trajectory cost (mean over H stage + terminal) with the
    control-change term seeded by the applied control u_prev."""
    states = traj[:, :-1, :]
    pos, angle, angle_d = states[:, :, 0], states[:, :, 2], states[:, :, 3]
    dd = W["dd_weight"] * (pos - TARGET) ** 2
    ep = W["ep_weight"] * 0.25 * (1.0 - tf.cos(angle)) ** 2
    ekp = W["ekp_weight"] * (angle_d / (2.0 * np.pi)) ** 2
    cc = W["cc_weight"] * W["R"] * tf.reduce_sum(Q**2, axis=-1)
    prev = tf.concat(
        [tf.fill((Q.shape[0], 1, Q.shape[2]), float(u_prev)), Q[:, :-1, :]],
        axis=1,
    )
    ccrc = W["ccrc_weight"] * tf.reduce_sum((Q - prev) ** 2, axis=-1)
    stage = dd + ep + ekp + cc + ccrc
    t_angle = traj[:, -1, 2]
    t_angle_d = traj[:, -1, 3]
    terminal = 1.0e4 * (1.0 - tf.cos(t_angle)) ** 2 + 10.0 * t_angle_d**2
    total = tf.concat([stage, terminal[:, None]], axis=1)
    return tf.reduce_mean(total, axis=1)


def main():
    Wm = interp_matrix(H, PERIOD)            # [P, H]
    P = Wm.shape[0]
    rng = np.random.default_rng(1234)
    eps = (rng.normal(size=(T_STEPS, K, P, U)) * STDEV).astype(np.float32)

    s = np.array([0.05, 0.0, 0.2, 0.0], np.float32)
    u_nom = tf.zeros((H, U), tf.float32)
    u_prev = 0.0
    states, controls, min_costs = [], [], []

    for t in range(T_STEPS):
        u_nom = tf.concat([u_nom[1:], u_nom[-1:]], axis=0)
        delta = tf.einsum("kpu,ph->khu", tf.convert_to_tensor(eps[t]),
                          tf.convert_to_tensor(Wm))            # [K,H,U]
        u_run = tf.clip_by_value(u_nom[None] + delta, -1.0, 1.0)
        s_tiled = np.tile(s[None], (K, 1))
        traj = tf_rollout(s_tiled, u_run)
        base = tf_trajectory_cost_uprev(traj, u_run, u_prev)
        corr = CC_WEIGHT * tf.reduce_sum(
            0.5 * (1.0 - 1.0 / NU) * R * delta**2
            + R * u_run * delta + 0.5 * R * u_run**2,
            axis=[1, 2],
        )
        total = base + corr
        rho = tf.reduce_min(total)
        w = tf.exp(-(total - rho) / LBD)
        b = tf.reduce_sum(w[:, None, None] * delta, axis=0) / tf.reduce_sum(w)
        u_nom = tf.clip_by_value(u_nom + b, -1.0, 1.0)
        u = u_nom[0]

        states.append(s.copy())
        controls.append(u.numpy().copy())
        min_costs.append(float(rho.numpy()))

        s = tf_rk4(s[None].astype(np.float32), u.numpy()[None])[0].numpy()
        u_prev = float(u.numpy()[0])

    out = HERE / "cartpole_closed_loop_golden.npz"
    np.savez_compressed(
        out,
        eps=eps, states=np.stack(states), controls=np.stack(controls),
        min_costs=np.asarray(min_costs, np.float32),
        s0=np.array([0.05, 0.0, 0.2, 0.0], np.float32),
        dt=np.float32(DT), target=np.float32(TARGET),
        period=np.int32(PERIOD), horizon=np.int32(H),
        lbd=np.float32(LBD), cc_weight=np.float32(CC_WEIGHT),
        R=np.float32(R), NU=np.float32(NU), stdev=np.float32(STDEV),
        tf_version=np.frombuffer(tf.__version__.encode(), np.uint8),
    )
    print(f"wrote {out} (tf {tf.__version__})")


if __name__ == "__main__":
    main()
