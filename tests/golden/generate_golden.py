"""Generate TensorFlow golden fixtures for the parity tests.

Run manually in an environment with TensorFlow installed:

    python tests/golden/generate_golden.py

Writes ``cartpole_golden.npz`` next to this file.  The recorded arrays are
the *reference-semantics* quantities computed by TensorFlow (the reference
framework) on fixed inputs:

  - open-loop rollout trajectory through the cartpole ODE (rk4, dt=0.02),
  - trajectory costs (mean over H stage costs + terminal, control-change
    term seeded with the applied control — reference
    Cost_Functions/__init__.py:74-93) and the elite ordering,
  - the MPPI softmax-weighted perturbation average
    (reference optimizer_mppi.py:163-168),
  - CEM elite refit mean/std (reference optimizer_cem_tf.py:73-78),
  - the gradient of the trajectory cost wrt Q through the rollout,
    per-rollout clip_by_norm over axes [1,2]
    (reference optimizer_rpgd.py:310-315), and one keras-Adam step on Q.

tests/test_tf_parity.py loads this file and asserts the JAX framework
reproduces every quantity — TF itself is NOT needed to run the tests.
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

from control_toolkit_tpu.costs.cartpole import CartpoleQuadraticCost  # noqa: E402
from control_toolkit_tpu.models.dynamics import CARTPOLE_DEFAULTS  # noqa: E402

DT = 0.02
P = dict(CARTPOLE_DEFAULTS)
W = CartpoleQuadraticCost.DEFAULTS
TARGET = 0.2
U_PREV = 0.1
LBD = 100.0
ELITE_K = 8
LEARNING_RATE = 0.05
GRAD_CLIP = 5.0


def tf_dynamics(x, u):
    pos_d = x[:, 1]
    theta = x[:, 2]
    theta_d = x[:, 3]
    force = u[:, 0] * P["u_max"]
    sin_t, cos_t = tf.sin(theta), tf.cos(theta)
    total_m = P["m_cart"] + P["m_pole"]
    temp = (force + P["m_pole"] * P["L"] * theta_d**2 * sin_t) / total_m
    theta_dd = (P["g"] * sin_t - cos_t * temp) / (
        P["L"] * (4.0 / 3.0 - P["m_pole"] * cos_t**2 / total_m)
    )
    pos_dd = temp - P["m_pole"] * P["L"] * theta_dd * cos_t / total_m
    return tf.stack([pos_d, pos_dd, theta_d, theta_dd], axis=1)


def tf_rk4(x, u):
    k1 = tf_dynamics(x, u)
    k2 = tf_dynamics(x + 0.5 * DT * k1, u)
    k3 = tf_dynamics(x + 0.5 * DT * k2, u)
    k4 = tf_dynamics(x + DT * k3, u)
    return x + DT / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)


def tf_rollout(s0, Q):
    x = tf.convert_to_tensor(s0)
    traj = [x]
    for h in range(Q.shape[1]):
        x = tf_rk4(x, Q[:, h, :])
        traj.append(x)
    return tf.stack(traj, axis=1)


def tf_trajectory_cost(traj, Q):
    states = traj[:, :-1, :]
    pos, angle, angle_d = states[:, :, 0], states[:, :, 2], states[:, :, 3]
    dd = W["dd_weight"] * (pos - TARGET) ** 2
    ep = W["ep_weight"] * 0.25 * (1.0 - tf.cos(angle)) ** 2
    ekp = W["ekp_weight"] * (angle_d / (2.0 * np.pi)) ** 2
    cc = W["cc_weight"] * W["R"] * tf.reduce_sum(Q**2, axis=-1)
    prev = tf.concat(
        [tf.fill((Q.shape[0], 1, Q.shape[2]), U_PREV), Q[:, :-1, :]], axis=1
    )
    ccrc = W["ccrc_weight"] * tf.reduce_sum((Q - prev) ** 2, axis=-1)
    stage = dd + ep + ekp + cc + ccrc
    t_angle = traj[:, -1, 2]
    t_angle_d = traj[:, -1, 3]
    terminal = 1.0e4 * (1.0 - tf.cos(t_angle)) ** 2 + 10.0 * t_angle_d**2
    total = tf.concat([stage, terminal[:, None]], axis=1)
    return tf.reduce_mean(total, axis=1)


def main():
    rng = np.random.default_rng(42)
    K, H, U = 64, 25, 1
    s0 = np.tile(np.array([[0.15, -0.1, 0.25, 0.3]], np.float32), (K, 1))
    Q = rng.uniform(-1, 1, size=(K, H, U)).astype(np.float32)

    traj = tf_rollout(s0, Q)
    costs = tf_trajectory_cost(traj, tf.convert_to_tensor(Q))
    elites = tf.argsort(costs)[:ELITE_K]

    # CEM refit over the elite set (reference optimizer_cem_tf.py:73-78).
    elite_Q = tf.gather(Q, elites)
    cem_mean = tf.reduce_mean(elite_Q, axis=0)
    cem_std = tf.math.reduce_std(elite_Q, axis=0)

    # MPPI softmax average on synthetic costs + perturbations.
    rng2 = np.random.default_rng(3)
    S_costs = rng2.uniform(0, 500, size=K).astype(np.float32)
    delta_u = rng2.normal(size=(K, H, U)).astype(np.float32)
    St = tf.convert_to_tensor(S_costs)
    rho = tf.reduce_min(St, axis=0)
    w = tf.exp(-1.0 / LBD * (St - rho))
    mppi_b = tf.reduce_sum(
        w[:, None, None] * tf.convert_to_tensor(delta_u), axis=0
    ) / tf.reduce_sum(w)

    # Gradient of the trajectory-cost sum wrt Q through the rollout
    # (the RPGD/CEM-grad core, reference optimizer_rpgd.py:310-315), then
    # per-rollout clip_by_norm and one keras-Adam step.
    Qv = tf.Variable(Q)
    with tf.GradientTape() as tape:
        tr = tf_rollout(s0, Qv)
        c = tf.reduce_sum(tf_trajectory_cost(tr, Qv))
    grad = tape.gradient(c, Qv)
    grad_clipped = tf.clip_by_norm(grad, GRAD_CLIP, axes=[1, 2])
    adam = tf.keras.optimizers.Adam(
        learning_rate=LEARNING_RATE, beta_1=0.9, beta_2=0.999, epsilon=1e-8
    )
    adam.apply_gradients([(grad_clipped, Qv)])

    # RPGD resample + Adam moment surgery on fixed inputs, transcribed from
    # the reference's eager TF weight surgery (optimizer_rpgd.py:449-513).
    rng3 = np.random.default_rng(7)
    Kr, keep_k = 16, 4
    Qn = rng3.uniform(-1, 1, (Kr, H, U)).astype(np.float32)
    m_arr = rng3.normal(size=(Kr, H, U)).astype(np.float32)
    v_arr = np.abs(rng3.normal(size=(Kr, H, U))).astype(np.float32)
    ages = rng3.integers(0, 20, Kr).astype(np.float32)
    r_costs = rng3.uniform(0, 100, Kr).astype(np.float32)
    Qres = rng3.uniform(-1, 1, (Kr - keep_k, H, U)).astype(np.float32)

    best_idx = tf.argsort(tf.convert_to_tensor(r_costs))[:keep_k]
    Qn_t = tf.convert_to_tensor(Qn)
    Q_keep = tf.gather(Qn_t, best_idx, axis=0)
    Q_after = tf.concat([tf.convert_to_tensor(Qres), Q_keep], 0)
    ages_after = tf.concat(
        [tf.zeros((Kr - keep_k,)), tf.gather(tf.convert_to_tensor(ages), best_idx, axis=0)], 0
    )
    wk1 = tf.concat(
        [tf.gather(tf.convert_to_tensor(m_arr), best_idx, axis=0)[:, 1:, :],
         tf.zeros([keep_k, 1, U])], 1,
    )
    wk2 = tf.concat(
        [tf.gather(tf.convert_to_tensor(v_arr), best_idx, axis=0)[:, 1:, :],
         tf.zeros([keep_k, 1, U])], 1,
    )
    m_after = tf.concat([tf.zeros([Kr - keep_k, H, U]), wk1], 0)
    v_after = tf.concat([tf.zeros([Kr - keep_k, H, U]), wk2], 0)
    # non-resample tick: all rows shifted
    m_shift = tf.concat([tf.convert_to_tensor(m_arr)[:, 1:, :], tf.zeros([Kr, 1, U])], 1)
    v_shift = tf.concat([tf.convert_to_tensor(v_arr)[:, 1:, :], tf.zeros([Kr, 1, U])], 1)

    # CEM-GMM elite clustering + component refit, transcribed from the
    # reference (optimizer_cem_gmm_tf.py:73-90): elite 0/1 seed the two
    # clusters, the rest go to the Frobenius-nearest of the two, each
    # component refits to its cluster, mixture weight = cluster fraction.
    rng4 = np.random.default_rng(11)
    kg = 12
    gmm_elites = rng4.uniform(-1, 1, (kg, H, U)).astype(np.float32)
    eQ = tf.convert_to_tensor(gmm_elites)
    distances = tf.norm(
        eQ[..., tf.newaxis] - tf.transpose(eQ, perm=(1, 2, 0))[tf.newaxis, ...],
        axis=[1, 2],
    )
    selection = tf.argmin(distances[2:, :2], axis=1)
    closest_1 = tf.concat([eQ[0:1], tf.boolean_mask(eQ[2:], selection == 0)], 0)
    closest_2 = tf.concat([eQ[1:2], tf.boolean_mask(eQ[2:], selection == 1)], 0)
    prob_1 = tf.cast(tf.shape(closest_1)[0], tf.float32) / kg
    gmm_std_min = 0.01
    gmm_mue = tf.stack([tf.reduce_mean(closest_1, 0), tf.reduce_mean(closest_2, 0)])
    gmm_std = tf.stack([
        tf.clip_by_value(tf.math.reduce_std(closest_1, 0), gmm_std_min, 1.0e4),
        tf.clip_by_value(tf.math.reduce_std(closest_2, 0), gmm_std_min, 1.0e4),
    ])

    out = HERE / "cartpole_golden.npz"
    np.savez_compressed(
        out,
        # inputs
        s0=s0, Q=Q, S_costs=S_costs, delta_u=delta_u,
        target=np.float32(TARGET), u_prev=np.float32(U_PREV),
        lbd=np.float32(LBD), elite_k=np.int32(ELITE_K),
        learning_rate=np.float32(LEARNING_RATE),
        grad_clip=np.float32(GRAD_CLIP), dt=np.float32(DT),
        # recorded TF outputs
        traj=traj.numpy(), costs=costs.numpy(), elites=elites.numpy(),
        cem_mean=cem_mean.numpy(), cem_std=cem_std.numpy(),
        mppi_b=mppi_b.numpy(),
        grad=grad.numpy(), grad_clipped=grad_clipped.numpy(),
        q_after_adam=Qv.numpy(),
        # RPGD surgery fixture
        rpgd_Qn=Qn, rpgd_m=m_arr, rpgd_v=v_arr, rpgd_ages=ages,
        rpgd_costs=r_costs, rpgd_Qres=Qres, rpgd_keep_k=np.int32(keep_k),
        rpgd_best_idx=best_idx.numpy(),
        rpgd_Q_after=Q_after.numpy(), rpgd_ages_after=ages_after.numpy(),
        rpgd_m_after=m_after.numpy(), rpgd_v_after=v_after.numpy(),
        rpgd_m_shift=m_shift.numpy(), rpgd_v_shift=v_shift.numpy(),
        # CEM-GMM clustering fixture
        gmm_elites=gmm_elites, gmm_std_min=np.float32(gmm_std_min),
        gmm_mue=gmm_mue.numpy(), gmm_std=gmm_std.numpy(),
        gmm_prob1=np.float32(prob_1.numpy()),
        tf_version=np.frombuffer(tf.__version__.encode(), np.uint8),
    )
    print(f"wrote {out} (tf {tf.__version__})")


if __name__ == "__main__":
    main()
