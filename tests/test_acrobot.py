"""Acrobot model family: dynamics sanity + MPPI swing-up."""
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.acrobot import AcrobotEnv
from control_toolkit_tpu.models.dynamics import ACROBOT_DEFAULTS, acrobot_dynamics


def test_acrobot_energy_conserved_unactuated():
    """With zero torque, total mechanical energy is conserved under rk4."""
    p = ACROBOT_DEFAULTS
    env = AcrobotEnv(batch_size=1, dt=0.01, seed=0)
    s = jnp.array([[0.8, 0.0, -0.3, 0.0]], jnp.float32)

    def energy(x):
        t1, t1d, t2, t2d = x[0]
        m1, m2, l1 = p["m1"], p["m2"], p["l1"]
        lc1, lc2, I1, I2, g = p["lc1"], p["lc2"], p["I1"], p["I2"], p["g"]
        c2 = jnp.cos(t2)
        # kinetic (standard 2-link expressions)
        d1 = m1*lc1**2 + m2*(l1**2 + lc2**2 + 2*l1*lc2*c2) + I1 + I2
        d2 = m2*(lc2**2 + l1*lc2*c2) + I2
        ke = 0.5*d1*t1d**2 + d2*t1d*t2d + 0.5*(m2*lc2**2 + I2)*t2d**2
        # potential (y measured downward-negative)
        y1 = -lc1*jnp.cos(t1)
        y2 = -l1*jnp.cos(t1) - lc2*jnp.cos(t1 + t2)
        pe = m1*g*y1 + m2*g*y2
        return float(ke + pe)

    e0 = energy(s)
    u = jnp.zeros((1, 1), jnp.float32)
    for _ in range(200):
        s = env.step_dynamics(s, u, 0.01)
    e1 = energy(s)
    assert abs(e1 - e0) < 0.02 * max(1.0, abs(e0)), f"energy drift {e0} -> {e1}"


def test_acrobot_mppi_swings_up():
    """MPPI lifts the tip from hanging (-2) well above horizontal."""
    ctrl = MPCController(
        "acrobot",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)), {},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(optimizer_config={
        "seed": 5, "mpc_timestep": 0.05, "mpc_horizon": 40, "num_rollouts": 700,
        "cc_weight": 0.0, "R": 1.0, "LBD": 20.0, "NU": 1000.0,
        "SQRTRHOINV": 0.6, "period_interpolation_inducing_points": 4,
    })
    env = AcrobotEnv(batch_size=1, dt=0.05, seed=2)
    s, _ = env.reset()
    best = -np.inf
    for _ in range(120):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
        best = max(best, float(env.tip_height(jnp.asarray(s))[0]))
    assert best > 1.0, f"acrobot swing-up too weak: best tip height {best}"
