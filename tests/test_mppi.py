"""MPPI optimizer tests: algorithm semantics + closed-loop performance."""
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.cartpole import CartpoleEnv
from control_toolkit_tpu.environments.pendulum import PendulumEnv

MPPI_CFG = {
    "seed": 7,
    "mpc_timestep": 0.02,
    "mpc_horizon": 25,
    "num_rollouts": 512,
    "cc_weight": 1.0,
    "R": 1.0,
    "LBD": 100.0,
    "NU": 1000.0,
    "SQRTRHOINV": 0.03,
    "period_interpolation_inducing_points": 5,
}


def make_mppi(env="cartpole", logging=False, **overrides):
    cfg = dict(MPPI_CFG)
    cfg.update(overrides)
    ctrl = MPCController(
        environment_name=env,
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0} if env == "cartpole" else {},
        config={"optimizer": "mppi", "controller_logging": logging},
    )
    ctrl.configure(optimizer_name="mppi", optimizer_config=cfg)
    return ctrl


def test_mppi_step_and_nominal_shift():
    ctrl = make_mppi(logging=True)
    s = np.array([0.0, 0.0, 0.1, 0.0], np.float32)
    u1 = ctrl.step(s)
    assert -1.0 <= float(u1[0]) <= 1.0
    # Nominal plan persisted with correct shape
    u_nom = ctrl.optimizer.optimal_control_sequence
    assert u_nom.shape == (1, 25, 1)
    # Logging contract
    assert ctrl.optimizer.logging_values["Q_logged"].shape == (512, 25, 1)
    assert ctrl.optimizer.logging_values["J_logged"].shape == (512,)


def test_mppi_cartpole_stabilization():
    ctrl = make_mppi()
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=1)
    s, _ = env.reset()
    for _ in range(80):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
    assert abs(float(s[0, 2])) < 0.15, f"cartpole not stabilized: {s[0]}"
    assert abs(float(s[0, 3])) < 1.0


def test_mppi_pendulum_swingup():
    """From hanging start, MPPI should swing the pendulum up and hold it."""
    ctrl = make_mppi(env="pendulum", mpc_horizon=50, num_rollouts=512,
                     SQRTRHOINV=0.2, LBD=5.0, period_interpolation_inducing_points=5)
    env = PendulumEnv(batch_size=1, dt=0.02, seed=2)
    s, _ = env.reset()
    held = 0
    for _ in range(175):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
        if 1.0 - np.cos(float(s[0, 0])) < 0.05:
            held += 1
    assert held > 20, f"pendulum never held upright (held={held})"


def test_mppi_softmax_weighting_prefers_low_cost():
    """The weighted average must move the nominal toward low-cost rollouts."""
    ctrl = make_mppi(num_rollouts=256, LBD=1.0)
    opt = ctrl.optimizer
    S = jnp.array([0.0] + [1000.0] * 255)
    delta_u = jnp.zeros((256, 25, 1)).at[0].set(0.7)
    # re-create the internal averaging logic through a tiny jitted closure:
    rho = jnp.min(S)
    w = jnp.exp(-(S - rho) / opt.LBD)
    avg = jnp.sum(w[:, None, None] * delta_u, 0) / jnp.sum(w)
    np.testing.assert_allclose(np.asarray(avg)[0, 0], 0.7, rtol=1e-3)


def test_mppi_optimize_refinement_improves_nominal():
    """mppi-optimize (optim_steps>0) must reach at least as good a nominal
    plan as plain MPPI from the same seed/state."""
    import jax.numpy as jnp
    base = make_mppi(logging=False, num_rollouts=128, mpc_horizon=20)
    opt_r = make_mppi(logging=False, num_rollouts=128, mpc_horizon=20,
                      optim_steps=5, mppi_LR=0.05)
    s = np.array([0.0, 0.0, 0.3, 0.0], np.float32)
    for _ in range(3):
        base.step(s)
        opt_r.step(s)

    def nom_cost(ctrl):
        o = ctrl.optimizer
        un = jnp.asarray(o.optimal_control_sequence)
        params = ctrl._assemble_params()
        return float(o._fused_cost(jnp.asarray(s[None]), un,
                                   o.opt_state.u_prev, params)[0])

    assert nom_cost(opt_r) <= nom_cost(base) + 1e-3, (
        f"refined {nom_cost(opt_r)} vs base {nom_cost(base)}"
    )
