"""Cost reduction semantics vs the reference contract
(/root/reference/Cost_Functions/__init__.py:38-93)."""
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.costs.base import CostFunction


class ConstCost(CostFunction):
    """Stage cost = sum of squared states per step; terminal = 7."""

    def _get_stage_cost(self, states, inputs, previous_input, params):
        return jnp.sum(states**2, axis=-1)

    def get_terminal_cost(self, terminal_states, params):
        return 7.0 * jnp.ones(terminal_states.shape[:-1])


def test_trajectory_cost_is_mean_over_h_plus_one():
    cf = ConstCost()
    B, H, S, U = 3, 4, 2, 1
    traj = jnp.ones((B, H + 1, S))            # stage cost = 2 per step
    inputs = jnp.zeros((B, H, U))
    out = np.asarray(cf.get_trajectory_cost(traj, inputs, None, params={"cost": {}, "attrs": {}}))
    # mean over concat([2,2,2,2, 7]) = (4*2 + 7)/5 = 3.0
    np.testing.assert_allclose(out, 3.0 * np.ones(B), atol=1e-6)


def test_summed_stage_cost_is_sum_over_h():
    cf = ConstCost()
    B, H, S, U = 2, 5, 2, 1
    traj = jnp.ones((B, H + 1, S))
    inputs = jnp.zeros((B, H, U))
    out = np.asarray(cf.get_summed_stage_cost(traj, inputs, None, params={"cost": {}, "attrs": {}}))
    np.testing.assert_allclose(out, 10.0 * np.ones(B), atol=1e-6)


def test_stage_cost_shifted_by_max_cost():
    class Shifted(ConstCost):
        MAX_COST = 5.0

    cf = Shifted()
    states = jnp.ones((1, 2, 2))
    inputs = jnp.zeros((1, 2, 1))
    out = np.asarray(cf.get_stage_cost(states, inputs, None, params={"cost": {}, "attrs": {}}))
    np.testing.assert_allclose(out, (2.0 - 5.0) * np.ones((1, 2)), atol=1e-6)
