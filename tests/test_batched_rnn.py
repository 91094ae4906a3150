"""Batched MPC over a stateful (RNN) dynamics predictor.

Each slot carries its own GRU hidden state; the batched step must (a)
reproduce a scalar controller seeded with the slot key, including the
hidden advance with the applied control, (b) freeze hidden bit-exactly for
masked-off slots, and (c) zero a slot's hidden alone on reset.
"""
import numpy as np

from control_toolkit_tpu.controllers.batched_mpc import BatchedMPCController
from control_toolkit_tpu.controllers.mpc import MPCController

MPPI_CFG = {"seed": 11, "mpc_timestep": 0.02, "mpc_horizon": 8,
            "num_rollouts": 32, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
            "NU": 1000.0, "SQRTRHOINV": 0.05,
            "period_interpolation_inducing_points": 4}
LIMITS = (np.array([-1.0], np.float32), np.array([1.0], np.float32))
SPEC = "GRU-5IN-8H1-4OUT"


def build_batched(B):
    ctrl = BatchedMPCController(
        environment_name="cartpole",
        control_limits=LIMITS,
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="mppi", optimizer_config=MPPI_CFG,
                   predictor_specification=SPEC, num_slots=B)
    return ctrl


def test_gru_slot_matches_single_controller():
    """A batched slot == a scalar controller with the slot's key, over
    several steps (so the hidden-advance path is exercised, not just the
    first rollout from zero hidden)."""
    B = 3
    batched = build_batched(B)
    assert batched._stateful

    single = MPCController(
        environment_name="cartpole",
        control_limits=LIMITS,
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    cfg = dict(MPPI_CFG)
    cfg["force_scan"] = True
    single.configure(optimizer_name="mppi", optimizer_config=cfg,
                     predictor_specification=SPEC)
    slot = 2
    single.optimizer.opt_state = single.optimizer._init_state(
        batched.slot_key(slot)
    )

    s = np.array([0.1, 0.0, 0.2, -0.1], np.float32)
    s_batch = np.tile(s, (B, 1))
    for _ in range(4):
        u_b = batched.step_batch(s_batch)
        u_s = single.step(s)
        np.testing.assert_allclose(u_b[slot], u_s, atol=5e-5)

    # The batched slot hidden tracked the scalar predictor's hidden.
    h_single = np.asarray(single.predictor.predictor.hidden[0])  # [1, Hi]
    h_slot = np.asarray(batched.slot_hidden[0][slot])            # [1, Hi]
    np.testing.assert_allclose(h_slot, h_single, atol=5e-5)
    assert np.any(h_slot != 0.0), "hidden never advanced"


def test_gru_mask_freezes_hidden():
    B = 4
    ctrl = build_batched(B)
    s_batch = np.tile(np.array([0.0, 0.0, 0.2, 0.0], np.float32), (B, 1))
    ctrl.step_batch(s_batch)  # advance all hiddens off zero
    before = [np.asarray(h).copy() for h in ctrl.slot_hidden]
    mask = np.array([True, False, True, False])
    ctrl.step_batch(s_batch, mask=mask)
    after = [np.asarray(h) for h in ctrl.slot_hidden]
    for b, a in zip(before, after):
        np.testing.assert_array_equal(b[1], a[1])
        np.testing.assert_array_equal(b[3], a[3])
        assert np.any(b[0] != a[0]) and np.any(b[2] != a[2])


def test_gru_reset_slot_zeroes_hidden_alone():
    B = 3
    ctrl = build_batched(B)
    s_batch = np.tile(np.array([0.0, 0.0, 0.2, 0.0], np.float32), (B, 1))
    ctrl.step_batch(s_batch)
    keep = np.asarray(ctrl.slot_hidden[0][0]).copy()
    assert np.any(keep != 0.0)
    ctrl.reset_slot(1)
    assert np.all(np.asarray(ctrl.slot_hidden[0][1]) == 0.0)
    np.testing.assert_array_equal(np.asarray(ctrl.slot_hidden[0][0]), keep)

    ctrl.controller_reset()
    for h in ctrl.slot_hidden:
        assert np.all(np.asarray(h) == 0.0)
