"""Fleet checkpoint/resume: a BatchedMPCController's full serving state
(per-slot warm starts, RNN hidden, attributes, per-slot dynamics constants)
survives a process restart, both via the checkpoint API directly and through
the batched server's warm-restart path.

The reference has no checkpointing (SURVEY §5); this is the production
serving counterpart of test_aux_subsystems.py's single-controller resume.
"""
import json
import threading
import time

import numpy as np
import pytest

from control_toolkit_tpu.controllers.batched_mpc import BatchedMPCController
from control_toolkit_tpu.utils.checkpoint import load_fleet, save_fleet

LIMITS = (np.array([-1.0], np.float32), np.array([1.0], np.float32))
MPPI_CFG = {"seed": 7, "mpc_timestep": 0.02, "mpc_horizon": 10,
            "num_rollouts": 64, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
            "NU": 1000.0, "SQRTRHOINV": 0.05,
            "period_interpolation_inducing_points": 5}


def build(B, per_slot_dyn=(), spec=None):
    ctrl = BatchedMPCController(
        environment_name="cartpole",
        control_limits=LIMITS,
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    kw = {"num_slots": B, "per_slot_dyn": per_slot_dyn}
    if spec is not None:
        kw["predictor_specification"] = spec
    ctrl.configure(optimizer_name="mppi", optimizer_config=MPPI_CFG, **kw)
    return ctrl


def _states(B, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.2, 0.2, size=(B, 4)).astype(np.float32)


def test_fleet_roundtrip_bitwise(tmp_path):
    """save -> load into a fresh identically-configured controller: the
    restored fleet continues bit-identically to the original."""
    B = 3
    a = build(B, per_slot_dyn=("L",))
    s = _states(B)
    upds = [{"target_position": t} for t in (-0.3, 0.0, 0.3)]
    for _ in range(3):
        a.step_batch(s, updated_attributes=upds)
    a.update_slot_dyn(1, {"L": 0.31})

    path = tmp_path / "fleet.npz"
    save_fleet(path, a)

    b = build(B, per_slot_dyn=("L",))
    load_fleet(path, b)
    # Restored rows must stay WRITABLE (update_slot_* mutates in place).
    b.update_slot_dyn(2, {"L": 0.29})
    b.update_slot_attributes(2, {"target_position": 0.5})
    a.update_slot_dyn(2, {"L": 0.29})
    a.update_slot_attributes(2, {"target_position": 0.5})
    np.testing.assert_array_equal(b.slot_dyn["L"], a.slot_dyn["L"])
    np.testing.assert_array_equal(
        b.slot_attrs["target_position"], a.slot_attrs["target_position"]
    )

    s2 = _states(B, seed=1)
    mask = np.array([True, True, False])
    u_a = a.step_batch(s2, mask)
    u_b = b.step_batch(s2, mask)
    np.testing.assert_array_equal(u_b, u_a)
    import jax

    for la, lb in zip(jax.tree_util.tree_leaves(a.slot_states),
                      jax.tree_util.tree_leaves(b.slot_states)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_fleet_roundtrip_rnn_hidden(tmp_path):
    """Stateful (GRU) fleets: each slot's live hidden state is part of the
    checkpoint, so the restored fleet's next plans match bitwise."""
    B = 2
    a = build(B, spec="GRU-5IN-8H1-4OUT")
    s = _states(B, seed=2)
    for _ in range(2):
        a.step_batch(s)
    assert any(np.any(np.asarray(h) != 0.0) for h in a.slot_hidden), (
        "test premise: hidden must have advanced"
    )

    path = tmp_path / "fleet_rnn.npz"
    save_fleet(path, a)
    b = build(B, spec="GRU-5IN-8H1-4OUT")
    load_fleet(path, b)
    for ha, hb in zip(a.slot_hidden, b.slot_hidden):
        np.testing.assert_array_equal(np.asarray(ha), np.asarray(hb))
    u_a = a.step_batch(s)
    u_b = b.step_batch(s)
    np.testing.assert_array_equal(u_b, u_a)


def test_fleet_load_rejects_mismatched_config(tmp_path):
    a = build(2)
    path = tmp_path / "fleet.npz"
    save_fleet(path, a)
    with pytest.raises(ValueError):
        load_fleet(path, build(4))          # different num_slots
    with pytest.raises(ValueError):
        load_fleet(path, build(2, per_slot_dyn=("L",)))  # different dyn keys


@pytest.mark.slow
def test_server_warm_restart(tmp_path):
    """Universe A: one server answers 4 requests.  Universe B: a server
    answers 2, shuts down (fleet checkpointed), a NEW server restores from
    the checkpoint and answers 2 more from the same client identity.  The
    final replies must be identical — sessions resume warm across the
    restart, including the identity->slot table."""
    zmq = pytest.importorskip("zmq")
    from control_toolkit_tpu.serving.batched_server import serve_batched
    from control_toolkit_tpu.utils.net import free_port

    ckpt = str(tmp_path / "server_fleet.npz")
    states = [_states(1, seed=i)[0] for i in range(4)]

    def run_server(ctrl, endpoint, checkpoint=None):
        # Warm up HERE (main thread) so the server thread binds immediately:
        # a cold compile inside the thread can outlast the client's RCVTIMEO
        # and a blind resend would double-step the slot, breaking the A/B
        # determinism this test asserts.
        ctrl.step_batch(np.zeros((ctrl.num_slots, 4), np.float32))
        ctrl.controller_reset()
        stop = threading.Event()
        t = threading.Thread(
            target=serve_batched,
            kwargs=dict(ctrl=ctrl, endpoint=endpoint, batch_window_ms=5.0,
                        stop_event=stop, checkpoint_path=checkpoint),
            daemon=True,
        )
        t.start()
        time.sleep(0.3)
        return stop, t

    def ask(endpoint, states, rid0=1):
        ctx = zmq.Context.instance()
        c = ctx.socket(zmq.DEALER)
        c.setsockopt(zmq.IDENTITY, b"robot-7")
        c.setsockopt(zmq.RCVTIMEO, 10000)
        c.connect(endpoint)
        out = []
        try:
            for i, s in enumerate(states):
                c.send_json({"rid": rid0 + i, "state": s.tolist(),
                             "time": 0.0, "updated_attributes": {}})
                resp = c.recv_json()
                assert resp["rid"] == rid0 + i
                out.append(np.asarray(resp["Q"], np.float32))
        finally:
            c.close(0)
        return out

    # Universe A: uninterrupted.
    ep_a = f"tcp://127.0.0.1:{free_port()}"
    stop_a, t_a = run_server(build(2), ep_a)
    try:
        replies_a = ask(ep_a, states)
    finally:
        stop_a.set()
        t_a.join(timeout=10)
        assert not t_a.is_alive()

    # Universe B: restart after 2 requests.
    ep_b = f"tcp://127.0.0.1:{free_port()}"
    stop_b, t_b = run_server(build(2), ep_b, checkpoint=ckpt)
    try:
        replies_b = ask(ep_b, states[:2])
    finally:
        stop_b.set()
        t_b.join(timeout=10)
        assert not t_b.is_alive()
    with open(ckpt + ".sessions.json", encoding="utf-8") as f:
        assert list(json.load(f).keys()) == [b"robot-7".hex()]

    ep_c = f"tcp://127.0.0.1:{free_port()}"
    stop_c, t_c = run_server(build(2), ep_c, checkpoint=ckpt)
    try:
        replies_b += ask(ep_c, states[2:], rid0=3)
    finally:
        stop_c.set()
        t_c.join(timeout=10)
        assert not t_c.is_alive()

    for ra, rb in zip(replies_a, replies_b):
        np.testing.assert_array_equal(rb, ra)
