"""Sharded serving composition (VERDICT r2 item 4 / BASELINE.md scale-out):
the ZMQ controller server fronting a MESH-SHARDED optimizer, as one system.

The server loop is mesh-agnostic — the jitted optimizer step's cross-K
collectives run underneath it.  Replies must match the unsharded server
bit-for-tolerance, and the wire protocol is unchanged.  (The K=1M TPU
number for this composition is recorded by bench_scale.py; here the
virtual 8-device CPU mesh proves the composition.)
"""
import threading
import time

import numpy as np
import pytest

zmq = pytest.importorskip("zmq")

import jax

from control_toolkit_tpu.parallel.mesh import make_rollout_mesh
from control_toolkit_tpu.serving.server import build_controller, serve

PORT = 55344
MPPI_CFG = {
    "seed": 11, "mpc_timestep": 0.02, "mpc_horizon": 12,
    "num_rollouts": 2048, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
    "NU": 1000.0, "SQRTRHOINV": 0.05,
    "period_interpolation_inducing_points": 4,
}

STATES = [
    [0.0, 0.0, 0.1, 0.0],
    [0.2, -0.1, -0.05, 0.3],
    [-0.4, 0.2, 0.15, -0.2],
]


def _query(port, rid, state):
    ctx = zmq.Context.instance()
    sock = ctx.socket(zmq.DEALER)
    sock.connect(f"tcp://127.0.0.1:{port}")
    sock.setsockopt(zmq.RCVTIMEO, 30000)
    try:
        sock.send_json({"rid": rid, "state": state, "time": 0.0,
                        "updated_attributes": {}})
        resp = sock.recv_json()
        assert resp["rid"] == rid
        return np.asarray(resp["Q"], np.float32)
    finally:
        sock.close(0)


def _serve_and_collect(mesh, port):
    ctrl = build_controller(
        "mpc", "mppi", environment_name="cartpole",
        initial_attributes={"target_position": 0.0},
        optimizer_config=dict(MPPI_CFG), mesh=mesh,
    )
    t = threading.Thread(
        target=serve,
        kwargs={"ctrl": ctrl, "endpoint": f"tcp://127.0.0.1:{port}",
                "warmup_state": np.zeros(4, np.float32),
                "max_requests": len(STATES)},
        daemon=True,
    )
    t.start()
    time.sleep(0.5)
    replies = [_query(port, i + 1, s) for i, s in enumerate(STATES)]
    t.join(timeout=30)
    return ctrl, np.stack(replies)


def test_sharded_server_matches_unsharded():
    mesh = make_rollout_mesh(jax.devices())
    ctrl_sharded, sharded = _serve_and_collect(mesh, PORT)
    _, unsharded = _serve_and_collect(None, PORT + 1)

    # The served population really is sharded over the mesh.
    from jax.sharding import NamedSharding
    q_sh = ctrl_sharded.optimizer.opt_state.u_nom.sharding  # replicated leaf
    assert isinstance(q_sh, NamedSharding)
    np.testing.assert_allclose(sharded, unsharded, atol=2e-5, rtol=0)
    assert np.all(np.isfinite(sharded))
