"""Serving demo: start the ZMQ controller server in-process and query it
with the remote controller (same wire protocol as the reference).

    python examples/serve_and_query.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")  # demos pin CPU; see CLAUDE.md gotchas
import threading
import time

import numpy as np

from control_toolkit_tpu.controllers.remote import RemoteController
from control_toolkit_tpu.environments.cartpole import CartpoleEnv
from control_toolkit_tpu.serving.server import build_controller, serve

import socket as _socket
with _socket.socket() as _s:
    _s.bind(("127.0.0.1", 0))
    PORT = _s.getsockname()[1]


def main():
    server_ctrl = build_controller(
        "mpc", "mppi", environment_name="cartpole",
        initial_attributes={"target_position": 0.0},
        optimizer_config={"seed": 0, "mpc_timestep": 0.02, "mpc_horizon": 25,
                          "num_rollouts": 512, "cc_weight": 1.0, "R": 1.0,
                          "LBD": 100.0, "NU": 1000.0, "SQRTRHOINV": 0.05,
                          "period_interpolation_inducing_points": 5},
    )
    t = threading.Thread(
        target=serve,
        kwargs={"ctrl": server_ctrl, "endpoint": f"tcp://127.0.0.1:{PORT}",
                "warmup_state": np.zeros(4, np.float32), "max_requests": 200},
        daemon=True,
    )
    t.start()
    time.sleep(1.0)

    client = RemoteController(
        "cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={},
        config={"host": "127.0.0.1", "port": PORT, "timeout_ms": 5000,
                "fallback_controller": None, "controller_logging": False},
    )
    client.configure()

    env = CartpoleEnv(batch_size=1, dt=0.02, seed=3)
    s, _ = env.reset()
    lat = []
    for step in range(100):
        t0 = time.perf_counter()
        u = client.step(s[0], updated_attributes={"target_position": 0.0})
        lat.append((time.perf_counter() - t0) * 1e3)
        s, *_ = env.step(u)
    print(f"final state: {np.round(np.asarray(s[0]), 3)}")
    print(f"round-trip latency: p50={np.percentile(lat, 50):.2f} ms "
          f"p99={np.percentile(lat, 99):.2f} ms")


if __name__ == "__main__":
    main()
