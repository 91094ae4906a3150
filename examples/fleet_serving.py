"""Heterogeneous-fleet serving demo.

A fleet of cartpoles with DIFFERENT pole lengths is served by one
BatchedMPC controller: each robot's client pushes its own sysid'd model
constant over the wire (the optional ``updated_dyn`` request key), so
every slot plans against its own plant — one device step advances the
whole fleet (columnwise semi-fused kernel; per-slot constants ride as
pslot rows, measured free — docs/KERNELS.md §2).

The reference would need one server process per robot model; here a
mid-episode re-sysid (robot 2 discovers its pole is longer than it
thought) applies with zero recompiles.

    python examples/fleet_serving.py [--tpu]
"""
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

if __name__ == "__main__" and "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from control_toolkit_tpu.controllers.batched_mpc import BatchedMPCController
from control_toolkit_tpu.environments.cartpole import CartpoleEnv


def _free_port() -> int:
    from control_toolkit_tpu.utils.net import free_port

    return free_port()


def main():
    import zmq

    from control_toolkit_tpu.serving.batched_server import serve_batched

    B = 4
    Ls = [0.35, 0.45, 0.55, 0.65]          # each robot's true pole half-length
    ctrl = BatchedMPCController(
        "cartpole",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        {"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="mppi", optimizer_config={
        "seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 25,
        "num_rollouts": 512, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
        "NU": 1000.0, "SQRTRHOINV": 0.05,
        "period_interpolation_inducing_points": 5,
    }, num_slots=B, per_slot_dyn=("L",))

    endpoint = f"tcp://127.0.0.1:{_free_port()}"
    stop = threading.Event()
    server = threading.Thread(
        target=serve_batched,
        kwargs=dict(ctrl=ctrl, endpoint=endpoint, batch_window_ms=10.0,
                    warmup_state=np.zeros(4, np.float32), stop_event=stop),
        daemon=True,
    )
    server.start()
    time.sleep(0.5)

    ctx = zmq.Context.instance()
    plants = [CartpoleEnv(batch_size=1, dt=0.02, seed=10 + i,
                          params={"L": L}) for i, L in enumerate(Ls)]
    socks = []
    for i in range(B):
        s = ctx.socket(zmq.DEALER)
        s.connect(endpoint)
        s.setsockopt(zmq.RCVTIMEO, 30000)
        socks.append(s)

    states = [np.array([0.0, 0.0, 0.3, 0.0], np.float32) for _ in range(B)]
    t0 = time.perf_counter()
    for tick in range(120):
        for i in range(B):
            req = {"rid": tick, "state": states[i].tolist(), "time": 0.0,
                   "updated_attributes": {}}
            if tick == 0:
                req["updated_dyn"] = {"L": Ls[i]}      # push the sysid result
            if tick == 60 and i == 2:
                # Mid-episode re-sysid: robot 2 refines its model.
                req["updated_dyn"] = {"L": Ls[i] * 1.02}
            socks[i].send_json(req)
        for i in range(B):
            resp = socks[i].recv_json()
            u = np.asarray(resp["Q"], np.float32).reshape(1, -1)
            states[i] = np.asarray(
                plants[i].step_dynamics(states[i][None], u, plants[i].dt)
            )[0]
    wall = time.perf_counter() - t0

    print(f"{B} robots x 120 ticks in {wall:.2f}s "
          f"({B * 120 / wall:.0f} served session-steps/s)")
    print("slot models (L):", np.round(ctrl.slot_dyn['L'], 3))
    for i, s in enumerate(states):
        print(f"robot {i} (L={Ls[i]}): final |angle| = {abs(s[2]):.3f}")
    assert all(np.all(np.isfinite(s)) for s in states)

    for s in socks:
        s.close(0)
    stop.set()
    server.join(timeout=10)


if __name__ == "__main__":
    main()
