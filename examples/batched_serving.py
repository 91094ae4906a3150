"""Batched serving demo: one chip, many control loops.

Starts a BatchedMPCController with N slots behind the dynamically-batching
ZMQ server, then runs N closed cartpole loops as independent DEALER clients
(each with its own target position) and reports per-loop tracking and
request latency percentiles.

    python examples/batched_serving.py [num_loops] [optimizer]

``optimizer`` may be mppi (default) or rpgd-tf — on a TPU the eligible
kinds engage the columnwise batched kernels (one Pallas launch for all
sessions; docs/KERNELS.md); this CPU demo exercises the same code path
on the vmapped fallback.
"""
import sys
import threading
import time

import jax

jax.config.update("jax_platforms", "cpu")  # pin CPU (see CLAUDE.md gotchas)

import numpy as np  # noqa: E402

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from control_toolkit_tpu.controllers.batched_mpc import BatchedMPCController  # noqa: E402
from control_toolkit_tpu.controllers.remote import RemoteController  # noqa: E402
from control_toolkit_tpu.environments.cartpole import CartpoleEnv  # noqa: E402
from control_toolkit_tpu.serving.batched_server import serve_batched  # noqa: E402


OPT_CFGS = {
    "mppi": {
        "seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 35, "num_rollouts": 256,
        "cc_weight": 1.0, "R": 1.0, "LBD": 10.0, "NU": 1000.0,
        "SQRTRHOINV": 0.08, "period_interpolation_inducing_points": 5,
    },
    "rpgd-tf": {
        "seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 35, "num_rollouts": 32,
        "outer_its": 2, "learning_rate": 0.1, "opt_keep_k_ratio": 0.25,
        "resamp_per": 10, "period_interpolation_inducing_points": 5,
        "warmup": False,
    },
}


def main(n_loops: int = 4, steps: int = 150, optimizer: str = "mppi"):
    if optimizer not in OPT_CFGS:
        raise SystemExit(f"optimizer must be one of {sorted(OPT_CFGS)}")
    ctrl = BatchedMPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": optimizer, "controller_logging": False},
    )
    ctrl.configure(optimizer_name=optimizer, optimizer_config=OPT_CFGS[optimizer],
                   num_slots=n_loops)

    import socket as _socket
    with _socket.socket() as _s:
        _s.bind(("127.0.0.1", 0))
        endpoint = f"tcp://127.0.0.1:{_s.getsockname()[1]}"
    server = threading.Thread(
        target=serve_batched,
        kwargs=dict(ctrl=ctrl, endpoint=endpoint, batch_window_ms=3.0,
                    warmup_state=np.zeros(4, np.float32),
                    max_batches=steps * 2 + n_loops),
        daemon=True,
    )
    server.start()
    time.sleep(0.5)

    targets = np.linspace(-0.4, 0.4, n_loops)
    lat = []

    def loop(i):
        remote = RemoteController(
            environment_name="cartpole",
            control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
            initial_environment_attributes={"target_position": float(targets[i])},
            config={"remote_endpoint": endpoint, "timeout_ms": 2000,
                    "controller_logging": False},
        )
        remote.configure()
        env = CartpoleEnv(batch_size=1, dt=0.02, seed=100 + i)
        s, _ = env.reset()
        for _ in range(steps):
            t0 = time.perf_counter()
            u = remote.step(s[0], updated_attributes={"target_position": float(targets[i])})
            lat.append(time.perf_counter() - t0)
            s, *_ = env.step(np.asarray(u).reshape(1, -1))
        print(f"loop {i}: target {targets[i]:+.2f} -> final x {float(s[0,0]):+.3f}, "
              f"angle {float(s[0,2]):+.3f}")

    threads = [threading.Thread(target=loop, args=(i,)) for i in range(n_loops)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    lat_ms = np.asarray(lat) * 1e3
    print(f"{n_loops} loops x {steps} steps | request latency "
          f"p50 {np.percentile(lat_ms, 50):.2f} ms, p99 {np.percentile(lat_ms, 99):.2f} ms")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 4,
        optimizer=sys.argv[2] if len(sys.argv) > 2 else "mppi",
    )
