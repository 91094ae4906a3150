"""Multi-process (multi-host) SPMD launch for the sharded optimizer step.

The reference toolkit has no distributed compute runtime at all — its only
communication backends are ZeroMQ, UART and in-process ctypes (SURVEY §5
"Distributed communication backend").  The TPU-native design replaces that
absence with the JAX multi-controller model: one OS process per host, each
addressing its local chips, all participating in ONE global
``jax.sharding.Mesh``.  The rollout population K shards over the global
mesh; the jitted optimizer step's cross-K reductions (MPPI softmax psum,
RPGD/CEM top-k) lower to ICI collectives inside a slice and DCN collectives
between slices, inserted by XLA — no hand-written NCCL/MPI.

On real pods, ``init_multihost`` is called once per host with the TPU
platform and the coordinator's address.  In CI (and on this machine) we
simulate multi-host on localhost: N OS processes x M virtual CPU devices,
with gloo cross-process collectives.  The SPMD program is identical either
way — that is the point of the multi-controller model.

Worker entry: ``python -m control_toolkit_tpu.parallel.launch --process-id I
--num-processes N ...`` (see ``_worker_main``).  Parent helper:
``launch_workers`` spawns the workers and collects their control traces.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from typing import Dict, List, Optional

import numpy as np

# One shared benchmark/test configuration so the single-process parity run
# and the multi-process workers build bit-identical controllers.
MULTIHOST_CONFIG: Dict = {
    "mppi": {
        "seed": 7, "mpc_timestep": 0.02, "mpc_horizon": 10,
        "num_rollouts": 64, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
        "NU": 1000.0, "SQRTRHOINV": 0.05,
        "period_interpolation_inducing_points": 2,
    },
    "rpgd-tf": {
        "seed": 7, "mpc_timestep": 0.02, "mpc_horizon": 10,
        "num_rollouts": 64, "outer_its": 2,
        "SAMPLING_DISTRIBUTION": "uniform",
        "period_interpolation_inducing_points": 2, "learning_rate": 0.05,
        "adam_beta_1": 0.9, "adam_beta_2": 0.999, "adam_epsilon": 1e-8,
        "gradmax_clip": 5.0, "rtol": 1e-3, "opt_keep_k_ratio": 0.25,
        "resamp_per": 2, "sample_stdev": 0.5, "sample_mean": 0.0,
        "sample_whole_control_space": True, "uniform_dist_min": -1.0,
        "uniform_dist_max": 1.0, "shift_previous": 1,
        "warmup": False, "warmup_iterations": 2,
    },
}


def init_multihost(
    process_id: int,
    num_processes: int,
    coordinator_address: str,
    local_device_count: Optional[int] = None,
    platform: Optional[str] = "cpu",
) -> None:
    """Initialize this process as one controller of a multi-process mesh.

    Must run before ANY jax backend is touched.  With ``platform="cpu"`` and
    ``local_device_count=M`` this provisions M virtual CPU devices per
    process and gloo cross-process collectives (the CI simulation of a
    multi-host pod).  On real TPU hosts pass ``platform=None`` (keep the
    installed plugin) and omit ``local_device_count``.
    """
    if platform == "cpu" and local_device_count:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={local_device_count}"
            ).strip()
    import jax

    if platform is not None:
        # This environment force-registers a TPU plugin via sitecustomize;
        # the config route is required to pin CPU (see tests/conftest.py).
        jax.config.update("jax_platforms", platform)
    if platform == "cpu":
        # Cross-process collectives on the CPU backend need an explicit
        # implementation; gloo ships with jaxlib.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def build_sharded_controller(optimizer_name: str, mesh):
    """Build the shared-config MPPI/RPGD cartpole controller on ``mesh``."""
    from control_toolkit_tpu.controllers.mpc import MPCController

    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": optimizer_name, "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name=optimizer_name,
        optimizer_config=dict(MULTIHOST_CONFIG[optimizer_name]),
        mesh=mesh,
    )
    return ctrl


def run_sharded_trace(optimizer_name: str, mesh, steps: int) -> np.ndarray:
    """Run ``steps`` closed-loop-style control steps on a fixed state
    sequence and return the [steps, U] control trace (host numpy).

    The state sequence is deterministic (not fed back) so single- and
    multi-process runs are comparable without environment coupling.
    """
    ctrl = build_sharded_controller(optimizer_name, mesh)
    trace = []
    for t in range(steps):
        s = np.array(
            [0.1 * np.sin(0.3 * t), 0.0, 0.2 * np.cos(0.2 * t), 0.05 * t],
            np.float32,
        )
        trace.append(np.asarray(ctrl.step(s)).reshape(-1))
    return np.stack(trace)


BATCHED_SLOTS = 8


def run_batched_trace(mesh, steps: int) -> np.ndarray:
    """Run ``steps`` batched-serving device steps of BATCHED_SLOTS MPPI
    sessions with the SLOT axis sharded over ``mesh`` (BatchedMPC's
    zero-collective slot SPMD — here spanning OS processes) and return
    the [steps, B, U] control trace.  ``mesh=None`` = unsharded
    single-process reference."""
    from control_toolkit_tpu.controllers.batched_mpc import (
        BatchedMPCController,
    )

    ctrl = BatchedMPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    kw = {"num_slots": BATCHED_SLOTS}
    if mesh is not None:
        kw["mesh"] = mesh
    ctrl.configure(
        optimizer_name="mppi",
        optimizer_config=dict(MULTIHOST_CONFIG["mppi"]),
        **kw,
    )
    trace = []
    rng = np.random.default_rng(5)
    # Deterministic per-slot state sequence + a mid-run attribute update so
    # the per-slot attrs path is exercised across the process boundary.
    for t in range(steps):
        s = rng.standard_normal((BATCHED_SLOTS, 4)).astype(np.float32) * 0.2
        upd = None
        if t == 1:
            upd = [{"target_position": 0.1 * i} for i in range(BATCHED_SLOTS)]
        trace.append(ctrl.step_batch(s, None, upd))
    return np.stack(trace)


def training_data(n: int = 512, S: int = 4, U: int = 1):
    """Deterministic synthetic linear-dynamics dataset shared by the
    multi-process workers and the single-process parity reference."""
    rng = np.random.default_rng(11)
    A = np.eye(S, dtype=np.float32) + 0.05 * rng.standard_normal((S, S)).astype(np.float32)
    B = rng.standard_normal((S, U)).astype(np.float32)
    x = rng.standard_normal((n, S)).astype(np.float32)
    u = rng.uniform(-1.0, 1.0, (n, U)).astype(np.float32)
    return x, u, (x @ A.T + u @ B.T)


TRAIN_EPOCHS = 2


def run_training_trace(mesh) -> np.ndarray:
    """Data-parallel ``fit_mlp_dynamics`` on the (possibly multi-process)
    global mesh; returns the trained params flattened to one vector.

    Every process runs the same global program on the same data, so the
    returned vector must agree across processes and — up to reduction
    order — with an unsharded single-process fit (``mesh=None``)."""
    import jax

    from control_toolkit_tpu.models.training import fit_mlp_dynamics

    x, u, xn = training_data()
    params, _ = fit_mlp_dynamics(
        x, u, xn, hiddens=(16,), epochs=TRAIN_EPOCHS, batch_size=64,
        seed=3, mesh=mesh)
    leaves = jax.tree_util.tree_leaves(
        {k: v for k, v in sorted(params.items())})
    return np.concatenate([np.asarray(l, np.float32).ravel() for l in leaves])


def run_ensemble_training_trace(mesh) -> np.ndarray:
    """Member-axis-parallel ``fit_ensemble_mlp_dynamics`` on the (possibly
    multi-process) global mesh: E=8 bootstrap members shard one-per-device
    over 2 processes x 4 devices — the expert-parallel analog, with zero
    collectives in the step (members are independent).  Returns the
    stacked params flattened; must agree across processes and match the
    unsharded single-process fit tightly (no reduction-order change inside
    any member)."""
    import jax

    from control_toolkit_tpu.models.training import fit_ensemble_mlp_dynamics

    x, u, xn = training_data()
    params, _ = fit_ensemble_mlp_dynamics(
        x, u, xn, n_members=8, hiddens=(8,), epochs=TRAIN_EPOCHS,
        batch_size=64, seed=3, mesh=mesh)
    leaves = jax.tree_util.tree_leaves(
        {k: v for k, v in sorted(params.items())})
    return np.concatenate([np.asarray(l, np.float32).ravel() for l in leaves])


def _worker_main(argv: Optional[List[str]] = None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--coordinator", type=str, required=True)
    p.add_argument("--local-devices", type=int, default=4)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--optimizers", type=str, default="mppi,rpgd-tf")
    p.add_argument("--mesh", type=str, default="1d", choices=["1d", "slice"],
                   help="'1d' = one global ('k',) axis; 'slice' = 2-D "
                        "('slice','k') with one slice per PROCESS — the "
                        "multi-slice DCN topology (cross-slice collectives "
                        "cross the process boundary)")
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args(argv)

    init_multihost(
        args.process_id, args.num_processes, args.coordinator,
        local_device_count=args.local_devices,
    )
    import jax

    from control_toolkit_tpu.parallel.mesh import (
        make_multislice_mesh,
        make_rollout_mesh,
    )

    n_global = args.num_processes * args.local_devices
    devs = jax.devices()
    assert len(devs) == n_global, f"expected {n_global} global devices, got {len(devs)}"
    assert len(jax.local_devices()) == args.local_devices
    if args.mesh == "slice":
        # jax.devices() is process-major, so slicing by process puts each
        # slice's ICI axis inside a process and the 'slice' axis across the
        # process (= DCN) boundary.
        mesh = make_multislice_mesh(args.num_processes, devs)
    else:
        mesh = make_rollout_mesh(devs)

    out = {}
    for name in args.optimizers.split(","):
        if name == "batched":
            # Slot-axis SPMD serving across the process boundary (the name
            # selects the BatchedMPC trace instead of a scalar optimizer).
            out[name] = run_batched_trace(mesh, args.steps)
        elif name == "train":
            # Data-parallel predictor training across the process boundary.
            out[name] = run_training_trace(mesh)
        elif name == "train-ens":
            # Member-axis (expert-parallel analog) ensemble training.
            out[name] = run_ensemble_training_trace(mesh)
        else:
            out[name] = run_sharded_trace(name, mesh, args.steps)
    np.savez(args.out, **out)
    # Let the parent assert the population really spanned processes: with
    # num_processes > 1 the global mesh is not fully addressable here.
    meta = {
        "process_id": args.process_id,
        "global_devices": len(devs),
        "local_devices": len(jax.local_devices()),
    }
    with open(args.out + ".meta.json", "w") as f:
        json.dump(meta, f)
    jax.distributed.shutdown()


def _free_port() -> int:
    from control_toolkit_tpu.utils.net import free_port

    return free_port()


def launch_workers(
    num_processes: int = 2,
    local_devices: int = 4,
    steps: int = 3,
    optimizers: str = "mppi,rpgd-tf",
    mesh: str = "1d",
    timeout: float = 900.0,
) -> List[Dict[str, np.ndarray]]:
    """Spawn ``num_processes`` worker processes forming one global mesh of
    ``num_processes * local_devices`` virtual CPU devices, run the sharded
    MPPI/RPGD control trace in each, and return each process's traces.

    All processes compute the SAME global program, so all returned traces
    must agree — the caller asserts cross-process consistency and (via a
    separate single-process run) numerical equality with unsharded execution.
    """
    port = _free_port()
    with tempfile.TemporaryDirectory() as td:
        procs = []
        outs = []
        logs = []
        for pid in range(num_processes):
            out = os.path.join(td, f"proc{pid}.npz")
            outs.append(out)
            env = dict(os.environ)
            # Workers must not inherit pytest's 8-device XLA flag or any
            # preset platform pin; init_multihost sets its own.
            env.pop("XLA_FLAGS", None)
            # Worker output goes to a FILE, not a PIPE: nobody drains the
            # pipes while workers run, so >64KiB of XLA/gloo chatter would
            # block the worker in write() and deadlock the whole gang
            # until the timeout (review r5).
            log = open(os.path.join(td, f"proc{pid}.log"), "w+b")
            logs.append(log)
            procs.append(
                subprocess.Popen(
                    [
                        sys.executable, "-m", "control_toolkit_tpu.parallel.launch",
                        "--process-id", str(pid),
                        "--num-processes", str(num_processes),
                        "--coordinator", f"localhost:{port}",
                        "--local-devices", str(local_devices),
                        "--steps", str(steps),
                        "--optimizers", optimizers,
                        "--mesh", mesh,
                        "--out", out,
                    ],
                    env=env,
                    stdout=log,
                    stderr=subprocess.STDOUT,
                )
            )

        def read_log(pid):
            logs[pid].flush()
            logs[pid].seek(0)
            return logs[pid].read().decode(errors="replace")
        results = []
        failed = []
        # Reap against a SHARED deadline, polling all workers: one crashed
        # worker must surface its real log immediately (the survivors block
        # in jax.distributed.initialize waiting for it) instead of masking
        # it behind a full-timeout "timed out" on a different worker.
        import time as _time

        deadline = _time.monotonic() + timeout
        live = dict(enumerate(procs))
        while live and _time.monotonic() < deadline:
            for pid in list(live):
                if live[pid].poll() is not None:
                    proc = live.pop(pid)
                    if proc.returncode != 0:
                        failed.append((pid, read_log(pid)[-4000:]))
            if failed:
                break
            if live:
                _time.sleep(0.2)
        for pid, proc in live.items():
            proc.kill()
            proc.wait()
            failed.append((
                pid,
                ("killed: "
                 + ("peer worker failed" if failed else "timeout")
                 + "\n" + read_log(pid)[-2000:]),
            ))
        for log in logs:
            log.close()
        if failed:
            msgs = "\n".join(f"--- worker {pid} ---\n{log}" for pid, log in failed)
            raise RuntimeError(f"multihost workers failed:\n{msgs}")
        for pid, out in enumerate(outs):
            with np.load(out) as z:
                results.append({k: z[k] for k in z.files})
            with open(out + ".meta.json") as f:
                meta = json.load(f)
            assert meta["global_devices"] == num_processes * local_devices
            assert meta["local_devices"] == local_devices
        return results


if __name__ == "__main__":
    _worker_main()
