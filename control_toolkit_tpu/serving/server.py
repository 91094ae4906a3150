"""ZeroMQ controller server.

Wire-compatible with the reference controller_server
(/root/reference/controller_server/controller_server.py:30-90): ROUTER socket
on tcp://*:5555, JSON requests ``{rid, state, time, updated_attributes}``,
replies ``{rid, Q}``, handles both 2- and 3-part DEALER framing, and sends
NO reply on a controller exception (the client's timeout owns that failure —
reference :84-86).

Redesign: headless controller/optimizer selection via CLI flags (the Qt GUI
becomes an optional picker in serving/gui.py); controller warm-up compile
before binding so the first request isn't a multi-second outlier.
"""
from __future__ import annotations

import argparse
import json
import sys
from typing import Dict, Optional

import numpy as np

from control_toolkit_tpu.serving.framing import parse_dealer_frames
from control_toolkit_tpu.utils.logging_util import get_logger
from control_toolkit_tpu.utils.registry import import_controller_by_name

logger = get_logger(__name__)

DEFAULT_ENDPOINT = "tcp://*:5555"

DEFAULT_ATTRIBUTES = {
    "target_position": 0.0,
    "target_equilibrium": 0.0,
}


def build_controller(
    controller_name: str,
    optimizer_name: Optional[str],
    environment_name: str = "cartpole",
    control_limits=(-1.0, 1.0),
    initial_attributes: Optional[Dict] = None,
    optimizer_config: Optional[Dict] = None,
    mesh=None,
):
    """``mesh``: shard the served optimizer's rollout population over a
    device mesh (BASELINE.md scale-out: ZMQ serving in front of a
    mesh-sharded K — the server loop is mesh-agnostic, the jitted step's
    collectives ride ICI/DCN underneath it)."""
    ControllerClass = import_controller_by_name(controller_name)
    low, high = control_limits
    ctrl = ControllerClass(
        environment_name=environment_name,
        control_limits=(
            np.atleast_1d(np.asarray(low, np.float32)),
            np.atleast_1d(np.asarray(high, np.float32)),
        ),
        initial_environment_attributes=dict(initial_attributes or DEFAULT_ATTRIBUTES),
    )
    if ctrl.has_optimizer:
        kw = {"optimizer_name": optimizer_name, "optimizer_config": optimizer_config}
        if mesh is not None:
            kw["mesh"] = mesh
        ctrl.configure(**kw)
    else:
        ctrl.configure()
    return ctrl


def serve(
    ctrl,
    endpoint: str = DEFAULT_ENDPOINT,
    warmup_state: Optional[np.ndarray] = None,
    max_requests: Optional[int] = None,
) -> None:
    """Run the request loop. ``max_requests`` bounds the loop for tests."""
    import zmq

    if warmup_state is not None:
        # Trigger jit compilation before accepting traffic.
        ctrl.step(np.asarray(warmup_state, np.float32))
        if hasattr(ctrl, "controller_reset"):
            try:
                ctrl.controller_reset()
            except NotImplementedError:
                pass
        logger.info("controller warmed up (first compile done)")

    ctx = zmq.Context.instance()
    sock = ctx.socket(zmq.ROUTER)
    sock.bind(endpoint)
    logger.info(f"controller server listening on {endpoint}")

    served = 0
    try:
        while max_requests is None or served < max_requests:
            framed = parse_dealer_frames(sock.recv_multipart())
            if framed is None:
                continue
            identity, payload, framing3 = framed

            served += 1
            try:
                req = json.loads(payload.decode("utf-8"))
                rid = req["rid"]
                s = np.asarray(req["state"], dtype=np.float32)
                t = req.get("time")
                upd = req.get("updated_attributes", {}) or {}

                Q = ctrl.step(s, t, upd)
                if isinstance(Q, np.ndarray):
                    q_payload = Q.tolist()
                elif isinstance(Q, (list, tuple)):
                    q_payload = list(Q)
                else:
                    q_payload = float(Q)

                reply = json.dumps({"rid": rid, "Q": q_payload}).encode("utf-8")
                if framing3:
                    sock.send_multipart([identity, b"", reply])
                else:
                    sock.send_multipart([identity, reply])
            except Exception as e:
                # Contract: silence on error; the client deadline handles it.
                logger.warning(f"controller exception — no reply sent: {e}")
                continue
    finally:
        sock.close(0)


def main(argv=None):
    ap = argparse.ArgumentParser(description="control_toolkit_tpu controller server")
    ap.add_argument("--controller", default=None, help="controller name (GUI picker if omitted)")
    ap.add_argument("--optimizer", default=None)
    ap.add_argument("--environment", default="cartpole")
    ap.add_argument("--endpoint", default=DEFAULT_ENDPOINT)
    ap.add_argument("--gui", action="store_true", help="use the Qt picker dialog")
    ap.add_argument("--asf-dir", default=None,
                    help="Control_Toolkit_ASF config directory")
    ap.add_argument("--attributes", default=None,
                    help='initial environment attributes as JSON, e.g. {"target_position": 0.0}')
    ap.add_argument("--compile-cache", nargs="?", const="", default=None,
                    metavar="DIR",
                    help="enable the persistent XLA compilation cache so a "
                         "serving restart reloads compiled programs from "
                         "disk instead of recompiling (optional DIR; "
                         "default ~/.cache/control_toolkit_tpu/xla)")
    args = ap.parse_args(argv)

    if args.compile_cache is not None:
        from control_toolkit_tpu.utils.compile_cache import enable_persistent_cache
        d = enable_persistent_cache(args.compile_cache or None)
        logger.info(f"persistent compilation cache at {d}")

    if args.asf_dir:
        from control_toolkit_tpu.utils.config import set_asf_config_dir
        set_asf_config_dir(args.asf_dir)

    controller_name, optimizer_name = args.controller, args.optimizer
    if controller_name is None or args.gui:
        from control_toolkit_tpu.serving.gui import choose_controller_and_optimizer
        controller_name, optimizer_name = choose_controller_and_optimizer(
            default_controller=controller_name, default_optimizer=optimizer_name
        )

    logger.info(f"controller={controller_name} optimizer={optimizer_name}")
    attrs = json.loads(args.attributes) if args.attributes else None
    ctrl = build_controller(controller_name, optimizer_name, args.environment,
                            initial_attributes=attrs)

    n_states = getattr(getattr(ctrl, "predictor", None), "num_states", None)
    if n_states is None:
        from control_toolkit_tpu.models.dynamics import STATE_NAMES
        names = STATE_NAMES.get(args.environment.lower())
        n_states = len(names) if names else None
    if n_states is None:
        # Unknown state width (custom env, predictor-less controller):
        # skip warmup rather than crash on a guessed-length state — the
        # first real request pays the compile instead.
        logger.warning(
            f"cannot infer state width for {args.environment!r}; "
            "skipping warmup compile"
        )
    serve(
        ctrl, args.endpoint,
        warmup_state=(
            np.zeros(n_states, np.float32) if n_states is not None else None
        ),
    )


if __name__ == "__main__":
    sys.exit(main())
