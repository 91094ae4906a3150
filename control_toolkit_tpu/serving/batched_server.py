"""Multi-client controller server with dynamic batching.

Same wire protocol as serving/server.py ({rid, state, time,
updated_attributes} -> {rid, Q} — ``time`` is accepted for wire parity and,
exactly like the scalar server's ``ctrl.step(s, t)``, not consumed by any
shipped optimizer; an OPTIONAL ``updated_dyn`` key routes per-session
dynamics constants to the slot when the controller was configured with
``per_slot_dyn`` — how a fleet client pushes its sysid result to its own
model, zero recompiles), but one BatchedMPCController serves many
DEALER clients from a single chip: each client identity is assigned a slot,
incoming requests are gathered for up to ``batch_window_ms`` (or until every
known client has a pending request), then ONE vmapped step advances exactly
the pending slots (mask) and replies fan out.  Idle slots keep their
warm-start state frozen.

The reference runs one controller per server process; this is the
scale-serving redesign the TPU makes natural.
"""
from __future__ import annotations

import json
import time
from typing import Dict, Optional

from control_toolkit_tpu.serving.framing import parse_dealer_frames

import numpy as np

from control_toolkit_tpu.utils.logging_util import get_logger

logger = get_logger(__name__)

DEFAULT_ENDPOINT = "tcp://*:5556"


def serve_batched(
    ctrl,
    endpoint: str = DEFAULT_ENDPOINT,
    batch_window_ms: float = 2.0,
    warmup_state: Optional[np.ndarray] = None,
    max_batches: Optional[int] = None,
    evict_after_s: float = 30.0,
    report_every: int = 500,
    stop_event=None,
    checkpoint_path: Optional[str] = None,
) -> None:
    """Run the batched request loop.  ``max_batches`` bounds the loop and
    ``stop_event`` (a threading.Event) requests a graceful shutdown — the
    loop exits within ~200 ms of it being set.

    ``checkpoint_path`` enables warm restarts: if the file exists the fleet
    (every slot's optimizer state, RNN hidden, attributes, dynamics
    constants) plus the identity->slot session table are restored before
    serving, and both are saved on shutdown.  A returning client that set
    an explicit ZMQ identity lands back on its old slot with its warm-start
    state intact; auto-identity clients simply get fresh slots.

    The batch closes when every KNOWN client has a pending request or the
    window expires; during the initial discovery burst (clients connecting
    for the first time) a round may therefore split into two batches —
    steady-state traffic coalesces into one batch per tick.

    Slot lifecycle: when all slots are taken and a NEW identity appears,
    the longest-silent client is evicted if it has been idle longer than
    ``evict_after_s`` (its slot state is reset for the newcomer); otherwise
    the request is dropped and the client's deadline handles it.  Batch
    step-latency percentiles are logged every ``report_every`` batches.
    """
    import zmq

    from control_toolkit_tpu.utils.profiling import LatencyTracker

    B = ctrl.num_slots
    if warmup_state is not None:
        ctrl.step_batch(np.tile(np.asarray(warmup_state, np.float32), (B, 1)))
        ctrl.controller_reset()
        logger.info("batched controller warmed up (first compile done)")

    ctx = zmq.Context.instance()
    sock = ctx.socket(zmq.ROUTER)
    sock.bind(endpoint)
    logger.info(f"batched controller server on {endpoint} ({B} slots)")

    slots: Dict[bytes, int] = {}          # identity -> slot
    last_seen: Dict[bytes, float] = {}
    if checkpoint_path is not None:
        import os

        if not checkpoint_path.endswith(".npz"):
            # np.savez appends .npz itself; keep save/exists/load agreeing.
            checkpoint_path += ".npz"
        sessions_path = checkpoint_path + ".sessions.json"
        if os.path.exists(checkpoint_path):
            from control_toolkit_tpu.utils.checkpoint import load_fleet

            load_fleet(checkpoint_path, ctrl)
            if os.path.exists(sessions_path):
                with open(sessions_path, "r", encoding="utf-8") as f:
                    saved = json.load(f)
                now = time.perf_counter()
                for ident_hex, slot in saved.items():
                    if 0 <= int(slot) < B:
                        slots[bytes.fromhex(ident_hex)] = int(slot)
                        # perf_counter is process-relative: returning
                        # clients start their eviction clock now.
                        last_seen[bytes.fromhex(ident_hex)] = now
            logger.info(
                f"fleet restored from {checkpoint_path} "
                f"({len(slots)} sessions resume warm)"
            )
    tracker = LatencyTracker()
    # Authoritative state width from the controller itself — a client with
    # a wrong-length state must never be able to define (and poison) it.
    n_states = int(getattr(ctrl.optimizer, "num_states", None)
                   or ctrl.predictor.num_states)
    batches = 0
    try:
        while max_batches is None or batches < max_batches:
            if stop_event is not None and stop_event.is_set():
                logger.info("stop requested; shutting down batched server")
                break
            # Wait for the first request of a batch...
            if not sock.poll(timeout=200):
                continue
            pending: Dict[int, tuple] = {}
            deadline = batch_window_ms / 1e3

            def drain_queued():
                """Consume every message currently queued (non-blocking)."""
                while sock.poll(timeout=0):
                    framed = parse_dealer_frames(sock.recv_multipart())
                    if framed is None:
                        continue
                    identity, payload, framing3 = framed
                    try:
                        req = json.loads(payload.decode("utf-8"))
                        s = np.asarray(req["state"], np.float32).reshape(-1)
                    except Exception as e:
                        logger.warning(f"malformed request dropped: {e}")
                        continue
                    if s.shape[0] != n_states:
                        # One client with a wrong-length state must not be
                        # able to crash the batch assembly for everyone.
                        logger.warning(
                            f"state length {s.shape[0]} != {n_states} from "
                            f"{identity!r}; request dropped"
                        )
                        continue
                    if identity not in slots:
                        if len(slots) >= B:
                            # Evict the longest-silent client if it has gone
                            # quiet for evict_after_s; else drop the request.
                            stalest = min(last_seen, key=last_seen.get)
                            if time.perf_counter() - last_seen[stalest] > evict_after_s:
                                freed = slots.pop(stalest)
                                last_seen.pop(stalest, None)
                                ctrl.reset_slot(freed)
                                if getattr(ctrl, "slot_dyn", None):
                                    # Newcomers must not inherit the
                                    # evicted robot's model constants.
                                    ctrl.reset_slot_dyn(freed)
                                slots[identity] = freed
                                logger.info(
                                    f"evicted idle client {stalest!r}; "
                                    f"slot {freed} -> {identity!r}"
                                )
                            else:
                                logger.warning("no free slot; request dropped "
                                               "(client deadline handles it)")
                                continue
                        else:
                            free = sorted(set(range(B)) - set(slots.values()))[0]
                            slots[identity] = free
                            logger.info(f"client {identity!r} -> slot {free}")
                    last_seen[identity] = time.perf_counter()
                    if slots[identity] in pending:
                        # Lockstep request/reply contract (same as the
                        # reference protocol): a second in-flight request
                        # from one client supersedes the first; only the
                        # newest rid is answered (the client's stale-rid
                        # drop logic tolerates this).
                        logger.debug(
                            f"{identity!r} superseded its pending request"
                        )
                    upd_dyn = req.get("updated_dyn")
                    if upd_dyn:
                        if getattr(ctrl, "slot_dyn", None):
                            try:
                                ctrl.update_slot_dyn(slots[identity], upd_dyn)
                            except Exception as e:
                                # Same discipline as malformed states: one
                                # client's bad payload must not crash the
                                # batch for everyone.
                                logger.warning(
                                    f"malformed updated_dyn from "
                                    f"{identity!r} ignored: {e}"
                                )
                        else:
                            logger.warning(
                                "updated_dyn received but the controller "
                                "has no per_slot_dyn configured; ignored"
                            )
                    pending[slots[identity]] = (
                        identity, framing3, req.get("rid"), s,
                        req.get("updated_attributes", {}) or {},
                    )

            # Gather up to batch_window_ms, closing early once every known
            # client has a request queued.  New clients discovered during
            # the window extend the quorum.
            t0 = time.perf_counter()
            drain_queued()
            while (time.perf_counter() - t0) < deadline and (
                len(pending) < len(slots) or not pending
            ):
                sock.poll(timeout=1)
                drain_queued()
            if not pending:
                continue

            s_batch = np.zeros((B, n_states), np.float32)
            mask = np.zeros((B,), bool)
            upds = [None] * B
            for slot, (_, _, _, s, upd) in pending.items():
                s_batch[slot] = s
                mask[slot] = True
                upds[slot] = upd

            try:
                with tracker.measure():
                    u = ctrl.step_batch(s_batch, mask, upds)
            except Exception as e:
                logger.warning(f"batched step failed — no replies sent: {e}")
                continue
            batches += 1
            if report_every and batches % report_every == 0:
                logger.info(
                    f"{batches} batches, {len(slots)}/{B} slots: "
                    f"{tracker.report()}"
                )

            for slot, (identity, framing3, rid, _, _) in pending.items():
                reply = json.dumps(
                    {"rid": rid, "Q": np.asarray(u[slot]).tolist()}
                ).encode("utf-8")
                msg = [identity, b"", reply] if framing3 else [identity, reply]
                sock.send_multipart(msg)
    finally:
        if checkpoint_path is not None:
            try:
                from control_toolkit_tpu.utils.checkpoint import save_fleet

                save_fleet(checkpoint_path, ctrl)
                with open(sessions_path, "w", encoding="utf-8") as f:
                    json.dump({i.hex(): s for i, s in slots.items()}, f)
                logger.info(
                    f"fleet checkpointed to {checkpoint_path} "
                    f"({len(slots)} sessions)"
                )
            except Exception as e:
                logger.warning(f"fleet checkpoint on shutdown failed: {e}")
        sock.close(0)
