"""Batched multi-loop MPC + dynamically-batching server."""
import json
import threading
import time

import numpy as np
import pytest

from control_toolkit_tpu.controllers.batched_mpc import BatchedMPCController
from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.cartpole import CartpoleEnv


def _free_port() -> int:
    from control_toolkit_tpu.utils.net import free_port

    return free_port()


MPPI_CFG = {"seed": 7, "mpc_timestep": 0.02, "mpc_horizon": 20,
            "num_rollouts": 128, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
            "NU": 1000.0, "SQRTRHOINV": 0.05,
            "period_interpolation_inducing_points": 5}


def build_batched(B, logging=False):
    ctrl = BatchedMPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": logging},
    )
    ctrl.configure(optimizer_name="mppi", optimizer_config=MPPI_CFG, num_slots=B)
    return ctrl


def test_slot_matches_single_controller():
    """A batched slot must reproduce a single controller seeded with the
    slot's PRNG key exactly (same pure step, same key stream)."""
    B = 3
    batched = build_batched(B)

    single = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    cfg = dict(MPPI_CFG)
    cfg["force_scan"] = True
    single.configure(optimizer_name="mppi", optimizer_config=cfg)
    slot = 1
    single.optimizer.opt_state = single.optimizer._init_state(batched.slot_key(slot))

    s = np.array([0.1, 0.0, 0.2, -0.1], np.float32)
    s_batch = np.tile(s, (B, 1))
    for _ in range(3):
        u_b = batched.step_batch(s_batch)
        u_s = single.step(s)
        np.testing.assert_allclose(u_b[slot], u_s, atol=1e-6)


def test_mask_freezes_idle_slots():
    import jax

    B = 4
    ctrl = build_batched(B)
    s_batch = np.tile(np.array([0.0, 0.0, 0.2, 0.0], np.float32), (B, 1))
    before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), ctrl.slot_states)
    mask = np.array([True, False, True, False])
    u = ctrl.step_batch(s_batch, mask=mask)
    after = ctrl.slot_states
    # masked-off slots: zero control and bit-identical state
    assert np.all(u[1] == 0.0) and np.all(u[3] == 0.0)
    assert np.any(u[0] != 0.0) and np.any(u[2] != 0.0)
    for b, a in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(np.asarray(b)[1], np.asarray(a)[1])
        np.testing.assert_array_equal(np.asarray(b)[3], np.asarray(a)[3])


def test_slots_track_their_own_targets():
    """Two closed cartpole loops with different target positions, advanced
    by one batched controller, each settle near their own target."""
    B = 2
    ctrl = BatchedMPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    cfg = dict(MPPI_CFG)
    cfg.update({"num_rollouts": 512, "mpc_horizon": 50, "SQRTRHOINV": 0.1,
                "LBD": 5.0})
    ctrl.configure(optimizer_name="mppi", optimizer_config=cfg, num_slots=B)
    envs = [CartpoleEnv(batch_size=1, dt=0.02, seed=10 + i) for i in range(B)]
    states = [env.reset()[0][0] for env in envs]
    targets = [0.3, -0.3]
    upds = [{"target_position": t} for t in targets]
    for _ in range(250):
        s_batch = np.stack(states)
        u = ctrl.step_batch(s_batch, updated_attributes=upds)
        for i, env in enumerate(envs):
            s, *_ = env.step(u[i][None])
            states[i] = s[0]
    # Differential check: each slot followed ITS OWN target (lateral MPPI
    # tracking has loose absolute accuracy; the slot separation is what
    # proves per-slot attribute routing).
    x0, x1 = float(states[0][0]), float(states[1][0])
    assert x0 - x1 > 0.3, f"slots did not separate toward their targets: {x0} vs {x1}"
    assert x0 > -0.1 and x1 < 0.1
    for i in range(B):
        assert abs(float(states[i][2])) < 0.3, f"slot {i} pole fell: {states[i]}"


def test_reset_slot_restores_initial_state():
    import jax

    ctrl = build_batched(2)
    s_batch = np.tile(np.array([0.0, 0.0, 0.3, 0.0], np.float32), (2, 1))
    init = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), ctrl.slot_states)
    ctrl.step_batch(s_batch)
    ctrl.reset_slot(0)
    for b, a in zip(jax.tree_util.tree_leaves(init),
                    jax.tree_util.tree_leaves(ctrl.slot_states)):
        np.testing.assert_array_equal(np.asarray(b)[0], np.asarray(a)[0])


def test_remote_controller_against_batched_server():
    """The standard RemoteController (ZMQ DEALER, rid/timeout semantics) is
    wire-compatible with the batched server — two remote clients close the
    loop through their own slots."""
    zmq = pytest.importorskip("zmq")
    from control_toolkit_tpu.controllers.remote import RemoteController
    from control_toolkit_tpu.serving.batched_server import serve_batched

    ctrl = build_batched(2)
    endpoint = f"tcp://127.0.0.1:{_free_port()}"
    stop = threading.Event()
    t = threading.Thread(
        target=serve_batched,
        kwargs=dict(ctrl=ctrl, endpoint=endpoint, batch_window_ms=20.0,
                    warmup_state=np.zeros(4, np.float32), stop_event=stop),
        daemon=True,
    )
    t.start()
    time.sleep(0.3)

    remotes = []
    for i in range(2):
        r = RemoteController(
            environment_name="cartpole",
            control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
            initial_environment_attributes={"target_position": 0.0},
            config={"remote_endpoint": endpoint,
                    "timeout_ms": 5000, "controller_logging": False},
        )
        r.configure()
        remotes.append(r)

    try:
        s = np.array([0.0, 0.0, 0.1, 0.0], np.float32)
        for _ in range(5):
            threads, out = [], [None, None]

            def ask(i):
                out[i] = remotes[i].step(
                    s, updated_attributes={"target_position": (0.2, -0.2)[i]}
                )

            for i in range(2):
                th = threading.Thread(target=ask, args=(i,))
                th.start()
                threads.append(th)
            for th in threads:
                th.join(timeout=10)
            for i in range(2):
                assert out[i] is not None and np.all(np.isfinite(out[i]))
    finally:
        for r in remotes:
            r._sock.close(0)
        stop.set()
        t.join(timeout=10)
        assert not t.is_alive(), "server thread failed to shut down"
    np.testing.assert_allclose(
        sorted(np.asarray(ctrl.slot_attrs["target_position"]).tolist()),
        [-0.2, 0.2], atol=1e-6,
    )


def test_batched_server_two_clients():
    """Two DEALER clients with different targets against one batched server:
    both get correct-rid replies from their own slots."""
    zmq = pytest.importorskip("zmq")
    from control_toolkit_tpu.serving.batched_server import serve_batched

    ctrl = build_batched(2)
    endpoint = f"tcp://127.0.0.1:{_free_port()}"
    stop = threading.Event()
    t = threading.Thread(
        target=serve_batched,
        kwargs=dict(ctrl=ctrl, endpoint=endpoint, batch_window_ms=20.0,
                    warmup_state=np.zeros(4, np.float32), stop_event=stop),
        daemon=True,
    )
    t.start()
    time.sleep(0.3)

    ctx = zmq.Context.instance()
    clients = []
    for i in range(2):
        c = ctx.socket(zmq.DEALER)
        c.setsockopt(zmq.RCVTIMEO, 20000)
        c.connect(endpoint.replace("*", "127.0.0.1"))
        clients.append(c)

    try:
        for rid in range(1, 7, 2):
            for i, c in enumerate(clients):
                c.send_json({"rid": rid + i, "state": [0.0, 0.0, 0.1, 0.0],
                             "time": 0.0,
                             "updated_attributes": {"target_position": (0.5, -0.5)[i]}})
            for i, c in enumerate(clients):
                resp = c.recv_json()
                assert resp["rid"] == rid + i
                q = np.asarray(resp["Q"], np.float32)
                assert q.shape == (1,) and np.isfinite(q).all()
    finally:
        for c in clients:
            c.close(0)
        stop.set()
        t.join(timeout=10)
        assert not t.is_alive(), "server thread failed to shut down"
    # the two identities landed on distinct slots with their own attrs
    assert sorted(np.asarray(ctrl.slot_attrs["target_position"]).tolist()) == [-0.5, 0.5]


def test_slot_eviction_reassigns_idle_slots():
    """B=1 server: a new client evicts the longest-silent one once it has
    been idle past evict_after_s, and the freed slot's state is reset."""
    zmq = pytest.importorskip("zmq")
    from control_toolkit_tpu.serving.batched_server import serve_batched

    ctrl = build_batched(1)
    endpoint = f"tcp://127.0.0.1:{_free_port()}"
    stop = threading.Event()
    t = threading.Thread(
        target=serve_batched,
        kwargs=dict(ctrl=ctrl, endpoint=endpoint, batch_window_ms=5.0,
                    warmup_state=np.zeros(4, np.float32),
                    evict_after_s=0.2, stop_event=stop),
        daemon=True,
    )
    t.start()
    time.sleep(0.3)

    ctx = zmq.Context.instance()
    a = ctx.socket(zmq.DEALER); a.setsockopt(zmq.RCVTIMEO, 20000); a.connect(endpoint)
    b = ctx.socket(zmq.DEALER); b.setsockopt(zmq.RCVTIMEO, 20000); b.connect(endpoint)
    try:
        a.send_json({"rid": 1, "state": [0, 0, 0.1, 0], "time": 0.0,
                     "updated_attributes": {}})
        assert a.recv_json()["rid"] == 1

        # B arrives while A is still fresh -> dropped (no reply).
        b.setsockopt(zmq.RCVTIMEO, 400)
        b.send_json({"rid": 2, "state": [0, 0, 0.1, 0], "time": 0.0,
                     "updated_attributes": {}})
        try:
            b.recv_json()
            assert False, "B must get no reply while A holds the only slot"
        except zmq.error.Again:
            pass

        time.sleep(0.4)  # A goes idle past evict_after_s
        b.setsockopt(zmq.RCVTIMEO, 20000)
        b.send_json({"rid": 3, "state": [0, 0, 0.1, 0], "time": 0.0,
                     "updated_attributes": {}})
        assert b.recv_json()["rid"] == 3
    finally:
        a.close(0)
        b.close(0)
        stop.set()
        t.join(timeout=10)
        assert not t.is_alive(), "server thread failed to shut down"


def test_step_batch_tolerates_oversized_attr_list():
    """Review r3: more attr entries than slots must warn-and-truncate, not
    IndexError mid-update."""
    ctrl = build_batched(2)
    s = np.zeros((2, 4), np.float32)
    upds = [{"target_position": 0.1}] * 5  # 5 entries, 2 slots
    u = ctrl.step_batch(s, None, upds)
    assert u.shape[0] == 2 and np.all(np.isfinite(u))
    assert float(ctrl.slot_attrs["target_position"][0]) == np.float32(0.1)


def test_controller_reset_restores_initial_slot_states():
    """Vmapped reset == the configure-time init (same fold_in keys)."""
    import jax

    ctrl = build_batched(3)
    init = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), ctrl.slot_states)
    ctrl.step_batch(np.zeros((3, 4), np.float32))
    ctrl.controller_reset()
    after = jax.tree_util.tree_map(np.asarray, ctrl.slot_states)
    for a, b in zip(jax.tree_util.tree_leaves(init), jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)


# ------------------------------------------------------- slot-axis sharding
def _mesh(n):
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()[:n]), ("k",))


def test_slot_mesh_equals_unsharded():
    """B sessions sharded over a 4-device slot mesh (shard_map, zero
    collectives) produce EXACTLY the unsharded batched controller's
    results — sessions' PRNG streams are slot-keyed, so the device
    grouping cannot matter."""
    B = 8
    plain = build_batched(B)
    sharded = BatchedMPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    sharded.configure(optimizer_name="mppi", optimizer_config=MPPI_CFG,
                      num_slots=B, mesh=_mesh(4))
    assert sharded._B_build == 2

    rng = np.random.default_rng(0)
    s = rng.uniform(-0.2, 0.2, size=(B, 4)).astype(np.float32)
    mask = np.array([True] * 6 + [False] * 2)
    for _ in range(3):
        u_p = plain.step_batch(s, mask)
        u_s = sharded.step_batch(s, mask)
        np.testing.assert_allclose(u_s, u_p, atol=1e-6, rtol=1e-6)
    for a, b in zip(
        np.asarray(plain.slot_states.u_nom), np.asarray(sharded.slot_states.u_nom)
    ):
        np.testing.assert_allclose(b, a, atol=1e-6)


@pytest.mark.slow
def test_slot_mesh_rpgd_equals_unsharded():
    """Same check through the RPGD state pytree (Adam moments, ages,
    surgery branches) — 2 ticks cross a resample boundary."""
    cfg = {"seed": 11, "mpc_timestep": 0.02, "mpc_horizon": 10,
           "num_rollouts": 32, "outer_its": 2, "learning_rate": 0.05,
           "opt_keep_k_ratio": 0.25, "resamp_per": 2,
           "period_interpolation_inducing_points": 5, "warmup": False}

    def make(mesh=None):
        c = BatchedMPCController(
            environment_name="cartpole",
            control_limits=(np.array([-1.0], np.float32),
                            np.array([1.0], np.float32)),
            initial_environment_attributes={"target_position": 0.0},
            config={"optimizer": "rpgd-tf", "controller_logging": False},
        )
        kw = {"num_slots": 8}
        if mesh is not None:
            kw["mesh"] = mesh
        c.configure(optimizer_name="rpgd-tf", optimizer_config=cfg, **kw)
        return c

    plain, sharded = make(), make(_mesh(4))
    s = np.random.default_rng(1).uniform(-0.2, 0.2, size=(8, 4)).astype(np.float32)
    for _ in range(2):
        u_p = plain.step_batch(s)
        u_s = sharded.step_batch(s)
        np.testing.assert_allclose(u_s, u_p, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sharded.slot_states.Q), np.asarray(plain.slot_states.Q),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sharded.slot_states.adam.m),
        np.asarray(plain.slot_states.adam.m), atol=1e-6,
    )


def test_slot_mesh_rejects_nondividing_B():
    ctrl = BatchedMPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    with pytest.raises(ValueError):
        ctrl.configure(optimizer_name="mppi", optimizer_config=MPPI_CFG,
                       num_slots=6, mesh=_mesh(4))


def test_slot_mesh_columnwise_kernel_shardmap_interpret():
    """The composition the TPU deployment runs: shard_map over the slot
    axis with each device launching the columnwise batched MPPI kernel on
    its LOCAL sessions (interpret mode here) == the single-launch B-session
    kernel step."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as PS

    from test_pallas_batched import make_states
    from test_pallas_rollout import make_mppi_ctrl

    B, K, H, tile, n_dev = 8, 64, 10, 128, 4
    ctrl = make_mppi_ctrl(K, H)
    opt = ctrl.optimizer
    step_full, _ = opt._make_batched_semi_fused_step(B, interpret=True,
                                                     tile_k=tile)
    step_loc, _ = opt._make_batched_semi_fused_step(B // n_dev,
                                                    interpret=True, tile_k=tile)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    states = make_states(opt, B)
    s = jnp.asarray(
        np.random.default_rng(2).uniform(-0.2, 0.2, size=(B, 1, 4)), jnp.float32
    )
    attrs = {"target_position": jnp.linspace(-0.5, 0.5, B, dtype=jnp.float32)}

    u_ref, new_ref, c_ref = step_full(states, s, params["dyn"], params["cost"],
                                      attrs)

    mesh = _mesh(n_dev)
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    sharded = jax.jit(shard_map(
        lambda st, s_, at: step_loc(st, s_, params["dyn"], params["cost"], at),
        mesh=mesh, in_specs=(PS("k"), PS("k"), PS("k")),
        out_specs=(PS("k"), PS("k"), PS("k")), check_vma=False,
    ))
    u_sh, new_sh, c_sh = sharded(states, s, attrs)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_sh), np.asarray(c_ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_sh.u_nom), np.asarray(new_ref.u_nom), atol=1e-6
    )


def test_fleet_weight_update_no_retrace():
    """'Fleet learning' serving workflow: an online-sysid update (or
    checkpoint swap) of the learned-dynamics weights mid-serving changes
    EVERY session's next control without retracing the batched step —
    net weights are jit arguments, exactly like the scalar path
    (test_recompilation.py)."""
    def build():
        c = BatchedMPCController(
            environment_name="cartpole",
            control_limits=(np.array([-1.0], np.float32),
                            np.array([1.0], np.float32)),
            initial_environment_attributes={"target_position": 0.0},
            config={"optimizer": "mppi", "controller_logging": False},
        )
        c.configure(optimizer_name="mppi", optimizer_config=MPPI_CFG,
                    predictor_specification="neural:mlp-16", num_slots=3)
        return c

    updated, frozen = build(), build()
    s = np.tile(np.array([0.05, 0.0, 0.2, -0.1], np.float32), (3, 1))
    u_u1 = updated.step_batch(s)
    u_f1 = frozen.step_batch(s)
    np.testing.assert_array_equal(u_u1, u_f1)       # identical before update
    assert updated._batched_jit._cache_size() == 1

    pred = updated.predictor.predictor
    pred.net_params["w0"] = np.asarray(pred.net_params["w0"]) + 0.3
    updated._dyn_params = None                      # sysid invalidates cache
    u_u2 = updated.step_batch(s)
    u_f2 = frozen.step_batch(s)
    assert updated._batched_jit._cache_size() == 1, "weight swap retraced"
    # Every session's control consumed the new model.
    assert np.all(np.abs(u_u2 - u_f2) > 0), (u_u2, u_f2)
