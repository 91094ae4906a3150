"""Per-session dynamics constants (heterogeneous-fleet serving).

``BatchedMPC.configure(per_slot_dyn=("L",...))`` gives every slot its own
scalar dynamics constants: the vmap path maps them over the slot axis, and
the columnwise semi-fused MPPI kernel carries them as pslot rows
(ops/pallas_mppi.py ``slot_dyn_keys``) — checked here in interpret mode
against the modular XLA math with per-session dyn dicts.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_toolkit_tpu.controllers.batched_mpc import BatchedMPCController
from test_pallas_batched import ROWS, make_states
from test_pallas_rollout import make_mppi_ctrl

MPPI_CFG = {
    "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": 10, "num_rollouts": 32,
    "cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
    "SQRTRHOINV": 0.05, "period_interpolation_inducing_points": 5,
}


def _batched(B=3, per_slot_dyn=(), **overrides):
    cfg = dict(MPPI_CFG, **overrides)
    ctrl = BatchedMPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32),
                        np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="mppi", optimizer_config=cfg,
                   num_slots=B, per_slot_dyn=per_slot_dyn)
    return ctrl


def test_per_slot_dyn_vmap_parity():
    """Slot j with per-slot L == slot j of a controller whose predictor
    uses that L globally (same slot PRNG streams)."""
    B = 3
    L = np.array([0.5, 0.9, 0.5], np.float32)  # slot 1 runs a longer pole
    s = np.tile(np.array([0.0, 0.0, 0.2, 0.0], np.float32), (B, 1))

    ctrl = _batched(B, per_slot_dyn=("L",))
    for i in range(B):
        ctrl.update_slot_dyn(i, {"L": L[i]})
    u = ctrl.step_batch(s)

    for lval, slot in ((0.5, 0), (0.9, 1)):
        ref = _batched(B)
        ref.predictor.predictor._defaults["L"] = float(lval)
        ref._dyn_params = None  # drop the cached device leaves
        u_ref = ref.step_batch(s)
        np.testing.assert_allclose(u[slot], u_ref[slot], atol=1e-6, rtol=0)
    # And the two L values genuinely differ.
    assert not np.allclose(u[0], u[1], atol=1e-5)
    # Identical-L slots still differ only through their PRNG streams:
    # slot 2 must equal the default-model run's slot 2.
    ref = _batched(B)
    np.testing.assert_allclose(u[2], ref.step_batch(s)[2], atol=1e-6, rtol=0)


def test_per_slot_dyn_validation_and_update_api():
    with pytest.raises(ValueError, match="per_slot_dyn key 'nope'"):
        _batched(2, per_slot_dyn=("nope",))
    ctrl = _batched(2, per_slot_dyn=("L", "m_pole"))
    assert set(ctrl.slot_dyn) == {"L", "m_pole"}
    np.testing.assert_allclose(ctrl.slot_dyn["L"], [0.5, 0.5])  # defaults
    ctrl.update_slot_dyn(1, {"L": 0.7, "unknown": 2.0})  # unknown -> warn
    np.testing.assert_allclose(ctrl.slot_dyn["L"], [0.5, 0.7])
    # Non-finite values must be rejected (np.asarray(None) is silently NaN
    # and a poisoned model would persist across reset_slot).
    for bad in (None, float("nan"), "abc"):
        with pytest.raises((ValueError, TypeError)):
            ctrl.update_slot_dyn(0, {"L": bad})
    np.testing.assert_allclose(ctrl.slot_dyn["L"], [0.5, 0.7])
    # ATOMIC rejection: a dict with one good and one bad key must commit
    # NOTHING — a half-applied sysid result is an inconsistent model
    # persisting across ticks (review r5).
    with pytest.raises(ValueError, match="finite"):
        ctrl.update_slot_dyn(0, {"L": 0.9, "m_pole": float("nan")})
    np.testing.assert_allclose(ctrl.slot_dyn["L"], [0.5, 0.7])
    u = ctrl.step_batch(np.tile(np.array([0, 0, 0.2, 0], np.float32), (2, 1)))
    assert u.shape == (2, 1) and np.all(np.isfinite(u))


def test_per_slot_dyn_neural_predictor_rejected():
    ctrl = BatchedMPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32),
                        np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    with pytest.raises(ValueError, match="not a scalar dynamics constant"):
        ctrl.configure(optimizer_name="mppi",
                       optimizer_config=dict(MPPI_CFG),
                       predictor_specification="neural:mlp-8-8",
                       num_slots=2, per_slot_dyn=("L",))


def test_per_slot_dyn_slot_mesh_matches_unmeshed():
    """Per-slot dyn leaves shard with the slot axis; results match the
    unmeshed controller slot for slot."""
    from control_toolkit_tpu.parallel.mesh import make_rollout_mesh

    B = 8
    L = np.linspace(0.4, 1.1, B).astype(np.float32)
    s = np.tile(np.array([0.0, 0.0, 0.2, 0.0], np.float32), (B, 1))

    ctrl = _batched(B, per_slot_dyn=("L",))
    meshed = BatchedMPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32),
                        np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    meshed.configure(optimizer_name="mppi", optimizer_config=dict(MPPI_CFG),
                     num_slots=B, per_slot_dyn=("L",),
                     mesh=make_rollout_mesh())
    for i in range(B):
        ctrl.update_slot_dyn(i, {"L": L[i]})
        meshed.update_slot_dyn(i, {"L": L[i]})
    np.testing.assert_allclose(
        meshed.step_batch(s), ctrl.step_batch(s), atol=2e-6, rtol=0)


def test_kernel_per_slot_dyn_matches_modular_costs():
    """Columnwise semi-fused kernel with per-slot L rows (interpret mode):
    per-session costs == modular rollout+cost+correction with that
    session's dyn dict."""
    B, K, H, tile = 4, 64, 10, 128
    ctrl = make_mppi_ctrl(K, H)
    opt = ctrl.optimizer
    _, update_from_eps = opt._make_batched_semi_fused_step(
        B, interpret=True, tile_k=tile, per_slot_dyn=("L",)
    )
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    L = np.array([0.35, 0.5, 0.8, 1.2], np.float32)
    dyn = dict(params["dyn"], L=jnp.asarray(L))

    U = opt.num_control_inputs
    P = opt.interp.number_of_interpolation_inducing_points
    cps, T, C = K // ROWS, (B * K) // tile, tile // ROWS
    states = make_states(opt, B)
    rng = np.random.default_rng(11)
    s_b = jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 1, 4)), jnp.float32)
    attrs = {"target_position": jnp.zeros((B,), jnp.float32)}
    eps = jnp.asarray(
        rng.normal(0.0, opt.SQRTRHODTINV, size=(T, U, P * ROWS, C)),
        jnp.float32,
    )
    _, costs = update_from_eps(states, s_b, dyn, params["cost"], attrs, eps)

    W = np.asarray(opt.interp.matrix, np.float32)
    Wk = np.kron(W.T, np.eye(ROWS, dtype=np.float32))
    eps_cols = np.asarray(eps).transpose(1, 2, 0, 3).reshape(U, P * ROWS, T * C)
    for b in range(B):
        un_shift = np.concatenate(
            [np.asarray(states.u_nom)[b, 0, 1:],
             np.asarray(states.u_nom)[b, 0, -1:]], axis=0)
        eps_b = eps_cols[:, :, b * cps:(b + 1) * cps]
        delta = np.stack([Wk @ eps_b[j] for j in range(U)])
        Q = np.zeros((K, H, U), np.float32)
        du = np.zeros((K, H, U), np.float32)
        for r in range(ROWS):
            for cw in range(cps):
                for j in range(U):
                    d = delta[j, np.arange(H) * ROWS + r, cw]
                    du[r * cps + cw, :, j] = d
                    Q[r * cps + cw, :, j] = np.clip(
                        un_shift[:, j] + d, -1.0, 1.0)
        dyn_b = dict(params["dyn"], L=jnp.asarray(L[b]))
        traj = opt.predictor.rollout(
            jnp.tile(s_b[b], (K, 1)), jnp.asarray(Q), dyn_b)
        base = opt.cost_function.get_trajectory_cost(
            traj, jnp.asarray(Q), states.u_prev[b],
            {"cost": params["cost"], "attrs": {"target_position": 0.0}},
        )
        corr = np.sum(
            opt.cc_weight * (
                0.5 * (1 - 1 / opt.NU) * opt.R * du**2
                + opt.R * Q * du + 0.5 * opt.R * Q**2
            ), axis=(1, 2),
        )
        np.testing.assert_allclose(
            np.asarray(costs)[b], np.asarray(base) + corr,
            atol=2e-4, rtol=2e-5,
        )


def test_updated_dyn_over_the_wire():
    """A fleet client pushes its sysid result through the batched server's
    optional ``updated_dyn`` request key; eviction returns the slot's model
    to defaults for the newcomer."""
    import json
    import threading
    import time as _time

    zmq = pytest.importorskip("zmq")
    from control_toolkit_tpu.serving.batched_server import serve_batched
    from test_batched_serving import _free_port

    ctrl = _batched(2, per_slot_dyn=("L",))
    endpoint = f"tcp://127.0.0.1:{_free_port()}"
    stop = threading.Event()
    t = threading.Thread(
        target=serve_batched,
        kwargs=dict(ctrl=ctrl, endpoint=endpoint, batch_window_ms=20.0,
                    warmup_state=np.zeros(4, np.float32), stop_event=stop),
        daemon=True,
    )
    t.start()
    _time.sleep(0.3)

    ctx = zmq.Context.instance()
    sock = ctx.socket(zmq.DEALER)
    sock.connect(endpoint)
    sock.setsockopt(zmq.RCVTIMEO, 20000)
    try:
        # Malformed/poison payloads first: the server must drop them (one
        # client's bad request cannot crash the batch or NaN the model).
        for rid, bad in enumerate(("L", {"L": None}, {"L": []})):
            sock.send_json({"rid": rid, "state": [0.0, 0.0, 0.2, 0.0],
                            "time": 0.0, "updated_attributes": {},
                            "updated_dyn": bad})
            resp = sock.recv_json()
            assert resp["rid"] == rid and np.all(np.isfinite(resp["Q"]))
        np.testing.assert_allclose(ctrl.slot_dyn["L"], [0.5, 0.5])
        sock.send_json({"rid": 11, "state": [0.0, 0.0, 0.2, 0.0], "time": 0.0,
                        "updated_attributes": {},
                        "updated_dyn": {"L": 0.83}})
        resp = sock.recv_json()
        assert resp["rid"] == 11 and np.all(np.isfinite(resp["Q"]))
        # This identity landed in slot 0 (first client): its model updated.
        np.testing.assert_allclose(ctrl.slot_dyn["L"][0], 0.83, atol=1e-6)
        np.testing.assert_allclose(ctrl.slot_dyn["L"][1], 0.5, atol=1e-6)
    finally:
        sock.close(0)
        stop.set()
        t.join(timeout=10)
        assert not t.is_alive()
    # Eviction semantics: handing the slot to a new client resets its model.
    ctrl.reset_slot_dyn(0)
    np.testing.assert_allclose(ctrl.slot_dyn["L"][0], 0.5, atol=1e-6)


@pytest.mark.slow
def test_rpgd_kernel_per_slot_dyn_matches_single_sessions():
    """Batched RPGD gradient-kernel step with per-slot L rows == the
    single-session XLA-AD step_fn run with that session's dyn dict (the
    established kernel-vs-scan equivalence, now with heterogeneous
    models), through both surgery branches."""
    from test_pallas_batched import _rpgd_states, make_rpgd_ctrl

    B, K, H, tile = 2, 32, 10, 64
    ctrl = make_rpgd_ctrl(K, H)
    opt = ctrl.optimizer
    kstep = opt._make_batched_rpgd_step(
        B, interpret=True, tile_k=tile, per_slot_dyn=("L",)
    )
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    L = np.array([0.4, 0.85], np.float32)
    dyn_b = dict(params["dyn"], L=jnp.asarray(L))
    states = _rpgd_states(opt, B)
    rng = np.random.default_rng(23)
    s_b = jnp.asarray(rng.uniform(-0.2, 0.2, size=(B, 1, 4)), jnp.float32)
    attrs_vec = jnp.asarray(np.linspace(-0.3, 0.3, B), jnp.float32)

    step_fn = opt._make_step_fn()
    for tick in range(2):   # tick 0 resamples (count%resamp==0), tick 1 keeps
        u, new_states, costs = kstep(
            states, s_b, dyn_b, params["cost"],
            {"target_position": attrs_vec},
        )
        for b in range(B):
            st_b = jax.tree_util.tree_map(lambda x: x[b], states)
            p_b = {
                "dyn": dict(params["dyn"], L=jnp.asarray(L[b])),
                "cost": params["cost"],
                "attrs": {"target_position": attrs_vec[b]},
            }
            u_ref, new_ref, diag = step_fn(st_b, s_b[b], p_b)
            np.testing.assert_allclose(
                np.asarray(u)[b], np.asarray(u_ref), atol=5e-4, rtol=5e-4
            )
            np.testing.assert_allclose(
                np.asarray(new_states.Q)[b], np.asarray(new_ref.Q),
                atol=5e-4, rtol=5e-4,
            )
        states = new_states


def test_var_kernel_per_slot_dyn_matches_global_dyn_slots():
    """Batched mppi-var step with per-slot L rows: slot b == slot b of the
    same step built WITHOUT per-slot dyn but run under slot b's L globally
    (identical per-session PRNG streams — dyn never enters the sampling)."""
    from control_toolkit_tpu.optimizers.mppi_var import MPPIVarState
    from test_pallas_batched import make_var_ctrl

    B, K, H, tile = 4, 64, 10, 128
    ctrl = make_var_ctrl(K, H, LR=50.0)
    opt = ctrl.optimizer
    kstep = opt._make_batched_var_step(
        B, interpret=True, tile_k=tile, per_slot_dyn=("L",)
    )
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    L = np.array([0.35, 0.5, 0.8, 0.5], np.float32)
    keys = jnp.stack(
        [jax.random.fold_in(jax.random.PRNGKey(7), i) for i in range(B)]
    )
    states = jax.vmap(opt._init_state)(keys)
    rng = np.random.default_rng(17)
    s_b = jnp.asarray(rng.uniform(-0.25, 0.25, size=(B, 1, 4)), jnp.float32)
    attrs = {"target_position": jnp.zeros((B,), jnp.float32)}

    u, new_states, costs = kstep(
        states, s_b, dict(params["dyn"], L=jnp.asarray(L)),
        params["cost"], attrs,
    )
    ref_step = opt._make_batched_var_step(B, interpret=True, tile_k=tile)
    for lval in np.unique(L):
        u_r, new_r, c_r = ref_step(
            states, s_b, dict(params["dyn"], L=jnp.asarray(float(lval))),
            params["cost"], attrs,
        )
        for b in np.flatnonzero(L == lval):
            np.testing.assert_allclose(
                np.asarray(u)[b], np.asarray(u_r)[b], atol=1e-6, rtol=0
            )
            np.testing.assert_allclose(
                np.asarray(costs)[b], np.asarray(c_r)[b], atol=1e-5, rtol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(new_states.stdev)[b], np.asarray(new_r.stdev)[b],
                atol=1e-6, rtol=0,
            )
    # Different L genuinely changes the result.
    assert not np.allclose(np.asarray(u)[0], np.asarray(u)[1], atol=1e-5)


def test_fused_cem_kernel_per_slot_dyn_matches_global_dyn_slots():
    """Batched fully-fused CEM step with per-slot L rows: slot b == slot b
    of the no-per-slot step under slot b's global L (counter PRNG seeds
    derive from each session's key only)."""
    from test_pallas_cem import make_cem_ctrl

    B, K, H, tile = 4, 128, 10, 128
    ctrl = make_cem_ctrl(K, H, fully_fused=True)
    opt = ctrl.optimizer
    kstep = opt._make_batched_fused_cem_step(
        B, interpret=True, tile_k=tile, per_slot_dyn=("L",)
    )
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    L = np.array([0.35, 0.5, 0.8, 0.5], np.float32)
    keys = jnp.stack(
        [jax.random.fold_in(jax.random.PRNGKey(9), i) for i in range(B)]
    )
    states = jax.vmap(opt._init_state)(keys)
    rng = np.random.default_rng(19)
    s_b = jnp.asarray(rng.uniform(-0.25, 0.25, size=(B, 1, 4)), jnp.float32)
    attrs = {"target_position": jnp.zeros((B,), jnp.float32)}

    u, new_states, costs = kstep(
        states, s_b, dict(params["dyn"], L=jnp.asarray(L)),
        params["cost"], attrs,
    )
    ref_step = opt._make_batched_fused_cem_step(B, interpret=True, tile_k=tile)
    for lval in np.unique(L):
        u_r, new_r, c_r = ref_step(
            states, s_b, dict(params["dyn"], L=jnp.asarray(float(lval))),
            params["cost"], attrs,
        )
        for b in np.flatnonzero(L == lval):
            np.testing.assert_allclose(
                np.asarray(u)[b], np.asarray(u_r)[b], atol=1e-6, rtol=0
            )
            np.testing.assert_allclose(
                np.asarray(costs)[b], np.asarray(c_r)[b], atol=1e-5, rtol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(new_states.dist_mue)[b],
                np.asarray(new_r.dist_mue)[b], atol=1e-6, rtol=0,
            )
    assert not np.allclose(np.asarray(u)[0], np.asarray(u)[1], atol=1e-5)
