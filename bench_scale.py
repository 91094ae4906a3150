"""Scale benchmark: full MPPI step at K = 1M rollouts on one chip.

The driver's bench.py measures the latency target (K=16k); this script
records the throughput story (BASELINE.md scale-out row) across the MPPI
execution modes.  Run manually on TPU:

    python bench_scale.py            # writes BENCH_SCALE.json

One patient process; compiles four programs over the tunnel (~2-4 min).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

K = 1 << 20  # 1,048,576 rollouts
H = 50
N = 20
REPS = 2


def measure_step(ctrl, n1=N, n2=5 * N):
    """Dispatch-free device time per step: two-point slope over scan
    lengths n1/n2 (cancels the ~25 ms tunnel launch cost per program)."""
    import jax
    import jax.numpy as jnp

    opt = ctrl.optimizer
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), ctrl._assemble_params()
    )
    s_dev = jnp.zeros((1, opt.num_states), jnp.float32)
    step_fn = opt._make_step_fn()

    def time_scan(n):
        @jax.jit
        def many(state, s, params):
            def body(st, _):
                u, st2, _ = step_fn(st, s, params)
                return st2, u
            return jax.lax.scan(body, state, None, length=n)

        st, us = many(opt.opt_state, s_dev, params)
        jax.block_until_ready(us)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            st, us = many(st, s_dev, params)
            jax.block_until_ready(us)
            best = min(best, time.perf_counter() - t0)
        return best

    return (time_scan(n2) - time_scan(n1)) / (n2 - n1) * 1e3


def build_cem(K, H, fully_fused, predictor_spec="ODE"):
    from control_toolkit_tpu.controllers.mpc import MPCController

    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "cem-tf", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="cem-tf", predictor_specification=predictor_spec,
                   optimizer_config={
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
        "cem_outer_it": 2, "cem_initial_action_stdev": 0.5,
        "cem_stdev_min": 0.01, "cem_best_k": 256,
        "warmup": False, "warmup_iterations": 2, "fully_fused": fully_fused,
    })
    return ctrl


def build_cma(K, H, diagonal=False):
    """CMA-ES over the flattened [H*U] plan (optimizers/cma_es.py): the
    per-generation [N,N] eigh inside fori_loop is the open question this
    row answers (VERDICT r3 missing #1)."""
    from control_toolkit_tpu.controllers.mpc import MPCController

    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "cma-es-tf", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="cma-es-tf", optimizer_config={
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
        "cma_outer_it": 3, "cma_initial_step_size": 0.3,
        "cma_diagonal": diagonal, "warmup": False,
    })
    return ctrl


def build_icem(K, H):
    """iCEM (colored-noise CEM with elite buffer, optimizers/icem.py)."""
    from control_toolkit_tpu.controllers.mpc import MPCController

    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "icem-tf", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="icem-tf", optimizer_config={
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
        "cem_outer_it": 2, "cem_initial_action_stdev": 0.5,
        "cem_stdev_min": 0.01, "cem_best_k": min(256, K // 4),
        "icem_colored_noise_beta": 2.0, "warmup": False,
    })
    return ctrl


def build_quad3d_mppi(K, H, predictor_spec="ODE:rk4:1:fast"):
    """12-state / 4-input semi-fused MPPI — the heavy model family."""
    from control_toolkit_tpu.controllers.mpc import MPCController

    ctrl = MPCController(
        environment_name="quadrotor3d",
        control_limits=(np.zeros(4, np.float32), np.ones(4, np.float32)),
        initial_environment_attributes={
            "target_x": 0.0, "target_y": 0.0, "target_z": 1.0,
        },
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="mppi", predictor_specification=predictor_spec,
                   optimizer_config={
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
        "cc_weight": 1.0, "R": 1.0, "LBD": 3.0, "NU": 1000.0,
        "SQRTRHOINV": 0.08, "period_interpolation_inducing_points": 10,
    })
    return ctrl


def build_arm2_mppi(K, H, predictor_spec="ODE:rk4:1:fast"):
    """2-input manipulator with the nonconvex end-effector reaching cost
    (forward-kinematics trig inside the stage cost)."""
    from control_toolkit_tpu.controllers.mpc import MPCController

    ctrl = MPCController(
        environment_name="arm2",
        control_limits=(np.array([-1.0, -1.0], np.float32),
                        np.array([1.0, 1.0], np.float32)),
        initial_environment_attributes={"target_x": 0.6, "target_y": 0.4},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="mppi", predictor_specification=predictor_spec,
                   optimizer_config={
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
        "cc_weight": 1.0, "R": 1.0, "LBD": 3.0, "NU": 1000.0,
        "SQRTRHOINV": 0.25, "period_interpolation_inducing_points": 10,
    })
    return ctrl


def build_rpgd(K, H, remat=False, force_scan=False, predictor_spec="ODE"):
    """RPGD: the gradient-through-rollout path.  force_scan=True pins the
    XLA-AD baseline; the default uses the fused Pallas gradient kernel on
    TPU (ops/pallas_grad.py)."""
    from control_toolkit_tpu.controllers.mpc import MPCController

    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "rpgd-tf", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="rpgd-tf", predictor_specification=predictor_spec,
                   optimizer_config={
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
        "outer_its": 2, "SAMPLING_DISTRIBUTION": "uniform",
        "period_interpolation_inducing_points": 10, "learning_rate": 0.05,
        "gradmax_clip": 5, "opt_keep_k_ratio": 0.25, "resamp_per": 10,
        "sample_stdev": 0.5, "warmup": False, "warmup_iterations": 2,
        "remat": remat, "force_scan": force_scan,
    })
    return ctrl


def build_residual_ctrl(K, H, optimizer="mppi", force_scan=False):
    """Adaptive-MPC predictor ('ODE+res': analytic base + fitted MLP
    residual) with a nonzero residual installed, so the MLP path is live.
    force_scan pins the fused-scan baseline; default takes the fused
    residual kernels (forward for MPPI, gradient twin for RPGD)."""
    import jax

    from control_toolkit_tpu.controllers.mpc import MPCController

    cfgs = {
        "mppi": {
            "cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
            "SQRTRHOINV": 0.05,
        },
        "rpgd-tf": {
            "outer_its": 2, "SAMPLING_DISTRIBUTION": "uniform",
            "learning_rate": 0.05, "gradmax_clip": 5,
            "opt_keep_k_ratio": 0.25, "resamp_per": 10, "sample_stdev": 0.5,
            "warmup": False, "warmup_iterations": 2,
        },
    }
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": optimizer, "controller_logging": False},
    )
    ctrl.configure(optimizer_name=optimizer, predictor_specification="ODE+res",
                   optimizer_config={
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
        "period_interpolation_inducing_points": 10, "force_scan": force_scan,
        **cfgs[optimizer]})
    pred = ctrl.optimizer.predictor.predictor
    key = jax.random.PRNGKey(11)
    res = {k: (0.02 * jax.random.normal(jax.random.fold_in(key, i), v.shape)
               if k.startswith("w") else v)
           for i, (k, v) in enumerate(sorted(pred._res.items()))}
    pred.set_residual(res)
    ctrl._dyn_params = None
    return ctrl


def build_ilqr(H=50, iters=30, device=None):
    """NLP slot: single-start iLQR, optionally pinned (config 'device')."""
    from control_toolkit_tpu.controllers.mpc import MPCController

    cfg = {"optimizer": "ilqr", "controller_logging": False}
    if device:
        cfg["device"] = device
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config=cfg,
    )
    ctrl.configure(optimizer_name="ilqr", optimizer_config={
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H,
        "max_iterations": iters, "al_iterations": 1,
        "line_search_steps": 8, "n_starts": 1,
    })
    return ctrl


def measure_host_loop(ctrl, n=20):
    """ms/step through the full controller.step host path (the honest
    metric for latency-bound solvers where the per-call dispatch cost is
    part of the story; device pins change BOTH terms)."""
    s = np.array([0.0, 0.0, 0.3, 0.0], np.float32)
    ctrl.step(s); ctrl.step(s)  # compile (2x: guards against any step-1
    # cache-key change leaking a recompile into the timed window)
    t0 = time.perf_counter()
    for _ in range(n):
        ctrl.step(s)
    return (time.perf_counter() - t0) / n * 1e3


def _measure_batched_steps(optimizer_name, opt_cfg, B, n_state=4,
                           N=20, reps=2, predictor_specification=None,
                           post_configure=None, as_timer=False):
    """Shared timing harness for every batched-serving row: build a
    B-slot controller, warm-compile one device step, and time blocks of
    ``N`` pipelined steps (dispatch overlaps), min over ``reps`` blocks.
    All BENCH_SCALE batched rows use THIS function so the measurement
    methodology cannot drift between optimizers; stateful (RNN)
    predictors thread their per-slot hidden through the same loop.

    ``as_timer=True`` returns the warmed zero-arg block timer instead of
    a measurement, so kernel/scan twins can be timed INTERLEAVED
    (k,s,k,s,...) with both programs resident — a transient host/tunnel
    stall then inflates one block of each instead of silently flipping a
    whole row (the round-4/round-5 contradiction failure mode)."""
    import jax
    import jax.numpy as jnp

    from control_toolkit_tpu.controllers.batched_mpc import BatchedMPCController

    ctrl = BatchedMPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": optimizer_name, "controller_logging": False},
    )
    kw = {}
    if predictor_specification is not None:
        kw["predictor_specification"] = predictor_specification
    ctrl.configure(optimizer_name=optimizer_name, optimizer_config=opt_cfg,
                   num_slots=B, **kw)
    if post_configure is not None:
        post_configure(ctrl)
    params = ctrl._assemble_params()
    s = jnp.zeros((B, 1, n_state), jnp.float32)
    attrs = {k: jnp.asarray(v) for k, v in ctrl.slot_attrs.items()}
    mask = jnp.ones((B,), bool)
    fn = ctrl._batched_jit
    if ctrl._stateful:
        dyn = {k: v for k, v in params["dyn"].items() if k != "hidden"}
        carry = [ctrl.slot_states, ctrl.slot_hidden]

        def block():
            states, hidden = carry
            t0 = time.perf_counter()
            for _ in range(N):
                u, states, hidden = fn(states, s, dyn, params["cost"],
                                       attrs, mask, hidden)
            jax.block_until_ready(u)
            carry[0], carry[1] = states, hidden
            return (time.perf_counter() - t0) / N * 1e3
    else:
        carry = [ctrl.slot_states]

        def block():
            states = carry[0]
            t0 = time.perf_counter()
            for _ in range(N):
                u, states = fn(states, s, params["dyn"], params["cost"],
                               attrs, mask)
            jax.block_until_ready(u)
            carry[0] = states
            return (time.perf_counter() - t0) / N * 1e3

    block()  # warm (compile + first steady-state block)
    if as_timer:
        return block
    return min(block() for _ in range(reps))


def _interleaved_pair(make_a, make_b, rounds=3):
    """Build two warmed block timers (e.g. kernel vs vmap-scan twins of
    one batched row) and time them ALTERNATING for ``rounds`` rounds,
    returning (min_a, min_b).  Contention noise through the shared TPU
    tunnel only ever ADDS time, so the interleaved min per path is the
    statistic the probes/bench_batched_recheck adjudication validated."""
    ta, tb = make_a(), make_b()
    ma = mb = float("inf")
    for _ in range(rounds):
        ma = min(ma, ta())
        mb = min(mb, tb())
    return ma, mb


def measure_batched_serving(B=32, K_per_slot=512, H=35, force_scan=False,
                            as_timer=False):
    """Steps/s for B independent MPPI sessions (columnwise batched kernel
    when eligible, or the vmapped scan path with force_scan=True)."""
    return _measure_batched_steps("mppi", {
        "seed": 1, "mpc_timestep": 0.02, "mpc_horizon": H,
        "num_rollouts": K_per_slot, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
        "NU": 1000.0, "SQRTRHOINV": 0.05, "force_scan": force_scan,
        "period_interpolation_inducing_points": 10}, B, as_timer=as_timer)


def measure_batched_fused_cem(B=128, K_per_slot=512, H=35, outer=2,
                              fully_fused=True, as_timer=False):
    """Steps/s for B CEM sessions: the columns fully-fused counter-PRNG
    kernel (fully_fused=True - zero population bytes in HBM) vs the
    vmapped scan path."""
    return _measure_batched_steps("cem-tf", {
        "seed": 1, "mpc_timestep": 0.02, "mpc_horizon": H,
        "num_rollouts": K_per_slot, "cem_outer_it": outer, "cem_best_k": 40,
        "warmup": False, "fully_fused": fully_fused}, B, as_timer=as_timer)


def measure_batched_rpgd(B=128, K_per_slot=32, H=50, outer=2, force_scan=False,
                         predictor_specification=None, as_timer=False):
    """Steps/s for B RPGD sessions (columnwise gradient-kernel path vs the
    vmapped XLA-AD scan path); ``predictor_specification='neural:mlp-32-32'``
    measures the fleet-of-learned-models form (neural gradient kernel)."""
    return _measure_batched_steps("rpgd-tf", {
        "seed": 7, "mpc_timestep": 0.02, "mpc_horizon": H,
        "num_rollouts": K_per_slot, "outer_its": outer, "learning_rate": 0.05,
        "opt_keep_k_ratio": 0.25, "resamp_per": 10,
        "period_interpolation_inducing_points": 10, "warmup": False,
        "force_scan": force_scan}, B, as_timer=as_timer,
        predictor_specification=predictor_specification)


def measure_batched_gradient(B=128, K_per_slot=32, H=50, steps=5,
                             force_scan=False, as_timer=False):
    """Steps/s for B gradient-tf sessions (columnwise gradient-kernel path
    vs vmapped XLA-AD scan)."""
    return _measure_batched_steps("gradient-tf", {
        "seed": 9, "mpc_timestep": 0.02, "mpc_horizon": H,
        "num_rollouts": K_per_slot, "gradient_steps": steps,
        "learning_rate": 0.05, "gradmax_clip": 5.0, "warmup": False,
        "force_scan": force_scan}, B, as_timer=as_timer)


def measure_batched_var(B=128, K_per_slot=512, H=35, force_scan=False,
                        as_timer=False):
    """Steps/s for B mppi-var sessions (columnwise semi-fused update with
    per-session adaptive sigma vs vmapped scan)."""
    return _measure_batched_steps("mppi-var-tf", {
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H,
        "num_rollouts": K_per_slot, "cc_weight": 1.0, "R": 1.0,
        "LBD_mc": 100.0, "NU_mc": 1000.0, "SQRTRHOINV_mc": 0.05,
        "period_interpolation_inducing_points": 10, "LR": 1000.0,
        "force_scan": force_scan}, B, as_timer=as_timer)


def measure_batched_rnn(B=128, K_per_slot=512, H=35, force_scan=False,
                        as_timer=False):
    """Steps/s for B MPPI sessions over a recurrent GRU-32 predictor
    (columns recurrent kernel with per-session live hidden vs vmapped
    scan)."""
    return _measure_batched_steps("mppi", {
        "seed": 11, "mpc_timestep": 0.02, "mpc_horizon": H,
        "num_rollouts": K_per_slot, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
        "NU": 1000.0, "SQRTRHOINV": 0.05,
        "period_interpolation_inducing_points": 10,
        "force_scan": force_scan}, B, as_timer=as_timer,
        predictor_specification="neural:GRU-5IN-32H1-4OUT")


def measure_mc_sweep(N=128, K=512, H=50, T1=40, T2=80, reps=10, trials=3,
                     force_scan=False):
    """Monte-Carlo sweep ms/tick (evaluation/ClosedLoop.run_batch device
    program): N episodes, one program launch, slope between two tick
    lengths (dispatch-free).  Kernel path (columnwise batched MPPI kernel
    per tick) unless force_scan — then the vmapped per-episode scan."""
    import jax
    import jax.numpy as jnp

    from control_toolkit_tpu.controllers.mpc import MPCController
    from control_toolkit_tpu.environments.cartpole import CartpoleEnv
    from control_toolkit_tpu.evaluation import ClosedLoop

    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="mppi", optimizer_config={
        "seed": 5, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
        "cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
        "SQRTRHOINV": 0.05, "period_interpolation_inducing_points": 10})
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=1)
    loop = ClosedLoop(ctrl, env, actuator_noise=0.05, noise_seed=7)
    opt = ctrl.optimizer
    if force_scan:
        prog = loop._run_batch_device
    else:
        assert loop._kernel_sweep_eligible(N)
        prog = loop._build_kernel_sweep(N)

    def make_inputs(T):
        ep_keys = jnp.stack(
            [jax.random.fold_in(opt._initial_key, i) for i in range(N)]
        )
        opt_states = jax.vmap(opt._init_state)(ep_keys)
        s0s = jnp.tile(jnp.array([0., 0., 0.15, 0.], jnp.float32), (N, 1))
        sub = jax.random.PRNGKey(3)
        nk = jax.random.split(sub, N * T).reshape((N, T) + sub.shape)
        return opt_states, s0s, ctrl._assemble_params(), nk

    ins = {T: make_inputs(T) for T in (T1, T2)}
    for T in (T1, T2):
        out = prog(*ins[T][:3], ins[T][3], T)
        jax.block_until_ready(out[1])
    ts = {}
    for T in (T1, T2):
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = prog(*ins[T][:3], ins[T][3], T)
            jax.block_until_ready(out[1])
            best = min(best, (time.perf_counter() - t0) / reps)
        ts[T] = best
    return (ts[T2] - ts[T1]) / (T2 - T1) * 1e3


def build_neural_mppi(K, H, net="mlp-32-32", force_scan=False):
    """MPPI over a LEARNED next-state MLP (the reference's flagship
    predictor kind) — scan baseline vs the fused neural Pallas kernel
    (ops/pallas_neural.py)."""
    from control_toolkit_tpu.controllers.mpc import MPCController

    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="mppi", predictor_specification=f"neural:{net}",
                   optimizer_config={
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
        "cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
        "SQRTRHOINV": 0.05, "period_interpolation_inducing_points": 10,
        "force_scan": force_scan,
    })
    return ctrl


def build_ensemble_mppi(K, H, E=4, net="mlp-32-32", force_scan=False):
    """MPPI over a PETS bootstrap ensemble (TS-inf blockwise member
    assignment) — member-vmapped scan baseline vs the ensemble form of the
    fused neural kernel (per-tile member weight blocks)."""
    from control_toolkit_tpu.controllers.mpc import MPCController

    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="mppi",
                   predictor_specification=f"ensemble:{net}:{E}",
                   optimizer_config={
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
        "cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
        "SQRTRHOINV": 0.05, "period_interpolation_inducing_points": 10,
        "force_scan": force_scan,
    })
    return ctrl


_GP_CKPTS = {}


def _gp_checkpoint(num_inducing=128):
    """Fit (once per M) and checkpoint the cartpole sparse-GP the GP rows
    share; returns the .npz path (left on disk for the process lifetime so
    repeated builders can reload it)."""
    if num_inducing not in _GP_CKPTS:
        import tempfile

        from control_toolkit_tpu.environments.cartpole import CartpoleEnv
        from control_toolkit_tpu.models.gp_predictor import (
            GPPredictor, fit_gp_dynamics)
        from control_toolkit_tpu.models.training import collect_transitions

        env = CartpoleEnv(batch_size=16, dt=0.02, seed=0)
        x, u, xn = collect_transitions(env, 200, seed=0)
        params, _ = fit_gp_dynamics(x, u, xn, num_inducing=num_inducing,
                                    seed=0)
        fd, path = tempfile.mkstemp(suffix=".npz")
        os.close(fd)
        GPPredictor("cartpole", dt=0.02, params=params).save(path)
        _GP_CKPTS[num_inducing] = path
    return _GP_CKPTS[num_inducing]


def build_gp_mppi(K, H, num_inducing=128, force_scan=False):
    """MPPI over a learned sparse-GP dynamics model (the reference's
    'SGP_30' predictor kind, config_controllers.yml:8): each rollout step
    is a [K, M] RBF kernel block against M inducing points times a [M, S]
    weight matrix.  force_scan pins the XLA scan (HBM-resident [K, M]
    blocks per step); default takes the fused Pallas GP kernel."""
    from control_toolkit_tpu.controllers.mpc import MPCController

    path = _gp_checkpoint(num_inducing)

    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="mppi",
        predictor_specification=f"SGP_{num_inducing}:{path}",
        optimizer_config={
            "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
            "cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
            "SQRTRHOINV": 0.05, "period_interpolation_inducing_points": 10,
            "force_scan": force_scan,
        })
    return ctrl


def measure_batched_gp(B=128, K_per_slot=512, H=35, num_inducing=128,
                       force_scan=False, as_timer=False):
    """Steps/s for B MPPI sessions over the learned sparse-GP dynamics
    (columnwise GP kernel — the [B*K, M] RBF blocks stay in VMEM — vs the
    vmapped scan path with force_scan=True)."""
    return _measure_batched_steps("mppi", {
        "seed": 1, "mpc_timestep": 0.02, "mpc_horizon": H,
        "num_rollouts": K_per_slot, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
        "NU": 1000.0, "SQRTRHOINV": 0.05, "force_scan": force_scan,
        "period_interpolation_inducing_points": 10}, B, as_timer=as_timer,
        predictor_specification=f"SGP_{num_inducing}:{_gp_checkpoint(num_inducing)}")


def _install_bench_residual(ctrl):
    """Install a nonzero MLP residual on a configured 'ODE+res' controller
    (mirrors build_residual_ctrl) so the correction path is live."""
    import jax

    pred = getattr(ctrl.predictor, "predictor", ctrl.predictor)
    key = jax.random.PRNGKey(11)
    res = {k: (0.02 * jax.random.normal(jax.random.fold_in(key, i), v.shape)
               if k.startswith("w") else v)
           for i, (k, v) in enumerate(sorted(pred._res.items()))}
    pred.set_residual(res)
    ctrl._dyn_params = None


def measure_batched_residual(B=128, K_per_slot=512, H=35, force_scan=False,
                             as_timer=False):
    """Steps/s for B adaptive-MPC sessions over 'ODE+res' (columns residual
    kernel — base scalars in SMEM, shared residual-MLP weights as VMEM
    operands — vs the vmapped scan path with force_scan=True)."""
    return _measure_batched_steps("mppi", {
        "seed": 1, "mpc_timestep": 0.02, "mpc_horizon": H,
        "num_rollouts": K_per_slot, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
        "NU": 1000.0, "SQRTRHOINV": 0.05, "force_scan": force_scan,
        "period_interpolation_inducing_points": 10}, B, as_timer=as_timer,
        predictor_specification="ODE+res",
        post_configure=_install_bench_residual)


def measure_grid_sweep(N=512, K=512, H=50, T1=40, T2=80, reps=5, trials=3):
    """Hyperparameter-grid throughput: N configurations (swept target x
    controller-side pole length x ep_weight — all per-episode pslot rows on
    the columnwise kernel) advanced one closed-loop tick per launch;
    reports the dispatch-free ms/tick for the WHOLE grid (slope method).
    N*K rollouts per tick ride one kernel launch."""
    import jax
    import jax.numpy as jnp

    from control_toolkit_tpu.controllers.mpc import MPCController
    from control_toolkit_tpu.environments.cartpole import CartpoleEnv
    from control_toolkit_tpu.evaluation import ClosedLoop
    from control_toolkit_tpu.evaluation.closed_loop import _overlay_sweep

    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="mppi", optimizer_config={
        "seed": 5, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
        "cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
        "SQRTRHOINV": 0.05, "period_interpolation_inducing_points": 10})
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=1)
    loop = ClosedLoop(ctrl, env, actuator_noise=0.05, noise_seed=7)
    opt = ctrl.optimizer
    rng = np.random.default_rng(3)
    sweep = {
        "attrs": {"target_position":
                  rng.uniform(-0.5, 0.5, N).astype(np.float32)},
        "dyn": {"L": rng.uniform(0.3, 0.8, N).astype(np.float32)},
        "cost": {"ep_weight":
                 rng.uniform(5e3, 5e4, N).astype(np.float32)},
    }
    params = ctrl._assemble_params()
    merged, _, paths = _overlay_sweep(params, sweep, N)
    prog = loop._swept_kernel_run_for(N, tuple(paths), merged)
    assert prog is not None, "kernel-path swept program ineligible"

    def make_inputs(T):
        ep_keys = jnp.stack(
            [jax.random.fold_in(opt._initial_key, i) for i in range(N)]
        )
        opt_states = jax.vmap(opt._init_state)(ep_keys)
        s0s = jnp.tile(jnp.array([0., 0., 0.15, 0.], jnp.float32), (N, 1))
        sub = jax.random.PRNGKey(3)
        nk = jax.random.split(sub, N * T).reshape((N, T) + sub.shape)
        return opt_states, s0s, merged, nk

    ins = {T: make_inputs(T) for T in (T1, T2)}
    for T in (T1, T2):
        out = prog(*ins[T][:3], ins[T][3], T)
        jax.block_until_ready(out[1])
    ts = {}
    for T in (T1, T2):
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = prog(*ins[T][:3], ins[T][3], T)
            jax.block_until_ready(out[1])
            best = min(best, (time.perf_counter() - t0) / reps)
        ts[T] = best
    return (ts[T2] - ts[T1]) / (T2 - T1) * 1e3


def measure_served_mppi(K, H=50, n_requests=100):
    """BASELINE.md scale-out sentence as one measurement: the ZMQ
    controller server fronting a K-rollout MPPI on this chip; reports the
    served round-trip (p50, p99) over tcp://127.0.0.1 — steady state,
    post-warmup (first 5 requests excluded), so the p99 is the serving
    SLO row against the reference's 50 ms deadline
    (controller_remote.py:11-12), not compile noise.  The device step
    underneath is the semi-fused kernel; the delta vs the bare device
    time is serving overhead (json + zmq + dispatch)."""
    import threading
    import zmq

    from control_toolkit_tpu.serving.server import build_controller, serve

    ctrl = build_controller(
        "mpc", "mppi", environment_name="cartpole",
        initial_attributes={"target_position": 0.0},
        optimizer_config={
            "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H,
            "num_rollouts": K, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
            "NU": 1000.0, "SQRTRHOINV": 0.03,
            "period_interpolation_inducing_points": 10,
        },
    )
    port = 55719
    t = threading.Thread(
        target=serve,
        kwargs={"ctrl": ctrl, "endpoint": f"tcp://127.0.0.1:{port}",
                "warmup_state": np.zeros(4, np.float32),
                "max_requests": n_requests + 5},
        daemon=True,
    )
    t.start()
    ctx = zmq.Context.instance()
    sock = ctx.socket(zmq.DEALER)
    sock.connect(f"tcp://127.0.0.1:{port}")
    sock.setsockopt(zmq.RCVTIMEO, 300000)
    lat = []
    state = [0.0, 0.0, 0.1, 0.0]
    for i in range(n_requests + 5):
        t0 = time.perf_counter()
        sock.send_json({"rid": i, "state": state, "time": 0.0,
                        "updated_attributes": {}})
        resp = sock.recv_json()
        assert resp["rid"] == i
        if i >= 5:  # warm
            lat.append(time.perf_counter() - t0)
    sock.close(0)
    t.join(timeout=10)
    lat_ms = np.asarray(lat) * 1e3
    return (float(np.percentile(lat_ms, 50)), float(np.percentile(lat_ms, 99)))


def measure_served_echo(n_requests=100):
    """Serving-stack floor WITHOUT the device: a pure echo server behind
    the same ZMQ ROUTER/DEALER framing and JSON codec — isolates the
    json+zmq+thread overhead from the tunnel dispatch and the device step
    (the decomposition VERDICT r4 item 7 asks for)."""
    import json as _json
    import threading
    import zmq

    ctx = zmq.Context.instance()
    # Ephemeral OS-assigned port (CLAUDE.md: fixed ports collide with
    # TIME_WAIT / concurrent serving runs); bind here so the port is
    # known before the client connects.
    srv = ctx.socket(zmq.ROUTER)
    port = srv.bind_to_random_port("tcp://127.0.0.1")

    def echo(max_requests):
        sock = srv
        for _ in range(max_requests):
            frames = sock.recv_multipart()
            req = _json.loads(frames[-1].decode("utf-8"))
            reply = _json.dumps(
                {"rid": req["rid"], "Q": [0.0]}).encode("utf-8")
            sock.send_multipart(frames[:-1] + [reply])
        sock.close(0)

    t = threading.Thread(target=echo, args=(n_requests + 5,), daemon=True)
    t.start()
    sock = ctx.socket(zmq.DEALER)
    sock.connect(f"tcp://127.0.0.1:{port}")
    sock.setsockopt(zmq.RCVTIMEO, 30000)
    lat = []
    state = [0.0, 0.0, 0.1, 0.0]
    for i in range(n_requests + 5):
        t0 = time.perf_counter()
        sock.send_json({"rid": i, "state": state, "time": 0.0,
                        "updated_attributes": {}})
        resp = sock.recv_json()
        assert resp["rid"] == i
        if i >= 5:
            lat.append(time.perf_counter() - t0)
    sock.close(0)
    t.join(timeout=10)
    lat_ms = np.asarray(lat) * 1e3
    return (float(np.percentile(lat_ms, 50)), float(np.percentile(lat_ms, 99)))


def measure_served_batched_percentiles(B=32, K_per_slot=512, H=35,
                                       steps=60):
    """Steady-state round-trip (p50, p99) for the dynamically-batching
    multi-slot server: B DEALER clients (own threads, own identities)
    against a B-slot BatchedMPC — the fleet-serving SLO row."""
    import socket as _socket
    import threading
    import zmq

    from control_toolkit_tpu.controllers.batched_mpc import (
        BatchedMPCController,
    )
    from control_toolkit_tpu.serving.batched_server import serve_batched

    ctrl = BatchedMPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32),
                        np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="mppi", optimizer_config={
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H,
        "num_rollouts": K_per_slot, "cc_weight": 1.0, "R": 1.0,
        "LBD": 100.0, "NU": 1000.0, "SQRTRHOINV": 0.05,
        "period_interpolation_inducing_points": 5,
    }, num_slots=B)
    with _socket.socket() as _s:
        _s.bind(("127.0.0.1", 0))
        endpoint = f"tcp://127.0.0.1:{_s.getsockname()[1]}"
    stop = threading.Event()
    server = threading.Thread(
        target=serve_batched,
        kwargs=dict(ctrl=ctrl, endpoint=endpoint, batch_window_ms=3.0,
                    warmup_state=np.zeros(4, np.float32), stop_event=stop),
        daemon=True,
    )
    server.start()
    time.sleep(0.5)

    lat, lock = [], threading.Lock()

    def client(i):
        ctx = zmq.Context.instance()
        sock = ctx.socket(zmq.DEALER)
        sock.setsockopt(zmq.IDENTITY, f"bench-{i}".encode())
        sock.setsockopt(zmq.RCVTIMEO, 120000)
        sock.connect(endpoint)
        mine = []
        try:
            for r in range(steps):
                t0 = time.perf_counter()
                sock.send_json({"rid": r, "state": [0.0, 0.0, 0.1, 0.0],
                                "time": 0.0, "updated_attributes": {}})
                resp = sock.recv_json()
                assert resp["rid"] == r
                if r >= 10:  # steady state only
                    mine.append(time.perf_counter() - t0)
        finally:
            sock.close(0)
        with lock:
            lat.extend(mine)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(B)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    server.join(timeout=15)
    lat_ms = np.asarray(lat) * 1e3
    return (float(np.percentile(lat_ms, 50)), float(np.percentile(lat_ms, 99)))


def measure_value_terminal(K=16384, H_full=50, H_short=3, ticks=40):
    """The horizon-amortization claim measured end to end (VERDICT r3
    missing #2): fit V(x) on noisy-LQR cost-to-go (the test_value_terminal
    recipe — position-only stage cost on a double integrator, exploration
    noise + start-grid coverage), then record per-step device time AND
    closed-loop realized cost (scored under the plain stage cost) for
    plain H=50, plain H=3 and H=3 + V.  The H=3+V MPPI rides the
    semi-fused kernel with emit_terminal (V joins costs2d pre-softmax).

    Returns a dict of rows to merge into the results."""
    import jax
    import jax.numpy as jnp

    from control_toolkit_tpu.costs.base import CostFunction
    from control_toolkit_tpu.costs.value_terminal import ValueTerminalCost
    from control_toolkit_tpu.models.dynamics import soa_to_aos
    from control_toolkit_tpu.models.predictors import ODEPredictor
    from control_toolkit_tpu.models.training import (
        discounted_cost_to_go, fit_value_mlp,
    )
    from control_toolkit_tpu.optimizers.mppi import MPPIOptimizer

    DT = 0.1

    class PosCost(CostFunction):
        dynamic_config_keys = ("r",)

        def __init__(self, config=None):
            super().__init__({"r": 0.1, **(config or {})})

        def _stage_cost_core_soa(self, xs, us, params):
            return (0.5 * xs[0] * xs[0]
                    + 0.5 * params["cost"]["r"] * sum(u * u for u in us))

    def make_plant():
        def derivs_soa(xs, us, p):
            pos, vel = xs
            return (vel, us[0])
        # rk4, NOT euler: the euler form of this 2-state plant crashes
        # Mosaic ("Invalid relayout ... replicated in destination") in the
        # semi-fused MPPI kernel — reproduced on v5e, rk4 unaffected,
        # anchoring the aliased derivative doesn't help (CLAUDE.md
        # negative results).  rk4 is exact for a linear system anyway.
        return ODEPredictor(dynamics=soa_to_aos(derivs_soa, 2, 1),
                            num_states=2, num_control_inputs=1, dt=DT,
                            integrator="rk4", params={})

    def make_mppi(cost, horizon):
        opt = MPPIOptimizer(
            predictor=make_plant(), cost_function=cost,
            control_limits=(np.array([-2.0], np.float32),
                            np.array([2.0], np.float32)),
            optimizer_logging=False, seed=7, mpc_horizon=horizon,
            num_rollouts=K, cc_weight=0.0, R=1.0, LBD=10.0, NU=1000.0,
            SQRTRHOINV=0.4, period_interpolation_inducing_points=1,
        )
        opt.configure(num_states=2, num_control_inputs=1, dt=DT)
        return opt

    # 1) expert data: noisy LQR from a start grid (coverage off-manifold).
    A = np.array([[1, DT], [0, 1]], np.float64)
    Bm = np.array([[0], [DT]], np.float64)
    Q, R = np.diag([1.0, 1e-3]), np.array([[0.1]])
    P = Q.copy()
    for _ in range(500):
        Kg = np.linalg.solve(R + Bm.T @ P @ Bm, Bm.T @ P @ A)
        P = Q + A.T @ P @ (A - Bm @ Kg)
    Kg = np.linalg.solve(R + Bm.T @ P @ Bm, Bm.T @ P @ A).astype(np.float32)

    plant, base = make_plant(), PosCost()
    cp = base.current_params()
    dynp = plant.default_params()
    rng = np.random.default_rng(0)

    def expert_episodes(T, seed):
        rng = np.random.default_rng(seed)
        eps = []
        for s0 in [(a, b) for a in (-1.5, -0.75, 0.0, 0.75, 1.5)
                   for b in (-1.0, 0.0, 1.0)]:
            x = jnp.asarray(s0, jnp.float32)[None]
            u_prev = jnp.zeros((1, 1), jnp.float32)
            ep_s, ep_g = [], []
            for _ in range(T):
                u = jnp.clip(-(x @ jnp.asarray(Kg).T) + 0.3 * rng.normal(),
                             -2.0, 2.0)
                ep_g.append(float(base.stage_cost_step(
                    x, u, u_prev, {"cost": cp["cost"], "attrs": {}})[0]))
                ep_s.append(np.asarray(x[0]))
                x = plant.single_step(x, u, dynp)
                u_prev = u
            eps.append((np.stack(ep_s), np.asarray(ep_g), np.asarray(x[0])))
        return eps

    eps60 = expert_episodes(60, seed=0)
    vparams, mse = fit_value_mlp(
        np.concatenate([s for s, _, _ in eps60]),
        np.concatenate([discounted_cost_to_go(g, gamma=0.97)
                        for _, g, _ in eps60]),
        hiddens=(32, 32), epochs=2000, learning_rate=3e-3, seed=2,
    )

    # BOOT recipe (round 5, the best learnable variant found): longer
    # episodes + near-undiscounted targets + ONE fitted-value-iteration
    # round (targets bootstrapped at truncation with the previous fit).
    # Probed-and-rejected on CPU (probes/probe_value_recipe.py numbers at
    # K=1024): a DAgger round on H=3+V's own episodes HURT (292 vs 125),
    # and LBD/stdev retunes for the +V rows hurt across the board.
    from control_toolkit_tpu.models.networks import mlp_apply

    eps120 = expert_episodes(120, seed=1)

    def fit_from(eps, gamma, vprev=None, seed=2):
        xs, ys = [], []
        for ep_s, ep_g, x_T in eps:
            tail = 0.0
            if vprev is not None:
                tail = max(0.0, float(mlp_apply(
                    vprev, jnp.asarray(x_T, jnp.float32)[None])[0, 0]))
            xs.append(ep_s)
            ys.append(discounted_cost_to_go(ep_g, gamma=gamma,
                                            tail_value=tail))
        return fit_value_mlp(np.concatenate(xs), np.concatenate(ys),
                             hiddens=(32, 32), epochs=2000,
                             learning_rate=3e-3, seed=seed)

    v_long, _ = fit_from(eps120, gamma=0.99)
    v_boot, _ = fit_from(eps120, gamma=0.99, vprev=v_long, seed=3)

    # ORACLE ceiling (diagnostic row): an MLP fit on the analytic DARE
    # cost-to-go of the PLANNER's cost — the best any V-fit recipe can
    # possibly do.  Round-5 finding: even this exact V leaves H=3+V at
    # ~2x the H=50 cost (and clipped LQR scores ~14 on this eval, far
    # below every MPPI row) — the remaining gap is the short-horizon
    # MPPI's own sampling suboptimality, not the value function.
    Qc, Rc = np.diag([1.0, 0.0]), np.array([[0.1]])
    Pc = np.diag([1.0, 0.1])
    for _ in range(2000):
        Kc = np.linalg.solve(Rc + Bm.T @ Pc @ Bm, Bm.T @ Pc @ A)
        Pc = Qc + A.T @ Pc @ (A - Bm @ Kc)
    gx = np.stack(np.meshgrid(np.linspace(-3, 3, 61),
                              np.linspace(-3, 3, 61)), -1).reshape(-1, 2)
    gy = 0.5 * np.einsum("ni,ij,nj->n", gx, Pc, gx)
    v_orc, _ = fit_value_mlp(gx.astype(np.float32), gy.astype(np.float32),
                             hiddens=(32, 32), epochs=4000,
                             learning_rate=3e-3, seed=6)

    def realized(opt):
        total = 0.0
        for s0 in ([1.4, -0.6], [-1.0, 0.9], [0.5, 1.2]):
            opt.optimizer_reset()
            x = jnp.asarray(s0, jnp.float32)[None]
            u_prev = jnp.zeros((1, 1), jnp.float32)
            for _ in range(ticks):
                u = jnp.reshape(
                    jnp.asarray(opt.step(np.asarray(x[0]))), (1, 1))
                total += float(base.stage_cost_step(
                    x, u, u_prev, {"cost": cp["cost"], "attrs": {}})[0])
                x = plant.single_step(x, u, dynp)
                u_prev = u
        return total

    rows = {"value_fit_mse": round(float(mse), 5)}

    class _CtrlShim:
        """measure_step consumes a controller-shaped object."""
        def __init__(self, opt):
            self.optimizer = opt
            self._params = None

        def _assemble_params(self):
            return self.optimizer.default_params()

    for name, opt in (
        (f"value_mppi_K16k_H{H_full}_plain", make_mppi(PosCost(), H_full)),
        (f"value_mppi_K16k_H{H_short}_plain", make_mppi(PosCost(), H_short)),
        (f"value_mppi_K16k_H{H_short}_valueV",
         make_mppi(ValueTerminalCost(PosCost(), vparams), H_short)),
        (f"value_mppi_K16k_H{H_short}_valueV_boot",
         make_mppi(ValueTerminalCost(PosCost(), v_boot), H_short)),
        (f"value_mppi_K16k_H{H_short}_valueV_oracle",
         make_mppi(ValueTerminalCost(PosCost(), v_orc), H_short)),
    ):
        # H=3 steps are ~0.01 ms — the 20/100 slope is below tunnel noise
        # (one run measured a NEGATIVE row); stretch the scan lengths so
        # the slope numerator is well above it.
        n1, n2 = (20, 100) if opt.mpc_horizon >= 20 else (200, 1000)
        ms = measure_step(_CtrlShim(opt), n1=n1, n2=n2)
        rows[name + "_ms"] = round(ms, 4)
        rows[name + "_realized_cost"] = round(realized(opt), 3)
        print(f"{name:34s}: {ms:7.4f} ms/step, realized "
              f"{rows[name + '_realized_cost']:.3f}", flush=True)
    return rows


def measure_value_rpgd(K=16384, H=50):
    """Gradient planning over a learned terminal value: RPGD + V at
    K=16k/H=50 cartpole, fused gradient kernel (in-kernel V — the
    terminal vjp seeds the backward sweep with dV/dx_H) vs the XLA-AD
    scan (force_scan).  Returns rows to merge."""
    import jax

    from control_toolkit_tpu.costs.value_terminal import (
        attach_value_terminal,
    )
    from control_toolkit_tpu.models import networks as nets

    rows = {}
    for name, force_scan in (("value_rpgd_K16k_H50_kernel", False),
                             ("value_rpgd_K16k_H50_scan_ad", True)):
        ctrl = build_rpgd(K, H, force_scan=force_scan)
        attach_value_terminal(
            ctrl, nets.mlp_init(jax.random.PRNGKey(0), [4, 32, 32, 1]),
            value_scale=1.0,
        )
        ms = measure_step(ctrl, n1=20, n2=100)
        rows[name] = round(ms, 3)
        print(f"{name:34s}: {ms:7.3f} ms/step", flush=True)
    return rows


def measure_warmstart_overhead(K=16384, H=50, n1=20, n2=100):
    """Cost of one policy warm start (VERDICT r3 missing #1, warm-start
    row): device time of the jitted ``_policy_plan`` closed-loop rollout
    the optimizer runs ONCE per reset — measured with the same two-scan
    slope as the step rows."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_mppi

    ctrl = _build_mppi(num_rollouts=K, horizon=H, seed=0)
    opt = ctrl.optimizer
    opt.initial_guess_policy = lambda s, params: -0.5 * s[2:3]
    plan = opt._policy_plan()
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), ctrl._assemble_params()
    )
    s = jnp.zeros((1, opt.num_states), jnp.float32)

    def time_scan(n):
        @jax.jit
        def many(s, params):
            def body(c, _):
                p = plan(c, params)
                # fold the plan back into the carry so the scan can't be
                # collapsed into one iteration by CSE
                return c + 1e-9 * p[0].sum(), p
            return jax.lax.scan(body, s, None, length=n)

        _, ps = many(s, params)
        jax.block_until_ready(ps)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            _, ps = many(s, params)
            jax.block_until_ready(ps)
            best = min(best, time.perf_counter() - t0)
        return best

    return (time_scan(n2) - time_scan(n1)) / (n2 - n1) * 1e3


def run_batched_rows(results):
    """All batched-fleet kernel-vs-scan rows.  Every pair is measured
    INTERLEAVED (_interleaved_pair: k,s,k,s,k,s with both programs
    resident, min per path) — sequential single-shot pairs through the
    shared tunnel flipped rows between runs twice (round-4 and round-5
    full runs disagreed with the quiet interleaved recheck on the same
    day; probes/bench_batched_recheck.py).  Callable standalone via
    ``python bench_scale.py --batched-only`` (merges into the existing
    BENCH_SCALE.json)."""
    ms = measure_batched_serving(B=32, K_per_slot=512)
    results["batched_serving_B32_K512"] = round(ms, 3)
    results["batched_serving_B32_sessions_per_sec"] = round(32 / (ms / 1e3))
    print(f"batched serving B=32 K=512: {ms:.3f} ms/step "
          f"({32 / (ms / 1e3):.0f} session-steps/s)", flush=True)

    def pair(name, make_k, make_s, B=None, label=None):
        ms_k, ms_s = _interleaved_pair(make_k, make_s)
        results[name] = round(ms_k, 3)
        results[f"{name}_vmap_scan"] = round(ms_s, 3)
        if B is not None:
            base = name.split("_B")[0] + f"_B{B}"
            results[f"{base}_sessions_per_sec"] = int(B / (ms_k / 1e3))
        print(f"{label or name}: kernel {ms_k:.3f} ms/step | vmap-scan "
              f"{ms_s:.3f} | {ms_s / ms_k:.2f}x", flush=True)

    pair("batched_serving_B128_K512",
         lambda: measure_batched_serving(B=128, K_per_slot=512,
                                         as_timer=True),
         lambda: measure_batched_serving(B=128, K_per_slot=512,
                                         force_scan=True, as_timer=True),
         B=128, label="batched serving B=128 K=512")

    # Batched RPGD serving: columnwise gradient-kernel path vs vmapped
    # XLA-AD scan, at the reference's default per-session K=32.
    pair("batched_rpgd_B128_K32_H50",
         lambda: measure_batched_rpgd(B=128, K_per_slot=32, H=50,
                                      as_timer=True),
         lambda: measure_batched_rpgd(B=128, K_per_slot=32, H=50,
                                      force_scan=True, as_timer=True),
         B=128, label="batched RPGD B=128 K=32 H=50")

    # Fleet of LEARNED models: B RPGD sessions over a shared neural MLP.
    # At per-slot K=32 the neural gradient kernel auto-gates to the
    # vmapped scan (measured loss, round-5 — _grad_kernel_model_ok), so
    # the K=32 pair should be ~equal; the kernel's winning shape is K=512.
    pair("batched_rpgd_neural_B128_K32_H50",
         lambda: measure_batched_rpgd(
             B=128, K_per_slot=32, H=50, as_timer=True,
             predictor_specification="neural:mlp-32-32"),
         lambda: measure_batched_rpgd(
             B=128, K_per_slot=32, H=50, force_scan=True, as_timer=True,
             predictor_specification="neural:mlp-32-32"),
         B=128, label="batched neural RPGD B=128 K=32 H=50 (gated=scan)")
    pair("batched_rpgd_neural_B32_K512_H50",
         lambda: measure_batched_rpgd(
             B=32, K_per_slot=512, H=50, as_timer=True,
             predictor_specification="neural:mlp-32-32"),
         lambda: measure_batched_rpgd(
             B=32, K_per_slot=512, H=50, force_scan=True, as_timer=True,
             predictor_specification="neural:mlp-32-32"),
         label="batched neural RPGD B=32 K=512 H=50")

    pair("batched_gradient_B128_K32_H50",
         lambda: measure_batched_gradient(B=128, K_per_slot=32, H=50,
                                          as_timer=True),
         lambda: measure_batched_gradient(B=128, K_per_slot=32, H=50,
                                          force_scan=True, as_timer=True),
         label="batched gradient-tf B=128 K=32 H=50")

    pair("batched_var_B128_K512_H35",
         lambda: measure_batched_var(B=128, K_per_slot=512, H=35,
                                     as_timer=True),
         lambda: measure_batched_var(B=128, K_per_slot=512, H=35,
                                     force_scan=True, as_timer=True),
         label="batched mppi-var B=128 K=512 H=35")

    pair("batched_rnn_gru32_B128_K512_H35",
         lambda: measure_batched_rnn(B=128, K_per_slot=512, H=35,
                                     as_timer=True),
         lambda: measure_batched_rnn(B=128, K_per_slot=512, H=35,
                                     force_scan=True, as_timer=True),
         label="batched GRU-32 B=128 K=512 H=35")

    pair("batched_gp_sgp128_B128_K512_H35",
         lambda: measure_batched_gp(B=128, K_per_slot=512, H=35,
                                    as_timer=True),
         lambda: measure_batched_gp(B=128, K_per_slot=512, H=35,
                                    force_scan=True, as_timer=True),
         label="batched SGP-128 B=128 K=512 H=35")

    pair("batched_residual_B128_K512_H35",
         lambda: measure_batched_residual(B=128, K_per_slot=512, H=35,
                                          as_timer=True),
         lambda: measure_batched_residual(B=128, K_per_slot=512, H=35,
                                          force_scan=True, as_timer=True),
         label="batched ODE+res B=128 K=512 H=35")

    # Batched fully-fused CEM (columns counter-PRNG kernel, opt-in flag).
    pair("batched_fused_cem_B128_K512_H35",
         lambda: measure_batched_fused_cem(B=128, K_per_slot=512, H=35,
                                           as_timer=True),
         lambda: measure_batched_fused_cem(B=128, K_per_slot=512, H=35,
                                           fully_fused=False, as_timer=True),
         B=128, label="batched fused CEM B=128 K=512 H=35")


def main():
    import jax

    from __graft_entry__ import _build_mppi

    results = {"K": K, "H": H, "backend": jax.default_backend(), "unit": "ms/step"}

    for name, spec, setup in (
        ("modular", "ODE", {"semi_fused": False}),
        ("semi_fused", "ODE", {}),
        ("semi_fused_fast_math", "ODE:rk4:1:fast", {}),
    ):
        ctrl = _build_mppi(num_rollouts=K, horizon=H, seed=0, predictor_spec=spec)
        for k, v in setup.items():
            setattr(ctrl.optimizer, k, v)
        ms = measure_step(ctrl)
        results[name] = round(ms, 3)
        results[f"{name}_rollouts_per_sec"] = round(K / (ms / 1e3))
        print(f"{name:22s}: {ms:7.3f} ms  ({K / (ms / 1e3) / 1e6:.0f}M rollouts/s)",
              flush=True)

    for name, fused, spec in (
        ("cem_modular", False, "ODE"),
        ("cem_fused", True, "ODE"),
        ("cem_fused_fast_math", True, "ODE:rk4:1:fast"),
    ):
        ms = measure_step(build_cem(K, H, fused, predictor_spec=spec))
        results[name] = round(ms, 3)
        print(f"{name:22s}: {ms:7.3f} ms", flush=True)

    # 12-state/4-input model family at scale (semi-fused + fast-math).
    quad_K = K // 4  # 262,144 rollouts: 4 inputs -> same sampled-noise volume
    ms = measure_step(build_quad3d_mppi(quad_K, H))
    results["quad3d_K262k_semi_fused_fast"] = round(ms, 3)
    results["quad3d_rollouts_per_sec"] = round(quad_K / (ms / 1e3))
    print(f"quad3d semi-fused fast K={quad_K}: {ms:7.3f} ms "
          f"({quad_K / (ms / 1e3) / 1e6:.0f}M rollouts/s)", flush=True)

    # Trig-heavy 2-input manipulator at scale (semi-fused + fast-math).
    arm_K = 1 << 18
    ms = measure_step(build_arm2_mppi(arm_K, H), n1=5, n2=25)
    results["arm2_K262k_semi_fused_fast"] = round(ms, 3)
    results["arm2_rollouts_per_sec"] = round(arm_K / (ms / 1e3))
    print(f"arm2 semi-fused fast K={arm_K}: {ms:7.3f} ms "
          f"({arm_K / (ms / 1e3) / 1e6:.0f}M rollouts/s)", flush=True)

    # Neural-predictor rows (VERDICT r2 item 2): MPPI over a learned MLP
    # next-state model — XLA scan baseline vs the fused neural kernel
    # (ops/pallas_neural.py) at K=16k and K=262k, plus the recurrent GRU
    # predictor (scan-only; hidden threading excludes the fused paths).
    for name, Kn, kw in (
        ("neural_mlp32_K16k_scan", 16384, {"force_scan": True}),
        ("neural_mlp32_K16k_kernel", 16384, {}),
        ("neural_mlp32_K262k_scan", 1 << 18, {"force_scan": True}),
        ("neural_mlp32_K262k_kernel", 1 << 18, {}),
        ("neural_mlp64x64_K262k_kernel", 1 << 18, {"net": "mlp-64-64"}),
        ("neural_gru32_K16k_scan", 16384,
         {"net": "GRU-5IN-32H1-4OUT", "force_scan": True}),
        ("neural_gru32_K16k_kernel", 16384, {"net": "GRU-5IN-32H1-4OUT"}),
        ("neural_gru32_K262k_kernel", 1 << 18, {"net": "GRU-5IN-32H1-4OUT"}),
        ("neural_lstm32_K16k_kernel", 16384, {"net": "LSTM-5IN-32H1-4OUT"}),
    ):
        try:
            # Sub-ms steps need long scans: a 5/25-step slope is below the
            # tunnel's run-to-run timing noise (a K=16k kernel row once
            # measured NEGATIVE), so small K gets the 20/100 slope.
            n1, n2 = (20, 100) if Kn <= 16384 else (5, 25)
            ms = measure_step(build_neural_mppi(Kn, H, **kw), n1=n1, n2=n2)
            results[name] = round(ms, 3)
            results[f"{name}_rollouts_per_sec"] = round(Kn / (ms / 1e3))
            print(f"{name:28s}: {ms:7.3f} ms ({Kn/(ms/1e3)/1e6:.1f}M rollouts/s)",
                  flush=True)
        except Exception as e:
            results[f"{name}_error"] = str(e)[:200]
            print(f"{name}: ERROR {e}", flush=True)

    # PETS ensemble rows: TS-inf blockwise trajectory sampling over a
    # 4-member mlp-32-32 bootstrap ensemble — member-vmapped scan vs the
    # ensemble form of the neural kernel (per-tile member weight blocks;
    # probe: 0.176 vs 0.415 ms = 2.4x at K=16k, ~= the single-net kernel).
    for name, Kn, kw in (
        ("ensemble_mlp32x4_K16k_scan", 16384, {"force_scan": True}),
        ("ensemble_mlp32x4_K16k_kernel", 16384, {}),
        ("ensemble_mlp32x4_K262k_kernel", 1 << 18, {}),
    ):
        try:
            n1, n2 = (20, 100) if Kn <= 16384 else (5, 25)
            ms = measure_step(build_ensemble_mppi(Kn, H, **kw), n1=n1, n2=n2)
            results[name] = round(ms, 3)
            results[f"{name}_rollouts_per_sec"] = round(Kn / (ms / 1e3))
            print(f"{name:28s}: {ms:7.3f} ms ({Kn/(ms/1e3)/1e6:.1f}M rollouts/s)",
                  flush=True)
        except Exception as e:
            results[f"{name}_error"] = str(e)[:200]
            print(f"{name}: ERROR {e}", flush=True)

    # Residual ('ODE+res') adaptive-MPC rows: fused residual kernel vs the
    # fused scan (measured 6.5x at K=16k — the scan streams both the rk4
    # intermediates and the MLP activations through HBM per step).
    for name, kw in (
        ("res_mppi_K16k_scan", {"force_scan": True}),
        ("res_mppi_K16k_kernel", {}),
    ):
        try:
            ms = measure_step(build_residual_ctrl(16384, H, **kw),
                              n1=20, n2=100)
            results[name] = round(ms, 3)
            print(f"{name:28s}: {ms:7.3f} ms", flush=True)
        except Exception as e:
            results[f"{name}_error"] = str(e)[:200]
            print(f"{name}: ERROR {e}", flush=True)

    # Sparse-GP predictor rows: M=128 inducing points, per-step [K,128]
    # RBF kernel block + [128,S] posterior weights — XLA scan (HBM-resident
    # blocks) vs the fused Pallas GP kernel (blocks live in VMEM).
    for name, Kn, kw in (
        ("gp_sgp128_K16k_scan", 16384, {"force_scan": True}),
        ("gp_sgp128_K16k_kernel", 16384, {}),
        ("gp_sgp128_K262k_scan", 1 << 18, {"force_scan": True}),
        ("gp_sgp128_K262k_kernel", 1 << 18, {}),
    ):
        try:
            n1, n2 = (20, 100) if Kn <= 16384 else (5, 25)
            ms = measure_step(build_gp_mppi(Kn, H, **kw), n1=n1, n2=n2)
            results[name] = round(ms, 3)
            results[f"{name}_rollouts_per_sec"] = round(Kn / (ms / 1e3))
            print(f"{name:28s}: {ms:7.3f} ms ({Kn/(ms/1e3)/1e6:.1f}M rollouts/s)",
                  flush=True)
        except Exception as e:
            results[f"{name}_error"] = str(e)[:200]
            print(f"{name}: ERROR {e}", flush=True)

    # RPGD resample-tick cost (VERDICT r2 item 7): fresh sequences are
    # drawn at inducing points in XLA and interpolated; isolate the
    # per-resample cost by differencing resample-EVERY-tick against
    # resample-never at K=262k.
    try:
        base_kw = {"resamp_per": 10**6}
        every_kw = {"resamp_per": 1}

        def rpgd_at(K_, extra):
            from control_toolkit_tpu.controllers.mpc import MPCController
            ctrl = MPCController(
                environment_name="cartpole",
                control_limits=(np.array([-1.0], np.float32),
                                np.array([1.0], np.float32)),
                initial_environment_attributes={"target_position": 0.0},
                config={"optimizer": "rpgd-tf", "controller_logging": False},
            )
            ctrl.configure(optimizer_name="rpgd-tf", optimizer_config={
                "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H,
                "num_rollouts": K_, "outer_its": 1,
                "SAMPLING_DISTRIBUTION": "uniform",
                "period_interpolation_inducing_points": 10,
                "learning_rate": 0.05, "gradmax_clip": 5,
                "opt_keep_k_ratio": 0.25, "sample_stdev": 0.5,
                "warmup": False, "warmup_iterations": 1, **extra,
            })
            return ctrl

        Kr = 1 << 18
        ms_never = measure_step(rpgd_at(Kr, base_kw), n1=5, n2=25)
        ms_every = measure_step(rpgd_at(Kr, every_kw), n1=5, n2=25)
        results["rpgd_K262k_resample_never"] = round(ms_never, 3)
        results["rpgd_K262k_resample_every"] = round(ms_every, 3)
        results["rpgd_K262k_resample_cost"] = round(ms_every - ms_never, 3)
        print(f"rpgd resample cost @262k: {ms_every - ms_never:.3f} ms "
              f"({ms_never:.3f} -> {ms_every:.3f})", flush=True)
    except Exception as e:
        results["rpgd_resample_error"] = str(e)[:200]
        print(f"rpgd resample: ERROR {e}", flush=True)

    # Gradient path: RPGD differentiates through the rollout.  XLA-AD
    # baseline (force_scan) vs the fused Pallas gradient kernel.
    for name, kw in (
        ("rpgd_grad_K16k_xla", {"force_scan": True}),
        ("rpgd_grad_K16k_kernel", {}),
        # fast-math trig in the grad kernel: modest (~12%) — the backward
        # sweep is transposed-rk4-arithmetic-bound, not trig-bound.
        ("rpgd_grad_K16k_kernel_fast", {"predictor_spec": "ODE:rk4:1:fast"}),
        # Gradient MPC over LEARNED dynamics: the neural gradient kernel
        # (ops/pallas_grad.py neural twin) vs XLA-AD through the scan.
        # The margin is smaller than the ODE case (measured 1.25x at
        # K=16k, 1.37x at K=262k) because the MLP's XLA-AD baseline is
        # MXU matmuls, not the VPU-bound transposed-rk4 arithmetic.
        ("rpgd_neural_mlp32_K16k_xla",
         {"force_scan": True, "predictor_spec": "neural:mlp-32-32"}),
        ("rpgd_neural_mlp32_K16k_kernel",
         {"predictor_spec": "neural:mlp-32-32"}),
        # Gradient MPC over a PETS ensemble (TS-inf): the ensemble form of
        # the neural gradient kernel (probe: 4.14 vs 5.04 ms = 1.22x at
        # K=16k E=4 — same margin class as the single net, i.e. the
        # 4-member backward costs one net's backward).
        ("rpgd_ensemble_mlp32x4_K16k_xla",
         {"force_scan": True, "predictor_spec": "ensemble:mlp-32-32:4"}),
        ("rpgd_ensemble_mlp32x4_K16k_kernel",
         {"predictor_spec": "ensemble:mlp-32-32:4"}),
        # Gradient MPC over the sparse GP: AD through the scan streams the
        # [K, M] RBF blocks through HBM both ways, so the fused GP gradient
        # kernel pays more than the neural one (measured 2.5x at K=16k).
        ("rpgd_gp128_K16k_xla", {"force_scan": True, "gp": True}),
        ("rpgd_gp128_K16k_kernel", {"gp": True}),
        # Adaptive-MPC gradient path: RPGD over 'ODE+res' (fused residual
        # gradient twin — measured 3.7x XLA-AD at K=16k).
        ("rpgd_res_K16k_xla", {"force_scan": True, "residual": True}),
        ("rpgd_res_K16k_kernel", {"residual": True}),
    ):
        if kw.pop("gp", False):
            kw["predictor_spec"] = f"SGP_128:{_gp_checkpoint(128)}"
        if kw.pop("residual", False):
            ctrl = build_residual_ctrl(16384, H, optimizer="rpgd-tf", **kw)
        else:
            ctrl = build_rpgd(16384, H, **kw)
        ms = measure_step(ctrl, n1=5, n2=25)
        results[name] = round(ms, 3)
        print(f"{name:22s}: {ms:7.3f} ms", flush=True)

    # Phase-4 sampling zoo (VERDICT r3 missing #1): CMA-ES (full +
    # sep-CMA diagonal; note the per-generation [H*U,H*U] eigh inside
    # fori_loop), iCEM, and a same-run modular-CEM pair at matching
    # shapes for the ratio.
    for name, builder in (
        ("cma_es_K64_H50", lambda: build_cma(64, H)),
        ("cma_es_diag_K64_H50", lambda: build_cma(64, H, diagonal=True)),
        ("cma_es_K512_H50", lambda: build_cma(512, H)),
        ("icem_K16k_H50", lambda: build_icem(16384, H)),
        ("cem_modular_K16k_H50", lambda: build_cem(16384, H, False)),
        ("cem_fused_K16k_H50", lambda: build_cem(16384, H, True)),
        ("icem_K512_H50", lambda: build_icem(512, H)),
        ("cem_modular_K512_H50", lambda: build_cem(512, H, False)),
    ):
        try:
            ms = measure_step(builder(), n1=20, n2=100)
            results[name] = round(ms, 4)
            print(f"{name:24s}: {ms:7.4f} ms", flush=True)
        except Exception as e:
            results[f"{name}_error"] = str(e)[:200]
            print(f"{name}: ERROR {e}", flush=True)

    # Learned terminal value: horizon amortization measured end to end
    # (ms/step + realized closed-loop cost, VERDICT r3 missing #2).
    try:
        results.update(measure_value_terminal())
    except Exception as e:
        results["value_terminal_error"] = str(e)[:200]
        print(f"value terminal: ERROR {e}", flush=True)

    # RPGD over a learned terminal value: gradient kernel (in-kernel V)
    # vs XLA-AD scan.
    try:
        results.update(measure_value_rpgd())
    except Exception as e:
        results["value_rpgd_error"] = str(e)[:200]
        print(f"value rpgd: ERROR {e}", flush=True)

    # Policy warm-start overhead: one _policy_plan rollout per reset.
    try:
        ms = measure_warmstart_overhead()
        results["policy_warmstart_plan_ms"] = round(ms, 4)
        print(f"policy warm-start plan: {ms:.4f} ms per reset", flush=True)
    except Exception as e:
        results["policy_warmstart_error"] = str(e)[:200]
        print(f"policy warm-start: ERROR {e}", flush=True)

    # NLP slot (host-loop ms/step): latency-bound solver, so the device pin
    # (docs/TUNING.md rule 6) is the lever — CPU avoids both the tiny-op
    # latency and the dispatch round-trip.
    for name, dev in (("ilqr_H50_30it_hostloop_tpu", None),
                      ("ilqr_H50_30it_hostloop_cpu_pin", "cpu")):
        ms = measure_host_loop(build_ilqr(device=dev))
        results[name] = round(ms, 3)
        print(f"{name:32s}: {ms:7.3f} ms", flush=True)

    # BASELINE.md scale-out composition: ZMQ server fronting semi-fused
    # MPPI on this chip — served round-trip p50 AND steady-state p99 (the
    # serving SLO row: the reference's remote controller budgets 50 ms per
    # request, controller_remote.py:11-12).
    for kname, Ks in (("K262k", 1 << 18), ("K1M", K)):
        try:
            p50, p99 = measure_served_mppi(Ks, H)
            results[f"served_{kname}_roundtrip_p50_ms"] = round(p50, 3)
            results[f"served_{kname}_roundtrip_p99_ms"] = round(p99, 3)
            print(f"served {kname} round-trip p50 {p50:.3f} ms | "
                  f"p99 {p99:.3f} ms", flush=True)
        except Exception as e:
            results[f"served_{kname}_error"] = str(e)[:200]
            print(f"served {kname}: ERROR {e}", flush=True)

    # Serving-latency DECOMPOSITION (VERDICT r4 item 7): where do the
    # served milliseconds go?  (a) echo = json+zmq+thread only (no jax);
    # (b) K=256 served = echo + tunnel dispatch + ~0 device -> the
    # round-trip is dispatch-floor-bound on this single-chip tunnel
    # (~25-30 ms/dispatch, CLAUDE.md); (c) colocated projection = what a
    # production deployment without the tunnel would see: echo p99 + the
    # slope-measured device step (no dispatch floor — local PCIe/ICI
    # dispatch is ~0.1 ms).  The 50 ms deadline (controller_remote.py:
    # 11-12) is met colocated at every K; it is the TUNNEL that breaks it
    # at K=1M, not the framework.
    try:
        e50, e99 = measure_served_echo()
        results["served_echo_p50_ms"] = round(e50, 3)
        results["served_echo_p99_ms"] = round(e99, 3)
        d50, d99 = measure_served_mppi(256, H)
        results["served_K256_roundtrip_p50_ms"] = round(d50, 3)
        results["served_K256_roundtrip_p99_ms"] = round(d99, 3)
        dev_ms = results.get("semi_fused_fast_math")  # slope, K=1M config
        if dev_ms is not None:
            proj = e99 + dev_ms
            results["served_K1M_colocated_projection_p99_ms"] = round(proj, 3)
        print(f"serving decomposition: echo p50/p99 {e50:.3f}/{e99:.3f} ms | "
              f"K=256 served p50/p99 {d50:.3f}/{d99:.3f} ms (tunnel floor) | "
              f"colocated K=1M projection p99 "
              f"{results.get('served_K1M_colocated_projection_p99_ms')} ms",
              flush=True)
    except Exception as e:
        results["served_decomposition_error"] = str(e)[:200]
        print(f"serving decomposition: ERROR {e}", flush=True)

    # Fleet-serving SLO: B=32 concurrent clients against a 32-slot batched
    # server (K=512/slot on-device config), steady-state p50/p99.
    try:
        p50, p99 = measure_served_batched_percentiles(B=32, K_per_slot=512)
        results["served_batched_B32_K512_p50_ms"] = round(p50, 3)
        results["served_batched_B32_K512_p99_ms"] = round(p99, 3)
        print(f"served batched B=32 K=512: p50 {p50:.3f} ms | p99 {p99:.3f} ms",
              flush=True)
    except Exception as e:
        results["served_batched_error"] = str(e)[:200]
        print(f"served batched: ERROR {e}", flush=True)

    run_batched_rows(results)

    # Monte-Carlo sweep: N closed-loop episodes in one program, kernel vs
    # vmapped-scan tick (slope method — dispatch-free ms/tick).
    ms_k = measure_mc_sweep(N=128, K=512, H=50)
    ms_s = measure_mc_sweep(N=128, K=512, H=50, force_scan=True)
    results["mc_sweep_N128_K512_H50_ms_per_tick"] = round(ms_k, 4)
    results["mc_sweep_N128_K512_H50_vmap_scan_ms_per_tick"] = round(ms_s, 4)
    print(f"MC sweep N=128 K=512 H=50: kernel {ms_k:.3f} ms/tick | "
          f"vmap-scan {ms_s:.3f} | {ms_s / ms_k:.2f}x", flush=True)

    # Hyperparameter-grid sweep: 512 configs (target x pole length x
    # ep_weight as per-episode kernel rows), whole grid per tick.
    try:
        ms = measure_grid_sweep(N=512, K=512, H=50)
        results["grid_sweep_N512_K512_H50_ms_per_tick"] = round(ms, 4)
        results["grid_sweep_config_ticks_per_sec"] = round(512 / (ms / 1e3))
        print(f"grid sweep N=512 K=512 H=50: {ms:.3f} ms/tick "
              f"({512 / (ms / 1e3):.0f} config-ticks/s)", flush=True)
    except Exception as e:
        results["grid_sweep_error"] = str(e)[:200]
        print(f"grid sweep: ERROR {e}", flush=True)

    Path(__file__).parent.joinpath("BENCH_SCALE.json").write_text(
        json.dumps(results, indent=2)
    )
    print(json.dumps(results))


def batched_only():
    """Re-measure ONLY the batched kernel-vs-scan rows (interleaved
    pairs) and merge them into the existing BENCH_SCALE.json — pair
    ratios are within-pair-coherent by construction, so refreshing just
    these rows never mixes a ratio across runs."""
    import jax

    path = Path(__file__).parent / "BENCH_SCALE.json"
    results = json.loads(path.read_text()) if path.exists() else {}
    assert results.get("backend", jax.default_backend()) \
        == jax.default_backend()
    run_batched_rows(results)
    path.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    if "--batched-only" in sys.argv:
        batched_only()
    else:
        main()
