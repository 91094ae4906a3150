"""System identification: fit neural dynamics models from rollout data.

The reference trains its neural predictors in the external SI_Toolkit; this
module provides the equivalent capability in-tree: collect transitions from
a batched environment (or real logs), fit an MLP/GRU dynamics model with
optax Adam under jit, and save a checkpoint loadable by NeuralPredictor.

All fitters take an optional ``mesh``: the minibatch axis is then sharded
over every mesh axis (data parallelism) while parameters stay replicated,
and XLA inserts the gradient all-reduce — the same SPMD recipe the
optimizers use for the rollout axis.  Sharded and unsharded training are
numerically identical per step up to float reduction order.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding

from control_toolkit_tpu.models import networks as nets
from control_toolkit_tpu.utils.logging_util import get_logger
from control_toolkit_tpu.utils.rng import make_key

logger = get_logger(__name__)


def _dp_helpers(mesh: Optional[Mesh]) -> Tuple[Callable, Callable]:
    """(constrain_batch, replicate) for data-parallel training.

    ``constrain_batch`` shards axis 0 of an in-program array over every mesh
    axis (composite spec for 2-D ('slice','k') meshes); ``replicate`` places
    a pytree replicated on the mesh.  With ``mesh=None`` both are identity.
    """
    if mesh is None:
        return (lambda a: a), (lambda t: t)
    from control_toolkit_tpu.parallel.mesh import population_spec, replicated

    batch = NamedSharding(mesh, population_spec(mesh, 1))
    repl = replicated(mesh)

    def constrain(a):
        return jax.lax.with_sharding_constraint(a, batch)

    def replicate(tree):
        return jax.tree_util.tree_map(lambda v: jax.device_put(v, repl), tree)

    return constrain, replicate


def _dp_batch_size(batch_size: int, mesh: Optional[Mesh]) -> int:
    """Round the minibatch down to a multiple of the mesh size (sharding a
    non-divisible batch axis is an XLA error)."""
    if mesh is None or batch_size % mesh.size == 0:
        return batch_size
    if batch_size < mesh.size:
        raise ValueError(
            f"minibatch {batch_size} < mesh size {mesh.size}: cannot shard; "
            "raise batch_size (or the dataset size) or train without a mesh")
    adj = batch_size - batch_size % mesh.size
    logger.info(f"minibatch {batch_size} -> {adj} (divisible by mesh size {mesh.size})")
    return adj


def collect_transitions(
    env, n_steps: int, seed: int = 0, episode_length: int = 25
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Random-policy transition collection: (x_t [N,S], u_t [N,U], x_{t+1}).

    Episodes are restarted every ``episode_length`` steps so the visited
    state distribution stays bounded (a free-spinning random policy drives
    angles through many revolutions, which a smooth regressor can't cover).
    """
    rng = np.random.default_rng(seed)
    s, _ = env.reset(seed=seed)
    xs, us, xn = [], [], []
    for t in range(n_steps):
        u = rng.uniform(env.action_low, env.action_high,
                        size=(env.batch_size, env.num_actions)).astype(np.float32)
        s_next, *_ = env.step(u)
        xs.append(s.copy()); us.append(u); xn.append(s_next.copy())
        s = s_next
        if (t + 1) % episode_length == 0:
            s, _ = env.reset(seed=int(rng.integers(1 << 30)))
    return (np.concatenate(xs), np.concatenate(us), np.concatenate(xn))


def fit_mlp_dynamics(
    x: np.ndarray, u: np.ndarray, x_next: np.ndarray,
    hiddens=(64, 64), epochs: int = 500, batch_size: int = 1024,
    learning_rate: float = 1e-3, seed: int = 0,
    predict_delta: bool = True, params: Optional[Dict] = None,
    mesh: Optional[Mesh] = None,
) -> Tuple[Dict, float]:
    """Fit ``x_{t+1} - x_t = net(x, u)`` (delta form). Returns (params, mse).

    With ``mesh``, each Adam step runs data-parallel over the mesh (minibatch
    sharded, params replicated, grad psum inserted by XLA)."""
    S, U = x.shape[-1], u.shape[-1]
    key = make_key(seed, "fit_mlp_dynamics")

    target_np = (x_next - x) if predict_delta else x_next
    inp_np = np.concatenate([x, u], axis=-1)
    # Standardize inputs and targets; the normalization constants ship inside
    # the params dict so NeuralPredictor applies them transparently.  A
    # warm start REUSES the provided params' constants: the core weights
    # were trained under them, and recomputing from the new dataset would
    # discontinuously shift the function the net computes (continual
    # refits would start WORSE than the previous fit — review r5).
    if params is not None and "norm_in_mean" in params:
        in_mean = np.asarray(params["norm_in_mean"], np.float64)
        in_std = np.asarray(params["norm_in_std"], np.float64)
        t_mean = np.asarray(params["norm_out_mean"], np.float64)
        t_std = np.asarray(params["norm_out_std"], np.float64)
    else:
        in_mean = inp_np.mean(0); in_std = inp_np.std(0) + 1e-6
        t_mean = target_np.mean(0); t_std = target_np.std(0) + 1e-6

    if params is None:
        key, sub = jax.random.split(key)
        params = nets.mlp_init(sub, [S + U] + list(hiddens) + [S])
    params = dict(params)
    params["norm_in_mean"] = jnp.asarray(in_mean, jnp.float32)
    params["norm_in_std"] = jnp.asarray(in_std, jnp.float32)
    params["norm_out_mean"] = jnp.asarray(t_mean, jnp.float32)
    params["norm_out_std"] = jnp.asarray(t_std, jnp.float32)

    inp = jnp.asarray((inp_np - in_mean) / in_std, jnp.float32)
    target = jnp.asarray((target_np - t_mean) / t_std, jnp.float32)

    core = {k: v for k, v in params.items() if not k.startswith("norm_")}

    tx = optax.adam(learning_rate)
    opt_state = tx.init(core)

    constrain, replicate = _dp_helpers(mesh)
    core, opt_state = replicate(core), replicate(opt_state)

    def loss_fn(p, xb, yb):
        pred = nets.mlp_apply(p, xb)
        return jnp.mean((pred - yb) ** 2)

    # Minibatch gather lives INSIDE the jitted step so the sharded batch
    # never materializes on the host; data/target arrive as device operands.
    @jax.jit
    def train_step(p, o, data, tgt, idx):
        xb = constrain(jnp.take(data, idx, axis=0))
        yb = constrain(jnp.take(tgt, idx, axis=0))
        loss, grads = jax.value_and_grad(loss_fn)(p, xb, yb)
        updates, o = tx.update(grads, o)
        return optax.apply_updates(p, updates), o, loss

    n = inp.shape[0]
    bs = _dp_batch_size(min(batch_size, n), mesh)
    loss = jnp.inf
    p = core
    for epoch in range(epochs):
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (bs,), 0, n)
        p, opt_state, loss = train_step(p, opt_state, inp, target, idx)
    final = float(jax.jit(loss_fn)(p, inp, target))
    params.update(p)
    logger.info(f"dynamics fit: final batch loss {float(loss):.3e}, normalized MSE {final:.3e}")
    return params, final


def fit_ensemble_mlp_dynamics(
    x: np.ndarray, u: np.ndarray, x_next: np.ndarray,
    n_members: int = 5, hiddens=(32, 32), epochs: int = 500,
    batch_size: int = 1024, learning_rate: float = 1e-3, seed: int = 0,
    predict_delta: bool = True, mesh: Optional[Mesh] = None,
    probabilistic: bool = False,
) -> Tuple[Dict, np.ndarray]:
    """Fit a bootstrap ensemble of E delta-dynamics MLPs (PETS-style).

    Every parameter leaf gets a leading member axis of size ``n_members``
    (the layout ``EnsemblePredictor`` consumes): each member trains on its
    OWN bootstrap resample of the dataset with its OWN init — the two
    classic diversity sources — under one jitted, member-vmapped Adam step.
    Normalization constants are shared (full-dataset statistics, tiled per
    member so the stacked pytree stays uniform).

    ``probabilistic=True`` (the PETS 'PE' model class): members output a
    Gaussian head (mean + log-variance, output width 2S) trained with the
    heteroscedastic NLL; the log-variance is soft-bounded
    (ensemble_predictor.bound_logvar).  The returned per-member metric is
    always the MEAN-head normalized MSE, comparable across modes.

    With ``mesh``, the MEMBER axis is sharded over every mesh axis (the
    ensemble is embarrassingly parallel — XLA partitions the vmapped step
    with zero collectives); ``n_members`` must divide by the mesh size.
    Returns (stacked params, per-member full-set normalized MSE [E]).
    """
    E = int(n_members)
    S, U = x.shape[-1], u.shape[-1]
    key = make_key(seed, "fit_ensemble_mlp_dynamics")

    target_np = (x_next - x) if predict_delta else x_next
    inp_np = np.concatenate([x, u], axis=-1)
    in_mean = inp_np.mean(0); in_std = inp_np.std(0) + 1e-6
    t_mean = target_np.mean(0); t_std = target_np.std(0) + 1e-6

    key, sub = jax.random.split(key)
    keys = jax.random.split(sub, E)
    sizes = [S + U] + list(hiddens) + [2 * S if probabilistic else S]
    core = jax.vmap(lambda k: nets.mlp_init(k, sizes))(keys)

    inp = jnp.asarray((inp_np - in_mean) / in_std, jnp.float32)
    target = jnp.asarray((target_np - t_mean) / t_std, jnp.float32)
    n = inp.shape[0]

    # Per-member bootstrap resample (with replacement) of the dataset;
    # minibatches index into the member's bootstrap row.
    boot = jnp.asarray(
        np.random.default_rng(seed).integers(0, n, size=(E, n)), jnp.int32
    )

    tx = optax.adam(learning_rate)
    opt_state = tx.init(core)

    if mesh is not None:
        if E % mesh.size != 0:
            raise ValueError(
                f"n_members {E} must divide by mesh size {mesh.size} for "
                "member-axis ensemble parallelism")
        from control_toolkit_tpu.parallel.mesh import population_spec, replicated

        # Host arrays enter REPLICATED (valid on multi-process meshes where
        # this process can't address every device); the member-axis layout
        # is imposed with in-program sharding constraints, so XLA keeps
        # params/moments member-sharded across steps — same recipe as the
        # data-parallel fitters above.
        repl = replicated(mesh)
        core, opt_state, boot = (
            jax.tree_util.tree_map(lambda v: jax.device_put(v, repl), t)
            for t in (core, opt_state, boot)
        )

        def constrain_members(tree):
            from jax.sharding import PartitionSpec as P

            def c(v):
                # Scalar leaves (the Adam step count) replicate; array
                # leaves shard their leading member axis.
                spec = P() if jnp.ndim(v) == 0 else population_spec(
                    mesh, jnp.ndim(v))
                return jax.lax.with_sharding_constraint(
                    v, NamedSharding(mesh, spec))
            return jax.tree_util.tree_map(c, tree)
    else:
        def constrain_members(tree):
            return tree

    if probabilistic:
        from control_toolkit_tpu.models.ensemble_predictor import bound_logvar

        def loss_fn(p, xb, yb):
            out = nets.mlp_apply(p, xb)
            mean, raw_lv = out[..., :S], out[..., S:]
            lv = bound_logvar(raw_lv)
            return jnp.mean(jnp.exp(-lv) * (mean - yb) ** 2 + lv)

        def mse_fn(p, xb, yb):
            return jnp.mean((nets.mlp_apply(p, xb)[..., :S] - yb) ** 2)
    else:
        def loss_fn(p, xb, yb):
            return jnp.mean((nets.mlp_apply(p, xb) - yb) ** 2)

        mse_fn = loss_fn

    @jax.jit
    def train_step(p, o, data, tgt, boot_tab, pos):
        # pos [E, bs] positions into each member's bootstrap row.  The
        # [E, n] bootstrap table arrives as an ARGUMENT — closing over it
        # would bake megabytes of int32 constants into every re-trace as
        # the PETS loop's dataset grows (review finding; cf.
        # fit_mlp_dynamics passing idx).
        p, o = constrain_members(p), constrain_members(o)
        idx = jnp.take_along_axis(boot_tab, pos, axis=1)
        xb = jnp.take(data, idx, axis=0)   # [E, bs, S+U]
        yb = jnp.take(tgt, idx, axis=0)
        losses, grads = jax.vmap(jax.value_and_grad(loss_fn))(p, xb, yb)
        updates, o = tx.update(grads, o)   # Adam is elementwise: stacked
        return (constrain_members(optax.apply_updates(p, updates)),
                constrain_members(o), losses)

    bs = min(batch_size, n)
    p = core
    for _ in range(epochs):
        key, sub = jax.random.split(key)
        pos = jax.random.randint(sub, (E, bs), 0, n)
        p, opt_state, losses = train_step(p, opt_state, inp, target, boot, pos)

    if mesh is not None:
        # De-shard to replicated before anything crosses the host boundary:
        # on a multi-process mesh the member-sharded leaves are not fully
        # addressable here, so eager reads (np.asarray, checkpoint saves)
        # would fail — and callers expect ordinary usable params.
        rep = replicated(mesh)
        p = jax.jit(
            lambda t: t,
            out_shardings=jax.tree_util.tree_map(lambda _: rep, p),
        )(p)
    per_member = np.asarray(
        jax.jit(jax.vmap(lambda m: mse_fn(m, inp, target)))(p)
    )
    logger.info(
        f"ensemble fit (E={E}): per-member normalized MSE "
        f"{per_member.min():.3e}..{per_member.max():.3e}"
    )
    params = dict(p)
    params["norm_in_mean"] = jnp.broadcast_to(
        jnp.asarray(in_mean, jnp.float32), (E, S + U))
    params["norm_in_std"] = jnp.broadcast_to(
        jnp.asarray(in_std, jnp.float32), (E, S + U))
    params["norm_out_mean"] = jnp.broadcast_to(
        jnp.asarray(t_mean, jnp.float32), (E, S))
    params["norm_out_std"] = jnp.broadcast_to(
        jnp.asarray(t_std, jnp.float32), (E, S))
    return params, per_member


def fit_gru_dynamics(
    x_seqs: np.ndarray, u_seqs: np.ndarray,
    hiddens=(32,), epochs: int = 1500, learning_rate: float = 3e-3,
    seed: int = 0, rollout_len: int = 8, batch_size: int = 256,
    mesh: Optional[Mesh] = None,
) -> Tuple[Dict, float]:
    """Fit a GRU dynamics model on episode data.

    x_seqs: [E, T+1, S] state episodes; u_seqs: [E, T, U] applied controls.
    Trained on multi-step open-loop prediction (``rollout_len`` steps) so the
    recurrence learns to carry useful state.  Returns (params, final loss).
    With ``mesh``, the episode-minibatch axis is sharded (data parallel).
    """
    E, Tp1, S = x_seqs.shape
    U = u_seqs.shape[-1]
    T = Tp1 - 1
    if T < rollout_len:
        # randint with maxval <= minval is undefined and JAX's clamped
        # gather would then silently train on duplicated terminal states.
        raise ValueError(
            f"episodes too short for rollout_len={rollout_len}: got T={T} "
            f"control steps per episode (need T >= rollout_len; shorten "
            "rollout_len or record longer episodes)"
        )
    key = make_key(seed, "fit_gru_dynamics")
    key, sub = jax.random.split(key)
    params = nets.gru_init(sub, S + U, list(hiddens), S)

    xs = jnp.asarray(x_seqs, jnp.float32)
    us = jnp.asarray(u_seqs, jnp.float32)

    def rollout_loss(p, x0, u_traj, x_target):
        # x0 [B,S]; u_traj [B,L,U]; x_target [B,L,S]
        B = x0.shape[0]
        hs = nets.gru_init_state(hiddens, B)

        def body(carry, inp):
            x, hs = carry
            u, tgt = inp
            out, hs = nets.gru_apply(p, jnp.concatenate([x, u], -1), hs)
            xn = x + out
            return (xn, hs), (xn - tgt) ** 2

        (_, _), errs = jax.lax.scan(
            body, (x0, hs),
            (jnp.swapaxes(u_traj, 0, 1), jnp.swapaxes(x_target, 0, 1)),
        )
        return jnp.mean(errs)

    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    constrain, replicate = _dp_helpers(mesh)
    params, opt_state = replicate(params), replicate(opt_state)
    L = rollout_len

    @jax.jit
    def train_step(p, o, data_x, data_u, e, t0):
        # Window gather in-program: [B] episode ids + start ticks -> batch.
        win = t0[:, None] + jnp.arange(L)[None, :]
        x0 = constrain(data_x[e, t0])
        ut = constrain(data_u[e[:, None], win])
        xt = constrain(data_x[e[:, None], win + 1])
        loss, grads = jax.value_and_grad(rollout_loss)(p, x0, ut, xt)
        updates, o = tx.update(grads, o)
        return optax.apply_updates(p, updates), o, loss

    bs = _dp_batch_size(batch_size, mesh)
    loss = jnp.inf
    for _ in range(epochs):
        key, k1, k2 = jax.random.split(key, 3)
        e = jax.random.randint(k1, (bs,), 0, E)
        t0 = jax.random.randint(k2, (bs,), 0, T - L + 1)
        params, opt_state, loss = train_step(params, opt_state, xs, us, e, t0)
    logger.info(f"GRU dynamics fit: final rollout loss {float(loss):.3e}")
    return params, float(loss)


def collect_mpc_demonstrations(ctrl, env, n_episodes: int, episode_len: int,
                               seed: int = 0):
    """Run an MPC controller in the env, record (state, control) pairs for
    behavior cloning (the reference trains its neural imitator on exactly
    such logs via SI_Toolkit)."""
    states, controls = [], []
    for ep in range(n_episodes):
        s, _ = env.reset(seed=seed + ep)
        if hasattr(ctrl, "controller_reset"):
            ctrl.controller_reset()
        for _ in range(episode_len):
            u = ctrl.step(s[0])
            states.append(np.asarray(s[0]).copy())
            controls.append(np.asarray(u).reshape(-1).copy())
            s, *_ = env.step(u)
    return np.stack(states), np.stack(controls)


def fit_policy(states: np.ndarray, controls: np.ndarray, hiddens=(32, 32),
               epochs: int = 2000, learning_rate: float = 1e-3, seed: int = 0,
               batch_size: int = 1024, mesh: Optional[Mesh] = None,
               ) -> Tuple[Dict, float]:
    """Behavior-clone a policy net u = pi(s). Returns (params, mse).

    With ``mesh``, each Adam step runs data-parallel over the mesh."""
    S, U = states.shape[-1], controls.shape[-1]
    key = make_key(seed, "fit_policy")
    key, sub = jax.random.split(key)
    params = nets.mlp_init(sub, [S] + list(hiddens) + [U])
    xs = jnp.asarray(states, jnp.float32)
    ys = jnp.asarray(controls, jnp.float32)

    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    constrain, replicate = _dp_helpers(mesh)
    params, opt_state = replicate(params), replicate(opt_state)

    def loss_fn(p, xb, yb):
        return jnp.mean((nets.mlp_apply(p, xb) - yb) ** 2)

    @jax.jit
    def train_step(p, o, data, tgt, idx):
        xb = constrain(jnp.take(data, idx, axis=0))
        yb = constrain(jnp.take(tgt, idx, axis=0))
        loss, grads = jax.value_and_grad(loss_fn)(p, xb, yb)
        updates, o = tx.update(grads, o)
        return optax.apply_updates(p, updates), o, loss

    n = xs.shape[0]
    bs = _dp_batch_size(min(batch_size, n), mesh)
    for _ in range(epochs):
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (bs,), 0, n)
        params, opt_state, loss = train_step(params, opt_state, xs, ys, idx)
    final = float(jax.jit(loss_fn)(params, xs, ys))
    logger.info(f"policy fit: full MSE {final:.3e}")
    return params, final


def discounted_cost_to_go(stage_costs: np.ndarray, gamma: float = 0.97,
                          tail_value: float = 0.0) -> np.ndarray:
    """Per-tick discounted cost-to-go of ONE episode's realized stage costs:
    ``G_t = g_t + gamma * G_{t+1}`` — the regression targets for a terminal
    value net (costs/value_terminal.py).  [T] -> [T].

    ``tail_value`` BOOTSTRAPS the truncated tail: ``G_{T} := V(x_T)``
    (pass the current value net's estimate at the episode's final state).
    Without it, late-episode targets are biased low by exactly the
    truncated tail — the dominant error of the one-pass recipe (fitted-
    value-iteration / DAgger rounds shrink it: fit, re-collect, bootstrap
    with the previous fit, refit).  gamma<1 bounds what truncation bias
    remains."""
    g = np.asarray(stage_costs, np.float64).reshape(-1)
    out = np.empty_like(g)
    acc = float(tail_value)
    for t in range(g.shape[0] - 1, -1, -1):
        acc = g[t] + gamma * acc
        out[t] = acc
    return out.astype(np.float32)


def fit_value_mlp(states: np.ndarray, returns: np.ndarray, hiddens=(32, 32),
                  epochs: int = 2000, learning_rate: float = 1e-3,
                  seed: int = 0, batch_size: int = 1024,
                  mesh: Optional[Mesh] = None) -> Tuple[Dict, float]:
    """Fit a state-value net ``V(s) ~= cost-to-go`` for use as a learned
    terminal cost (costs/value_terminal.py).  Returns (params, mse).

    ``states`` [N,S], ``returns`` [N] (e.g. from ``discounted_cost_to_go``
    over recorded episodes).  With ``mesh``, each Adam step runs
    data-parallel over the mesh like every other fitter here."""
    S = states.shape[-1]
    key = make_key(seed, "fit_value_mlp")
    key, sub = jax.random.split(key)
    params = nets.mlp_init(sub, [S] + list(hiddens) + [1])
    # Standardize inputs and targets for the fit, then FOLD the affine
    # normalizations into the first/last layers so the returned params are
    # a plain mlp_apply net in raw units (what the cost wrapper evaluates).
    x_raw = np.asarray(states, np.float32)
    y_raw = np.asarray(returns, np.float32).reshape(-1, 1)
    x_mu, x_sd = x_raw.mean(0), x_raw.std(0) + 1e-6
    y_mu, y_sd = float(y_raw.mean()), float(y_raw.std()) + 1e-6
    xs = jnp.asarray((x_raw - x_mu) / x_sd)
    ys = jnp.asarray((y_raw - y_mu) / y_sd)

    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    constrain, replicate = _dp_helpers(mesh)
    params, opt_state = replicate(params), replicate(opt_state)

    def loss_fn(p, xb, yb):
        return jnp.mean((nets.mlp_apply(p, xb) - yb) ** 2)

    @jax.jit
    def train_step(p, o, data, tgt, idx):
        xb = constrain(jnp.take(data, idx, axis=0))
        yb = constrain(jnp.take(tgt, idx, axis=0))
        loss, grads = jax.value_and_grad(loss_fn)(p, xb, yb)
        updates, o = tx.update(grads, o)
        return optax.apply_updates(p, updates), o, loss

    n = xs.shape[0]
    bs = _dp_batch_size(min(batch_size, n), mesh)
    for _ in range(epochs):
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (bs,), 0, n)
        params, opt_state, _ = train_step(params, opt_state, xs, ys, idx)
    final = float(jax.jit(loss_fn)(params, xs, ys)) * y_sd * y_sd
    logger.info(f"value fit: full MSE {final:.3e} (raw units)")
    # Fold x-standardization into layer 0 and y-de-standardization into the
    # last layer: net(raw x) == y_mu + y_sd * trained((x - x_mu)/x_sd).
    # Jitted: eager jnp ops on replicated GLOBAL params are illegal on a
    # multi-process mesh (same reason the loss eval above is jitted).
    n_layers = sum(1 for k in params if k.startswith("w"))
    last = n_layers - 1
    mu = jnp.asarray(x_mu); sd = jnp.asarray(x_sd)

    @jax.jit
    def fold(p):
        p = dict(p)
        w0, b0 = p["w0"], p["b0"]
        p["w0"] = w0 / sd[:, None]
        p["b0"] = b0 - (mu / sd) @ w0
        p[f"w{last}"] = p[f"w{last}"] * y_sd
        p[f"b{last}"] = p[f"b{last}"] * y_sd + y_mu
        return p

    return fold(params), final
