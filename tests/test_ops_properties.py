"""Property tests for the shared numerical ops."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from control_toolkit_tpu.ops.common import (
    adam_init,
    adam_update,
    clip_by_norm,
    elite_indices,
    shift_adam_moments,
)


def test_adam_matches_optax():
    """Our explicit-state Adam must track optax.adam step for step."""
    lr, b1, b2, eps = 0.05, 0.9, 0.999, 1e-8
    shape = (4, 6, 2)
    key = jax.random.PRNGKey(0)
    params = jax.random.normal(key, shape)

    tx = optax.adam(lr, b1=b1, b2=b2, eps=eps)
    opt_state = tx.init(params)
    ours = adam_init(shape)

    p_optax = params
    p_ours = params
    for i in range(5):
        grad = jax.random.normal(jax.random.fold_in(key, i), shape)
        updates, opt_state = tx.update(grad, opt_state)
        p_optax = optax.apply_updates(p_optax, updates)
        ours, delta = adam_update(ours, grad, lr, b1, b2, eps)
        p_ours = p_ours - delta
        np.testing.assert_allclose(
            np.asarray(p_ours), np.asarray(p_optax), rtol=2e-5, atol=1e-6
        )


def test_clip_by_norm_matches_tf_semantics():
    rng = np.random.default_rng(0)
    t = rng.normal(size=(8, 5, 2)).astype(np.float32) * 10
    clipped = np.asarray(clip_by_norm(jnp.asarray(t), 3.0, axes=(1, 2)))
    norms = np.sqrt((clipped**2).sum(axis=(1, 2)))
    assert np.all(norms <= 3.0 + 1e-5)
    # small slices pass through unchanged
    small = 0.01 * t
    np.testing.assert_allclose(
        np.asarray(clip_by_norm(jnp.asarray(small), 3.0, axes=(1, 2))), small,
        rtol=1e-6,
    )
    # direction preserved
    ratio = clipped / np.where(np.abs(t) < 1e-9, 1, t)
    for k in range(8):
        vals = ratio[k][np.abs(t[k]) > 1e-6]
        np.testing.assert_allclose(vals, vals.flat[0], rtol=1e-5)


def test_elite_indices_order_and_values():
    costs = jnp.asarray([5.0, 1.0, 3.0, 0.5, 4.0])
    idx = np.asarray(elite_indices(costs, 3))
    np.testing.assert_array_equal(idx, [3, 1, 2])


def test_shift_adam_moments():
    st = adam_init((2, 4, 1))
    st = st._replace(m=jnp.arange(8.0).reshape(2, 4, 1),
                     v=jnp.arange(8.0).reshape(2, 4, 1) + 100)
    sh = shift_adam_moments(st)
    np.testing.assert_allclose(np.asarray(sh.m)[:, :-1, 0],
                               np.asarray(st.m)[:, 1:, 0])
    assert np.all(np.asarray(sh.m)[:, -1, :] == 0)
    assert np.all(np.asarray(sh.v)[:, -1, :] == 0)
