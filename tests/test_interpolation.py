"""Interpolator semantics tests vs the reference formulas
(/root/reference/others/Interpolator.py:53-106)."""
import numpy as np
import jax.numpy as jnp
import pytest

from control_toolkit_tpu.ops.interpolation import (
    Interpolator,
    interpolation_matrix,
    num_inducing_points,
)


@pytest.mark.parametrize("horizon,period,expected", [
    (35, 10, 5),   # ceil(34/10)+1 = 5
    (40, 10, 5),   # ceil(39/10)+1 = 5
    (43, 10, 6),
    (50, 1, 50),
    (10, 3, 4),
])
def test_num_inducing_points(horizon, period, expected):
    assert num_inducing_points(horizon, period) == expected


def test_matrix_rows_sum_to_one():
    mat = interpolation_matrix(43, 10)
    np.testing.assert_allclose(mat.sum(axis=0), np.ones(43), atol=1e-6)


def test_linear_interpolation_matches_numpy_interp():
    horizon, period = 43, 10
    interp = Interpolator.build(horizon, period)
    P = interp.number_of_interpolation_inducing_points
    rng = np.random.default_rng(0)
    y = rng.normal(size=(7, P, 2)).astype(np.float32)

    out = np.asarray(interp.interpolate(jnp.asarray(y)))
    assert out.shape == (7, horizon, 2)

    xs = np.arange(horizon, dtype=np.float64)
    xp = np.arange(P, dtype=np.float64) * period
    for k in range(7):
        for u in range(2):
            expected = np.interp(xs, xp, y[k, :, u].astype(np.float64))
            np.testing.assert_allclose(out[k, :, u], expected, atol=1e-5)


def test_period_one_is_identity():
    interp = Interpolator.build(20, 1)
    y = jnp.ones((3, 20, 1))
    assert interp.interpolate(y) is y
