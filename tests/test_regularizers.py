import numpy as np
import jax.numpy as jnp

from beyond_dof_tpu.ops.regularizers import (l1_norm, total_variation_2d,
                                             total_variation_3d,
                                             total_variation_3d_wrap,
                                             regularization_term)


def test_l1_norm():
    x = np.array([[1., -2.], [3., -4.]])
    assert float(l1_norm(jnp.asarray(x))) == 10.0


def test_tv2d_known_value():
    x = np.array([[0., 1.], [2., 3.]])
    # row diffs: |2-0| + |3-1| = 4 ; col diffs: |1-0| + |3-2| = 2
    assert float(total_variation_2d(jnp.asarray(x))) == 6.0


def test_tv3d_counts_each_axis_once():
    rng = np.random.RandomState(0)
    x = rng.rand(6, 6, 6).astype(np.float32)
    tv = float(total_variation_3d(jnp.asarray(x)))
    # manual anisotropic 3-axis TV
    manual = (np.abs(np.diff(x, axis=0)).sum()
              + np.abs(np.diff(x, axis=1)).sum()
              + np.abs(np.diff(x, axis=2)).sum())
    assert abs(tv - manual) / manual < 1e-5


def test_tv3d_wrap_matches_roll_formula():
    rng = np.random.RandomState(1)
    x = rng.rand(5, 5, 5).astype(np.float32)
    tv = float(total_variation_3d_wrap(jnp.asarray(x)))
    manual = sum(np.abs(np.roll(x, 1, axis=a) - x).sum() for a in range(3))
    assert abs(tv - manual) / manual < 1e-5


def test_regularization_term_modes():
    x = jnp.ones((4, 4, 4))
    y = jnp.ones((4, 4, 4)) * 2
    # alpha_d mode, gamma 0: alpha_d*|x| + alpha_b*|y|
    r = float(regularization_term(x, y, 1e-3, 1e-4, 0))
    assert abs(r - (1e-3 * 64 + 1e-4 * 128)) < 1e-6
    # legacy alpha mode (applies alpha to delta twice, faithful to reference)
    r2 = float(regularization_term(x, y, None, None, 0.0, alpha=1e-3))
    assert abs(r2 - 2e-3 * 64) < 1e-6
