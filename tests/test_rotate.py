import numpy as np
import jax
import jax.numpy as jnp

from beyond_dof_tpu.ops.rotate import (rotate_volume, rotation_lookup,
                                       apply_rotation_lookup)


def _vol(n=16):
    rng = np.random.RandomState(0)
    return rng.rand(n, n, n).astype(np.float32)


def _smooth_vol(n=24):
    """Band-limited volume: interpolation-based rotations only round-trip
    for smooth fields."""
    from scipy.ndimage import gaussian_filter
    rng = np.random.RandomState(0)
    return gaussian_filter(rng.rand(n, n, n), 2.0).astype(np.float32)


def test_rotate_zero_is_identity():
    v = _vol()
    out = np.asarray(rotate_volume(jnp.asarray(v), 0.0))
    assert np.abs(out - v).max() < 1e-5


def test_rotate_round_trip():
    v = _smooth_vol(24)
    th = 0.7
    out = rotate_volume(rotate_volume(jnp.asarray(v), th), -th)
    # interior region should round-trip (edges lose mass to cval)
    c = slice(6, 18)
    assert np.abs(np.asarray(out)[:, c, c] - v[:, c, c]).mean() < 0.02


def test_rotate_90_matches_transpose():
    v = _vol(17)  # odd size: exact center pixel
    out = np.asarray(rotate_volume(jnp.asarray(v), np.pi / 2))
    # 90-degree rotation about the (X,Z) center maps axes exactly
    ref = np.rot90(v, k=1, axes=(1, 2))
    # sign/direction convention: accept either orientation
    err1 = np.abs(out - ref)[:, 2:-2, 2:-2].mean()
    ref2 = np.rot90(v, k=-1, axes=(1, 2))
    err2 = np.abs(out - ref2)[:, 2:-2, 2:-2].mean()
    assert min(err1, err2) < 1e-3


def test_rotate_is_differentiable():
    v = jnp.asarray(_vol())

    def f(vol):
        return jnp.sum(rotate_volume(vol, 0.3) ** 2)

    g = jax.grad(f)(v)
    assert float(jnp.linalg.norm(g)) > 0


def test_rotation_lookup_identity_angle():
    n = 8
    inds = rotation_lookup((n, n, n), 5, theta_st=0, theta_end=2 * np.pi)
    v = _vol(n)
    out = np.asarray(apply_rotation_lookup(jnp.asarray(v), jnp.asarray(inds[0])))
    assert np.abs(out - v).max() < 1e-6


def test_rotation_lookup_matches_nearest_rotation():
    n = 24
    n_theta = 8
    inds = rotation_lookup((n, n, n), n_theta)
    thetas = np.linspace(0, 2 * np.pi, n_theta)
    v = _smooth_vol(n)
    for i in [1, 3]:
        out = np.asarray(apply_rotation_lookup(jnp.asarray(v), jnp.asarray(inds[i])))
        ref = np.asarray(rotate_volume(jnp.asarray(v), thetas[i], order=1))
        # NN-vs-bilinear: loose agreement in the interior
        c = slice(6, 18)
        assert np.abs(out[:, c, c] - ref[:, c, c]).mean() < 0.05


def test_rotate_boundary_modes():
    """rotate_image_tensor boundary modes (ref util.py:829-910):
    constant fill vs edge repeat."""
    v = np.ones((4, 8, 8), np.float32)
    out_black = np.asarray(rotate_volume(jnp.asarray(v), 0.6, cval=0.0))
    out_ones = np.asarray(rotate_volume(jnp.asarray(v), 0.6, cval=1.0))
    out_rep = np.asarray(rotate_volume(jnp.asarray(v), 0.6, mode="repeat"))
    assert out_black.min() == 0.0          # corners filled with 0
    assert np.allclose(out_ones, 1.0)      # constant volume + ones fill
    assert np.allclose(out_rep, 1.0)       # edge clamp of a constant volume


def test_rotate_zfirst_matches_rotate():
    """rotate_volume_zfirst == transpose(rotate_volume) for bilinear and
    nearest, including gradients."""
    import jax
    from beyond_dof_tpu.ops.rotate import rotate_volume_zfirst
    v = jnp.asarray(_vol(12))
    for order in (0, 1):
        a = np.asarray(rotate_volume_zfirst(v, 0.37, order=order))
        b = np.moveaxis(np.asarray(rotate_volume(v, 0.37, order=order)), -1, 0)
        assert np.abs(a - b).max() < 1e-6

    g1 = jax.grad(lambda x: jnp.sum(rotate_volume_zfirst(x, 0.37) ** 2))(v)
    g2 = jax.grad(lambda x: jnp.sum(rotate_volume(x, 0.37) ** 2))(v)
    assert np.abs(np.asarray(g1) - np.asarray(g2)).max() < 1e-5


def test_rotate_tfgrad_close_to_exact_adjoint():
    """The TF-parity rotation gradient (cotangent rotated by -theta) equals
    the exact scatter-add adjoint at theta=0 and stays within interpolation
    error at a generic angle."""
    import jax
    from beyond_dof_tpu.ops.rotate import (rotate_volume_zfirst,
                                           rotate_volume_zfirst_tfgrad)
    v = jnp.asarray(_vol(16))
    rng = np.random.RandomState(0)
    cot = jnp.asarray(rng.rand(16, 16, 16).astype(np.float32))

    def loss(fn, th):
        return lambda x: jnp.sum(fn(x, th) * cot)

    for th, tol in ((0.0, 1e-6), (0.37, 0.35)):
        g_tf = np.asarray(jax.grad(loss(rotate_volume_zfirst_tfgrad,
                                        jnp.float32(th)))(v))
        g_ex = np.asarray(jax.grad(loss(rotate_volume_zfirst,
                                        jnp.float32(th)))(v))
        scale = np.abs(g_ex).max() + 1e-30
        assert np.abs(g_tf - g_ex).max() / scale < tol


# ---------------------------------------------------------------------------
# 3-shear banded-matmul rotation (the TPU fast path)
# ---------------------------------------------------------------------------

def test_shear3_zero_is_identity():
    from beyond_dof_tpu.ops.rotate import rotate_volume_shear3
    v = _vol(16)
    out = np.asarray(rotate_volume_shear3(jnp.asarray(v), 0.0))
    assert np.abs(out - v).max() < 1e-6


def test_shear3_quadrants_exact():
    """At multiples of 90 degrees the shear path reduces to pure
    flips/transposes and must match the bilinear rotation exactly."""
    from beyond_dof_tpu.ops.rotate import rotate_volume_shear3
    v = jnp.asarray(_vol(17))
    for th in (np.pi / 2, np.pi, 3 * np.pi / 2, 2 * np.pi, -np.pi / 2):
        a = np.asarray(rotate_volume_shear3(v, th))
        b = np.asarray(rotate_volume(v, th))
        assert np.abs(a - b).max() < 1e-5, th


def test_shear3_close_to_bilinear_generic_angles():
    """Generic angles: per-shear-linear vs direct-bilinear interpolation
    agree on smooth content away from the fill boundary."""
    from beyond_dof_tpu.ops.rotate import rotate_volume_shear3
    v = _smooth_vol(32)
    vj = jnp.asarray(v)
    c = slice(8, 24)
    for th in (0.3, 0.7, 2.1, -0.6, 4.0, 5.9):
        a = np.asarray(rotate_volume_shear3(vj, th))[:, c, c]
        b = np.asarray(rotate_volume(vj, th))[:, c, c]
        scale = np.abs(b).max()
        assert np.abs(a - b).max() / scale < 0.03, th


def test_shear3_zfirst_matches_plain():
    from beyond_dof_tpu.ops.rotate import rotate_volume_shear3
    v = jnp.asarray(_vol(12))
    a = np.asarray(rotate_volume_shear3(v, 0.37, zfirst=True))
    b = np.moveaxis(np.asarray(rotate_volume_shear3(v, 0.37)), -1, 0)
    assert np.abs(a - b).max() < 1e-6


def test_shear3_pair_matches_singles():
    from beyond_dof_tpu.ops.rotate import (rotate_pair_zfirst_shear3,
                                           rotate_volume_shear3)
    d = jnp.asarray(_vol(12))
    b = jnp.asarray(_vol(12) * 0.5 + 0.1)
    dr, br = rotate_pair_zfirst_shear3(d, b, 0.9)
    assert np.abs(np.asarray(dr)
                  - np.asarray(rotate_volume_shear3(d, 0.9, zfirst=True))).max() < 1e-6
    assert np.abs(np.asarray(br)
                  - np.asarray(rotate_volume_shear3(b, 0.9, zfirst=True))).max() < 1e-6


def test_shear3_adjoint_property():
    """<R v, w> == <v, grad_v <R v, w>> : the VJP is the exact adjoint."""
    from beyond_dof_tpu.ops.rotate import rotate_volume_shear3
    rng = np.random.RandomState(3)
    v = jnp.asarray(rng.rand(10, 12, 12).astype(np.float32))
    w = jnp.asarray(rng.rand(10, 12, 12).astype(np.float32))
    th = 0.53
    fwd = jnp.sum(rotate_volume_shear3(v, th) * w)
    g = jax.grad(lambda x: jnp.sum(rotate_volume_shear3(x, th) * w))(v)
    assert abs(float(fwd) - float(jnp.sum(v * g))) < 1e-3


def test_shear3_under_jit_and_lax_map():
    """The quadrant lax.switch must work inside jit + lax.map over a traced
    angle batch (the engine's usage)."""
    from beyond_dof_tpu.ops.rotate import rotate_pair_zfirst_shear3
    d = jnp.asarray(_smooth_vol(16))
    b = d * 0.3
    thetas = jnp.asarray([0.2, 1.7, 3.3, 5.1], jnp.float32)

    @jax.jit
    def run(dd, bb, ths):
        return jax.lax.map(lambda t: rotate_pair_zfirst_shear3(dd, bb, t), ths)

    dr, br = run(d, b, thetas)
    assert dr.shape == (4, 16, 16, 16)
    for i, th in enumerate(np.asarray(thetas)):
        ref = np.asarray(rotate_pair_zfirst_shear3(d, b, float(th))[0])
        assert np.abs(np.asarray(dr)[i] - ref).max() < 1e-5


def test_split_forward_model_shear_rotation_close():
    """rotate_and_project_batch_split(rotation='shear') stays close to the
    bilinear forward on a smooth object."""
    from beyond_dof_tpu.models.fullfield import rotate_and_project_batch_split
    n = 16
    v = _smooth_vol(n) * 1e-7
    d = jnp.asarray(v)
    b = jnp.asarray(v * 0.1)
    th = jnp.asarray([0.0, 0.8, 2.5], jnp.float32)
    pr = jnp.ones((n, n), jnp.float32)
    pi = jnp.zeros((n, n), jnp.float32)
    re1, im1 = rotate_and_project_batch_split(
        d, b, th, pr, pi, 5000.0, 1e-7, rotation="shear")
    re2, im2 = rotate_and_project_batch_split(
        d, b, th, pr, pi, 5000.0, 1e-7, rotation="bilinear")
    assert np.abs(np.asarray(re1) - np.asarray(re2)).max() < 1e-4
    assert np.abs(np.asarray(im1) - np.asarray(im2)).max() < 1e-4


def test_set_shear_precision_roundtrip():
    """set_shear_precision accepts names, Precision values, and per-operand
    (data, weights) tuples, and restores cleanly."""
    import jax
    from beyond_dof_tpu.ops import rotate as R
    from beyond_dof_tpu.ops.rotate import rotate_volume_shear3

    v = jnp.asarray(_vol(12))
    ref = np.asarray(rotate_volume_shear3(v, 0.4))
    prev = R.set_shear_precision(("high", "default"))
    assert prev == "auto"   # default: cheap on TPU, HIGHEST elsewhere
    assert R._SHEAR_PRECISION == (jax.lax.Precision.HIGH,
                                  jax.lax.Precision.DEFAULT)
    # CPU resolves 'auto' to HIGHEST
    R.set_shear_precision("auto")
    assert R._resolve_shear_precision() == jax.lax.Precision.HIGHEST
    R.set_shear_precision(("high", "default"))
    try:
        # CPU executes every precision in f32: results must be identical,
        # proving the tuple plumbs through all three einsums
        out = np.asarray(rotate_volume_shear3(v, 0.4))
        assert np.abs(out - ref).max() < 1e-6
    finally:
        R.set_shear_precision(prev)
    assert R._SHEAR_PRECISION == "auto"
