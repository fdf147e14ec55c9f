import numpy as np
import jax
import jax.numpy as jnp
import pytest

from beyond_dof_tpu.ops.tiled import (truncated_kernel, multislice_propagate_cnn,
                                      multislice_propagate_tiled, conv_matrices,
                                      _conv_step)
from beyond_dof_tpu.models.phantom import cone_foam_phantom
from beyond_dof_tpu.parallel.mesh import make_mesh
from reference_impl import np_truncated_kernel, np_multislice_cnn, np_multislice


@pytest.fixture(scope="module")
def phantom32():
    gd, gb = cone_foam_phantom(32, seed=1)
    return gd[None], gb[None], np.ones((32, 32), dtype=np.complex64)


def test_kernel_separability_exact():
    """K2d = scale * outer(ky, kx) reproduces the reference's 2D crop kernel."""
    voxel_nm = 1.0
    lm = 1240. / 5000
    ky, kx, s = truncated_kernel(voxel_nm, lm, np.array([voxel_nm] * 3),
                                 (32, 32), 9)
    K2 = s * np.outer(ky, kx)
    Kref = np_truncated_kernel(5000, 1e-7, (32, 32, 32), 9)
    assert np.abs(K2 - Kref).max() < 1e-8


def test_conv_step_matches_scipy_convolution():
    from scipy.signal import convolve2d
    rng = np.random.RandomState(0)
    w = (rng.rand(2, 16, 16) + 1j * rng.rand(2, 16, 16)).astype(np.complex64)
    ky, kx, s = truncated_kernel(1.0, 0.248, np.array([1., 1., 1.]), (16, 16), 5)
    K2 = s * np.outer(ky, kx)
    Gy, Gx = conv_matrices(ky, kx, s, (16, 16))
    pad = 2
    wp = np.pad(w, ((0, 0), (pad, pad), (pad, pad)), constant_values=0.7)
    out = np.asarray(_conv_step(jnp.asarray(wp), jnp.asarray(Gy), jnp.asarray(Gx)))
    ref = np.stack([convolve2d(wp[b], K2, mode="valid") for b in range(2)])
    assert np.abs(out - ref).max() < 1e-5


def test_serial_cnn_matches_numpy_reference(phantom32):
    gd, gb, probe = phantom32
    ref = np_multislice_cnn(gd, gb, probe, 5000, 1e-7, kernel_size=9)
    out = np.asarray(multislice_propagate_cnn(gd, gb, probe, 5000, 1e-7,
                                              kernel_size=9))
    assert np.abs(out - ref).max() < 1e-5


def test_cnn_amplitude_converges_to_fft_propagator(phantom32):
    """Kernel-size sweep: conv propagator -> FFT propagator as k grows
    (ref propagation.py:161-169; amplitude parity <= ~1e-6 per BASELINE.md).
    The global piston phase differs by construction (the renormalization
    rescales the corner pixel, ref propagation.py:109-110)."""
    gd, gb, probe = phantom32
    fft_ref = np.abs(np_multislice(gd, gb, probe, 5000, 1e-7,
                                   propagate_last=True))
    errs = []
    for ks in [5, 17, 31]:
        o = np.abs(np.asarray(multislice_propagate_cnn(
            gd, gb, probe, 5000, 1e-7, kernel_size=ks)))
        errs.append(np.abs(o - fft_ref).mean())
    assert errs[-1] < 2e-6
    assert errs[-1] < errs[0]  # monotone improvement with kernel size


def test_tiled_equals_serial_2x2(phantom32):
    """Halo-exchange sharded propagator == serial conv propagator
    (the 'tiled == global' validation of SURVEY §7.6)."""
    gd, gb, probe = phantom32
    mesh = make_mesh(n_data=1, tile_yx=(2, 2))
    serial = np.asarray(multislice_propagate_cnn(gd, gb, probe, 5000, 1e-7,
                                                 kernel_size=9))
    tiled = np.asarray(multislice_propagate_tiled(gd, gb, probe, 5000, 1e-7,
                                                  mesh, kernel_size=9))
    assert np.abs(tiled - serial).max() < 1e-6


def test_tiled_equals_serial_4x2_with_free_prop(phantom32):
    gd, gb, probe = phantom32
    mesh = make_mesh(n_data=1, tile_yx=(4, 2))
    serial = np.asarray(multislice_propagate_cnn(
        gd, gb, probe, 5000, 1e-7, kernel_size=5, free_prop_cm=1e-4))
    tiled = np.asarray(multislice_propagate_tiled(
        gd, gb, probe, 5000, 1e-7, mesh, kernel_size=5, free_prop_cm=1e-4))
    assert np.abs(tiled - serial).max() < 1e-6


def test_tiled_gradients_match_serial(phantom32):
    """AD through the halo exchange: grads of tiled == grads of serial."""
    gd, gb, probe = phantom32

    def loss_serial(d):
        o = multislice_propagate_cnn(d, gb, probe, 5000, 1e-7, kernel_size=5)
        return jnp.sum(jnp.abs(o) ** 2)

    mesh = make_mesh(n_data=1, tile_yx=(2, 2))

    def loss_tiled(d):
        o = multislice_propagate_tiled(d, gb, probe, 5000, 1e-7, mesh,
                                       kernel_size=5)
        return jnp.sum(jnp.abs(o) ** 2)

    g1 = np.asarray(jax.grad(loss_serial)(jnp.asarray(gd)))
    g2 = np.asarray(jax.grad(loss_tiled)(jnp.asarray(gd)))
    scale = np.abs(g1).max()
    assert np.abs(g1 - g2).max() / scale < 1e-4


def test_cnn_free_prop_inf(phantom32):
    gd, gb, probe = phantom32
    ref = np_multislice_cnn(gd, gb, probe, 5000, 1e-7, kernel_size=9,
                            free_prop_cm="inf")
    out = np.asarray(multislice_propagate_cnn(gd, gb, probe, 5000, 1e-7,
                                              kernel_size=9, free_prop_cm="inf"))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5


def test_split_cnn_matches_complex_cnn(phantom32):
    """Split-complex conv propagator == complex conv propagator."""
    from beyond_dof_tpu.ops.tiled import multislice_propagate_cnn_split
    gd, gb, probe = phantom32
    pr = np.real(probe).astype(np.float32)
    pi_ = np.imag(probe).astype(np.float32)
    for fp in [None, 1e-4, "inf"]:
        ref = np.asarray(multislice_propagate_cnn(gd, gb, probe, 5000, 1e-7,
                                                  kernel_size=9, free_prop_cm=fp))
        re, im = multislice_propagate_cnn_split(gd, gb, pr, pi_, 5000, 1e-7,
                                                kernel_size=9, free_prop_cm=fp)
        out = np.asarray(re) + 1j * np.asarray(im)
        assert np.abs(out - ref).max() / max(np.abs(ref).max(), 1) < 2e-5


def test_split_tiled_matches_split_serial(phantom32):
    """Split-complex halo-exchange propagator == split serial (2x2 mesh)."""
    from beyond_dof_tpu.ops.tiled import (multislice_propagate_cnn_split,
                                          multislice_propagate_tiled_split)
    gd, gb, probe = phantom32
    pr = np.real(probe).astype(np.float32)
    pi_ = np.imag(probe).astype(np.float32)
    mesh = make_mesh(n_data=1, tile_yx=(2, 2))
    re1, im1 = multislice_propagate_cnn_split(gd, gb, pr, pi_, 5000, 1e-7,
                                              kernel_size=9)
    re2, im2 = multislice_propagate_tiled_split(gd, gb, pr, pi_, 5000, 1e-7,
                                                mesh, kernel_size=9)
    # per-tile vs whole-plane matmuls group the summations differently;
    # agreement is to f32 reduction-order tolerance
    assert np.abs(np.asarray(re1) - np.asarray(re2)).max() < 5e-6
    assert np.abs(np.asarray(im1) - np.asarray(im2)).max() < 5e-6
