import numpy as np
import jax.numpy as jnp

from beyond_dof_tpu.ops.fresnel import (get_kernel, get_kernel_ir, ifftshift2,
                                        fresnel_propagate, prop_tf, prop_ir,
                                        select_algorithm, apply_kernel)
from reference_impl import np_get_kernel


def test_get_kernel_matches_reference_formula():
    h = get_kernel(1.0, 0.25, [1.0, 1.0, 1.0], (32, 32))
    ref = np_get_kernel(1.0, 0.25, [1.0, 1.0, 1.0], (32, 32))
    assert np.abs(h - ref).max() < 1e-6
    # unit modulus (pure phase kernel)
    assert np.abs(np.abs(h) - 1).max() < 1e-6


def test_kernel_inverse_distance_is_conjugate_transfer():
    h_fwd = get_kernel(2.0, 0.25, [1.0, 1.0, 1.0], (16, 16))
    h_bwd = get_kernel(-2.0, 0.25, [1.0, 1.0, 1.0], (16, 16))
    assert np.abs(h_fwd * h_bwd - 1).max() < 1e-5


def test_tf_propagation_conserves_energy():
    rng = np.random.RandomState(0)
    w = (rng.rand(32, 32) + 1j * rng.rand(32, 32)).astype(np.complex64)
    out = np.asarray(fresnel_propagate(jnp.asarray(w), 5000, 1e-7, 1e-7))
    # |H| = 1 -> Parseval: energy conserved
    assert np.abs(np.sum(np.abs(out) ** 2) - np.sum(np.abs(w) ** 2)) / np.sum(np.abs(w) ** 2) < 1e-4


def test_apply_kernel_equals_shifted_form():
    rng = np.random.RandomState(1)
    w = (rng.rand(1, 16, 16) + 1j * rng.rand(1, 16, 16)).astype(np.complex64)
    h = np_get_kernel(1.0, 0.25, [1.0, 1.0, 1.0], (16, 16))
    ref = np.fft.ifft2(np.fft.ifftshift(
        np.fft.fftshift(np.fft.fft2(w), axes=[1, 2]) * h, axes=[1, 2]))
    out = np.asarray(apply_kernel(jnp.asarray(w), h))
    assert np.abs(out - ref).max() < 1e-5


def test_tf_ir_regime_agreement_square_beam():
    """TF and IR propagators agree in the critically-sampled regime
    (the sqr_beam demo, ref simulation/sqr_beam.py:26-30)."""
    M = 128
    L = 0.5e-3
    step = L / M
    wavel = 0.5e-6
    z = step * M * step / wavel  # critical distance: z = L*dx/lambda
    x = np.linspace(-L / 2, L / 2 - step, M)
    X, Y = np.meshgrid(x, x)
    u1 = ((np.abs(X) < 0.05e-3) & (np.abs(Y) < 0.05e-3)).astype(np.complex64)
    u_tf = np.asarray(prop_tf(jnp.asarray(u1), step, L, wavel, z))
    u_ir = np.asarray(prop_ir(jnp.asarray(u1), step, L, wavel, z))
    # compare central magnitudes
    c = slice(M // 4, 3 * M // 4)
    num = np.abs(np.abs(u_tf[c, c]) - np.abs(u_ir[c, c])).mean()
    den = np.abs(u_tf[c, c]).mean()
    assert num / den < 0.05


def test_select_algorithm_regimes():
    # large voxels / short distance -> TF; tiny voxels / long distance -> IR
    assert select_algorithm(0.25, 1.0, [1., 1., 1.], [64., 64., 64.]) == "TF"
    assert select_algorithm(0.25, 1e6, [1., 1., 1.], [64., 64., 64.]) == "IR"


def test_ir_kernel_shape_and_finiteness():
    h = get_kernel_ir(1e4, 0.25, [1.0, 1.0], (64, 64))
    assert h.shape == (64, 64)
    assert np.isfinite(h).all()
    assert h.dtype == np.complex64
