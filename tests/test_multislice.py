import numpy as np
import jax
import jax.numpy as jnp

from beyond_dof_tpu.ops.multislice import (multislice_propagate_batch,
                                           multislice_propagate_fd)
from beyond_dof_tpu.models.phantom import adhesin_phantom, cone_foam_phantom
from reference_impl import np_multislice


def _phantom(n=24):
    gd, gb = adhesin_phantom(n)
    return gd[None], gb[None]


def test_multislice_matches_numpy_reference():
    gd, gb = _phantom()
    probe = np.ones(gd.shape[1:3], dtype=np.complex64)
    ref = np_multislice(gd, gb, probe, 800, 0.67e-7)
    out = np.asarray(multislice_propagate_batch(gd, gb, probe, 800, 0.67e-7,
                                                propagate_last=False))
    assert np.abs(out - ref).max() < 2e-6


def test_multislice_propagate_last_convention():
    gd, gb = _phantom()
    probe = np.ones(gd.shape[1:3], dtype=np.complex64)
    ref = np_multislice(gd, gb, probe, 800, 0.67e-7, propagate_last=True)
    out = np.asarray(multislice_propagate_batch(gd, gb, probe, 800, 0.67e-7,
                                                propagate_last=True))
    assert np.abs(out - ref).max() < 2e-6


def test_multislice_free_prop_finite_and_inf():
    gd, gb = _phantom()
    probe = np.ones(gd.shape[1:3], dtype=np.complex64)
    for fp in [1e-4, "inf"]:
        ref = np_multislice(gd, gb, probe, 800, 0.67e-7, free_prop_cm=fp)
        out = np.asarray(multislice_propagate_batch(
            gd, gb, probe, 800, 0.67e-7, propagate_last=False, free_prop_cm=fp))
        scale = max(np.abs(ref).max(), 1.0)
        assert np.abs(out - ref).max() / scale < 1e-5


def test_multislice_energy_conservation_phase_object():
    gd, gb = _phantom()
    gb = np.zeros_like(gb)  # pure phase: propagation is unitary
    probe = np.ones(gd.shape[1:3], dtype=np.complex64)
    out = np.asarray(multislice_propagate_batch(gd, gb, probe, 800, 0.67e-7))
    e_in = np.prod(gd.shape[1:3])
    e_out = np.sum(np.abs(out) ** 2)
    assert abs(e_out - e_in) / e_in < 1e-4


def test_multislice_batched_consistency():
    gd, gb = _phantom()
    gd2 = np.concatenate([gd, gd * 0.5])
    gb2 = np.concatenate([gb, gb * 0.5])
    probe = np.ones(gd.shape[1:3], dtype=np.complex64)
    out = np.asarray(multislice_propagate_batch(gd2, gb2, probe, 800, 0.67e-7))
    out_single = np.asarray(multislice_propagate_batch(gd, gb, probe, 800, 0.67e-7))
    assert np.abs(out[0] - out_single[0]).max() < 1e-6


def test_multislice_gradients_with_and_without_remat_agree():
    gd, gb = _phantom(16)
    probe = np.ones(gd.shape[1:3], dtype=np.complex64)

    def make_loss(remat):
        def loss(d):
            out = multislice_propagate_batch(d, gb, probe, 800, 0.67e-7,
                                             remat=remat)
            return jnp.sum(jnp.abs(out) ** 2)
        return loss

    g1 = jax.grad(make_loss(True))(jnp.asarray(gd))
    g2 = jax.grad(make_loss(False))(jnp.asarray(gd))
    assert np.allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-8)
    assert float(jnp.linalg.norm(g1)) > 0


def test_fd_bpm_close_to_fresnel_for_weak_object():
    """The finite-difference BPM should roughly agree with Fresnel multislice
    for a weak phase object (both solve the same paraxial equation)."""
    gd, gb = cone_foam_phantom(16, delta=1e-8, beta=1e-10)
    gd, gb = gd[None], gb[None]
    probe = np.ones(gd.shape[1:3], dtype=np.complex64)
    out_fr = np.asarray(multislice_propagate_batch(gd, gb, probe, 5000, 1e-7))
    out_fd = np.asarray(multislice_propagate_fd(gd, gb, probe, 5000, 1e-7))
    assert np.abs(out_fd).max() < 10  # stable
    # magnitudes stay near unity for both
    assert np.abs(np.abs(out_fr).mean() - 1) < 0.1
    assert np.abs(np.abs(out_fd).mean() - 1) < 0.1


def test_projection_multislice_runs():
    """Cone-beam 'projection' type (paraxial + magnification resample,
    ref util.py:473-475)."""
    from beyond_dof_tpu.ops.multislice import multislice_propagate_projection
    gd, gb = _phantom(16)
    probe = np.ones(gd.shape[1:3], dtype=np.complex64)
    out = np.asarray(multislice_propagate_projection(
        gd, gb, probe, 5000, 1e-7, s_r_cm=1e-4))
    assert out.shape == (1, 16, 16)
    assert np.isfinite(out).all()
    assert abs(np.abs(out).mean() - 1) < 0.3


def test_fd_split_matches_complex():
    """Split-complex FD twin == complex FD (the complex FD stencil is
    UNIMPLEMENTED on complex-free TPU runtimes; ptycho/fullfield route
    forward_algorithm='fd' through the split twin there)."""
    from beyond_dof_tpu.ops.multislice import multislice_propagate_fd_split
    gd, gb = cone_foam_phantom(16, delta=1e-8, beta=1e-10)
    gd, gb = gd[None], gb[None]
    probe = np.ones(gd.shape[1:3], dtype=np.complex64)
    for fp in (None, "inf", 1e-4):
        out_c = np.asarray(multislice_propagate_fd(
            gd, gb, probe, 5000, 1e-7, free_prop_cm=fp))
        re, im = multislice_propagate_fd_split(
            gd, gb, np.real(probe), np.imag(probe), 5000, 1e-7,
            free_prop_cm=fp)
        out_s = np.asarray(re) + 1j * np.asarray(im)
        # atol scaled to the field's DC term (the far-field case has
        # DC ~ N^2 x mean; off-DC f32 transform noise is ~1e-4 absolute)
        np.testing.assert_allclose(np.abs(out_s), np.abs(out_c),
                                   rtol=1e-4,
                                   atol=5e-6 * float(np.abs(out_c).max()))


def test_h_split_runtime_kernel_matches_embedded():
    """build_split_kernel passed through h_split= (runtime arrays, nothing
    embedded in the traced program — the 8192^2 compile-payload fix) is
    bit-identical to the default trace-time-constant kernel build."""
    from beyond_dof_tpu.ops.multislice import (
        build_split_kernel, multislice_propagate_batch_split)
    rng = np.random.RandomState(7)
    n, nz = 16, 3
    gd = jnp.asarray((rng.rand(1, n, n, nz) * 1e-6).astype(np.float32))
    gb = jnp.asarray((rng.rand(1, n, n, nz) * 1e-7).astype(np.float32))
    pr = jnp.ones((1, n, n), jnp.float32)
    pi_ = jnp.zeros((1, n, n), jnp.float32)
    hs = build_split_kernel(n, n, 5000.0, 1e-7)

    re0, im0 = multislice_propagate_batch_split(
        gd, gb, pr, pi_, 5000.0, 1e-7, remat=False, use_pallas=False)

    @jax.jit
    def with_args(d, b, wr, wi, hr, hi):
        return multislice_propagate_batch_split(
            d, b, wr, wi, 5000.0, 1e-7, remat=False, use_pallas=False,
            h_split=(hr, hi))

    re1, im1 = with_args(gd, gb, pr, pi_, *hs)
    np.testing.assert_allclose(np.asarray(re1), np.asarray(re0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(im1), np.asarray(im0), atol=1e-6)
