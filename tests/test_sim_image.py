import numpy as np
import jax.numpy as jnp
import pytest

from beyond_dof_tpu.sim.acquire import (add_poisson_noise_fullfield,
                                        add_poisson_noise_ptycho,
                                        grid_probe_positions,
                                        create_fullfield_data)
from beyond_dof_tpu.ops.image import (realign_image, rescale_image, upsample_2x,
                                      gaussian_filter_nd, circ_mask, preprocess,
                                      downsample_2x_projections)
from beyond_dof_tpu.models.phantom import adhesin_phantom
from beyond_dof_tpu.models.simulator import Simulator


def test_poisson_noise_fullfield_snr_scales_with_photons():
    rng = np.random.RandomState(0)
    data = (0.5 + 0.5 * rng.rand(5, 32, 32)).astype(np.complex64)
    noisy_lo, snr_lo = add_poisson_noise_fullfield(data, 1e4, 100,
                                                   rng=np.random.RandomState(1))
    noisy_hi, snr_hi = add_poisson_noise_fullfield(data, 1e8, 100,
                                                   rng=np.random.RandomState(1))
    assert snr_hi > snr_lo * 10
    assert noisy_lo.shape == data.shape


def test_poisson_noise_ptycho_runs():
    rng = np.random.RandomState(0)
    data = (0.5 + 0.5 * rng.rand(2, 4, 16, 16)).astype(np.complex64)
    noisy, snr = add_poisson_noise_ptycho(data, 1e7, 100, 64 ** 3,
                                          rng=np.random.RandomState(1))
    assert noisy.shape == data.shape
    assert np.isfinite(snr)


def test_grid_probe_positions_cover_object():
    pos = grid_probe_positions((64, 64), (16, 16), 8)
    assert pos[:, 0].min() >= 8
    assert pos[:, 0].max() <= 56
    assert len(pos) == 49


def test_realign_image_integer_and_subpixel():
    rng = np.random.RandomState(0)
    img = rng.rand(16, 16).astype(np.float32)
    out = np.asarray(realign_image(jnp.asarray(img), (2, 3)))
    assert np.allclose(out, np.roll(np.roll(img, 2, 0), 3, 1), atol=1e-6)
    out2 = np.asarray(realign_image(jnp.asarray(img), (0.5, 0.0)))
    assert out2.shape == img.shape
    assert np.isfinite(out2).all()


def test_rescale_image_identity_at_m1():
    rng = np.random.RandomState(0)
    img = rng.rand(2, 16, 16).astype(np.float32)
    out = np.asarray(rescale_image(jnp.asarray(img), 1.0, (2, 16, 16)))
    assert np.abs(out - img).max() < 1e-5


def test_upsample_2x_shape_and_mass():
    v = np.ones((8, 8, 8), np.float32)
    up = np.asarray(upsample_2x(v))
    assert up.shape == (16, 16, 16)
    # zero-stuffing + blur preserves total mass approximately
    assert abs(up.sum() - v.sum()) / v.sum() < 0.05


def test_gaussian_filter_preserves_mean():
    rng = np.random.RandomState(0)
    x = rng.rand(16, 16).astype(np.float32)
    y = np.asarray(gaussian_filter_nd(x, 1.5))
    assert abs(y.mean() - x.mean()) < 0.01
    assert y.std() < x.std()


def test_circ_mask_area():
    m = circ_mask((32, 32), 1.0)
    assert abs(m.sum() - np.pi * 16 ** 2) / (np.pi * 256) < 0.05


def test_preprocess_log_transform():
    dat = np.array([[0.5, 1.0], [1e-5, 2.0]])
    out = preprocess(dat.copy())
    assert abs(out[0, 0] - (-np.log(0.5))) < 1e-6
    assert out[0, 1] == 0  # -log(1)
    assert np.isfinite(out).all()


def test_downsample_projections():
    prj = np.zeros((4, 8, 8))
    assert downsample_2x_projections(prj, 2).shape == (4, 4, 4)
    assert downsample_2x_projections(prj, 1).shape == (4, 8, 8)


def test_simulator_legacy_api(tmp_path):
    gd, gb = adhesin_phantom(16)
    sim = Simulator(800, grid=(gd, gb), psize=[0.67e-7] * 3)
    sim.initialize_wavefront("plane")
    assert np.abs(sim.wavefront - 1).max() == 0
    sim.initialize_wavefront("spot", width=6)
    assert sim.wavefront.sum() == 36
    w = sim.initialize_wavefront("spherical", dist_to_source=100.0)
    assert np.allclose(np.abs(w), 1, atol=1e-5)
    sim.initialize_wavefront("point_projection_lens", focal_length=10,
                             lens_sample_dist=30)
    assert np.allclose(np.abs(sim.wavefront), 1, atol=1e-5)
    sim.initialize_wavefront("plane")
    out = sim.propagate()
    assert out.shape == (16, 16)
    sim.save_grid(str(tmp_path / "grid"))
    sim2 = Simulator(800, grid=(gd, gb), psize=[0.67e-7] * 3)
    sim2.read_grid(str(tmp_path / "grid"))
    assert np.array_equal(sim2.grid_delta, gd)


def test_create_data_split_fallback_matches(monkeypatch):
    """Simulation auto-falls back to the split path on complex-free backends
    and produces the same data."""
    import beyond_dof_tpu.sim.acquire as acq
    gd, gb = adhesin_phantom(16)
    ref = acq.create_fullfield_data(gd, gb, energy_ev=800, psize_cm=0.67e-7,
                                    free_prop_cm=1e-4, n_theta=3, batch_size=3,
                                    theta_end=2 * np.pi)
    import beyond_dof_tpu.ops.splitfft as sf
    monkeypatch.setattr(sf, "complex_supported", lambda *a, **k: False)
    out = acq.create_fullfield_data(gd, gb, energy_ev=800, psize_cm=0.67e-7,
                                    free_prop_cm=1e-4, n_theta=3, batch_size=3,
                                    theta_end=2 * np.pi)
    assert np.abs(out - ref).max() < 1e-5


def test_farfield_multiscale_downsampling_consistent():
    """Center crop / ds^2 of the full far field ~= the far field of the
    2x-downsampled object (the multiscale relation for free_prop='inf'
    data; strided subsampling has no such consistency)."""
    import numpy as np
    import jax.numpy as jnp
    from beyond_dof_tpu.ops.image import downsample_projections_farfield

    rng = np.random.RandomState(0)
    n = 32
    y = np.linspace(-1, 1, n)
    obj = np.exp(-(y[:, None] ** 2 + y[None, :] ** 2) * 6
                 ).astype(np.complex64)          # smooth, band-limited
    far = np.fft.fftshift(np.fft.fft2(obj))[None]
    coarse_data = np.asarray(downsample_projections_farfield(far, 2))[0]
    obj_ds = 0.25 * (obj[::2, ::2] + obj[1::2, ::2]
                     + obj[::2, 1::2] + obj[1::2, 1::2])
    far_ds = np.fft.fftshift(np.fft.fft2(obj_ds))
    # magnitudes (what the engine's loss consumes): the residual complex
    # difference is a half-pixel linear phase from the block-average grid
    # offset, invisible to |.|
    scale = np.abs(far_ds).max()
    err = np.abs(np.abs(coarse_data) - np.abs(far_ds)).max() / scale
    assert err < 0.01, err
