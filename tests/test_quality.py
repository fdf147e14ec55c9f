import numpy as np
import jax.numpy as jnp

from beyond_dof_tpu.ops.quality import (fourier_ring_correlation,
                                        fourier_shell_correlation, snr)


def test_frc_identical_images_is_one():
    rng = np.random.RandomState(0)
    img = rng.rand(64, 64).astype(np.float32)
    radii, frc = fourier_ring_correlation(img, img)
    assert np.all(np.asarray(frc[: len(radii)]) > 0.999)


def test_frc_decreases_with_noise():
    rng = np.random.RandomState(0)
    img = np.zeros((64, 64), np.float32)
    img[16:48, 16:48] = 1.0
    noisy = img + rng.normal(scale=0.5, size=img.shape).astype(np.float32)
    radii, frc = fourier_ring_correlation(img, noisy)
    frc = np.asarray(frc)
    # low-frequency shells correlate better than the highest shells
    assert frc[:4].mean() > frc[-8:].mean()


def test_fsc_identical_volumes():
    rng = np.random.RandomState(1)
    vol = rng.rand(24, 24, 24).astype(np.float32)
    radii, fsc = fourier_shell_correlation(vol, vol)
    assert np.all(np.asarray(fsc)[: len(radii)] > 0.999)


def test_snr_definition():
    rng = np.random.RandomState(2)
    clean = rng.rand(32, 32)
    noise = rng.normal(scale=0.1, size=clean.shape)
    val = float(snr(clean, clean + noise))
    assert abs(val - np.var(clean) / np.var(noise)) / val < 1e-5


def test_fsc_single_slice_volume_degenerates_to_frc():
    """FSC of a (Y, X, 1) volume — the 2D presets' object layout
    (ref reconstruct_fullfield.py:160-206) — must return the slice's FRC,
    not an empty shell sampling (min(shape)//2 == 0)."""
    rng = np.random.RandomState(3)
    img = rng.rand(64, 64).astype(np.float32)
    ref = img + rng.normal(scale=0.1, size=img.shape).astype(np.float32)
    r3, c3 = fourier_shell_correlation(img[:, :, None], ref[:, :, None])
    r2, c2 = fourier_ring_correlation(img, ref)
    assert len(r3) == len(r2) > 0
    np.testing.assert_allclose(np.asarray(c3), np.asarray(c2), atol=1e-6)
