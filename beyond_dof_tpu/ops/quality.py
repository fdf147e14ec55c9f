"""Quantitative reconstruction quality metrics: FSC / FRC / SNR.

TPU-native rebuild of the reference analysis layer
(ref: tensorflow_recon/util.py:926-1048, create_noisy_data.py:69,84-89).

The reference loops over radii, rasterizing an anti-aliased shell mask per
radius (minutes for 256^3). Here all shells are accumulated in ONE pass with a
radial binning (segment-sum over a precomputed radius-bin index), which is the
natural XLA formulation and gives the whole curve in a single fused kernel.
"""

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["fourier_shell_correlation", "fourier_ring_correlation",
           "radial_bin_index", "half_bit_threshold", "snr"]


def radial_bin_index(shape, step_size=1):
    """Integer radius-bin index per frequency voxel of an fftshifted spectrum."""
    grids = np.meshgrid(*[np.arange(n) - n // 2 for n in shape], indexing="ij")
    r = np.sqrt(sum(g.astype(np.float64) ** 2 for g in grids))
    return np.round(r / step_size).astype(np.int32)


def _fourier_correlation(f_obj, f_ref, bins, n_bins):
    f_prod = f_obj * jnp.conj(f_ref)
    f_obj_2 = jnp.real(f_obj * jnp.conj(f_obj))
    f_ref_2 = jnp.real(f_ref * jnp.conj(f_ref))
    b = bins.ravel()
    num_r = jnp.bincount(b, weights=jnp.real(f_prod).ravel(), length=n_bins)
    num_i = jnp.bincount(b, weights=jnp.imag(f_prod).ravel(), length=n_bins)
    den1 = jnp.bincount(b, weights=f_obj_2.ravel(), length=n_bins)
    den2 = jnp.bincount(b, weights=f_ref_2.ravel(), length=n_bins)
    return jnp.abs(jax.lax.complex(num_r, num_i)) / jnp.sqrt(den1 * den2 + 1e-30)


def fourier_shell_correlation(obj, ref, step_size=1):
    """3D FSC curve (ref util.py:975-1010).

    Returns ``(radii, fsc)`` as arrays; radii run from 1 to min(shape)//2 in
    ``step_size`` increments, matching the reference's sampling.
    """
    obj = jnp.asarray(obj)
    ref = jnp.asarray(ref)
    squeeze = tuple(i for i, n in enumerate(obj.shape) if n == 1)
    if squeeze and obj.ndim - len(squeeze) == 2:
        # single-slice volume (e.g. the 2D presets' (Y, X, 1) objects,
        # ref reconstruct_fullfield.py:160-206): the shells degenerate to
        # rings, so the FSC of the volume IS the FRC of the slice — with
        # min(shape)//2 == 0 the shell sampling would otherwise be empty
        return fourier_ring_correlation(jnp.squeeze(obj, squeeze),
                                        jnp.squeeze(ref, squeeze),
                                        step_size)
    radius_max = int(min(obj.shape) / 2)
    bins = jnp.asarray(radial_bin_index(obj.shape, step_size))
    n_bins = int(bins.max()) + 1
    f_obj = jnp.fft.fftshift(jnp.fft.fftn(obj))
    f_ref = jnp.fft.fftshift(jnp.fft.fftn(ref))
    fsc = _fourier_correlation(f_obj, f_ref, bins, n_bins)
    radii = np.arange(1, radius_max, step_size)
    return radii, fsc[1:radius_max][::1][: len(radii)]


def half_bit_threshold(radii, shape, step_size=1):
    """1/2-bit information FSC threshold curve (van Heel & Schatz 2005).

    T(r) = (0.2071 + 1.9102 / sqrt(n_r)) / (1.2071 + 0.9102 / sqrt(n_r))
    with ``n_r`` the voxel count of shell r. This is the resolution
    criterion the reference workflow judges reconstructions by
    (ref plot_fsc.py:11-14 computes the FSC it is compared against).
    """
    bins = radial_bin_index(shape, step_size)
    counts = np.bincount(bins.ravel(), minlength=int(bins.max()) + 1)
    n_r = counts[np.asarray(radii, int)].astype(np.float64)
    n_eff = np.sqrt(np.maximum(n_r, 1.0))
    return (0.2071 + 1.9102 / n_eff) / (1.2071 + 0.9102 / n_eff)


def fourier_ring_correlation(obj, ref, step_size=1):
    """2D FRC curve (ref util.py:1013-1048). Returns ``(radii, frc)``."""
    obj = jnp.asarray(obj)
    ref = jnp.asarray(ref)
    radius_max = int(min(obj.shape) / 2)
    bins = jnp.asarray(radial_bin_index(obj.shape, step_size))
    n_bins = int(bins.max()) + 1
    f_obj = jnp.fft.fftshift(jnp.fft.fft2(obj))
    f_ref = jnp.fft.fftshift(jnp.fft.fft2(ref))
    frc = _fourier_correlation(f_obj, f_ref, bins, n_bins)
    radii = np.arange(1, radius_max, step_size)
    return radii, frc[1:radius_max][: len(radii)]


def snr(clean_intensity, noisy_intensity):
    """Signal-to-noise ratio var(signal)/var(noise) (ref create_noisy_data.py:69)."""
    noise = jnp.asarray(noisy_intensity) - jnp.asarray(clean_intensity)
    return jnp.var(jnp.asarray(clean_intensity)) / jnp.var(noise)
