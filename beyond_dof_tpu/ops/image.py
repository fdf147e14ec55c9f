"""Image resampling / alignment / filtering utilities.

TPU-native rebuild of the reference's image helpers
(ref: tensorflow_recon/util.py:231-306, 1051-1061, 263-274).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates

__all__ = ["realign_image", "rescale_image", "upsample_2x", "gaussian_filter_nd",
           "preprocess", "circ_mask", "downsample_2x_projections"]


def realign_image(arr, shift):
    """Translate an image; circular shift for near-integer shifts, else Fourier.

    (ref util.py:277-306). Returns float32.
    """
    shift = np.asarray(shift, dtype=np.float64)
    if np.count_nonzero(np.abs(shift - np.round(shift)) < 0.01) == 2:
        out = jnp.roll(jnp.roll(arr, int(round(shift[0])), axis=0),
                       int(round(shift[1])), axis=1)
        return out.astype(jnp.float32)
    ny, nx = arr.shape
    fy = jnp.fft.fftfreq(ny)[:, None]
    fx = jnp.fft.fftfreq(nx)[None, :]
    phase = jnp.exp(-2j * jnp.pi * (shift[0] * fy + shift[1] * fx))
    out = jnp.fft.ifftn(jnp.fft.fftn(arr) * phase)
    return jnp.abs(out).astype(jnp.float32)


def rescale_image(arr, m, original_shape):
    """Magnification resampling of an (N, H, W) stack (ref util.py:231-260).

    Samples the input on a grid shrunk by factor ``m`` about the image
    center — differentiable bilinear gather (replaces tf.contrib.resampler).
    """
    n_batch, h, w = original_shape
    y = jnp.arange(h, dtype=jnp.float32) / m + (h - h / m) / 2.0
    x = jnp.arange(w, dtype=jnp.float32) / m + (w - w / m) / 2.0
    y = jnp.clip(y, 0, h - 1)
    x = jnp.clip(x, 0, w - 1)
    yy, xx = jnp.meshgrid(y, x, indexing="ij")

    def resample_one(img):
        return map_coordinates(img, [yy, xx], order=1, mode="nearest")

    if jnp.iscomplexobj(arr):
        re = jax.vmap(resample_one)(jnp.real(arr))
        im = jax.vmap(resample_one)(jnp.imag(arr))
        return jax.lax.complex(re, im)
    return jax.vmap(resample_one)(arr)


def _gaussian_kernel_1d(sigma, truncate=4.0):
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    return (g / g.sum()).astype(np.float32)


def gaussian_filter_nd(arr, sigma, truncate=4.0):
    """Separable Gaussian blur over all axes of a float array (device-side).

    Matches scipy.ndimage.gaussian_filter with mode='reflect' closely enough
    for mask generation and multiscale upsampling.
    """
    g = jnp.asarray(_gaussian_kernel_1d(sigma, truncate))
    radius = (g.shape[0] - 1) // 2
    out = jnp.asarray(arr, jnp.float32)
    for ax in range(out.ndim):
        moved = jnp.moveaxis(out, ax, -1)
        padded = jnp.pad(moved, [(0, 0)] * (moved.ndim - 1) + [(radius, radius)],
                         mode="reflect")
        flat = padded.reshape(-1, padded.shape[-1])
        conv = jax.vmap(lambda row: jnp.convolve(row, g, mode="valid"))(flat)
        out = jnp.moveaxis(conv.reshape(moved.shape), -1, ax)
    return out


def upsample_2x(arr, sigma=1.0):
    """Zero-stuffing 2x volume upsampling + Gaussian blur (ref util.py:1051-1061).

    Used to seed each finer multiscale level from the previous one.
    """
    arr = jnp.asarray(arr, jnp.float32)
    out = jnp.zeros([s * 2 for s in arr.shape], jnp.float32)
    out = out.at[(slice(None, None, 2),) * arr.ndim].set(arr)
    return gaussian_filter_nd(out, sigma)


def downsample_2x_projections(prj, ds_level):
    """Strided projection downsampling for multiscale (ref fullfield.py:213-216)."""
    if ds_level > 1:
        return prj[:, ::ds_level, ::ds_level]
    return prj


def downsample_projections_farfield(prj, ds_level):
    """Multiscale downsampling for FAR-FIELD (Fourier-plane) data.

    A ds-downsampled object's far field is the CENTER CROP of the full
    fftshifted pattern scaled by 1/ds^2 (the coarse DFT sums ds^2 fewer
    samples, each a block average) — strided real-space subsampling, which
    the reference applies to every detector geometry
    (ref fullfield.py:213-216), misscales far-field magnitudes by ~ds^2 at
    the coarse levels and aliases the pattern, which is why its cone_far
    preset cannot actually converge through multiscale. Deliberate delta
    (see PARITY.md)."""
    if ds_level > 1:
        n_y, n_x = prj.shape[-2:]
        cy, cx = n_y // ds_level, n_x // ds_level
        y0, x0 = (n_y - cy) // 2, (n_x - cx) // 2
        return prj[:, y0:y0 + cy, x0:x0 + cx] / float(ds_level ** 2)
    return prj


def preprocess(dat, blur=None):
    """Transmission -> attenuation preprocessing (ref util.py:263-274)."""
    dat = np.array(dat)
    dat[np.abs(dat) < 2e-3] = 2e-3
    dat[dat > 1] = 1
    dat = -np.log(dat)
    dat[np.isnan(dat)] = 0
    if blur is not None:
        from scipy.ndimage import gaussian_filter
        dat = gaussian_filter(dat, blur)
    return dat


def circ_mask(shape, ratio=0.9):
    """Circular mask of the given (H, W) shape (tomopy.circ_mask equivalent)."""
    h, w = shape
    yy, xx = np.meshgrid(np.arange(h) - (h - 1) / 2.0,
                         np.arange(w) - (w - 1) / 2.0, indexing="ij")
    r = min(h, w) / 2.0 * ratio
    return (yy ** 2 + xx ** 2 <= r ** 2).astype(np.float32)
