"""Classical tomography operators and phase retrieval (baselines layer).

TPU-native replacements for the reference's tomopy/astra dependencies
(SURVEY §2): filtered backprojection replaces gridrec
(ref sirt_tomopy.py:48-50, fullfield.py:744-745), an iterative SIRT replaces
astra ``SIRT_CUDA``, and closed-form Fourier filters implement Paganin
phase retrieval (ref coarse_phase_retrival_and_recon.py:20-47) and
multi-distance CTF retrieval (ref tensorflow_recon/util.py:1094-1119).

Geometry: volumes are (Y, X, Z); projections integrate along X after rotating
the (X, Z) plane by theta, giving sinograms of shape (n_theta, Y, Z).
"""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.special import erf

from ..constants import PI
from .fresnel import gen_mesh
from .rotate import rotate_volume

__all__ = ["project_volume", "radon", "backproject", "fbp", "sirt",
           "paganin_retrieve_phase", "multidistance_ctf", "paganin_support_mask"]


def project_volume(vol, theta):
    """Line-integral projection of a (Y, X, Z) volume at one angle."""
    return jnp.sum(rotate_volume(vol, theta), axis=1)


def radon(vol, thetas):
    """Sinogram (n_theta, Y, Z) of a (Y, X, Z) volume (scan over angles)."""
    def body(_, th):
        return None, project_volume(vol, th)
    _, sino = jax.lax.scan(body, None, jnp.asarray(thetas))
    return sino


def backproject(sino, thetas):
    """Adjoint of :func:`radon`: smear each projection back through the volume."""
    n_theta, dim_y, dim_z = sino.shape
    dim_x = dim_z

    def body(acc, inp):
        th, p = inp
        smear = jnp.broadcast_to(p[:, None, :], (dim_y, dim_x, dim_z))
        return acc + rotate_volume(smear, -th), None

    acc0 = jnp.zeros((dim_y, dim_x, dim_z), sino.dtype)
    acc, _ = jax.lax.scan(body, acc0, (jnp.asarray(thetas), sino))
    return acc


def _ramp_filter(n, filter_name="ramlak"):
    freqs = np.fft.fftfreq(n)
    f = np.abs(freqs)
    if filter_name == "shepp":
        f = f * np.sinc(freqs)
    return jnp.asarray(f.astype(np.float32))


def fbp(sino, thetas, filter_name="ramlak"):
    """Filtered backprojection (the gridrec-equivalent classical baseline).

    ``sino`` (n_theta, Y, Z) -> volume (Y, X, Z). Jitted end to end; the
    ramp filter is applied along the detector axis in Fourier space.
    """
    n_theta = sino.shape[0]
    n_det = sino.shape[-1]
    filt = _ramp_filter(n_det, filter_name)
    sino_f = jnp.real(jnp.fft.ifft(jnp.fft.fft(sino, axis=-1) * filt, axis=-1))
    vol = backproject(sino_f, thetas)
    return vol * (PI / (2.0 * n_theta))


def sirt(sino, thetas, n_iter=20, relax=None, x0=None, nonneg=True):
    """Simultaneous iterative reconstruction technique (astra SIRT equivalent).

    x_{k+1} = x_k + relax * A^T (b - A x_k) / (n_theta * n_x)
    """
    n_theta, dim_y, dim_z = sino.shape
    dim_x = dim_z
    if relax is None:
        relax = 1.0 / (n_theta * dim_x)
    x = jnp.zeros((dim_y, dim_x, dim_z), sino.dtype) if x0 is None else jnp.asarray(x0)
    thetas = jnp.asarray(thetas)

    def body(x, _):
        resid = sino - radon(x, thetas)
        x = x + relax * backproject(resid, thetas)
        if nonneg:
            x = jnp.clip(x, 0.0, None)
        return x, None

    x, _ = jax.lax.scan(body, x, None, length=n_iter)
    return x


def paganin_retrieve_phase(intensity, psize_cm, dist_cm, energy_ev,
                           delta_beta_ratio=1e3, pad=True):
    """Single-distance Paganin (TIE-Hom) phase retrieval.

    Closed-form Fourier filter (replaces ``tomopy.retrieve_phase``,
    ref coarse_phase_retrival_and_recon.py:20-36): with mu = 4 pi beta/lambda,
      t = -(1/mu) ln( F^-1 [ F(I/I0) / (1 + pi lambda d (delta/beta)(u^2+v^2)) ] )
    Returns the retrieved thickness-proportional phase map per projection.
    ``intensity``: (..., H, W) intensity (already flat-field normalized).
    """
    lmbda_nm = 1240.0 / energy_ev
    psize_nm = psize_cm * 1e7
    dist_nm = dist_cm * 1e7
    h, w = intensity.shape[-2:]
    fy = np.fft.fftfreq(h, d=psize_nm)
    fx = np.fft.fftfreq(w, d=psize_nm)
    fxx, fyy = np.meshgrid(fx, fy)
    denom = 1.0 + PI * lmbda_nm * dist_nm * delta_beta_ratio * (fxx ** 2 + fyy ** 2)
    denom = jnp.asarray(denom.astype(np.float32))
    spec = jnp.fft.fft2(jnp.asarray(intensity))
    filtered = jnp.real(jnp.fft.ifft2(spec / denom))
    filtered = jnp.clip(filtered, 1e-8, None)
    return -jnp.log(filtered)


def paganin_support_mask(data_mag, thetas, psize_cm, dist_cm, energy_ev,
                         delta_beta_ratio=1e3, threshold=1e-5, sigma=3.0):
    """Bootstrap a finite-support mask: Paganin -> FBP -> blur -> threshold.

    The TPU-native analogue of the reference's Paganin+gridrec mask pipeline
    (ref coarse_phase_retrival_and_recon.py:20-47, fullfield.py:242-257).
    ``data_mag``: (n_theta, Y, X) measured magnitudes. Returns (Y, X, X) 0/1.
    """
    from .image import gaussian_filter_nd
    intensity = jnp.asarray(data_mag) ** 2
    phase = paganin_retrieve_phase(intensity, psize_cm, dist_cm, energy_ev,
                                   delta_beta_ratio)
    vol = fbp(phase, thetas)
    vol = gaussian_filter_nd(jnp.abs(vol), sigma)
    scale = jnp.max(vol)
    mask = (vol > threshold * scale).astype(jnp.float32)
    return mask


def multidistance_ctf(prj_ls, dist_cm_ls, psize_cm, energy_kev, kappa=50,
                      sigma_cut=0.01, alpha_1=5e-4, alpha_2=1e-16):
    """Multi-distance contrast-transfer-function phase retrieval.

    (ref tensorflow_recon/util.py:1094-1119.) ``prj_ls``: (n_dist, H, W)
    normalized intensities. Returns the retrieved phase magnitude map.
    """
    prj_ls = np.asarray(prj_ls)
    dist_nm_ls = np.asarray(dist_cm_ls) * 1.0e7
    lmbda_nm = 1.24 / energy_kev
    psize_nm = psize_cm * 1.0e7
    prj_shape = prj_ls.shape[1:]

    u_max = 1.0 / (2.0 * psize_nm)
    v_max = 1.0 / (2.0 * psize_nm)
    u, v = gen_mesh([v_max, u_max], prj_shape)
    xi_mesh = PI * lmbda_nm * (u ** 2 + v ** 2)
    xi_ls = xi_mesh[None] * dist_nm_ls[:, None, None]

    abs_nu = np.sqrt(u ** 2 + v ** 2)
    nu_cut = 0.6 * u_max
    f = 0.5 * (1 - erf((abs_nu - nu_cut) / sigma_cut))
    alpha = alpha_1 * f + alpha_2 * (1 - f)

    spec = np.fft.fftshift(np.fft.fft2(prj_ls - 1, axes=(-2, -1)), axes=(-2, -1))
    osc = np.sin(xi_ls) + 1.0 / kappa * np.cos(xi_ls)
    phase = np.sum(spec * osc, axis=0)
    phase /= np.sum(2 * osc ** 2, axis=0) + alpha
    phase = np.fft.ifft2(np.fft.ifftshift(phase, axes=(-2, -1)), axes=(-2, -1))
    return np.abs(phase)
