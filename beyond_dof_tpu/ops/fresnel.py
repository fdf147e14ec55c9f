"""Fresnel propagation kernels and single-distance propagators.

TPU-native rebuild of the reference "ops" layer kernel builders
(ref: tensorflow_recon/util.py:156-228, simulation/prop.py:22-80,
tensorflow_recon/npfuncs.py:204-224).

Design notes (TPU-first):

* Transfer-function kernels are built **once on the host in float64** and cast
  to complex64. Kernel phases like ``k * dist_nm`` reach 1e4-1e6 rad; float32
  trig there would destroy the 1e-6 parity target, while the *application* of
  the kernel (elementwise complex multiply) is safe in complex64 on device.
* The reference applies H between explicit fftshift/ifftshift pairs in the hot
  loop (ref util.py:401). Elementwise multiplication commutes with any index
  permutation, so ``ifft2(ifftshift(fftshift(fft2(w)) * H))`` is *exactly*
  ``ifft2(fft2(w) * ifftshift(H))``. We fold the shift into the kernel once
  (``ifftshift2``) and keep the per-slice loop to a bare FFT→multiply→IFFT,
  removing four shuffle ops per slice from the XLA graph.
"""

import numpy as np
import jax.numpy as jnp

from ..constants import PI

__all__ = [
    "gen_mesh",
    "get_kernel",
    "get_kernel_ir",
    "get_kernel_ir_real",
    "get_kernel_spherical",
    "ifftshift2",
    "critical_sampling_nm",
    "select_algorithm",
    "fresnel_propagate",
    "free_propagate_spherical",
    "prop_tf",
    "prop_ir",
    "prop_ff",
    "prop_1ft",
]


def gen_mesh(max_yx, shape):
    """Symmetric linspace mesh, reference convention (ref util.py:156-162).

    Returns ``(U, V)`` with ``U`` sweeping ``[-max_yx[1], max_yx[1]]`` along
    the last axis and ``V`` sweeping ``[-max_yx[0], max_yx[0]]`` along the
    first.  Note this is an *inclusive-endpoint* grid: for even sizes it is
    deliberately offset from the fftfreq grid — reproducing the reference's
    sampling exactly is required for 1e-6 parity.
    """
    yy = np.linspace(-max_yx[0], max_yx[0], shape[0])
    xx = np.linspace(-max_yx[1], max_yx[1], shape[1])
    return np.meshgrid(xx, yy)


def get_kernel(dist_nm, lmbda_nm, voxel_nm, grid_shape):
    """Fresnel transfer-function kernel H(u,v), fftshift-centered.

    H = exp(i k d) * exp(-i pi lambda d (u^2 + v^2)),   k = 2 pi / lambda
    (ref: tensorflow_recon/util.py:165-185).

    Built in float64 on host; returns np.complex64 of shape ``grid_shape[:2]``.
    """
    k = 2.0 * PI / lmbda_nm
    u_max = 1.0 / (2.0 * voxel_nm[0])
    v_max = 1.0 / (2.0 * voxel_nm[1])
    u, v = gen_mesh([v_max, u_max], grid_shape[0:2])
    H = np.exp(1j * k * dist_nm) * np.exp(-1j * PI * lmbda_nm * dist_nm * (u ** 2 + v ** 2))
    return H.astype(np.complex64)


def get_kernel_ir(dist_nm, lmbda_nm, voxel_nm, grid_shape):
    """Fresnel impulse-response kernel, transformed to frequency space.

    h(x,y) = exp(i k d)/(i lambda d) * exp(i k (x^2+y^2)/(2d));
    H = fftshift(fft2(h)) * dx * dy  (ref: tensorflow_recon/util.py:188-216).
    """
    size_nm = np.array(voxel_nm, dtype=np.float64) * np.array(grid_shape, dtype=np.float64)
    k = 2.0 * PI / lmbda_nm
    ymin, xmin = np.array(size_nm)[:2] / -2.0
    dy, dx = voxel_nm[0], voxel_nm[1]
    x = np.arange(xmin, xmin + size_nm[1], dx)
    y = np.arange(ymin, ymin + size_nm[0], dy)
    x, y = np.meshgrid(x, y)
    h = np.exp(1j * k * dist_nm) / (1j * lmbda_nm * dist_nm) * np.exp(1j * k / (2.0 * dist_nm) * (x ** 2 + y ** 2))
    H = np.fft.fftshift(np.fft.fft2(h)) * voxel_nm[0] * voxel_nm[1]
    return H.astype(np.complex64)


def get_kernel_ir_real(dist_nm, lmbda_nm, voxel_nm, grid_shape):
    """Real-space impulse-response kernel (ref: cnn_propagator/util.py:130-155)."""
    size_nm = np.array(voxel_nm, dtype=np.float64) * np.array(grid_shape, dtype=np.float64)
    y_half, x_half = (np.array(size_nm)[:2] - 1) / 2.0
    dy, dx = voxel_nm[0], voxel_nm[1]
    x = np.arange(0, size_nm[1], dx) - x_half
    y = np.arange(0, size_nm[0], dy) - y_half
    x, y = np.meshgrid(x, y)
    h = np.exp(1j / (dist_nm * lmbda_nm) * (x ** 2 + y ** 2))
    return h.astype(np.complex64)


def get_kernel_spherical(dist_nm, lmbda_nm, r_nm, theta_max, phi_max, probe_shape):
    """Equirectangular free-space kernel for spherical (cone-beam) waves.

    H = exp(-i (k_theta^2 + k_phi^2)/(2k) * (1/(r+d) - 1/r))
    (ref: tensorflow_recon/util.py:219-228).
    """
    k_theta = PI / theta_max * (np.arange(probe_shape[0]) - float(probe_shape[0] - 1) / 2)
    k_phi = PI / phi_max * (np.arange(probe_shape[1]) - float(probe_shape[1] - 1) / 2)
    k_phi, k_theta = np.meshgrid(k_phi, k_theta)
    k = 2 * PI / lmbda_nm
    H = np.exp(-1j / (2 * k) * (k_theta ** 2 + k_phi ** 2) * (1.0 / (r_nm + dist_nm) - 1.0 / r_nm))
    return H.astype(np.complex64)


def ifftshift2(h):
    """Fold the reference's fftshift/ifftshift pair into the kernel itself.

    ``ifft2(ifftshift(fftshift(fft2(w)) * h)) == ifft2(fft2(w) * ifftshift2(h))``
    exactly (permutations commute with elementwise products).
    """
    return np.fft.ifftshift(np.asarray(h), axes=(-2, -1))


def critical_sampling_nm(lmbda_nm, dist_nm, size_nm):
    """Critical sampling distance lambda*z/L (ref util.py:396-398)."""
    l = np.prod(size_nm) ** (1.0 / 3)
    return lmbda_nm * dist_nm / l


def select_algorithm(lmbda_nm, dist_nm, voxel_nm, size_nm):
    """'TF' if mean voxel exceeds the critical sampling, else 'IR'.

    (ref util.py:397-404; note every engine in the reference then forces 'TF',
    see npfuncs.py:53 — callers here may do the same.)
    """
    mean_voxel_nm = np.prod(voxel_nm) ** (1.0 / 3)
    crit_samp = critical_sampling_nm(lmbda_nm, dist_nm, size_nm)
    return "TF" if mean_voxel_nm > crit_samp else "IR"


def apply_kernel(wavefront, h):
    """FFT-space application of a *fftshift-centered* kernel to (..., Y, X)."""
    h_if = jnp.asarray(ifftshift2(h)) if isinstance(h, np.ndarray) else jnp.fft.ifftshift(h, axes=(-2, -1))
    return jnp.fft.ifft2(jnp.fft.fft2(wavefront) * h_if)


def fresnel_propagate(wavefront, energy_ev, psize_cm, dist_cm, algorithm="TF"):
    """Single-distance Fresnel propagation of a (..., Y, X) complex field.

    Mirrors ``fresnel_propagate_numpy`` (ref npfuncs.py:204-224): ``dist_cm``
    may be ``'inf'`` (far field -> centered FFT), otherwise the TF or IR
    kernel is applied. ``algorithm='auto'`` enables regime selection.
    """
    if isinstance(dist_cm, str) and dist_cm == "inf":
        return jnp.fft.fftshift(jnp.fft.fft2(wavefront), axes=(-2, -1))
    lmbda_nm = 1240.0 / energy_ev
    psize_nm = psize_cm * 1e7
    dist_nm = dist_cm * 1e7
    shape = wavefront.shape[-2:]
    if algorithm == "auto":
        n = float(np.mean(shape))
        z_crit_cm = (psize_cm * n) ** 2 / ((0.000124 / energy_ev) * n)
        algorithm = "TF" if dist_cm < z_crit_cm else "IR"
    if algorithm == "TF":
        h = get_kernel(dist_nm, lmbda_nm, [psize_nm, psize_nm], shape)
        return apply_kernel(wavefront, h)
    else:
        h = get_kernel_ir(dist_nm, lmbda_nm, [psize_nm, psize_nm], shape)
        return apply_kernel(wavefront, h)


def free_propagate_spherical(wavefront, dist_cm, r_cm, lmbda_nm, probe_shape,
                             theta_max=PI / 18, phi_max=PI / 18):
    """Free-space step of a spherical wave in (theta, phi) coordinates.

    (ref: npfuncs.py:121-132). Shift convention of the reference is kept:
    the kernel grid is already centered, and the field spectrum is fftshifted
    before the multiply.
    """
    dist_nm = dist_cm * 1.0e7
    r_nm = r_cm * 1.0e7
    h = get_kernel_spherical(dist_nm, lmbda_nm, r_nm, theta_max, phi_max, probe_shape)
    spec = jnp.fft.fftshift(jnp.fft.fft2(wavefront), axes=(-2, -1))
    return jnp.fft.ifft2(jnp.fft.ifftshift(spec * jnp.asarray(h), axes=(-2, -1)))


# ---------------------------------------------------------------------------
# Pedagogical single-distance propagators (ref: simulation/prop.py).
# These use the fftfreq-grid convention of the Voelz textbook demos.
# ---------------------------------------------------------------------------

def prop_tf(u1, step, L, wavel, z):
    """Transfer-function propagation (ref simulation/prop.py:22-34)."""
    M, N = u1.shape
    fx = np.fft.fftshift(np.fft.fftfreq(M, d=step))
    fy = np.fft.fftshift(np.fft.fftfreq(N, d=step))
    FX, FY = np.meshgrid(fx, fy)
    H = np.exp(-1j * np.pi * wavel * z * (FX ** 2 + FY ** 2)).astype(np.complex64)
    U1 = jnp.fft.fftshift(jnp.fft.fft2(u1))
    return jnp.fft.ifft2(jnp.fft.ifftshift(jnp.asarray(H) * U1))


def prop_ir(u1, step, L, wavel, z):
    """Impulse-response propagation (ref simulation/prop.py:38-49)."""
    M, N = u1.shape
    k = 2 * np.pi / wavel
    x = np.linspace(-L / 2.0, L / 2.0 - step, M)
    y = np.linspace(-L / 2.0, L / 2.0 - step, N)
    X, Y = np.meshgrid(x, y)
    h = (np.exp(1j * k * z) / (1j * wavel * z)) * np.exp(1j * k * (1.0 / (2 * z)) * (X ** 2 + Y ** 2))
    H = (np.fft.fft2(np.fft.fftshift(h)) * step * step).astype(np.complex64)
    U1 = jnp.fft.fft2(jnp.fft.fftshift(u1))
    return jnp.fft.ifftshift(jnp.fft.ifft2(jnp.asarray(H) * U1))


def prop_ff(u1, step, L1, wavel, z):
    """Fraunhofer propagation; returns (u2, L2) (ref simulation/prop.py:53-63)."""
    M, N = u1.shape
    k = 2 * np.pi / wavel
    L2 = wavel * z / step
    x2 = np.linspace(-L2 / 2.0, L2 / 2.0, M)
    X2, Y2 = np.meshgrid(x2, x2)
    c = (1 / (1j * wavel * z) * np.exp(((1j * k) / (2.0 * z)) * (X2 ** 2 + Y2 ** 2))).astype(np.complex64)
    u2 = jnp.asarray(c) * jnp.fft.ifftshift(jnp.fft.fft2(jnp.fft.fftshift(u1))) * (step * step)
    return u2, L2


def prop_1ft(u1, step, L1, wavel, z):
    """Single-FT propagation with scaled output grid (ref simulation/prop.py:65-80)."""
    M, N = u1.shape
    k = 2 * np.pi / wavel
    x = np.linspace(-L1 / 2.0, L1 / 2.0 - step, M)
    y = np.linspace(-L1 / 2.0, L1 / 2.0 - step, N)
    X, Y = np.meshgrid(x, y)
    L2 = wavel * z / step
    x2 = np.linspace(-L2 / 2.0, L2 / 2.0, M)
    X2, Y2 = np.meshgrid(x2, x2)
    c = (1 / (1j * wavel * z) * np.exp(((1j * k) / (2.0 * z)) * (X2 ** 2 + Y2 ** 2))).astype(np.complex64)
    c0 = np.exp(1j * k / (2 * z) * (X ** 2 + Y ** 2)).astype(np.complex64)
    u2 = jnp.asarray(c) * jnp.fft.ifftshift(jnp.fft.fft2(jnp.fft.fftshift(u1 * jnp.asarray(c0)))) * (step * step)
    return u2, L2
