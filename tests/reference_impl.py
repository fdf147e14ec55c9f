"""Independent NumPy implementations of the physics, used as test oracles.

These re-derive the reference semantics (ref tensorflow_recon/npfuncs.py:16-63,
cnn_propagator/propagation.py:18-133) in plain NumPy so every JAX op is
cross-checked against a second implementation, mirroring the reference's own
dual-implementation test strategy (SURVEY §4).
"""

import numpy as np

PI = 3.14159265359


def np_get_kernel(dist_nm, lmbda_nm, voxel_nm, grid_shape):
    k = 2 * PI / lmbda_nm
    u_max = 1. / (2. * voxel_nm[0])
    v_max = 1. / (2. * voxel_nm[1])
    yy = np.linspace(-v_max, v_max, grid_shape[0])
    xx = np.linspace(-u_max, u_max, grid_shape[1])
    u, v = np.meshgrid(xx, yy)
    H = np.exp(1j * k * dist_nm) * np.exp(-1j * PI * lmbda_nm * dist_nm * (u ** 2 + v ** 2))
    return H.astype(np.complex64)


def np_multislice(gd, gb, probe, energy_ev, psize_cm, free_prop_cm=None,
                  propagate_last=False):
    """Batched FFT multislice, NumPy-twin semantics (ref npfuncs.py:16-63)."""
    voxel_nm = np.array([psize_cm] * 3) * 1e7
    lmbda_nm = 1240. / energy_ev
    w = np.zeros(gd.shape[:3], dtype='complex64') + probe
    n_slice = gd.shape[-1]
    h = np_get_kernel(voxel_nm[-1], lmbda_nm, voxel_nm, gd.shape[1:3])
    k = 2. * PI * voxel_nm[-1] / lmbda_nm

    def prop(w, h):
        return np.fft.ifft2(np.fft.ifftshift(
            np.fft.fftshift(np.fft.fft2(w), axes=[1, 2]) * h, axes=[1, 2]))

    for i in range(n_slice):
        c = np.exp(1j * k * gd[..., i]) * np.exp(-k * gb[..., i])
        w = w * c
        if i < n_slice - 1 or propagate_last:
            w = prop(w, h)
    if isinstance(free_prop_cm, str) and free_prop_cm == 'inf':
        w = np.fft.fftshift(np.fft.fft2(w), axes=[1, 2])
    elif free_prop_cm is not None:
        h2 = np_get_kernel(free_prop_cm * 1e7, lmbda_nm, voxel_nm, gd.shape[1:3])
        w = prop(w, h2)
    return w


def np_truncated_kernel(energy_ev, psize_cm, grid_shape, kernel_size):
    """Center crop of ifft2 of the (grid_shape-1) TF kernel
    (ref cnn_propagator/propagation.py:35-47)."""
    voxel_nm = np.array([psize_cm] * 3) * 1e7
    lmbda_nm = 1240. / energy_ev
    shape_m1 = np.array(grid_shape) - 1
    kernel = np_get_kernel(voxel_nm[-1], lmbda_nm, voxel_nm, shape_m1).astype(np.complex128)
    kernel = np.fft.fftshift(np.fft.ifft2(np.fft.ifftshift(kernel)))
    mid = ((np.array(kernel.shape) - 1) / 2).astype(int)
    half = (kernel_size - 1) // 2
    return kernel[mid[0] - half:mid[0] + half + 1, mid[1] - half:mid[1] + half + 1]


def np_multislice_cnn(gd, gb, probe, energy_ev, psize_cm, kernel_size=17,
                      free_prop_cm=None):
    """Truncated-kernel conv multislice (ref cnn_propagator/propagation.py:18-133)."""
    from scipy.signal import convolve2d
    n_batch, sy, sx, n_slice = gd.shape
    voxel_nm = np.array([psize_cm] * 3) * 1e7
    lmbda_nm = 1240. / energy_ev
    k = 2. * PI * voxel_nm[-1] / lmbda_nm
    kernel = np_truncated_kernel(energy_ev, psize_cm, (sy, sx, n_slice), kernel_size)
    pad = (kernel_size - 1) // 2
    probe = np.tile(probe[None], [n_batch, 1, 1]).astype(np.complex128)
    edge_val = 1.0
    initial = probe[0, 0, 0]
    for i in range(n_slice):
        c = np.exp(1j * k * gd[..., i] - k * gb[..., i])
        probe = probe * c
        out = np.empty_like(probe)
        for b in range(n_batch):
            pp = np.pad(probe[b], pad, mode='constant', constant_values=edge_val)
            out[b] = convolve2d(pp, kernel, mode='valid')
        probe = out
        edge_val = np.sum(kernel) * edge_val
    probe *= initial / probe[0, 0, 0]
    if isinstance(free_prop_cm, str) and free_prop_cm == 'inf':
        probe = np.fft.fftshift(np.fft.fft2(probe), axes=[1, 2])
    elif free_prop_cm is not None:
        h = np_get_kernel(free_prop_cm * 1e7, lmbda_nm, voxel_nm, (sy, sx))
        probe = np.fft.ifft2(np.fft.ifftshift(
            np.fft.fftshift(np.fft.fft2(probe), axes=[1, 2]) * h, axes=[1, 2]))
    return probe
