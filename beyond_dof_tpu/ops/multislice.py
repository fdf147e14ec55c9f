"""Multislice wave propagation through a voxelized object (the hot path).

TPU-native rebuild of the reference multislice propagators
(ref: tensorflow_recon/util.py:360-579, tensorflow_recon/npfuncs.py:16-63).

Physics: a probe wavefield is pushed through the object slice by slice.
Per slice: refractive modulation ``psi *= exp(i k delta dz) * exp(-k beta dz)``
followed by free-space Fresnel propagation by one slice thickness
(FFT -> multiply by transfer function H -> IFFT).

TPU-first design decisions
--------------------------
* The slice loop is a ``lax.scan`` (replacing ``tf.while_loop``,
  ref util.py:465-483): XLA compiles one fused slice-step and rolls it.
* The fftshift/ifftshift pair around the kernel multiply (ref util.py:401)
  is folded into the (host-precomputed, float64-accurate) kernel once —
  see :func:`beyond_dof_tpu.ops.fresnel.ifftshift2`. The compiled loop body is
  exactly modulate -> FFT -> multiply -> IFFT.
* ``remat='slice'`` rematerializes each slice step in the backward pass so AD
  through hundreds of slices stores only the per-slice carry (one wavefield)
  instead of every FFT intermediate. The reference never solved this (TF1
  kept the whole graph).
"""

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import PI
from .fresnel import get_kernel, get_kernel_ir, ifftshift2

__all__ = [
    "modulate",
    "multislice_propagate_batch",
    "multislice_propagate_fd",
    "free_propagate_paraxial",
]


def modulate(wavefront, delta_slice, beta_slice, k):
    """Refractive modulation ``psi * exp(i k delta) * exp(-k beta)``.

    ``k = 2 pi dz / lambda`` (ref util.py:462,470). Computed as a single
    complex exponential; XLA fuses this with the surrounding FFTs.
    """
    c = jnp.exp(jax.lax.complex(-k * beta_slice, k * delta_slice))
    return wavefront * c


def _final_kernel(dist_nm, lmbda_nm, voxel_nm, grid_shape, size_nm,
                  algorithm="TF"):
    """Final free-space kernel with the TF/IR/auto selection rule
    (ref util.py:397-404,490-508). Shared by the complex and split paths so
    both honor ``free_prop_algorithm`` identically."""
    if algorithm == "auto":
        mean_voxel_nm = np.prod(voxel_nm) ** (1.0 / 3)
        l = np.prod(size_nm) ** (1.0 / 3)
        crit_samp = lmbda_nm * dist_nm / l
        algorithm = "TF" if mean_voxel_nm > crit_samp else "IR"
    if algorithm == "TF":
        return get_kernel(dist_nm, lmbda_nm, voxel_nm, grid_shape)
    if algorithm == "IR":
        return get_kernel_ir(dist_nm, lmbda_nm, voxel_nm, grid_shape)
    raise ValueError("free_prop_algorithm must be 'TF', 'IR', or 'auto'; "
                     "got %r" % (algorithm,))


def _free_space_final(wavefront, free_prop_cm, lmbda_nm, voxel_nm, grid_shape,
                      size_nm, algorithm="TF"):
    """Final sample-to-detector free-space step (ref util.py:490-508)."""
    if isinstance(free_prop_cm, str) and free_prop_cm == "inf":
        return jnp.fft.fftshift(jnp.fft.fft2(wavefront), axes=(-2, -1))
    h = _final_kernel(free_prop_cm * 1e7, lmbda_nm, voxel_nm, grid_shape,
                      size_nm, algorithm)
    h_if = jnp.asarray(ifftshift2(h))
    return jnp.fft.ifft2(jnp.fft.fft2(wavefront) * h_if)


@partial(jax.jit, static_argnames=("free_prop_cm", "propagate_last", "remat",
                                   "free_prop_algorithm", "energy_ev", "psize_cm"))
def _multislice_core(grid_delta, grid_beta, probe, h_if,
                     energy_ev, psize_cm, free_prop_cm,
                     propagate_last, remat, free_prop_algorithm):
    batch, dim_y, dim_x, n_slice = grid_delta.shape
    voxel_nm = np.array([psize_cm] * 3) * 1.0e7
    lmbda_nm = 1240.0 / energy_ev
    delta_nm = voxel_nm[-1]
    size_nm = np.array([dim_y, dim_x, n_slice]) * voxel_nm
    k = np.float32(2.0 * PI * delta_nm / lmbda_nm)

    wavefront = jnp.broadcast_to(probe.astype(jnp.complex64), (batch, dim_y, dim_x))

    # (B, Y, X, Z) -> (Z, B, Y, X) so the scan sweeps the leading axis.
    delta_z = jnp.moveaxis(grid_delta, -1, 0)
    beta_z = jnp.moveaxis(grid_beta, -1, 0)

    def step_prop(w, slices):
        d, b = slices
        w = modulate(w, d, b, k)
        w = jnp.fft.ifft2(jnp.fft.fft2(w) * h_if)
        return w, None

    def step_mod(w, slices):
        d, b = slices
        return modulate(w, d, b, k), None

    if remat:
        step_prop = jax.checkpoint(step_prop)

    if n_slice == 1:
        wavefront, _ = step_mod(wavefront, (delta_z[0], beta_z[0]))
    elif propagate_last:
        wavefront, _ = jax.lax.scan(step_prop, wavefront, (delta_z, beta_z))
    else:
        # NumPy-twin convention: no propagation after the last slice
        # (ref npfuncs.py:40-41).
        wavefront, _ = jax.lax.scan(step_prop, wavefront, (delta_z[:-1], beta_z[:-1]))
        wavefront, _ = step_mod(wavefront, (delta_z[-1], beta_z[-1]))

    if free_prop_cm is not None:
        wavefront = _free_space_final(wavefront, free_prop_cm, lmbda_nm, voxel_nm,
                                      (dim_y, dim_x), size_nm, free_prop_algorithm)
    return wavefront


def multislice_propagate_batch(grid_delta, grid_beta, probe, energy_ev, psize_cm,
                               h=None, free_prop_cm=None, propagate_last=True,
                               remat=True, free_prop_algorithm="TF"):
    """Batched planar multislice propagation.

    Parameters
    ----------
    grid_delta, grid_beta : (B, Y, X, Z) float arrays
        Refractive-index decrements delta and absorption indices beta.
    probe : complex (Y, X) or (B, Y, X)
        Incident wavefield.
    h : optional precomputed fftshift-centered transfer kernel (Y, X);
        built from ``get_kernel`` when omitted (ref util.py:459-461).
    free_prop_cm : None | float | 'inf'
        Optional sample-to-detector free-space distance (ref util.py:490-508).
    propagate_last : bool
        True matches the TF engines (propagate after every slice,
        ref util.py:465-483); False matches the NumPy data-generation twin
        (skip propagation after the final slice, ref npfuncs.py:40-41).
    remat : bool
        Rematerialize slice steps in the backward pass (memory O(n_slice)
        wavefields -> O(n_slice) carries only).

    Returns
    -------
    (B, Y, X) complex64 exit (or detector-plane) wavefield.
    """
    grid_delta = jnp.asarray(grid_delta, jnp.float32)
    grid_beta = jnp.asarray(grid_beta, jnp.float32)
    probe = jnp.asarray(probe)
    if probe.ndim == 2:
        probe = probe[None]
    dim_y, dim_x = grid_delta.shape[1:3]
    voxel_nm = np.array([psize_cm] * 3) * 1.0e7
    lmbda_nm = 1240.0 / energy_ev
    if h is None:
        h = get_kernel(voxel_nm[-1], lmbda_nm, voxel_nm, (dim_y, dim_x))
    h_if = jnp.asarray(ifftshift2(np.asarray(h)))
    if isinstance(free_prop_cm, (np.floating, np.integer)):
        free_prop_cm = float(free_prop_cm)
    return _multislice_core(grid_delta, grid_beta, probe, h_if,
                            float(energy_ev), float(psize_cm), free_prop_cm,
                            bool(propagate_last), bool(remat), free_prop_algorithm)


def multislice_propagate_fd(grid_delta, grid_beta, probe, energy_ev, psize_cm,
                            free_prop_cm=None, remat=True,
                            free_prop_algorithm="TF", pad_mode="background"):
    """Finite-difference beam-propagation-method multislice variant.

    Per slice (ref tensorflow_recon/util.py:511-579):
      n = 1 - delta - i beta
      lap = conv(psi, [[0,-1,0],[-1,4,-1],[0,-1,0]]) / (dy*dx)   (pad with 1)
      dpsi/dz = lap / (2 i k n) - i k (n - 1) psi
      psi += dpsi/dz * dz
    The 5-point stencil is expressed with shifted adds (VPU-friendly; no conv
    op needed) and pads with the unit background field like the reference.
    """
    grid_delta = jnp.asarray(grid_delta, jnp.float32)
    grid_beta = jnp.asarray(grid_beta, jnp.float32)
    probe = jnp.asarray(probe)
    if probe.ndim == 2:
        probe = probe[None]
    batch, dim_y, dim_x, n_slice = grid_delta.shape
    voxel_nm = np.array([psize_cm] * 3) * 1.0e7
    lmbda_nm = 1240.0 / energy_ev
    delta_nm = voxel_nm[-1]
    size_nm = np.array([dim_y, dim_x, n_slice]) * voxel_nm
    k = np.complex64(2.0 * PI * delta_nm / lmbda_nm)
    inv_area = np.float32(1.0 / (voxel_nm[0] * voxel_nm[1]))

    wavefront = jnp.broadcast_to(probe.astype(jnp.complex64), (batch, dim_y, dim_x))
    delta_z = jnp.moveaxis(grid_delta, -1, 0)
    beta_z = jnp.moveaxis(grid_beta, -1, 0)

    def laplacian(w):
        # 'background' pads with the unit plane-wave background like the
        # reference (ref util.py:549) — only valid when the field at the
        # patch boundary IS the background. 'edge' replicates the boundary
        # row (zero normal gradient): the sane BPM boundary for localized
        # probes (a gaussian ptycho probe is ~0 at the edge; padding 1.0
        # injects a spurious source that floods the window over hundreds
        # of slices — found at the cone_ptycho_fd workload).
        if pad_mode == "edge":
            wp = jnp.pad(w, ((0, 0), (1, 1), (1, 1)), mode="edge")
        else:
            wp = jnp.pad(w, ((0, 0), (1, 1), (1, 1)),
                         constant_values=1.0 + 0.0j)
        return (4.0 * wp[:, 1:-1, 1:-1]
                - wp[:, :-2, 1:-1] - wp[:, 2:, 1:-1]
                - wp[:, 1:-1, :-2] - wp[:, 1:-1, 2:]) * inv_area

    def step(w, slices):
        d, b = slices
        n = 1.0 - d.astype(jnp.complex64) - 1j * b.astype(jnp.complex64)
        dudz = laplacian(w) / (2j * k * n) - 1j * k * (n - 1.0) * w
        return w + dudz * delta_nm, None

    if remat:
        step = jax.checkpoint(step)
    wavefront, _ = jax.lax.scan(step, wavefront, (delta_z, beta_z))

    if free_prop_cm is not None:
        wavefront = _free_space_final(wavefront, free_prop_cm, lmbda_nm, voxel_nm,
                                      (dim_y, dim_x), size_nm, free_prop_algorithm)
    return wavefront


def multislice_propagate_fd_split(grid_delta, grid_beta, probe_re, probe_im,
                                  energy_ev, psize_cm, free_prop_cm=None,
                                  remat=True, free_prop_algorithm="TF",
                                  pad_mode="background"):
    """Split-complex twin of :func:`multislice_propagate_fd`.

    Complex-dtype-free for TPU runtimes that reject complex64 (the complex
    FD stencil lowers to UNIMPLEMENTED there). Same math and the same
    reference conventions (k = 2*pi*dz/lmbda and a further *dz on dudz,
    ref tensorflow_recon/util.py:538-556). Returns ``(re, im)``.
    """
    grid_delta = jnp.asarray(grid_delta, jnp.float32)
    grid_beta = jnp.asarray(grid_beta, jnp.float32)
    batch, dim_y, dim_x, n_slice = grid_delta.shape
    voxel_nm = np.array([psize_cm] * 3) * 1.0e7
    lmbda_nm = 1240.0 / energy_ev
    delta_nm = np.float32(voxel_nm[-1])
    size_nm = np.array([dim_y, dim_x, n_slice]) * voxel_nm
    k = np.float32(2.0 * PI * voxel_nm[-1] / lmbda_nm)
    inv_area = np.float32(1.0 / (voxel_nm[0] * voxel_nm[1]))

    w_re = jnp.broadcast_to(jnp.asarray(probe_re, jnp.float32),
                            (batch, dim_y, dim_x))
    w_im = jnp.broadcast_to(jnp.asarray(probe_im, jnp.float32),
                            (batch, dim_y, dim_x))
    delta_z = jnp.moveaxis(grid_delta, -1, 0)
    beta_z = jnp.moveaxis(grid_beta, -1, 0)

    def lap(w, bg):
        # see the complex twin for the 'background' vs 'edge' boundary note
        if pad_mode == "edge":
            wp = jnp.pad(w, ((0, 0), (1, 1), (1, 1)), mode="edge")
        else:
            wp = jnp.pad(w, ((0, 0), (1, 1), (1, 1)), constant_values=bg)
        return (4.0 * wp[:, 1:-1, 1:-1]
                - wp[:, :-2, 1:-1] - wp[:, 2:, 1:-1]
                - wp[:, 1:-1, :-2] - wp[:, 1:-1, 2:]) * inv_area

    def step(carry, slices):
        wr, wi = carry
        d, b = slices
        # background field is 1 + 0i, matching the reference's pad value
        lr = lap(wr, 1.0)
        li = lap(wi, 0.0)
        # 1/(2ik n) with n = 1 - d - i b:  2ik n = 2k (b + i(1-d))
        #   => 1/(2ik n) = (b - i(1-d)) / (2k (b^2 + (1-d)^2))
        one_md = 1.0 - d
        denom = 2.0 * k * (b * b + one_md * one_md)
        t1r = (lr * b + li * one_md) / denom
        t1i = (li * b - lr * one_md) / denom
        # -ik(n-1)w = k(i d - b) w
        t2r = k * (-d * wi - b * wr)
        t2i = k * (d * wr - b * wi)
        return (wr + (t1r + t2r) * delta_nm,
                wi + (t1i + t2i) * delta_nm), None

    if remat:
        step = jax.checkpoint(step)
    (w_re, w_im), _ = jax.lax.scan(step, (w_re, w_im), (delta_z, beta_z))

    if free_prop_cm is not None:
        from .splitfft import cfft2_split, apply_kernel_split_perm
        from .splitfft import permute_kernel_2d
        if isinstance(free_prop_cm, str) and free_prop_cm == "inf":
            w_re, w_im = cfft2_split(w_re, w_im)
            w_re = jnp.fft.fftshift(w_re, axes=(-2, -1))
            w_im = jnp.fft.fftshift(w_im, axes=(-2, -1))
        else:
            h2 = _final_kernel(free_prop_cm * 1e7, lmbda_nm, voxel_nm,
                               (dim_y, dim_x), size_nm, free_prop_algorithm)
            h2_ifp = permute_kernel_2d(ifftshift2(np.asarray(h2)))
            w_re, w_im = apply_kernel_split_perm(
                w_re, w_im,
                jnp.asarray(np.real(h2_ifp).astype(np.float32)),
                jnp.asarray(np.imag(h2_ifp).astype(np.float32)))
    return w_re, w_im


def multislice_propagate_projection(grid_delta, grid_beta, probe, energy_ev,
                                    psize_cm, s_r_cm, free_prop_cm=None):
    """Cone-beam 'projection' multislice via Fresnel scaling.

    Per slice: modulate, paraxial free-space step at the current
    source-to-slice radius, then magnification resampling back onto the
    fixed grid (ref tensorflow_recon/util.py:439-508, type='projection').
    Python loop (kernel changes per slice); suitable for moderate n_slice.
    """
    from .image import rescale_image

    grid_delta = jnp.asarray(grid_delta, jnp.float32)
    grid_beta = jnp.asarray(grid_beta, jnp.float32)
    batch, dim_y, dim_x, n_slice = grid_delta.shape
    voxel_nm = np.array([psize_cm] * 3) * 1.0e7
    lmbda_nm = 1240.0 / energy_ev
    k = np.float32(2.0 * PI * voxel_nm[-1] / lmbda_nm)

    probe = jnp.asarray(probe)
    if probe.ndim == 2:
        probe = probe[None]
    wavefront = jnp.broadcast_to(probe.astype(jnp.complex64),
                                 (batch, dim_y, dim_x))
    for i in range(n_slice):
        wavefront = modulate(wavefront, grid_delta[..., i], grid_beta[..., i], k)
        wavefront, m = free_propagate_paraxial(
            wavefront, psize_cm, s_r_cm + psize_cm * i, lmbda_nm, psize_cm)
        wavefront = rescale_image(wavefront, m, (batch, dim_y, dim_x))

    if free_prop_cm is not None:
        if isinstance(free_prop_cm, str) and free_prop_cm == "inf":
            wavefront = jnp.fft.fftshift(jnp.fft.fft2(wavefront), axes=(-2, -1))
        else:
            wavefront, m = free_propagate_paraxial(
                wavefront, free_prop_cm, s_r_cm + psize_cm * n_slice,
                lmbda_nm, psize_cm)
    return wavefront


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(6,))
def _multislice_split_invertible(delta_z, beta_z, w_re, w_im, hr, hi, k):
    """Split multislice scan with an O(1)-memory invertible backward pass.

    The per-slice Fresnel step is UNITARY (|H| = 1), so the backward pass
    reconstructs each intermediate wavefield by running the physics in
    reverse (P^-1 = adjoint = same transform with conj(H); the modulation
    inverts analytically) instead of storing per-slice activations — the
    invertible-network trick of memory-efficient computational imaging
    (Kellman et al., NeurIPS deep-inverse 2019; PAPERS.md). Activation
    memory drops from O(n_slice) carries to O(1).

    Args are (Z, B, Y, X) slices, split probe, PERMUTED split kernel, and k.
    """
    from .splitfft import cexp_modulation, cmul, apply_kernel_split_perm

    def step(carry, slices):
        re, im = carry
        d, b = slices
        cr, ci = cexp_modulation(d, b, k)
        re, im = cmul(re, im, cr, ci)
        re, im = apply_kernel_split_perm(re, im, hr, hi)
        return (re, im), None

    (w_re, w_im), _ = jax.lax.scan(step, (w_re, w_im), (delta_z, beta_z))
    return w_re, w_im


def _msi_fwd(delta_z, beta_z, w_re, w_im, hr, hi, k):
    out = _multislice_split_invertible(delta_z, beta_z, w_re, w_im, hr, hi, k)
    return out, (delta_z, beta_z, out[0], out[1], hr, hi)


def _msi_bwd(k, res, cot):
    from .splitfft import cexp_modulation, apply_kernel_split_perm
    delta_z, beta_z, w_re, w_im, hr, hi = res
    g_re, g_im = cot
    nhi = -hi  # conj kernel: P^-1 == P-adjoint (unitary step)

    def back(carry, slices):
        w_re, w_im, g_re, g_im = carry
        d, b = slices
        cr, ci = cexp_modulation(d, b, k)
        # reconstruct the modulated field m_i = P^-1(w_{i+1})
        m_re, m_im = apply_kernel_split_perm(w_re, w_im, hr, nhi)
        # cotangent at m: real-adjoint of the unitary step = same transform
        gm_re, gm_im = apply_kernel_split_perm(g_re, g_im, hr, nhi)
        # reconstruct w_i = m * conj(c) / |c|^2
        inv = 1.0 / (cr * cr + ci * ci)
        wp_re = (m_re * cr + m_im * ci) * inv
        wp_im = (m_im * cr - m_re * ci) * inv
        # slice gradients: gc = conj(w_i) * gm;  c = e^{-kb}(cos kd, sin kd)
        gc_re = gm_re * wp_re + gm_im * wp_im
        gc_im = -gm_re * wp_im + gm_im * wp_re
        gd = k * (gc_im * cr - gc_re * ci)
        gb = -k * (gc_re * cr + gc_im * ci)
        # cotangent at w_i: conj(c) * gm
        gw_re = gm_re * cr + gm_im * ci
        gw_im = -gm_re * ci + gm_im * cr
        return (wp_re, wp_im, gw_re, gw_im), (gd, gb)

    (w0_re, w0_im, g0_re, g0_im), (gd_z, gb_z) = jax.lax.scan(
        back, (w_re, w_im, g_re, g_im), (delta_z, beta_z), reverse=True)
    return gd_z, gb_z, g0_re, g0_im, None, None


_multislice_split_invertible.defvjp(_msi_fwd, _msi_bwd)


def build_split_kernel(dim_y, dim_x, energy_ev, psize_cm, base=None):
    """Pre-permuted split Fresnel kernel ``(hr, hi)`` as device arrays.

    Builds the slice kernel exactly as :func:`multislice_propagate_batch_split`
    would (float64 host build, ifftshift + DIF permutation folded in), but
    EAGERLY — callers that trace the propagation under ``jit`` can pass the
    result through ``h_split=`` as runtime arguments instead of having the
    (Y, X) tables embedded as trace-time constants. At 8192^2 the embedded
    constants alone are 2 x 256 MB of compile payload, which overflows
    remote-compile transports; as arguments they are a one-time upload.
    """
    from .splitfft import permute_kernel_2d

    voxel_nm = np.array([psize_cm] * 3) * 1.0e7
    lmbda_nm = 1240.0 / energy_ev
    h = get_kernel(voxel_nm[-1], lmbda_nm, voxel_nm, (dim_y, dim_x))
    h_p = permute_kernel_2d(ifftshift2(np.asarray(h)), base=base)
    return (jnp.asarray(np.real(h_p).astype(np.float32)),
            jnp.asarray(np.imag(h_p).astype(np.float32)))


def blocked_block_sizes(dim_y, dim_x):
    """Panel sizes (py, qx) for the blocked two-pass Pallas pipeline.

    ``py`` is the X-pass row-panel height — the SUBLANE dim of its
    (py, dim_x) blocks, so Mosaic only needs a multiple of 8. The
    backward X-pass streams 12 double-buffered py x dim_x row windows;
    at 8192^2 with py=128 that alone is 96 MB of the 128 MB VMEM
    (measured compile OOM), so py drops to 64 for >= 8192 planes.

    ``qx`` is the Y-pass column-panel width — the LANE dim of its
    (dim_y, qx) blocks, which Mosaic requires to be a multiple of 128
    (or the full dim). It therefore NEVER shrinks below 128: the r5
    regression where BDT_BLOCKED_BLOCK=64 set both panels killed every
    >= 2048^2 grad compile with a Mosaic block-shape error. The env
    override applies to py alone.
    """
    py = 64 if dim_y >= 8192 else 128
    env = os.environ.get("BDT_BLOCKED_BLOCK")
    if env:
        py = int(env)
    py = min(py, dim_y)
    if py % 8 or dim_y % py:
        raise ValueError(
            "blocked-kernel row panel py=%d must be a multiple of 8 "
            "dividing dim_y=%d (BDT_BLOCKED_BLOCK?)" % (py, dim_y))
    qx = 128 if dim_x % 128 == 0 else dim_x
    return py, qx


def multislice_propagate_batch_split(grid_delta, grid_beta, probe_re, probe_im,
                                     energy_ev, psize_cm, h=None,
                                     free_prop_cm=None, propagate_last=True,
                                     remat=True, grids_zfirst=False,
                                     use_pallas=None,
                                     free_prop_algorithm="TF",
                                     h_split=None):
    """Split-complex multislice: identical physics, no complex dtypes.

    For TPU backends without complex64 support (SURVEY §7 hard part; the
    reference's own split-real trick is ref cnn_propagator/
    propagation_tf.py:83-105). The wavefield is carried as (re, im) float32
    and the per-slice Fresnel step runs through the MXU matmul-DFT of
    :mod:`.splitfft`. Returns ``(re, im)`` of shape (B, Y, X).

    With ``remat='invertible'`` on eligible shapes (square power-of-two
    planes) the whole sweep — forward and backward — runs as single fused
    Pallas kernels with the field resident in VMEM (``use_pallas=None``
    auto-enables this on TPU backends; pass True/False to force).
    """
    from .splitfft import (cfft2_split, cexp_modulation, cmul,
                           apply_kernel_split_perm, permute_kernel_2d)

    grid_delta = jnp.asarray(grid_delta, jnp.float32)
    grid_beta = jnp.asarray(grid_beta, jnp.float32)
    if grids_zfirst:
        # grids supplied as (Z, B, Y, X): skips the on-device transpose copy,
        # which doubles HBM use at 1024^3 scale
        n_slice, batch, dim_y, dim_x = grid_delta.shape
    else:
        batch, dim_y, dim_x, n_slice = grid_delta.shape
    voxel_nm = np.array([psize_cm] * 3) * 1.0e7
    lmbda_nm = 1240.0 / energy_ev
    delta_nm = voxel_nm[-1]
    size_nm = np.array([dim_y, dim_x, n_slice]) * voxel_nm
    k = np.float32(2.0 * PI * delta_nm / lmbda_nm)

    if h_split is not None:
        # pre-permuted split kernel supplied as runtime arrays (see
        # build_split_kernel): nothing is embedded in the traced program
        hr = jnp.asarray(h_split[0], jnp.float32)
        hi = jnp.asarray(h_split[1], jnp.float32)
    else:
        if h is None:
            h = get_kernel(delta_nm, lmbda_nm, voxel_nm, (dim_y, dim_x))
        # pre-permute the kernel into the DIF transform's frequency order:
        # the hot loop then runs the radix-reduced permuted-order transform
        # pair with zero on-device reordering
        h_ifp = permute_kernel_2d(ifftshift2(np.asarray(h)))
        hr = jnp.asarray(np.real(h_ifp).astype(np.float32))
        hi = jnp.asarray(np.imag(h_ifp).astype(np.float32))

    w_re = jnp.broadcast_to(jnp.asarray(probe_re, jnp.float32),
                            (batch, dim_y, dim_x))
    w_im = jnp.broadcast_to(jnp.asarray(probe_im, jnp.float32),
                            (batch, dim_y, dim_x))
    if grids_zfirst:
        delta_z, beta_z = grid_delta, grid_beta
    else:
        delta_z = jnp.moveaxis(grid_delta, -1, 0)
        beta_z = jnp.moveaxis(grid_beta, -1, 0)

    def step_prop(carry, slices):
        re, im = carry
        d, b = slices
        cr, ci = cexp_modulation(d, b, k)
        re, im = cmul(re, im, cr, ci)
        re, im = apply_kernel_split_perm(re, im, hr, hi)
        return (re, im), None

    def modulate_only(carry, d, b):
        re, im = carry
        cr, ci = cexp_modulation(d, b, k)
        return cmul(re, im, cr, ci)

    invertible = remat == "invertible"
    if remat and not invertible:
        step_prop = jax.checkpoint(step_prop)

    if invertible:
        # O(1)-activation backward: the unitary slice steps are run in
        # reverse in the VJP instead of storing carries. On TPU with
        # eligible plane shapes, both sweeps run as single fused Pallas
        # kernels (field resident in VMEM across all slices); planes too
        # big for VMEM residency (>= 2048^2) run the blocked two-pass
        # Pallas pipeline, whose backward is the same invertible sweep in
        # panel-streamed form.
        from .pallas_kernels import (multislice_pallas_invertible,
                                     multislice_pallas_blocked_invertible,
                                     pallas_shape_ok, _on_tpu)
        eligible = pallas_shape_ok(dim_y, dim_x)
        if use_pallas is None:
            # measured on v5e-1 (libtpu cl/831091709): the fused kernel
            # wins at every eligible size <= 1024^2 — 512^2 fwd 30.1k vs
            # 19.9k XLA split; 1024^2 fwd 6.8k vs 5.4k (HIGHEST) and
            # 10.1k vs 7.7k (bf16x3) — round 2's 11.3k XLA row that
            # motivated a 512 cap here was retired as irreproducible and
            # roofline-impossible (BASELINE.md MFU table). >= 2048^2 the
            # VMEM-resident field alone is 33.5+ MB, so those planes
            # route to the blocked two-pass kernel (4096^2 fwd: 268
            # slices/s vs XLA's 98, benchmarks/scale_2048.json).
            if eligible and _on_tpu():
                use_pallas = True if dim_y <= 1024 else "blocked"
            else:
                use_pallas = False
        elif use_pallas and not eligible:
            raise ValueError("use_pallas needs square power-of-two planes; "
                             "got (%d, %d)" % (dim_y, dim_x))
        if use_pallas == "blocked":
            interp = not _on_tpu()
            py, qx = blocked_block_sizes(dim_y, dim_x)

            def sweep(dz, bz, wr_, wi_):
                # the blocked kernel is single-volume (Z, Y, X); batch
                # items run sequentially (lax.map) — at these plane sizes
                # minibatches are ~1 and the per-volume sweep already
                # saturates the chip
                def one(dzi, bzi, wri, wii):
                    return multislice_pallas_blocked_invertible(
                        dzi, bzi, wri, wii, hr, hi, float(k), interp,
                        py, qx)
                if dz.shape[1] == 1:
                    r, i = one(dz[:, 0], bz[:, 0], wr_[0], wi_[0])
                    return r[None], i[None]
                dzb = jnp.moveaxis(dz, 1, 0)
                bzb = jnp.moveaxis(bz, 1, 0)
                return jax.lax.map(lambda t: one(*t),
                                   (dzb, bzb, wr_, wi_))
        elif use_pallas:
            interp = not _on_tpu()

            def sweep(dz, bz, wr_, wi_):
                return multislice_pallas_invertible(
                    dz, bz, wr_, wi_, hr, hi, float(k), interp)
        else:
            def sweep(dz, bz, wr_, wi_):
                return _multislice_split_invertible(dz, bz, wr_, wi_,
                                                    hr, hi, k)

    if n_slice == 1:
        w_re, w_im = modulate_only((w_re, w_im), delta_z[0], beta_z[0])
    elif invertible:
        if propagate_last:
            w_re, w_im = sweep(delta_z, beta_z, w_re, w_im)
        else:
            w_re, w_im = sweep(delta_z[:-1], beta_z[:-1], w_re, w_im)
            w_re, w_im = modulate_only((w_re, w_im), delta_z[-1], beta_z[-1])
    elif propagate_last:
        (w_re, w_im), _ = jax.lax.scan(step_prop, (w_re, w_im),
                                       (delta_z, beta_z))
    else:
        (w_re, w_im), _ = jax.lax.scan(step_prop, (w_re, w_im),
                                       (delta_z[:-1], beta_z[:-1]))
        w_re, w_im = modulate_only((w_re, w_im), delta_z[-1], beta_z[-1])

    if free_prop_cm is not None:
        if isinstance(free_prop_cm, str) and free_prop_cm == "inf":
            w_re, w_im = cfft2_split(w_re, w_im)
            w_re = jnp.fft.fftshift(w_re, axes=(-2, -1))
            w_im = jnp.fft.fftshift(w_im, axes=(-2, -1))
        else:
            h2 = _final_kernel(free_prop_cm * 1e7, lmbda_nm, voxel_nm,
                               (dim_y, dim_x), size_nm, free_prop_algorithm)
            h2_ifp = permute_kernel_2d(ifftshift2(np.asarray(h2)))
            w_re, w_im = apply_kernel_split_perm(
                w_re, w_im,
                jnp.asarray(np.real(h2_ifp).astype(np.float32)),
                jnp.asarray(np.imag(h2_ifp).astype(np.float32)))
    return w_re, w_im


def free_propagate_paraxial(wavefront, dist_cm, r_cm, lmbda_nm, psize_cm, h=None):
    """Fresnel-scaling (magnification) free-space step for cone beams.

    Propagates by the effective distance ``dist/m`` with magnification
    ``m = (dist + r)/r`` (ref tensorflow_recon/util.py:347-357).
    Returns ``(wavefront, m)``.
    """
    m = (dist_cm + r_cm) / r_cm
    dist_nm = dist_cm * 1.0e7
    dist_eff_nm = dist_nm / m
    psize_nm = psize_cm * 1.0e7
    if h is None:
        h = get_kernel(dist_eff_nm, lmbda_nm, [psize_nm, psize_nm], wavefront.shape[-2:])
    h_if = jnp.asarray(ifftshift2(np.asarray(h)))
    return jnp.fft.ifft2(jnp.fft.fft2(wavefront) * h_if), m
