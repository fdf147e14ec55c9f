"""Pallas TPU kernels for the multislice hot loop.

The flagship kernel fuses the ENTIRE multislice propagation — per-slice
refractive modulation, forward 2-D DFT, transfer-function multiply, inverse
2-D DFT — into one ``pallas_call`` whose grid sweeps the slice axis. The
wavefield lives in VMEM scratch for the whole propagation (TPU grid steps
run sequentially on a core and scratch persists across them), so HBM traffic
collapses to streaming the (delta, beta) slices in: the XLA scan emits
~9 HBM round trips per slice (modulated field + 8 matmul intermediates),
this kernel emits one.

Everything is split-complex float32 (works on TPU runtimes with no complex
support) and every DFT is a Karatsuba 3-matmul on the MXU. DFT matrices are
symmetric, so the column transform is a plain left-multiply with the same
matrices.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import PI
from .fresnel import get_kernel, ifftshift2
from .splitfft import dft_mats

__all__ = ["multislice_pallas_split"]

_PREC = jax.lax.Precision.HIGHEST


def _kar_right(re, im, wr, wi, ws):
    """(re + i im) @ (wr + i wi) via 3 matmuls; ws = wr + wi."""
    t1 = jnp.dot(re, wr, precision=_PREC, preferred_element_type=jnp.float32)
    t2 = jnp.dot(im, wi, precision=_PREC, preferred_element_type=jnp.float32)
    t3 = jnp.dot(re + im, ws, precision=_PREC,
                 preferred_element_type=jnp.float32)
    return t1 - t2, t3 - t1 - t2


def _kar_left(re, im, wr, wi, ws):
    """(wr + i wi) applied along axis -2 via 3 matmuls (DFT mats symmetric).

    Batch-generic: works on (Y, X) and (B, Y, X) operands.
    """
    def lmul(m, a):
        return jnp.einsum("ij,...jx->...ix", m, a, precision=_PREC,
                          preferred_element_type=jnp.float32)
    t1 = lmul(wr, re)
    t2 = lmul(wi, im)
    t3 = lmul(ws, re + im)
    return t1 - t2, t3 - t1 - t2


def _fft2_vmem(re, im, wry, wiy, wsy, wrx, wix, wsx):
    re, im = _kar_right(re, im, wrx, wix, wsx)   # DFT along X (last axis)
    re, im = _kar_left(re, im, wry, wiy, wsy)    # DFT along Y (left mult)
    return re, im


# ---------------------------------------------------------------------------
# Radix-2 DIF variant: contiguous-half butterflies down to the dense base
# matmuls, frequency order permuted (cancelled by a pre-permuted kernel) —
# the in-VMEM port of ops.splitfft's radix path.
# ---------------------------------------------------------------------------

def _dif_last(re, im, wr, wi, ws, twr, twi):
    """DIF along the last axis; one level if size == 2 * base."""
    n = re.shape[-1]
    base = wr.shape[0]
    if n == base:
        return _kar_right(re, im, wr, wi, ws)
    h = n // 2
    ar, ai = re[..., :h], im[..., :h]
    br, bi = re[..., h:], im[..., h:]
    sr, si = ar + br, ai + bi
    dr, di = ar - br, ai - bi
    tr = dr * twr - di * twi
    ti = dr * twi + di * twr
    er, ei = _dif_last(sr, si, wr, wi, ws, twr, twi)
    orr, oi = _dif_last(tr, ti, wr, wi, ws, twr, twi)
    return (jnp.concatenate([er, orr], axis=-1),
            jnp.concatenate([ei, oi], axis=-1))


def _dif_first(re, im, wr, wi, ws, twr, twi):
    """DIF along axis -2 (left-multiplies; twiddle as a column). Batch-generic."""
    n = re.shape[-2]
    base = wr.shape[0]
    if n == base:
        return _kar_left(re, im, wr, wi, ws)
    h = n // 2
    ar, ai = re[..., :h, :], im[..., :h, :]
    br, bi = re[..., h:, :], im[..., h:, :]
    sr, si = ar + br, ai + bi
    dr, di = ar - br, ai - bi
    tc_r = twr.reshape(-1, 1)
    tc_i = twi.reshape(-1, 1)
    tr = dr * tc_r - di * tc_i
    ti = dr * tc_i + di * tc_r
    er, ei = _dif_first(sr, si, wr, wi, ws, twr, twi)
    orr, oi = _dif_first(tr, ti, wr, wi, ws, twr, twi)
    return (jnp.concatenate([er, orr], axis=-2),
            jnp.concatenate([ei, oi], axis=-2))


def _idit_last(re, im, iwr, iwi, iws, twr, twi):
    """Inverse of _dif_last; iw* are the inverse-base matmuls (1/base folded)."""
    n = re.shape[-1]
    base = iwr.shape[0]
    if n == base:
        return _kar_right(re, im, iwr, iwi, iws)
    h = n // 2
    sr, si = _idit_last(re[..., :h], im[..., :h], iwr, iwi, iws, twr, twi)
    tr, ti = _idit_last(re[..., h:], im[..., h:], iwr, iwi, iws, twr, twi)
    # conj twiddle
    dr = tr * twr + ti * twi
    di = -tr * twi + ti * twr
    return (jnp.concatenate([(sr + dr) * 0.5, (sr - dr) * 0.5], axis=-1),
            jnp.concatenate([(si + di) * 0.5, (si - di) * 0.5], axis=-1))


def _idit_first(re, im, iwr, iwi, iws, twr, twi):
    n = re.shape[-2]
    base = iwr.shape[0]
    if n == base:
        return _kar_left(re, im, iwr, iwi, iws)
    h = n // 2
    sr, si = _idit_first(re[..., :h, :], im[..., :h, :], iwr, iwi, iws, twr, twi)
    tr, ti = _idit_first(re[..., h:, :], im[..., h:, :], iwr, iwi, iws, twr, twi)
    tc_r = twr.reshape(-1, 1)
    tc_i = twi.reshape(-1, 1)
    dr = tr * tc_r + ti * tc_i
    di = -tr * tc_i + ti * tc_r
    return (jnp.concatenate([(sr + dr) * 0.5, (sr - dr) * 0.5], axis=-2),
            jnp.concatenate([(si + di) * 0.5, (si - di) * 0.5], axis=-2))


def _make_kernel(n_slice, inv_scale, k):
    def kernel(delta_ref, beta_ref, probe_re_ref, probe_im_ref,
               hr_ref, hi_ref, wry_ref, wiy_ref, wsy_ref,
               wrx_ref, wix_ref, wsx_ref,
               out_re_ref, out_im_ref, fre, fim):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            fre[:] = probe_re_ref[:]
            fim[:] = probe_im_ref[:]

        # ---- refractive modulation: f *= exp(i k delta - k beta) ----------
        d = delta_ref[0]
        b = beta_ref[0]
        amp = jnp.exp(-k * b)
        cr = amp * jnp.cos(k * d)
        ci = amp * jnp.sin(k * d)
        re = fre[:] * cr - fim[:] * ci
        im = fre[:] * ci + fim[:] * cr

        # ---- Fresnel step: ifft2(fft2(f) * H), all in VMEM ----------------
        re, im = _fft2_vmem(re, im, wry_ref[:], wiy_ref[:], wsy_ref[:],
                            wrx_ref[:], wix_ref[:], wsx_ref[:])
        hr = hr_ref[:]
        hi = hi_ref[:]
        re, im = (re * hr - im * hi, re * hi + im * hr)
        # inverse = conj(fft2(conj(.))) / (NY*NX)
        re, im = _fft2_vmem(re, -im, wry_ref[:], wiy_ref[:], wsy_ref[:],
                            wrx_ref[:], wix_ref[:], wsx_ref[:])
        fre[:] = re * inv_scale
        fim[:] = -im * inv_scale

        @pl.when(i == n_slice - 1)
        def _():
            out_re_ref[:] = fre[:]
            out_im_ref[:] = fim[:]

    return kernel


def _make_kernel_radix(n_slice, k, base):
    """Fused slice-step kernel with one radix-2 DIF level per axis.

    Inputs: base-size dense forward mats (wr, wi, ws), inverse mats
    (iwr, iwi, iws — 1/base folded in), twiddles (1, base), and the
    frequency-PERMUTED Fresnel kernel (see splitfft.permute_kernel_2d).
    Square (N, N) planes with N == base or N == 2*base.
    """
    def kernel(delta_ref, beta_ref, probe_re_ref, probe_im_ref,
               hr_ref, hi_ref, wr_ref, wi_ref, ws_ref,
               iwr_ref, iwi_ref, iws_ref, twr_ref, twi_ref,
               out_re_ref, out_im_ref, fre, fim):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            fre[:] = probe_re_ref[:]
            fim[:] = probe_im_ref[:]

        d = delta_ref[0]
        b = beta_ref[0]
        amp = jnp.exp(-k * b)
        cr = amp * jnp.cos(k * d)
        ci = amp * jnp.sin(k * d)
        re = fre[:] * cr - fim[:] * ci
        im = fre[:] * ci + fim[:] * cr

        wr, wi, ws = wr_ref[:], wi_ref[:], ws_ref[:]
        iwr, iwi, iws = iwr_ref[:], iwi_ref[:], iws_ref[:]
        twr = twr_ref[0]
        twi = twi_ref[0]

        # forward (permuted order) both axes
        re, im = _dif_last(re, im, wr, wi, ws, twr, twi)
        re, im = _dif_first(re, im, wr, wi, ws, twr, twi)
        # permuted-kernel multiply
        hr = hr_ref[:]
        hi = hi_ref[:]
        re, im = (re * hr - im * hi, re * hi + im * hr)
        # inverse (consumes permuted order, emits natural)
        re, im = _idit_first(re, im, iwr, iwi, iws, twr, twi)
        re, im = _idit_last(re, im, iwr, iwi, iws, twr, twi)
        fre[:] = re
        fim[:] = im

        @pl.when(i == n_slice - 1)
        def _():
            out_re_ref[:] = fre[:]
            out_im_ref[:] = fim[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("energy_ev", "psize_cm",
                                             "interpret"))
def _run_radix(delta_zyx, beta_zyx, probe_re, probe_im, hr_p, hi_p,
               energy_ev, psize_cm, interpret):
    """Radix-DIF variant of :func:`_run` for square N in {128, 256}."""
    from .splitfft import _twiddles, _DFT_BASE
    n_slice, dim_y, dim_x = delta_zyx.shape
    n = dim_y
    base = min(n, _DFT_BASE)
    voxel_nm = psize_cm * 1e7
    lmbda_nm = 1240.0 / energy_ev
    k = np.float32(2.0 * PI * voxel_nm / lmbda_nm)

    wr, wi, ws = dft_mats(base)
    # inverse base transform: conj matrix / base
    iwr = (wr / base).astype(np.float32)
    iwi = (-wi / base).astype(np.float32)
    iws = (iwr + iwi).astype(np.float32)
    if n > base:
        twr, twi = _twiddles(n)
    else:
        twr = np.ones((base,), np.float32)
        twi = np.zeros((base,), np.float32)
    twr = twr.reshape(1, -1)
    twi = twi.reshape(1, -1)

    slice_spec = pl.BlockSpec((1, dim_y, dim_x), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    full2d = pl.BlockSpec((dim_y, dim_x), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((base, base), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    tw = pl.BlockSpec((1, twr.shape[1]), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)

    out_re, out_im = pl.pallas_call(
        _make_kernel_radix(n_slice, k, base),
        grid=(n_slice,),
        in_specs=[slice_spec, slice_spec, full2d, full2d, full2d, full2d,
                  mat, mat, mat, mat, mat, mat, tw, tw],
        out_specs=(full2d, full2d),
        out_shape=(jax.ShapeDtypeStruct((dim_y, dim_x), jnp.float32),
                   jax.ShapeDtypeStruct((dim_y, dim_x), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((dim_y, dim_x), jnp.float32),
                        pltpu.VMEM((dim_y, dim_x), jnp.float32)],
        interpret=interpret,
    )(delta_zyx, beta_zyx, probe_re, probe_im, hr_p, hi_p,
      jnp.asarray(wr), jnp.asarray(wi), jnp.asarray(ws),
      jnp.asarray(iwr), jnp.asarray(iwi), jnp.asarray(iws),
      jnp.asarray(twr), jnp.asarray(twi))
    return out_re, out_im


@functools.partial(jax.jit, static_argnames=("energy_ev", "psize_cm",
                                             "interpret"))
def _run(delta_zyx, beta_zyx, probe_re, probe_im, hr, hi,
         energy_ev, psize_cm, interpret):
    n_slice, dim_y, dim_x = delta_zyx.shape
    voxel_nm = psize_cm * 1e7
    lmbda_nm = 1240.0 / energy_ev
    k = np.float32(2.0 * PI * voxel_nm / lmbda_nm)
    inv_scale = np.float32(1.0 / (dim_y * dim_x))

    wry, wiy, wsy = (jnp.asarray(m) for m in dft_mats(dim_y))
    wrx, wix, wsx = (jnp.asarray(m) for m in dft_mats(dim_x))

    slice_spec = pl.BlockSpec((1, dim_y, dim_x), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    full2d = pl.BlockSpec((dim_y, dim_x), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    maty = pl.BlockSpec((dim_y, dim_y), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    matx = pl.BlockSpec((dim_x, dim_x), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)

    out_re, out_im = pl.pallas_call(
        _make_kernel(n_slice, inv_scale, k),
        grid=(n_slice,),
        in_specs=[slice_spec, slice_spec, full2d, full2d, full2d, full2d,
                  maty, maty, maty, matx, matx, matx],
        out_specs=(full2d, full2d),
        out_shape=(jax.ShapeDtypeStruct((dim_y, dim_x), jnp.float32),
                   jax.ShapeDtypeStruct((dim_y, dim_x), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((dim_y, dim_x), jnp.float32),
                        pltpu.VMEM((dim_y, dim_x), jnp.float32)],
        interpret=interpret,
    )(delta_zyx, beta_zyx, probe_re, probe_im, hr, hi,
      wry, wiy, wsy, wrx, wix, wsx)
    return out_re, out_im


def multislice_pallas_split(grid_delta, grid_beta, probe_re, probe_im,
                            energy_ev, psize_cm, h=None, interpret=None,
                            radix=None):
    """Fused-Pallas multislice propagation of one (Y, X, Z) volume.

    Semantics match ``multislice_propagate_batch(..., propagate_last=True,
    free_prop_cm=None)`` for a single batch item, returning the split
    ``(re, im)`` exit wave of shape (Y, X). For batches, vmap is NOT used
    (the field scratch is per-core); call per item or extend the grid.

    ``interpret=None`` auto-selects interpreter mode off-TPU (tests).
    """
    grid_delta = jnp.asarray(grid_delta, jnp.float32)
    grid_beta = jnp.asarray(grid_beta, jnp.float32)
    dim_y, dim_x, n_slice = grid_delta.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu" and "axon" not in str(
            jax.devices()[0]).lower()
    voxel_nm = np.array([psize_cm] * 3) * 1e7
    lmbda_nm = 1240.0 / energy_ev
    if h is None:
        h = get_kernel(voxel_nm[-1], lmbda_nm, voxel_nm, (dim_y, dim_x))
    h_if = ifftshift2(np.asarray(h))
    delta_zyx = jnp.moveaxis(grid_delta, -1, 0)
    beta_zyx = jnp.moveaxis(grid_beta, -1, 0)
    probe_re = jnp.broadcast_to(jnp.asarray(probe_re, jnp.float32),
                                (dim_y, dim_x))
    probe_im = jnp.broadcast_to(jnp.asarray(probe_im, jnp.float32),
                                (dim_y, dim_x))
    from .splitfft import _DFT_BASE, permute_kernel_2d
    if radix is None:
        radix = dim_y == dim_x and dim_y in (_DFT_BASE, 2 * _DFT_BASE)
    if radix:
        h_p = permute_kernel_2d(h_if)
        hr = jnp.asarray(np.real(h_p).astype(np.float32))
        hi = jnp.asarray(np.imag(h_p).astype(np.float32))
        return _run_radix(delta_zyx, beta_zyx, probe_re, probe_im, hr, hi,
                          float(energy_ev), float(psize_cm), bool(interpret))
    hr = jnp.asarray(np.real(h_if).astype(np.float32))
    hi = jnp.asarray(np.imag(h_if).astype(np.float32))
    return _run(delta_zyx, beta_zyx, probe_re, probe_im, hr, hi,
                float(energy_ev), float(psize_cm), bool(interpret))
