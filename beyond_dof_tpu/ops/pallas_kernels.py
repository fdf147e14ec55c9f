"""Pallas TPU kernels for the multislice hot loop — forward AND backward.

The flagship kernel fuses the ENTIRE multislice propagation — per-slice
refractive modulation, forward 2-D DFT, transfer-function multiply, inverse
2-D DFT — into one ``pallas_call`` whose grid sweeps (batch, slice). The
wavefield lives in VMEM scratch for the whole propagation (TPU grid steps
run sequentially on a core and scratch persists across them), so HBM traffic
collapses to streaming the (delta, beta) slices in: the XLA scan emits
~9 HBM round trips per slice (modulated field + 8 matmul intermediates),
this kernel emits one.

Training runs the same way: :func:`multislice_pallas_invertible` is a
``jax.custom_vjp`` whose BACKWARD pass is also one fused Pallas kernel — the
per-slice Fresnel step is unitary (|H| = 1), so the reverse sweep
reconstructs each intermediate wavefield by running the physics backwards
(adjoint propagation + analytic inverse modulation) instead of storing
activations. O(1) activation memory, and the gradient sweep enjoys the same
VMEM-resident fusion as the forward (semantics identical to the XLA
invertible VJP in ``ops.multislice._msi_bwd``).

Everything is split-complex float32 (works on TPU runtimes with no complex
support) and every DFT bottoms out in a Karatsuba 3-matmul on the MXU. The
radix-2 DIF recursion (per-level twiddles precomputed on host, frequency
order folded into a pre-permuted kernel) cuts the matmul work from N^2 to
N*128 MACs per axis, for any N = 128 * 2^m (or a dense matmul for N <= 128).

Reference analogue: the hot loop this replaces is the TF while-loop
modulate/FFT/multiply/IFFT step (ref tensorflow_recon/util.py:465-483) and
its gradient graph.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import PI
from .fresnel import get_kernel, ifftshift2
from .splitfft import dft_mats, _twiddles, _DFT_BASE, permute_kernel_2d

__all__ = ["multislice_pallas_split", "multislice_pallas_invertible",
           "multislice_pallas_split_blocked",
           "multislice_pallas_blocked_invertible", "pallas_shape_ok"]

_PREC = jax.lax.Precision.HIGHEST


def set_kernel_precision(name):
    """Set the MXU precision of the in-kernel Karatsuba matmuls.

    Mirrors ``splitfft.set_precision`` (and the BDT_DFT_PRECISION env
    gate): 'HIGHEST' = 6 bf16 passes per f32 matmul, 'HIGH' = 3
    (error-compensated bf16x3), 'DEFAULT' = 1 (plain bf16).

    Mosaic only lowers HIGHEST f32 dots (it rejects ``precision=HIGH``,
    jax 0.9.0), so HIGH/DEFAULT are implemented MANUALLY inside the
    kernel: operands are split into hi/lo bfloat16 halves on the VPU and
    the product assembled from single-pass bf16 MXU dots —
    a@b ~= ah@bh + ah@bl + al@bh, the same bf16_3x algorithm XLA emits
    for HIGH, so the fused kernel keeps the identical accuracy model as
    the XLA split path at each setting.
    """
    global _PREC
    _PREC = (getattr(jax.lax.Precision, name.upper())
             if isinstance(name, str) else name)
    return _PREC


def _bf16_split(x):
    """hi/lo bfloat16 decomposition of an f32 array: x ~= hi + lo."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _mxu_dot(a, b):
    """a @ b on the MXU honoring _PREC (manual bf16x3/bf16x1 for HIGH/
    DEFAULT — Mosaic rejects those as dot precisions)."""
    if _PREC == jax.lax.Precision.HIGHEST:
        return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
    ah, al = _bf16_split(a)
    bh, bl = _bf16_split(b)
    if _PREC == jax.lax.Precision.HIGH:
        return d(ah, bh) + d(ah, bl) + d(al, bh)
    return d(ah, bh)


def _mxu_lmul(m, a):
    """einsum('ij,...jx->...ix', m, a) honoring _PREC like _mxu_dot."""
    e = lambda x, y: jnp.einsum("ij,...jx->...ix", x, y,
                                preferred_element_type=jnp.float32)
    if _PREC == jax.lax.Precision.HIGHEST:
        return jnp.einsum("ij,...jx->...ix", m, a,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
    mh, ml = _bf16_split(m)
    ah, al = _bf16_split(a)
    if _PREC == jax.lax.Precision.HIGH:
        return e(mh, ah) + e(mh, al) + e(ml, ah)
    return e(mh, ah)


_env_prec = __import__("os").environ.get("BDT_DFT_PRECISION")
if _env_prec:
    set_kernel_precision(_env_prec)
del _env_prec


def pallas_shape_ok(dim_y, dim_x, base=None):
    """True when (Y, X) planes are handled by the fused radix kernels:
    square, and either <= one MXU tile (dense base matmul) or a
    power-of-two multiple of the 128-point base."""
    if base is None:
        base = _DFT_BASE
    if dim_y != dim_x:
        return False
    n = dim_y
    if n <= base:
        return True
    m = n // base
    return n % base == 0 and (m & (m - 1)) == 0


def _on_tpu():
    return (jax.default_backend() == "tpu"
            or "axon" in str(jax.devices()[0]).lower())


# ---------------------------------------------------------------------------
# In-kernel split-complex DFT helpers (batch-generic, per-level twiddles)
# ---------------------------------------------------------------------------

def _kar_right(re, im, wr, wi, ws):
    """(re + i im) @ (wr + i wi) via 3 matmuls; ws = wr + wi."""
    t1 = _mxu_dot(re, wr)
    t2 = _mxu_dot(im, wi)
    t3 = _mxu_dot(re + im, ws)
    return t1 - t2, t3 - t1 - t2


def _kar_left(re, im, wr, wi, ws):
    """(wr + i wi) applied along axis -2 via 3 matmuls (DFT mats symmetric)."""
    t1 = _mxu_lmul(wr, re)
    t2 = _mxu_lmul(wi, im)
    t3 = _mxu_lmul(ws, re + im)
    return t1 - t2, t3 - t1 - t2


def _dif_last(re, im, wr, wi, ws, twr, twi, lvl=0):
    """Radix-2 DIF along the last axis, output in dif_perm order.

    ``twr/twi`` are (L, N/2) stacks; row ``lvl`` holds the twiddles of the
    current recursion size (entries [: size/2] valid).
    """
    n = re.shape[-1]
    base = wr.shape[0]
    if n == base:
        return _kar_right(re, im, wr, wi, ws)
    h = n // 2
    ar, ai = re[..., :h], im[..., :h]
    br, bi = re[..., h:], im[..., h:]
    sr, si = ar + br, ai + bi
    dr, di = ar - br, ai - bi
    cw, sw = twr[lvl, :h], twi[lvl, :h]
    tr = dr * cw - di * sw
    ti = dr * sw + di * cw
    er, ei = _dif_last(sr, si, wr, wi, ws, twr, twi, lvl + 1)
    orr, oi = _dif_last(tr, ti, wr, wi, ws, twr, twi, lvl + 1)
    return (jnp.concatenate([er, orr], axis=-1),
            jnp.concatenate([ei, oi], axis=-1))


def _dif_first(re, im, wr, wi, ws, twr, twi, lvl=0):
    """DIF along axis -2 (left-multiplies; twiddle as a column)."""
    n = re.shape[-2]
    base = wr.shape[0]
    if n == base:
        return _kar_left(re, im, wr, wi, ws)
    h = n // 2
    ar, ai = re[..., :h, :], im[..., :h, :]
    br, bi = re[..., h:, :], im[..., h:, :]
    sr, si = ar + br, ai + bi
    dr, di = ar - br, ai - bi
    tc_r = twr[lvl, :h].reshape(-1, 1)
    tc_i = twi[lvl, :h].reshape(-1, 1)
    tr = dr * tc_r - di * tc_i
    ti = dr * tc_i + di * tc_r
    er, ei = _dif_first(sr, si, wr, wi, ws, twr, twi, lvl + 1)
    orr, oi = _dif_first(tr, ti, wr, wi, ws, twr, twi, lvl + 1)
    return (jnp.concatenate([er, orr], axis=-2),
            jnp.concatenate([ei, oi], axis=-2))


def _idit_last(re, im, iwr, iwi, iws, twr, twi, lvl=0):
    """Inverse of _dif_last; iw* are the inverse-base matmuls (1/base folded)."""
    n = re.shape[-1]
    base = iwr.shape[0]
    if n == base:
        return _kar_right(re, im, iwr, iwi, iws)
    h = n // 2
    sr, si = _idit_last(re[..., :h], im[..., :h], iwr, iwi, iws, twr, twi,
                        lvl + 1)
    tr, ti = _idit_last(re[..., h:], im[..., h:], iwr, iwi, iws, twr, twi,
                        lvl + 1)
    cw, sw = twr[lvl, :h], twi[lvl, :h]
    # conj twiddle
    dr = tr * cw + ti * sw
    di = -tr * sw + ti * cw
    return (jnp.concatenate([(sr + dr) * 0.5, (sr - dr) * 0.5], axis=-1),
            jnp.concatenate([(si + di) * 0.5, (si - di) * 0.5], axis=-1))


def _idit_first(re, im, iwr, iwi, iws, twr, twi, lvl=0):
    n = re.shape[-2]
    base = iwr.shape[0]
    if n == base:
        return _kar_left(re, im, iwr, iwi, iws)
    h = n // 2
    sr, si = _idit_first(re[..., :h, :], im[..., :h, :], iwr, iwi, iws,
                         twr, twi, lvl + 1)
    tr, ti = _idit_first(re[..., h:, :], im[..., h:, :], iwr, iwi, iws,
                         twr, twi, lvl + 1)
    tc_r = twr[lvl, :h].reshape(-1, 1)
    tc_i = twi[lvl, :h].reshape(-1, 1)
    dr = tr * tc_r + ti * tc_i
    di = -tr * tc_i + ti * tc_r
    return (jnp.concatenate([(sr + dr) * 0.5, (sr - dr) * 0.5], axis=-2),
            jnp.concatenate([(si + di) * 0.5, (si - di) * 0.5], axis=-2))


def _fresnel_step(re, im, hr, hi, mats, conj_kernel=False):
    """One free-space step in permuted frequency order, fully in VMEM.

    ``conj_kernel=True`` applies conj(H) — the exact inverse of the step
    (|H| = 1), used by the reverse sweep.
    """
    wr, wi, ws, iwr, iwi, iws, twr, twi = mats
    re, im = _dif_last(re, im, wr, wi, ws, twr, twi)
    re, im = _dif_first(re, im, wr, wi, ws, twr, twi)
    if conj_kernel:
        re, im = (re * hr + im * hi, -re * hi + im * hr)
    else:
        re, im = (re * hr - im * hi, re * hi + im * hr)
    re, im = _idit_first(re, im, iwr, iwi, iws, twr, twi)
    re, im = _idit_last(re, im, iwr, iwi, iws, twr, twi)
    return re, im


# ---------------------------------------------------------------------------
# Host-side constant builders
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _radix_consts(n, base=None):
    """Base matmuls (fwd + inv) and the per-level twiddle stacks for size n."""
    base = min(n, base or _DFT_BASE)
    wr, wi, ws = dft_mats(base)
    iwr = (wr / base).astype(np.float32)
    iwi = (-wi / base).astype(np.float32)
    iws = (iwr + iwi).astype(np.float32)
    sizes = []
    m = n
    while m > base:
        sizes.append(m)
        m //= 2
    half = max(n // 2, 1)
    twr = np.zeros((max(len(sizes), 1), half), np.float32)
    twi = np.zeros_like(twr)
    for lvl, size in enumerate(sizes):
        c, s = _twiddles(size)
        twr[lvl, : size // 2] = c
        twi[lvl, : size // 2] = s
    return (wr, wi, ws, iwr, iwi, iws, twr, twi)



def _compiler_params(dim_y, dim_x):
    """Raise the scoped-VMEM cap for big planes: the default 16 MB limit
    rejects the 1024^2 working set (4 MB/plane) although the chip has the
    physical VMEM; harmless for small planes (it is a cap, not a request)."""
    if dim_y * dim_x * 4 >= 1 << 20:
        return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    return None


# ---------------------------------------------------------------------------
# Forward sweep kernel: grid (B, Z), field resident in VMEM scratch
# ---------------------------------------------------------------------------

def _make_fwd_kernel(n_slice, k, use_dma=True):
    def kernel(delta_ref, beta_ref, probe_re_ref, probe_im_ref,
               hr_ref, hi_ref, wr_ref, wi_ref, ws_ref,
               iwr_ref, iwi_ref, iws_ref, twr_ref, twi_ref,
               out_re_ref, out_im_ref, fre, fim, sem):
        zi = pl.program_id(1)
        bi = pl.program_id(0)

        # probe/out live in HBM (pl.ANY) and are DMA'd only at the first/
        # last slice of each batch item: they would otherwise hold 4 VMEM
        # plane-blocks for the whole sweep (16 MB at 1024^2), starving the
        # double-buffering of the (delta, beta) slice stream. DMA slicing
        # `.at[bi]` needs X aligned to the 128-lane tile; planes narrower
        # than that (use_dma=False) take VMEM block inputs instead — at
        # those sizes the blocks are tiny and VMEM pressure is a non-issue.
        @pl.when(zi == 0)
        def _():
            if use_dma:
                cp1 = pltpu.make_async_copy(probe_re_ref.at[bi], fre, sem)
                cp1.start()
                cp1.wait()
                cp2 = pltpu.make_async_copy(probe_im_ref.at[bi], fim, sem)
                cp2.start()
                cp2.wait()
            else:
                fre[:] = probe_re_ref[0]
                fim[:] = probe_im_ref[0]

        # refractive modulation: f *= exp(i k delta - k beta)
        d = delta_ref[0, 0]
        b = beta_ref[0, 0]
        amp = jnp.exp(-k * b)
        cr = amp * jnp.cos(k * d)
        ci = amp * jnp.sin(k * d)
        re = fre[:] * cr - fim[:] * ci
        im = fre[:] * ci + fim[:] * cr

        mats = (wr_ref[:], wi_ref[:], ws_ref[:],
                iwr_ref[:], iwi_ref[:], iws_ref[:], twr_ref[:], twi_ref[:])
        re, im = _fresnel_step(re, im, hr_ref[:], hi_ref[:], mats)
        fre[:] = re
        fim[:] = im

        @pl.when(zi == n_slice - 1)
        def _():
            if use_dma:
                cp1 = pltpu.make_async_copy(fre, out_re_ref.at[bi], sem)
                cp1.start()
                cp1.wait()
                cp2 = pltpu.make_async_copy(fim, out_im_ref.at[bi], sem)
                cp2.start()
                cp2.wait()
            else:
                out_re_ref[0] = re
                out_im_ref[0] = im

    return kernel


def _pallas_sweep_fwd(delta_z, beta_z, w_re, w_im, hr_p, hi_p, k, interpret,
                      base=None):
    """Run the forward sweep. delta_z/beta_z: (Z, B, Y, X); w: (B, Y, X)."""
    n_slice, batch, dim_y, dim_x = delta_z.shape
    consts = _radix_consts(dim_y, base)
    twr = consts[6]

    slice_spec = pl.BlockSpec((1, 1, dim_y, dim_x),
                              lambda b, z: (z, b, 0, 0),
                              memory_space=pltpu.VMEM)
    use_dma = dim_x % 128 == 0
    plane_io = (pl.BlockSpec(memory_space=pl.ANY) if use_dma else
                pl.BlockSpec((1, dim_y, dim_x), lambda b, z: (b, 0, 0),
                             memory_space=pltpu.VMEM))
    full2d = pl.BlockSpec((dim_y, dim_x), lambda b, z: (0, 0),
                          memory_space=pltpu.VMEM)
    base = consts[0].shape[0]
    mat = pl.BlockSpec((base, base), lambda b, z: (0, 0),
                       memory_space=pltpu.VMEM)
    tw = pl.BlockSpec(twr.shape, lambda b, z: (0, 0),
                      memory_space=pltpu.VMEM)

    out_re, out_im = pl.pallas_call(
        _make_fwd_kernel(n_slice, k, use_dma),
        grid=(batch, n_slice),
        in_specs=[slice_spec, slice_spec, plane_io, plane_io, full2d,
                  full2d, mat, mat, mat, mat, mat, mat, tw, tw],
        out_specs=(plane_io, plane_io),
        out_shape=(jax.ShapeDtypeStruct((batch, dim_y, dim_x), jnp.float32),
                   jax.ShapeDtypeStruct((batch, dim_y, dim_x), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((dim_y, dim_x), jnp.float32),
                        pltpu.VMEM((dim_y, dim_x), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=_compiler_params(dim_y, dim_x),
        interpret=interpret,
    )(delta_z, beta_z, w_re, w_im, hr_p, hi_p,
      *(jnp.asarray(c) for c in consts))
    return out_re, out_im


# ---------------------------------------------------------------------------
# Backward sweep kernel: the invertible reverse pass as one fused kernel.
# Semantics identical to ops.multislice._msi_bwd (XLA reference).
# ---------------------------------------------------------------------------

def _make_bwd_kernel(n_slice, k, use_dma=True):
    def kernel(delta_ref, beta_ref, w_re_ref, w_im_ref, g_re_ref, g_im_ref,
               hr_ref, hi_ref, wr_ref, wi_ref, ws_ref,
               iwr_ref, iwi_ref, iws_ref, twr_ref, twi_ref,
               gd_ref, gb_ref, g0_re_ref, g0_im_ref,
               wre, wim, gre, gim, sem):
        zi = pl.program_id(1)
        bi = pl.program_id(0)

        @pl.when(zi == 0)
        def _():
            if use_dma:
                for src, dst in ((w_re_ref, wre), (w_im_ref, wim),
                                 (g_re_ref, gre), (g_im_ref, gim)):
                    cp = pltpu.make_async_copy(src.at[bi], dst, sem)
                    cp.start()
                    cp.wait()
            else:
                wre[:] = w_re_ref[0]
                wim[:] = w_im_ref[0]
                gre[:] = g_re_ref[0]
                gim[:] = g_im_ref[0]

        d = delta_ref[0, 0]
        b = beta_ref[0, 0]
        amp = jnp.exp(-k * b)
        cr = amp * jnp.cos(k * d)
        ci = amp * jnp.sin(k * d)

        mats = (wr_ref[:], wi_ref[:], ws_ref[:],
                iwr_ref[:], iwi_ref[:], iws_ref[:], twr_ref[:], twi_ref[:])
        hr = hr_ref[:]
        hi = hi_ref[:]
        # reconstruct the modulated field m_i = P^-1(w_{i+1}) (unitary step:
        # inverse == adjoint == same transform with conj(H))
        m_re, m_im = _fresnel_step(wre[:], wim[:], hr, hi, mats,
                                   conj_kernel=True)
        # cotangent at m: real-adjoint of the unitary step
        gm_re, gm_im = _fresnel_step(gre[:], gim[:], hr, hi, mats,
                                     conj_kernel=True)
        # reconstruct w_i = m * conj(c) / |c|^2   (|c|^2 = e^{-2 k beta})
        inv = 1.0 / (cr * cr + ci * ci)
        wp_re = (m_re * cr + m_im * ci) * inv
        wp_im = (m_im * cr - m_re * ci) * inv
        # slice gradients: gc = conj(w_i) * gm;  c = e^{-kb}(cos kd, sin kd)
        gc_re = gm_re * wp_re + gm_im * wp_im
        gc_im = -gm_re * wp_im + gm_im * wp_re
        gd_ref[0, 0] = k * (gc_im * cr - gc_re * ci)
        gb_ref[0, 0] = -k * (gc_re * cr + gc_im * ci)
        # cotangent at w_i: conj(c) * gm
        wre[:] = wp_re
        wim[:] = wp_im
        gre[:] = gm_re * cr + gm_im * ci
        gim[:] = -gm_re * ci + gm_im * cr

        @pl.when(zi == n_slice - 1)
        def _():
            if use_dma:
                cp1 = pltpu.make_async_copy(gre, g0_re_ref.at[bi], sem)
                cp1.start()
                cp1.wait()
                cp2 = pltpu.make_async_copy(gim, g0_im_ref.at[bi], sem)
                cp2.start()
                cp2.wait()
            else:
                g0_re_ref[0] = gre[:]
                g0_im_ref[0] = gim[:]

    return kernel


def _pallas_sweep_bwd(delta_z, beta_z, w_re, w_im, g_re, g_im, hr_p, hi_p,
                      k, interpret, base=None):
    """Reverse sweep: returns (gd_z, gb_z, g0_re, g0_im)."""
    n_slice, batch, dim_y, dim_x = delta_z.shape
    consts = _radix_consts(dim_y, base)
    twr = consts[6]

    rev_slice = pl.BlockSpec((1, 1, dim_y, dim_x),
                             lambda b, z: (n_slice - 1 - z, b, 0, 0),
                             memory_space=pltpu.VMEM)
    use_dma = dim_x % 128 == 0
    plane_io = (pl.BlockSpec(memory_space=pl.ANY) if use_dma else
                pl.BlockSpec((1, dim_y, dim_x), lambda b, z: (b, 0, 0),
                             memory_space=pltpu.VMEM))
    full2d = pl.BlockSpec((dim_y, dim_x), lambda b, z: (0, 0),
                          memory_space=pltpu.VMEM)
    base = consts[0].shape[0]
    mat = pl.BlockSpec((base, base), lambda b, z: (0, 0),
                       memory_space=pltpu.VMEM)
    tw = pl.BlockSpec(twr.shape, lambda b, z: (0, 0),
                      memory_space=pltpu.VMEM)

    gd, gb, g0_re, g0_im = pl.pallas_call(
        _make_bwd_kernel(n_slice, k, use_dma),
        grid=(batch, n_slice),
        in_specs=[rev_slice, rev_slice, plane_io, plane_io, plane_io,
                  plane_io, full2d, full2d, mat, mat, mat, mat, mat, mat,
                  tw, tw],
        out_specs=(rev_slice, rev_slice, plane_io, plane_io),
        out_shape=(
            jax.ShapeDtypeStruct(delta_z.shape, jnp.float32),
            jax.ShapeDtypeStruct(delta_z.shape, jnp.float32),
            jax.ShapeDtypeStruct((batch, dim_y, dim_x), jnp.float32),
            jax.ShapeDtypeStruct((batch, dim_y, dim_x), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((dim_y, dim_x), jnp.float32)
                        for _ in range(4)] + [pltpu.SemaphoreType.DMA(())],
        compiler_params=_compiler_params(dim_y, dim_x),
        interpret=interpret,
    )(delta_z, beta_z, w_re, w_im, g_re, g_im, hr_p, hi_p,
      *(jnp.asarray(c) for c in consts))
    return gd, gb, g0_re, g0_im


# ---------------------------------------------------------------------------
# Differentiable fused op (drop-in for ops.multislice._multislice_split_invertible)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def multislice_pallas_invertible(delta_z, beta_z, w_re, w_im, hr_p, hi_p,
                                 k, interpret=False, base=None):
    """Fused multislice sweep with a fused invertible backward pass.

    Args: (Z, B, Y, X) slice stacks, (B, Y, X) split probe, the PERMUTED
    split Fresnel kernel (see splitfft.permute_kernel_2d), and
    ``k = 2 pi dz / lambda``. Returns the (B, Y, X) split exit wave after
    modulate+propagate at EVERY slice (the TF-engine convention,
    ref tensorflow_recon/util.py:465-483).

    Both passes are single pallas_calls: activation memory is O(1) and the
    per-slice HBM traffic is one (delta, beta) stream in the forward and one
    (delta, beta, gd, gb) stream in the backward.
    """
    return _pallas_sweep_fwd(delta_z, beta_z, w_re, w_im, hr_p, hi_p,
                             k, interpret, base)


def _mpi_fwd(delta_z, beta_z, w_re, w_im, hr_p, hi_p, k, interpret, base):
    out = _pallas_sweep_fwd(delta_z, beta_z, w_re, w_im, hr_p, hi_p,
                            k, interpret, base)
    return out, (delta_z, beta_z, out[0], out[1], hr_p, hi_p)


def _mpi_bwd(k, interpret, base, res, cot):
    delta_z, beta_z, out_re, out_im, hr_p, hi_p = res
    g_re, g_im = cot
    gd, gb, g0_re, g0_im = _pallas_sweep_bwd(
        delta_z, beta_z, out_re, out_im, g_re, g_im, hr_p, hi_p, k, interpret,
        base)
    return gd, gb, g0_re, g0_im, None, None


multislice_pallas_invertible.defvjp(_mpi_fwd, _mpi_bwd)


# ---------------------------------------------------------------------------
# Dense (non-radix) fallback for non-square / non-power-of-two planes
# ---------------------------------------------------------------------------

def _make_kernel_dense(n_slice, inv_scale, k):
    def kernel(delta_ref, beta_ref, probe_re_ref, probe_im_ref,
               hr_ref, hi_ref, wry_ref, wiy_ref, wsy_ref,
               wrx_ref, wix_ref, wsx_ref,
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

        def fft2(re, im):
            re, im = _kar_right(re, im, wrx_ref[:], wix_ref[:], wsx_ref[:])
            re, im = _kar_left(re, im, wry_ref[:], wiy_ref[:], wsy_ref[:])
            return re, im

        re, im = fft2(re, im)
        hr = hr_ref[:]
        hi = hi_ref[:]
        re, im = (re * hr - im * hi, re * hi + im * hr)
        # inverse = conj(fft2(conj(.))) / (NY*NX)
        re, im = fft2(re, -im)
        fre[:] = re * inv_scale
        fim[:] = -im * inv_scale

        @pl.when(i == n_slice - 1)
        def _():
            out_re_ref[:] = fre[:]
            out_im_ref[:] = fim[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("energy_ev", "psize_cm",
                                             "interpret"))
def _run_dense(delta_zyx, beta_zyx, probe_re, probe_im, hr, hi,
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
        _make_kernel_dense(n_slice, inv_scale, k),
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
    ``(re, im)`` exit wave of shape (Y, X). Differentiable on the radix path
    (square power-of-two planes) via the fused invertible backward kernel;
    use :func:`multislice_pallas_invertible` directly for batches.

    ``interpret=None`` auto-selects interpreter mode off-TPU (tests).
    """
    grid_delta = jnp.asarray(grid_delta, jnp.float32)
    grid_beta = jnp.asarray(grid_beta, jnp.float32)
    dim_y, dim_x, n_slice = grid_delta.shape
    if interpret is None:
        interpret = not _on_tpu()
    voxel_nm = np.array([psize_cm] * 3) * 1e7
    lmbda_nm = 1240.0 / energy_ev
    k = np.float32(2.0 * PI * voxel_nm[-1] / lmbda_nm)
    if h is None:
        h = get_kernel(voxel_nm[-1], lmbda_nm, voxel_nm, (dim_y, dim_x))
    h_if = ifftshift2(np.asarray(h))
    delta_zyx = jnp.moveaxis(grid_delta, -1, 0)
    beta_zyx = jnp.moveaxis(grid_beta, -1, 0)
    probe_re = jnp.broadcast_to(jnp.asarray(probe_re, jnp.float32),
                                (dim_y, dim_x))
    probe_im = jnp.broadcast_to(jnp.asarray(probe_im, jnp.float32),
                                (dim_y, dim_x))
    if radix is None:
        radix = pallas_shape_ok(dim_y, dim_x)
    if radix:
        h_p = permute_kernel_2d(h_if)
        hr = jnp.asarray(np.real(h_p).astype(np.float32))
        hi = jnp.asarray(np.imag(h_p).astype(np.float32))
        out_re, out_im = multislice_pallas_invertible(
            delta_zyx[:, None], beta_zyx[:, None], probe_re[None],
            probe_im[None], hr, hi, float(k), bool(interpret))
        return out_re[0], out_im[0]
    hr = jnp.asarray(np.real(h_if).astype(np.float32))
    hi = jnp.asarray(np.imag(h_if).astype(np.float32))
    return _run_dense(delta_zyx, beta_zyx, probe_re, probe_im, hr, hi,
                      float(energy_ev), float(psize_cm), bool(interpret))


# ---------------------------------------------------------------------------
# Blocked two-pass variant for planes whose working set exceeds VMEM
# (1024^2+). Per slice the plane makes TWO panel-streamed passes:
#   X-pass (row panels):    IDIT_x(state) -> modulate(z) -> DIF_x
#   Y-pass (column panels): DIF_y -> x H(permuted) -> IDIT_y
# which composes to exactly the fused kernel's per-slice step. HBM traffic
# is ~4 plane reads+writes per slice versus the XLA scan's ~9, and every
# panel fits VMEM with room for double buffering.
# ---------------------------------------------------------------------------

def _make_xpass_kernel(k, mode):
    """mode: 'first' (modulate+DIFx only), 'mid' (IDITx+modulate+DIFx),
    'last' (IDITx only)."""
    def kernel(s_re_ref, s_im_ref, d_ref, b_ref,
               wr_ref, wi_ref, ws_ref, iwr_ref, iwi_ref, iws_ref,
               twr_ref, twi_ref, out_re_ref, out_im_ref):
        re = s_re_ref[:]
        im = s_im_ref[:]
        twr = twr_ref[:]
        twi = twi_ref[:]
        if mode != "first":
            re, im = _idit_last(re, im, iwr_ref[:], iwi_ref[:], iws_ref[:],
                                twr, twi)
        if mode != "last":
            d = d_ref[:]
            b = b_ref[:]
            amp = jnp.exp(-k * b)
            cr = amp * jnp.cos(k * d)
            ci = amp * jnp.sin(k * d)
            re, im = re * cr - im * ci, re * ci + im * cr
            re, im = _dif_last(re, im, wr_ref[:], wi_ref[:], ws_ref[:],
                               twr, twi)
        out_re_ref[:] = re
        out_im_ref[:] = im

    return kernel


def _make_xpass_bwd_kernel(k):
    """Backward X-pass: one reverse-slice step on row panels.

    Inputs are the DIF_x-space states AFTER the conj-kernel Y-pass, i.e.
    ``IDIT_x(w_state) = m_i = A^-1(w_{i+1})`` (the modulated field before
    slice i's propagation) and likewise ``IDIT_x(g_state)`` is the
    cotangent pulled back through the unitary propagation. The kernel
    finishes the reverse slice step entirely in VMEM: inverse modulation
    reconstructs ``w_i``, the per-slice (gd, gb) gradients are emitted,
    the cotangent picks up conj(c), and both states are re-DIF_x'd for
    the next (earlier) slice. Elementwise math identical to
    :func:`_make_bwd_kernel` / ``ops.multislice._msi_bwd``.
    """
    def kernel(w_re_ref, w_im_ref, g_re_ref, g_im_ref, d_ref, b_ref,
               wr_ref, wi_ref, ws_ref, iwr_ref, iwi_ref, iws_ref,
               twr_ref, twi_ref,
               ow_re_ref, ow_im_ref, og_re_ref, og_im_ref, gd_ref, gb_ref):
        twr = twr_ref[:]
        twi = twi_ref[:]
        iw = (iwr_ref[:], iwi_ref[:], iws_ref[:])
        m_re, m_im = _idit_last(w_re_ref[:], w_im_ref[:], *iw, twr, twi)
        gm_re, gm_im = _idit_last(g_re_ref[:], g_im_ref[:], *iw, twr, twi)
        d = d_ref[:]
        b = b_ref[:]
        amp = jnp.exp(-k * b)
        cr = amp * jnp.cos(k * d)
        ci = amp * jnp.sin(k * d)
        # reconstruct w_i = m * conj(c) / |c|^2   (|c|^2 = e^{-2 k beta})
        inv = 1.0 / (cr * cr + ci * ci)
        wp_re = (m_re * cr + m_im * ci) * inv
        wp_im = (m_im * cr - m_re * ci) * inv
        # slice gradients: gc = conj(w_i) * gm
        gc_re = gm_re * wp_re + gm_im * wp_im
        gc_im = -gm_re * wp_im + gm_im * wp_re
        gd_ref[:] = k * (gc_im * cr - gc_re * ci)
        gb_ref[:] = -k * (gc_re * cr + gc_im * ci)
        # cotangent at w_i: conj(c) * gm
        gn_re = gm_re * cr + gm_im * ci
        gn_im = -gm_re * ci + gm_im * cr
        w = (wr_ref[:], wi_ref[:], ws_ref[:])
        r, i = _dif_last(wp_re, wp_im, *w, twr, twi)
        ow_re_ref[:] = r
        ow_im_ref[:] = i
        r, i = _dif_last(gn_re, gn_im, *w, twr, twi)
        og_re_ref[:] = r
        og_im_ref[:] = i

    return kernel


def _make_ypass_kernel():
    def kernel(s_re_ref, s_im_ref, hr_ref, hi_ref,
               wr_ref, wi_ref, ws_ref, iwr_ref, iwi_ref, iws_ref,
               twr_ref, twi_ref, out_re_ref, out_im_ref):
        twr = twr_ref[:]
        twi = twi_ref[:]
        re, im = _dif_first(s_re_ref[:], s_im_ref[:], wr_ref[:], wi_ref[:],
                            ws_ref[:], twr, twi)
        hr = hr_ref[:]
        hi = hi_ref[:]
        re, im = (re * hr - im * hi, re * hi + im * hr)
        re, im = _idit_first(re, im, iwr_ref[:], iwi_ref[:], iws_ref[:],
                             twr, twi)
        out_re_ref[:] = re
        out_im_ref[:] = im

    return kernel


def _blocked_calls(dim_y, dim_x, k, consts, interpret, py, qx):
    # Panel sizes must tile the plane in any mode; the Mosaic block-shape
    # rules additionally apply when actually lowering for TPU (interpret
    # mode would happily run shapes the TPU lowering rejects — exactly how
    # the r5 qx=64 regression slipped past the CPU suite): the X-pass row
    # panel (py, dim_x) needs sublane py % 8 == 0; the Y-pass column panel
    # (dim_y, qx) needs LANE qx % 128 == 0 (or qx == dim_x).
    if dim_y % py or dim_x % qx:
        raise ValueError("panels (py=%d, qx=%d) must divide the plane "
                         "(%d, %d)" % (py, qx, dim_y, dim_x))
    if not interpret:
        if py % 8:
            raise ValueError("X-pass row panel py=%d: Mosaic needs the "
                             "sublane dim to be a multiple of 8" % py)
        if qx % 128 and qx != dim_x:
            raise ValueError("Y-pass column panel qx=%d: Mosaic requires "
                             "the lane dim to be a multiple of 128 (or "
                             "dim_x=%d)" % (qx, dim_x))
    base = consts[0].shape[0]
    twr = consts[6]
    mat = pl.BlockSpec((base, base), lambda p: (0, 0),
                       memory_space=pltpu.VMEM)
    tw = pl.BlockSpec(twr.shape, lambda p: (0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((py, dim_x), lambda p: (p, 0),
                       memory_space=pltpu.VMEM)
    col = pl.BlockSpec((dim_y, qx), lambda p: (0, p),
                       memory_space=pltpu.VMEM)
    plane = jax.ShapeDtypeStruct((dim_y, dim_x), jnp.float32)
    cmats = tuple(jnp.asarray(c) for c in consts)

    def xpass(mode):
        kern = _make_xpass_kernel(k, mode)

        def call(s_re, s_im, d, b):
            return pl.pallas_call(
                kern, grid=(dim_y // py,),
                in_specs=[row, row, row, row] + [mat] * 6 + [tw, tw],
                out_specs=(row, row),
                out_shape=(plane, plane),
                compiler_params=_compiler_params(py, dim_x),
                interpret=interpret,
            )(s_re, s_im, d, b, *cmats)
        return call

    ykern = _make_ypass_kernel()

    def ypass(s_re, s_im, hr, hi):
        return pl.pallas_call(
            ykern, grid=(dim_x // qx,),
            in_specs=[col, col, col, col] + [mat] * 6 + [tw, tw],
            out_specs=(col, col),
            out_shape=(plane, plane),
            compiler_params=_compiler_params(dim_y, qx),
            interpret=interpret,
        )(s_re, s_im, hr, hi, *cmats)

    bkern = _make_xpass_bwd_kernel(k)

    def xbwd(wr_s, wi_s, gr_s, gi_s, d, b):
        return pl.pallas_call(
            bkern, grid=(dim_y // py,),
            in_specs=[row] * 6 + [mat] * 6 + [tw, tw],
            out_specs=(row,) * 6,
            out_shape=(plane,) * 6,
            compiler_params=_compiler_params(py, dim_x),
            interpret=interpret,
        )(wr_s, wi_s, gr_s, gi_s, d, b, *cmats)

    return xpass("first"), xpass("mid"), xpass("last"), ypass, xbwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def multislice_pallas_blocked_invertible(delta_z, beta_z, w_re, w_im,
                                         hr_p, hi_p, k, interpret=False,
                                         py=128, qx=128, base=None):
    """Blocked two-pass multislice with a blocked invertible backward.

    One (Z, Y, X) volume, (Y, X) split probe, PERMUTED split kernel, and
    ``k = 2 pi dz / lambda``. Returns the split (Y, X) exit wave after
    modulate+propagate at EVERY slice. The plane never has to fit VMEM:
    both passes stream py-row / qx-column panels, the field lives in HBM
    only between passes.

    BACKWARD is the same invertible sweep as the fused kernels
    (:func:`multislice_pallas_invertible` / ``ops.multislice._msi_bwd``):
    the unitary per-slice step is run in reverse — conj(H) Y-passes plus a
    combined backward X-pass that reconstructs the field, emits the
    per-slice (gd, gb), and pulls the cotangent back — so activation
    memory stays O(1) planes at ANY plane size. This is the piece the
    reference never had at scale (its TF graph kept every activation,
    ref tensorflow_recon/util.py:465-483).
    """
    return _blocked_sweep_fwd(delta_z, beta_z, w_re, w_im, hr_p, hi_p, k,
                              interpret, py, qx, base)


def _blocked_sweep_fwd(delta_z, beta_z, w_re, w_im, hr, hi, k, interpret,
                       py, qx, base):
    n_slice, dim_y, dim_x = delta_z.shape
    consts = _radix_consts(dim_y, base)
    xfirst, xmid, xlast, ypass, _ = _blocked_calls(dim_y, dim_x, k, consts,
                                                   bool(interpret), py, qx)
    s_re, s_im = xfirst(w_re, w_im, delta_z[0], beta_z[0])

    def step(carry, slices):
        s_re, s_im = carry
        d, b = slices
        s_re, s_im = ypass(s_re, s_im, hr, hi)
        s_re, s_im = xmid(s_re, s_im, d, b)
        return (s_re, s_im), None

    (s_re, s_im), _ = jax.lax.scan(step, (s_re, s_im),
                                   (delta_z[1:], beta_z[1:]))
    s_re, s_im = ypass(s_re, s_im, hr, hi)
    zeros = jnp.zeros((dim_y, dim_x), jnp.float32)
    return xlast(s_re, s_im, zeros, zeros)


def _mpb_fwd(delta_z, beta_z, w_re, w_im, hr_p, hi_p, k, interpret, py, qx,
             base):
    out = _blocked_sweep_fwd(delta_z, beta_z, w_re, w_im, hr_p, hi_p, k,
                             interpret, py, qx, base)
    return out, (delta_z, beta_z, out[0], out[1], hr_p, hi_p)


def _mpb_bwd(k, interpret, py, qx, base, res, cot):
    delta_z, beta_z, out_re, out_im, hr, hi = res
    g_re, g_im = cot
    n_slice, dim_y, dim_x = delta_z.shape
    consts = _radix_consts(dim_y, base)
    xfirst, _, xlast, ypass, xbwd = _blocked_calls(dim_y, dim_x, k, consts,
                                                   bool(interpret), py, qx)
    nhi = -hi  # conj kernel: P^-1 == P-adjoint (unitary step)
    zeros = jnp.zeros((dim_y, dim_x), jnp.float32)
    # into DIF_x space (mode='first' with zero slices is a pure DIF_x)
    wr_s, wi_s = xfirst(out_re, out_im, zeros, zeros)
    gr_s, gi_s = xfirst(g_re, g_im, zeros, zeros)

    def step(carry, slices):
        wr_s, wi_s, gr_s, gi_s = carry
        d, b = slices
        wr_s, wi_s = ypass(wr_s, wi_s, hr, nhi)
        gr_s, gi_s = ypass(gr_s, gi_s, hr, nhi)
        wr_s, wi_s, gr_s, gi_s, gd, gb = xbwd(wr_s, wi_s, gr_s, gi_s, d, b)
        return (wr_s, wi_s, gr_s, gi_s), (gd, gb)

    (_, _, gr_s, gi_s), (gd_z, gb_z) = jax.lax.scan(
        step, (wr_s, wi_s, gr_s, gi_s), (delta_z, beta_z), reverse=True)
    g0_re, g0_im = xlast(gr_s, gi_s, zeros, zeros)
    return gd_z, gb_z, g0_re, g0_im, None, None


multislice_pallas_blocked_invertible.defvjp(_mpb_fwd, _mpb_bwd)


def multislice_pallas_split_blocked(grid_delta, grid_beta, probe_re, probe_im,
                                    energy_ev, psize_cm, h=None,
                                    interpret=None, py=128, qx=128,
                                    base=None, h_split=None):
    """Blocked two-pass fused multislice for big square planes (one volume).

    Semantics identical to :func:`multislice_pallas_split` (modulate +
    propagate after EVERY slice). (Y, X, Z) volume in, split (Y, X) exit
    wave out. DIFFERENTIABLE: routes through
    :func:`multislice_pallas_blocked_invertible`, whose backward is the
    blocked invertible reverse sweep.
    """
    grid_delta = jnp.asarray(grid_delta, jnp.float32)
    grid_beta = jnp.asarray(grid_beta, jnp.float32)
    dim_y, dim_x, n_slice = grid_delta.shape
    assert pallas_shape_ok(dim_y, dim_x, base) and dim_y % py == 0 \
        and dim_x % qx == 0
    if interpret is None:
        interpret = not _on_tpu()
    voxel_nm = np.array([psize_cm] * 3) * 1e7
    lmbda_nm = 1240.0 / energy_ev
    k = np.float32(2.0 * PI * voxel_nm[-1] / lmbda_nm)
    if h_split is not None:
        # pre-permuted split kernel as runtime arrays (multislice.
        # build_split_kernel): avoids embedding two (Y, X) trace-time
        # constants — 256 MB each at 8192^2, which overflows
        # remote-compile transports
        hr = jnp.asarray(h_split[0], jnp.float32)
        hi = jnp.asarray(h_split[1], jnp.float32)
    else:
        if h is None:
            h = get_kernel(voxel_nm[-1], lmbda_nm, voxel_nm, (dim_y, dim_x))
        h_p = permute_kernel_2d(ifftshift2(np.asarray(h)), base=base)
        hr = jnp.asarray(np.real(h_p).astype(np.float32))
        hi = jnp.asarray(np.imag(h_p).astype(np.float32))

    delta_z = jnp.moveaxis(grid_delta, -1, 0)
    beta_z = jnp.moveaxis(grid_beta, -1, 0)
    w_re = jnp.broadcast_to(jnp.asarray(probe_re, jnp.float32),
                            (dim_y, dim_x))
    w_im = jnp.broadcast_to(jnp.asarray(probe_im, jnp.float32),
                            (dim_y, dim_x))
    return multislice_pallas_blocked_invertible(
        delta_z, beta_z, w_re, w_im, hr, hi, float(k), bool(interpret),
        int(py), int(qx), base)
