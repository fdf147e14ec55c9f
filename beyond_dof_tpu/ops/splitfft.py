"""Split-complex (re, im float32 pair) FFT and field arithmetic.

TPU backends do not always support complex dtypes (the reference already
plays the same trick for TF conv ops, splitting complex fields into stacked
real/imag channels — ref cnn_propagator/propagation_tf.py:83-105; SURVEY §7
flags "complex64 on TPU" as a hard part). This module provides a complete
split-complex compute path:

* 2-D DFT/IDFT as **real matmuls** against precomputed cos/sin matrices —
  every FLOP lands on the MXU (an N-point DFT-by-matmul at f32 precision;
  for the N <= 1024 planes of this workload the matmul formulation is both
  simple and fast, and unlike an FFT it needs no complex arithmetic at all).
* complex multiply / exp / abs on (re, im) pairs.

Used automatically when the active backend lacks complex support (see
:func:`complex_supported`), and directly by the benchmark path.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["complex_supported", "dft_mats", "cfft2_split", "cifft2_split",
           "cmul", "cexp_modulation", "cabs", "apply_kernel_split"]

_PRECISION = jax.lax.Precision.HIGHEST


def set_precision(name):
    """Set the MXU precision of the split-complex DFT matmuls.

    'HIGHEST' (default, 6 bf16 MXU passes per f32 matmul) meets the 1e-6
    amplitude-parity target of BASELINE.md; 'HIGH' (error-compensated bf16x3,
    3 passes — the hi*hi + hi*lo + lo*hi decomposition) roughly doubles
    MXU-pass-bound throughput at large planes. Accuracy/throughput at 1024^2
    is recorded by benchmarks/precision_bench.py; enable per-process with
    BDT_DFT_PRECISION=high only after that gate passes for your slice count.
    """
    global _PRECISION
    _PRECISION = (getattr(jax.lax.Precision, name.upper())
                  if isinstance(name, str) else name)
    return _PRECISION


_env_prec = __import__("os").environ.get("BDT_DFT_PRECISION")
if _env_prec:
    try:
        set_precision(_env_prec)
    except AttributeError:
        raise ValueError(
            "BDT_DFT_PRECISION=%r is not a valid precision; accepted values "
            "are 'default', 'high', 'highest'." % (_env_prec,)) from None


@functools.lru_cache(maxsize=4)
def complex_supported(platform=None):
    """Probe whether the default backend executes complex64 ops.

    The probe runs in a SUBPROCESS: on some TPU runtimes a failed complex op
    poisons the whole client session (subsequent float32 transfers fail too),
    so it must never run in the caller's process. Override with
    ``BDT_COMPLEX=0|1`` to skip the probe entirely.
    """
    import os
    env = os.environ.get("BDT_COMPLEX")
    if env is not None:
        return env not in ("0", "false", "False")
    if platform is None:
        platform = jax.default_backend()
    if platform == "cpu":
        return True
    import subprocess
    import sys
    code = ("import numpy as np, jax, jax.numpy as jnp;"
            "x = jax.device_put(np.ones((8, 8), np.complex64));"
            "print(float(np.asarray(jnp.fft.fft2(x))[0, 0].real))")
    try:
        res = subprocess.run([sys.executable, "-c", code], timeout=300,
                             capture_output=True)
        return res.returncode == 0
    except Exception:
        return False


@functools.lru_cache(maxsize=16)
def dft_mats(n):
    """(WR, WI, WR+WI) with W = WR + i WI = exp(-2 pi i n k / N), float32.

    Cached as NumPy (not jnp) arrays: device constants created inside a
    traced context would leak tracers through the cache. The precomputed
    sum matrix feeds the Karatsuba 3-multiplication complex matmul.
    """
    idx = np.arange(n)
    ang = -2.0 * np.pi * np.outer(idx, idx) / n
    wr = np.cos(ang).astype(np.float32)
    wi = np.sin(ang).astype(np.float32)
    return wr, wi, (wr + wi).astype(np.float32)


def _apply_dft_last(re, im, wr, wi, wrpwi):
    """DFT along the last axis of an (..., N) split pair.

    Karatsuba 3-mult complex matmul: 25% fewer MXU flops than the naive
    4-matmul form:  t1 = a Wr, t2 = b Wi, re' = t1 - t2,
                    im' = (a + b)(Wr + Wi) - t1 - t2.
    """
    t1 = jnp.matmul(re, wr, precision=_PRECISION)
    t2 = jnp.matmul(im, wi, precision=_PRECISION)
    t3 = jnp.matmul(re + im, wrpwi, precision=_PRECISION)
    return t1 - t2, t3 - t1 - t2


# Base size at which the radix-2 recursion bottoms out in a dense matmul.
# 128 = the MXU contraction width: the dense 128-point DFT is a perfectly
# shaped (M, 128) @ (128, 128) matmul, and each radix level above it halves
# the matmul flops (N*128 total MACs per row instead of N^2).
_DFT_BASE = 128


@functools.lru_cache(maxsize=16)
def _twiddles(n):
    """(cos, sin) of exp(-2 pi i j / n) for j < n/2, float32 NumPy."""
    j = np.arange(n // 2)
    ang = -2.0 * np.pi * j / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=32)
def dif_perm(n, base=None):
    """Output-position -> frequency-index permutation of the DIF transform.

    The decimation-in-frequency recursion below emits coefficients in
    block-interleaved ("bit-reversed blocks of ``base``") order. Instead of
    reordering data on device, the Fresnel kernel is permuted once on the
    host (see :func:`permute_kernel_2d`).
    """
    if base is None:
        base = _DFT_BASE
    if n <= base or n % 2:
        return np.arange(n)
    half = dif_perm(n // 2, base)
    return np.concatenate([2 * half, 2 * half + 1])


def _dft_dif(re, im):
    """Radix-2 DIF DFT along the last axis; output in dif_perm order.

    All array accesses are contiguous half-slices (TPU lane dimension is
    never strided); each level costs one butterfly + one twiddle multiply
    and halves the matmul flops. Dense Karatsuba matmul at <= 128 points.
    """
    n = re.shape[-1]
    if n <= _DFT_BASE or n % 2:
        return _apply_dft_last(re, im, *dft_mats(n))
    h = n // 2
    ar, ai = re[..., :h], im[..., :h]
    br, bi = re[..., h:], im[..., h:]
    sr, si = ar + br, ai + bi                  # even-frequency branch
    dr, di = ar - br, ai - bi                  # odd-frequency branch
    twr, twi = _twiddles(n)
    tr = dr * twr - di * twi
    ti = dr * twi + di * twr
    er, ei = _dft_dif(sr, si)
    orr, oi = _dft_dif(tr, ti)
    return (jnp.concatenate([er, orr], axis=-1),
            jnp.concatenate([ei, oi], axis=-1))


def _idft_dit(re, im):
    """Exact inverse of :func:`_dft_dif`: consumes dif_perm order, emits
    natural order (1/n scale included)."""
    n = re.shape[-1]
    if n <= _DFT_BASE or n % 2:
        # conj trick: ID(x) = conj(D(conj(x))) / n
        rr, ii = _apply_dft_last(re, -im, *dft_mats(n))
        s = 1.0 / n
        return rr * s, -ii * s
    h = n // 2
    sr, si = _idft_dit(re[..., :h], im[..., :h])     # x1 + x2
    tr, ti = _idft_dit(re[..., h:], im[..., h:])     # (x1 - x2) * w
    twr, twi = _twiddles(n)                          # conj twiddle: (twr, -twi)
    dr = tr * twr + ti * twi
    di = -tr * twi + ti * twr
    return (jnp.concatenate([(sr + dr) * 0.5, (sr - dr) * 0.5], axis=-1),
            jnp.concatenate([(si + di) * 0.5, (si - di) * 0.5], axis=-1))


def permute_kernel_2d(h_if, base=None):
    """Pre-permute an (Y, X) frequency-space kernel into dif_perm order on
    both axes, for use with the permuted-order transform pair."""
    ny, nx = h_if.shape
    return np.asarray(h_if)[np.ix_(dif_perm(ny, base), dif_perm(nx, base))]


def apply_kernel_split_perm(re, im, hr_p, hi_p):
    """Fresnel step with DIF forward / DIT inverse and a pre-permuted kernel.

    Mathematically identical to :func:`apply_kernel_split` but with
    radix-reduced matmul flops (N*128 instead of N^2 MACs per axis) and no
    on-device reordering: the frequency-order permutation cancels between
    the forward transform, the (permuted) kernel, and the inverse.
    """
    fr, fi = _dft_dif(re, im)
    fr = jnp.swapaxes(fr, -1, -2)
    fi = jnp.swapaxes(fi, -1, -2)
    fr, fi = _dft_dif(fr, fi)
    fr = jnp.swapaxes(fr, -1, -2)
    fi = jnp.swapaxes(fi, -1, -2)
    fr, fi = cmul(fr, fi, hr_p, hi_p)
    fr = jnp.swapaxes(fr, -1, -2)
    fi = jnp.swapaxes(fi, -1, -2)
    fr, fi = _idft_dit(fr, fi)
    fr = jnp.swapaxes(fr, -1, -2)
    fi = jnp.swapaxes(fi, -1, -2)
    return _idft_dit(fr, fi)


def cfft2_split(re, im):
    """2-D DFT over the last two axes of a split (re, im) pair.

    Natural frequency order (dense matmul per axis). The multislice hot loop
    uses the flop-reduced permuted-order pair instead
    (:func:`apply_kernel_split_perm`).
    """
    re, im = _apply_dft_last(re, im, *dft_mats(re.shape[-1]))
    re = jnp.swapaxes(re, -1, -2)
    im = jnp.swapaxes(im, -1, -2)
    re, im = _apply_dft_last(re, im, *dft_mats(re.shape[-1]))
    return jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2)


def cifft2_split(re, im):
    """2-D inverse DFT (conjugate transform / N) on a split pair."""
    ny, nx = re.shape[-2], re.shape[-1]
    # IDFT = conj(DFT(conj(x))) / N
    re2, im2 = cfft2_split(re, -im)
    scale = 1.0 / (ny * nx)
    return re2 * scale, -im2 * scale


def cmul(ar, ai, br, bi):
    """Elementwise complex multiply of split pairs."""
    return ar * br - ai * bi, ar * bi + ai * br


def cexp_modulation(delta, beta, k):
    """(re, im) of exp(i k delta - k beta) — the refractive modulation factor."""
    amp = jnp.exp(-k * beta)
    return amp * jnp.cos(k * delta), amp * jnp.sin(k * delta)


def cabs(re, im):
    return jnp.sqrt(re * re + im * im)


def apply_kernel_split(re, im, hr, hi):
    """fft2 -> multiply by (hr, hi) -> ifft2, all split-complex."""
    fr, fi = cfft2_split(re, im)
    fr, fi = cmul(fr, fi, hr, hi)
    return cifft2_split(fr, fi)
