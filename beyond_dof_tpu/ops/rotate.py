"""Differentiable object rotation and resampling for tomography.

TPU-native rebuild of the reference rotation layer:

* the per-angle bilinear volume rotation done with ``tf.contrib.image.rotate``
  in every TF engine (ref tensorflow_recon/fullfield.py:96, simulation.py:86
  uses ``scipy.ndimage.rotate`` with the same geometry), here four flat plane
  gathers with 2-D index math — differentiable for free under ``jax.grad``;
* the precomputed nearest-neighbor **rotation lookup tables**
  (ref tensorflow_recon/util.py:721-826, cnn_propagator/util.py:294-402),
  kept as an optional exact-parity path (a flat gather, which is how the
  autograd engines rotate in their hot path, ref cnn_propagator/fullfield.py:83).

Geometry: volumes are (Y, X, Z) with the beam along Z and the tomographic
rotation axis along Y; rotation therefore acts on the (X, Z) plane
(the reference rotates axes (1, 2), ref simulation.py:86).
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "rotate_volume",
    "rotate_volume_zfirst",
    "rotate_volume_zfirst_tfgrad",
    "rotate_volume_shear3",
    "rotate_pair_zfirst_shear3",
    "rotate_stack",
    "rotation_lookup",
    "apply_rotation_lookup",
]


def _rot_coords(dim_x, dim_z, theta):
    """Backward-mapped source coordinates for a rotation of the (X, Z) plane.

    Rotation about the pixel center ``(N-1)/2`` (scipy/tf convention) by
    angle ``theta`` (radians).
    """
    cx = (dim_x - 1) / 2.0
    cz = (dim_z - 1) / 2.0
    xs = jnp.arange(dim_x, dtype=jnp.float32) - cx
    zs = jnp.arange(dim_z, dtype=jnp.float32) - cz
    xx, zz = jnp.meshgrid(xs, zs, indexing="ij")
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    x_src = cos_t * xx - sin_t * zz + cx
    z_src = sin_t * xx + cos_t * zz + cz
    return x_src, z_src


def rotate_volume_zfirst(vol, theta, order=1, cval=0.0, mode="constant"):
    """Rotate a (Y, X, Z) volume, emitting the result as (Z, Y, X).

    Identical math to :func:`rotate_volume`; only the OUTPUT ordering
    differs. This matters on TPU: the multislice propagators consume
    Z-first stacks, and transposing a (B, Y, X, Z) rotation result to
    (Z, B, Y, X) moves Z out of the minor dims — a relayout copy whose
    contiguous runs are 4 bytes (measured ~146 ms per 256^3 minibatch-10
    step on v5e, more than the rotation and propagation combined). Making
    the rotation gather WRITE z-first costs nothing (the source access
    pattern is the same column gather) and removes that transpose.
    """
    dim_y, dim_x, dim_z = vol.shape
    x_src, z_src = _rot_coords(dim_x, dim_z, theta)
    x_src, z_src = x_src.T, z_src.T  # (Z, X) maps
    flat = vol.reshape(dim_y, dim_x * dim_z)
    repeat = mode == "repeat"

    def gather(idx_zx):
        # one batched column gather: out[z, y, x] = flat[y, idx[z, x]]
        return jax.vmap(lambda row: jnp.take(flat, row, axis=1))(idx_zx)

    if order == 0:
        xi = jnp.round(x_src).astype(jnp.int32)
        zi = jnp.round(z_src).astype(jnp.int32)
        inside = ((xi >= 0) & (xi <= dim_x - 1) & (zi >= 0) & (zi <= dim_z - 1))
        idx = jnp.clip(xi, 0, dim_x - 1) * dim_z + jnp.clip(zi, 0, dim_z - 1)
        out = gather(idx)
        return out if repeat else jnp.where(inside[:, None], out, cval)

    x0 = jnp.floor(x_src)
    z0 = jnp.floor(z_src)
    wx = x_src - x0
    wz = z_src - z0
    x0 = x0.astype(jnp.int32)
    z0 = z0.astype(jnp.int32)

    def corner(xi, zi):
        inside = ((xi >= 0) & (xi <= dim_x - 1) & (zi >= 0) & (zi <= dim_z - 1))
        idx = jnp.clip(xi, 0, dim_x - 1) * dim_z + jnp.clip(zi, 0, dim_z - 1)
        vals = gather(idx)
        return vals if repeat else jnp.where(inside[:, None], vals, cval)

    g00 = corner(x0, z0)
    g01 = corner(x0, z0 + 1)
    g10 = corner(x0 + 1, z0)
    g11 = corner(x0 + 1, z0 + 1)
    w00 = ((1 - wx) * (1 - wz))[:, None]
    w01 = ((1 - wx) * wz)[:, None]
    w10 = (wx * (1 - wz))[:, None]
    w11 = (wx * wz)[:, None]
    return g00 * w00 + g01 * w01 + g10 * w10 + g11 * w11


def rotate_volume(vol, theta, order=1, cval=0.0, mode="constant"):
    """Rotate a (Y, X, Z) volume by ``theta`` radians in the (X, Z) plane.

    Bilinear (order=1, differentiable) or nearest (order=0). With
    ``mode='constant'`` fills with ``cval`` outside, matching the
    BILINEAR/black-fill behavior of ``tf.contrib.image.rotate``
    (ref fullfield.py:96); ``mode='repeat'`` clamps to the nearest edge pixel
    (the legacy ``rotate_image_tensor`` boundary modes, ref util.py:829-910:
    black/ones/white are cval 0/1/255, 'repeat' is this clamp).

    The rotation is the same for every Y row, so the index math is 2-D
    (a (X, Z) map) and the interpolation is four plane gathers on the
    flattened (X*Z) axis — not a 3-D ``map_coordinates`` (which would
    materialize three full-volume coordinate arrays and eight gathers).
    """
    dim_y, dim_x, dim_z = vol.shape
    x_src, z_src = _rot_coords(dim_x, dim_z, theta)
    flat = vol.reshape(dim_y, dim_x * dim_z)

    repeat = mode == "repeat"

    if order == 0:
        xi = jnp.round(x_src).astype(jnp.int32)
        zi = jnp.round(z_src).astype(jnp.int32)
        inside = ((xi >= 0) & (xi <= dim_x - 1) & (zi >= 0) & (zi <= dim_z - 1))
        idx = (jnp.clip(xi, 0, dim_x - 1) * dim_z
               + jnp.clip(zi, 0, dim_z - 1)).ravel()
        out = jnp.take(flat, idx, axis=1).reshape(dim_y, dim_x, dim_z)
        return out if repeat else jnp.where(inside[None], out, cval)

    x0 = jnp.floor(x_src)
    z0 = jnp.floor(z_src)
    wx = x_src - x0
    wz = z_src - z0
    x0 = x0.astype(jnp.int32)
    z0 = z0.astype(jnp.int32)

    def corner(xi, zi):
        inside = ((xi >= 0) & (xi <= dim_x - 1) & (zi >= 0) & (zi <= dim_z - 1))
        idx = (jnp.clip(xi, 0, dim_x - 1) * dim_z
               + jnp.clip(zi, 0, dim_z - 1)).ravel()
        vals = jnp.take(flat, idx, axis=1).reshape(dim_y, dim_x, dim_z)
        return vals if repeat else jnp.where(inside[None], vals, cval)

    g00 = corner(x0, z0)
    g01 = corner(x0, z0 + 1)
    g10 = corner(x0 + 1, z0)
    g11 = corner(x0 + 1, z0 + 1)
    w00 = ((1 - wx) * (1 - wz))[None]
    w01 = ((1 - wx) * wz)[None]
    w10 = (wx * (1 - wz))[None]
    w11 = (wx * wz)[None]
    return g00 * w00 + g01 * w01 + g10 * w10 + g11 * w11


def _rotate_back_zfirst(g_zyx, theta, cval=0.0):
    """Bilinear rotation of a (Z, Y, X) cotangent by ``-theta``, emitted as
    (Y, X, Z) — the backward companion of :func:`rotate_volume_zfirst`."""
    dim_z, dim_y, dim_x = g_zyx.shape
    # (Y, Z, X) intermediate keeps X in the lane dim (1 KB contiguous runs);
    # going straight to (Y, X, Z) would be a 4-byte-run relayout
    g = jnp.transpose(g_zyx, (1, 0, 2)).reshape(dim_y, dim_z * dim_x)
    x_src, z_src = _rot_coords(dim_x, dim_z, -theta)  # (X, Z) maps

    x0 = jnp.floor(x_src)
    z0 = jnp.floor(z_src)
    wx = x_src - x0
    wz = z_src - z0
    x0 = x0.astype(jnp.int32)
    z0 = z0.astype(jnp.int32)

    def corner(xi, zi):
        inside = ((xi >= 0) & (xi <= dim_x - 1) & (zi >= 0) & (zi <= dim_z - 1))
        idx = (jnp.clip(zi, 0, dim_z - 1) * dim_x
               + jnp.clip(xi, 0, dim_x - 1)).ravel()
        vals = jnp.take(g, idx, axis=1).reshape(dim_y, dim_x, dim_z)
        return jnp.where(inside[None], vals, cval)

    g00 = corner(x0, z0)
    g01 = corner(x0, z0 + 1)
    g10 = corner(x0 + 1, z0)
    g11 = corner(x0 + 1, z0 + 1)
    w00 = ((1 - wx) * (1 - wz))[None]
    w01 = ((1 - wx) * wz)[None]
    w10 = (wx * (1 - wz))[None]
    w11 = (wx * wz)[None]
    return g00 * w00 + g01 * w01 + g10 * w10 + g11 * w11


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def rotate_volume_zfirst_tfgrad(vol, theta, order=1, cval=0.0):
    """:func:`rotate_volume_zfirst` with the reference's gradient semantics.

    The exact VJP of bilinear sampling is a scatter-add (slow on TPU and
    resistant to fusion next to opaque custom calls). TensorFlow's
    ``tf.contrib.image.rotate`` — the rotation the reference engines
    differentiate through (ref tensorflow_recon/fullfield.py:96) — instead
    backpropagates by transforming the cotangent with the INVERSE rotation
    (ImageProjectiveTransform's registered gradient). This op reproduces
    that: backward = bilinear rotation of the cotangent by ``-theta`` —
    a gather, O(interpolation error) from the true adjoint, and the
    gradient the reference results were produced with.
    """
    return rotate_volume_zfirst(vol, theta, order=order, cval=cval)


def _rvzt_fwd(vol, theta, order, cval):
    return rotate_volume_zfirst(vol, theta, order=order, cval=cval), theta


def _rvzt_bwd(order, cval, theta, g):
    dvol = _rotate_back_zfirst(g, theta, cval=0.0)
    return dvol, jnp.zeros_like(theta)


rotate_volume_zfirst_tfgrad.defvjp(_rvzt_fwd, _rvzt_bwd)


# ---------------------------------------------------------------------------
# 3-shear rotation: every shear is a banded MATMUL, no gathers.
#
# On TPU the bilinear rotation above is gather-bound: XLA lowers the 4-corner
# flat gather to ~60 GB/s effective (measured on v5e at 256^3, ~3.6 ms per
# volume — slower than the entire fused multislice fwd+bwd it feeds). The
# classic 3-shear decomposition (Paeth 1986 / Unser 1995)
#     R(theta) = ShearX(-tan t/2) . ShearZ(sin t) . ShearX(-tan t/2)
# turns the rotation into three 1-D resamplings, and a 1-D linear resampling
# along one axis with per-row offsets is a 2-banded matrix — so each shear is
# one einsum against an on-the-fly banded matrix: pure MXU + elementwise,
# runs at HBM bandwidth (measured 1.6 ms per 256^3 volume, and the ADJOINT
# is just the transposed einsum — no scatter in the backward).
#
# Angles outside [-45 deg, 45 deg] are reduced by an exact quadrant
# pre-rotation (flips / transpose, lax.switch on round(theta / 90deg)).
#
# Semantics: same geometry as :func:`rotate_volume` (backward map, rotation
# about pixel center (N-1)/2, zero fill), but the interpolation is
# per-shear-linear rather than direct-bilinear: results differ by
# O(interpolation error); content within radius N/2*cos(22.5deg) of the
# rotation center never touches the array edge mid-shear (tomographic
# objects live inside the finite-support cylinder, so this is lossless for
# the reference workloads). Keep :func:`rotate_volume` for reference parity;
# use this as the fast path on TPU backends.
# ---------------------------------------------------------------------------

_SHEAR_PRECISION = "auto"


def _resolve_shear_precision():
    """'auto' -> (data=HIGH, weights=DEFAULT) on TPU, HIGHEST elsewhere.

    Validated end to end: the adhesin-64^3 closed loop reproduces the SAME
    FSC half-bit fraction (0.7097) and resolution as HIGHEST with 16%
    faster epochs; rotation fwd+bwd at 256^3 batch 10 measures 94 -> 71 ms
    (benchmarks/shear_bench.py). Max abs deviation 5.5e-3 on O(1) data —
    bf16 weight rounding, i.e. < 2^-8 of a pixel of effective sample
    shift, well inside the per-shear-linear vs bilinear method difference.
    """
    if _SHEAR_PRECISION == "auto":
        from .pallas_kernels import _on_tpu
        return ((jax.lax.Precision.HIGH, jax.lax.Precision.DEFAULT)
                if _on_tpu() else jax.lax.Precision.HIGHEST)
    return _SHEAR_PRECISION


def set_shear_precision(spec):
    """Set the MXU precision of the shear einsums.

    Accepts a Precision, a name, or a 2-tuple (data, weights) of either —
    e.g. ``('high', 'default')`` splits the field operand into two bf16
    passes while keeping the banded interpolation weights at plain bf16
    (2 MXU passes per matmul instead of HIGHEST's 6). Weight rounding at
    bf16 moves the effective sample position by < 2^-8 of a pixel — far
    below the per-shear-linear vs bilinear methodological difference — so
    the cheap mode is geometrically safe; the data operand keeps 2^-16
    relative accuracy. Returns the previous setting.
    """
    global _SHEAR_PRECISION
    prev = _SHEAR_PRECISION

    def one(p):
        if isinstance(p, str):
            return p if p == "auto" else getattr(jax.lax.Precision, p.upper())
        return p

    _SHEAR_PRECISION = (tuple(one(p) for p in spec)
                        if isinstance(spec, (tuple, list)) else one(spec))
    return prev


# Env override, e.g. BDT_SHEAR_PRECISION=high,default (data, weights) —
# lets benchmarks A/B the shear matmul precision without code changes.
_env_spec = os.environ.get("BDT_SHEAR_PRECISION")
if _env_spec:
    try:
        set_shear_precision(tuple(_env_spec.split(","))
                            if "," in _env_spec else _env_spec)
    except AttributeError:
        raise ValueError(
            "BDT_SHEAR_PRECISION=%r is not a valid precision spec; accepted "
            "values are 'auto', 'default', 'high', 'highest', or a "
            "comma-separated (data, weights) pair of those." % (_env_spec,)
        ) from None


def _shear_mats(shift, n):
    """(K, n, n) banded linear-interpolation matrices, zero fill.

    Row (k, o) has weight (1-f) at floor(o + shift[k]) and f at floor+1;
    out-of-range sources get no weight (exact zero fill, matching the
    bilinear path's constant-fill edge handling).
    """
    o = jnp.arange(n, dtype=jnp.float32)
    s = o[None, :] + shift[:, None]            # (K, O) absolute src coords
    kk = jnp.floor(s)
    f = s - kk
    x = jnp.arange(n, dtype=jnp.float32)
    m0 = (x[None, None, :] == kk[:, :, None]).astype(jnp.float32)
    m1 = (x[None, None, :] == kk[:, :, None] + 1.0).astype(jnp.float32)
    return (1.0 - f)[:, :, None] * m0 + f[:, :, None] * m1


def _shear3_core(vol, r, zfirst):
    """Rotate (Y, X, Z) by r in [-pi/4, pi/4] via 3 banded-matmul shears."""
    dim_y, dim_x, dim_z = vol.shape
    a = -jnp.tan(r / 2.0)
    b = jnp.sin(r)
    zc = jnp.arange(dim_z, dtype=jnp.float32) - (dim_z - 1) / 2.0
    xc = jnp.arange(dim_x, dtype=jnp.float32) - (dim_x - 1) / 2.0
    sx = _shear_mats(a * zc, dim_x)            # (Z, O, X)
    sz = _shear_mats(b * xc, dim_z)            # (X, O, Z)
    # ShearX: out[y,o,z] = sum_x S[z,o,x] vol[y,x,z]
    prec = _resolve_shear_precision()
    v = jnp.einsum("yxz,zox->yoz", vol, sx, precision=prec)
    # ShearZ: out[y,x,o] = sum_z T[x,o,z] v[y,x,z]
    v = jnp.einsum("yxz,xoz->yxo", v, sz, precision=prec)
    if zfirst:
        return jnp.einsum("yxz,zox->zyo", v, sx, precision=prec)
    return jnp.einsum("yxz,zox->yoz", v, sx, precision=prec)


def _quadrant_views(vol):
    """The four exact 90-degree pre-rotations of the (X, Z) plane.

    view_q[y, x, z] = vol at R(q*90deg) . (x, z) (centered backward map):
    q=1 -> transpose + flip Z-source, q=2 -> flip both, q=3 -> the other
    transpose. All are relayout/flip ops, no arithmetic.
    """
    return (lambda: vol,
            lambda: jnp.flip(jnp.swapaxes(vol, 1, 2), 2),
            lambda: jnp.flip(jnp.flip(vol, 1), 2),
            lambda: jnp.flip(jnp.swapaxes(vol, 1, 2), 1))


def rotate_volume_shear3(vol, theta, zfirst=False):
    """Rotate a (Y, X, Z) volume by ``theta`` (radians, any value) in the
    (X, Z) plane using three banded-matmul shears (fast path on TPU).

    ``zfirst=True`` emits (Z, Y, X) directly (the layout the fused
    multislice propagators consume). Differentiable in ``vol`` (adjoint
    einsums) and in ``theta`` (the fractional interpolation weights are
    smooth in theta almost everywhere).
    """
    if vol.shape[1] != vol.shape[2]:
        raise ValueError(
            "rotate_volume_shear3 needs a square (X, Z) plane, got %r — "
            "use rotate_volume (bilinear) for non-cubic volumes"
            % (vol.shape,))
    theta = jnp.asarray(theta, jnp.float32)
    q = jnp.round(theta / (np.pi / 2.0))
    r = theta - q * (np.pi / 2.0)
    qi = jnp.asarray(jnp.mod(q, 4.0), jnp.int32)
    views = _quadrant_views(vol)
    pre = jax.lax.switch(qi, views)
    return _shear3_core(pre, r, zfirst)


def rotate_pair_zfirst_shear3(obj_delta, obj_beta, theta):
    """Rotate delta AND beta by one angle, emitting (Z, Y, X) each.

    The two volumes are stacked along Y so the shear matrices are built once
    and every einsum runs with doubled M (better MXU utilization; the banded
    matrices are read from HBM once per shear instead of twice).
    """
    both = jnp.concatenate([obj_delta, obj_beta], axis=0)
    out = rotate_volume_shear3(both, theta, zfirst=True)   # (Z, 2Y, X)
    dim_y = obj_delta.shape[0]
    return out[:, :dim_y], out[:, dim_y:]


def rotate_stack(vols, theta, order=1, cval=0.0):
    """Rotate a stack (C, Y, X, Z) of volumes by one angle (vmapped)."""
    return jax.vmap(lambda v: rotate_volume(v, theta, order=order, cval=cval))(vols)


def rotation_lookup(array_size, n_theta, theta_st=0.0, theta_end=2 * np.pi):
    """Precompute nearest-neighbor rotation gather indices for each angle.

    TPU-native equivalent of ``save_rotation_lookup`` (ref util.py:721-778):
    instead of pickled per-angle coordinate files we return one int32 array of
    flat source indices, shape (n_theta, X*Z), directly usable as a gather map
    on the (X, Z) plane (identical for every Y row).

    Matches the reference geometry: origin at ``floor(N/2)``, coordinates
    rounded to nearest and clipped to the volume (ref util.py:723-758).
    """
    image_center = [np.floor(x / 2) for x in array_size]
    coord1 = np.arange(array_size[1])
    coord2 = np.arange(array_size[2])
    # (X*Z,) vectors ordered with X fastest varying over Z? Reference orders
    # coord1 (X) repeated per Z then tiled; equivalently a full meshgrid:
    c1, c2 = np.meshgrid(coord1, coord2, indexing="ij")
    coord1_vec = c1.ravel() - image_center[1]
    coord2_vec = c2.ravel() - image_center[2]
    coord_new = np.stack([coord1_vec, coord2_vec]).astype(np.float32)

    theta_ls = np.linspace(theta_st, theta_end, n_theta)
    inds = np.empty((n_theta, coord_new.shape[1]), dtype=np.int32)
    for i, theta in enumerate(theta_ls):
        m_rot = np.array([[np.cos(theta), -np.sin(theta)],
                          [np.sin(theta), np.cos(theta)]])
        coord_old = m_rot @ coord_new
        coord1_old = np.clip(np.round(coord_old[0] + image_center[1]).astype(np.int64),
                             0, array_size[1] - 1)
        coord2_old = np.clip(np.round(coord_old[1] + image_center[2]).astype(np.int64),
                             0, array_size[2] - 1)
        inds[i] = coord1_old * array_size[2] + coord2_old
    return inds


def apply_rotation_lookup(vol, flat_inds):
    """Rotate a (Y, X, Z) volume with a precomputed flat gather map.

    ``flat_inds`` is one row of :func:`rotation_lookup` (shape (X*Z,)).
    A pure gather — differentiable (the VJP is a scatter-add), replacing the
    reference's flat-index fancy-indexing rotation
    (ref cnn_propagator/util.py:377-402).
    """
    dim_y, dim_x, dim_z = vol.shape
    flat = vol.reshape(dim_y, dim_x * dim_z)
    return jnp.take(flat, flat_inds, axis=1).reshape(dim_y, dim_x, dim_z)
