"""Tiling-capable truncated-kernel multislice propagator (+ halo exchange).

TPU-native rebuild of the repository's headline contribution: replacing the
global-FFT Fresnel step (an all-to-all dependency) with convolution by a
**truncated impulse-response kernel**, so the transverse plane can be
domain-decomposed with only a halo of ``(kernel_size-1)/2`` pixels exchanged
per slice (ref cnn_propagator/propagation.py:18-133; the MPI implementations
live on the reference's absent ``mpi_conv_bp`` branch, ref README.md:6-11).

TPU-first redesign
------------------
1. **Separable kernel -> MXU matmuls.** The Fresnel transfer function factors
   exactly: ``H(u,v) = e^{ikd} f(u) f(v)`` with ``f(u)=e^{-i pi lambda d u^2}``,
   and every step of the reference's kernel construction (ifftshift, ifft2,
   fftshift, center crop — ref propagation.py:35-44) factors along the two
   axes. The truncated k x k kernel is therefore an exact outer product
   ``K = s * ky kx^T``, and the 2-D convolution becomes two 1-D convolutions.
   Each 1-D valid convolution of the padded field is expressed as a banded
   Toeplitz **matmul**, which runs on the MXU instead of the VPU — O(2k N^2)
   flops at matrix-unit throughput instead of O(k^2 N^2) scalar taps.
2. **Halo exchange over ICI.** The distributed version shard_maps the plane
   over ``(ty, tx)`` mesh axes; per slice each tile ppermutes its
   ``(k-1)/2``-pixel apron to its neighbors (boundary tiles receive the
   analytically-tracked constant edge value, ref propagation.py:77,91-99).
3. **Analytic edge tracking + renormalization** exactly as the reference:
   the constant pad value evolves as ``edge *= sum(K)`` per slice
   (ref propagation.py:99) and the exit wave is rescaled so the corner pixel
   matches its incident value (ref propagation.py:109-110).
"""


import numpy as np
import jax
import jax.numpy as jnp

from ..constants import PI
from .fresnel import get_kernel, get_kernel_ir, ifftshift2
from ..parallel.collectives import halo_exchange_1d

try:  # jax >= 0.4.35
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

from jax.sharding import PartitionSpec as P

__all__ = ["truncated_kernel_1d", "truncated_kernel", "conv_matrices",
           "multislice_propagate_cnn", "multislice_propagate_tiled"]


def truncated_kernel_1d(dist_nm, lmbda_nm, voxel_nm, n_freq, kernel_size):
    """1-D factor of the truncated real-space Fresnel kernel.

    Frequency grid: inclusive linspace over [-1/(2 dx), 1/(2 dx)] with
    ``n_freq`` points (the reference builds H on a ``grid_shape - 1`` grid,
    ref propagation.py:35 — callers pass n-1). Returns complex128 (k,).
    """
    u_max = 1.0 / (2.0 * voxel_nm)
    u = np.linspace(-u_max, u_max, n_freq)
    f = np.exp(-1j * PI * lmbda_nm * dist_nm * u ** 2)
    g = np.fft.fftshift(np.fft.ifft(np.fft.ifftshift(f)))
    mid = (len(g) - 1) // 2
    half = (kernel_size - 1) // 2
    return g[mid - half: mid + half + 1]


def truncated_kernel(dist_nm, lmbda_nm, voxel_nm, grid_shape, kernel_size):
    """Separable truncated kernel: returns ``(ky, kx, scale)``.

    ``K2d = scale * outer(ky, kx)`` reproduces the reference's
    center-crop-of-ifft2 kernel exactly (verified in tests to ~1e-12):
    every step of ifftshift -> ifft2 -> fftshift -> crop factors per axis.
    ``grid_shape`` is the (Y, X) plane shape; the frequency grid uses
    ``grid_shape - 1`` points, faithful to the reference quirk.
    """
    ky = truncated_kernel_1d(dist_nm, lmbda_nm, voxel_nm[0],
                             grid_shape[0] - 1, kernel_size)
    kx = truncated_kernel_1d(dist_nm, lmbda_nm, voxel_nm[1],
                             grid_shape[1] - 1, kernel_size)
    scale = np.exp(1j * 2.0 * PI / lmbda_nm * dist_nm)
    return ky, kx, scale


def _conv_matrix_1d(kernel_1d, n_out):
    """Banded matrix G (n_out, n_out + k - 1): valid *convolution* of the
    padded axis. G[i, i+j] = kernel[k-1-j] (true convolution flips)."""
    k = len(kernel_1d)
    flipped = kernel_1d[::-1]
    G = np.zeros((n_out, n_out + k - 1), dtype=np.complex128)
    for j in range(k):
        idx = np.arange(n_out)
        G[idx, idx + j] = flipped[j]
    return G


def conv_matrices(ky, kx, scale, tile_shape):
    """Build the per-axis banded conv matrices for a (ty, tx) tile.

    The global phase ``scale`` is folded into the Y matrix. complex64.
    """
    Gy = (_conv_matrix_1d(ky, tile_shape[0]) * scale).astype(np.complex64)
    Gx = _conv_matrix_1d(kx, tile_shape[1]).astype(np.complex64)
    return Gy, Gx


def _conv_step(w_pad, Gy, Gx):
    """Separable valid convolution of a padded (B, Y+2p, X+2p) field.

    Two complex matmuls — both land on the MXU:
      tmp[b, i, x'] = sum_j Gy[i, j] w_pad[b, j, x']
      out[b, i, x]  = sum_j tmp[b, i, j] Gx[x, j]
    """
    prec = jax.lax.Precision.HIGHEST
    tmp = jnp.einsum("ij,bjx->bix", Gy, w_pad, precision=prec)
    return jnp.einsum("xj,bij->bix", Gx, tmp, precision=prec)


def _kar_einsum(spec, gr, gi, wr, wi):
    """Karatsuba complex einsum on split pairs: (gr+i gi) . (wr+i wi).

    Explicit HIGHEST precision: the TPU einsum default is bf16, which would
    silently degrade the propagator below the 1e-6 parity target.
    """
    prec = jax.lax.Precision.HIGHEST
    t1 = jnp.einsum(spec, gr, wr, precision=prec)
    t2 = jnp.einsum(spec, gi, wi, precision=prec)
    t3 = jnp.einsum(spec, gr + gi, wr + wi, precision=prec)
    return t1 - t2, t3 - t1 - t2


def _conv_step_split(wr, wi, GyR, GyI, GxR, GxI):
    """Split-complex twin of :func:`_conv_step` (for complex-free backends)."""
    tr, ti = _kar_einsum("ij,bjx->bix", GyR, GyI, wr, wi)
    return _kar_einsum("xj,bij->bix", GxR, GxI, tr, ti)


def _norm_psize(psize_cm):
    psize_cm = np.asarray(psize_cm, dtype=np.float64)
    if psize_cm.ndim == 0:
        psize_cm = np.array([float(psize_cm)] * 3)
    return psize_cm


def _free_space_cnn(probe, free_prop_cm, lmbda_nm, voxel_nm, grid_shape,
                    size_nm, algorithm="TF"):
    """Final free-space step of the conv propagator (ref propagation.py:112-128)."""
    if isinstance(free_prop_cm, str) and free_prop_cm == "inf":
        return jnp.fft.fftshift(jnp.fft.fft2(probe), axes=(-2, -1))
    dist_nm = free_prop_cm * 1e7
    if algorithm == "auto":
        mean_voxel_nm = np.prod(voxel_nm) ** (1.0 / 3)
        crit_samp = lmbda_nm * dist_nm / (np.prod(size_nm) ** (1.0 / 3))
        algorithm = "TF" if mean_voxel_nm > crit_samp else "IR"
    builder = get_kernel if algorithm == "TF" else get_kernel_ir
    h = builder(dist_nm, lmbda_nm, voxel_nm, grid_shape)
    return jnp.fft.ifft2(jnp.fft.fft2(probe) * jnp.asarray(ifftshift2(h)))


def multislice_propagate_cnn(grid_delta, grid_beta, probe, energy_ev, psize_cm,
                             kernel_size=17, free_prop_cm=None, remat=True,
                             renormalize=True):
    """Serial truncated-kernel convolution multislice (single device).

    Faithful rebuild of ``multislice_propagate_cnn``
    (ref cnn_propagator/propagation.py:18-133) with the separable-matmul
    formulation. grids are (B, Y, X, Z); probe (Y, X) or (B, Y, X) complex.

    Note for AD reconstruction: the corner-pixel renormalization
    (ref propagation.py:109-110) concentrates extra gradient on one pixel;
    the conv forward typically needs a ~100x smaller learning rate than the
    FFT forward for the same workload (or pass ``renormalize=False``).
    """
    assert kernel_size % 2 == 1, "kernel_size must be an odd number."
    grid_delta = jnp.asarray(grid_delta, jnp.float32)
    grid_beta = jnp.asarray(grid_beta, jnp.float32)
    n_batch, dim_y, dim_x, n_slice = grid_delta.shape
    psize = _norm_psize(psize_cm)
    voxel_nm = psize * 1.0e7
    lmbda_nm = 1240.0 / energy_ev
    delta_nm = voxel_nm[-1]
    k = np.float32(2.0 * PI * delta_nm / lmbda_nm)
    size_nm = voxel_nm * np.array([dim_y, dim_x, n_slice])

    ky, kx, scale = truncated_kernel(delta_nm, lmbda_nm, voxel_nm,
                                     (dim_y, dim_x), kernel_size)
    Gy, Gx = conv_matrices(ky, kx, scale, (dim_y, dim_x))
    Gy = jnp.asarray(Gy)
    Gx = jnp.asarray(Gx)
    ksum = np.complex64(scale * ky.sum() * kx.sum())
    pad = (kernel_size - 1) // 2

    probe = jnp.asarray(probe)
    if probe.ndim == 2:
        probe = probe[None]
    w = jnp.broadcast_to(probe.astype(jnp.complex64), (n_batch, dim_y, dim_x))
    initial = w[0, 0, 0]

    delta_z = jnp.moveaxis(grid_delta, -1, 0)
    beta_z = jnp.moveaxis(grid_beta, -1, 0)

    def step(carry, slices):
        w, edge = carry
        d, b = slices
        w = w * jnp.exp(jax.lax.complex(-k * b, k * d))
        w_pad = jnp.pad(w, ((0, 0), (pad, pad), (pad, pad)),
                        constant_values=1.0).astype(jnp.complex64)
        # jnp.pad requires a static fill; apply the traced edge value instead
        mask = jnp.pad(jnp.ones((dim_y, dim_x), jnp.complex64),
                       ((pad, pad), (pad, pad)), constant_values=0.0)
        w_pad = jnp.where(mask == 0, edge, w_pad)
        w = _conv_step(w_pad, Gy, Gx)
        edge = edge * ksum
        return (w, edge), None

    if remat:
        step = jax.checkpoint(step)
    (w, edge), _ = jax.lax.scan(step, (w, jnp.complex64(1.0)),
                                (delta_z, beta_z))
    if renormalize:
        w = w * (initial / w[0, 0, 0])

    if free_prop_cm is not None:
        w = _free_space_cnn(w, free_prop_cm, lmbda_nm, voxel_nm,
                            (dim_y, dim_x), size_nm)
    return w


def multislice_propagate_tiled(grid_delta, grid_beta, probe, energy_ev, psize_cm,
                               mesh, kernel_size=17, free_prop_cm=None,
                               remat=True, renormalize=True):
    """Distributed truncated-kernel multislice over a ``(ty, tx)`` tile mesh.

    The transverse plane is domain-decomposed over the mesh's spatial axes;
    per slice each tile exchanges a ``(kernel_size-1)/2`` halo with its
    neighbors via ``lax.ppermute`` (ICI), boundary tiles extend with the
    analytically-tracked edge value. Bitwise-equivalent to
    :func:`multislice_propagate_cnn` (up to reduction order) — the
    sharded-vs-serial consistency test in tests/test_tiled.py is the
    "tiled == global" validation called for by SURVEY §7.6.

    grids: (B, Y, X, Z); Y must divide mesh ty-size, X the tx-size.
    """
    assert kernel_size % 2 == 1, "kernel_size must be an odd number."
    grid_delta = jnp.asarray(grid_delta, jnp.float32)
    grid_beta = jnp.asarray(grid_beta, jnp.float32)
    n_batch, dim_y, dim_x, n_slice = grid_delta.shape
    n_ty = mesh.shape["ty"]
    n_tx = mesh.shape["tx"]
    assert dim_y % n_ty == 0 and dim_x % n_tx == 0
    tile_y, tile_x = dim_y // n_ty, dim_x // n_tx
    pad = (kernel_size - 1) // 2
    assert pad <= tile_y and pad <= tile_x, \
        "halo wider than tile; use fewer tiles or a smaller kernel"

    psize = _norm_psize(psize_cm)
    voxel_nm = psize * 1.0e7
    lmbda_nm = 1240.0 / energy_ev
    delta_nm = voxel_nm[-1]
    k = np.float32(2.0 * PI * delta_nm / lmbda_nm)
    size_nm = voxel_nm * np.array([dim_y, dim_x, n_slice])

    ky, kx, scale = truncated_kernel(delta_nm, lmbda_nm, voxel_nm,
                                     (dim_y, dim_x), kernel_size)
    Gy, Gx = conv_matrices(ky, kx, scale, (tile_y, tile_x))
    Gy = jnp.asarray(Gy)
    Gx = jnp.asarray(Gx)
    ksum = np.complex64(scale * ky.sum() * kx.sum())

    probe = jnp.asarray(probe)
    if probe.ndim == 2:
        probe = probe[None]
    probe = jnp.broadcast_to(probe.astype(jnp.complex64),
                             (n_batch, dim_y, dim_x))

    def tile_fn(gd, gb, w):
        # shapes here are per-tile: (B, tile_y, tile_x, Z) and (B, tile_y, tile_x)
        dz = jnp.moveaxis(gd, -1, 0)
        bz = jnp.moveaxis(gb, -1, 0)

        def step(carry, slices):
            w, edge = carry
            d, b = slices
            w = w * jnp.exp(jax.lax.complex(-k * b, k * d))
            w = w.astype(jnp.complex64)
            # halo exchange: interior edges get true neighbor data over ICI,
            # boundary edges the analytic constant (ref propagation.py:91-99)
            w_pad = halo_exchange_1d(w, pad, 1, "ty", edge_val=edge)
            w_pad = halo_exchange_1d(w_pad, pad, 2, "tx", edge_val=edge)
            w = _conv_step(w_pad, Gy, Gx)
            edge = edge * ksum
            return (w, edge), None

        step_fn = jax.checkpoint(step) if remat else step
        (w, edge), _ = jax.lax.scan(step_fn, (w, jnp.complex64(1.0)), (dz, bz))
        return w

    out = shard_map(tile_fn, mesh,
                    in_specs=(P(None, "ty", "tx", None), P(None, "ty", "tx", None),
                              P(None, "ty", "tx")),
                    out_specs=P(None, "ty", "tx"))(grid_delta, grid_beta, probe)

    if renormalize:
        out = out * (probe[0, 0, 0] / out[0, 0, 0])
    if free_prop_cm is not None:
        out = _free_space_cnn(out, free_prop_cm, lmbda_nm, voxel_nm,
                              (dim_y, dim_x), size_nm)
    return out


def multislice_propagate_cnn_split(grid_delta, grid_beta, probe_re, probe_im,
                                   energy_ev, psize_cm, kernel_size=17,
                                   free_prop_cm=None, remat=True,
                                   renormalize=True):
    """Split-complex serial truncated-kernel multislice (no complex dtypes).

    Same physics/edge-tracking/renormalization as
    :func:`multislice_propagate_cnn`, carried as (re, im) float32 pairs for
    TPU runtime builds without complex64 support. Returns ``(re, im)``.
    The final free-space step (if any) runs through the split matmul-DFT.
    """
    assert kernel_size % 2 == 1, "kernel_size must be an odd number."
    from .splitfft import apply_kernel_split_perm, permute_kernel_2d, cfft2_split

    grid_delta = jnp.asarray(grid_delta, jnp.float32)
    grid_beta = jnp.asarray(grid_beta, jnp.float32)
    n_batch, dim_y, dim_x, n_slice = grid_delta.shape
    psize = _norm_psize(psize_cm)
    voxel_nm = psize * 1.0e7
    lmbda_nm = 1240.0 / energy_ev
    delta_nm = voxel_nm[-1]
    k = np.float32(2.0 * PI * delta_nm / lmbda_nm)
    size_nm = voxel_nm * np.array([dim_y, dim_x, n_slice])

    ky, kx, scale = truncated_kernel(delta_nm, lmbda_nm, voxel_nm,
                                     (dim_y, dim_x), kernel_size)
    Gy, Gx = conv_matrices(ky, kx, scale, (dim_y, dim_x))
    GyR = jnp.asarray(np.real(Gy))
    GyI = jnp.asarray(np.imag(Gy))
    GxR = jnp.asarray(np.real(Gx))
    GxI = jnp.asarray(np.imag(Gx))
    ksum = complex(scale * ky.sum() * kx.sum())
    pad = (kernel_size - 1) // 2

    wr = jnp.broadcast_to(jnp.asarray(probe_re, jnp.float32),
                          (n_batch, dim_y, dim_x))
    wi = jnp.broadcast_to(jnp.asarray(probe_im, jnp.float32),
                          (n_batch, dim_y, dim_x))
    init_r, init_i = wr[0, 0, 0], wi[0, 0, 0]

    delta_z = jnp.moveaxis(grid_delta, -1, 0)
    beta_z = jnp.moveaxis(grid_beta, -1, 0)
    pad_mask = jnp.pad(jnp.ones((dim_y, dim_x), jnp.float32),
                       ((pad, pad), (pad, pad)), constant_values=0.0)

    def step(carry, slices):
        wr, wi, er, ei = carry
        d, b = slices
        amp = jnp.exp(-k * b)
        cr = amp * jnp.cos(k * d)
        ci = amp * jnp.sin(k * d)
        wr, wi = wr * cr - wi * ci, wr * ci + wi * cr
        wrp = jnp.pad(wr, ((0, 0), (pad, pad), (pad, pad)))
        wip = jnp.pad(wi, ((0, 0), (pad, pad), (pad, pad)))
        wrp = jnp.where(pad_mask == 0, er, wrp)
        wip = jnp.where(pad_mask == 0, ei, wip)
        wr, wi = _conv_step_split(wrp, wip, GyR, GyI, GxR, GxI)
        er, ei = (er * np.float32(ksum.real) - ei * np.float32(ksum.imag),
                  er * np.float32(ksum.imag) + ei * np.float32(ksum.real))
        return (wr, wi, er, ei), None

    if remat:
        step = jax.checkpoint(step)
    (wr, wi, er, ei), _ = jax.lax.scan(
        step, (wr, wi, jnp.float32(1.0), jnp.float32(0.0)), (delta_z, beta_z))

    if renormalize:
        # w *= (init / w[0,0,0]) in split arithmetic
        fr, fi = wr[0, 0, 0], wi[0, 0, 0]
        denom = fr * fr + fi * fi
        sr = (init_r * fr + init_i * fi) / denom
        si = (init_i * fr - init_r * fi) / denom
        wr, wi = wr * sr - wi * si, wr * si + wi * sr

    if free_prop_cm is not None:
        if isinstance(free_prop_cm, str) and free_prop_cm == "inf":
            wr, wi = cfft2_split(wr, wi)
            wr = jnp.fft.fftshift(wr, axes=(-2, -1))
            wi = jnp.fft.fftshift(wi, axes=(-2, -1))
        else:
            h = get_kernel(free_prop_cm * 1e7, lmbda_nm, voxel_nm,
                           (dim_y, dim_x))
            h_p = permute_kernel_2d(ifftshift2(np.asarray(h)))
            wr, wi = apply_kernel_split_perm(
                wr, wi, jnp.asarray(np.real(h_p).astype(np.float32)),
                jnp.asarray(np.imag(h_p).astype(np.float32)))
    return wr, wi


def multislice_propagate_tiled_split(grid_delta, grid_beta, probe_re, probe_im,
                                     energy_ev, psize_cm, mesh, kernel_size=17,
                                     free_prop_cm=None, remat=True,
                                     renormalize=True):
    """Split-complex halo-exchange tiled multislice over a (ty, tx) mesh.

    The complex-free twin of :func:`multislice_propagate_tiled` — per-slice
    ppermute halo exchange of (re, im) strips over ICI. Returns ``(re, im)``.
    The final sample-to-detector step (``free_prop_cm``) runs through the
    split matmul-DFT on the gathered plane (GSPMD inserts the collectives).
    """
    assert kernel_size % 2 == 1, "kernel_size must be an odd number."
    grid_delta = jnp.asarray(grid_delta, jnp.float32)
    grid_beta = jnp.asarray(grid_beta, jnp.float32)
    n_batch, dim_y, dim_x, n_slice = grid_delta.shape
    n_ty = mesh.shape["ty"]
    n_tx = mesh.shape["tx"]
    assert dim_y % n_ty == 0 and dim_x % n_tx == 0
    tile_y, tile_x = dim_y // n_ty, dim_x // n_tx
    pad = (kernel_size - 1) // 2
    assert pad <= tile_y and pad <= tile_x

    psize = _norm_psize(psize_cm)
    voxel_nm = psize * 1.0e7
    lmbda_nm = 1240.0 / energy_ev
    delta_nm = voxel_nm[-1]
    k = np.float32(2.0 * PI * delta_nm / lmbda_nm)

    ky, kx, scale = truncated_kernel(delta_nm, lmbda_nm, voxel_nm,
                                     (dim_y, dim_x), kernel_size)
    Gy, Gx = conv_matrices(ky, kx, scale, (tile_y, tile_x))
    GyR = jnp.asarray(np.real(Gy))
    GyI = jnp.asarray(np.imag(Gy))
    GxR = jnp.asarray(np.real(Gx))
    GxI = jnp.asarray(np.imag(Gx))
    ksum = complex(scale * ky.sum() * kx.sum())

    probe_re = jnp.broadcast_to(jnp.asarray(probe_re, jnp.float32),
                                (n_batch, dim_y, dim_x))
    probe_im = jnp.broadcast_to(jnp.asarray(probe_im, jnp.float32),
                                (n_batch, dim_y, dim_x))

    def tile_fn(gd, gb, wr0, wi0):
        dz = jnp.moveaxis(gd, -1, 0)
        bz = jnp.moveaxis(gb, -1, 0)

        def step(carry, slices):
            wr, wi, er, ei = carry
            d, b = slices
            amp = jnp.exp(-k * b)
            cr = amp * jnp.cos(k * d)
            ci = amp * jnp.sin(k * d)
            wr, wi = wr * cr - wi * ci, wr * ci + wi * cr
            wrp = halo_exchange_1d(wr, pad, 1, "ty", edge_val=er)
            wrp = halo_exchange_1d(wrp, pad, 2, "tx", edge_val=er)
            wip = halo_exchange_1d(wi, pad, 1, "ty", edge_val=ei)
            wip = halo_exchange_1d(wip, pad, 2, "tx", edge_val=ei)
            wr, wi = _conv_step_split(wrp, wip, GyR, GyI, GxR, GxI)
            er, ei = (er * np.float32(ksum.real) - ei * np.float32(ksum.imag),
                      er * np.float32(ksum.imag) + ei * np.float32(ksum.real))
            return (wr, wi, er, ei), None

        step_fn = jax.checkpoint(step) if remat else step
        (wr, wi, er, ei), _ = jax.lax.scan(
            step_fn, (wr0, wi0, jnp.float32(1.0), jnp.float32(0.0)), (dz, bz))
        return wr, wi

    wr, wi = shard_map(tile_fn, mesh,
                       in_specs=(P(None, "ty", "tx", None),
                                 P(None, "ty", "tx", None),
                                 P(None, "ty", "tx"), P(None, "ty", "tx")),
                       out_specs=(P(None, "ty", "tx"), P(None, "ty", "tx")))(
        grid_delta, grid_beta, probe_re, probe_im)

    if renormalize:
        fr, fi = wr[0, 0, 0], wi[0, 0, 0]
        init_r, init_i = probe_re[0, 0, 0], probe_im[0, 0, 0]
        denom = fr * fr + fi * fi
        sr = (init_r * fr + init_i * fi) / denom
        si = (init_i * fr - init_r * fi) / denom
        wr, wi = wr * sr - wi * si, wr * si + wi * sr

    if free_prop_cm is not None:
        from .splitfft import (apply_kernel_split_perm, permute_kernel_2d,
                               cfft2_split)
        if isinstance(free_prop_cm, str) and free_prop_cm == "inf":
            wr, wi = cfft2_split(wr, wi)
            wr = jnp.fft.fftshift(wr, axes=(-2, -1))
            wi = jnp.fft.fftshift(wi, axes=(-2, -1))
        else:
            h = get_kernel(free_prop_cm * 1e7, lmbda_nm, voxel_nm,
                           (dim_y, dim_x))
            h_p = permute_kernel_2d(ifftshift2(np.asarray(h)))
            wr, wi = apply_kernel_split_perm(
                wr, wi, jnp.asarray(np.real(h_p).astype(np.float32)),
                jnp.asarray(np.imag(h_p).astype(np.float32)))
    return wr, wi
