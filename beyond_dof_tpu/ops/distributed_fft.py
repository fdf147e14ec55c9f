"""Transpose-based distributed 2-D FFT over a sharded wavefield plane.

The cross-validation alternative to the halo-exchange tiled propagator called
for by SURVEY §7.6c: the reference's absent ``mpi_conv_bp`` branch compared
its MPI conv propagator against distributed PFFT runs
(benchmark_pfft_zp.py, ref README.md:6-11). Here the same comparison is a
``shard_map`` FFT with ``lax.all_to_all`` transposes over ICI:

  rows sharded on ``ty`` -> local FFT along X -> all_to_all (reshard on X)
  -> local FFT along Y -> all_to_all back to row sharding.

Combined with the transfer-function multiply this gives a fully distributed
FFT multislice step whose results match the (bitwise-validated) halo-exchange
propagator in the large-kernel limit.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .fresnel import get_kernel, ifftshift2
from ..constants import PI

try:
    from jax import shard_map as _shard_map

    def _smap(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def _smap(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)

__all__ = ["fft2_distributed", "ifft2_distributed",
           "multislice_propagate_fft_distributed"]


def fft2_distributed(x, mesh, axis_name="ty"):
    """2-D FFT of (..., Y, X) arrays with Y sharded over ``axis_name``.

    Returns the FFT with the same (row-sharded) layout. Uses two
    ``all_to_all`` transposes; all FFTs are node-local ``jnp.fft`` calls.
    """
    n = mesh.shape[axis_name]

    def local(xl):
        # xl: (..., Y/n, X)
        xl = jnp.fft.fft(xl, axis=-1)              # FFT along X (local)
        *lead, yl, xdim = xl.shape
        xc = xdim // n
        a = xl.reshape(*lead, yl, n, xc)
        a = jnp.moveaxis(a, -2, 0)                 # (n, ..., Yl, Xc)
        a = jax.lax.all_to_all(a, axis_name, 0, 0)
        # a[k] = Y-block k of our X chunk -> assemble full Y
        a = jnp.concatenate([a[k] for k in range(n)], axis=-2)  # (..., Y, Xc)
        a = jnp.fft.fft(a, axis=-2)                # FFT along Y (local)
        # transpose back to row sharding
        a = a.reshape(*lead, n, yl, xc)
        a = jnp.moveaxis(a, -3, 0)                 # (n, ..., Yl, Xc)
        a = jax.lax.all_to_all(a, axis_name, 0, 0)
        a = jnp.concatenate([a[k] for k in range(n)], axis=-1)  # (..., Yl, X)
        return a

    spec = P(*([None] * (x.ndim - 2)), axis_name, None)
    return _smap(local, mesh, in_specs=(spec,), out_specs=spec)(x)


def ifft2_distributed(x, mesh, axis_name="ty"):
    """Inverse of :func:`fft2_distributed` (conjugation trick)."""
    out = fft2_distributed(jnp.conj(x), mesh, axis_name)
    scale = 1.0 / (x.shape[-2] * x.shape[-1])
    return jnp.conj(out) * scale


def multislice_propagate_fft_distributed(grid_delta, grid_beta, probe,
                                         energy_ev, psize_cm, mesh,
                                         axis_name="ty", remat=True):
    """Distributed-FFT multislice: the PFFT cross-validation path.

    Same physics as ``multislice_propagate_batch`` (propagate after every
    slice, no final free space) with the per-slice Fresnel step running
    through :func:`fft2_distributed` over row-sharded fields.
    grids: (B, Y, X, Z) sharded on Y.
    """
    grid_delta = jnp.asarray(grid_delta, jnp.float32)
    grid_beta = jnp.asarray(grid_beta, jnp.float32)
    batch, dim_y, dim_x, n_slice = grid_delta.shape
    n = mesh.shape[axis_name]
    assert dim_y % n == 0 and dim_x % n == 0
    voxel_nm = np.array([psize_cm] * 3) * 1.0e7
    lmbda_nm = 1240.0 / energy_ev
    k = np.float32(2.0 * PI * voxel_nm[-1] / lmbda_nm)
    h_if = ifftshift2(get_kernel(voxel_nm[-1], lmbda_nm, voxel_nm,
                                 (dim_y, dim_x)))
    h_if = jnp.asarray(h_if)
    probe = jnp.asarray(probe)
    if probe.ndim == 2:
        probe = probe[None]
    w = jnp.broadcast_to(probe.astype(jnp.complex64), (batch, dim_y, dim_x))

    def local(gd, gb, w, h):
        dz = jnp.moveaxis(gd, -1, 0)
        bz = jnp.moveaxis(gb, -1, 0)
        yl, xdim = w.shape[-2], w.shape[-1]
        nloc = jax.lax.axis_size(axis_name)

        def fft2_local(a):
            a = jnp.fft.fft(a, axis=-1)
            lead = a.shape[:-2]
            xc = xdim // nloc
            a = a.reshape(*lead, yl, nloc, xc)
            a = jnp.moveaxis(a, -2, 0)
            a = jax.lax.all_to_all(a, axis_name, 0, 0)
            a = jnp.concatenate([a[i] for i in range(nloc)], axis=-2)
            a = jnp.fft.fft(a, axis=-2)
            a = a.reshape(*lead, nloc, yl, xc)
            a = jnp.moveaxis(a, -3, 0)
            a = jax.lax.all_to_all(a, axis_name, 0, 0)
            return jnp.concatenate([a[i] for i in range(nloc)], axis=-1)

        def ifft2_local(a):
            out = jnp.conj(fft2_local(jnp.conj(a)))
            return out / (dim_y * dim_x)

        def step(w, slices):
            d, b = slices
            w = w * jnp.exp(jax.lax.complex(-k * b, k * d))
            w = ifft2_local(fft2_local(w) * h)
            return w, None

        step_fn = jax.checkpoint(step) if remat else step
        w, _ = jax.lax.scan(step_fn, w, (dz, bz))
        return w

    return _smap(local, mesh,
                 in_specs=(P(None, axis_name, None, None),
                           P(None, axis_name, None, None),
                           P(None, axis_name, None),
                           P(axis_name, None)),
                 out_specs=P(None, axis_name, None))(
        grid_delta, grid_beta, w, h_if)
