"""Collective helpers: halo exchange over ICI and host-side control sync.

TPU-native replacements for the reference's raw MPI machinery:

* ``halo_exchange`` — per-slice exchange of a convolution apron between
  neighboring tiles of the wavefield plane, via ``lax.ppermute`` over a mesh
  axis (replaces the MPI send/recv of the absent ``mpi_conv_bp`` branch,
  ref README.md:6-11, SURVEY §5).
* ``broadcast_flag`` — convergence/stop flags across hosts (replaces the
  ``.stop_iteration`` shared-disk file and ``comm.bcast``,
  ref tensorflow_recon/fullfield.py:498-503,579-594).
"""

import jax
import jax.numpy as jnp

__all__ = ["halo_exchange_1d", "halo_pad_2d", "broadcast_flag"]


def halo_exchange_1d(x, halo, axis, axis_name, edge_val=0.0):
    """Pad ``x`` along ``axis`` with ``halo`` rows from the mesh neighbors.

    Inside ``shard_map``: each shard sends its leading/trailing ``halo`` slab
    to the previous/next rank on ``axis_name`` (ppermute rides the ICI ring).
    Boundary shards receive the analytic ``edge_val`` instead — matching the
    constant-pad edge-value tracking of the truncated-kernel propagator
    (ref cnn_propagator/propagation.py:77,91-99).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    lo = jax.lax.slice_in_dim(x, 0, halo, axis=axis)
    hi = jax.lax.slice_in_dim(x, x.shape[axis] - halo, x.shape[axis], axis=axis)

    if n == 1:
        # zeros + edge_val (not full_like): a traced edge_val may carry its
        # own varying-axes set under shard_map; the add unions it with x's
        recv_prev = jnp.zeros_like(lo) + edge_val
        recv_next = jnp.zeros_like(hi) + edge_val
        return jnp.concatenate([recv_prev, x, recv_next], axis=axis)

    # neighbor i receives my hi as its "prev" halo; my lo goes to i-1's "next"
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    recv_prev = jax.lax.ppermute(hi, axis_name, fwd)   # from idx-1
    recv_next = jax.lax.ppermute(lo, axis_name, bwd)   # from idx+1

    edge_lo = jnp.zeros_like(lo) + edge_val
    edge_hi = jnp.zeros_like(hi) + edge_val
    recv_prev = jnp.where(idx == 0, edge_lo, recv_prev)
    recv_next = jnp.where(idx == n - 1, edge_hi, recv_next)
    return jnp.concatenate([recv_prev, x, recv_next], axis=axis)


def halo_pad_2d(x, halo, axis_names=("ty", "tx"), axes=(-2, -1), edge_val=0.0):
    """2D halo exchange: pad the (Y, X) tile with neighbor data on both axes.

    Applied Y-then-X; the corner regions end up as edge_val-extended values of
    the exchanged strips, exactly matching a constant-pad of the *global*
    plane when the kernel is separable (which the truncated Fresnel kernel
    is — see ops.tiled).
    """
    ax_y = axes[0] % x.ndim
    ax_x = axes[1] % x.ndim
    x = halo_exchange_1d(x, halo, ax_y, axis_names[0], edge_val)
    x = halo_exchange_1d(x, halo, ax_x, axis_names[1], edge_val)
    return x


def broadcast_flag(flag, is_source=None):
    """Agree on a boolean across hosts.

    On TPU pods every host computes the same (psum-reduced) loss, so the flag
    is already consistent; this helper exists for host-dependent decisions and
    uses ``multihost_utils`` when running multi-process.
    """
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils
    arr = jnp.asarray([1 if flag else 0], jnp.int32)
    out = multihost_utils.broadcast_one_to_all(arr)
    return bool(out[0])
