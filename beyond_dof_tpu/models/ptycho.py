"""Ptycho-tomography forward model.

TPU-native rebuild of the ptychographic ``rotate_and_project``
(ref tensorflow_recon/ptychography.py:37-97, cnn_propagator/ptychography.py:30-81).

Static-shape redesign: the reference pads the rotated object with Python-side
``if`` logic and slices probe windows in a Python loop (graph-unrolled). Here
the pad amounts are computed once on the host from the full position set
(they are data-independent), and window extraction is a vmapped
``lax.dynamic_slice`` — one compiled program for any minibatch of positions.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.rotate import rotate_volume
from ..ops.multislice import multislice_propagate_batch, multislice_propagate_fd

__all__ = ["compute_pad_arr", "extract_patches", "ptycho_forward", "ptycho_loss"]


def compute_pad_arr(probe_pos, probe_size, obj_size):
    """Static padding needed so every probe window fits in the object.

    (ref ptychography.py:45-61.) Returns a (2, 2) int array of
    ((top, bottom), (left, right)) pad lengths for the (Y, X) axes.
    """
    probe_pos = np.asarray(probe_pos)
    half = (np.asarray(probe_size) / 2).astype(int)
    pad_arr = np.zeros((2, 2), dtype=int)
    if probe_pos[:, 0].min() - half[0] < 0:
        pad_arr[0, 0] = half[0] - probe_pos[:, 0].min()
    if probe_pos[:, 0].max() + half[0] > obj_size[0]:
        pad_arr[0, 1] = probe_pos[:, 0].max() + half[0] - obj_size[0]
    if probe_pos[:, 1].min() - half[1] < 0:
        pad_arr[1, 0] = half[1] - probe_pos[:, 1].min()
    if probe_pos[:, 1].max() + half[1] > obj_size[1]:
        # faithful to the reference's use of half[0] here (ref ptychography.py:59)
        pad_arr[1, 1] = probe_pos[:, 1].max() + half[0] - obj_size[1]
    return pad_arr


def extract_patches(vol, pos_batch, probe_size, pad_arr):
    """Gather probe-sized (py, px, Z) windows at a batch of (y, x) positions.

    ``vol`` is the already-padded rotated volume; positions are raw probe
    coordinates (pad offset applied here). vmapped ``lax.dynamic_slice`` —
    shapes static, start indices traced.
    """
    half = (np.asarray(probe_size) / 2).astype(int)
    off = np.array([pad_arr[0, 0] - half[0], pad_arr[1, 0] - half[1]], dtype=np.int32)

    def one(pos):
        start = (pos[0] + off[0], pos[1] + off[1], 0)
        return jax.lax.dynamic_slice(vol, start,
                                     (probe_size[0], probe_size[1], vol.shape[2]))

    return jax.vmap(one)(jnp.asarray(pos_batch, jnp.int32))


def _map_position_chunks(fn, pos_batch, n_dp_batch, remat=True):
    """Run ``fn(pos_chunk)`` over ``n_dp_batch``-position chunks via lax.map.

    The reference propagates probe windows in ``n_dp_batch`` chunks so the
    full position minibatch's patches/wavefields never coexist in memory
    (ref ptychography.py:40,64-91) — at 529 positions of 72^2 windows over
    256^3 the unchunked transients exceed HBM (23.8 GB needed). With
    ``remat`` fn is checkpointed so the backward also peaks at one chunk;
    remat=False callers trade that memory bound for no recompute. The last
    chunk is padded by repeating the final position; padded outputs are
    sliced off.
    """
    m = pos_batch.shape[0]
    if n_dp_batch is None or n_dp_batch >= m:
        return fn(pos_batch)
    n_chunks = -(-m // n_dp_batch)
    padn = n_chunks * n_dp_batch - m
    pos_p = pos_batch
    if padn:
        pos_p = jnp.concatenate(
            [pos_batch, jnp.broadcast_to(pos_batch[-1:], (padn, 2))])
    chunks = pos_p.reshape(n_chunks, n_dp_batch, 2)
    outs = jax.lax.map(jax.checkpoint(fn) if remat else fn, chunks)
    return jax.tree_util.tree_map(
        lambda o: o.reshape((n_chunks * n_dp_batch,) + o.shape[2:])[:m], outs)


def ptycho_forward(obj_delta, obj_beta, theta, pos_batch, probe,
                   energy_ev, psize_cm, probe_size, pad_arr, h=None,
                   probe_mask=None, free_prop_cm="inf",
                   forward_algorithm="fresnel", remat=True, kernel_size=17,
                   n_dp_batch=None, pad_mode="edge"):
    """Exit waves for one angle and a minibatch of probe positions.

    Rotate -> pad (static) -> window gather -> multislice -> far field
    (ref ptychography.py:37-94). Returns (n_pos, py, px) complex64 fields.
    """
    delta_rot = rotate_volume(obj_delta, theta)
    beta_rot = rotate_volume(obj_beta, theta)
    pad = ((int(pad_arr[0, 0]), int(pad_arr[0, 1])),
           (int(pad_arr[1, 0]), int(pad_arr[1, 1])), (0, 0))
    delta_rot = jnp.pad(delta_rot, pad)
    beta_rot = jnp.pad(beta_rot, pad)

    def propagate(pos_chunk):
        delta_patches = extract_patches(delta_rot, pos_chunk, probe_size,
                                        pad_arr)
        beta_patches = extract_patches(beta_rot, pos_chunk, probe_size,
                                       pad_arr)
        if forward_algorithm == "fresnel":
            return multislice_propagate_batch(
                delta_patches, beta_patches, probe, energy_ev, psize_cm, h=h,
                free_prop_cm=free_prop_cm, remat=remat)
        elif forward_algorithm == "fd":
            # default 'edge' (Neumann): ptycho probes are localized and the
            # reference's unit-background pad (ref util.py:549) floods the
            # window; pad_mode='background' keeps the reference boundary
            # reachable for parity A/Bs
            return multislice_propagate_fd(
                delta_patches, beta_patches, probe, energy_ev, psize_cm,
                free_prop_cm=free_prop_cm, remat=remat, pad_mode=pad_mode)
        elif forward_algorithm == "conv":
            # truncated-kernel conv propagator on the probe windows — the cnn
            # engine's ptycho path (ref cnn_propagator/ptychography.py:74-76)
            from ..ops.tiled import multislice_propagate_cnn
            return multislice_propagate_cnn(
                delta_patches, beta_patches, probe, energy_ev, psize_cm,
                kernel_size=kernel_size, free_prop_cm=free_prop_cm,
                remat=remat)
        raise ValueError("forward_algorithm must be 'fresnel', 'fd', or 'conv'")

    exiting = _map_position_chunks(propagate, jnp.asarray(pos_batch),
                                   n_dp_batch, remat=remat)
    if probe_mask is not None:
        exiting = exiting * probe_mask
    return exiting


def ptycho_forward_split(obj_delta, obj_beta, theta, pos_batch, probe_re,
                         probe_im, energy_ev, psize_cm, probe_size, pad_arr,
                         h=None, probe_mask=None, free_prop_cm="inf",
                         remat=True, rotation="auto", n_dp_batch=None,
                         forward_algorithm="fresnel", pad_mode="edge"):
    """Split-complex twin of :func:`ptycho_forward` (fresnel and fd paths).

    Complex-dtype-free: rotation/pad/gather are real, the multislice and the
    far-field run through ops.splitfft. ``probe_mask`` must be real-valued.
    Returns ``(re, im)`` of shape (n_pos, py, px).

    ``rotation='auto'`` uses the 3-shear banded-matmul rotation on TPU
    backends (matmul adjoint — no backward scatter) and the
    reference-parity bilinear gather elsewhere, mirroring the full-field
    model's option.
    """
    from ..ops.multislice import multislice_propagate_batch_split
    if rotation == "auto":
        # shear rotation needs a square (X, Z) plane (quadrant transpose)
        from ..ops.pallas_kernels import _on_tpu
        square_xz = obj_delta.shape[1] == obj_delta.shape[2]
        rotation = "shear" if (_on_tpu() and square_xz) else "bilinear"
    if rotation == "shear":
        from ..ops.rotate import rotate_volume_shear3
        both = jnp.concatenate([obj_delta, obj_beta], axis=0)
        rot = rotate_volume_shear3(both, theta)
        delta_rot, beta_rot = rot[: obj_delta.shape[0]], rot[obj_delta.shape[0]:]
    else:
        delta_rot = rotate_volume(obj_delta, theta)
        beta_rot = rotate_volume(obj_beta, theta)
    pad = ((int(pad_arr[0, 0]), int(pad_arr[0, 1])),
           (int(pad_arr[1, 0]), int(pad_arr[1, 1])), (0, 0))
    delta_rot = jnp.pad(delta_rot, pad)
    beta_rot = jnp.pad(beta_rot, pad)

    def propagate(pos_chunk):
        delta_patches = extract_patches(delta_rot, pos_chunk, probe_size,
                                        pad_arr)
        beta_patches = extract_patches(beta_rot, pos_chunk, probe_size,
                                       pad_arr)
        if forward_algorithm == "fd":
            from ..ops.multislice import multislice_propagate_fd_split
            # default 'edge' boundary: ptycho probes are localized, and the
            # reference's unit-background pad floods the window;
            # pad_mode='background' restores the reference boundary for
            # parity A/Bs
            return multislice_propagate_fd_split(
                delta_patches, beta_patches, probe_re, probe_im, energy_ev,
                psize_cm, free_prop_cm=free_prop_cm, remat=remat,
                pad_mode=pad_mode)
        return multislice_propagate_batch_split(
            delta_patches, beta_patches, probe_re, probe_im, energy_ev,
            psize_cm, h=h, free_prop_cm=free_prop_cm, remat=remat)

    re, im = _map_position_chunks(propagate, jnp.asarray(pos_batch),
                                  n_dp_batch, remat=remat)
    if probe_mask is not None:
        re = re * probe_mask
        im = im * probe_mask
    return re, im


def safe_mag(re, im, eps=1e-24):
    """|re + i im| with a finite gradient at exactly zero.

    ``probe_circ_mask`` (ref ptychography.py:92-93) zeroes the field outside
    the pupil; sqrt has an infinite derivative at 0 and TPU flushes the
    denormals that keep the CPU path away from it, so the unguarded
    magnitude turns the whole gradient NaN on TPU. The clamp changes the
    value by at most sqrt(eps)=1e-12 (data magnitudes are O(1e-3..1e2)).
    """
    return jnp.sqrt(jnp.maximum(re * re + im * im, eps))


def ptycho_loss(exiting_batch, data_mag_batch, n_pos):
    """Magnitude MSE scaled by total position count (ref ptychography.py:94)."""
    mags = safe_mag(jnp.real(exiting_batch), jnp.imag(exiting_batch))
    return jnp.mean((mags - data_mag_batch) ** 2) * n_pos
