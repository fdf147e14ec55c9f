"""Forward data simulation: full-field and ptychographic acquisition + noise.

TPU-native rebuild of the reference simulators
(ref: tensorflow_recon/simulation.py:17-386, create_noisy_data.py:20-89).

The jitted forward models from :mod:`beyond_dof_tpu.models` are batched over
angles on device; only the HDF5/TIFF writes stay on the host.
"""

import os
import time

import numpy as np
import jax.numpy as jnp

from ..constants import PI
from ..models.fullfield import rotate_and_project_batch
from ..models.ptycho import compute_pad_arr, ptycho_forward, ptycho_forward_split
from ..models.probe import build_probe
from ..ops.image import circ_mask, gaussian_filter_nd
from ..io.exchange import write_exchange_data
from ..io import tiff

__all__ = ["create_fullfield_data", "create_ptychography_data",
           "add_poisson_noise_fullfield", "add_poisson_noise_ptycho",
           "grid_probe_positions"]


def create_fullfield_data(grid_delta, grid_beta, energy_ev, psize_cm, free_prop_cm,
                          n_theta, save_folder=None, fname=None, batch_size=1,
                          probe_type="plane", wavefront_initial=None,
                          theta_st=0, theta_end=2 * PI, monitor_output=False,
                          propagate_last=False, **kwargs):
    """Simulate a full-field holo-tomography dataset.

    Matches ``create_fullfield_data_numpy`` (ref simulation.py:80-161):
    per angle, rotate the phantom, multislice-propagate (NumPy-twin
    convention: no propagation after the last slice, hence
    ``propagate_last=False``), free-space propagate to the detector, and
    store the complex detector wavefield (n_theta, Y, X).

    Returns the data array; writes ``exchange/data`` if fname given.
    """
    grid_delta = np.asarray(grid_delta)
    img_dim = grid_delta.shape
    probe = _sim_probe(probe_type, img_dim[:2], wavefront_initial, kwargs)

    from ..ops.splitfft import complex_supported
    use_split = probe_type != "point" and not complex_supported()
    if use_split:
        from ..models.fullfield import rotate_and_project_batch_split
        probe_host = np.asarray(probe)
        p_re = jnp.asarray(np.real(probe_host).astype(np.float32))
        p_im = jnp.asarray(np.imag(probe_host).astype(np.float32))

    theta_ls = -np.linspace(theta_st, theta_end, n_theta)
    data = np.empty((n_theta, img_dim[0], img_dim[1]), dtype=np.complex64)
    # jit once and keep the grids device-resident: the un-jitted loop ran
    # every op eagerly (one RPC round trip per op on relay-attached TPUs —
    # ~17 min for 500 angles at 256^3 vs ~1 min jitted) and re-uploaded
    # the volumes every batch
    gd_dev = jnp.asarray(grid_delta)
    gb_dev = jnp.asarray(grid_beta)
    if use_split:
        import jax

        @jax.jit
        def _fwd_split(gd, gb, th):
            # forward-only simulation: the XLA split path matches the fused
            # Pallas kernel's steady speed here (80 ms per 10-volume batch
            # at 256^3) while compiling in 306 s instead of 517 s — and the
            # whole 500-angle sweep takes ~4 s post-compile
            return rotate_and_project_batch_split(
                gd, gb, th, p_re, p_im, energy_ev, psize_cm,
                free_prop_cm=free_prop_cm, propagate_last=propagate_last,
                remat=False, use_pallas=False)
    else:
        import jax

        @jax.jit
        def _fwd(gd, gb, th):
            return rotate_and_project_batch(
                gd, gb, th, probe, energy_ev, psize_cm,
                free_prop_cm=free_prop_cm, propagate_last=propagate_last,
                remat=False)
    for i0 in range(0, n_theta, batch_size):
        th = jnp.asarray(theta_ls[i0:i0 + batch_size], jnp.float32)
        if th.shape[0] != batch_size:
            # ragged tail: pad to the compiled batch shape, crop after
            pad = batch_size - th.shape[0]
            th_c = jnp.concatenate([th, jnp.zeros((pad,), jnp.float32)])
        else:
            pad, th_c = 0, th
        if use_split:
            re, im = _fwd_split(gd_dev, gb_dev, th_c)
            out = np.asarray(re) + 1j * np.asarray(im)
        else:
            out = np.asarray(_fwd(gd_dev, gb_dev, th_c))
        if pad:
            out = out[: batch_size - pad]
        data[i0:i0 + th.shape[0]] = out
        if monitor_output and save_folder is not None:
            tiff.write_tiff(np.abs(np.asarray(out)),
                            os.path.join(save_folder, "monitor_output", "prj_%d" % i0))
    if fname is not None:
        write_exchange_data(os.path.join(save_folder or ".", fname), data)
    return data


def _sim_probe(probe_type, shape, wavefront_initial, kwargs):
    if probe_type == "fixed":
        return build_probe("fixed", shape, probe_initial=wavefront_initial)
    return build_probe(probe_type, shape, **kwargs)


def grid_probe_positions(obj_size, probe_size, spacing):
    """Regular grid of probe positions covering the object (ref create_ptycho_data.py)."""
    ys = np.arange(probe_size[0] // 2, obj_size[0] - probe_size[0] // 2 + 1, spacing)
    xs = np.arange(probe_size[1] // 2, obj_size[1] - probe_size[1] // 2 + 1, spacing)
    return np.array([(y, x) for y in ys for x in xs], dtype=int)


def create_ptychography_data(grid_delta, grid_beta, energy_ev, psize_cm, n_theta,
                             probe_pos, probe_size=(72, 72), save_folder=None,
                             fname=None, probe_type="gaussian",
                             wavefront_initial=None, theta_st=0, theta_end=2 * PI,
                             probe_circ_mask=0.9, n_dp_batch=20, **kwargs):
    """Simulate a ptycho-tomography dataset (ref simulation.py:164-386).

    Output shape (n_theta, n_pos, probe_h, probe_w) complex64 far-field
    wavefields. Returns the array; writes ``exchange/data`` if fname given.
    """
    grid_delta = np.asarray(grid_delta)
    obj_size = grid_delta.shape
    probe_pos = np.asarray(probe_pos, dtype=int)
    n_pos = len(probe_pos)
    pad_arr = compute_pad_arr(probe_pos, probe_size, obj_size)
    probe = _sim_probe(probe_type, probe_size, wavefront_initial, kwargs)

    probe_mask = None
    if probe_circ_mask is not None:
        mask2d = circ_mask(probe_size, probe_circ_mask)
        probe = probe * mask2d  # host-side: no complex device arrays
        probe_mask = gaussian_filter_nd(mask2d, 3.0)  # float32: complex x real is fine and avoids complex constants on complex-free TPUs

    from ..ops.splitfft import complex_supported
    use_split = not complex_supported()
    if use_split:
        probe_host = np.asarray(probe)
        p_re = jnp.asarray(np.real(probe_host).astype(np.float32))
        p_im = jnp.asarray(np.imag(probe_host).astype(np.float32))

    theta_ls = -np.linspace(theta_st, theta_end, n_theta)
    data = np.empty((n_theta, n_pos, probe_size[0], probe_size[1]), dtype=np.complex64)

    # One jitted program per CHUNK of angles (lax.map over angles, and over
    # position blocks inside) instead of one dispatch per (angle, block):
    # at the reference adhesin workload (500 angles x 529 positions) the
    # per-dispatch relay round-trips dominate by an order of magnitude.
    n_blk = int(np.ceil(n_pos / float(n_dp_batch)))
    pos_pad = np.concatenate(
        [probe_pos, np.tile(probe_pos[-1:], (n_blk * n_dp_batch - n_pos, 1))])
    pos_blocks = jnp.asarray(
        pos_pad.reshape(n_blk, n_dp_batch, 2).astype(np.int32))
    gd_dev = jnp.asarray(grid_delta)
    gb_dev = jnp.asarray(grid_beta)

    import jax as _jax
    from functools import partial as _partial

    @_partial(_jax.jit, static_argnames=())
    def _sim_chunk_split(thetas, blocks):
        def one_theta(th):
            def one_block(pos_blk):
                return ptycho_forward_split(
                    gd_dev, gb_dev, th, pos_blk, p_re, p_im, energy_ev,
                    psize_cm, probe_size, pad_arr, probe_mask=probe_mask,
                    free_prop_cm="inf", remat=False)
            re, im = _jax.lax.map(one_block, blocks)
            return (re.reshape(-1, probe_size[0], probe_size[1]),
                    im.reshape(-1, probe_size[0], probe_size[1]))
        return _jax.lax.map(one_theta, thetas)

    @_partial(_jax.jit, static_argnames=())
    def _sim_chunk_complex(thetas, blocks):
        def one_theta(th):
            def one_block(pos_blk):
                return ptycho_forward(
                    gd_dev, gb_dev, th, pos_blk, probe, energy_ev, psize_cm,
                    probe_size, pad_arr, probe_mask=probe_mask,
                    free_prop_cm="inf", remat=False)
            out = _jax.lax.map(one_block, blocks)
            return out.reshape(-1, probe_size[0], probe_size[1])
        return _jax.lax.map(one_theta, thetas)

    chunk = 50
    t_start = time.time()
    for i0 in range(0, n_theta, chunk):
        th = jnp.asarray(theta_ls[i0:i0 + chunk].astype(np.float32))
        if use_split:
            re, im = _sim_chunk_split(th, pos_blocks)
            out = np.asarray(re)[:, :n_pos] + 1j * np.asarray(im)[:, :n_pos]
        else:
            out = np.asarray(_sim_chunk_complex(th, pos_blocks))[:, :n_pos]
        data[i0:i0 + th.shape[0]] = out
        if i0:
            print("simulating angle %d/%d (%.1f s elapsed)"
                  % (i0, n_theta, time.time() - t_start), flush=True)
    if fname is not None:
        write_exchange_data(os.path.join(save_folder or ".", fname), data)
    return data


def add_poisson_noise_fullfield(data, n_photons_total, n_sample_pixel, rng=None):
    """Photon-budget-scaled Poisson noise for full-field data.

    ``n_ph = n_photons_total / n_sample_pixel`` photons per sample pixel
    (ref create_noisy_data.py:20-23, 74-87). Returns (noisy_data, mean_snr);
    noisy magnitudes are stored as complex64 like the reference.
    """
    rng = rng or np.random.RandomState()
    n_ph = float(n_photons_total) / n_sample_pixel
    out = np.empty_like(data, dtype=np.complex64)
    snr_ls = []
    for i in range(data.shape[0]):
        inten = np.abs(data[i]) ** 2
        noisy = rng.poisson(inten * n_ph) / n_ph
        snr_ls.append(np.var(inten) / np.var(noisy - inten))
        out[i] = np.sqrt(noisy).astype(np.complex64)
    return out, float(np.mean(snr_ls))


def add_poisson_noise_ptycho(data, n_photons_total, n_sample_pixel, grid_size,
                             rng=None):
    """Poisson noise for ptycho spots with per-spot photon budgeting.

    (ref create_noisy_data.py:45-72.) Returns (noisy_data, mean_snr).
    """
    rng = rng or np.random.RandomState()
    # grid_size: total voxel count (ref uses grid_delta.size); a shape
    # tuple is accepted and reduced to its product
    grid_size = int(np.prod(grid_size))
    n_ph = float(n_photons_total) / n_sample_pixel
    n_ex = n_ph * n_sample_pixel
    n_ex *= float(grid_size) / n_sample_pixel
    n_ex /= data.shape[1]
    out = np.empty_like(data, dtype=np.complex64)
    snr_ls = []
    for i in range(data.shape[0]):
        for j in range(data.shape[1]):
            inten = np.abs(data[i, j]) ** 2
            multiplier = n_ex / np.sum(inten)
            noisy = rng.poisson(inten * multiplier) / multiplier
            snr_ls.append(np.var(inten) / np.var(noisy - inten))
            out[i, j] = np.sqrt(noisy).astype(np.complex64)
    return out, float(np.mean(snr_ls))
