"""Ptycho-tomography AD reconstruction engine.

TPU-native rebuild of ``reconstruct_ptychography``
(ref tensorflow_recon/ptychography.py:19-633,
cnn_propagator/ptychography.py:19-365).

Static-shape redesign of the job scheduler: the reference shuffles a
(theta, position) job list per epoch, pads every angle's position list to a
multiple of the minibatch, and assigns each rank one angle + ``minibatch``
positions per step (ref cnn_propagator/ptychography.py:264-299). Here one
jitted step processes a (T, M) block — T single-angle groups of M positions —
with T vmapped (and shardable over the ``data`` mesh axis) and M the inner
position minibatch, so the whole epoch reuses one compiled program.

Includes **dynamic dropping** of converged probe positions
(ref cnn_propagator/ptychography.py:323-342; note the reference's
``np.delete`` result is discarded — an apparent bug — while here positions
really are removed from the job pool).
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..constants import PI
from ..models.ptycho import (compute_pad_arr, ptycho_forward,
                             ptycho_forward_split, safe_mag)
from ..models.probe import build_probe, real_imag_to_mag_phase
from ..ops.fresnel import get_kernel
from ..ops.regularizers import regularization_term, probe_tv
from ..ops.image import circ_mask, gaussian_filter_nd
from ..io import tiff
from ..io.exchange import read_exchange_data
from ..io.checkpoint import save_checkpoint, restore_checkpoint
from ..parallel.mesh import data_sharding
from ..utils.misc import print_flush, create_summary, ptycho_output_folder
from .engine import make_optimizer, apply_projection

__all__ = ["reconstruct_ptychography"]


def _make_job_blocks(n_theta, probe_pos_idx, minibatch_size, n_groups, rng):
    """Per-epoch (theta, positions) job blocks (ref cnn ptychography.py:264-299).

    Returns a list of (thetas (T,), pos_idx (T, M)) blocks covering every
    (angle, position) pair, angles shuffled, positions padded per angle to a
    multiple of M by resampling, blocks padded to T groups by wrapping.
    """
    n_pos = len(probe_pos_idx)
    groups = []
    theta_ls = rng.permutation(n_theta)
    for i_theta in theta_ls:
        spots = np.array(probe_pos_idx)
        rng.shuffle(spots)
        if n_pos % minibatch_size:
            extra = rng.choice(spots, minibatch_size - (n_pos % minibatch_size),
                               replace=True)
            spots = np.concatenate([spots, extra])
        for j0 in range(0, len(spots), minibatch_size):
            groups.append((i_theta, np.sort(spots[j0:j0 + minibatch_size])))
    blocks = []
    for b0 in range(0, len(groups), n_groups):
        chunk = groups[b0:b0 + n_groups]
        while len(chunk) < n_groups:
            chunk.append(groups[len(chunk) % len(groups)])
        thetas = np.array([g[0] for g in chunk], dtype=np.int32)
        pos_idx = np.stack([g[1] for g in chunk])
        blocks.append((thetas, pos_idx))
    return blocks


def _gather_block(source, thetas_i, pos_idx, ds_level):
    """Gather |data| for a (T, M) job block from an in-memory array or an
    open HDF5 dataset (the reference streams ptycho data from disk per batch,
    ref ptychography.py:132-134,448)."""
    if isinstance(source, np.ndarray):
        block = source[thetas_i[:, None], pos_idx]
    else:
        rows = []
        for t, prow in zip(thetas_i, pos_idx):
            rows.append(np.abs(source[int(t), list(np.asarray(prow))]))
        block = np.stack(rows).astype(np.float32)
    if ds_level > 1:
        block = block[..., ::ds_level, ::ds_level]
    return block


def reconstruct_ptychography(probe_pos, probe_size, obj_size, fname=None,
                             data=None, theta_st=0, theta_end=PI,
                             theta_downsample=None, n_epochs="auto",
                             crit_conv_rate=0.03, max_nepochs=200, alpha=1e-7,
                             alpha_d=None, alpha_b=None, gamma=1e-6,
                             learning_rate=1.0, output_folder=None,
                             minibatch_size=None, save_intermediate=False,
                             full_intermediate=False, energy_ev=5000,
                             psize_cm=1e-7, save_path=".",
                             phantom_path="phantom", free_prop_cm=None,
                             multiscale_level=1, n_epoch_final_pass=None,
                             initial_guess=None, n_batch_per_update=1,
                             dynamic_rate=True, probe_type="gaussian",
                             probe_initial=None, probe_learning_rate=1e-3,
                             pupil_function=None, probe_circ_mask=0.9,
                             finite_support_mask=None,
                             forward_algorithm="fresnel", dynamic_dropping=False,
                             dropping_threshold=8e-5, n_dp_batch=20,
                             object_type="normal", mesh=None, seed=None,
                             checkpoint_dir=None, checkpoint_every=0,
                             save_outputs=True, remat=True, verbose=True,
                             cpu_only=False, core_parallelization=True,
                             poisson_multiplier=2e6, stream=False, kernel_size=17,
                             split_complex="auto", epoch_in_one_call="auto",
                             **kwargs):
    """Ptychographic 3D reconstruction (parameter parity with the reference,
    ref ptychography.py:19-27 + cnn additions ``dynamic_dropping``,
    ``dropping_threshold``).

    ``data`` (or the H5 at ``fname``) has shape (n_theta, n_pos, ph, pw).
    Returns ``(obj_delta, obj_beta, info)``.
    """
    t_zero = time.time()
    rng = np.random.RandomState(seed)
    _log = print_flush if verbose else (lambda *a, **k: None)

    h5_file = None
    if data is None:
        if stream:
            from ..io.exchange import open_exchange_data
            h5_file, prj = open_exchange_data(os.path.join(save_path, fname))
        else:
            prj = np.asarray(read_exchange_data(os.path.join(save_path, fname)))
    else:
        prj = np.asarray(data)
    n_theta_full = prj.shape[0]
    theta = -np.linspace(theta_st, theta_end, n_theta_full, dtype="float32")
    theta_index = np.arange(n_theta_full)
    if theta_downsample is not None:
        theta = theta[::theta_downsample]
        theta_index = theta_index[::theta_downsample]
        if isinstance(prj, np.ndarray):
            prj = prj[::theta_downsample]
    n_theta = len(theta)
    if isinstance(prj, np.ndarray):
        prj_mag = np.abs(prj).astype(np.float32)
        theta_index = np.arange(n_theta)
    else:
        prj_mag = prj  # lazy h5 dataset; magnitudes taken per block

    probe_pos = np.asarray(probe_pos, dtype=int)
    n_pos_full = len(probe_pos)
    if minibatch_size is None:
        minibatch_size = n_pos_full
    n_groups = mesh.shape["data"] if mesh is not None else 1

    if output_folder is None:
        output_folder = ptycho_output_folder(
            minibatch_size, n_epochs, alpha_d, alpha_b, learning_rate,
            energy_ev, prj.shape[-1], n_theta, multiscale_level, theta_end)
    if save_path != ".":
        output_folder = os.path.join(save_path, output_folder)

    info = {"loss": [], "per_level": {}, "n_active_positions": []}
    prev_level = None

    for level in range(multiscale_level - 1, -1, -1):
        ds_level = 2 ** level
        _log("Multiscale downsampling level: {}".format(ds_level))
        this_obj_size = [int(x / ds_level) for x in obj_size]
        if isinstance(prj_mag, np.ndarray):
            this_prj_mag = (prj_mag[:, :, ::ds_level, ::ds_level]
                            if ds_level > 1 else prj_mag)
            block_ds = 1
        else:
            this_prj_mag = prj_mag  # lazy: downsample per gathered block
            block_ds = ds_level
        this_probe_size = [s // ds_level for s in probe_size] if ds_level > 1 else list(probe_size)
        this_pos = probe_pos // ds_level if ds_level > 1 else probe_pos
        pad_arr = compute_pad_arr(this_pos, this_probe_size, this_obj_size)

        # ---- object init (ref cnn ptychography.py:169-207) ------------------
        if prev_level is not None:
            from ..ops.image import upsample_2x
            d0 = np.asarray(upsample_2x(prev_level[0]))[:this_obj_size[0],
                                                        :this_obj_size[1],
                                                        :this_obj_size[2]]
            b0 = np.asarray(upsample_2x(prev_level[1]))[:this_obj_size[0],
                                                        :this_obj_size[1],
                                                        :this_obj_size[2]]
            d0 = d0 + rng.normal(size=this_obj_size, loc=8.7e-7, scale=1e-7)
            b0 = b0 + rng.normal(size=this_obj_size, loc=5.1e-8, scale=1e-8)
        elif initial_guess is not None:
            d0 = np.array(initial_guess[0], dtype=np.float64)
            b0 = np.array(initial_guess[1], dtype=np.float64)
        else:
            d0 = rng.normal(size=this_obj_size, loc=8.7e-7, scale=1e-7)
            b0 = rng.normal(size=this_obj_size, loc=5.1e-8, scale=1e-8)
        d0[d0 < 0] = 0
        b0[b0 < 0] = 0
        if finite_support_mask is not None:
            fsm = np.asarray(finite_support_mask, dtype=np.float32)
            if ds_level > 1:
                fsm = fsm[::ds_level, ::ds_level, ::ds_level]
            d0 *= fsm
            b0 *= fsm
        if object_type == "phase_only":
            b0[...] = 0
        elif object_type == "absorption_only":
            d0[...] = 0

        # ---- probe ----------------------------------------------------------
        optimize_probe = probe_type == "optimizable"
        back_prop_cm = ((free_prop_cm + psize_cm * this_obj_size[2])
                        if (free_prop_cm is not None and not isinstance(free_prop_cm, str))
                        else psize_cm * this_obj_size[2])
        if probe_type == "optimizable" and probe_initial is None:
            # backprop probe init needs the measured magnitudes in memory
            probe_data = np.asarray(prj[:]).reshape(-1, *prj.shape[2:])
        else:
            probe_data = None
        probe = build_probe(probe_type, this_probe_size,
                            probe_initial=probe_initial,
                            pupil_function=pupil_function,
                            data=probe_data,
                            back_prop_nm=back_prop_cm * 1e7,
                            energy_ev=energy_ev, psize_nm=psize_cm * 1e7,
                            far_field=(free_prop_cm is None
                                       or (isinstance(free_prop_cm, str)
                                           and free_prop_cm == "inf")),
                            **kwargs)
        probe_mask = None
        if probe_circ_mask is not None:
            mask2d = circ_mask(this_probe_size, probe_circ_mask)
            probe = probe * mask2d  # host-side: no complex device arrays
            probe_mask = gaussian_filter_nd(mask2d, 3.0)  # float32: complex x real is fine and avoids complex constants on complex-free TPUs

        params = {"delta": jnp.asarray(d0, jnp.float32),
                  "beta": jnp.asarray(b0, jnp.float32)}
        if optimize_probe:
            params["probe_real"] = jnp.asarray(
                np.real(np.asarray(probe)).astype(np.float32))
            params["probe_imag"] = jnp.asarray(
                np.imag(np.asarray(probe)).astype(np.float32))

        n_blocks = int(np.ceil(n_theta * np.ceil(n_pos_full / minibatch_size)
                               / n_groups))
        tx = make_optimizer(params, learning_rate, probe_learning_rate,
                            object_type, optimize_probe, n_batch_per_update,
                            dynamic_rate, steps_per_epoch=n_blocks,
                            size=n_groups)
        opt_state = tx.init(params)

        voxel_nm = np.array([psize_cm] * 3) * 1.0e7 * ds_level
        lmbda_nm = 1240.0 / energy_ev
        h = get_kernel(voxel_nm[-1], lmbda_nm, voxel_nm, this_probe_size)
        n_pos_total = float(n_pos_full)

        if split_complex == "auto":
            from ..ops.splitfft import complex_supported
            use_split = (forward_algorithm in ("fresnel", "fd")
                         and not complex_supported())
        else:
            use_split = bool(split_complex)
        probe_host = np.asarray(probe)
        probe_re_c = jnp.asarray(np.real(probe_host).astype(np.float32))
        probe_im_c = jnp.asarray(np.imag(probe_host).astype(np.float32))

        def loss_fn(params, theta_block, pos_block, mag_block):
            if use_split:
                if optimize_probe:
                    p_re, p_im = params["probe_real"], params["probe_imag"]
                else:
                    p_re, p_im = probe_re_c, probe_im_c
            elif optimize_probe:
                pr = jax.lax.complex(params["probe_real"], params["probe_imag"])
            else:
                pr = probe

            def per_group(th, pos, mag):
                if use_split:
                    re, im = ptycho_forward_split(
                        params["delta"], params["beta"], th, pos, p_re, p_im,
                        energy_ev, psize_cm * ds_level,
                        tuple(this_probe_size), pad_arr, h=h,
                        probe_mask=probe_mask,
                        free_prop_cm="inf" if free_prop_cm is None else free_prop_cm,
                        remat=remat, n_dp_batch=n_dp_batch,
                        forward_algorithm=forward_algorithm)
                    mags = safe_mag(re, im)
                    return jnp.mean((mags - mag) ** 2) * n_pos_total
                exiting = ptycho_forward(
                    params["delta"], params["beta"], th, pos, pr,
                    energy_ev, psize_cm * ds_level, tuple(this_probe_size),
                    pad_arr, h=h, probe_mask=probe_mask,
                    free_prop_cm="inf" if free_prop_cm is None else free_prop_cm,
                    forward_algorithm=forward_algorithm, remat=remat,
                    kernel_size=kernel_size, n_dp_batch=n_dp_batch)
                mags = safe_mag(jnp.real(exiting), jnp.imag(exiting))
                return jnp.mean((mags - mag) ** 2) * n_pos_total

            group_losses = jax.vmap(per_group)(theta_block, pos_block, mag_block)
            err = jnp.sum(group_losses) / n_theta
            reg = regularization_term(params["delta"], params["beta"],
                                      alpha_d, alpha_b, gamma, alpha=alpha)
            loss = err + reg
            if optimize_probe:
                loss = loss + probe_tv(params["probe_real"])
            return loss, (err, reg)

        pupil = (jnp.asarray(pupil_function, jnp.float32)
                 if pupil_function is not None else None)

        def _step_impl(params, opt_state, theta_block, pos_block, mag_block):
            (loss, (err, reg)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, theta_block, pos_block, mag_block)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = apply_projection(params, jnp.float32(1.0), 0, None, pupil)
            return params, opt_state, loss, err, reg

        @jax.jit
        def step(params, opt_state, theta_block, pos_block, mag_block):
            return _step_impl(params, opt_state, theta_block, pos_block,
                              mag_block)

        @jax.jit
        def epoch_scan(params, opt_state, prj_dev, theta_dev, pos_dev,
                       th_idx, pos_idx):
            """All job blocks of one epoch in a single device program.

            ``prj_dev`` is the DEVICE-RESIDENT (n_theta, n_pos, ph, pw)
            magnitude stack (uploaded once per level), ``pos_dev`` the
            (n_pos, 2) position table; ``th_idx`` (n_blocks, T) and
            ``pos_idx`` (n_blocks, T, M) are the epoch's shuffled job
            tables — the only per-epoch upload. Port of the full-field
            engine's epoch-in-one-call (recon/fullfield.py): removes the
            per-block host dispatch, which costs O(seconds) per epoch on
            RPC-tunneled TPU backends at the 529-position workload scale.
            """
            def body(carry, blk):
                params, opt_state = carry
                ti, pi = blk
                th = theta_dev[ti]
                pos = pos_dev[pi]
                mag = prj_dev[ti[:, None], pi]
                params, opt_state, loss, err, reg = _step_impl(
                    params, opt_state, th, pos, mag)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (th_idx, pos_idx))
            return params, opt_state, losses

        @jax.jit
        def position_loss(params, theta_scalar, pos_block, mag_block):
            """Per-position data loss at one angle (for dynamic dropping)."""
            if use_split:
                if optimize_probe:
                    p_re, p_im = params["probe_real"], params["probe_imag"]
                else:
                    p_re, p_im = probe_re_c, probe_im_c
                re, im = ptycho_forward_split(
                    params["delta"], params["beta"], theta_scalar, pos_block,
                    p_re, p_im, energy_ev, psize_cm * ds_level,
                    tuple(this_probe_size), pad_arr, h=h,
                    probe_mask=probe_mask,
                    free_prop_cm="inf" if free_prop_cm is None else free_prop_cm,
                    remat=remat, n_dp_batch=n_dp_batch,
                    forward_algorithm=forward_algorithm)
                mags = safe_mag(re, im)
                return jnp.mean((mags - mag_block) ** 2, axis=(1, 2))
            if optimize_probe:
                pr = jax.lax.complex(params["probe_real"], params["probe_imag"])
            else:
                pr = probe
            exiting = ptycho_forward(
                params["delta"], params["beta"], theta_scalar, pos_block, pr,
                energy_ev, psize_cm * ds_level, tuple(this_probe_size), pad_arr,
                h=h, probe_mask=probe_mask,
                free_prop_cm="inf" if free_prop_cm is None else free_prop_cm,
                forward_algorithm=forward_algorithm, remat=remat,
                kernel_size=kernel_size)
            mags = safe_mag(jnp.real(exiting), jnp.imag(exiting))
            return jnp.mean((mags - mag_block) ** 2, axis=(1, 2))

        if save_outputs:
            summary_locals = dict(obj_size=this_obj_size, probe_size=this_probe_size,
                                  output_folder=output_folder,
                                  theta_downsample=theta_downsample,
                                  n_theta=n_theta, n_pos=n_pos_full,
                                  n_epochs=n_epochs, learning_rate=learning_rate,
                                  alpha_d=alpha_d, alpha_b=alpha_b, gamma=gamma,
                                  n_dp_batch=n_dp_batch,
                                  minibatch_size=minibatch_size,
                                  free_prop_cm=free_prop_cm, psize_cm=psize_cm,
                                  energy_ev=energy_ev, fname=fname,
                                  probe_mag_sigma=kwargs.get("probe_mag_sigma"),
                                  probe_phase_sigma=kwargs.get("probe_phase_sigma"),
                                  probe_phase_max=kwargs.get("probe_phase_max"))
            create_summary(output_folder, summary_locals, preset="ptycho")

        active_pos_idx = np.arange(n_pos_full)
        mag_shard = data_sharding(mesh, 4) if mesh is not None else None

        # epoch-in-one-call: needs the magnitude stack in device memory and a
        # stable block count (dynamic dropping changes n_blocks per epoch,
        # which would recompile the scan every time); H5 streaming stays on
        # the per-block host loop by construction
        use_epoch_scan = epoch_in_one_call
        if use_epoch_scan == "auto":
            from ..ops.pallas_kernels import _on_tpu
            use_epoch_scan = _on_tpu()
            # the scan keeps the whole |data| stack device-resident; at
            # 500 angles x 529 x 72^2 that is 5.5 GB and the step OOMs a
            # 16 GB chip — fall back to per-block host upload beyond a
            # budget (the cone_ptycho_noisy preset's exact failure)
            budget_gb = float(os.environ.get("BDT_PTYCHO_DEVICE_DATA_GB",
                                             "4"))
            if (use_epoch_scan and isinstance(this_prj_mag, np.ndarray)
                    and this_prj_mag.nbytes > budget_gb * 2 ** 30):
                _log("epoch scan disabled: |data| stack %.1f GB exceeds "
                     "BDT_PTYCHO_DEVICE_DATA_GB=%.1f" %
                     (this_prj_mag.nbytes / 2 ** 30, budget_gb))
                use_epoch_scan = False
        use_epoch_scan = (use_epoch_scan and isinstance(this_prj_mag, np.ndarray)
                          and not dynamic_dropping)
        prj_dev = theta_dev = pos_dev = None

        # ---- checkpoint resume (mirrors the full-field engine) --------------
        # The dropping state is persisted as a fixed-length boolean mask so
        # the Orbax template shape is static.
        start_epoch = 0
        if checkpoint_dir:
            lvl_dir = os.path.join(checkpoint_dir, "ds_%d" % ds_level)
            template = {"params": params, "opt_state": opt_state, "epoch": 0,
                        "active_mask": jnp.ones((n_pos_full,), jnp.bool_)}
            state, ck_epoch = restore_checkpoint(lvl_dir, template)
            if state is not None:
                params = state["params"]
                opt_state = state["opt_state"]
                start_epoch = int(state["epoch"]) + 1
                active_pos_idx = np.arange(n_pos_full)[
                    np.asarray(state["active_mask"])]
                _log("Resumed from checkpoint at epoch %d" % start_epoch)

        n_loop = n_epochs if n_epochs != "auto" else max_nepochs
        if ds_level == 1 and n_epoch_final_pass is not None:
            n_loop = n_epoch_final_pass
        loss_ls = []
        t0 = time.time()
        _log("Optimizer started.")

        for epoch in range(start_epoch, n_loop):
            t00 = time.time()
            blocks = _make_job_blocks(n_theta, active_pos_idx, minibatch_size,
                                      n_groups, rng)
            current_loss = None
            if use_epoch_scan:
                if prj_dev is None:
                    # one-time per-level upload of the magnitude stack,
                    # angles, and position table; epochs ship only indices
                    from ..parallel.mesh import replicated
                    prj_dev = jnp.asarray(this_prj_mag)
                    theta_dev = jnp.asarray(theta)
                    pos_dev = jnp.asarray(this_pos, jnp.int32)
                    if mesh is not None:
                        rep_s = replicated(mesh)
                        prj_dev = jax.device_put(prj_dev, rep_s)
                        theta_dev = jax.device_put(theta_dev, rep_s)
                        pos_dev = jax.device_put(pos_dev, rep_s)
                th_all = np.stack([b[0] for b in blocks]).astype(np.int32)
                pos_all = np.stack([b[1] for b in blocks]).astype(np.int32)
                # Chunk the epoch into bounded scan segments: one monolithic
                # 900-block scan program crashes the TPU worker at the
                # 529-position/256^3 workload scale (kernel fault on
                # execution), while <=128-block segments of the SAME step
                # program run fine — and >=2 segment shapes cost at most two
                # compiles per level since block counts are epoch-invariant.
                env_seg = os.environ.get("BDT_PTYCHO_SCAN_SEGMENT")
                if env_seg is not None:
                    seg = int(env_seg)
                else:
                    # bound segments by WORK (position-jobs), not block
                    # count: execution time scales with T*M per block, and
                    # ~50k-job programs (~80 s) crash the worker while
                    # ~8k-job ones (~12 s) are safe
                    jobs_per_block = max(
                        1, int(th_all.shape[1]) * int(pos_all.shape[2]))
                    budget = int(os.environ.get("BDT_PTYCHO_SCAN_JOBS",
                                                "8192"))
                    seg = max(1, budget // jobs_per_block)
                # equalize segment sizes so every segment shares ONE compiled
                # shape when the count divides evenly
                if len(blocks) > seg:
                    n_seg = -(-len(blocks) // seg)
                    seg = -(-len(blocks) // n_seg)
                for s0 in range(0, len(blocks), seg):
                    th_idx = jnp.asarray(th_all[s0:s0 + seg])
                    pos_idx = jnp.asarray(pos_all[s0:s0 + seg])
                    if mesh is not None:
                        th_idx = jax.device_put(
                            th_idx, data_sharding(mesh, 2, 1))
                        pos_idx = jax.device_put(
                            pos_idx, data_sharding(mesh, 3, 1))
                    params, opt_state, losses = epoch_scan(
                        params, opt_state, prj_dev, theta_dev, pos_dev,
                        th_idx, pos_idx)
                current_loss = float(losses[-1])
            else:
                for thetas_i, pos_idx in blocks:
                    theta_block = jnp.asarray(theta[thetas_i])
                    pos_block = jnp.asarray(this_pos[pos_idx], jnp.int32)
                    mag_block = jnp.asarray(_gather_block(
                        this_prj_mag, theta_index[thetas_i], pos_idx,
                        block_ds))
                    if mesh is not None:
                        mag_block = jax.device_put(mag_block, mag_shard)
                    params, opt_state, loss, err, reg = step(
                        params, opt_state, theta_block, pos_block, mag_block)
                    current_loss = float(loss)
            loss_ls.append(current_loss)
            _log("Epoch {}; loss = {}; Delta-t = {} s".format(
                epoch, current_loss, time.time() - t00))

            if save_intermediate and save_outputs:
                d = np.asarray(params["delta"])
                tiff.write_tiff(d if full_intermediate else d[d.shape[0] // 2],
                                os.path.join(output_folder, "intermediate",
                                             "ds_{}_iter_{:03d}".format(ds_level, epoch)))

            if checkpoint_dir and checkpoint_every and \
                    (epoch + 1) % checkpoint_every == 0:
                active_mask = np.zeros((n_pos_full,), np.bool_)
                active_mask[active_pos_idx] = True
                save_checkpoint(os.path.join(checkpoint_dir, "ds_%d" % ds_level),
                                epoch, {"params": params, "opt_state": opt_state,
                                        "epoch": epoch,
                                        "active_mask": jnp.asarray(active_mask)})

            if dynamic_dropping and len(active_pos_idx) > minibatch_size:
                # Per-position loss judged over SEVERAL angles (a rotating
                # base angle + random others), dropping only positions
                # converged at ALL of them. The reference evaluated on each
                # rank's own current angles (ref cnn ptychography.py:323-342);
                # a single fixed angle would systematically drop positions
                # that are only converged at theta = 0.
                n_ang = min(n_theta, 4)
                ang_sel = [epoch % n_theta]
                if n_ang > 1:
                    others = rng.choice(np.delete(np.arange(n_theta), ang_sel),
                                        n_ang - 1, replace=False)
                    ang_sel += list(others)
                losses = np.zeros(len(active_pos_idx), np.float32)
                for i_ang in ang_sel:
                    for c0 in range(0, len(active_pos_idx), n_dp_batch):
                        sel = active_pos_idx[c0:c0 + n_dp_batch]
                        blk = _gather_block(this_prj_mag,
                                            np.asarray([theta_index[i_ang]]),
                                            np.asarray(sel)[None], block_ds)[0]
                        pl = position_loss(params, jnp.float32(theta[i_ang]),
                                           jnp.asarray(this_pos[sel], jnp.int32),
                                           jnp.asarray(blk))
                        losses[c0:c0 + len(sel)] = np.maximum(
                            losses[c0:c0 + len(sel)], np.asarray(pl))
                keep = losses >= dropping_threshold
                if keep.sum() >= minibatch_size:
                    dropped = (~keep).sum()
                    active_pos_idx = active_pos_idx[keep]
                    _log("Dropped {} spot positions.".format(int(dropped)))
            info["n_active_positions"].append(len(active_pos_idx))

            if n_epochs == "auto" and len(loss_ls) > 1:
                rate = (loss_ls[-1] - loss_ls[-2]) / loss_ls[-2]
                if -crit_conv_rate < rate < 0:
                    break

        res_delta = np.clip(np.asarray(params["delta"]), 0, None)
        res_beta = np.clip(np.asarray(params["beta"]), 0, None)
        if optimize_probe:
            probe_final = (np.asarray(params["probe_real"])
                           + 1j * np.asarray(params["probe_imag"]))
        else:
            probe_final = np.asarray(probe)

        if save_outputs:
            tiff.write_tiff(res_delta, os.path.join(output_folder,
                                                    "delta_ds_{}".format(ds_level)))
            tiff.write_tiff(res_beta, os.path.join(output_folder,
                                                   "beta_ds_{}".format(ds_level)))
            pm, pp = real_imag_to_mag_phase(probe_final.real, probe_final.imag)
            tiff.write_tiff(pm, os.path.join(output_folder,
                                             "probe_mag_ds_{}".format(ds_level)))
            tiff.write_tiff(pp, os.path.join(output_folder,
                                             "probe_phase_ds_{}".format(ds_level)))
            conv_dir = os.path.join(output_folder, "convergence")
            os.makedirs(conv_dir, exist_ok=True)
            np.save(os.path.join(conv_dir, "total_loss_ds_{}".format(ds_level)),
                    np.array(loss_ls))

        info["per_level"][ds_level] = {"loss": loss_ls}
        info["loss"] += loss_ls
        prev_level = (res_delta, res_beta)
        _log("Current iteration finished.")

    if h5_file is not None:
        h5_file.close()
    info["probe"] = probe_final
    info["output_folder"] = output_folder
    info["wall_time_s"] = time.time() - t_zero
    return res_delta, res_beta, info
