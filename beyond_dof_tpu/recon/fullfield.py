"""Full-field (holo-tomography) AD reconstruction engine.

TPU-native rebuild of ``reconstruct_fullfield``
(ref tensorflow_recon/fullfield.py:19-688, cnn_propagator/fullfield.py:19-392).

The whole train step — rotate, multislice, loss, regularizers, Adam update,
support/non-negativity projection, shrink-wrap — is ONE jitted function.
Data parallelism over angles comes from sharding the minibatch over the
``data`` axis of a :class:`jax.sharding.Mesh`; the SPMD partitioner inserts
the gradient reduction that Horovod's DistributedOptimizer performed in the
reference (ref fullfield.py:412).

Feature parity checklist (SURVEY §2/L4): optimizable object delta/beta and
probe; object_type normal/phase_only/absorption_only; probe types
plane/fixed/optimizable/gaussian/point (point routes the forward through the
cone-beam spherical propagator, ops/spherical.py);
magnitude-MSE loss; L1 + 3-axis TV regularizers (+probe TV); finite-support
mask with release epoch; shrink-wrap; multiscale (coarse-to-fine) with
upsampled re-init; minibatching over theta; gradient accumulation with dynamic
LR; 'auto' convergence stop; per-epoch TIFF dumps, convergence curves, chrome
traces; summary.txt provenance; Orbax checkpoint/resume (new).
"""

import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..constants import PI
from ..models.fullfield import rotate_and_project_batch, fullfield_loss
from ..models.probe import build_probe, real_imag_to_mag_phase
from ..ops.fresnel import get_kernel
from ..ops.regularizers import regularization_term, probe_tv
from ..ops.image import upsample_2x, downsample_2x_projections
from ..io import tiff
from ..io.exchange import read_exchange_data
from ..io.checkpoint import save_checkpoint, restore_checkpoint
from ..parallel.mesh import data_sharding, replicated
from ..utils.misc import print_flush, create_summary, fullfield_output_folder
from .engine import make_optimizer, apply_projection, shrink_wrap_update

__all__ = ["reconstruct_fullfield"]


def _load_mask(finite_support_mask, save_path, shape, ds_level):
    """Finite-support mask: array > file > all-ones (ref fullfield.py:242-257)."""
    if finite_support_mask is not None:
        mask = np.asarray(finite_support_mask, dtype=np.float32)
    else:
        mask_file = os.path.join(save_path, "fin_sup_mask", "mask.tiff")
        if os.path.exists(mask_file):
            mask = np.asarray(tiff.read_tiff(mask_file), dtype=np.float32)
        else:
            mask = np.ones(shape, dtype=np.float32)
    if ds_level > 1:
        mask = mask[::ds_level, ::ds_level, ::ds_level]
    return mask


def _init_object(shape, mask, rng, initial_guess=None, prev=None,
                 delta_loc=8.7e-7, delta_scale=1e-7, beta_loc=5.1e-8,
                 beta_scale=1e-8):
    """Gaussian-random / supplied / upsampled-previous init (ref fullfield.py:266-303)."""
    if prev is not None:
        d = np.asarray(upsample_2x(prev[0]))[: shape[0], : shape[1], : shape[2]]
        b = np.asarray(upsample_2x(prev[1]))[: shape[0], : shape[1], : shape[2]]
        d = d + rng.normal(size=shape, loc=delta_loc, scale=delta_scale) * mask
        b = b + rng.normal(size=shape, loc=beta_loc, scale=beta_scale) * mask
    elif initial_guess is not None:
        d = np.array(initial_guess[0], dtype=np.float64)
        b = np.array(initial_guess[1], dtype=np.float64)
    else:
        d = rng.normal(size=shape, loc=delta_loc, scale=delta_scale) * mask
        b = rng.normal(size=shape, loc=beta_loc, scale=beta_scale) * mask
    d[d < 0] = 0
    b[b < 0] = 0
    return d.astype(np.float32), b.astype(np.float32)


def _build_step(tx, probe_const, energy_ev, psize_cm, free_prop_cm, h,
                alpha, alpha_d, alpha_b, gamma, forward_algorithm,
                optimize_probe, pupil_function, shrink_cycle,
                n_epochs_mask_release, shrink_threshold, propagate_last, remat,
                kernel_size=17, tile_mesh=None, forward_kwargs=None,
                split_complex=False, rotation_grad=None):
    """One fused train step (value_and_grad + Adam + projections + shrink-wrap)."""
    forward_kwargs = forward_kwargs or {}

    def loss_fn(params, mask, theta_batch, prj_mag, plan=None):
        obj_delta = params["delta"] * mask
        obj_beta = params["beta"] * mask
        fwd_extra = dict(forward_kwargs)
        if plan is not None:
            # spherical resample coords + kernel stacks travel as jit
            # ARGUMENTS (hundreds of MB at 256^3 — baking them as traced
            # constants would blow the remote-compile body cap)
            fwd_extra["plan"] = plan
        if split_complex:
            # complex-dtype-free forward for TPU runtimes without complex64
            # support (the loss only consumes magnitudes); the probe split
            # happens on the HOST so no complex array ever reaches the device
            from ..models.fullfield import rotate_and_project_batch_split
            if optimize_probe:
                p_re, p_im = params["probe_real"], params["probe_imag"]
            else:
                p_re = jnp.asarray(np.real(np.asarray(probe_const)), jnp.float32)
                p_im = jnp.asarray(np.imag(np.asarray(probe_const)), jnp.float32)
            re, im = rotate_and_project_batch_split(
                obj_delta, obj_beta, theta_batch, p_re, p_im, energy_ev,
                psize_cm, free_prop_cm=free_prop_cm, h=h,
                propagate_last=propagate_last, remat=remat,
                forward_algorithm=forward_algorithm,
                kernel_size=kernel_size, tile_mesh=tile_mesh,
                rotation_grad=rotation_grad, **fwd_extra)
            # guarded magnitude: TPU flushes denormals, so an exactly-zero
            # field (e.g. pupil-masked probe) makes sqrt's gradient NaN —
            # same failure safe_mag fixed for ptycho
            from ..models.ptycho import safe_mag
            err = jnp.mean((safe_mag(re, im) - prj_mag) ** 2)
        else:
            if optimize_probe:
                probe = jax.lax.complex(params["probe_real"],
                                        params["probe_imag"])
            else:
                probe = probe_const
            exiting = rotate_and_project_batch(
                obj_delta, obj_beta, theta_batch, probe, energy_ev, psize_cm,
                free_prop_cm=free_prop_cm, h=h,
                forward_algorithm=forward_algorithm,
                propagate_last=propagate_last, remat=remat,
                kernel_size=kernel_size, tile_mesh=tile_mesh, **forward_kwargs)
            err = fullfield_loss(exiting, prj_mag)
        reg = regularization_term(obj_delta, obj_beta, alpha_d, alpha_b, gamma,
                                  alpha=alpha)
        loss = err + reg
        if optimize_probe:
            loss = loss + probe_tv(params["probe_real"])
        return loss, (err, reg)

    def _step_impl(params, opt_state, mask, theta_batch, prj_mag, epoch,
                   plan=None):
        (loss, (err, reg)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, mask, theta_batch, prj_mag, plan)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = apply_projection(params, mask, epoch, n_epochs_mask_release,
                                  pupil_function)
        mask = shrink_wrap_update(mask, params["delta"], epoch, shrink_cycle,
                                  shrink_threshold)
        return params, opt_state, mask, loss, err, reg

    # params/opt_state/mask are donated: they are pure state threaded through
    # every call (the caller always rebinds to the returned values), and the
    # training state is the dominant memory term at large sizes (26+ GB at
    # 1024^3) — donation lets XLA update it in place instead of holding
    # input and output copies live simultaneously.
    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, opt_state, mask, theta_batch, prj_mag, epoch, plan=None):
        return _step_impl(params, opt_state, mask, theta_batch, prj_mag, epoch,
                          plan)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def epoch_scan(params, opt_state, mask, prj_all, theta_all, idx, epoch,
                   plan=None):
        """All minibatches of one epoch in a single device program.

        ``prj_all``/``theta_all`` are the DEVICE-RESIDENT full projection
        stack and angle vector (uploaded once per level); ``idx`` is the
        epoch's (n_batch, G) shuffled index table — the only per-epoch
        upload. Minibatch magnitudes are gathered on device. Removes both
        the per-batch host dispatch (O(seconds) on RPC-tunneled TPUs) and
        the per-epoch re-upload of the projection data.
        """
        def body(carry, idx_row):
            params, opt_state, mask = carry
            th = theta_all[idx_row]
            mag = prj_all[idx_row]
            params, opt_state, mask, loss, err, reg = _step_impl(
                params, opt_state, mask, th, mag, epoch, plan)
            return (params, opt_state, mask), (loss, err, reg)

        (params, opt_state, mask), (losses, errs, regs) = jax.lax.scan(
            body, (params, opt_state, mask), idx)
        return params, opt_state, mask, losses, errs, regs

    return step, epoch_scan


def reconstruct_fullfield(fname=None, data=None, theta_st=0, theta_end=PI,
                          n_epochs="auto", crit_conv_rate=0.03, max_nepochs=200,
                          alpha=1e-7, alpha_d=None, alpha_b=None, gamma=1e-6,
                          learning_rate=1.0, output_folder=None,
                          minibatch_size=None, save_intermediate=False,
                          full_intermediate=False, energy_ev=5000,
                          psize_cm=1e-7, n_epochs_mask_release=None,
                          save_path=".", phantom_path="phantom",
                          shrink_cycle=20, shrink_threshold=1e-15,
                          free_prop_cm=None, multiscale_level=1,
                          n_epoch_final_pass=None, initial_guess=None,
                          n_batch_per_update=1, dynamic_rate=True,
                          probe_type="plane", probe_initial=None,
                          probe_learning_rate=1e-3, pupil_function=None,
                          theta_downsample=None, forward_algorithm="fresnel",
                          random_theta=True, object_type="normal",
                          obj_dim_z=None,
                          finite_support_mask=None, mesh=None, seed=None,
                          checkpoint_dir=None, checkpoint_every=0,
                          profile_epochs=(), save_outputs=True,
                          propagate_last=True, remat="auto",
                          invertible_amp_limit=1e4, cpu_only=False,
                          core_parallelization=True, verbose=True,
                          kernel_size=17, tile_mesh=None,
                          shard_object=None, split_complex="auto",
                          rotation_grad=None, rotation="auto",
                          epoch_in_one_call="auto", precision=None,
                          precision_polish_epochs=10, **kwargs):
    """Reconstruct a beyond-depth-of-focus object from full-field projections.

    Parameter names and semantics follow the reference engine
    (ref tensorflow_recon/fullfield.py:19-77); TPU-specific additions:
    ``mesh`` (a ``(data, ty, tx)`` device mesh for data parallelism),
    ``checkpoint_dir``/``checkpoint_every`` (Orbax state checkpoints),
    ``profile_epochs`` (epochs to dump a profiler trace for),
    ``data`` (in-memory (n_theta, Y, X) stack as an alternative to ``fname``).

    Returns ``(obj_delta, obj_beta, info)`` where ``info`` carries the loss
    history, final probe, and final mask.

    ``precision``: None (leave the module/env setting alone),
    'highest'/'high'/'default' (fix the DFT matmul precision for the whole
    run), or 'auto' — the MIXED-PRECISION MULTISCALE SCHEDULE: every epoch
    runs at bf16x3 (HIGH) except the last ``precision_polish_epochs``
    epochs of the finest (ds=1) level, which polish at HIGHEST. The
    multiscale loop is the natural schedule boundary (ref
    tensorflow_recon/fullfield.py:203-217): coarse levels and the descent
    phase only need to land in the quality basin; the polish phase removes
    the bf16x3 error band (~3e-4 amplitude) from the converged iterate.
    """
    t_zero = time.time()
    rng = np.random.RandomState(seed)
    _log = print_flush if verbose else (lambda *a, **k: None)

    _prec_state = [None]  # currently-applied module precision (None = env)

    def _apply_precision(name):
        if name is None or name == _prec_state[0]:
            return
        from ..ops import splitfft, pallas_kernels
        splitfft.set_precision(name)
        pallas_kernels.set_kernel_precision(name)
        _prec_state[0] = name
        _log("DFT precision -> {}".format(name))

    if precision is not None and precision != "auto":
        _apply_precision(precision)

    if epoch_in_one_call == "auto":
        # On TPU backends (especially RPC-tunneled ones) per-minibatch host
        # dispatch costs O(seconds); run each epoch as one device program.
        # This now INCLUDES the spherical (point-probe) forward: with the
        # separable five-einsum resample the chained-epoch program compiles
        # fine and measures 17.3 vs 29.3 s/epoch on the cone_pp 256^3
        # workload (benchmarks/spherical_eioc.json; the round-2 compile
        # crash predated the separable resample).
        from ..ops.pallas_kernels import _on_tpu
        epoch_in_one_call = _on_tpu()

    if data is None:
        data = read_exchange_data(os.path.join(save_path, fname),
                                  theta_downsample=None)
    prj_0 = np.asarray(data).astype(np.complex64)
    theta = -np.linspace(theta_st, theta_end, prj_0.shape[0], dtype="float32")
    if theta_downsample is not None:
        prj_0 = prj_0[::theta_downsample]
        theta = theta[::theta_downsample]
    n_theta = len(theta)
    _log("Data shape: {}".format(prj_0.shape))

    if minibatch_size is None:
        minibatch_size = n_theta
    n_data = mesh.shape["data"] if mesh is not None else 1
    if shard_object == "y" and tile_mesh is not None:
        # DP replicas of the Y-sharded object ride the tile mesh's own
        # 'data' axis (a (data, ty) mesh); grads are pmean'd inside the
        # shard_mapped step (recon/sharded.py)
        n_data = tile_mesh.shape.get("data", 1)

    if output_folder is None:
        output_folder = fullfield_output_folder(
            minibatch_size, n_epochs_mask_release, shrink_cycle, n_epochs,
            alpha_d, alpha_b, gamma, learning_rate, energy_ev,
            prj_0.shape[-1], n_theta, free_prop_cm, multiscale_level, theta_end)
    if save_path != ".":
        output_folder = os.path.join(save_path, output_folder)

    prev_level = None
    info = {"loss": [], "reg": [], "per_level": {}}

    for level in range(multiscale_level - 1, -1, -1):
        ds_level = 2 ** level
        _log("Multiscale downsampling level: {}".format(ds_level))

        if isinstance(free_prop_cm, str) and free_prop_cm == "inf":
            # Fourier-plane data: coarse level = center crop / ds^2, not a
            # real-space subsample (ops.image.downsample_projections_farfield)
            from ..ops.image import downsample_projections_farfield
            prj = downsample_projections_farfield(prj_0, ds_level)
        else:
            prj = downsample_2x_projections(prj_0, ds_level)
        prj_mag_all = np.abs(prj).astype(np.float32)
        dim_y, dim_x = prj.shape[-2:]

        # default object depth = plane width (cube), like the reference's
        # mask files for its 3D workloads; ``obj_dim_z`` overrides for the
        # single-slice 2D workloads (the reference encodes this in the
        # (H, W, 1) mask.tiff it reads back, ref fullfield.py:242-258)
        mask = _load_mask(finite_support_mask, save_path,
                          (prj_0.shape[1], prj_0.shape[2],
                           obj_dim_z or prj_0.shape[2]),
                          ds_level)
        dim_z = mask.shape[-1]
        obj_shape = (dim_y, dim_x, dim_z)

        obj_delta_init, obj_beta_init = _init_object(
            obj_shape, mask, rng,
            initial_guess=initial_guess if prev_level is None else None,
            prev=prev_level)
        if object_type == "phase_only":
            obj_beta_init[...] = 0
        elif object_type == "absorption_only":
            obj_delta_init[...] = 0

        # ---- probe --------------------------------------------------------
        optimize_probe = probe_type == "optimizable"
        back_prop_cm = ((free_prop_cm + psize_cm * dim_z)
                        if (free_prop_cm is not None and not isinstance(free_prop_cm, str))
                        else psize_cm * dim_z)
        probe = build_probe(probe_type, (dim_y, dim_x),
                            probe_initial=probe_initial,
                            pupil_function=pupil_function, data=prj,
                            back_prop_nm=back_prop_cm * 1e7,
                            energy_ev=energy_ev, psize_nm=psize_cm * 1e7,
                            **kwargs)

        params = {"delta": jnp.asarray(obj_delta_init),
                  "beta": jnp.asarray(obj_beta_init)}
        if optimize_probe:
            params["probe_real"] = jnp.asarray(
                np.real(np.asarray(probe)).astype(np.float32))
            params["probe_imag"] = jnp.asarray(
                np.imag(np.asarray(probe)).astype(np.float32))

        # ---- optimizer ------------------------------------------------------
        n_batch = int(np.ceil(float(n_theta) / (minibatch_size * n_data)))
        tx = make_optimizer(params, learning_rate, probe_learning_rate,
                            object_type, optimize_probe, n_batch_per_update,
                            dynamic_rate, steps_per_epoch=n_batch, size=n_data)
        opt_state = tx.init(params)

        voxel_nm = np.array([psize_cm] * 3) * 1.0e7 * ds_level
        lmbda_nm = 1240.0 / energy_ev
        h = get_kernel(voxel_nm[-1], lmbda_nm, voxel_nm, (dim_y, dim_x))

        pupil = (jnp.asarray(pupil_function, jnp.float32)
                 if pupil_function is not None else None)
        # point (cone-beam) probes propagate spherically regardless of the
        # requested algorithm (ref fullfield.py:99-104)
        eff_forward = ("spherical" if probe_type == "point"
                       else forward_algorithm)
        fwd_kwargs = {}
        if eff_forward == "spherical":
            fwd_kwargs = {k: kwargs[k] for k in
                          ("dist_to_source_cm", "det_psize_cm",
                           "theta_max", "phi_max", "resample_grad")
                          if k in kwargs}
        # 'auto': use the split-complex forward when the backend rejects
        # complex64 (the fresnel AND conv/tiled paths have split twins, so
        # the headline distributed propagator can drive a reconstruction on
        # complex-free TPU runtimes)
        if split_complex == "auto":
            from ..ops.splitfft import complex_supported
            use_split = (eff_forward in ("fresnel", "fd", "conv", "spherical")
                         and not complex_supported())
        else:
            use_split = bool(split_complex)
        if use_split and eff_forward == "fresnel":
            # rotation='auto' -> 3-shear banded-matmul rotation on TPU
            # (no gathers; ~1.5x on the composed train step at 256^3),
            # reference-parity bilinear gather elsewhere
            fwd_kwargs["rotation"] = rotation
        fwd_plan = None
        if use_split and eff_forward == "spherical" and \
                not isinstance(free_prop_cm, str):
            # precompute the spherical resample coords + per-slice kernel
            # stacks ONCE per level and feed them to the jitted step as an
            # argument pytree (at 256^3 they are ~370 MB — as traced
            # constants they would exceed the remote-compile body cap)
            from ..ops.spherical import build_spherical_plan
            fwd_plan = build_spherical_plan(
                obj_shape, energy_ev, psize_cm * ds_level,
                fwd_kwargs["dist_to_source_cm"],
                det_psize_cm=fwd_kwargs["det_psize_cm"],
                theta_max=fwd_kwargs.get("theta_max", 0.17453),
                phi_max=fwd_kwargs.get("phi_max", 0.17453),
                free_prop_cm=free_prop_cm,
                resample=kwargs.get("resample_grad", "auto"))
        # remat='auto': run the O(1)-activation invertible VJP (fused Pallas
        # sweeps on TPU) while the predicted backward error amplification
        # e^{2 k sum_z max beta_z} stays below ``invertible_amp_limit``,
        # falling back to checkpoint-remat otherwise. The reconstruction
        # divides by e^{-2 k beta} per slice, so float32 error grows by that
        # factor over the reverse sweep (checked each epoch on the CURRENT
        # beta — absorption grows during optimization).
        auto_remat = (remat == "auto")
        if auto_remat and use_split and eff_forward == "fresnel":
            k_mod = 2.0 * PI * voxel_nm[-1] / lmbda_nm
            amp_log_limit = float(np.log(invertible_amp_limit))

            def pick_remat(params):
                amp = 2.0 * k_mod * float(
                    jnp.sum(jnp.max(params["beta"], axis=(0, 1))))
                return "invertible" if amp < amp_log_limit else True
        else:
            def pick_remat(params):
                return True if auto_remat else remat

        if shard_object == "y":
            # fully Y-sharded step (recon/sharded.py): rotation, tiled
            # propagation, regularizers, Adam all slab-local — the only
            # configuration whose TRANSIENT per-device memory is O(N^3/n_ty),
            # i.e. the one that actually fits 1024^3 on a v5e-8
            if tile_mesh is None or eff_forward != "conv":
                raise ValueError(
                    "shard_object='y' requires forward_algorithm='conv' and "
                    "a tile_mesh with a 'ty' axis (the Y-slab-local tiled "
                    "propagator)")
            if optimize_probe:
                raise ValueError("shard_object='y' does not support an "
                                 "optimizable probe yet")
            if shrink_cycle is not None:
                raise ValueError("shard_object='y' does not support "
                                 "shrink-wrap (cross-slab gaussian filter)")
            if mesh is not None:
                raise ValueError("combine shard_object='y' with the tile "
                                 "mesh only; for data parallelism give the "
                                 "tile_mesh a 'data' axis (make_mesh("
                                 "n_data=K, tile_yx=(n_ty, 1)))")

        _step_cache = {}

        def get_step(mode, prec=None):
            # prec: the mixed-precision schedule's per-epoch setting — it
            # mutates the module-level DFT precision and keys the cache so
            # a fresh jit wrapper retraces with the new setting (the bare
            # global would be invisible to an already-compiled step)
            _apply_precision(prec)
            if shard_object == "y":
                key = ("y", bool(mode), prec)
                if key not in _step_cache:
                    from .sharded import build_step_sharded_y
                    _step_cache[key] = build_step_sharded_y(
                        tx, opt_state, tile_mesh, obj_shape, probe,
                        energy_ev, psize_cm * ds_level, free_prop_cm,
                        alpha, alpha_d, alpha_b, gamma,
                        n_epochs_mask_release=n_epochs_mask_release,
                        kernel_size=kernel_size, remat=bool(mode))
                return _step_cache[key]
            key = (mode, prec)
            if key not in _step_cache:
                _step_cache[key] = _build_step(
                    tx, probe, energy_ev, psize_cm * ds_level,
                    free_prop_cm, h, alpha, alpha_d, alpha_b, gamma,
                    eff_forward, optimize_probe, pupil,
                    shrink_cycle, n_epochs_mask_release,
                    shrink_threshold, propagate_last, mode,
                    kernel_size=kernel_size, tile_mesh=tile_mesh,
                    forward_kwargs=fwd_kwargs, split_complex=use_split,
                    rotation_grad=rotation_grad)
            return _step_cache[key]

        mask_dev = jnp.asarray(mask)
        batch_shard = data_sharding(mesh, 1) if mesh is not None else None
        prj_shard = data_sharding(mesh, 3) if mesh is not None else None
        if shard_object == "y":
            from .sharded import shard_state_y
            params, opt_state, mask_dev = shard_state_y(
                tile_mesh, obj_shape, params, opt_state, mask_dev)
        if mesh is not None:
            rep = replicated(mesh)
            if shard_object == "z":
                # FSDP-like memory sharding: the (Y, X, Z) object grids and
                # their Adam moments are split along Z over the data axis —
                # required to fit 1024^3 complex problems on a v5e-8
                # (SURVEY §2 parallelism checklist, "Model/optimizer
                # sharding"). XLA GSPMD inserts the gathers the rotation and
                # per-slice scan need.
                from jax.sharding import NamedSharding, PartitionSpec as P
                zshard = NamedSharding(mesh, P(None, None, "data"))

                def put(x):
                    x = jnp.asarray(x)
                    if getattr(x, "ndim", 0) == 3 and x.shape == obj_shape:
                        return jax.device_put(x, zshard)
                    return jax.device_put(x, rep)

                params = jax.tree.map(put, params)
                opt_state = jax.tree.map(put, opt_state)
                mask_dev = jax.device_put(mask_dev, zshard)
            else:
                params = jax.device_put(params, rep)
                opt_state = jax.device_put(opt_state, rep)
                mask_dev = jax.device_put(mask_dev, rep)

        # ---- checkpoint resume ---------------------------------------------
        start_epoch = 0
        if checkpoint_dir:
            lvl_dir = os.path.join(checkpoint_dir, "ds_%d" % ds_level)
            template = {"params": params, "opt_state": opt_state,
                        "mask": mask_dev, "epoch": 0}
            state, ck_epoch = restore_checkpoint(lvl_dir, template)
            if state is not None:
                params = state["params"]
                opt_state = state["opt_state"]
                mask_dev = state["mask"]
                start_epoch = int(state["epoch"]) + 1
                _log("Resumed from checkpoint at epoch %d" % start_epoch)

        if save_outputs:
            preset_locals = dict(obj_size=obj_shape, output_folder=output_folder,
                                 theta_downsample=theta_downsample,
                                 n_theta=n_theta, n_epochs=n_epochs,
                                 learning_rate=learning_rate, alpha_d=alpha_d,
                                 alpha_b=alpha_b, gamma=gamma,
                                 minibatch_size=minibatch_size,
                                 free_prop_cm=free_prop_cm, psize_cm=psize_cm,
                                 energy_ev=energy_ev, fname=fname,
                                 object_type=object_type)
            create_summary(output_folder, preset_locals, preset="fullfield")

        # ---- epoch loop -----------------------------------------------------
        n_loop = n_epochs if n_epochs != "auto" else max_nepochs
        if ds_level == 1 and n_epoch_final_pass is not None:
            n_loop = n_epoch_final_pass
        loss_ls, reg_ls = [], []
        prj_dev = theta_dev = None
        t0 = time.time()
        _log("Optimizer started.")

        for epoch in range(start_epoch, n_loop):
            if precision == "auto":
                polish = (ds_level == 1
                          and epoch >= n_loop - precision_polish_epochs)
                epoch_prec = "highest" if polish else "high"
            else:
                epoch_prec = None
            step, epoch_scan = get_step(pick_remat(params), epoch_prec)
            profiling = epoch in set(profile_epochs)
            if profiling:
                prof_dir = os.path.join(output_folder, "profiling",
                                        "epoch_%d" % epoch)
                os.makedirs(prof_dir, exist_ok=True)
                jax.profiler.start_trace(prof_dir)
            t00 = time.time()
            order = rng.permutation(n_theta) if random_theta else np.arange(n_theta)
            tot = minibatch_size * n_data
            if n_theta % tot:
                extra = rng.choice(order, tot - (n_theta % tot), replace=True)
                order = np.concatenate([order, extra])
            current_loss = current_reg = None
            if epoch_in_one_call:
                if prj_dev is None:
                    # one-time per-level upload of the full projection stack
                    # and angles; epochs then ship only the index table
                    prj_dev = jnp.asarray(prj_mag_all)
                    theta_dev = jnp.asarray(theta)
                    if mesh is not None:
                        rep_s = replicated(mesh)
                        prj_dev = jax.device_put(prj_dev, rep_s)
                        theta_dev = jax.device_put(theta_dev, rep_s)
                    elif shard_object == "y":
                        # Y-strips of the projection stack live with the
                        # slab that consumes them
                        from jax.sharding import NamedSharding, PartitionSpec
                        prj_dev = jax.device_put(prj_dev, NamedSharding(
                            tile_mesh, PartitionSpec(None, "ty", None)))
                        theta_dev = jax.device_put(theta_dev, NamedSharding(
                            tile_mesh, PartitionSpec()))
                idx_all = order[: n_batch * tot].reshape(n_batch, tot)
                # Chunk the epoch into bounded scan segments: a single XLA
                # program whose EXECUTION runs ~80 s or longer crashes the
                # TPU worker (observed at cone_512 ds1, 250 chained 512^3
                # steps, and at the 900-block ptycho epoch; ~20 s programs
                # are fine). 64 steps bounds 512^3-class segments to ~20 s;
                # block counts are epoch-invariant so this costs at most two
                # compiles per level.
                seg = int(os.environ.get("BDT_FF_SCAN_SEGMENT", "64"))
                # equalize segment sizes so every segment shares ONE compiled
                # shape when n_batch divides evenly (100 -> 2x50, not 64+36)
                if n_batch > seg:
                    n_seg = -(-n_batch // seg)
                    seg = -(-n_batch // n_seg)
                for s0 in range(0, n_batch, seg):
                    idx = jnp.asarray(idx_all[s0:s0 + seg], jnp.int32)
                    if mesh is not None:
                        idx = jax.device_put(idx, data_sharding(mesh, 2, 1))
                    params, opt_state, mask_dev, losses, errs, regs = \
                        epoch_scan(params, opt_state, mask_dev, prj_dev,
                                   theta_dev, idx, jnp.int32(epoch), fwd_plan)
                current_loss = float(losses[-1])
                current_reg = float(regs[-1])
            else:
                for i_batch in range(n_batch):
                    idx = order[i_batch * tot:(i_batch + 1) * tot]
                    theta_batch = jnp.asarray(theta[idx])
                    prj_mag = jnp.asarray(prj_mag_all[idx])
                    if mesh is not None:
                        theta_batch = jax.device_put(theta_batch, batch_shard)
                        prj_mag = jax.device_put(prj_mag, prj_shard)
                    elif shard_object == "y":
                        from jax.sharding import NamedSharding, PartitionSpec
                        theta_batch = jax.device_put(theta_batch, NamedSharding(
                            tile_mesh, PartitionSpec("data")))
                        prj_mag = jax.device_put(prj_mag, NamedSharding(
                            tile_mesh, PartitionSpec("data", "ty", None)))
                    params, opt_state, mask_dev, loss, err, reg = step(
                        params, opt_state, mask_dev, theta_batch, prj_mag,
                        jnp.int32(epoch), fwd_plan)
                    current_loss, current_reg = float(loss), float(reg)
            if profiling:
                jax.profiler.stop_trace()
            loss_ls.append(current_loss)
            reg_ls.append(current_reg)
            if verbose:
                _log("Iteration {}; loss = {}; reg = {}; time = {} s".format(
                    epoch, current_loss, current_reg, time.time() - t00))

            if save_intermediate and save_outputs:
                d = np.abs(np.asarray(params["delta"]))
                if full_intermediate:
                    tiff.write_tiff(d, os.path.join(
                        output_folder, "intermediate",
                        "ds_{}_iter_{:03d}".format(ds_level, epoch)))
                else:
                    tiff.write_tiff(d[d.shape[0] // 2], os.path.join(
                        output_folder, "intermediate",
                        "ds_{}_iter_{:03d}".format(ds_level, epoch)))
                tiff.write_tiff(d, os.path.join(output_folder, "current", "delta"))

            if checkpoint_dir and checkpoint_every and \
                    (epoch + 1) % checkpoint_every == 0:
                save_checkpoint(os.path.join(checkpoint_dir, "ds_%d" % ds_level),
                                epoch, {"params": params, "opt_state": opt_state,
                                        "mask": mask_dev, "epoch": epoch})

            # 'auto' stopping: every host computes the same reduced loss, so the
            # decision is consistent with no stop-flag files (ref fullfield.py:570-594).
            if n_epochs == "auto" and len(loss_ls) > 1:
                rate = (loss_ls[-1] - loss_ls[-2]) / loss_ls[-2]
                _log("Reduction rate of loss is {}.".format(rate))
                if -crit_conv_rate < rate < 0:
                    break

        _log("Total time: {}".format(time.time() - t0))

        res_delta = np.clip(np.asarray(params["delta"]) * np.asarray(mask_dev), 0, None)
        res_beta = np.clip(np.asarray(params["beta"]) * np.asarray(mask_dev), 0, None)
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
            np.save(os.path.join(conv_dir, "reg_ds_{}".format(ds_level)),
                    np.array(reg_ls))
            np.save(os.path.join(conv_dir, "error_ds_{}".format(ds_level)),
                    np.array(loss_ls) - np.array(reg_ls))
            _plot_convergence(conv_dir, ds_level, loss_ls, reg_ls)

        info["per_level"][ds_level] = {"loss": loss_ls, "reg": reg_ls}
        info["loss"] += loss_ls
        info["reg"] += reg_ls
        prev_level = (res_delta, res_beta)
        _log("Current iteration finished.")

    info["probe"] = probe_final
    info["mask"] = np.asarray(mask_dev)
    info["output_folder"] = output_folder
    info["wall_time_s"] = time.time() - t_zero
    return res_delta, res_beta, info


def _plot_convergence(conv_dir, ds_level, loss_ls, reg_ls):
    """Semilogy convergence plot (ref fullfield.py:666-681)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    error_ls = np.array(loss_ls) - np.array(reg_ls)
    x = len(loss_ls)
    plt.figure()
    plt.semilogy(range(x), loss_ls, label="Total loss")
    plt.semilogy(range(x), reg_ls, label="Regularizer")
    plt.semilogy(range(x), error_ls, label="Error term")
    plt.legend()
    plt.savefig(os.path.join(conv_dir, "converge_ds_{}.png".format(ds_level)),
                format="png")
    plt.close()
