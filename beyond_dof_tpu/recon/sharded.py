"""Fully Y-sharded full-field training step (the north-star memory path).

``shard_object='z'`` (recon/fullfield.py) shards the resident training
state over the mesh but lets GSPMD all-gather the full object for the
rotation — so the *transient* per-device footprint is still O(N^3) and a
1024^3 training step cannot actually fit a 16 GB v5e chip.

This module shards along Y (axis 0) instead, which makes EVERY stage of
the train step local to a Y-slab:

  * the tomographic rotation acts on the (X, Z) plane independently per Y
    row (ref simulation.py:86 rotates axes (1, 2)) — slab-local, no comm;
  * the truncated-kernel multislice propagator (the paper's tiling design,
    ref cnn_propagator/propagation.py:18-133) needs only a
    (kernel_size-1)/2 halo of wavefield rows per slice — a per-slice
    ``ppermute`` ring exchange over ICI (ops/tiled.py machinery);
  * the loss, the L1/TV regularizers (TV's Y-boundary term is one more
    ppermuted row), Adam, and the support/non-negativity projections are
    elementwise or reduce to ``psum`` scalars.

Only the exit *plane* (B, Y, X — megabytes, not gigabytes) is ever
all-gathered, for the final sample-to-detector free-space step and the
renormalization. Per-device memory is therefore O(N^3 / n_ty) for state
AND transients: at 1024^3 over 8 chips, ~3.7 GB of training state plus
slab-sized activations per chip — this is what makes the north-star
"1024^3 full-field reconstruction on a v5e-8" fit, where the z-shard
cannot.

Everything is split-complex (no complex dtypes: TPU runtimes without
complex64 support run this path unchanged).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P
from functools import partial

from ..constants import PI
from ..ops.fresnel import get_kernel, ifftshift2
from ..ops.tiled import (truncated_kernel, conv_matrices, _conv_step_split,
                         _norm_psize, shard_map)
from ..ops.rotate import rotate_volume_zfirst_tfgrad
from ..ops.regularizers import l1_norm
from ..parallel.collectives import halo_exchange_1d
from .engine import apply_projection

__all__ = ["build_step_sharded_y", "shard_state_y", "y_sharding"]


def y_sharding(mesh, ndim=3):
    """NamedSharding splitting axis 0 (Y) over the mesh's ``ty`` axis."""
    spec = P(*(["ty"] + [None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def shard_state_y(mesh, obj_shape, params, opt_state, mask):
    """device_put params/opt_state/mask with Y-slab shardings."""
    ysh = y_sharding(mesh)
    rep = NamedSharding(mesh, P())

    def put(x):
        x = jnp.asarray(x)
        if getattr(x, "ndim", 0) == 3 and tuple(x.shape) == tuple(obj_shape):
            return jax.device_put(x, ysh)
        return jax.device_put(x, rep)

    return (jax.tree.map(put, params), jax.tree.map(put, opt_state),
            jax.device_put(jnp.asarray(mask), ysh))


def _spec_tree(template, obj_shape, vol_spec):
    """Per-leaf PartitionSpecs: Y-sharded for object-shaped volumes."""
    def leaf_spec(x):
        if getattr(x, "ndim", 0) == 3 and tuple(x.shape) == tuple(obj_shape):
            return vol_spec
        return P()
    return jax.tree.map(leaf_spec, template)


def build_step_sharded_y(tx, opt_state_template, mesh, obj_shape, probe,
                         energy_ev, psize_cm, free_prop_cm,
                         alpha, alpha_d, alpha_b, gamma,
                         n_epochs_mask_release=None, kernel_size=17,
                         remat=True, n_theta_hint=None):
    """Build (step, epoch_scan) with the whole train step inside one
    ``shard_map`` over the mesh's ``ty`` axis.

    Same call signatures as recon.fullfield._build_step's outputs, so the
    engine's epoch loop drives it unchanged. ``probe`` is the (Y, X)
    complex probe (host array; plane/fixed/gaussian — not optimizable).
    """
    assert kernel_size % 2 == 1, "kernel_size must be an odd number."
    dim_y, dim_x, n_slice = obj_shape
    n_ty = mesh.shape["ty"]
    n_dp = mesh.shape.get("data", 1)
    assert mesh.shape.get("tx", 1) == 1, \
        "shard_object='y' tiles Y only; use a (data, ty) mesh (tx=1)"
    assert dim_y % n_ty == 0, "Y must divide the ty mesh size"
    tile_y = dim_y // n_ty
    pad = (kernel_size - 1) // 2
    assert pad <= tile_y, "halo wider than the Y slab; use fewer tiles"

    psize = _norm_psize(psize_cm)
    voxel_nm = psize * 1.0e7
    lmbda_nm = 1240.0 / energy_ev
    delta_nm = voxel_nm[-1]
    k = np.float32(2.0 * PI * delta_nm / lmbda_nm)

    ky, kx, scale = truncated_kernel(delta_nm, lmbda_nm, voxel_nm,
                                     (dim_y, dim_x), kernel_size)
    Gy, Gx = conv_matrices(ky, kx, scale, (tile_y, dim_x))
    GyR, GyI = jnp.asarray(np.real(Gy)), jnp.asarray(np.imag(Gy))
    GxR, GxI = jnp.asarray(np.real(Gx)), jnp.asarray(np.imag(Gx))
    ksum = complex(scale * ky.sum() * kx.sum())

    probe_host = np.asarray(probe)
    p_re_full = jnp.asarray(np.real(probe_host).astype(np.float32))
    p_im_full = jnp.asarray(np.imag(probe_host).astype(np.float32))

    # final free-space kernel on the gathered (small) plane
    h_free = None
    if free_prop_cm is not None and not isinstance(free_prop_cm, str):
        from ..ops.splitfft import permute_kernel_2d
        h = get_kernel(free_prop_cm * 1e7, lmbda_nm, voxel_nm,
                       (dim_y, dim_x))
        h_p = permute_kernel_2d(ifftshift2(np.asarray(h)))
        h_free = (jnp.asarray(np.real(h_p).astype(np.float32)),
                  jnp.asarray(np.imag(h_p).astype(np.float32)))

    fwd_perm = [(i, (i - 1) % n_ty) for i in range(n_ty)]  # recv next's rows

    def propagate_local(d_rot, b_rot):
        """Slab-local split multislice with per-slice Y-halo ppermute.

        d_rot/b_rot: (B, Z, tile_y, X) z-first stacks (the rotation gather
        writes z-first, so no minor-dim relayout copy is ever made).
        Returns local (B, tile_y, X) exit strips (pre free-space, pre
        renormalization) + final edge.
        """
        n_batch = d_rot.shape[0]
        idx = jax.lax.axis_index("ty")
        wr = jnp.broadcast_to(jax.lax.dynamic_slice_in_dim(
            p_re_full, idx * tile_y, tile_y, 0), (n_batch, tile_y, dim_x))
        wi = jnp.broadcast_to(jax.lax.dynamic_slice_in_dim(
            p_im_full, idx * tile_y, tile_y, 0), (n_batch, tile_y, dim_x))
        dz = jnp.moveaxis(d_rot, 1, 0)  # (Z, B, tile_y, X): major-dim swap
        bz = jnp.moveaxis(b_rot, 1, 0)

        xpad_mask = jnp.pad(jnp.ones((dim_x,), jnp.float32), (pad, pad),
                            constant_values=0.0)

        def step(carry, slices):
            wr, wi, er, ei = carry
            d, b = slices
            amp = jnp.exp(-k * b)
            cr = amp * jnp.cos(k * d)
            ci = amp * jnp.sin(k * d)
            wr, wi = wr * cr - wi * ci, wr * ci + wi * cr
            # Y halo from ring neighbors (boundary slabs get the analytic
            # edge value — ref propagation.py:91-99), X pad is the edge
            wrp = halo_exchange_1d(wr, pad, 1, "ty", edge_val=er)
            wip = halo_exchange_1d(wi, pad, 1, "ty", edge_val=ei)
            wrp = jnp.pad(wrp, ((0, 0), (0, 0), (pad, pad)))
            wip = jnp.pad(wip, ((0, 0), (0, 0), (pad, pad)))
            wrp = jnp.where(xpad_mask == 0, er, wrp)
            wip = jnp.where(xpad_mask == 0, ei, wip)
            wr, wi = _conv_step_split(wrp, wip, GyR, GyI, GxR, GxI)
            er, ei = (er * np.float32(ksum.real) - ei * np.float32(ksum.imag),
                      er * np.float32(ksum.imag) + ei * np.float32(ksum.real))
            return (wr, wi, er, ei), None

        step_fn = jax.checkpoint(step) if remat else step
        carry = (wr, wi, jnp.float32(1.0), jnp.float32(0.0))
        if n_dp > 1:
            # the probe-derived carry is data-replicated but the scanned
            # modulation varies over the 'data' replicas; mark the carry
            # varying so the scan types match
            carry = jax.lax.pcast(carry, ("data",), to="varying")
        (wr, wi, er, ei), _ = jax.lax.scan(step_fn, carry, (dz, bz))
        return wr, wi

    def tv3d_local(arr):
        """Reference TV (sum of |diff| along each axis once) on a Y-slab,
        with the slab-boundary Y term fetched from the next rank."""
        t = jnp.sum(jnp.abs(arr[1:] - arr[:-1]))
        t += jnp.sum(jnp.abs(arr[:, 1:] - arr[:, :-1]))
        t += jnp.sum(jnp.abs(arr[:, :, 1:] - arr[:, :, :-1]))
        if n_ty > 1:
            idx = jax.lax.axis_index("ty")
            nxt_first = jax.lax.ppermute(arr[:1], "ty", fwd_perm)
            bound = jnp.sum(jnp.abs(nxt_first - arr[-1:]))
            t = t + jnp.where(idx < n_ty - 1, bound, 0.0)
        return t

    def local_loss(params_l, mask_l, theta_batch, prj_l):
        obj_d = params_l["delta"] * mask_l
        obj_b = params_l["beta"] * mask_l
        # per-Y-row rotation is slab-local; the z-first gather writes the
        # propagation layout directly, and the 'tf' cotangent rotation
        # (engine default, ref tf.contrib.image.rotate semantics) keeps the
        # backward a gather too — no scatter-add, no O(N^3) index temps
        rot = jax.vmap(lambda th: (rotate_volume_zfirst_tfgrad(obj_d, th),
                                   rotate_volume_zfirst_tfgrad(obj_b, th)))
        d_rot, b_rot = rot(theta_batch)                  # (B, Z, tile_y, X)
        wr, wi = propagate_local(d_rot, b_rot)           # (B, tile_y, X)

        # gather the (small) exit plane for renormalization + free space
        wr_f = jax.lax.all_gather(wr, "ty", axis=1, tiled=True)
        wi_f = jax.lax.all_gather(wi, "ty", axis=1, tiled=True)
        fr, fi = wr_f[0, 0, 0], wi_f[0, 0, 0]
        init_r, init_i = p_re_full[0, 0], p_im_full[0, 0]
        denom = fr * fr + fi * fi
        sr = (init_r * fr + init_i * fi) / denom
        si = (init_i * fr - init_r * fi) / denom
        wr_f, wi_f = wr_f * sr - wi_f * si, wr_f * si + wi_f * sr
        if isinstance(free_prop_cm, str) and free_prop_cm == "inf":
            from ..ops.splitfft import cfft2_split
            wr_f, wi_f = cfft2_split(wr_f, wi_f)
            wr_f = jnp.fft.fftshift(wr_f, axes=(-2, -1))
            wi_f = jnp.fft.fftshift(wi_f, axes=(-2, -1))
        elif h_free is not None:
            from ..ops.splitfft import apply_kernel_split_perm
            wr_f, wi_f = apply_kernel_split_perm(wr_f, wi_f,
                                                 h_free[0], h_free[1])

        # data term on MY strip only -> psum (each device's loss term is
        # distinct, so the all_gather transpose sums cotangents correctly)
        idx = jax.lax.axis_index("ty")
        wr_s = jax.lax.dynamic_slice_in_dim(wr_f, idx * tile_y, tile_y, 1)
        wi_s = jax.lax.dynamic_slice_in_dim(wi_f, idx * tile_y, tile_y, 1)
        mag = jnp.sqrt(wr_s * wr_s + wi_s * wi_s)
        err_local = jnp.sum((mag - prj_l) ** 2)
        n_px = np.float32(prj_l.shape[0] * dim_y * dim_x)
        err = jax.lax.psum(err_local, "ty") / n_px

        if alpha_d is None:
            reg_local = alpha * (l1_norm(obj_d) + l1_norm(obj_d))
            if gamma != 0:
                reg_local = reg_local + gamma * tv3d_local(obj_d)
        else:
            reg_local = alpha_d * l1_norm(obj_d) + alpha_b * l1_norm(obj_b)
            if gamma != 0:
                reg_local = reg_local + gamma * tv3d_local(obj_d)
        reg = jax.lax.psum(reg_local, "ty")

        loss = err + reg
        return loss, (err, reg)

    def _step_local(params_l, opt_l, mask_l, theta_batch, prj_l, epoch):
        (loss, (err, reg)), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params_l, mask_l, theta_batch, prj_l)
        if n_dp > 1:
            # data-parallel replicas of the Y-sharded object over the
            # 'data' mesh axis: each replica differentiates its own
            # minibatch-mean loss; averaging the gradients reproduces the
            # global-batch mean (Horovod-allreduce semantics, ref
            # fullfield.py:412). Scalars are averaged for reporting.
            grads = jax.lax.pmean(grads, "data")
            loss = jax.lax.pmean(loss, "data")
            err = jax.lax.pmean(err, "data")
        updates, opt_l = tx.update(grads, opt_l, params_l)
        params_l = optax.apply_updates(params_l, updates)
        params_l = apply_projection(params_l, mask_l, epoch,
                                    n_epochs_mask_release, None)
        return params_l, opt_l, mask_l, loss, err, reg

    vol3 = P("ty", None, None)
    params_template = {"delta": 0, "beta": 0}
    p_specs = jax.tree.map(lambda _: vol3, params_template)
    o_specs = _spec_tree(opt_state_template, obj_shape, vol3)
    if n_dp > 1:
        in_specs = (p_specs, o_specs, vol3, P("data"),
                    P("data", "ty", None), P())
    else:
        in_specs = (p_specs, o_specs, vol3, P(), P(None, "ty", None), P())
    out_specs = (p_specs, o_specs, vol3, P(), P(), P())

    sharded_step = shard_map(_step_local, mesh, in_specs, out_specs)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, opt_state, mask, theta_batch, prj_mag, epoch, plan=None):
        del plan
        return sharded_step(params, opt_state, mask, theta_batch, prj_mag,
                            epoch)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def epoch_scan(params, opt_state, mask, prj_all, theta_all, idx, epoch,
                   plan=None):
        del plan

        def body(carry, idx_row):
            params, opt_state, mask = carry
            th = theta_all[idx_row]
            mag = prj_all[idx_row]
            params, opt_state, mask, loss, err, reg = sharded_step(
                params, opt_state, mask, th, mag, epoch)
            return (params, opt_state, mask), (loss, err, reg)

        (params, opt_state, mask), (losses, errs, regs) = jax.lax.scan(
            body, (params, opt_state, mask), idx)
        return params, opt_state, mask, losses, errs, regs

    return step, epoch_scan
