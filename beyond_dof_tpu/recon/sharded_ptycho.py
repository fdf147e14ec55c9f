"""Fully Y-sharded ptycho-tomography training step (1024-class ptycho).

Extends the Y-slab decomposition of :mod:`recon.sharded` (the full-field
north-star path) to the ptychographic forward model
(ref tensorflow_recon/ptychography.py:19-633). The full-field Y-shard keeps
every stage slab-local; ptychography adds one complication: probe windows
(probe_size rows tall) cross Y-slab boundaries.

Decomposition:

  * the object, its Adam moments, and the support mask are Y-slab sharded —
    resident state is O(N^3 / n_ty) per device, exactly as in the
    full-field path;
  * the per-angle rotation acts on the (X, Z) plane independently per Y
    row (ref simulation.py:86) — slab-local, no communication;
  * each probe position is OWNED by the device whose slab contains its
    center row (``pos_y // tile_y``). Before window extraction the rotated
    slab exchanges ``halo = probe_size/2`` boundary rows with its ring
    neighbors (one ``ppermute`` pair per angle — NOT per slice), after
    which every owned window is gatherable locally. Rows outside the
    volume read the analytic zero pad (the reference's np.pad
    ``compute_pad_arr`` region, ref ptychography.py:45-61);
  * each device multislice-propagates only its owned windows (the position
    grid is uniform, so slabs are load-balanced to within one window row);
    job tables are host-built static arrays padded to the per-slab
    maximum with weight-0 entries — shapes stay static for XLA;
  * loss/regularizer terms are local sums ``psum``-reduced; the gradient
    of the halo exchange transposes to the reverse ``ppermute`` + add
    automatically under ``shard_map``.

Per-device transient footprint: the rotated extended slab
O((tile_y + probe) * N^2) plus one chunk of windows — at 1024^3 over 8
devices with a 72^2 probe that is ~1.6 GB, vs the O(N^3) = 8.6 GB an
unsharded rotation would materialize. See
``benchmarks/shard_y_ptycho_mem.py`` for the compiled-step XLA memory
analysis rows.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from functools import partial

from ..ops.rotate import rotate_volume_zfirst_tfgrad
from ..ops.tiled import shard_map
from ..ops.regularizers import l1_norm
from ..models.ptycho import safe_mag
from ..parallel.collectives import halo_exchange_1d
from .engine import apply_projection
from .sharded import _spec_tree

__all__ = ["build_job_tables", "arrange_data_y",
           "build_step_sharded_y_ptycho"]


def needs_x_pad(probe_pos, probe_size, dim_x):
    """True when any probe window overhangs the volume in X (the reference's
    compute_pad_arr X branch, ref ptychography.py:45-61). The standard
    uniform-grid geometries never do — skipping the pad then saves two
    padded-slab copies per angle at 1024^3 scale."""
    probe_pos = np.asarray(probe_pos, dtype=int)
    half_x = probe_size[1] // 2
    starts = probe_pos[:, 1] - half_x
    return bool((starts < 0).any() or (starts + probe_size[1] > dim_x).any())


def build_job_tables(probe_pos, probe_size, obj_shape, n_ty):
    """Host-side static position->slab assignment.

    Returns ``(tables, weights, halo)``:
      * tables: (n_ty, max_jobs, 2) int32 — per owned window, the row/col
        start of the window in the device's EXTENDED local frame
        (slab rows padded by ``halo`` on both sides, X padded by the
        probe half-width on both sides);
      * weights: (n_ty, max_jobs) float32 — 1 for real jobs, 0 for pads
        (pad entries re-gather the slab's first window; their loss terms
        are masked);
      * halo: the Y halo rows each slab exchanges per angle.
    """
    probe_pos = np.asarray(probe_pos, dtype=int)
    py, px = probe_size
    dim_y, dim_x, _ = obj_shape
    assert dim_y % n_ty == 0, "Y must divide the ty mesh size"
    tile_y = dim_y // n_ty
    half_y, half_x = py // 2, px // 2

    owner = np.clip(probe_pos[:, 0] // tile_y, 0, n_ty - 1)
    # extended-frame start offsets: global start row s = pos_y - half_y;
    # local = s - (slab_start - halo); X start = pos_x - half_x + half_x pad
    halo = half_y
    jobs = [[] for _ in range(n_ty)]
    x_off = half_x if needs_x_pad(probe_pos, probe_size, dim_x) else 0
    for (y, x), d in zip(probe_pos, owner):
        s = y - half_y - (d * tile_y - halo)
        assert 0 <= s <= tile_y + 2 * halo - py, (
            "window (y=%d) escapes slab %d's halo; widen halo" % (y, d))
        # X start in the step's frame: pos_x - half_x, shifted by half_x
        # when the step pads X (only when some window actually overhangs)
        jobs[d].append((s, x - half_x + x_off))
    max_jobs = max(len(j) for j in jobs)
    tables = np.zeros((n_ty, max_jobs, 2), np.int32)
    weights = np.zeros((n_ty, max_jobs), np.float32)
    for d in range(n_ty):
        for i in range(max_jobs):
            s, x = jobs[d][i] if i < len(jobs[d]) else (jobs[d][0]
                                                        if jobs[d] else (0, 0))
            tables[d, i] = (s, x)  # x start in padded-X frame = x (pad half_x)
            if i < len(jobs[d]):
                weights[d, i] = 1.0
    return tables, weights, halo


def arrange_data_y(mag_angle, probe_pos, probe_size, obj_shape, n_ty):
    """Arrange one angle's (n_pos, py, px) magnitudes into the
    (n_ty, max_jobs, py, px) per-slab layout matching build_job_tables."""
    probe_pos = np.asarray(probe_pos, dtype=int)
    dim_y = obj_shape[0]
    tile_y = dim_y // n_ty
    owner = np.clip(probe_pos[:, 0] // tile_y, 0, n_ty - 1)
    jobs = [[] for _ in range(n_ty)]
    for i, d in enumerate(owner):
        jobs[d].append(i)
    max_jobs = max(len(j) for j in jobs)
    py, px = probe_size
    out = np.zeros((n_ty, max_jobs, py, px), np.float32)
    for d in range(n_ty):
        for slot, i in enumerate(jobs[d]):
            out[d, slot] = mag_angle[i]
    return out


def build_step_sharded_y_ptycho(tx, opt_state_template, mesh, obj_shape,
                                probe_re, probe_im, probe_pos, probe_size,
                                energy_ev, psize_cm, free_prop_cm="inf",
                                alpha_d=0.0, alpha_b=0.0, gamma=0.0,
                                n_epochs_mask_release=None,
                                n_dp_batch=None, remat="invertible",
                                ext_dtype=None, checkpoint_ext=False):
    """Build the jitted Y-sharded ptycho train ``step``.

    ``step(params, opt_state, mask, theta, mag_slabs, epoch)`` with
    ``mag_slabs`` laid out by :func:`arrange_data_y`; params/opt_state/mask
    Y-sharded via :func:`recon.sharded.shard_state_y`.

    Memory levers for the 16 GB/device regime (1024^3-class steps):
      * the X pad is applied only when some window actually overhangs the
        volume (:func:`needs_x_pad`) — the uniform grids never do;
      * ``ext_dtype='bfloat16'`` carries the rotated extended slabs (and
        their backward cotangents) in bf16 — windows are cast back to f32
        before the multislice sweep, so only the OBJECT SAMPLING of each
        window is quantized (delta/beta magnitudes, ~3 decimal digits),
        not the propagation arithmetic;
      * ``checkpoint_ext=True`` rematerializes the rotate+halo-exchange
        pipeline in the backward instead of storing the extended slabs.
    """
    from ..ops.multislice import multislice_propagate_batch_split

    dim_y, dim_x, n_slice = obj_shape
    n_ty = mesh.shape["ty"]
    assert mesh.shape.get("tx", 1) == 1 and mesh.shape.get("data", 1) == 1, \
        "sharded-y ptycho uses a pure ty mesh"
    tile_y = dim_y // n_ty
    py, px = probe_size
    half_x = px // 2

    tables_np, weights_np, halo = build_job_tables(
        probe_pos, probe_size, obj_shape, n_ty)
    max_jobs = tables_np.shape[1]
    n_real = float(np.asarray(weights_np).sum())
    tables = jnp.asarray(tables_np)
    weights = jnp.asarray(weights_np)

    p_re = jnp.asarray(np.asarray(probe_re, np.float32))
    p_im = jnp.asarray(np.asarray(probe_im, np.float32))

    def tv3d_local(arr):
        fwd_perm = [(i, (i - 1) % n_ty) for i in range(n_ty)]
        t = jnp.sum(jnp.abs(arr[1:] - arr[:-1]))
        t += jnp.sum(jnp.abs(arr[:, 1:] - arr[:, :-1]))
        t += jnp.sum(jnp.abs(arr[:, :, 1:] - arr[:, :, :-1]))
        if n_ty > 1:
            idx = jax.lax.axis_index("ty")
            nxt_first = jax.lax.ppermute(arr[:1], "ty", fwd_perm)
            bound = jnp.sum(jnp.abs(nxt_first - arr[-1:]))
            t = t + jnp.where(idx < n_ty - 1, bound, 0.0)
        return t

    x_pad = half_x if needs_x_pad(probe_pos, probe_size,
                                  dim_x) else 0

    def build_ext(params_l, mask_l, theta):
        obj_d = params_l["delta"] * mask_l
        obj_b = params_l["beta"] * mask_l
        # slab-local per-Y-row rotation, z-first output (Z, tile_y, X)
        d_rot = rotate_volume_zfirst_tfgrad(obj_d, theta)
        b_rot = rotate_volume_zfirst_tfgrad(obj_b, theta)
        # ONE halo exchange per angle (rows of the rotated slab); outside-
        # volume rows read the analytic zero pad (ref ptychography.py:45-61)
        d_ext = halo_exchange_1d(d_rot, halo, 1, "ty", edge_val=0.0)
        b_ext = halo_exchange_1d(b_rot, halo, 1, "ty", edge_val=0.0)
        # X pad only when a window actually overhangs (compute_pad_arr X
        # branch); the uniform grids never do, saving two padded copies
        if x_pad:
            d_ext = jnp.pad(d_ext, ((0, 0), (0, 0), (x_pad, x_pad)))
            b_ext = jnp.pad(b_ext, ((0, 0), (0, 0), (x_pad, x_pad)))
        if ext_dtype is not None:
            d_ext = d_ext.astype(ext_dtype)
            b_ext = b_ext.astype(ext_dtype)
        return obj_d, obj_b, d_ext, b_ext

    if checkpoint_ext:
        build_ext = jax.checkpoint(build_ext)

    def local_loss(params_l, mask_l, theta, table_l, w_l, mag_l):
        # shard_map keeps the sharded leading axis as size 1 — drop it
        table_l, w_l, mag_l = table_l[0], w_l[0], mag_l[0]
        obj_d, obj_b, d_ext, b_ext = build_ext(params_l, mask_l, theta)

        def gather(job):
            sl_d = jax.lax.dynamic_slice(
                d_ext, (0, job[0], job[1]), (n_slice, py, px))
            sl_b = jax.lax.dynamic_slice(
                b_ext, (0, job[0], job[1]), (n_slice, py, px))
            # (Z, py, px) -> (py, px, Z) for the multislice batch layout,
            # back to f32 if the ext slabs are carried quantized
            return (jnp.transpose(sl_d, (1, 2, 0)).astype(jnp.float32),
                    jnp.transpose(sl_b, (1, 2, 0)).astype(jnp.float32))

        def fwd_chunk(jobs_chunk):
            pd, pb = jax.vmap(gather)(jobs_chunk)
            # the replicated probe seeds the scan carry, whose scanned
            # slices vary over 'ty' — mark it varying so the types match
            pr = jax.lax.pcast(p_re, ("ty",), to="varying")
            pi = jax.lax.pcast(p_im, ("ty",), to="varying")
            return multislice_propagate_batch_split(
                pd, pb, pr, pi, energy_ev, psize_cm,
                free_prop_cm=free_prop_cm, remat=remat)

        if n_dp_batch is None or n_dp_batch >= max_jobs:
            re, im = fwd_chunk(table_l)
        else:
            n_chunks = -(-max_jobs // n_dp_batch)
            padn = n_chunks * n_dp_batch - max_jobs
            tpad = jnp.concatenate(
                [table_l, jnp.broadcast_to(table_l[-1:], (padn, 2))]) \
                if padn else table_l
            chunks = tpad.reshape(n_chunks, n_dp_batch, 2)
            fn = jax.checkpoint(fwd_chunk) if remat else fwd_chunk
            re, im = jax.lax.map(fn, chunks)
            re = re.reshape((n_chunks * n_dp_batch, py, px))[:max_jobs]
            im = im.reshape((n_chunks * n_dp_batch, py, px))[:max_jobs]

        mags = safe_mag(re, im)
        err_local = jnp.sum(w_l[:, None, None] * (mags - mag_l) ** 2)
        err = jax.lax.psum(err_local, "ty") / np.float32(n_real * py * px)

        reg_local = alpha_d * l1_norm(obj_d) + alpha_b * l1_norm(obj_b)
        if gamma:
            reg_local = reg_local + gamma * tv3d_local(obj_d)
        reg = jax.lax.psum(reg_local, "ty")
        return err + reg, (err, reg)

    def _step_local(params_l, opt_l, mask_l, theta, table_l, w_l, mag_l,
                    epoch):
        (loss, (err, reg)), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params_l, mask_l, theta, table_l,
                                      w_l, mag_l)
        updates, opt_l = tx.update(grads, opt_l, params_l)
        params_l = optax.apply_updates(params_l, updates)
        params_l = apply_projection(params_l, mask_l, epoch,
                                    n_epochs_mask_release, None)
        return params_l, opt_l, mask_l, loss, err, reg

    vol3 = P("ty", None, None)
    p_specs = {"delta": vol3, "beta": vol3}
    o_specs = _spec_tree(opt_state_template, obj_shape, vol3)
    in_specs = (p_specs, o_specs, vol3, P(), P("ty"), P("ty"), P("ty"), P())
    out_specs = (p_specs, o_specs, vol3, P(), P(), P())
    sharded_step = shard_map(_step_local, mesh, in_specs, out_specs)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, opt_state, mask, theta, mag_slabs, epoch):
        return sharded_step(params, opt_state, mask, theta, tables,
                            weights, mag_slabs, epoch)

    def loss_only(params, mask, theta, mag_slabs):
        def _loss_local(params_l, mask_l, theta, table_l, w_l, mag_l):
            loss, (err, reg) = local_loss(params_l, mask_l, theta, table_l,
                                          w_l, mag_l)
            return loss, err, reg
        fn = shard_map(_loss_local, mesh,
                       (p_specs, vol3, P(), P("ty"), P("ty"), P("ty")),
                       (P(), P(), P()))
        return fn(params, mask, theta, tables, weights, mag_slabs)

    return step, loss_only
