"""Cone-beam (spherical-wave) propagation path.

TPU-native rebuild of the point-source/cone-beam machinery
(ref tensorflow_recon/npfuncs.py:66-201, util.py:582-707,
interpolation.py:8-94). The reference marks parts of this path deprecated
(ref util.py:586) but it backs the ``probe_type='point'`` workloads
(params_cone_pp, ref reconstruct_fullfield.py:238-269).

Design: the cartesian->spherical resample and the detector-plane mapping are
trilinear ``map_coordinates`` gathers (differentiable; replaces both the
RegularGridInterpolator host code and the 8-corner matrix-solve trilinear
interpolation of ref interpolation.py:44-94). The per-slice free-space step
uses the equirectangular kernel of :func:`..ops.fresnel.get_kernel_spherical`.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates

from ..constants import PI
from .fresnel import free_propagate_spherical

__all__ = ["cartesian_to_spherical", "multislice_propagate_spherical",
           "multislice_propagate_spherical_split", "get_wavefront_on_plane",
           "get_wavefront_on_plane_split", "build_spherical_plan"]


def _spherical_sample_coords(shape, dist_to_source_nm, psize_nm, theta_max,
                             phi_max):
    """Pixel-space source coordinates for the cartesian->spherical gather.

    (ref npfuncs.py:171-199: same geometry, expressed directly in pixel
    units for map_coordinates.)
    """
    s0, s1, s2 = shape
    theta_mid = (s0 - 1) / 2.0
    phi_mid = (s1 - 1) / 2.0
    theta_true = (np.arange(s0) - theta_mid) * (2 * theta_max / (s0 - 1))
    phi_true = (np.arange(s1) - phi_mid) * (2 * phi_max / (s1 - 1))
    r_true = np.arange(s2) * psize_nm + dist_to_source_nm
    phi, theta, r = np.meshgrid(phi_true, theta_true, r_true)

    x = r * np.sin(theta)
    y = r * np.cos(theta) * np.sin(phi)
    z = r * np.cos(theta) * np.cos(phi) - dist_to_source_nm
    # pixel units, origin at the volume center for transverse axes
    xi = x / psize_nm + theta_mid
    yi = y / psize_nm + phi_mid
    zi = z / psize_nm
    # meshgrid output is (theta, phi, r) ordered (s0, s1, s2) after transpose:
    coords = np.stack([np.transpose(xi, (1, 0, 2)),
                       np.transpose(yi, (1, 0, 2)),
                       np.transpose(zi, (1, 0, 2))])
    return coords.astype(np.float32)


def _spherical_inverse_coords(shape, dist_to_source_nm, psize_nm, theta_max,
                              phi_max):
    """Inverse of :func:`_spherical_sample_coords`: for every cartesian
    voxel, its fractional (theta, phi, r) grid position, plus the Jacobian
    determinant |d(spherical idx)/d(cartesian idx)| (central differences).

    Together these implement the adjoint of the trilinear resample as a
    GATHER: R^T g (x) ~= g(S(x)) |det J_S(x)| for the inverse map S — the
    continuum adjoint of the interpolation operator, discretization error
    O(h). On TPU this replaces the backward scatter-add that XLA derives
    for the forward gather (measured 11 s per train step at 256^3 vs
    ~2 s for the gather form).
    """
    s0, s1, s2 = shape
    theta_mid = (s0 - 1) / 2.0
    phi_mid = (s1 - 1) / 2.0
    d_theta = 2 * theta_max / (s0 - 1)
    d_phi = 2 * phi_max / (s1 - 1)
    a0 = (np.arange(s0) - theta_mid) * psize_nm          # x
    a1 = (np.arange(s1) - phi_mid) * psize_nm            # y
    a2 = np.arange(s2) * psize_nm + dist_to_source_nm    # z + R0
    x = a0[:, None, None]
    y = a1[None, :, None]
    zr = a2[None, None, :]
    r = np.sqrt(x ** 2 + y ** 2 + zr ** 2)
    theta = np.arcsin(np.clip(x / r, -1.0, 1.0))
    phi = np.arctan2(y, zr)
    it = theta / d_theta + theta_mid
    ip = phi / d_phi + phi_mid
    ir = (r - dist_to_source_nm) / psize_nm
    # forward convention (_spherical_sample_coords transposes): the
    # spherical OUTPUT grid is ordered (phi, theta, r) — phi first
    inv = np.stack([np.broadcast_to(ip, (s0, s1, s2)),
                    np.broadcast_to(it, (s0, s1, s2)),
                    np.broadcast_to(ir, (s0, s1, s2))])
    jac = np.abs(np.linalg.det(np.stack(
        [np.stack(np.gradient(inv[k], axis=(0, 1, 2)), axis=-1)
         for k in range(3)], axis=-2)))
    return inv.astype(np.float32), jac.astype(np.float32)


@jax.custom_vjp
def _resample_invgrad(vol, coords, inv_coords, inv_jac):
    """Trilinear gather with an inverse-map gather adjoint (see
    :func:`_spherical_inverse_coords`)."""
    return map_coordinates(vol, list(coords), order=1, mode="constant",
                           cval=0.0)


def _resample_invgrad_fwd(vol, coords, inv_coords, inv_jac):
    out = _resample_invgrad(vol, coords, inv_coords, inv_jac)
    return out, (coords, inv_coords, inv_jac)


def _resample_invgrad_bwd(res, g):
    coords, inv_coords, inv_jac = res
    gv = map_coordinates(g, list(inv_coords), order=1, mode="constant",
                         cval=0.0) * inv_jac
    # plan constants carry no useful cotangent (dropped by DCE upstream)
    return (gv, jnp.zeros_like(coords), jnp.zeros_like(inv_coords),
            jnp.zeros_like(inv_jac))


_resample_invgrad.defvjp(_resample_invgrad_fwd, _resample_invgrad_bwd)


def cartesian_to_spherical(arr, dist_to_source_nm, psize_nm,
                           theta_max=PI / 18, phi_max=PI / 18):
    """Resample a (Y, X, Z) cartesian volume onto a (theta, phi, r) grid.

    Trilinear, zero fill outside (ref npfuncs.py:171-201). Differentiable.
    """
    coords = _spherical_sample_coords(arr.shape, dist_to_source_nm, psize_nm,
                                      theta_max, phi_max)
    return map_coordinates(jnp.asarray(arr), list(jnp.asarray(coords)),
                           order=1, mode="constant", cval=0.0)


def _plane_geometry(r_nm, detector_size, delta_r_nm, det_psize_nm,
                    theta_max, phi_max):
    """Host geometry for the spherical->planar detector mapping: the
    (theta, phi, r) gather coordinates and the number of extra radial
    shells needed to cover the flat detector (ref npfuncs.py:135-156)."""
    h, w = detector_size
    x_true = (np.arange(w) - np.median(np.arange(w))) * det_psize_nm
    y_true = (np.arange(h) - np.median(np.arange(h))) * det_psize_nm
    x_mesh, y_mesh = np.meshgrid(x_true, y_true)
    r_mesh = np.sqrt(x_mesh ** 2 + y_mesh ** 2 + r_nm ** 2)
    theta_mesh = -np.arccos(y_mesh / r_mesh) + PI / 2
    phi_mesh = np.arctan(x_mesh / r_nm)
    n_extra = int(np.ceil((r_mesh.max() - r_nm) / delta_r_nm))
    delta_theta = 2 * theta_max / (h - 1)
    delta_phi = 2 * phi_max / (w - 1)
    coords = np.stack([theta_mesh / delta_theta + (h - 1) / 2.0,
                       phi_mesh / delta_phi + (w - 1) / 2.0,
                       (r_mesh - r_nm) / delta_r_nm]).astype(np.float32)
    return coords, n_extra


def _split_kernel(h):
    """Host complex kernel -> permuted split (re, im) float32 pair."""
    from .splitfft import permute_kernel_2d
    h_p = permute_kernel_2d(np.fft.ifftshift(np.asarray(h)))
    return (np.real(h_p).astype(np.float32), np.imag(h_p).astype(np.float32))


def build_spherical_plan(shape, energy_ev, psize_cm, dist_to_source_cm,
                         det_psize_cm=None, theta_max=PI / 18,
                         phi_max=PI / 18, free_prop_cm=None,
                         map_to_plane=True):
    """Precompute every host-side constant of the split spherical path.

    Returns a pytree of jnp arrays meant to be passed as a JIT ARGUMENT
    into :func:`multislice_propagate_spherical_split` (``plan=``). Baking
    these as traced constants instead serializes hundreds of MB into the
    compiled program (the (3, Y, X, Z) resample coordinates alone are
    201 MB at 256^3) — on RPC-compiled TPU backends that hits the
    remote-compile body cap. ``shape`` is (dim_y, dim_x, n_slice).
    """
    from .fresnel import get_kernel_spherical
    dim_y, dim_x, n_slice = shape
    voxel_nm = np.array([psize_cm] * 3) * 1.0e7
    dist_to_source_nm = dist_to_source_cm * 1e7
    delta_nm = voxel_nm[-1]
    lmbda_nm = 1240.0 / energy_ev
    probe_size = (dim_y, dim_x)

    coords = _spherical_sample_coords((dim_y, dim_x, n_slice),
                                      dist_to_source_nm, delta_nm,
                                      theta_max, phi_max)
    inv_coords, inv_jac = _spherical_inverse_coords(
        (dim_y, dim_x, n_slice), dist_to_source_nm, delta_nm,
        theta_max, phi_max)
    ms = [_split_kernel(get_kernel_spherical(
        delta_nm, lmbda_nm, dist_to_source_nm + i * delta_nm,
        theta_max, phi_max, probe_size)) for i in range(n_slice)]
    plan = {
        "coords": jnp.asarray(coords),
        "inv_coords": jnp.asarray(inv_coords),
        "inv_jac": jnp.asarray(inv_jac),
        "hr_z": jnp.asarray(np.stack([m[0] for m in ms])),
        "hi_z": jnp.asarray(np.stack([m[1] for m in ms])),
    }
    r_nm = dist_to_source_nm + delta_nm * n_slice
    if free_prop_cm is not None:
        fr, fi = _split_kernel(get_kernel_spherical(
            free_prop_cm * 1e7, lmbda_nm, r_nm,
            theta_max, phi_max, probe_size))
        plan["fp_hr"] = jnp.asarray(fr)
        plan["fp_hi"] = jnp.asarray(fi)
        r_nm += free_prop_cm * 1e7
    if map_to_plane:
        if det_psize_cm is None:
            raise ValueError("map_to_plane plan needs det_psize_cm")
        pc, n_extra = _plane_geometry(r_nm, probe_size, delta_nm,
                                      det_psize_cm * 1e7, theta_max, phi_max)
        shells = []
        r_current = r_nm
        for _ in range(n_extra):
            r_current += delta_nm
            shells.append(_split_kernel(get_kernel_spherical(
                delta_nm, lmbda_nm, r_current, theta_max, phi_max,
                probe_size)))
        plan["plane_coords"] = jnp.asarray(pc)
        plan["plane_hr"] = jnp.asarray(
            np.stack([s[0] for s in shells]) if shells
            else np.zeros((0, dim_y, dim_x), np.float32))
        plan["plane_hi"] = jnp.asarray(
            np.stack([s[1] for s in shells]) if shells
            else np.zeros((0, dim_y, dim_x), np.float32))
    return plan


def multislice_propagate_spherical(grid_delta_batch, grid_beta_batch, probe,
                                   energy_ev, psize_cm, dist_to_source_cm,
                                   det_psize_cm, theta_max=PI / 18,
                                   phi_max=PI / 18, free_prop_cm=None,
                                   map_to_plane=True, remat=True):
    """Cone-beam multislice propagation (ref npfuncs.py:66-118).

    grids: (B, Y, X, Z). The object is resampled to spherical coordinates,
    modulated slice by slice (kz = 2 pi dr / lambda), each slice followed by
    a spherical free-space step at the current radius; optionally mapped back
    to the planar detector grid at the end. ``remat=True`` checkpoints each
    slice step: without it the scan stores every per-slice FFT intermediate
    for the backward pass (O(n_slice * batch * Y * X) extra HBM — several
    GB at 256^3, enough to OOM a 16 GB chip during training).
    """
    grid_delta_batch = jnp.asarray(grid_delta_batch, jnp.float32)
    grid_beta_batch = jnp.asarray(grid_beta_batch, jnp.float32)
    batch, dim_y, dim_x, n_slice = grid_delta_batch.shape
    voxel_nm = np.array([psize_cm] * 3) * 1.0e7
    dist_to_source_nm = dist_to_source_cm * 1e7
    delta_nm = voxel_nm[-1]
    lmbda_nm = 1240.0 / energy_ev
    probe_size = (dim_y, dim_x)

    sph = jax.vmap(lambda v: cartesian_to_spherical(
        v, dist_to_source_nm, delta_nm, theta_max, phi_max))
    delta_sph = sph(grid_delta_batch)
    beta_sph = sph(grid_beta_batch)

    probe = jnp.asarray(probe)
    if probe.ndim == 2:
        probe = probe[None]
    wavefront = jnp.broadcast_to(probe.astype(jnp.complex64),
                                 (batch, dim_y, dim_x))

    kz = np.float32(2 * PI * delta_nm / lmbda_nm)
    # Precompute the per-slice spherical kernels on the host (the radius
    # changes every slice) and roll the slice sweep with lax.scan — one
    # compiled step instead of a Python-unrolled graph (ref npfuncs.py:97-102
    # loops in Python; fine for NumPy, graph bloat under jit).
    from .fresnel import get_kernel_spherical
    h_stack = np.stack([
        get_kernel_spherical(delta_nm, lmbda_nm,
                             dist_to_source_nm + i * delta_nm,
                             theta_max, phi_max, probe_size)
        for i in range(n_slice)])
    h_stack = jnp.asarray(np.fft.ifftshift(h_stack, axes=(-2, -1)))
    delta_z = jnp.moveaxis(delta_sph, -1, 0)
    beta_z = jnp.moveaxis(beta_sph, -1, 0)

    def step(w, inp):
        d, b, hi = inp
        w = w * jnp.exp(jax.lax.complex(-kz * b, kz * d))
        w = jnp.fft.ifft2(jnp.fft.fft2(w) * hi)
        return w, None

    if remat:
        step = jax.checkpoint(step)
    wavefront, _ = jax.lax.scan(step, wavefront, (delta_z, beta_z, h_stack))

    r_nm = dist_to_source_nm + delta_nm * n_slice
    if free_prop_cm is not None:
        wavefront = free_propagate_spherical(wavefront, free_prop_cm,
                                             r_nm * 1e-7, lmbda_nm, probe_size,
                                             theta_max, phi_max)
        r_nm += free_prop_cm * 1e7

    if map_to_plane:
        wavefront = jax.vmap(lambda w: get_wavefront_on_plane(
            w, r_nm, probe_size, delta_nm, energy_ev, det_psize_cm * 1e7,
            theta_max, phi_max))(wavefront)
    return wavefront


def multislice_propagate_spherical_split(grid_delta_batch, grid_beta_batch,
                                         probe_re, probe_im, energy_ev,
                                         psize_cm, dist_to_source_cm,
                                         det_psize_cm, theta_max=PI / 18,
                                         phi_max=PI / 18, free_prop_cm=None,
                                         map_to_plane=True, plan=None,
                                         remat=True, resample_grad="auto"):
    """Split-complex twin of :func:`multislice_propagate_spherical`.

    No complex dtype ever reaches the device (for TPU runtimes without
    complex64 support): per-slice spherical kernels are built complex on the
    HOST, pre-permuted into the radix transform's frequency order, and the
    slice sweep carries (re, im) float32 through the MXU matmul-DFT of
    ops.splitfft. Returns ``(re, im)`` of shape (B, Y, X).

    Pass ``plan`` = :func:`build_spherical_plan` output **as a jit
    argument** when calling under jit on a remote-compiled backend: the
    plan's resample coordinates + kernel stacks are hundreds of MB at
    256^3 and must travel as runtime arguments, not baked constants.
    """
    from .splitfft import (apply_kernel_split_perm, cexp_modulation, cmul)

    grid_delta_batch = jnp.asarray(grid_delta_batch, jnp.float32)
    grid_beta_batch = jnp.asarray(grid_beta_batch, jnp.float32)
    batch, dim_y, dim_x, n_slice = grid_delta_batch.shape
    voxel_nm = np.array([psize_cm] * 3) * 1.0e7
    dist_to_source_nm = dist_to_source_cm * 1e7
    delta_nm = voxel_nm[-1]
    lmbda_nm = 1240.0 / energy_ev
    probe_size = (dim_y, dim_x)

    if plan is None:
        plan = build_spherical_plan(
            (dim_y, dim_x, n_slice), energy_ev, psize_cm, dist_to_source_cm,
            det_psize_cm=det_psize_cm, theta_max=theta_max, phi_max=phi_max,
            free_prop_cm=free_prop_cm, map_to_plane=map_to_plane)
    if resample_grad == "auto":
        # exact adjoint of the trilinear gather is a scatter-add — measured
        # ~11 s per 256^3 minibatch-5 step on v5e; the inverse-map gather
        # adjoint (O(h) discretization error) runs at gather speed
        from .pallas_kernels import _on_tpu
        resample_grad = "inverse" if _on_tpu() else "exact"
    if resample_grad == "inverse" and "inv_coords" in plan:
        sph = jax.vmap(lambda v: _resample_invgrad(
            v, plan["coords"], plan["inv_coords"], plan["inv_jac"]))
    else:
        coords = list(plan["coords"])
        sph = jax.vmap(lambda v: map_coordinates(v, coords, order=1,
                                                 mode="constant", cval=0.0))
    delta_sph = sph(grid_delta_batch)
    beta_sph = sph(grid_beta_batch)

    w_re = jnp.broadcast_to(jnp.asarray(probe_re, jnp.float32),
                            (batch, dim_y, dim_x))
    w_im = jnp.broadcast_to(jnp.asarray(probe_im, jnp.float32),
                            (batch, dim_y, dim_x))

    kz = np.float32(2 * PI * delta_nm / lmbda_nm)
    delta_z = jnp.moveaxis(delta_sph, -1, 0)
    beta_z = jnp.moveaxis(beta_sph, -1, 0)

    def step(carry, inp):
        re, im = carry
        d, b, hr, hi = inp
        cr, ci = cexp_modulation(d, b, kz)
        re, im = cmul(re, im, cr, ci)
        re, im = apply_kernel_split_perm(re, im, hr, hi)
        return (re, im), None

    if remat:
        # without per-slice checkpointing the backward stores every DFT
        # intermediate of every slice (several GB at 256^3 — OOMs training)
        step = jax.checkpoint(step)
    (w_re, w_im), _ = jax.lax.scan(step, (w_re, w_im),
                                   (delta_z, beta_z,
                                    plan["hr_z"], plan["hi_z"]))

    if free_prop_cm is not None:
        w_re, w_im = apply_kernel_split_perm(w_re, w_im,
                                             plan["fp_hr"], plan["fp_hi"])

    if map_to_plane:
        def to_plane(re, im):
            def shell(carry, hs):
                r, i = carry
                r, i = apply_kernel_split_perm(r, i, hs[0], hs[1])
                return (r, i), (r, i)

            if remat:
                shell = jax.checkpoint(shell)
            (_, _), (sh_re, sh_im) = jax.lax.scan(
                shell, (re, im),
                (plan["plane_hr"], plan["plane_hi"]))
            stack_re = jnp.concatenate([re[None], sh_re]).transpose(1, 2, 0)
            stack_im = jnp.concatenate([im[None], sh_im]).transpose(1, 2, 0)
            pc = list(plan["plane_coords"])
            return (map_coordinates(stack_re, pc, order=1, mode="nearest"),
                    map_coordinates(stack_im, pc, order=1, mode="nearest"))

        w_re, w_im = jax.vmap(to_plane)(w_re, w_im)
    return w_re, w_im


def _free_propagate_spherical_split(re, im, dist_cm, r_cm, lmbda_nm,
                                    probe_shape, theta_max, phi_max):
    """Split twin of fresnel.free_propagate_spherical: the fftshift pair
    around the centered kernel collapses to one host ifftshift of h."""
    from .splitfft import apply_kernel_split_perm, permute_kernel_2d
    from .fresnel import get_kernel_spherical
    dist_nm = dist_cm * 1.0e7
    r_nm = r_cm * 1.0e7
    h = get_kernel_spherical(dist_nm, lmbda_nm, r_nm, theta_max, phi_max,
                             probe_shape)
    h_p = permute_kernel_2d(np.fft.ifftshift(np.asarray(h)))
    return apply_kernel_split_perm(
        re, im, jnp.asarray(np.real(h_p).astype(np.float32)),
        jnp.asarray(np.imag(h_p).astype(np.float32)))


def get_wavefront_on_plane_split(w_re, w_im, r_nm, detector_size, delta_r_nm,
                                 energy_ev, det_psize_nm, theta_max=PI / 18,
                                 phi_max=PI / 18):
    """Split twin of :func:`get_wavefront_on_plane` (no complex dtypes)."""
    lmbda_nm = 1240.0 / energy_ev
    h, w = detector_size
    x_true = (np.arange(w) - np.median(np.arange(w))) * det_psize_nm
    y_true = (np.arange(h) - np.median(np.arange(h))) * det_psize_nm
    x_mesh, y_mesh = np.meshgrid(x_true, y_true)
    r_mesh = np.sqrt(x_mesh ** 2 + y_mesh ** 2 + r_nm ** 2)
    theta_mesh = -np.arccos(y_mesh / r_mesh) + PI / 2
    phi_mesh = np.arctan(x_mesh / r_nm)

    n_extra = int(np.ceil((r_mesh.max() - r_nm) / delta_r_nm))
    shells_re, shells_im = [w_re], [w_im]
    r_current = r_nm
    for _ in range(n_extra):
        r_current += delta_r_nm
        w_re, w_im = _free_propagate_spherical_split(
            w_re, w_im, delta_r_nm * 1e-7, r_current * 1e-7, lmbda_nm,
            detector_size, theta_max, phi_max)
        shells_re.append(w_re)
        shells_im.append(w_im)
    stack_re = jnp.stack(shells_re, axis=-1)
    stack_im = jnp.stack(shells_im, axis=-1)

    delta_theta = 2 * theta_max / (h - 1)
    delta_phi = 2 * phi_max / (w - 1)
    ri = (r_mesh - r_nm) / delta_r_nm
    ti = theta_mesh / delta_theta + (h - 1) / 2.0
    pi_ = phi_mesh / delta_phi + (w - 1) / 2.0
    coords = [jnp.asarray(ti.astype(np.float32)),
              jnp.asarray(pi_.astype(np.float32)),
              jnp.asarray(ri.astype(np.float32))]
    return (map_coordinates(stack_re, coords, order=1, mode="nearest"),
            map_coordinates(stack_im, coords, order=1, mode="nearest"))


def get_wavefront_on_plane(wavefront_sph, r_nm, detector_size, delta_r_nm,
                           energy_ev, det_psize_nm, theta_max=PI / 18,
                           phi_max=PI / 18):
    """Interpolate a spherical wavefront onto the planar detector.

    Propagates the spherical field outward in radius until the whole flat
    detector is covered, then gathers (theta, phi, r) samples trilinearly
    (ref npfuncs.py:135-168, util.py:644-707).
    """
    lmbda_nm = 1240.0 / energy_ev
    h, w = detector_size
    x_true = (np.arange(w) - np.median(np.arange(w))) * det_psize_nm
    y_true = (np.arange(h) - np.median(np.arange(h))) * det_psize_nm
    x_mesh, y_mesh = np.meshgrid(x_true, y_true)
    r_mesh = np.sqrt(x_mesh ** 2 + y_mesh ** 2 + r_nm ** 2)
    theta_mesh = -np.arccos(y_mesh / r_mesh) + PI / 2
    phi_mesh = np.arctan(x_mesh / r_nm)

    n_extra = int(np.ceil((r_mesh.max() - r_nm) / delta_r_nm))
    shells = [wavefront_sph]
    wf = wavefront_sph
    r_current = r_nm
    for _ in range(n_extra):
        r_current += delta_r_nm
        wf = free_propagate_spherical(wf, delta_r_nm * 1e-7, r_current * 1e-7,
                                      lmbda_nm, detector_size,
                                      theta_max, phi_max)
        shells.append(wf)
    sph_stack = jnp.stack(shells, axis=-1)  # (theta, phi, r)

    delta_theta = 2 * theta_max / (h - 1)
    delta_phi = 2 * phi_max / (w - 1)
    ri = (r_mesh - r_nm) / delta_r_nm
    ti = theta_mesh / delta_theta + (h - 1) / 2.0
    pi_ = phi_mesh / delta_phi + (w - 1) / 2.0
    coords = [jnp.asarray(ti.astype(np.float32)),
              jnp.asarray(pi_.astype(np.float32)),
              jnp.asarray(ri.astype(np.float32))]
    re = map_coordinates(jnp.real(sph_stack), coords, order=1, mode="nearest")
    im = map_coordinates(jnp.imag(sph_stack), coords, order=1, mode="nearest")
    return jax.lax.complex(re, im)
