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


def _banded_interp_matrix_nearest(pos, n_src):
    """(..., M, n_src) linear-interpolation matrix rows for absolute source
    positions ``pos`` (..., M), edge-clamped — matmul form of
    ``map_coordinates(order=1, mode='nearest')`` (the detector-plane
    mapping's edge convention, ref util.py:644-707)."""
    pos = jnp.clip(pos, 0.0, float(n_src - 1))
    lo = jnp.floor(pos)
    f = pos - lo
    u = jnp.arange(n_src, dtype=jnp.float32)
    m0 = (u == lo[..., None]).astype(jnp.float32)
    m1 = (u == jnp.minimum(lo + 1.0, float(n_src - 1))[..., None])
    return ((1.0 - f)[..., None] * m0
            + f[..., None] * m1.astype(jnp.float32))


def _banded_interp_matrix(pos, n_src):
    """(..., M, n_src) linear-interpolation matrix rows for absolute source
    positions ``pos`` (..., M), zero fill outside — 1-D linear interpolation
    with ``map_coordinates(order=1, mode='constant', cval=0)`` edge
    semantics, in matmul form (pair to ops.rotate._shear_mats)."""
    lo = jnp.floor(pos)
    f = pos - lo
    w0 = (1.0 - f) * ((lo >= 0) & (lo <= n_src - 1))
    w1 = f * ((lo >= -1) & (lo <= n_src - 2))
    u = jnp.arange(n_src, dtype=jnp.float32)
    m0 = (u == lo[..., None]).astype(jnp.float32)
    m1 = (u == lo[..., None] + 1.0).astype(jnp.float32)
    return w0[..., None] * m0 + w1[..., None] * m1


def cartesian_to_spherical_separable(vol, r0_px, d_theta, d_phi):
    """Cartesian->spherical resample as FIVE banded-matmul passes.

    TPU-native replacement for the direct trilinear 3-D gather, whose
    element-random accesses run ~10x below the gather roofline on TPU and
    whose XLA adjoint is a scatter-add (and whose take_along_axis
    formulation measures ~0.8 s per pass at 256^3 — minor-axis gathers
    are no better). Catmull-Smith-style separation, with each 1-D pass
    depending on a SINGLE parameter so it becomes a batched banded-matrix
    einsum on the MXU (31 ms per pass at 256^3 x 5 measured):

      P1a  z pass, per x:   sample z at sqrt((sigma+R0)^2 - x^2) - R0
      P1b  sigma pass, per y: sample at sqrt((rho+R0)^2 - y^2) - R0
           (composition: z = sqrt(r^2 - x^2 - y^2) - R0 — sphere slicing)
      P2   x -> theta, per rho: sample x at r sin(theta)
      P3a  y pass, per theta:   sample y at y' cos(theta)
      P3b  y' -> phi, per rho:  sample y' at r sin(phi)
           (composition: y = r cos(theta) sin(phi))

    The adjoint of every pass is the transposed einsum — EXACT, no
    scatter, no inverse-map approximation. Matches the direct trilinear warp to
    O(h^2) cross-terms (multi-pass interpolation smoothing). ``r0_px``
    (source distance in pixels) may be a traced scalar — all geometry
    tables are computed on device from it, so nothing large is baked into
    the compiled program. Output layout (phi, theta, r) matches
    :func:`_spherical_sample_coords`'s transpose convention.
    """
    s0, s1, s2 = vol.shape
    theta_mid = (s0 - 1) / 2.0
    phi_mid = (s1 - 1) / 2.0
    r0_px = jnp.asarray(r0_px, jnp.float32)
    xx = (jnp.arange(s0, dtype=jnp.float32) - theta_mid)      # x/h
    yy = (jnp.arange(s1, dtype=jnp.float32) - phi_mid)        # y/h
    rr = jnp.arange(s2, dtype=jnp.float32) + r0_px            # r/h
    theta = (jnp.arange(s0, dtype=jnp.float32) - theta_mid) * d_theta
    phi = (jnp.arange(s1, dtype=jnp.float32) - phi_mid) * d_phi
    from .rotate import _resolve_shear_precision
    prec = _resolve_shear_precision()

    # P1a: along z, per x — positions sqrt((sigma+R0)^2 - x^2) - R0
    pos_a = jnp.sqrt(jnp.maximum(
        rr[None, :] ** 2 - xx[:, None] ** 2, 0.0)) - r0_px     # (U0, R)
    ba = _banded_interp_matrix(pos_a, s2)                      # (U0, R, U2)
    v = jnp.einsum("xyz,xrz->xyr", vol, ba, precision=prec)
    # P1b: along sigma, per y — positions sqrt((rho+R0)^2 - y^2) - R0
    pos_b = jnp.sqrt(jnp.maximum(
        rr[None, :] ** 2 - yy[:, None] ** 2, 0.0)) - r0_px     # (U1, R)
    bb = _banded_interp_matrix(pos_b, s2)                      # (U1, R, R)
    v = jnp.einsum("xys,yrs->xyr", v, bb, precision=prec)
    # P2: along x, per rho — positions r sin(theta) + mid
    pos_x = rr[:, None] * jnp.sin(theta)[None, :] + theta_mid  # (R, T)
    bx = _banded_interp_matrix(pos_x, s0)                      # (R, T, U0)
    v = jnp.einsum("xyr,rtx->tyr", v, bx, precision=prec)
    # P3a: along y, per theta — positions y'_c cos(theta) + mid
    pos_c = yy[None, :] * jnp.cos(theta)[:, None] + phi_mid    # (T, P')
    bc = _banded_interp_matrix(pos_c, s1)                      # (T, P', U1)
    v = jnp.einsum("tyr,tpy->tpr", v, bc, precision=prec)
    # P3b: along y', per rho — positions r sin(phi) + mid
    pos_d = rr[:, None] * jnp.sin(phi)[None, :] + phi_mid      # (R, Q)
    bd = _banded_interp_matrix(pos_d, s1)                      # (R, Q, P')
    v = jnp.einsum("tpr,rqp->tqr", v, bd, precision=prec)      # (theta, phi, r)
    return jnp.transpose(v, (1, 0, 2))                         # (phi, theta, r)


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
                         map_to_plane=True, resample="auto"):
    """Precompute every host-side constant of the split spherical path.

    Returns a pytree of jnp arrays meant to be passed as a JIT ARGUMENT
    into :func:`multislice_propagate_spherical_split` (``plan=``). Baking
    these as traced constants instead serializes hundreds of MB into the
    compiled program (the (3, Y, X, Z) resample coordinates alone are
    201 MB at 256^3) — on RPC-compiled TPU backends that hits the
    remote-compile body cap. ``shape`` is (dim_y, dim_x, n_slice).

    ``resample`` mirrors the propagator's ``resample_grad``: when the
    SEPARABLE resample will be used ('separable'/'separable_exact', or
    'auto' on a TPU backend), the direct-gather coordinate tables and the
    3-D inverse map are skipped entirely — the separable path computes its
    geometry on device from the ``r0_px`` scalar, saving ~470 MB of device
    arrays and most of the host build time at 256^3.
    """
    from .fresnel import get_kernel_spherical
    dim_y, dim_x, n_slice = shape
    voxel_nm = np.array([psize_cm] * 3) * 1.0e7
    dist_to_source_nm = dist_to_source_cm * 1e7
    delta_nm = voxel_nm[-1]
    lmbda_nm = 1240.0 / energy_ev
    probe_size = (dim_y, dim_x)

    if resample == "auto":
        from .pallas_kernels import _on_tpu
        resample = "separable" if _on_tpu() else "exact"
    plan = {"r0_px": jnp.float32(dist_to_source_nm / delta_nm)}
    if not resample.startswith("separable"):
        coords = _spherical_sample_coords((dim_y, dim_x, n_slice),
                                          dist_to_source_nm, delta_nm,
                                          theta_max, phi_max)
        inv_coords, inv_jac = _spherical_inverse_coords(
            (dim_y, dim_x, n_slice), dist_to_source_nm, delta_nm,
            theta_max, phi_max)
        plan["coords"] = jnp.asarray(coords)
        plan["inv_coords"] = jnp.asarray(inv_coords)
        plan["inv_jac"] = jnp.asarray(inv_jac)
    ms = [_split_kernel(get_kernel_spherical(
        delta_nm, lmbda_nm, dist_to_source_nm + i * delta_nm,
        theta_max, phi_max, probe_size)) for i in range(n_slice)]
    plan["hr_z"] = jnp.asarray(np.stack([m[0] for m in ms]))
    plan["hi_z"] = jnp.asarray(np.stack([m[1] for m in ms]))
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
        # per-axis positions for the separable (tensor-product banded
        # matmul) detector mapping: phi depends only on the detector x, so
        # contracting p -> t -> s with per-axis interpolation matrices
        # reproduces the trilinear gather EXACTLY (see to_plane)
        plan["plane_pos_p"] = jnp.asarray(pc[1][0])       # (X,)
        plan["plane_pos_t"] = jnp.asarray(pc[0])          # (Y, X)
        plan["plane_pos_s"] = jnp.asarray(pc[2])          # (Y, X)
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
            free_prop_cm=free_prop_cm, map_to_plane=map_to_plane,
            resample=resample_grad)
    if resample_grad == "auto":
        # the direct 3-D trilinear gather runs ~10x below the gather
        # roofline on TPU (element-random access) and its XLA adjoint is a
        # scatter-add (~11 s per 256^3 minibatch-5 step measured on v5e);
        # the separable 3-pass form is contiguous + MXU with 1-D
        # inverse-gather adjoints
        from .pallas_kernels import _on_tpu
        resample_grad = "separable" if _on_tpu() else "exact"
    if resample_grad.startswith("separable"):
        # 'separable_exact' is an accepted alias of 'separable' — the
        # separable passes' adjoints are ALWAYS the exact transposed einsums
        d_theta = 2 * theta_max / (dim_y - 1)
        d_phi = 2 * phi_max / (dim_x - 1)
        sph = jax.vmap(lambda v: cartesian_to_spherical_separable(
            v, plan["r0_px"], d_theta, d_phi))
    elif "coords" not in plan:
        raise ValueError(
            "resample_grad=%r needs the direct-gather coordinate tables, but "
            "this plan was built with resample='separable' (which skips them "
            "to save ~470 MB at 256^3). Rebuild the plan with "
            "build_spherical_plan(..., resample='exact')." % (resample_grad,))
    elif resample_grad == "inverse" and "inv_coords" in plan:
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
        use_sep = (resample_grad.startswith("separable")
                   and "plane_pos_p" in plan)
        if use_sep:
            # detector mapping as three banded matmuls (exact tensor-product
            # factorization of the trilinear gather — see
            # _plane_map_separable); matrices built ONCE outside the vmap
            from .rotate import _resolve_shear_precision
            prec = _resolve_shear_precision()
            n_sh = plan["plane_hr"].shape[0] + 1
            m_p = _banded_interp_matrix_nearest(plan["plane_pos_p"], dim_x)
            m_t = _banded_interp_matrix_nearest(plan["plane_pos_t"], dim_y)
            m_s = _banded_interp_matrix_nearest(plan["plane_pos_s"], n_sh)

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
            if use_sep:
                return (_plane_map_separable(stack_re, m_t, m_p, m_s, prec),
                        _plane_map_separable(stack_im, m_t, m_p, m_s, prec))
            pc = list(plan["plane_coords"])
            return (map_coordinates(stack_re, pc, order=1, mode="nearest"),
                    map_coordinates(stack_im, pc, order=1, mode="nearest"))

        w_re, w_im = jax.vmap(to_plane)(w_re, w_im)
    return w_re, w_im


def _plane_map_separable(stack, m_t, m_p, m_s, prec):
    """Spherical-shell stack (Y, X, S) -> detector plane (Y, X) as three
    banded matmuls — the EXACT tensor-product factorization of the
    trilinear ``map_coordinates(stack, plane_coords, mode='nearest')``
    gather (ref util.py:644-707): trilinear weights factor per axis, the
    phi coordinate depends only on detector x (one (X, X) matrix), theta
    and shell are per-pixel 1-D interpolations. Adjoints are the
    transposed einsums — no scatter in the backward.

    ``m_t``: (Y, X, Y) theta matrices, ``m_p``: (X, X) phi matrix,
    ``m_s``: (Y, X, S) shell matrices, all from
    :func:`_banded_interp_matrix_nearest`.
    """
    a = jnp.einsum("jks,xk->jxs", stack, m_p, precision=prec)
    b = jnp.einsum("jxs,yxj->yxs", a, m_t, precision=prec)
    return jnp.einsum("yxs,yxs->yx", b, m_s, precision=prec)


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
