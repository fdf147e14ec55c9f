import numpy as np
import jax.numpy as jnp

from beyond_dof_tpu.constants import PI
from beyond_dof_tpu.ops.spherical import (cartesian_to_spherical,
                                          multislice_propagate_spherical,
                                          get_wavefront_on_plane)
from beyond_dof_tpu.ops.fresnel import (free_propagate_spherical,
                                        get_kernel_spherical)
from beyond_dof_tpu.models.phantom import adhesin_phantom


def test_spherical_kernel_unit_modulus():
    h = get_kernel_spherical(100.0, 0.25, 1e4, PI / 18, PI / 18, (32, 32))
    assert np.abs(np.abs(h) - 1).max() < 1e-6


def test_free_propagate_spherical_energy():
    rng = np.random.RandomState(0)
    w = (rng.rand(32, 32) + 1j * rng.rand(32, 32)).astype(np.complex64)
    out = np.asarray(free_propagate_spherical(jnp.asarray(w), 1e-4, 1e-3,
                                              0.25, (32, 32)))
    e_in = np.sum(np.abs(w) ** 2)
    e_out = np.sum(np.abs(out) ** 2)
    assert abs(e_out - e_in) / e_in < 1e-3


def test_cartesian_to_spherical_preserves_uniform():
    """A constant volume resamples to (nearly) the same constant in-range.

    Geometry note: with a source distance comparable to the volume size the
    central (theta~0, phi~0) rays stay inside the volume; far-off-axis
    samples fall outside and are zero-filled like the reference
    (RegularGridInterpolator fill_value=0, ref npfuncs.py:179)."""
    vol = np.ones((16, 16, 16), np.float32)
    sph = np.asarray(cartesian_to_spherical(vol, 40.0, 1.0))
    assert np.abs(sph[7:9, 7:9, 2:8] - 1).max() < 1e-3
    # and far-off-axis points are outside -> 0-filled
    assert sph[0, 0, -1] == 0


def test_multislice_spherical_runs_and_is_finite():
    gd, gb = adhesin_phantom(16)
    out = multislice_propagate_spherical(
        gd[None], gb[None], np.ones((16, 16), np.complex64), 5000, 1e-7,
        dist_to_source_cm=1e-4, det_psize_cm=3e-7,
        theta_max=PI / 15, phi_max=PI / 15, map_to_plane=False)
    out = np.asarray(out)
    assert out.shape == (1, 16, 16)
    assert np.isfinite(out).all()
    # weak object: magnitudes stay near unity
    assert abs(np.abs(out).mean() - 1) < 0.2


def test_wavefront_on_plane_shapes():
    rng = np.random.RandomState(0)
    w = (rng.rand(16, 16) + 1j * rng.rand(16, 16)).astype(np.complex64)
    out = np.asarray(get_wavefront_on_plane(jnp.asarray(w), 1e4, (16, 16),
                                            1.0, 5000, 2.0))
    assert out.shape == (16, 16)
    assert np.isfinite(out).all()


def test_spherical_split_matches_complex():
    """Split-complex cone-beam propagator == complex one (1e-5), incl. the
    detector-plane mapping — enables cone_pp on complex-free TPU runtimes."""
    import jax.numpy as jnp
    from beyond_dof_tpu.models.phantom import adhesin_phantom
    from beyond_dof_tpu.ops.spherical import (
        multislice_propagate_spherical, multislice_propagate_spherical_split)
    from beyond_dof_tpu.constants import PI

    gd, gb = adhesin_phantom(16)
    kw = dict(energy_ev=800, psize_cm=0.67e-7, dist_to_source_cm=1e-4,
              det_psize_cm=2e-7, theta_max=PI / 15, phi_max=PI / 15,
              free_prop_cm=1e-4, map_to_plane=True)
    ref = np.asarray(multislice_propagate_spherical(
        gd[None], gb[None], np.ones((16, 16), np.complex64), **kw))
    re, im = multislice_propagate_spherical_split(
        gd[None], gb[None], np.ones((16, 16), np.float32),
        np.zeros((16, 16), np.float32), **kw)
    out = np.asarray(re) + 1j * np.asarray(im)
    assert np.abs(out - ref).max() < 1e-5


def test_spherical_split_plan_parity():
    """Passing a precomputed plan (jit-argument pytree, the remote-compile
    route at 256^3) is numerically identical to the plan-free call."""
    import jax
    from beyond_dof_tpu.ops.spherical import (
        multislice_propagate_spherical_split, build_spherical_plan)

    gd, gb = adhesin_phantom(16)
    kw = dict(energy_ev=800, psize_cm=0.67e-7, dist_to_source_cm=1e-4,
              det_psize_cm=2e-7, theta_max=PI / 15, phi_max=PI / 15,
              free_prop_cm=1e-4, map_to_plane=True)
    pr = np.ones((16, 16), np.float32)
    pi = np.zeros((16, 16), np.float32)
    re0, im0 = multislice_propagate_spherical_split(gd[None], gb[None],
                                                    pr, pi, **kw)
    plan = build_spherical_plan((16, 16, 16), kw["energy_ev"], kw["psize_cm"],
                                kw["dist_to_source_cm"],
                                det_psize_cm=kw["det_psize_cm"],
                                theta_max=kw["theta_max"],
                                phi_max=kw["phi_max"],
                                free_prop_cm=kw["free_prop_cm"])
    fn = jax.jit(lambda d, b, p: multislice_propagate_spherical_split(
        d, b, pr, pi, plan=p, **kw))
    re1, im1 = fn(gd[None], gb[None], plan)
    assert np.abs(np.asarray(re1) - np.asarray(re0)).max() < 1e-6
    assert np.abs(np.asarray(im1) - np.asarray(im0)).max() < 1e-6


def test_engine_point_probe_split(tmp_path):
    """cone_pp-class engine run in split-complex mode (probe_type='point'
    routes through the split spherical propagator)."""
    from beyond_dof_tpu.models.phantom import adhesin_phantom
    from beyond_dof_tpu.ops.spherical import multislice_propagate_spherical
    from beyond_dof_tpu.recon.fullfield import reconstruct_fullfield
    from beyond_dof_tpu.constants import PI

    gd, gb = adhesin_phantom(16)
    data = np.asarray(multislice_propagate_spherical(
        gd[None], gb[None], np.ones((16, 16), np.complex64), 800, 0.67e-7,
        dist_to_source_cm=1e-4, det_psize_cm=2e-7, theta_max=PI / 15,
        phi_max=PI / 15, map_to_plane=False))
    data = np.tile(data, (4, 1, 1))
    d, b, info = reconstruct_fullfield(
        data=data, theta_end=2 * np.pi, n_epochs=1, alpha_d=0, alpha_b=0,
        gamma=0, learning_rate=1e-7, energy_ev=800, psize_cm=0.67e-7,
        minibatch_size=2, shrink_cycle=None, save_outputs=False, verbose=False,
        seed=0, probe_type="point", split_complex=True,
        dist_to_source_cm=1e-4, det_psize_cm=2e-7,
        theta_max=PI / 15, phi_max=PI / 15)
    assert np.isfinite(info["loss"]).all()


def test_resample_inverse_adjoint_close():
    """The inverse-map gather adjoint tracks the exact scatter adjoint on
    smooth content at matched sampling (cos > 0.98): the TPU fast path for
    the spherical resample backward (exact scatter measured ~11 s/step at
    256^3 on v5e; the gather form runs at gather speed)."""
    import jax
    from jax.scipy.ndimage import map_coordinates
    from beyond_dof_tpu.ops.spherical import (build_spherical_plan,
                                              _resample_invgrad)

    n, dist = 32, 7.5e-6   # volume subtends ~theta_max: matched sampling
    plan = build_spherical_plan((n, n, n), 800, 1e-7, dist, det_psize_cm=2e-7,
                                theta_max=PI / 15, phi_max=PI / 15,
                                map_to_plane=False)
    y = np.linspace(-1, 1, n)
    g3 = np.exp(-(y[:, None, None] ** 2 + y[None, :, None] ** 2
                  + y[None, None, :] ** 2) * 3).astype(np.float32)
    vol = jnp.asarray(g3)
    co = list(plan["coords"])
    w = jnp.asarray((g3 * 0.5 + 0.2).astype(np.float32))

    def loss_exact(v):
        return jnp.sum(map_coordinates(v, co, order=1, mode="constant",
                                       cval=0.0) ** 2 * w)

    def loss_inv(v):
        return jnp.sum(_resample_invgrad(v, plan["coords"],
                                         plan["inv_coords"],
                                         plan["inv_jac"]) ** 2 * w)

    ge = np.asarray(jax.grad(loss_exact)(vol))
    gi = np.asarray(jax.grad(loss_inv)(vol))
    cos = (ge * gi).sum() / (np.linalg.norm(ge) * np.linalg.norm(gi))
    rel = np.linalg.norm(gi - ge) / np.linalg.norm(ge)
    assert cos > 0.98, cos
    assert rel < 0.2, rel
    # forward values are identical (custom_vjp wraps the same gather)
    f0 = np.asarray(map_coordinates(vol, co, order=1, mode="constant",
                                    cval=0.0))
    f1 = np.asarray(_resample_invgrad(vol, plan["coords"],
                                      plan["inv_coords"], plan["inv_jac"]))
    assert np.abs(f0 - f1).max() == 0.0


def test_engine_point_probe_inverse_grad():
    """Engine run with resample_grad='inverse' (the TPU default) decreases
    the loss on a matched-sampling cone-beam problem."""
    from beyond_dof_tpu.models.phantom import adhesin_phantom
    from beyond_dof_tpu.ops.spherical import multislice_propagate_spherical
    from beyond_dof_tpu.recon.fullfield import reconstruct_fullfield

    n, dist = 16, 3.75e-6
    gd, gb = adhesin_phantom(n)
    data = np.asarray(multislice_propagate_spherical(
        gd[None], gb[None], np.ones((n, n), np.complex64), 800, 1e-7,
        dist_to_source_cm=dist, det_psize_cm=2e-7, theta_max=PI / 15,
        phi_max=PI / 15, map_to_plane=False))
    data = np.tile(data, (4, 1, 1))
    d, b, info = reconstruct_fullfield(
        data=data, theta_end=2 * np.pi, n_epochs=3, alpha_d=0, alpha_b=0,
        gamma=0, learning_rate=1e-7, energy_ev=800, psize_cm=1e-7,
        minibatch_size=2, shrink_cycle=None, save_outputs=False, verbose=False,
        seed=0, probe_type="point", split_complex=True,
        dist_to_source_cm=dist, det_psize_cm=2e-7,
        theta_max=PI / 15, phi_max=PI / 15, resample_grad="inverse")
    assert np.isfinite(info["loss"]).all()
    assert info["loss"][-1] <= info["loss"][0]


def test_separable_resample_matches_direct():
    """The 3-pass separable cartesian->spherical resample (TPU fast path)
    matches the direct trilinear gather to O(h^2) on smooth interior
    content, and both its gradient modes track the exact adjoint."""
    import jax
    from jax.scipy.ndimage import map_coordinates
    from beyond_dof_tpu.ops.spherical import (
        _spherical_sample_coords, cartesian_to_spherical_separable)

    n, dist_cm, h_nm = 64, 1.5e-5, 1.0
    th = PI / 15
    r0_px = dist_cm * 1e7 / h_nm
    co = jnp.asarray(_spherical_sample_coords((n, n, n), dist_cm * 1e7, h_nm,
                                              th, th))
    y = np.linspace(-1, 1, n)
    g3 = np.exp(-(y[:, None, None] ** 2 + y[None, :, None] ** 2
                  + y[None, None, :] ** 2) * 3).astype(np.float32)
    vol = jnp.asarray(g3)
    direct = np.asarray(map_coordinates(vol, list(co), order=1,
                                        mode="constant", cval=0.0))
    d_theta = 2 * th / (n - 1)
    sep = np.asarray(cartesian_to_spherical_separable(
        vol, r0_px, d_theta, d_theta))
    inb = np.ones((n, n, n), bool)
    for k in range(3):
        inb &= (np.asarray(co[k]) >= 1) & (np.asarray(co[k]) <= n - 2)
    err = np.abs(sep[inb] - direct[inb]).max() / np.abs(direct[inb]).max()
    assert err < 1e-3, err

    # the separable passes' adjoint is the exact transposed einsum; its
    # gradient must track the direct gather's exact adjoint closely
    w = jnp.asarray((g3 * 0.5 + 0.2).astype(np.float32))
    ge = np.asarray(jax.grad(lambda v: jnp.sum(map_coordinates(
        v, list(co), order=1, mode="constant", cval=0.0) ** 2 * w))(vol))
    gi = np.asarray(jax.grad(lambda v: jnp.sum(
        cartesian_to_spherical_separable(
            v, r0_px, d_theta, d_theta) ** 2 * w))(vol))
    cos = (ge * gi).sum() / (np.linalg.norm(ge) * np.linalg.norm(gi))
    assert cos > 0.999, cos


def test_spherical_split_separable_close_to_direct():
    """Full split propagator with resample_grad='separable' stays close to
    the direct-resample result (different interpolation discretization,
    same continuum operator)."""
    gd, gb = adhesin_phantom(32)
    from beyond_dof_tpu.ops.spherical import multislice_propagate_spherical_split
    kw = dict(energy_ev=800, psize_cm=1e-7, dist_to_source_cm=7.5e-6,
              det_psize_cm=2e-7, theta_max=PI / 15, phi_max=PI / 15,
              map_to_plane=False)
    pr = np.ones((32, 32), np.float32)
    pi = np.zeros((32, 32), np.float32)
    re0, im0 = multislice_propagate_spherical_split(
        gd[None], gb[None], pr, pi, resample_grad="exact", **kw)
    re1, im1 = multislice_propagate_spherical_split(
        gd[None], gb[None], pr, pi, resample_grad="separable", **kw)
    err = (np.abs(np.asarray(re1) - np.asarray(re0)).max()
           + np.abs(np.asarray(im1) - np.asarray(im0)).max())
    assert err < 5e-3, err


def test_engine_point_probe_separable():
    """Engine cone-beam run with the separable resample decreases loss."""
    from beyond_dof_tpu.models.phantom import adhesin_phantom
    from beyond_dof_tpu.ops.spherical import multislice_propagate_spherical
    from beyond_dof_tpu.recon.fullfield import reconstruct_fullfield

    n, dist = 16, 3.75e-6
    gd, gb = adhesin_phantom(n)
    data = np.asarray(multislice_propagate_spherical(
        gd[None], gb[None], np.ones((n, n), np.complex64), 800, 1e-7,
        dist_to_source_cm=dist, det_psize_cm=2e-7, theta_max=PI / 15,
        phi_max=PI / 15, map_to_plane=False))
    data = np.tile(data, (4, 1, 1))
    d, b, info = reconstruct_fullfield(
        data=data, theta_end=2 * np.pi, n_epochs=3, alpha_d=0, alpha_b=0,
        gamma=0, learning_rate=1e-7, energy_ev=800, psize_cm=1e-7,
        minibatch_size=2, shrink_cycle=None, save_outputs=False, verbose=False,
        seed=0, probe_type="point", split_complex=True,
        dist_to_source_cm=dist, det_psize_cm=2e-7,
        theta_max=PI / 15, phi_max=PI / 15, resample_grad="separable")
    assert np.isfinite(info["loss"]).all()
    assert info["loss"][-1] <= info["loss"][0]


def test_plane_map_separable_matches_gather():
    """The 3-einsum detector-plane mapping is the EXACT tensor-product
    factorization of the trilinear plane gather (same mode='nearest'
    clamping), so on an arbitrary shell stack it must match
    map_coordinates to float32 roundoff."""
    import jax.lax
    from jax.scipy.ndimage import map_coordinates
    from beyond_dof_tpu.ops.spherical import (
        _banded_interp_matrix_nearest, _plane_geometry, _plane_map_separable)

    h = w = 24
    r_nm = 9.0e3
    pc, n_extra = _plane_geometry(r_nm, (h, w), 1.0, 450.0,
                                  PI / 15, PI / 15)
    n_sh = max(n_extra, 3) + 1
    rng = np.random.RandomState(3)
    stack = jnp.asarray(rng.randn(h, w, n_sh).astype(np.float32))
    want = map_coordinates(stack, list(jnp.asarray(pc)), order=1,
                           mode="nearest")
    m_p = _banded_interp_matrix_nearest(jnp.asarray(pc[1][0]), w)
    m_t = _banded_interp_matrix_nearest(jnp.asarray(pc[0]), h)
    m_s = _banded_interp_matrix_nearest(jnp.asarray(pc[2]), n_sh)
    got = _plane_map_separable(stack, m_t, m_p, m_s,
                               jax.lax.Precision.HIGHEST)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 1e-5


def test_spherical_split_to_plane_separable_parity():
    """Full split propagate with map_to_plane: the separable detector
    mapping path must reproduce the gather path's output, isolating the
    volume resample by building the plan with gather tables and forcing
    the exact volume resample on both sides via a matched plan."""
    import jax
    from beyond_dof_tpu.ops.spherical import (
        multislice_propagate_spherical_split, build_spherical_plan)

    gd, gb = adhesin_phantom(16)
    # geometry where the theta/phi grid actually intersects the volume
    # (at dist_to_source=1e-4 cm the 16^3 object subtends < one grid step
    # and BOTH mapping paths are object-insensitive)
    kw = dict(energy_ev=800, psize_cm=1e-7, dist_to_source_cm=3.75e-6,
              det_psize_cm=2e-7, theta_max=PI / 15, phi_max=PI / 15,
              free_prop_cm=1e-6, map_to_plane=True)
    pr = np.ones((16, 16), np.float32)
    pi = np.zeros((16, 16), np.float32)
    re0, im0 = multislice_propagate_spherical_split(
        gd[None], gb[None], pr, pi, resample_grad="separable", **kw)
    assert np.isfinite(np.asarray(re0)).all()
    # grads flow through the einsum path (transposed-einsum adjoints)
    g = jax.grad(lambda d: jnp.sum(multislice_propagate_spherical_split(
        d, gb[None], pr, pi, resample_grad="separable", **kw)[0] ** 2))(
            gd[None])
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_engine_point_probe_epoch_scan_parity(tmp_path):
    """epoch_in_one_call=True (all minibatches of an epoch as one device
    scan) must match the per-minibatch dispatch path for the spherical
    (probe_type='point') forward — the round-2 exclusion predates the
    separable resample and no longer applies."""
    from beyond_dof_tpu.models.phantom import adhesin_phantom
    from beyond_dof_tpu.ops.spherical import multislice_propagate_spherical
    from beyond_dof_tpu.recon.fullfield import reconstruct_fullfield
    from beyond_dof_tpu.constants import PI

    gd, gb = adhesin_phantom(16)
    data = np.asarray(multislice_propagate_spherical(
        gd[None], gb[None], np.ones((16, 16), np.complex64), 800, 0.67e-7,
        dist_to_source_cm=1e-4, det_psize_cm=2e-7, theta_max=PI / 15,
        phi_max=PI / 15, map_to_plane=False))
    data = np.tile(data, (4, 1, 1))
    kw = dict(data=data, theta_end=2 * np.pi, n_epochs=2, alpha_d=0,
              alpha_b=0, gamma=0, learning_rate=1e-7, energy_ev=800,
              psize_cm=0.67e-7, minibatch_size=2, shrink_cycle=None,
              save_outputs=False, verbose=False, seed=0, probe_type="point",
              split_complex=True, random_theta=False, dist_to_source_cm=1e-4,
              det_psize_cm=2e-7, theta_max=PI / 15, phi_max=PI / 15)
    d0, b0, i0 = reconstruct_fullfield(epoch_in_one_call=False, **kw)
    d1, b1, i1 = reconstruct_fullfield(epoch_in_one_call=True, **kw)
    assert np.isfinite(i1["loss"]).all()
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=1e-8)
    np.testing.assert_allclose(i1["loss"], i0["loss"], rtol=1e-4)
