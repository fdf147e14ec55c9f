import numpy as np
import pytest

from beyond_dof_tpu.models.phantom import adhesin_phantom
from beyond_dof_tpu.sim.acquire import create_fullfield_data
from beyond_dof_tpu.recon.fullfield import reconstruct_fullfield
from beyond_dof_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def tiny_dataset():
    gd, gb = adhesin_phantom(16)
    data = create_fullfield_data(gd, gb, energy_ev=800, psize_cm=0.67e-7,
                                 free_prop_cm=None, n_theta=8, batch_size=8,
                                 theta_end=2 * np.pi)
    return gd, gb, data


def _common(data):
    return dict(data=data, theta_end=2 * np.pi, n_epochs=2, alpha_d=0,
                alpha_b=0, gamma=0, learning_rate=1e-7, energy_ev=800,
                psize_cm=0.67e-7, minibatch_size=4, shrink_cycle=None,
                save_outputs=False, verbose=False, seed=0,
                propagate_last=False)


@pytest.fixture(scope="module")
def conv_dataset(tiny_dataset):
    """Model-matched data: simulated with the SAME conv propagator the
    engine reconstructs with (parity with the autograd cnn engine,
    ref cnn_propagator/fullfield.py:87)."""
    import jax.numpy as jnp
    from beyond_dof_tpu.ops.tiled import multislice_propagate_cnn
    from beyond_dof_tpu.ops.rotate import rotate_volume
    gd, gb, _ = tiny_dataset
    thetas = -np.linspace(0, 2 * np.pi, 8)
    return np.stack([
        np.asarray(multislice_propagate_cnn(
            np.asarray(rotate_volume(jnp.asarray(gd), th))[None],
            np.asarray(rotate_volume(jnp.asarray(gb), th))[None],
            np.ones((16, 16), np.complex64), 800, 0.67e-7, kernel_size=5))[0]
        for th in thetas])


def test_engine_conv_forward(conv_dataset):
    d, b, info = reconstruct_fullfield(forward_algorithm="conv", kernel_size=5,
                                       **_common(conv_dataset))
    assert np.isfinite(info["loss"]).all()


def test_engine_conv_forward_tiled_mesh(tiny_dataset):
    """Conv forward shard_mapped over a (ty, tx) tile mesh inside the engine."""
    gd, gb, data = tiny_dataset
    mesh = make_mesh(n_data=1, tile_yx=(2, 2))
    d, b, info = reconstruct_fullfield(forward_algorithm="conv", kernel_size=5,
                                       tile_mesh=mesh, **_common(data))
    assert np.isfinite(info["loss"]).all()


def test_engine_conv_forward_split_matches_complex(conv_dataset):
    """split_complex=True with forward_algorithm='conv': the complex-free
    twin of the conv engine tracks the complex one (same data/seed).
    Only the first epoch is compared: op-level split==complex parity is
    covered in test_tiled; after one Adam epoch at near-converged loss the
    trajectories separate chaotically from float noise."""
    kw = _common(conv_dataset)
    kw["n_epochs"] = 1
    d1, b1, info1 = reconstruct_fullfield(forward_algorithm="conv",
                                          kernel_size=5, **kw)
    d2, b2, info2 = reconstruct_fullfield(forward_algorithm="conv",
                                          kernel_size=5, split_complex=True,
                                          **kw)
    assert np.isfinite(info2["loss"]).all()
    l1, l2 = np.asarray(info1["loss"]), np.asarray(info2["loss"])
    assert np.abs(l1 - l2).max() / (np.abs(l1).max() + 1e-30) < 0.05


def test_engine_conv_tiled_split_on_mesh(conv_dataset):
    """The headline distributed propagator driving a reconstruction in
    split-complex mode (VERDICT r1 item 3): conv forward + (ty, tx) tile
    mesh + split_complex=True."""
    mesh = make_mesh(n_data=1, tile_yx=(2, 2))
    d, b, info = reconstruct_fullfield(forward_algorithm="conv", kernel_size=5,
                                       tile_mesh=mesh, split_complex=True,
                                       **_common(conv_dataset))
    assert np.isfinite(info["loss"]).all()


def test_engine_fd_forward(tiny_dataset):
    gd, gb, data = tiny_dataset
    d, b, info = reconstruct_fullfield(forward_algorithm="fd", **_common(data))
    assert np.isfinite(info["loss"]).all()


def test_engine_point_probe_spherical(tiny_dataset):
    """Cone-beam engine path (probe_type='point' -> spherical multislice,
    ref fullfield.py:99-104, params_cone_pp)."""
    gd, gb = adhesin_phantom(16)
    from beyond_dof_tpu.ops.spherical import multislice_propagate_spherical
    from beyond_dof_tpu.constants import PI
    # simulate cone-beam data directly with the spherical propagator
    data = np.asarray(multislice_propagate_spherical(
        gd[None], gb[None], np.ones((16, 16), np.complex64), 800, 0.67e-7,
        dist_to_source_cm=1e-4, det_psize_cm=2e-7, theta_max=PI / 15,
        phi_max=PI / 15, map_to_plane=False))
    data = np.tile(data, (4, 1, 1))
    d, b, info = reconstruct_fullfield(
        data=data, theta_end=2 * np.pi, n_epochs=1, alpha_d=0, alpha_b=0,
        gamma=0, learning_rate=1e-7, energy_ev=800, psize_cm=0.67e-7,
        minibatch_size=2, shrink_cycle=None, save_outputs=False, verbose=False,
        seed=0, probe_type="point", dist_to_source_cm=1e-4, det_psize_cm=2e-7,
        theta_max=PI / 15, phi_max=PI / 15)
    assert np.isfinite(info["loss"]).all()


def test_engine_optimizable_probe(tiny_dataset):
    gd, gb, data = tiny_dataset
    d, b, info = reconstruct_fullfield(
        probe_type="optimizable",
        probe_initial=(np.ones((16, 16)), np.zeros((16, 16))),
        probe_learning_rate=1e-4, **_common(data))
    probe = info["probe"]
    assert probe.shape == (16, 16)
    assert np.abs(probe - 1).max() > 0  # probe was updated


def test_engine_pupil_function(tiny_dataset):
    gd, gb, data = tiny_dataset
    pupil = np.zeros((16, 16), np.float32)
    pupil[4:12, 4:12] = 1
    d, b, info = reconstruct_fullfield(
        probe_type="optimizable",
        probe_initial=(np.ones((16, 16)), np.zeros((16, 16))),
        pupil_function=pupil, **_common(data))
    # pupil is re-applied after each step: outside must be zero
    assert np.abs(info["probe"][0, 0]) == 0


def test_no_complex_device_arrays_in_split_engine(tiny_dataset, monkeypatch):
    """Guard: with split_complex=True no complex array is ever device_put
    (complex transfers crash/poison some TPU runtime builds)."""
    import jax
    gd, gb, data = tiny_dataset
    orig = jax.device_put
    seen = []

    def spy(x, *a, **k):
        import numpy as _np
        for leaf in jax.tree.leaves(x):
            dt = getattr(leaf, "dtype", None)
            if dt is not None and _np.issubdtype(dt, _np.complexfloating):
                seen.append(dt)
        return orig(x, *a, **k)

    monkeypatch.setattr(jax, "device_put", spy)
    reconstruct_fullfield(split_complex=True, **_common(data))
    assert not seen, "complex device_put in split engine: %s" % seen


def test_engine_2d_flat_object():
    """Single-slice 2D workload (ref params_2d/2d_cell): obj_dim_z=1 keeps
    the object flat, phase-only recon decreases the loss. The phantom's
    delta holds the PROJECTED optical thickness (~1 rad at 5 keV), the
    regime the reference's 2D presets were tuned for."""
    import numpy as np
    from beyond_dof_tpu.models.phantom import cone_foam_phantom
    from beyond_dof_tpu.sim.acquire import create_fullfield_data
    from beyond_dof_tpu.recon.fullfield import reconstruct_fullfield

    n = 32
    gd, gb = cone_foam_phantom(n, z_slab=(n // 2, n // 2 + 1),
                               delta=4e-2, beta=2.4e-3)
    data = create_fullfield_data(gd, gb, energy_ev=5000, psize_cm=1e-7,
                                 free_prop_cm=1e-7 * n * n / 2,
                                 n_theta=1, theta_end=0)
    d, b, info = reconstruct_fullfield(
        data=data, theta_end=0, n_epochs=10, alpha_d=0, alpha_b=0,
        gamma=1e-11, learning_rate=4e-3, energy_ev=5000, psize_cm=1e-7,
        free_prop_cm=1e-7 * n * n / 2, minibatch_size=1, shrink_cycle=None,
        object_type="phase_only", obj_dim_z=1, save_outputs=False,
        verbose=False, seed=0)
    assert d.shape == (n, n, 1)
    assert info["loss"][-1] < 0.3 * info["loss"][0]
