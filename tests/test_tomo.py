import numpy as np
import jax.numpy as jnp
import pytest

from beyond_dof_tpu.ops.tomo import (project_volume, radon, backproject, fbp,
                                     sirt, paganin_retrieve_phase,
                                     multidistance_ctf, paganin_support_mask)
from beyond_dof_tpu.recon.pureproj import reconstruct_pureproj
from beyond_dof_tpu.models.phantom import generate_sphere


@pytest.fixture(scope="module")
def sphere_sino():
    vol = generate_sphere((24, 24, 24), 6, anti_aliasing=2).astype(np.float32)
    thetas = np.linspace(0, np.pi, 30, endpoint=False).astype(np.float32)
    sino = np.asarray(radon(jnp.asarray(vol), thetas))
    return vol, thetas, sino


def test_projection_preserves_mass(sphere_sino):
    vol, thetas, sino = sphere_sino
    # line integrals preserve total mass at any angle (interior object)
    masses = sino.sum(axis=(1, 2))
    assert np.abs(masses - vol.sum()).max() / vol.sum() < 0.02


def test_backproject_is_adjoint(sphere_sino):
    """<A x, y> == <x, A^T y> (up to interpolation non-self-adjointness)."""
    vol, thetas, sino = sphere_sino
    rng = np.random.RandomState(0)
    x = rng.rand(*vol.shape).astype(np.float32)
    y = rng.rand(*sino.shape).astype(np.float32)
    lhs = float(jnp.vdot(radon(jnp.asarray(x), thetas), y))
    rhs = float(jnp.vdot(jnp.asarray(x), backproject(jnp.asarray(y), thetas)))
    assert abs(lhs - rhs) / abs(lhs) < 0.05


def test_fbp_reconstructs_sphere(sphere_sino):
    vol, thetas, sino = sphere_sino
    rec = np.asarray(fbp(sino, thetas))
    # normalized correlation with ground truth
    corr = np.corrcoef(rec.ravel(), vol.ravel())[0, 1]
    assert corr > 0.8


def test_sirt_improves_over_iterations(sphere_sino):
    vol, thetas, sino = sphere_sino
    rec5 = np.asarray(sirt(sino, thetas, n_iter=5))
    rec30 = np.asarray(sirt(sino, thetas, n_iter=30))
    err5 = np.abs(rec5 - vol).mean()
    err30 = np.abs(rec30 - vol).mean()
    assert err30 < err5


def test_paganin_filter_smooths_and_inverts():
    rng = np.random.RandomState(0)
    intensity = np.clip(0.5 + 0.1 * rng.rand(32, 32), 0, 1).astype(np.float32)
    phase = np.asarray(paganin_retrieve_phase(intensity, 1e-7, 1e-4, 5000))
    assert phase.shape == intensity.shape
    assert np.isfinite(phase).all()
    # -log of a <1 intensity is positive
    assert phase.mean() > 0


def test_paganin_support_mask_covers_object(sphere_sino):
    vol, thetas, sino = sphere_sino
    # fake magnitudes: transmission = exp(-projection)
    mag = np.exp(-0.1 * sino).astype(np.float32)
    mask = np.asarray(paganin_support_mask(mag, thetas, 1e-7, 1e-4, 5000,
                                           threshold=0.1))
    assert mask.shape == vol.shape
    assert 0 < mask.sum() < mask.size


def test_multidistance_ctf_runs():
    rng = np.random.RandomState(1)
    prjs = 1 + 0.01 * rng.randn(3, 32, 32)
    phase = multidistance_ctf(prjs, [1e-4, 2e-4, 4e-4], 1e-7, 5.0)
    assert phase.shape == (32, 32)
    assert np.isfinite(phase).all()


def test_pureproj_reconstruction(sphere_sino):
    vol, thetas, sino = sphere_sino
    rec, info = reconstruct_pureproj(sino, theta_st=0, theta_end=-np.pi * (29 / 30),
                                     n_epochs=30, alpha=1e-6, learning_rate=0.05,
                                     save_outputs=False, verbose=False, seed=0)
    assert info["loss"][-1] < info["loss"][0]
    corr = np.corrcoef(rec.ravel(), vol.ravel())[0, 1]
    assert corr > 0.7
