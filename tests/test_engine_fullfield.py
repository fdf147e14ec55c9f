import numpy as np
import pytest

from beyond_dof_tpu.models.phantom import adhesin_phantom
from beyond_dof_tpu.sim.acquire import create_fullfield_data
from beyond_dof_tpu.recon.fullfield import reconstruct_fullfield
from beyond_dof_tpu.ops.quality import fourier_shell_correlation


@pytest.fixture(scope="module")
def small_dataset():
    gd, gb = adhesin_phantom(24)
    data = create_fullfield_data(gd, gb, energy_ev=800, psize_cm=0.67e-7,
                                 free_prop_cm=None, n_theta=30, batch_size=10,
                                 theta_end=2 * np.pi)
    return gd, gb, data


def test_loss_decreases(small_dataset):
    gd, gb, data = small_dataset
    d, b, info = reconstruct_fullfield(
        data=data, theta_end=2 * np.pi, n_epochs=4, alpha_d=0, alpha_b=0,
        gamma=0, learning_rate=1e-7, energy_ev=800, psize_cm=0.67e-7,
        minibatch_size=10, shrink_cycle=None, save_outputs=False, verbose=False,
        propagate_last=False, seed=0)
    assert info["loss"][-1] < info["loss"][0]
    assert d.shape == gd.shape


def test_closed_loop_reconstruction_quality(small_dataset):
    """Phantom -> simulate -> reconstruct -> compare (SURVEY §4 item 4)."""
    from scipy.ndimage import binary_dilation
    gd, gb, data = small_dataset
    mask = binary_dilation(gd > 1e-9, iterations=2).astype(np.float32)
    d, b, info = reconstruct_fullfield(
        data=data, theta_end=2 * np.pi, n_epochs=60, alpha_d=0, alpha_b=0,
        gamma=0, learning_rate=5e-7, energy_ev=800, psize_cm=0.67e-7,
        minibatch_size=15, shrink_cycle=None, save_outputs=False, verbose=False,
        propagate_last=False, seed=0, finite_support_mask=mask)
    err_recon = np.abs(d - gd).mean()
    err_zero = np.abs(gd).mean()
    # reconstruction must beat the trivial zero solution
    assert err_recon < 0.5 * err_zero
    assert info["loss"][-1] < 0.2 * info["loss"][0]


def test_phase_only_freezes_beta(small_dataset):
    gd, gb, data = small_dataset
    d, b, info = reconstruct_fullfield(
        data=data, theta_end=2 * np.pi, n_epochs=2, alpha_d=0, alpha_b=0,
        gamma=0, learning_rate=1e-7, energy_ev=800, psize_cm=0.67e-7,
        minibatch_size=10, shrink_cycle=None, save_outputs=False, verbose=False,
        object_type="phase_only", propagate_last=False, seed=0)
    assert np.abs(b).max() == 0


def test_auto_convergence_stops(small_dataset):
    gd, gb, data = small_dataset
    d, b, info = reconstruct_fullfield(
        data=data, theta_end=2 * np.pi, n_epochs="auto", crit_conv_rate=0.5,
        max_nepochs=20, alpha_d=0, alpha_b=0, gamma=0, learning_rate=1e-8,
        energy_ev=800, psize_cm=0.67e-7, minibatch_size=10,
        shrink_cycle=None, save_outputs=False, verbose=False, propagate_last=False, seed=0)
    assert len(info["loss"]) < 20


def test_gradient_accumulation_runs(small_dataset):
    gd, gb, data = small_dataset
    d, b, info = reconstruct_fullfield(
        data=data, theta_end=2 * np.pi, n_epochs=2, alpha_d=0, alpha_b=0,
        gamma=0, learning_rate=1e-7, energy_ev=800, psize_cm=0.67e-7,
        minibatch_size=5, n_batch_per_update=2, dynamic_rate=True,
        shrink_cycle=None, save_outputs=False, verbose=False, propagate_last=False, seed=0)
    assert np.isfinite(info["loss"]).all()


def test_multiscale_runs(small_dataset):
    gd, gb, data = small_dataset
    d, b, info = reconstruct_fullfield(
        data=data, theta_end=2 * np.pi, n_epochs=2, alpha_d=0, alpha_b=0,
        gamma=0, learning_rate=1e-7, energy_ev=800, psize_cm=0.67e-7,
        minibatch_size=10, multiscale_level=2, n_epoch_final_pass=1,
        shrink_cycle=None, save_outputs=False, verbose=False, propagate_last=False, seed=0)
    assert d.shape == gd.shape
    assert set(info["per_level"].keys()) == {1, 2}


def test_shrink_wrap_shrinks_mask(small_dataset):
    gd, gb, data = small_dataset
    d, b, info = reconstruct_fullfield(
        data=data, theta_end=2 * np.pi, n_epochs=3, alpha_d=0, alpha_b=0,
        gamma=0, learning_rate=1e-7, energy_ev=800, psize_cm=0.67e-7,
        minibatch_size=10, shrink_cycle=1, shrink_threshold=8.7e-7,
        save_outputs=False, verbose=False,
        propagate_last=False, seed=0)
    assert info["mask"].sum() < np.prod(gd.shape)


def test_checkpoint_resume(small_dataset, tmp_path):
    gd, gb, data = small_dataset
    kwargs = dict(data=data, theta_end=2 * np.pi, alpha_d=0, alpha_b=0,
                  gamma=0, learning_rate=1e-7, energy_ev=800, psize_cm=0.67e-7,
                  minibatch_size=10, shrink_cycle=None, save_outputs=False, verbose=False,
                  propagate_last=False, seed=0, random_theta=False)
    ck = str(tmp_path / "ckpt")
    d1, b1, info1 = reconstruct_fullfield(n_epochs=2, checkpoint_dir=ck,
                                          checkpoint_every=1, **kwargs)
    # resume from epoch 2 and continue to 4
    d2, b2, info2 = reconstruct_fullfield(n_epochs=4, checkpoint_dir=ck,
                                          checkpoint_every=1, **kwargs)
    assert len(info2["loss"]) == 2  # only epochs 2,3 ran
    assert info2["loss"][-1] < info1["loss"][0]


def test_epoch_in_one_call_matches_per_batch(small_dataset):
    """One jitted lax.scan over all minibatches == per-batch dispatch."""
    gd, gb, data = small_dataset
    common = dict(data=data, theta_end=2 * np.pi, n_epochs=3, alpha_d=0,
                  alpha_b=0, gamma=0, learning_rate=1e-7, energy_ev=800,
                  psize_cm=0.67e-7, minibatch_size=10, shrink_cycle=None,
                  save_outputs=False, verbose=False, propagate_last=False,
                  seed=0, random_theta=False)
    d1, b1, i1 = reconstruct_fullfield(epoch_in_one_call=False, **common)
    d2, b2, i2 = reconstruct_fullfield(epoch_in_one_call=True, **common)
    assert np.allclose(i1["loss"], i2["loss"], rtol=1e-5)
    assert np.allclose(d1, d2, atol=1e-10)


def test_epoch_scan_segments_match(small_dataset, monkeypatch):
    """Chunking the epoch scan into bounded segments (the guard against the
    long-single-program TPU worker crash) reproduces the monolithic scan."""
    gd, gb, data = small_dataset
    common = dict(data=data, theta_end=2 * np.pi, n_epochs=3, alpha_d=0,
                  alpha_b=0, gamma=0, learning_rate=1e-7, energy_ev=800,
                  psize_cm=0.67e-7, minibatch_size=5, shrink_cycle=None,
                  save_outputs=False, verbose=False, propagate_last=False,
                  seed=0, random_theta=False, epoch_in_one_call=True)
    d1, b1, i1 = reconstruct_fullfield(**common)
    monkeypatch.setenv("BDT_FF_SCAN_SEGMENT", "2")
    d2, b2, i2 = reconstruct_fullfield(**common)
    assert np.allclose(i1["loss"], i2["loss"], rtol=1e-6)
    assert np.allclose(d1, d2, atol=1e-10)


def test_noisy_multiscale_closed_loop():
    """cone_noisy-style integration: simulate -> Poisson noise -> multiscale
    reconstruct -> FSC sanity (SURVEY §4 items 4-5)."""
    from beyond_dof_tpu.models.phantom import cone_foam_phantom
    from beyond_dof_tpu.sim.acquire import add_poisson_noise_fullfield
    from scipy.ndimage import binary_dilation
    # stronger delta than the production presets: a 24-voxel-thick object
    # needs it to imprint measurable holographic contrast on the wavefield
    gd, gb = cone_foam_phantom(24, seed=2, delta=5e-5, beta=5e-8)
    # free-space propagation gives the holographic contrast the SNR needs
    data = create_fullfield_data(gd, gb, energy_ev=5000, psize_cm=1e-7,
                                 free_prop_cm=1e-4, n_theta=24, batch_size=12,
                                 theta_end=2 * np.pi)
    n_sample_pixel = int(np.count_nonzero(gd > 1e-10))
    noisy, snr = add_poisson_noise_fullfield(data, 1e9, n_sample_pixel,
                                             rng=np.random.RandomState(3))
    assert snr > 1  # photon budget high enough to keep signal
    mask = binary_dilation(gd > 1e-9, iterations=2).astype(np.float32)
    d, b, info = reconstruct_fullfield(
        data=noisy, theta_end=2 * np.pi, n_epochs=8, alpha_d=1e-10,
        alpha_b=1e-11, gamma=1e-12, learning_rate=2e-5, energy_ev=5000,
        psize_cm=1e-7, minibatch_size=12, multiscale_level=2,
        n_epoch_final_pass=8, shrink_cycle=None, save_outputs=False,
        verbose=False, propagate_last=False, seed=0, free_prop_cm=1e-4,
        finite_support_mask=mask)
    assert np.isfinite(info["loss"]).all()
    # reconstruction beats the trivial zero solution despite noise
    err_recon = np.abs(d - gd).mean()
    assert err_recon < 0.9 * np.abs(gd).mean()
    radii, fsc = fourier_shell_correlation(gd, d)
    assert float(np.asarray(fsc)[1]) > 0.5  # low-frequency agreement


def test_mixed_precision_auto_schedule(small_dataset):
    """precision='auto': bf16x3 descent epochs + HIGHEST polish epochs at
    ds=1 (the mixed-precision multiscale schedule). The loss must still
    descend, and the module precision must end at HIGHEST (the polish
    phase), restoring the headline default for subsequent programs."""
    import jax
    from beyond_dof_tpu.ops import splitfft, pallas_kernels
    gd, gb, data = small_dataset
    d, b, info = reconstruct_fullfield(
        data=data, theta_end=2 * np.pi, n_epochs=4, alpha_d=0, alpha_b=0,
        gamma=0, learning_rate=1e-7, energy_ev=800, psize_cm=0.67e-7,
        minibatch_size=10, shrink_cycle=None, save_outputs=False,
        verbose=False, propagate_last=False, seed=0, multiscale_level=2,
        precision="auto", precision_polish_epochs=2)
    assert info["loss"][-1] < info["loss"][0]
    assert splitfft._PRECISION == jax.lax.Precision.HIGHEST
    assert pallas_kernels._PREC == jax.lax.Precision.HIGHEST
