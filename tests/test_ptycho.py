import numpy as np
import jax.numpy as jnp
import pytest

from beyond_dof_tpu.models.phantom import adhesin_phantom
from beyond_dof_tpu.models.ptycho import (compute_pad_arr, extract_patches,
                                          ptycho_forward)
from beyond_dof_tpu.sim.acquire import (create_ptychography_data,
                                        grid_probe_positions)
from beyond_dof_tpu.recon.ptycho import reconstruct_ptychography


@pytest.fixture(scope="module")
def ptycho_setup():
    gd, gb = adhesin_phantom(24)
    probe_size = (12, 12)
    pos = grid_probe_positions((24, 24), probe_size, 6)
    data = create_ptychography_data(
        gd, gb, 5000, 1e-7, n_theta=8, probe_pos=pos, probe_size=probe_size,
        theta_end=2 * np.pi, probe_mag_sigma=3, probe_phase_sigma=3,
        probe_phase_max=0.5, probe_circ_mask=0.9)
    return gd, gb, pos, probe_size, data


def test_compute_pad_arr():
    pos = np.array([[2, 2], [30, 30]])
    pad = compute_pad_arr(pos, (8, 8), (32, 32, 32))
    assert pad[0, 0] == 2 and pad[0, 1] == 2
    assert pad[1, 0] == 2 and pad[1, 1] == 2
    pad0 = compute_pad_arr(np.array([[16, 16]]), (8, 8), (32, 32, 32))
    assert (pad0 == 0).all()


def test_extract_patches_matches_slicing():
    rng = np.random.RandomState(0)
    vol = rng.rand(20, 20, 5).astype(np.float32)
    pos = np.array([[10, 10], [6, 13]])
    pad_arr = np.zeros((2, 2), int)
    patches = np.asarray(extract_patches(jnp.asarray(vol), pos, (8, 8), pad_arr))
    for i, (y, x) in enumerate(pos):
        ref = vol[y - 4: y + 4, x - 4: x + 4]
        assert np.array_equal(patches[i], ref)


def test_ptycho_data_shape(ptycho_setup):
    gd, gb, pos, probe_size, data = ptycho_setup
    assert data.shape == (8, len(pos), 12, 12)
    assert np.isfinite(data).all()


def test_ptycho_forward_runs(ptycho_setup):
    gd, gb, pos, probe_size, data = ptycho_setup
    pad_arr = compute_pad_arr(pos, probe_size, gd.shape)
    probe = np.ones(probe_size, np.complex64)
    out = ptycho_forward(jnp.asarray(gd), jnp.asarray(gb), jnp.float32(0.3),
                         pos[:4], probe, 5000, 1e-7, probe_size, pad_arr)
    assert out.shape == (4, 12, 12)


def test_ptycho_reconstruction_loss_decreases(ptycho_setup):
    gd, gb, pos, probe_size, data = ptycho_setup
    d, b, info = reconstruct_ptychography(
        probe_pos=pos, probe_size=probe_size, obj_size=(24, 24, 24), data=data,
        theta_end=2 * np.pi, n_epochs=10, alpha_d=0, alpha_b=0, gamma=0,
        learning_rate=1e-7, minibatch_size=9, energy_ev=5000, psize_cm=1e-7,
        probe_type="gaussian", probe_mag_sigma=3, probe_phase_sigma=3,
        probe_phase_max=0.5, save_outputs=False, verbose=False, seed=0)
    assert np.mean(info["loss"][-3:]) < 0.5 * np.mean(info["loss"][:3])
    assert d.shape == gd.shape


def test_ptycho_epoch_scan_matches_host_loop(ptycho_setup):
    """epoch_in_one_call=True (device-resident epoch scan) reproduces the
    per-block host loop: same seeded job shuffle, same final state."""
    gd, gb, pos, probe_size, data = ptycho_setup
    common = dict(probe_pos=pos, probe_size=probe_size, obj_size=(24, 24, 24),
                  data=data, theta_end=2 * np.pi, n_epochs=3, alpha_d=0,
                  alpha_b=0, gamma=0, learning_rate=1e-7, minibatch_size=9,
                  energy_ev=5000, psize_cm=1e-7, probe_type="gaussian",
                  probe_mag_sigma=3, probe_phase_sigma=3, probe_phase_max=0.5,
                  save_outputs=False, verbose=False, seed=0)
    d_host, b_host, i_host = reconstruct_ptychography(
        epoch_in_one_call=False, **common)
    d_scan, b_scan, i_scan = reconstruct_ptychography(
        epoch_in_one_call=True, **common)
    np.testing.assert_allclose(i_scan["loss"], i_host["loss"], rtol=1e-5)
    np.testing.assert_allclose(d_scan, d_host, rtol=1e-4, atol=1e-12)


def test_ptycho_epoch_scan_segments_match(ptycho_setup, monkeypatch):
    """Chunking the epoch scan into bounded segments (the guard for the
    workload-scale TPU worker crash) reproduces the monolithic scan: same
    losses, same final object."""
    gd, gb, pos, probe_size, data = ptycho_setup
    common = dict(probe_pos=pos, probe_size=probe_size, obj_size=(24, 24, 24),
                  data=data, theta_end=2 * np.pi, n_epochs=3, alpha_d=0,
                  alpha_b=0, gamma=0, learning_rate=1e-7, minibatch_size=9,
                  energy_ev=5000, psize_cm=1e-7, probe_type="gaussian",
                  probe_mag_sigma=3, probe_phase_sigma=3, probe_phase_max=0.5,
                  save_outputs=False, verbose=False, seed=0,
                  epoch_in_one_call=True)
    d_mono, b_mono, i_mono = reconstruct_ptychography(**common)
    monkeypatch.setenv("BDT_PTYCHO_SCAN_SEGMENT", "2")
    d_seg, b_seg, i_seg = reconstruct_ptychography(**common)
    np.testing.assert_allclose(i_seg["loss"], i_mono["loss"], rtol=1e-6)
    np.testing.assert_allclose(d_seg, d_mono, rtol=1e-5, atol=1e-12)


def test_ptycho_dynamic_dropping_drops(ptycho_setup):
    gd, gb, pos, probe_size, data = ptycho_setup
    d, b, info = reconstruct_ptychography(
        probe_pos=pos, probe_size=probe_size, obj_size=(24, 24, 24), data=data,
        theta_end=2 * np.pi, n_epochs=3, alpha_d=0, alpha_b=0, gamma=0,
        learning_rate=1e-7, minibatch_size=4, energy_ev=5000, psize_cm=1e-7,
        probe_type="gaussian", probe_mag_sigma=3, probe_phase_sigma=3,
        probe_phase_max=0.5, save_outputs=False, verbose=False, seed=0,
        dynamic_dropping=True, dropping_threshold=1e3)  # huge: drops to floor
    assert info["n_active_positions"][-1] <= len(pos)


def test_ptycho_dropping_judges_multiple_angles(ptycho_setup):
    """A position converged at theta=0 but NOT at other angles must not be
    dropped (the reference judged on the ranks' own current angles,
    ref cnn_propagator/ptychography.py:323-342; a single fixed angle would
    drop it)."""
    gd, gb, pos, probe_size, data = ptycho_setup
    bad = np.abs(np.asarray(data)).astype(np.float32)
    bad[1:] += 0.5  # every angle except theta=0 is far from the model
    d, b, info = reconstruct_ptychography(
        probe_pos=pos, probe_size=probe_size, obj_size=(24, 24, 24), data=bad,
        theta_end=2 * np.pi, n_epochs=1, alpha_d=0, alpha_b=0, gamma=0,
        learning_rate=1e-30, minibatch_size=4, energy_ev=5000, psize_cm=1e-7,
        probe_type="gaussian", probe_mag_sigma=3, probe_phase_sigma=3,
        probe_phase_max=0.5, save_outputs=False, verbose=False, seed=0,
        initial_guess=(gd, gb),  # truth: theta=0 loss ~ 0, others ~ 0.25
        dynamic_dropping=True, dropping_threshold=1e-5)
    assert info["n_active_positions"][-1] == len(pos)


def test_ptycho_checkpoint_resume(ptycho_setup, tmp_path):
    """Ptycho engine restores params/opt_state/epoch/dropping state from an
    Orbax checkpoint (mirror of the full-field resume; VERDICT r1 item 6)."""
    gd, gb, pos, probe_size, data = ptycho_setup
    ckpt = str(tmp_path / "ck")
    common = dict(probe_pos=pos, probe_size=probe_size, obj_size=(24, 24, 24),
                  data=data, theta_end=2 * np.pi, alpha_d=0, alpha_b=0,
                  gamma=0, learning_rate=1e-7, minibatch_size=4,
                  energy_ev=5000, psize_cm=1e-7, probe_type="gaussian",
                  probe_mag_sigma=3, probe_phase_sigma=3, probe_phase_max=0.5,
                  save_outputs=False, verbose=False, seed=0,
                  dynamic_dropping=True, dropping_threshold=1e3,
                  checkpoint_dir=ckpt, checkpoint_every=1)
    d1, b1, i1 = reconstruct_ptychography(n_epochs=2, **common)
    n_active_after = i1["n_active_positions"][-1]
    # resume: epochs 0-1 are skipped, epochs 2-3 run
    d2, b2, i2 = reconstruct_ptychography(n_epochs=4, **common)
    assert len(i2["loss"]) == 2  # only the resumed epochs
    assert i2["n_active_positions"][0] <= n_active_after  # dropping restored
    assert np.isfinite(i2["loss"]).all()


def test_ptycho_optimizable_probe_updates(ptycho_setup):
    gd, gb, pos, probe_size, data = ptycho_setup
    d, b, info = reconstruct_ptychography(
        probe_pos=pos, probe_size=probe_size, obj_size=(24, 24, 24), data=data,
        theta_end=2 * np.pi, n_epochs=2, alpha_d=0, alpha_b=0, gamma=0,
        learning_rate=1e-7, minibatch_size=9, energy_ev=5000, psize_cm=1e-7,
        probe_type="optimizable",
        probe_initial=(np.ones(probe_size), np.zeros(probe_size)),
        probe_learning_rate=1e-3, save_outputs=False, verbose=False, seed=0)
    # probe moved away from its initial value
    assert np.abs(info["probe"] - 1).max() > 0


def test_ptycho_streaming_from_h5(ptycho_setup, tmp_path):
    """Per-block HDF5 streaming (the reference reads ptycho data from disk
    per batch, ref ptychography.py:132-134,448)."""
    from beyond_dof_tpu.io.exchange import write_exchange_data
    gd, gb, pos, probe_size, data = ptycho_setup
    fname = str(tmp_path / "p.h5")
    write_exchange_data(fname, data)
    common = dict(probe_pos=pos, probe_size=probe_size, obj_size=(24, 24, 24),
                  theta_end=2 * np.pi, n_epochs=2, alpha_d=0, alpha_b=0,
                  gamma=0, learning_rate=1e-7, minibatch_size=9,
                  energy_ev=5000, psize_cm=1e-7, probe_type="gaussian",
                  probe_mag_sigma=3, probe_phase_sigma=3, probe_phase_max=0.5,
                  save_outputs=False, verbose=False, seed=0)
    d1, b1, i1 = reconstruct_ptychography(fname=fname, stream=True, **common)
    d2, b2, i2 = reconstruct_ptychography(data=data, **common)
    assert np.allclose(i1["loss"], i2["loss"], rtol=1e-6)
    assert np.allclose(d1, d2)


def test_ptycho_conv_forward(ptycho_setup):
    """Conv-propagator ptycho path (ref cnn_propagator/ptychography.py:74-76)."""
    gd, gb, pos, probe_size, data = ptycho_setup
    d, b, info = reconstruct_ptychography(
        probe_pos=pos, probe_size=probe_size, obj_size=(24, 24, 24), data=data,
        theta_end=2 * np.pi, n_epochs=1, alpha_d=0, alpha_b=0, gamma=0,
        learning_rate=1e-9, minibatch_size=9, energy_ev=5000, psize_cm=1e-7,
        probe_type="gaussian", probe_mag_sigma=3, probe_phase_sigma=3,
        probe_phase_max=0.5, save_outputs=False, verbose=False, seed=0,
        forward_algorithm="conv", kernel_size=5)
    assert np.isfinite(info["loss"]).all()


def test_ptycho_split_engine_matches_complex(ptycho_setup):
    """split_complex=True follows the complex ptycho engine's trajectory."""
    gd, gb, pos, probe_size, data = ptycho_setup
    common = dict(probe_pos=pos, probe_size=probe_size, obj_size=(24, 24, 24),
                  data=data, theta_end=2 * np.pi, n_epochs=3, alpha_d=0,
                  alpha_b=0, gamma=0, learning_rate=1e-7, minibatch_size=9,
                  energy_ev=5000, psize_cm=1e-7, probe_type="gaussian",
                  probe_mag_sigma=3, probe_phase_sigma=3, probe_phase_max=0.5,
                  save_outputs=False, verbose=False, seed=0)
    d1, b1, i1 = reconstruct_ptychography(split_complex=False, **common)
    d2, b2, i2 = reconstruct_ptychography(split_complex=True, **common)
    assert np.allclose(i1["loss"], i2["loss"], rtol=0.3)
    assert np.abs(d1 - d2).max() < 5e-7


def test_safe_mag_gradient_finite_at_zero():
    """|psi| must have a finite gradient where the field is exactly zero:
    probe_circ_mask zeroes the field outside the pupil and TPU flushes the
    denormals that keep CPU away from sqrt(0) — the unguarded magnitude
    NaN'd the whole ptycho gradient on TPU (found at the ptycho_2d preset)."""
    import jax
    import jax.numpy as jnp
    from beyond_dof_tpu.models.ptycho import safe_mag

    re = jnp.zeros((4, 4), jnp.float32)
    im = jnp.zeros((4, 4), jnp.float32)
    g = jax.grad(lambda r: jnp.sum(safe_mag(r, im)))(re)
    assert np.all(np.isfinite(np.asarray(g)))
    # and the value is exact away from zero
    np.testing.assert_allclose(
        np.asarray(safe_mag(jnp.float32(3.0), jnp.float32(4.0))), 5.0,
        rtol=1e-6)


def test_ptycho_n_dp_batch_chunking_matches(ptycho_setup):
    """n_dp_batch position chunking (ref ptychography.py:40,64-91 — bounds
    the transient memory of the probe-window propagation) reproduces the
    unchunked forward outputs and gradients. (Engine trajectories are NOT
    compared: Adam amplifies reassociation-scale gradient differences on
    near-zero voxels to full +-lr steps.)"""
    import jax
    from beyond_dof_tpu.models.ptycho import ptycho_forward
    gd, gb, pos, probe_size, data = ptycho_setup
    pad_arr = compute_pad_arr(pos, probe_size, gd.shape)
    probe = np.ones(probe_size, np.complex64)
    mag = jnp.abs(jnp.asarray(data[1]))

    def loss(d, b, n_dp):
        out = ptycho_forward(d, b, jnp.float32(0.4), pos, probe, 5000, 1e-7,
                             probe_size, pad_arr, n_dp_batch=n_dp)
        return jnp.mean((jnp.abs(out) - mag) ** 2)

    gd_j, gb_j = jnp.asarray(gd), jnp.asarray(gb)
    out_full = ptycho_forward(gd_j, gb_j, jnp.float32(0.4), pos, probe, 5000,
                              1e-7, probe_size, pad_arr, n_dp_batch=None)
    out_chunk = ptycho_forward(gd_j, gb_j, jnp.float32(0.4), pos, probe, 5000,
                               1e-7, probe_size, pad_arr, n_dp_batch=4)
    np.testing.assert_allclose(np.abs(np.asarray(out_chunk)),
                               np.abs(np.asarray(out_full)), rtol=2e-5,
                               atol=1e-7)
    l0, g0 = jax.value_and_grad(loss)(gd_j, gb_j, None)
    l1, g1 = jax.value_and_grad(loss)(gd_j, gb_j, 4)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-3,
                               atol=1e-8 * float(np.abs(np.asarray(g0)).max()))
