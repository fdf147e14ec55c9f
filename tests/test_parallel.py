import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from beyond_dof_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from beyond_dof_tpu.parallel.collectives import halo_exchange_1d, broadcast_flag
from beyond_dof_tpu.models.phantom import adhesin_phantom
from beyond_dof_tpu.sim.acquire import create_fullfield_data
from beyond_dof_tpu.recon.fullfield import reconstruct_fullfield

try:
    from jax import shard_map as _sm

    def shard_map(f, mesh, in_specs, out_specs):
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
except ImportError:
    from jax.experimental.shard_map import shard_map as _smo

    def shard_map(f, mesh, in_specs, out_specs):
        return _smo(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def test_make_mesh_shapes():
    mesh = make_mesh(n_data=2, tile_yx=(2, 2))
    assert mesh.shape == {"data": 2, "ty": 2, "tx": 2}
    mesh1 = make_mesh(n_data=1, tile_yx=(1, 1))
    assert mesh1.shape == {"data": 1, "ty": 1, "tx": 1}


def test_halo_exchange_matches_global_pad():
    """Gather the halos on a 4-way mesh and compare against a plain global pad."""
    mesh = make_mesh(n_data=1, tile_yx=(4, 1))
    x = np.arange(32 * 8, dtype=np.float32).reshape(32, 8)

    def f(tile):
        return halo_exchange_1d(tile, 2, 0, "ty", edge_val=-1.0)

    out = shard_map(f, mesh, in_specs=P("ty", None),
                    out_specs=P("ty", None))(jnp.asarray(x))
    out = np.asarray(out)  # (4*(8+4), 8) stacked padded tiles
    tiles = out.reshape(4, 12, 8)
    for i in range(4):
        lo = x[i * 8 - 2: i * 8] if i > 0 else np.full((2, 8), -1.0)
        hi = x[(i + 1) * 8: (i + 1) * 8 + 2] if i < 3 else np.full((2, 8), -1.0)
        assert np.array_equal(tiles[i, :2], lo)
        assert np.array_equal(tiles[i, 2:10], x[i * 8:(i + 1) * 8])
        assert np.array_equal(tiles[i, 10:], hi)


def test_broadcast_flag_single_process():
    assert broadcast_flag(True) is True
    assert broadcast_flag(False) is False


def test_data_parallel_engine_matches_serial():
    """1-device vs 2-way data-parallel reconstruction: same loss trajectory
    (the sharded minibatch mean + SPMD grad reduction must equal the serial
    computation up to reduction order)."""
    gd, gb = adhesin_phantom(16)
    data = create_fullfield_data(gd, gb, energy_ev=800, psize_cm=0.67e-7,
                                 free_prop_cm=None, n_theta=16, batch_size=8,
                                 theta_end=2 * np.pi)
    common = dict(data=data, theta_end=2 * np.pi, n_epochs=3, alpha_d=0,
                  alpha_b=0, gamma=0, energy_ev=800,
                  psize_cm=0.67e-7, shrink_cycle=None, save_outputs=False,
                  verbose=False, propagate_last=False, seed=0,
                  random_theta=False)
    d1, b1, info1 = reconstruct_fullfield(minibatch_size=8,
                                          learning_rate=1e-7, **common)
    mesh = make_mesh(n_data=2, tile_yx=(1, 1))
    # the engine scales LR by the data-parallel size (reference semantics,
    # ref fullfield.py:409-411) — halve it to compare trajectories exactly
    d2, b2, info2 = reconstruct_fullfield(minibatch_size=4, mesh=mesh,
                                          learning_rate=0.5e-7, **common)
    # same global batch of 8 angles split over 2 devices
    assert np.allclose(info1["loss"], info2["loss"], rtol=1e-3)
    assert np.allclose(d1, d2, atol=1e-8)


def test_data_sharding_spec():
    mesh = make_mesh(n_data=2, tile_yx=(1, 1))
    sh = data_sharding(mesh, 3)
    x = jax.device_put(jnp.zeros((4, 8, 8)), sh)
    assert len(x.sharding.device_set) == 2


def test_object_z_sharding_matches_replicated():
    """FSDP-like Z-axis sharding of the object + Adam state over the data
    axis (SURVEY §2 'Model/optimizer sharding') is bitwise-equivalent."""
    gd, gb = adhesin_phantom(16)
    data = create_fullfield_data(gd, gb, energy_ev=800, psize_cm=0.67e-7,
                                 free_prop_cm=None, n_theta=8, batch_size=8,
                                 theta_end=2 * np.pi)
    common = dict(data=data, theta_end=2 * np.pi, n_epochs=2, alpha_d=0,
                  alpha_b=0, gamma=0, energy_ev=800, psize_cm=0.67e-7,
                  minibatch_size=4, shrink_cycle=None, save_outputs=False,
                  verbose=False, propagate_last=False, seed=0,
                  random_theta=False, learning_rate=0.5e-7)
    mesh = make_mesh(n_data=2, tile_yx=(1, 1))
    d1, b1, i1 = reconstruct_fullfield(mesh=mesh, **common)
    d2, b2, i2 = reconstruct_fullfield(mesh=mesh, shard_object="z", **common)
    assert i1["loss"] == i2["loss"]
    assert np.array_equal(d1, d2)


def test_ptycho_data_parallel_runs():
    """Ptycho engine with the (theta, position) job blocks sharded over the
    data axis (each group = one angle, ref cnn ptychography.py:264-299)."""
    from beyond_dof_tpu.sim.acquire import (create_ptychography_data,
                                            grid_probe_positions)
    from beyond_dof_tpu.recon.ptycho import reconstruct_ptychography
    gd, gb = adhesin_phantom(16)
    probe_size = (8, 8)
    pos = grid_probe_positions((16, 16), probe_size, 4)
    data = create_ptychography_data(
        gd, gb, 5000, 1e-7, n_theta=4, probe_pos=pos, probe_size=probe_size,
        theta_end=2 * np.pi, probe_mag_sigma=2, probe_phase_sigma=2,
        probe_phase_max=0.5, probe_circ_mask=0.9)
    mesh = make_mesh(n_data=2, tile_yx=(1, 1))
    d, b, info = reconstruct_ptychography(
        probe_pos=pos, probe_size=probe_size, obj_size=(16, 16, 16),
        data=data, theta_end=2 * np.pi, n_epochs=2, alpha_d=0, alpha_b=0,
        gamma=0, learning_rate=1e-7, minibatch_size=4, energy_ev=5000,
        psize_cm=1e-7, probe_type="gaussian", probe_mag_sigma=2,
        probe_phase_sigma=2, probe_phase_max=0.5, save_outputs=False,
        verbose=False, seed=0, mesh=mesh)
    assert np.isfinite(info["loss"]).all()


def test_profiler_trace_written(tmp_path):
    """Chrome-trace-per-epoch UX (ref fullfield.py:558-568 -> jax.profiler)."""
    import os
    gd, gb = adhesin_phantom(16)
    data = create_fullfield_data(gd, gb, energy_ev=800, psize_cm=0.67e-7,
                                 free_prop_cm=None, n_theta=4, batch_size=4,
                                 theta_end=2 * np.pi)
    d, b, info = reconstruct_fullfield(
        data=data, theta_end=2 * np.pi, n_epochs=1, alpha_d=0, alpha_b=0,
        gamma=0, learning_rate=1e-7, energy_ev=800, psize_cm=0.67e-7,
        minibatch_size=4, shrink_cycle=None, verbose=False, seed=0,
        save_outputs=True, output_folder=str(tmp_path / "out"),
        profile_epochs=(0,))
    prof_dir = str(tmp_path / "out" / "profiling" / "epoch_0")
    found = []
    for root, _, files in os.walk(prof_dir):
        found += files
    assert found, "no profiler trace files written"


def test_data_parallel_point_probe_matches_serial():
    """DP reconstruction through the cone-beam (spherical) forward matches
    the serial run — the separable-resample path is plain per-volume
    einsums, so the data axis shards it like any other forward."""
    from beyond_dof_tpu.ops.spherical import multislice_propagate_spherical
    from beyond_dof_tpu.constants import PI

    n, dist = 16, 3.75e-6
    gd, gb = adhesin_phantom(n)
    data = np.asarray(multislice_propagate_spherical(
        gd[None], gb[None], np.ones((n, n), np.complex64), 800, 1e-7,
        dist_to_source_cm=dist, det_psize_cm=2e-7, theta_max=PI / 15,
        phi_max=PI / 15, map_to_plane=False))
    data = np.tile(data, (8, 1, 1))
    common = dict(data=data, theta_end=2 * np.pi, n_epochs=2, alpha_d=0,
                  alpha_b=0, gamma=0, energy_ev=800, psize_cm=1e-7,
                  shrink_cycle=None, save_outputs=False, verbose=False,
                  seed=0, random_theta=False, probe_type="point",
                  split_complex=True, dist_to_source_cm=dist,
                  det_psize_cm=2e-7, theta_max=PI / 15, phi_max=PI / 15,
                  resample_grad="separable")
    d1, b1, info1 = reconstruct_fullfield(minibatch_size=4,
                                          learning_rate=1e-7, **common)
    mesh = make_mesh(n_data=2, tile_yx=(1, 1))
    d2, b2, info2 = reconstruct_fullfield(minibatch_size=2, mesh=mesh,
                                          learning_rate=0.5e-7, **common)
    assert np.allclose(info1["loss"], info2["loss"], rtol=1e-3)
    assert np.allclose(d1, d2, atol=1e-7)


def test_y_sharded_engine_matches_serial():
    """shard_object='y' (the fully slab-local train step, recon/sharded.py)
    matches the serial conv engine: rotation, halo-exchange propagation,
    L1+TV regularizers (incl. the cross-slab TV boundary row), Adam and
    projections all run inside one shard_map over ty with only O(N^3/n_ty)
    per-device state."""
    rng = np.random.RandomState(0)
    n = 32
    data = (1.0 + 1e-3 * rng.randn(8, n, n)).astype(np.complex64)
    common = dict(data=data, theta_end=np.pi, n_epochs=2, alpha_d=1e-9,
                  alpha_b=1e-10, gamma=1e-9, learning_rate=1e-7,
                  energy_ev=5000, psize_cm=1e-7, free_prop_cm=1e-4,
                  minibatch_size=4, shrink_cycle=None, save_outputs=False,
                  verbose=False, seed=0, random_theta=False,
                  forward_algorithm="conv", kernel_size=9,
                  split_complex=True)
    d1, b1, info1 = reconstruct_fullfield(**common)
    mesh = make_mesh(n_data=1, tile_yx=(4, 1))
    d2, b2, info2 = reconstruct_fullfield(shard_object="y", tile_mesh=mesh,
                                          **common)
    assert np.allclose(info1["loss"], info2["loss"], rtol=1e-4), (
        info1["loss"], info2["loss"])
    # Adam's m/sqrt(v) is ~sign(g) at near-zero gradients, so float-reorder
    # noise flips single elements by one lr quantum per update in EACH run;
    # 2 epochs x 2 minibatches = 4 updates of lr=1e-7, two trajectories
    assert np.abs(np.asarray(d1) - np.asarray(d2)).max() < 8 * 1e-7
    assert np.abs(np.asarray(b1) - np.asarray(b2)).max() < 8 * 1e-7


def test_y_sharded_epoch_scan_matches_loop():
    """The Y-sharded step composes with epoch_in_one_call (scan over the
    shard_mapped step with a ty-sharded device-resident projection stack)."""
    rng = np.random.RandomState(1)
    n = 32
    data = (1.0 + 1e-3 * rng.randn(8, n, n)).astype(np.complex64)
    mesh = make_mesh(n_data=1, tile_yx=(4, 1))
    common = dict(data=data, theta_end=np.pi, n_epochs=2, alpha_d=1e-9,
                  alpha_b=0, gamma=1e-9, learning_rate=1e-7,
                  energy_ev=5000, psize_cm=1e-7, free_prop_cm=1e-4,
                  minibatch_size=4, shrink_cycle=None, save_outputs=False,
                  verbose=False, seed=0, random_theta=False,
                  forward_algorithm="conv", kernel_size=9,
                  split_complex=True, shard_object="y", tile_mesh=mesh)
    d1, b1, info1 = reconstruct_fullfield(epoch_in_one_call=False, **common)
    d2, b2, info2 = reconstruct_fullfield(epoch_in_one_call=True, **common)
    assert np.allclose(info1["loss"], info2["loss"], rtol=1e-4)
    assert np.abs(np.asarray(d1) - np.asarray(d2)).max() < 8 * 1e-7


def test_y_sharded_data_parallel_matches_serial():
    """DP replicas of the Y-sharded object: a (data=2, ty=2) mesh with
    grads pmean'd over 'data' inside the shard_mapped step matches the
    serial run at the same global batch (halved LR per the engine's
    Horovod-parity LR x size scaling)."""
    rng = np.random.RandomState(2)
    n = 32
    data = (1.0 + 1e-3 * rng.randn(8, n, n)).astype(np.complex64)
    common = dict(data=data, theta_end=np.pi, n_epochs=2, alpha_d=1e-9,
                  alpha_b=1e-10, gamma=1e-9, energy_ev=5000, psize_cm=1e-7,
                  free_prop_cm=1e-4, shrink_cycle=None, save_outputs=False,
                  verbose=False, seed=0, random_theta=False,
                  forward_algorithm="conv", kernel_size=9,
                  split_complex=True)
    d1, b1, info1 = reconstruct_fullfield(minibatch_size=4,
                                          learning_rate=1e-7, **common)
    mesh = make_mesh(n_data=2, tile_yx=(2, 1))
    d2, b2, info2 = reconstruct_fullfield(minibatch_size=2, shard_object="y",
                                          tile_mesh=mesh,
                                          learning_rate=0.5e-7, **common)
    assert np.allclose(info1["loss"], info2["loss"], rtol=1e-4), (
        info1["loss"], info2["loss"])
    # each of the two compared trajectories can diverge by one lr quantum
    # per update (Adam ~sign(g) at near-zero gradients), so the bound is
    # 2 runs x 4 updates x the effective lr (1e-7 after the x size scaling)
    assert np.abs(np.asarray(d1) - np.asarray(d2)).max() < 8 * 1e-7
    assert np.abs(np.asarray(b1) - np.asarray(b2)).max() < 8 * 1e-7
