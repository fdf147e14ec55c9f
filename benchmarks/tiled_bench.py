"""Tiled truncated-kernel propagator benchmarks + kernel-size sweep.

Rebuilds the reference's benchmark harnesses:
* kernel-size -> wall-time sweep writing ``conv_ir_report.csv``
  (ref cnn_propagator/propagation.py:151-169);
* weak/strong scaling of the halo-exchange propagator over a (ty, tx) mesh
  (the measurements of the absent ``mpi_conv_bp`` branch / s_scaling_pfft
  scripts, re-derived TPU-native).

Run on real chips or on a virtual CPU mesh (JAX_PLATFORMS=cpu +
xla_force_host_platform_device_count).
"""

import json
import time

import numpy as np


def _time_call(fn, *args, n_iters=5):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iters


def kernel_size_sweep(size=256, n_slices=64, kernel_sizes=(3, 5, 9, 17, 33, 65),
                      csv_path="conv_ir_report.csv", energy_ev=5000,
                      psize_cm=1e-7):
    """Kernel-size vs time sweep (ref propagation.py:161-169 format)."""
    import jax
    from beyond_dof_tpu.ops.tiled import multislice_propagate_cnn

    rng = np.random.RandomState(0)
    gd = (rng.rand(1, size, size, n_slices) * 1e-7).astype(np.float32)
    gb = (rng.rand(1, size, size, n_slices) * 1e-8).astype(np.float32)
    probe = np.ones((size, size), np.complex64)
    rows = []
    for ks in kernel_sizes:
        fn = jax.jit(lambda a, b, k=ks: multislice_propagate_cnn(
            a, b, probe, energy_ev, psize_cm, kernel_size=k, remat=False))
        dt = _time_call(fn, gd, gb)
        rows.append((ks, dt))
    with open(csv_path, "w") as f:
        f.write("kernel_size,time\n")
        for ks, dt in rows:
            f.write("{},{}\n".format(ks, dt))
    return rows


def tiled_scaling(size=256, n_slices=64, kernel_size=17, tiles=((1, 1), (2, 1),
                                                                (2, 2), (4, 2)),
                  energy_ev=5000, psize_cm=1e-7):
    """Strong scaling of the halo-exchange propagator over tile grids."""
    import jax
    from beyond_dof_tpu.ops.tiled import (multislice_propagate_cnn,
                                          multislice_propagate_tiled)
    from beyond_dof_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(0)
    gd = (rng.rand(1, size, size, n_slices) * 1e-7).astype(np.float32)
    gb = (rng.rand(1, size, size, n_slices) * 1e-8).astype(np.float32)
    probe = np.ones((size, size), np.complex64)

    results = {}
    fn0 = jax.jit(lambda a, b: multislice_propagate_cnn(
        a, b, probe, energy_ev, psize_cm, kernel_size=kernel_size, remat=False))
    results["serial"] = _time_call(fn0, gd, gb)
    n_dev = len(jax.devices())
    for ty, tx in tiles:
        if ty * tx > n_dev:
            continue
        mesh = make_mesh(n_data=1, tile_yx=(ty, tx))
        fn = jax.jit(lambda a, b, m=mesh: multislice_propagate_tiled(
            a, b, probe, energy_ev, psize_cm, m, kernel_size=kernel_size,
            remat=False))
        results["%dx%d" % (ty, tx)] = _time_call(fn, gd, gb)
    return results


if __name__ == "__main__":
    print(json.dumps({"kernel_size_sweep": kernel_size_sweep(size=128, n_slices=32),
                      "tiled_scaling": tiled_scaling(size=128, n_slices=32)}))
