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


def comm_model(size, n_slices, kernel_size, ty, tx, bytes_per_px=8,
               ici_bw=4.5e10, ici_latency=1e-6):
    """Analytic communication-volume model of the halo exchange.

    Per slice each tile ppermutes a ``pad``-wide apron along each tiled
    axis in both directions (ops/tiled.py halo_exchange_1d):
      bytes/slice/device = 2 * pad * (tile_x * [ty>1] + tile_y * [tx>1]) * B
    ICI time estimate uses a flat per-hop latency + bandwidth term so the
    projected numbers transfer to a real pod slice (the reference's absent
    mpi_conv_bp scaling study, ref README.md:6-11).
    """
    pad = (kernel_size - 1) // 2
    tile_y, tile_x = size // ty, size // tx
    bytes_slice = 2 * pad * ((tile_x if ty > 1 else 0)
                             + (tile_y if tx > 1 else 0)) * bytes_per_px
    n_ppermute = n_slices * ((2 if ty > 1 else 0) + (2 if tx > 1 else 0))
    t_comm = n_slices * (bytes_slice / ici_bw) + n_ppermute * ici_latency
    # compute volume: separable conv = 2 complex matmuls per slice per tile
    flops = n_slices * 2 * 4 * 2 * kernel_size * tile_y * tile_x  # karatsuba-ish
    return {"pad": pad, "tile": [tile_y, tile_x],
            "halo_bytes_per_slice_per_device": bytes_slice,
            "ppermute_steps": n_ppermute,
            "est_comm_s": t_comm, "flops_per_device": flops}


def scaling_study(kernel_size=17, n_slices=64, out_json=None):
    """Weak + strong scaling record on the current mesh (virtual or real).

    Strong: fixed 256^2 plane over growing tile grids. Weak: plane grows
    with the tile grid (128^2 per tile). CPU wall times on a virtual mesh
    are NOT TPU projections — the committed record carries the analytic
    comm/compute model alongside so real-pod numbers are one command away.
    """
    import jax
    record = {"n_devices": len(jax.devices()),
              "backend": jax.default_backend(),
              "kernel_size": kernel_size, "n_slices": n_slices,
              "strong": [], "weak": []}
    tiles = [(1, 1), (2, 1), (2, 2), (4, 2)]
    strong = tiled_scaling(size=256, n_slices=n_slices,
                           kernel_size=kernel_size, tiles=tiles)
    for key, t in strong.items():
        if key == "serial":
            record["strong"].append({"tiles": "serial", "wall_s": t})
            continue
        ty, tx = (int(v) for v in key.split("x"))
        entry = {"tiles": [ty, tx], "wall_s": t}
        entry.update(comm_model(256, n_slices, kernel_size, ty, tx))
        record["strong"].append(entry)
    import jax.numpy as jnp  # noqa: F401  (kept hot for the weak loop)
    from beyond_dof_tpu.ops.tiled import multislice_propagate_tiled
    from beyond_dof_tpu.parallel.mesh import make_mesh
    rng = np.random.RandomState(0)
    for ty, tx in tiles:
        if ty * tx > len(jax.devices()):
            continue
        size = 128 * max(ty, tx)
        gd = (rng.rand(1, size, size, n_slices) * 1e-7).astype(np.float32)
        gb = (rng.rand(1, size, size, n_slices) * 1e-8).astype(np.float32)
        probe = np.ones((size, size), np.complex64)
        mesh = make_mesh(n_data=1, tile_yx=(ty, tx))
        fn = jax.jit(lambda a, b, m=mesh: multislice_propagate_tiled(
            a, b, probe, 5000, 1e-7, m, kernel_size=kernel_size, remat=False))
        entry = {"tiles": [ty, tx], "size": size,
                 "wall_s": _time_call(fn, gd, gb)}
        entry.update(comm_model(size, n_slices, kernel_size, ty, tx))
        record["weak"].append(entry)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(record, f, indent=1)
    return record


if __name__ == "__main__":
    import sys
    if "--scaling" in sys.argv:
        out = sys.argv[sys.argv.index("--scaling") + 1] \
            if len(sys.argv) > sys.argv.index("--scaling") + 1 else None
        print(json.dumps(scaling_study(out_json=out)))
    else:
        print(json.dumps({
            "kernel_size_sweep": kernel_size_sweep(size=128, n_slices=32),
            "tiled_scaling": tiled_scaling(size=128, n_slices=32)}))
