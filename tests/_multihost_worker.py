"""Worker for tests/test_multihost.py — one process of a 2-process CPU job.

Exercises the only otherwise-untested parallel code path: real
``jax.distributed.initialize`` multi-process startup (parallel/mesh.py:51-61,
the replacement for the reference's hvd.init/MPI_Init, ref
tensorflow_recon/fullfield.py:118-145), a cross-process device mesh, a
data-parallel gradient step over a globally-sharded batch, and
``broadcast_flag`` (the .stop_iteration equivalent).

Usage: python _multihost_worker.py <coordinator> <num_processes> <process_id>
Prints one JSON line with the results for the parent test to check.
"""

import json
import sys

import numpy as np


def main():
    coordinator, num_processes, process_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from beyond_dof_tpu.parallel.mesh import (init_distributed, make_mesh,
                                              data_sharding)
    from beyond_dof_tpu.parallel.collectives import broadcast_flag

    idx, cnt = init_distributed(coordinator_address=coordinator,
                                num_processes=num_processes,
                                process_id=process_id)
    assert idx == process_id and cnt == num_processes

    # mesh over the GLOBAL device list (one CPU device per process)
    mesh = make_mesh(n_data=num_processes)

    # one DP step: grad of a quadratic over a batch sharded across processes.
    # Each process owns its slice of the batch; the SPMD partitioner inserts
    # the gradient allreduce (no explicit collective in user code).
    n_local, feat = 4, 3
    rng = np.random.RandomState(42)  # same on both: full batch reconstructible
    full_x = rng.randn(num_processes * n_local, feat).astype(np.float32)
    full_y = rng.randn(num_processes * n_local).astype(np.float32)
    w0 = np.arange(1, feat + 1, dtype=np.float32)

    sh = data_sharding(mesh, 2)
    sh1 = data_sharding(mesh, 1)
    local_sl = slice(process_id * n_local, (process_id + 1) * n_local)
    gx = jax.make_array_from_process_local_data(sh, full_x[local_sl])
    gy = jax.make_array_from_process_local_data(sh1, full_y[local_sl])

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    gw = jax.jit(jax.grad(loss),
                 in_shardings=(rep, sh, sh1),
                 out_shardings=rep)(jnp.asarray(w0), gx, gy)
    gw_host = np.asarray(jax.device_get(gw))

    # serial oracle on the full batch
    expect = np.asarray(jax.grad(loss)(jnp.asarray(w0), jnp.asarray(full_x),
                                       jnp.asarray(full_y)))
    grad_err = float(np.abs(gw_host - expect).max())

    # stop-flag agreement: only process 0 "decides" to stop
    flag = broadcast_flag(process_id == 0)

    print(json.dumps({
        "process_id": idx, "process_count": cnt,
        "n_global_devices": len(jax.devices()),
        "mesh_shape": list(mesh.devices.shape),
        "grad_err": grad_err, "flag": bool(flag),
    }), flush=True)


if __name__ == "__main__":
    main()
