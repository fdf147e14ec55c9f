"""Blocked two-pass Pallas multislice benchmark (big planes, 1024^2+).

Times :func:`multislice_pallas_split_blocked` against the XLA split scan at
the same plane size, device-side fori_loop differencing (axon relay rules:
arrays as jit args, two call lengths differenced).

Usage: python -u benchmarks/blocked_bench.py [--size 1024] [--nz 128]
           [--iters 4] [--py 128] [--qx 128] [--path blocked|xla|fused]
"""

import argparse
import json
import time

import numpy as np


def build_inputs(size, nz, seed=0):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    delta = (rng.rand(size, size, nz) * 1e-7).astype(np.float32)
    beta = (rng.rand(size, size, nz) * 1e-8).astype(np.float32)
    return jnp.asarray(delta), jnp.asarray(beta)


def make_timed(path, size, n_iters, energy_ev=5000.0, psize_cm=1e-7,
               py=128, qx=128):
    import jax
    import jax.numpy as jnp

    if path == "blocked":
        from beyond_dof_tpu.ops.pallas_kernels import (
            multislice_pallas_split_blocked)

        def one(d, b, wr, wi):
            return multislice_pallas_split_blocked(
                d, b, wr, wi, energy_ev, psize_cm, interpret=False,
                py=py, qx=qx)
    elif path == "fused":
        from beyond_dof_tpu.ops.pallas_kernels import multislice_pallas_split

        def one(d, b, wr, wi):
            return multislice_pallas_split(
                d, b, wr, wi, energy_ev, psize_cm, interpret=False)
    else:
        from beyond_dof_tpu.ops.multislice import (
            multislice_propagate_batch_split)

        def one(d, b, wr, wi):
            re, im = multislice_propagate_batch_split(
                d[None], b[None], wr[None], wi[None], energy_ev, psize_cm,
                propagate_last=True, use_pallas=False)
            return re[0], im[0]

    @jax.jit
    def timed(delta, beta):
        wr = jnp.ones((size, size), jnp.float32)
        wi = jnp.zeros((size, size), jnp.float32)

        def body(_, w):
            re, im = one(delta, beta, w[0], w[1])
            return jnp.stack([re, im])
        w = jax.lax.fori_loop(0, n_iters, body, jnp.stack([wr, wi]))
        return jnp.sum(w[0] ** 2 + w[1] ** 2)

    return timed


def run(path, size, nz, n_iters, py, qx):
    delta, beta = build_inputs(size, nz)
    t1 = make_timed(path, size, n_iters, py=py, qx=qx)
    t2 = make_timed(path, size, 2 * n_iters, py=py, qx=qx)
    float(t1(delta, beta))
    float(t2(delta, beta))
    t0 = time.perf_counter()
    float(t1(delta, beta))
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(t2(delta, beta))
    dt2 = time.perf_counter() - t0
    per_vol = (dt2 - dt1) / n_iters
    return {"metric": "%s_slices_per_sec" % path, "value": nz / per_vol,
            "unit": "slices/s", "size": size, "nz": nz,
            "s_per_volume": per_vol, "py": py, "qx": qx}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--nz", type=int, default=128)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--py", type=int, default=128)
    p.add_argument("--qx", type=int, default=128)
    p.add_argument("--path", default="blocked",
                   choices=["blocked", "xla", "fused"])
    a = p.parse_args()
    print(json.dumps(run(a.path, a.size, a.nz, a.iters, a.py, a.qx)),
          flush=True)
