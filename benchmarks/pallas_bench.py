"""Fused Pallas multislice kernel benchmark: forward and forward+backward.

Measures slices/sec/chip for :func:`multislice_pallas_invertible` at the
reference workload plane sizes (256^2 .. 1024^2; ref workloads
tensorflow_recon/reconstruct_fullfield.py:19-206). Timing follows the
axon-relay rules (see .claude/skills/verify): device-side fori_loop
repetition inside ONE jit call, differenced between two call lengths; arrays
passed as jit args (never closed over).

Usage: python -u benchmarks/pallas_bench.py [--size 256] [--nz 256]
           [--batch 1] [--mode fwd|grad] [--iters 10]
"""

import argparse
import json
import time

import numpy as np


def build_inputs(size, nz, batch, energy_ev=5000.0, psize_cm=1e-7, seed=0):
    import jax.numpy as jnp
    from beyond_dof_tpu.constants import PI
    from beyond_dof_tpu.ops.fresnel import get_kernel, ifftshift2
    from beyond_dof_tpu.ops.splitfft import permute_kernel_2d

    rng = np.random.RandomState(seed)
    delta = (rng.rand(nz, batch, size, size) * 1e-7).astype(np.float32)
    beta = (rng.rand(nz, batch, size, size) * 1e-8).astype(np.float32)
    voxel_nm = psize_cm * 1e7
    lmbda_nm = 1240.0 / energy_ev
    k = float(2.0 * PI * voxel_nm / lmbda_nm)
    h = get_kernel(voxel_nm, lmbda_nm, [voxel_nm] * 3, (size, size))
    h_p = permute_kernel_2d(ifftshift2(np.asarray(h)))
    hr = jnp.asarray(np.real(h_p).astype(np.float32))
    hi = jnp.asarray(np.imag(h_p).astype(np.float32))
    w_re = jnp.ones((batch, size, size), jnp.float32)
    w_im = jnp.zeros((batch, size, size), jnp.float32)
    return (jnp.asarray(delta), jnp.asarray(beta), w_re, w_im, hr, hi, k)


def make_timed(mode, k, n_iters):
    import jax
    import jax.numpy as jnp
    from beyond_dof_tpu.ops.pallas_kernels import multislice_pallas_invertible

    if mode == "fwd":
        @jax.jit
        def timed(delta, beta, w_re, w_im, hr, hi):
            def body(_, w):
                re, im = multislice_pallas_invertible(
                    delta, beta, w[0], w[1], hr, hi, k, False)
                return jnp.stack([re, im])
            w = jax.lax.fori_loop(0, n_iters, body,
                                  jnp.stack([w_re, w_im]))
            return jnp.sum(w[0] ** 2 + w[1] ** 2)
    else:
        @jax.jit
        def timed(delta, beta, w_re, w_im, hr, hi):
            def loss(d, b, wr, wi):
                re, im = multislice_pallas_invertible(
                    d, b, wr, wi, hr, hi, k, False)
                return jnp.mean(re * re + im * im)

            def body(_, acc):
                val, (gd, gb) = jax.value_and_grad(loss, argnums=(0, 1))(
                    delta + acc * 0, beta, w_re, w_im)
                return acc + val + jnp.mean(gd) + jnp.mean(gb)
            return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))
    return timed


def run(size, nz, batch, mode, n_iters):
    args = build_inputs(size, nz, batch)
    k = args[-1]
    t1 = make_timed(mode, k, n_iters)
    t2 = make_timed(mode, k, 2 * n_iters)
    # warm both compiles
    float(t1(*args[:-1]))
    float(t2(*args[:-1]))
    t0 = time.perf_counter()
    float(t1(*args[:-1]))
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(t2(*args[:-1]))
    dt2 = time.perf_counter() - t0
    per_vol = (dt2 - dt1) / n_iters
    slices = nz * batch / per_vol
    return {"metric": "pallas_%s_slices_per_sec" % mode, "value": slices,
            "unit": "slices/s", "size": size, "nz": nz, "batch": batch,
            "s_per_volume": per_vol}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--nz", type=int, default=256)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--mode", default="fwd", choices=["fwd", "grad"])
    p.add_argument("--iters", type=int, default=10)
    a = p.parse_args()
    print(json.dumps(run(a.size, a.nz, a.batch, a.mode, a.iters)), flush=True)
