"""Beyond-VMEM plane sizes: 2048^2 / 4096^2 multislice on ONE chip.

The fully-fused kernel holds the wavefield in VMEM and tops out at 1024^2
(33.5 MB of field alone at 2048^2). Above that the framework has two
forward paths:

  * the XLA split-complex scan (`multislice_propagate_batch_split`,
    use_pallas=False) — also the training path at these sizes, and
  * the blocked two-pass Pallas pipeline
    (`multislice_pallas_split_blocked`): X-pass kernels stream py-row
    blocks, Y-pass kernels stream qx-column blocks, the field lives in
    HBM between passes — same radix-DIF math, VMEM footprint O(block).

This records fwd slices/s for both at 2048^2 (and 4096^2 with --big),
device-side fori_loop differencing like every other bench.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u
           benchmarks/scale_2048.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(size, nz, iters):
    import jax
    import jax.numpy as jnp
    from beyond_dof_tpu.ops.pallas_kernels import (
        multislice_pallas_split_blocked)
    from beyond_dof_tpu.ops.multislice import multislice_propagate_batch_split

    # Inputs are generated ON DEVICE: at 2048^2 x 64 the host->device upload
    # of 2 GB of random grids dominates (and can exceed) the whole bench over
    # the relay link; the throughput being measured is upload-independent.
    @jax.jit
    def make_inputs(seed):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        d = jax.random.uniform(k1, (size, size, nz), jnp.float32) * 1e-7
        b = jax.random.uniform(k2, (size, size, nz), jnp.float32) * 1e-8
        return d, b

    delta, beta = make_inputs(0)
    delta.block_until_ready()
    w_re = jnp.ones((size, size), jnp.float32)
    w_im = jnp.zeros((size, size), jnp.float32)

    def timed_factory(fn):
        def make(n):
            @jax.jit
            def timed(d, b, wr, wi):
                def body(_, w):
                    re, im = fn(d, b, w[0], w[1])
                    return jnp.stack([re, im])
                w = jax.lax.fori_loop(0, n, body, jnp.stack([wr, wi]))
                return jnp.sum(w[0] ** 2 + w[1] ** 2)
            return timed
        return make

    def run_one(make, tag):
        t1, t2 = make(iters), make(2 * iters)
        float(t1(delta, beta, w_re, w_im))
        float(t2(delta, beta, w_re, w_im))
        print("warmed", tag, flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(t1(delta, beta, w_re, w_im))
            d1 = time.time() - t0
            t0 = time.time()
            float(t2(delta, beta, w_re, w_im))
            d2 = time.time() - t0
            best = min(best, (d2 - d1) / iters)
        print("timed", tag, round(nz * iters / best / iters, 1), flush=True)
        return round(nz / best, 1)

    def xla_fwd(d, b, wr, wi):
        return multislice_propagate_batch_split(
            d[None], b[None], wr, wi, 5000.0, 1e-7, propagate_last=True,
            remat=False, use_pallas=False)

    def xla_call(d, b, wr, wi):
        re, im = xla_fwd(d, b, wr, wi)
        return re[0], im[0]

    def blocked_call(d, b, wr, wi):
        return multislice_pallas_split_blocked(
            d, b, wr, wi, 5000.0, 1e-7)

    # parity first (one sweep), reduced ON DEVICE — pulling the four full
    # planes to the host is tens of MB over the relay link and dominates
    # the whole bench otherwise.
    @jax.jit
    def parity(d, b, wr, wi):
        bre, bim = blocked_call(d, b, wr, wi)
        xre, xim = xla_call(d, b, wr, wi)
        amp_b = jnp.sqrt(bre * bre + bim * bim)
        amp_x = jnp.sqrt(xre * xre + xim * xim)
        return jnp.max(jnp.abs(amp_b - amp_x) / (jnp.abs(amp_x) + 1e-6))

    t0 = time.time()
    max_rel = float(parity(delta, beta, w_re, w_im))
    print("parity", size, max_rel, round(time.time() - t0, 1), "s",
          flush=True)

    return {
        "size": size, "nz": nz,
        "blocked_vs_xla_max_rel_amp": max_rel,
        "xla_split_fwd_slices_per_sec":
            run_one(timed_factory(xla_call), "xla"),
        "blocked_pallas_fwd_slices_per_sec":
            run_one(timed_factory(blocked_call), "blocked"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true", help="also run 4096^2")
    a = ap.parse_args()
    prec = os.environ.get("BDT_DFT_PRECISION", "highest").lower()
    out = {"metric": "beyond_vmem_plane_scale", "precision": prec}
    try:
        out["platform_version"] = \
            __import__("jax").devices()[0].client.platform_version
    except Exception:
        pass
    sizes = [(2048, 64, 5)] + ([(4096, 16, 3)] if a.big else [])
    for size, nz, iters in sizes:
        out["%d" % size] = bench(size, nz, iters)
        print(size, json.dumps(out["%d" % size]), flush=True)
    suffix = "" if prec == "highest" else "_" + prec
    with open("benchmarks/scale_2048%s.json" % suffix, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
