"""Beyond-VMEM plane sizes: 2048^2 / 4096^2 multislice on ONE chip.

The fully-fused kernel holds the wavefield in VMEM and tops out at 1024^2
(33.5 MB of field alone at 2048^2). Above that the framework has two
paths, BOTH differentiable:

  * the XLA split-complex scan (`multislice_propagate_batch_split`,
    use_pallas=False) with the invertible XLA backward, and
  * the blocked two-pass Pallas pipeline
    (`multislice_pallas_split_blocked`): X-pass kernels stream py-row
    blocks, Y-pass kernels stream qx-column blocks, the field lives in
    HBM between passes — same radix-DIF math, VMEM footprint O(block).
    Its backward is the panel-streamed invertible reverse sweep
    (`multislice_pallas_blocked_invertible`), which the engine
    auto-routes for >1024^2 planes.

This records fwd AND fwd+bwd (training) slices/s for both at 2048^2 (and
4096^2 with --big), gradient parity between the paths, and MFU under the
BASELINE.md flop model (3072*N^2 algorithmic FLOPs/slice, fwd+bwd = 3x;
executed passes: HIGHEST=6, HIGH=3, DEFAULT=1; peak 197 bf16 TFLOP/s).
Device-side fori_loop differencing like every other bench.

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


def bench(size, nz, iters, fwd_only=False):
    import jax
    import jax.numpy as jnp
    from beyond_dof_tpu.ops.pallas_kernels import (
        multislice_pallas_split_blocked)
    from beyond_dof_tpu.ops.multislice import (
        multislice_propagate_batch_split, build_split_kernel)

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
    # the pre-permuted Fresnel kernel as RUNTIME arguments: embedded as
    # trace-time constants it is 2 x N^2 floats of compile payload
    # (2 x 256 MB at 8192^2 -> remote-compile HTTP 413); uploaded in
    # row-chunks — single multi-100MB transfers stall/die on the relay
    # link (ROUND_NOTES landmines)
    hs_r, hs_i = build_split_kernel(size, size, 5000.0, 1e-7)

    def upload_chunked(a, rows=1024):
        a = np.asarray(a)
        parts = [jax.device_put(a[i:i + rows])
                 for i in range(0, a.shape[0], rows)]
        out = jnp.concatenate(parts, axis=0)
        out.block_until_ready()
        return out

    if size > 4096:
        hs_r = upload_chunked(hs_r)
        hs_i = upload_chunked(hs_i)
        print("kernel uploaded", flush=True)

    def timed_factory(fn):
        def make(n):
            @jax.jit
            def timed(d, b, wr, wi, hr, hi):
                def body(_, w):
                    re, im = fn(d, b, w[0], w[1], hr, hi)
                    return jnp.stack([re, im])
                w = jax.lax.fori_loop(0, n, body, jnp.stack([wr, wi]))
                return jnp.sum(w[0] ** 2 + w[1] ** 2)
            return timed
        return make

    def run_one(make, tag):
        t1, t2 = make(iters), make(2 * iters)
        float(t1(delta, beta, w_re, w_im, hs_r, hs_i))
        float(t2(delta, beta, w_re, w_im, hs_r, hs_i))
        print("warmed", tag, flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(t1(delta, beta, w_re, w_im, hs_r, hs_i))
            d1 = time.time() - t0
            t0 = time.time()
            float(t2(delta, beta, w_re, w_im, hs_r, hs_i))
            d2 = time.time() - t0
            best = min(best, (d2 - d1) / iters)
        print("timed", tag, round(nz * iters / best / iters, 1), flush=True)
        return round(nz / best, 1)

    def xla_fwd(d, b, wr, wi, hr, hi):
        return multislice_propagate_batch_split(
            d[None], b[None], wr, wi, 5000.0, 1e-7, propagate_last=True,
            remat=False, use_pallas=False, h_split=(hr, hi))

    def xla_call(d, b, wr, wi, hr, hi):
        re, im = xla_fwd(d, b, wr, wi, hr, hi)
        return re[0], im[0]

    def blocked_call(d, b, wr, wi, hr, hi):
        return multislice_pallas_split_blocked(
            d, b, wr, wi, 5000.0, 1e-7, h_split=(hr, hi))

    # training step through the production router (remat='invertible'):
    # route False = XLA invertible backward, 'blocked' = the blocked
    # panel-streamed invertible backward
    def grad_fn(route):
        # target-misfit loss: mean(re^2 + im^2) would be the field NORM,
        # which the unitary propagation preserves exactly (d loss/d delta
        # == 0 identically) — its "gradient" is pure numerical noise and
        # parity on it is meaningless. A fixed target breaks the symmetry.
        def f(d, b, wr, wi, hr, hi):
            re, im = multislice_propagate_batch_split(
                d[None], b[None], wr, wi, 5000.0, 1e-7,
                propagate_last=True, remat="invertible", use_pallas=route,
                h_split=(hr, hi))
            return jnp.mean((re[0] - 0.3) ** 2 + (im[0] + 0.1) ** 2)
        return jax.grad(f, argnums=(0, 1))

    def grad_timed_factory(route):
        g = grad_fn(route)

        def make(n):
            @jax.jit
            def timed(d, b, wr, wi, hr, hi):
                def body(_, acc):
                    gd_, gb_ = g(d, b, wr + acc * 1e-20, wi, hr, hi)
                    return jnp.mean(gd_) + jnp.mean(gb_)
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
            return timed
        return make

    # parity first (one sweep), reduced ON DEVICE — pulling the four full
    # planes to the host is tens of MB over the relay link and dominates
    # the whole bench otherwise.
    @jax.jit
    def parity(d, b, wr, wi, hr, hi):
        bre, bim = blocked_call(d, b, wr, wi, hr, hi)
        xre, xim = xla_call(d, b, wr, wi, hr, hi)
        amp_b = jnp.sqrt(bre * bre + bim * bim)
        amp_x = jnp.sqrt(xre * xre + xim * xim)
        return jnp.max(jnp.abs(amp_b - amp_x) / (jnp.abs(amp_x) + 1e-6))

    @jax.jit
    def grad_parity(d, b, wr, wi, hr, hi):
        gd_b, gb_b = grad_fn("blocked")(d, b, wr, wi, hr, hi)
        gd_x, gb_x = grad_fn(False)(d, b, wr, wi, hr, hi)
        rel = lambda a, r: jnp.max(jnp.abs(a - r)) / (jnp.max(jnp.abs(r))
                                                      + 1e-30)
        return jnp.maximum(rel(gd_b, gd_x), rel(gb_b, gb_x))

    t0 = time.time()
    max_rel = float(parity(delta, beta, w_re, w_im, hs_r, hs_i))
    print("parity", size, max_rel, round(time.time() - t0, 1), "s",
          flush=True)
    grad_rel = None
    if not fwd_only:
        t0 = time.time()
        grad_rel = float(grad_parity(delta, beta, w_re, w_im, hs_r, hs_i))
        print("grad parity", size, grad_rel, round(time.time() - t0, 1),
              "s", flush=True)

    prec = os.environ.get("BDT_DFT_PRECISION", "highest").lower()
    passes = {"highest": 6, "high": 3, "default": 1}[prec]
    alg_flops = 3072.0 * size * size  # per slice, fwd

    def mfu(slices_per_sec, fwd_bwd):
        ex = slices_per_sec * alg_flops * (3 if fwd_bwd else 1) * passes
        return round(100.0 * ex / 197e12, 1)

    out = {
        "size": size, "nz": nz,
        "blocked_vs_xla_max_rel_amp": max_rel,
        "blocked_vs_xla_grad_max_rel": grad_rel,
        "xla_split_fwd_slices_per_sec":
            run_one(timed_factory(xla_call), "xla"),
        "blocked_pallas_fwd_slices_per_sec":
            run_one(timed_factory(blocked_call), "blocked"),
    }
    if not fwd_only:
        out["xla_invertible_train_slices_per_sec"] = \
            run_one(grad_timed_factory(False), "xla-train")
        out["blocked_pallas_train_slices_per_sec"] = \
            run_one(grad_timed_factory("blocked"), "blocked-train")
    out["xla_split_fwd_mfu_pct"] = mfu(
        out["xla_split_fwd_slices_per_sec"], False)
    out["blocked_pallas_fwd_mfu_pct"] = mfu(
        out["blocked_pallas_fwd_slices_per_sec"], False)
    if not fwd_only:
        out["xla_invertible_train_mfu_pct"] = mfu(
            out["xla_invertible_train_slices_per_sec"], True)
        out["blocked_pallas_train_mfu_pct"] = mfu(
            out["blocked_pallas_train_slices_per_sec"], True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true", help="also run 4096^2")
    ap.add_argument("--only", type=int, default=None,
                    help="run ONE size (e.g. 8192 for the single-chip "
                         "plane-ceiling probe); writes scale_<size>.json")
    ap.add_argument("--fwd-only", action="store_true",
                    help="skip the grad-parity and train rows (at 16384^2 "
                         "two grad sets + inputs alone exceed HBM)")
    a = ap.parse_args()
    prec = os.environ.get("BDT_DFT_PRECISION", "highest").lower()
    out = {"metric": "beyond_vmem_plane_scale", "precision": prec}
    try:
        out["platform_version"] = \
            __import__("jax").devices()[0].client.platform_version
    except Exception:
        pass
    sizes = [(2048, 64, 5)] + ([(4096, 16, 3)] if a.big else [])
    fname = "benchmarks/scale_2048%s.json" % (
        "" if prec == "highest" else "_" + prec)
    if a.only:
        nz_iters = {2048: (64, 5), 4096: (16, 3), 8192: (4, 2),
                    16384: (2, 2)}
        sizes = [(a.only,) + nz_iters.get(a.only, (4, 2))]
        fname = "benchmarks/scale_%d.json" % a.only
    for size, nz, iters in sizes:
        out["%d" % size] = bench(size, nz, iters, fwd_only=a.fwd_only)
        print(size, json.dumps(out["%d" % size]), flush=True)
    with open(fname, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
