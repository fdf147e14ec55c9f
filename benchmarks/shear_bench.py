"""3-shear rotation benchmark across MXU precision modes.

The shear einsums multiply the FIELD (f32 data) by BANDED INTERPOLATION
WEIGHTS. The weights are coarse by construction (per-shear linear
interpolation), so a per-operand precision — data split into two bf16
passes, weights plain bf16 — should approach 3x on the matmul side of the
rotation versus HIGHEST's 6 passes, with the geometric error bounded by
weight rounding (< 2^-8 of a pixel). This script measures wall time
(device-side fori_loop differencing, axon-relay rules) and the actual
numerical deviation from the HIGHEST path for both the rotation output and
its gradient.

Usage: python -u benchmarks/shear_bench.py [--size 256] [--batch 10]
"""

import argparse
import json
import time

import numpy as np

SPECS = [
    ("highest", "HIGHEST"),
    ("high", "HIGH"),
    ("high_default", ("HIGH", "DEFAULT")),
]


def run(size=256, batch=10, n_iters=5, seed=0):
    import jax
    import jax.numpy as jnp
    from beyond_dof_tpu.ops import rotate as R

    rng = np.random.RandomState(seed)
    vol_d = jnp.asarray(rng.rand(size, size, size).astype(np.float32))
    vol_b = jnp.asarray(rng.rand(size, size, size).astype(np.float32))
    thetas = jnp.asarray(
        rng.uniform(0, 2 * np.pi, batch).astype(np.float32))

    def make(n):
        @jax.jit
        def timed(d, b, th):
            def body(_, acc):
                def loss(dd, bb):
                    rot = jax.lax.map(
                        lambda t: R.rotate_pair_zfirst_shear3(dd, bb, t), th)
                    return jnp.mean(rot[0] ** 2) + jnp.mean(rot[1] ** 2)
                val, (gd, gb) = jax.value_and_grad(loss, argnums=(0, 1))(
                    d + acc * 0, b)
                return acc + val + jnp.mean(gd) + jnp.mean(gb)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return timed

    results = {}
    ref_out = ref_grad = None
    for name, spec in SPECS:
        R.set_shear_precision(spec)

        # fresh jit per mode: the precision is read at TRACE time, so a
        # shared cached trace would silently reuse the first mode's setting
        @jax.jit
        def fwd_one(d, b, th):
            return jax.lax.map(
                lambda t: R.rotate_pair_zfirst_shear3(d, b, t), th)

        t1, t2 = make(n_iters), make(2 * n_iters)
        float(t1(vol_d, vol_b, thetas))
        float(t2(vol_d, vol_b, thetas))
        s = time.perf_counter()
        float(t1(vol_d, vol_b, thetas))
        a = time.perf_counter() - s
        s = time.perf_counter()
        float(t2(vol_d, vol_b, thetas))
        bt = time.perf_counter() - s
        per_call = (bt - a) / n_iters
        out = np.asarray(fwd_one(vol_d, vol_b, thetas)[0])
        grad = np.asarray(jax.jit(jax.grad(
            lambda d: jnp.mean(fwd_one(d, vol_b, thetas)[0] ** 2)))(vol_d))
        if name == "highest":
            ref_out, ref_grad = out, grad
        err = float(np.abs(out - ref_out).max())
        gerr = float(np.abs(grad - ref_grad).max()
                     / max(np.abs(ref_grad).max(), 1e-30))
        results[name] = {"fwd_bwd_s": round(per_call, 4),
                         "max_abs_err_vs_highest": err,
                         "max_rel_grad_err": gerr}
        print(name, results[name], flush=True)
    R.set_shear_precision("HIGHEST")
    return {"metric": "shear_rotation_fwdbwd_seconds", "size": size,
            "batch": batch, "modes": results}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch", type=int, default=10)
    p.add_argument("--iters", type=int, default=5)
    a = p.parse_args()
    print(json.dumps(run(a.size, a.batch, a.iters)), flush=True)
