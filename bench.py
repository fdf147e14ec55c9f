#!/usr/bin/env python
"""Headline benchmark entry point.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Primary metric: 256^3 multislice propagation throughput (slices/sec/chip) on
the current accelerator, vs the reference's compute path (single-thread NumPy
FFT multislice — every reference preset runs ``cpu_only=True``).

Extra fields on the same line record the TRAINING number — fwd+bwd
(value_and_grad) slices/s through the invertible fused Pallas backward —
since the framework's point is gradient-based reconstruction (the reference's
hot loop is the gradient graph of tensorflow_recon/util.py:465-483).
"""

import json
import sys


def main():
    sys.path.insert(0, ".")
    import os
    from benchmarks.multislice_bench import run_benchmark
    result = run_benchmark(size=256, n_slices=256, batch=1, n_iters=10)
    out = {k: result[k] for k in ("metric", "value", "unit", "vs_baseline")}
    # self-describing row: precision mode + fraction-of-peak, so an
    # environment drift is distinguishable from a regression without
    # archaeology (BASELINE.md flop model: 3072*N^2 algorithmic FLOPs per
    # slice; executed bf16 MXU passes per f32 matmul: HIGHEST=6, HIGH=3,
    # DEFAULT=1; v5e peak 197 bf16 TFLOP/s; fwd+bwd = 3x fwd flops)
    prec = os.environ.get("BDT_DFT_PRECISION", "highest").lower()
    passes = {"highest": 6, "high": 3, "default": 1}.get(prec, 6)
    alg = 3072.0 * 256 * 256

    def mfu(slices_per_sec, fwd_bwd):
        ex = slices_per_sec * alg * (3 if fwd_bwd else 1) * passes
        return round(100.0 * ex / 197e12, 1)

    out["precision"] = prec
    out["mfu_pct"] = mfu(result["value"], False)
    try:
        from benchmarks.pallas_bench import run as pallas_run
        train = pallas_run(size=256, nz=256, batch=1, mode="grad", n_iters=5)
        out["train_metric"] = "multislice_fwd_bwd_slices_per_sec"
        out["train_value"] = round(train["value"], 1)
        out["train_unit"] = "slices/s (256^3 value_and_grad, invertible bwd)"
        out["train_mfu_pct"] = mfu(train["value"], True)
    except Exception as e:  # the primary metric must survive regardless
        out["train_error"] = repr(e)
    try:
        # record the environment with the row (an earlier 1024^2 record
        # proved irreproducible across a libtpu/relay change)
        import jax
        out["env"] = {
            "jax": jax.__version__,
            "platform": jax.devices()[0].platform,
            "platform_version":
                jax.devices()[0].client.platform_version.replace("\n", "; "),
        }
    except Exception:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
