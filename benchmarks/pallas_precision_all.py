"""Fused Pallas kernel HIGHEST vs manual-bf16x3 HIGH at 256^2 and 512^2.

Companion to pallas_precision_1024.py (which recorded the 1024^2 rows):
completes the fused-kernel precision matrix so every MFU-table size has a
fused HIGH/HIGHEST measurement.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u
           benchmarks/pallas_precision_all.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pallas_bench import build_inputs, make_timed  # noqa: E402


def bench_size(size, nz, iters):
    import jax.numpy as jnp
    from beyond_dof_tpu.ops import pallas_kernels as pk
    from beyond_dof_tpu.ops import splitfft
    from beyond_dof_tpu.ops.multislice import multislice_propagate_batch_split

    args = build_inputs(size, nz, 1)
    delta, beta, w_re, w_im, hr, hi, k = args

    splitfft.set_precision("HIGHEST")
    ref_re, ref_im = multislice_propagate_batch_split(
        jnp.moveaxis(delta, 0, -1)[0][None], jnp.moveaxis(beta, 0, -1)[0][None],
        w_re, w_im, 5000.0, 1e-7, propagate_last=True, remat=False,
        use_pallas=False)
    ref_amp = np.sqrt(np.asarray(ref_re) ** 2 + np.asarray(ref_im) ** 2)

    rows = {}
    for prec in ("HIGHEST", "HIGH"):
        pk.set_kernel_precision(prec)
        re, im = pk.multislice_pallas_invertible(
            delta, beta, w_re, w_im, hr, hi, k, False)
        amp = np.sqrt(np.asarray(re) ** 2 + np.asarray(im) ** 2)
        max_rel = float(np.max(np.abs(amp - ref_amp) / (np.abs(ref_amp) + 1e-6)))
        row = {"max_rel_amp_err_vs_xla_highest": max_rel}
        for mode in ("fwd", "grad"):
            # enough iterations that the differenced device time dwarfs
            # relay jitter (3 iters at 256^2 measured NEGATIVE)
            t1 = make_timed(mode, k, iters)
            t2 = make_timed(mode, k, 2 * iters)
            float(t1(*args[:-1])); float(t2(*args[:-1]))
            best = float("inf")
            for _ in range(3):
                t0 = time.time(); float(t1(*args[:-1])); d1 = time.time() - t0
                t0 = time.time(); float(t2(*args[:-1])); d2 = time.time() - t0
                best = min(best, (d2 - d1) / iters)
            row["%s_slices_per_sec" % mode] = round(nz / best, 1)
        rows[prec] = row
        print(size, prec, json.dumps(row), flush=True)
    pk.set_kernel_precision("HIGHEST")
    return rows


def main():
    out = {"metric": "pallas_precision_all"}
    try:
        out["platform_version"] = __import__("jax").devices()[0].client.platform_version
    except Exception:
        pass
    for size, nz, iters in ((256, 256, 40), (512, 256, 10)):
        out["%d" % size] = bench_size(size, nz, iters)
    with open("benchmarks/pallas_precision_all.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
