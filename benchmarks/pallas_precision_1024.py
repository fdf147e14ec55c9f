"""Fused Pallas kernel at 1024^2: HIGHEST vs HIGH (bf16x3) in-kernel matmuls.

VERDICT r3 item 4's untried lever: the fused kernel at 1024^2 measured
6.8k slices/s at HIGHEST (6 bf16 MXU passes per f32 matmul) — within 13%
of the XLA split path's 7.7k at HIGH (3 passes). This runs the SAME fused
kernel with its Karatsuba dots lowered at Precision.HIGH
(ops.pallas_kernels.set_kernel_precision) and records throughput + accuracy
against the XLA HIGHEST split path.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u
           benchmarks/pallas_precision_1024.py > benchmarks/pallas_prec.log
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pallas_bench import build_inputs, make_timed  # noqa: E402


def main(size=1024, nz=128, iters=3):
    import jax.numpy as jnp
    from beyond_dof_tpu.ops import pallas_kernels as pk
    from beyond_dof_tpu.ops import splitfft
    from beyond_dof_tpu.ops.multislice import multislice_propagate_batch_split

    args = build_inputs(size, nz, 1)
    delta, beta, w_re, w_im, hr, hi, k = args

    # reference output: XLA split path at HIGHEST (the 1e-6 parity anchor)
    splitfft.set_precision("HIGHEST")
    ref_re, ref_im = multislice_propagate_batch_split(
        jnp.moveaxis(delta, 0, -1)[0][None], jnp.moveaxis(beta, 0, -1)[0][None],
        w_re, w_im, 5000.0, 1e-7, propagate_last=True, remat=False,
        use_pallas=False)
    ref_amp = np.sqrt(np.asarray(ref_re) ** 2 + np.asarray(ref_im) ** 2)

    out = {"metric": "pallas_precision_1024", "size": size, "nz": nz}
    try:
        out["platform_version"] = __import__("jax").devices()[0].client.platform_version
    except Exception:
        pass

    for prec in ("HIGHEST", "HIGH"):
        pk.set_kernel_precision(prec)

        # accuracy of one full sweep vs the XLA HIGHEST reference
        re, im = pk.multislice_pallas_invertible(
            delta, beta, w_re, w_im, hr, hi, k, False)
        amp = np.sqrt(np.asarray(re) ** 2 + np.asarray(im) ** 2)
        max_rel = float(np.max(np.abs(amp - ref_amp) / (np.abs(ref_amp) + 1e-6)))

        row = {"max_rel_amp_err_vs_xla_highest": max_rel}
        for mode in ("fwd", "grad"):
            t1 = make_timed(mode, k, iters)
            t2 = make_timed(mode, k, 2 * iters)
            float(t1(*args[:-1])); float(t2(*args[:-1]))
            best = float("inf")
            for _ in range(3):
                t0 = time.time(); float(t1(*args[:-1])); d1 = time.time() - t0
                t0 = time.time(); float(t2(*args[:-1])); d2 = time.time() - t0
                best = min(best, (d2 - d1) / iters)
            row["%s_slices_per_sec" % mode] = round(nz / best, 1)
        out[prec] = row
        print(prec, json.dumps(row), flush=True)

    pk.set_kernel_precision("HIGHEST")
    with open("benchmarks/pallas_precision_1024.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
