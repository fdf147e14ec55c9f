"""bf16x3 (Precision.HIGH) throughput/accuracy gate for large planes.

At 1024^2 both the fused Pallas kernel and the XLA split path are
MXU-pass-bound at HIGHEST precision (6 bf16 passes per f32 matmul; see
BASELINE.md). Precision.HIGH is the error-compensated bf16x3 decomposition
(hi*hi + hi*lo + lo*hi, dropping only the lo*lo term) — half the MXU
passes. This benchmark measures, per plane size:

  * fwd throughput of the XLA split multislice at HIGHEST vs HIGH;
  * accuracy of each against a float64 NumPy FFT reference after the full
    slice sweep (max relative amplitude error + RMS field error),

so the speed mode can be enabled (BDT_DFT_PRECISION=high) only when the
documented error is acceptable for the workload's slice count.

Timing follows the axon-relay rules: device-side fori_loop repetition,
differenced between two call lengths, arrays passed as jit args.

Usage: PYTHONPATH=. python -u benchmarks/precision_bench.py [--size 1024]
           [--nz 128] [--iters 5]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_volume(size, nz, seed=0):
    """Smooth phase-scale object (multiscale blobs, ~1e-7 delta)."""
    rng = np.random.RandomState(seed)
    small = rng.rand(nz, 1, size // 8, size // 8).astype(np.float32)
    reps = (1, 1, 8, 8)
    delta = np.tile(small, reps)[:, :, :size, :size] * 1e-7
    beta = delta * 0.06
    return delta.astype(np.float32), beta.astype(np.float32)


def numpy_reference(delta, beta, energy_ev=5000.0, psize_cm=1e-7):
    """float64 FFT multislice (the tests/reference_impl.py convention)."""
    from beyond_dof_tpu.constants import PI
    from beyond_dof_tpu.ops.fresnel import get_kernel
    nz, _, ny, nx = delta.shape
    voxel_nm = psize_cm * 1e7
    lmbda_nm = 1240.0 / energy_ev
    k = 2.0 * PI * voxel_nm / lmbda_nm
    h = np.asarray(get_kernel(voxel_nm, lmbda_nm, [voxel_nm] * 3,
                              (ny, nx))).astype(np.complex128)
    h = np.fft.ifftshift(h)
    w = np.ones((ny, nx), np.complex128)
    for z in range(nz):
        w = w * np.exp(1j * k * delta[z, 0] - k * beta[z, 0])
        w = np.fft.ifft2(np.fft.fft2(w) * h)
    return w


def run(size=1024, nz=128, iters=5):
    import jax
    import jax.numpy as jnp
    from beyond_dof_tpu.ops import splitfft
    from beyond_dof_tpu.ops.multislice import multislice_propagate_batch_split

    delta, beta = build_volume(size, nz)
    t0 = time.time()
    ref = numpy_reference(delta, beta)
    print("numpy f64 reference: %.0fs" % (time.time() - t0), flush=True)

    d_dev = jnp.asarray(delta)
    b_dev = jnp.asarray(beta)
    p_re = jnp.ones((1, size, size), jnp.float32)
    p_im = jnp.zeros((1, size, size), jnp.float32)

    results = {"metric": "bf16x3_gate_%d" % size, "size": size, "nz": nz}
    for prec in ("HIGHEST", "HIGH"):
        splitfft.set_precision(prec)

        def fwd(d, b, pr, pi):
            return multislice_propagate_batch_split(
                d, b, pr, pi, 5000, 1e-7, propagate_last=True, remat=False,
                grids_zfirst=True, use_pallas=False)

        def make_timed(n):
            @jax.jit
            def timed(d, b, pr, pi):
                def body(_, w):
                    re, im = fwd(d, b, w[0], w[1])
                    return jnp.stack([re, im])
                w = jax.lax.fori_loop(0, n, body, jnp.stack([pr, pi]))
                return jnp.sum(w[0] ** 2 + w[1] ** 2)
            return timed

        # accuracy: one volume vs the f64 reference
        re, im = jax.jit(fwd)(d_dev, b_dev, p_re, p_im)
        w = np.asarray(re)[0] + 1j * np.asarray(im)[0]
        amp_err = np.abs(np.abs(w) - np.abs(ref)) / np.abs(ref).max()
        rms = np.sqrt(np.mean(np.abs(w - ref) ** 2)) / np.abs(ref).max()

        t1, t2 = make_timed(iters), make_timed(2 * iters)
        float(t1(d_dev, b_dev, p_re, p_im))
        float(t2(d_dev, b_dev, p_re, p_im))
        t0 = time.time()
        float(t1(d_dev, b_dev, p_re, p_im))
        dt1 = time.time() - t0
        t0 = time.time()
        float(t2(d_dev, b_dev, p_re, p_im))
        dt2 = time.time() - t0
        per_vol = (dt2 - dt1) / iters
        results[prec] = {
            "slices_per_sec": round(nz / per_vol, 1),
            "s_per_volume": per_vol,
            "max_amp_err_rel": float(amp_err.max()),
            "rms_field_err_rel": float(rms),
        }
        print(prec, json.dumps(results[prec]), flush=True)
    splitfft.set_precision("HIGHEST")

    results["speedup_high_over_highest"] = round(
        results["HIGH"]["slices_per_sec"]
        / results["HIGHEST"]["slices_per_sec"], 3)
    with open("benchmarks/precision_gate_%d.json" % size, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--nz", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    a = ap.parse_args()
    run(a.size, a.nz, a.iters)
