"""Multislice propagation throughput benchmark (the headline metric).

Measures slices/sec/chip for the FFT multislice propagator at a given volume
size (BASELINE.md: "256^3/1024^3 multislice slices/sec/chip"), and compares
against a single-threaded NumPy FFT implementation of the same physics —
the reference's compute path is NumPy/TF1-CPU (every reference preset sets
``cpu_only=True``), so that is the honest baseline on record.
"""

import time

import numpy as np


def _numpy_baseline_slices_per_sec(size, n_probe=8):
    """Time the reference-equivalent NumPy multislice step per slice."""
    from beyond_dof_tpu.ops.fresnel import get_kernel
    rng = np.random.RandomState(0)
    psize_cm = 1e-7
    voxel_nm = np.array([psize_cm] * 3) * 1e7
    lmbda_nm = 1240. / 5000
    h = get_kernel(voxel_nm[-1], lmbda_nm, voxel_nm, (size, size)).astype(np.complex64)
    w = (rng.rand(size, size) + 1j * rng.rand(size, size)).astype(np.complex64)
    delta = rng.rand(size, size).astype(np.float32) * 1e-7
    beta = rng.rand(size, size).astype(np.float32) * 1e-8
    k = np.float32(2 * np.pi * voxel_nm[-1] / lmbda_nm)
    # warmup
    w = w * np.exp(1j * k * delta - k * beta)
    w = np.fft.ifft2(np.fft.ifftshift(np.fft.fftshift(np.fft.fft2(w)) * h))
    t0 = time.perf_counter()
    for _ in range(n_probe):
        w = w * np.exp(1j * k * delta - k * beta)
        w = np.fft.ifft2(np.fft.ifftshift(np.fft.fftshift(np.fft.fft2(w)) * h))
    dt = (time.perf_counter() - t0) / n_probe
    return 1.0 / dt


def run_benchmark(size=256, n_slices=256, batch=1, n_iters=10, energy_ev=5000,
                  psize_cm=1e-7, force_split=False):
    """Returns the bench.py JSON payload for the multislice hot loop.

    Uses the complex64 FFT path when the backend supports it, otherwise the
    split-complex MXU matmul-DFT path (ops.splitfft) — some TPU runtime
    builds reject complex dtypes entirely.
    """
    import jax
    import jax.numpy as jnp
    from beyond_dof_tpu.ops.multislice import (multislice_propagate_batch,
                                               multislice_propagate_batch_split)
    from beyond_dof_tpu.ops.splitfft import complex_supported

    rng = np.random.RandomState(0)
    gd = (rng.rand(batch, size, size, n_slices) * 1e-7).astype(np.float32)
    gb = (rng.rand(batch, size, size, n_slices) * 1e-8).astype(np.float32)

    use_split = force_split or not complex_supported()
    # The fused radix-DIF Pallas kernel is the fastest validated path for
    # single square volumes at the radix sizes (1.8x the XLA split scan).
    use_pallas = (use_split and batch == 1 and size in (128, 256, 512)
                  and jax.default_backend() != "cpu")

    # Device-side repetition: one jit call runs the volume n_iters times in a
    # fori_loop (output feeds the next probe), one scalar fetch synchronizes.
    # Robust under RPC-dispatched backends where per-call timing is unreliable.
    if use_pallas:
        from beyond_dof_tpu.ops.pallas_kernels import multislice_pallas_split

        def repeated(gd, gb, w0, n):
            def body(_, w):
                re, im = multislice_pallas_split(
                    gd[0], gb[0], w[0], w[1], energy_ev, psize_cm,
                    interpret=False, radix=True)
                return jnp.stack([re, im])
            w = jax.lax.fori_loop(0, n, body, w0)
            return jnp.sum(w[0] ** 2 + w[1] ** 2)

        pr = jnp.asarray(np.stack([np.ones((size, size), np.float32),
                                   np.zeros((size, size), np.float32)]))
    elif use_split:
        def repeated(gd, gb, w0, n):
            def body(_, w):
                re, im = multislice_propagate_batch_split(
                    gd, gb, w[0], w[1], energy_ev, psize_cm, remat=False)
                return jnp.stack([re, im])
            w = jax.lax.fori_loop(0, n, body, w0)
            return jnp.sum(w[0] ** 2 + w[1] ** 2)

        pr = jnp.asarray(np.stack([np.ones((batch, size, size), np.float32),
                                   np.zeros((batch, size, size), np.float32)]))
    else:
        def repeated(gd, gb, w0, n):
            def body(_, w):
                return multislice_propagate_batch(gd, gb, w, energy_ev,
                                                  psize_cm, remat=False)
            w = jax.lax.fori_loop(0, n, body, w0)
            return jnp.abs(w).sum()

        pr = jnp.asarray(np.ones((batch, size, size), np.complex64))

    fn = jax.jit(repeated, static_argnums=3)
    gd_d = jnp.asarray(gd)
    gb_d = jnp.asarray(gb)
    # RPC-dispatched backends add O(seconds) noisy per-call overhead; run
    # enough device-side volumes that compute dominates, difference against a
    # 1-volume call, and take the min of several measurements.
    n_iters = max(n_iters, 300)
    for n in (1, 1 + n_iters):
        _ = float(fn(gd_d, gb_d, pr, n))  # compile + warm up

    def best_time(n, k=6):
        best = float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            _ = float(fn(gd_d, gb_d, pr, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_base = best_time(1)
    t_full = best_time(1 + n_iters)
    dt = max(t_full - t_base, 1e-9) / n_iters

    slices_per_sec = batch * n_slices / dt
    baseline = _numpy_baseline_slices_per_sec(size)
    return {
        "metric": "multislice_%d_slices_per_sec_per_chip" % size,
        "value": round(slices_per_sec, 2),
        "unit": "slices/s",
        "vs_baseline": round(slices_per_sec / baseline, 2),
        "detail": {
            "size": size, "n_slices": n_slices, "batch": batch,
            "seconds_per_volume": dt,
            "numpy_baseline_slices_per_sec": round(baseline, 2),
            "device": str(jax.devices()[0]),
            "path": ("pallas_radix_fused" if use_pallas
                     else "split_matmul_dft" if use_split else "complex_fft"),
        },
    }


if __name__ == "__main__":
    import json
    print(json.dumps(run_benchmark()))
