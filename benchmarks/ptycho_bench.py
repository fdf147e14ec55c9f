"""Ptychography engine benchmark at the reference workload scale.

The reference's de-facto ptycho benchmark config is params_cone
(ref tensorflow_recon/reconstruct_ptycho.py:44-77): 23x23 = 529 probe
positions, 72^2 probe, 256^3 object, 500 angles downsampled 5x. Step cost
does not depend on data content, so random magnitudes stand in for
simulated diffraction patterns; this measures real engine epochs
(patch extraction + multislice fwd/bwd + Adam) on the chip.

Usage: python -u benchmarks/ptycho_bench.py [--n-theta 100] [--minibatch 64]
           [--epochs 2] [--size 256]
"""

import argparse
import json
import time


def run(n_theta=100, minibatch=64, epochs=2, size=256, probe=72, grid=23,
        seed=0):
    import numpy as np
    from beyond_dof_tpu.recon.ptycho import reconstruct_ptychography

    rng = np.random.RandomState(seed)
    step = (size - probe) // (grid - 1) if grid > 1 else 1
    probe_pos = [(y, x) for y in np.arange(grid) * step
                 for x in np.arange(grid) * step]
    data = rng.rand(n_theta, len(probe_pos), probe, probe).astype(np.float32)

    times = []
    t_mark = [time.perf_counter()]

    def probe_log(*a, **k):
        msg = " ".join(str(x) for x in a)
        if msg.startswith("Epoch") or msg.startswith("Iteration"):
            now = time.perf_counter()
            times.append(now - t_mark[0])
            t_mark[0] = now

    import beyond_dof_tpu.recon.ptycho as pt
    orig = pt.print_flush
    pt.print_flush = probe_log
    try:
        reconstruct_ptychography(
            probe_pos=np.array(probe_pos), probe_size=(probe, probe),
            obj_size=(size, size, size), data=data, theta_end=2 * np.pi,
            n_epochs=epochs, alpha_d=1e-9, alpha_b=1e-10, gamma=1e-9,
            learning_rate=1e-7, energy_ev=5000, psize_cm=1e-7,
            minibatch_size=minibatch, n_dp_batch=20, probe_type="gaussian",
            probe_mag_sigma=6, probe_phase_sigma=6, probe_phase_max=0.5,
            multiscale_level=1, save_outputs=False, verbose=True, seed=0)
    finally:
        pt.print_flush = orig

    steady = times[1:] if len(times) > 1 else times
    per_epoch = float(np.median(steady)) if steady else float("nan")
    return {"metric": "ptycho_cone_epoch_seconds", "value": per_epoch,
            "unit": "s/epoch", "n_theta": n_theta, "n_pos": len(probe_pos),
            "probe": probe, "size": size, "minibatch": minibatch,
            "epoch_times": [round(t, 3) for t in times]}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n-theta", type=int, default=100)
    p.add_argument("--minibatch", type=int, default=64)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--size", type=int, default=256)
    a = p.parse_args()
    print(json.dumps(run(a.n_theta, a.minibatch, a.epochs, a.size)),
          flush=True)
