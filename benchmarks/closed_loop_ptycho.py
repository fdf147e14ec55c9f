"""Closed-loop ptycho-tomography artifact: simulate -> reconstruct -> FSC.

Runs a PTYCHO_PRESETS workload end to end with its own hyperparameters
(ref reconstruct_ptycho.py:9-221) and scores the reconstruction against the
phantom with the 3-D FSC and the 1/2-bit criterion — the same
workload-quality record the full-field presets already carry
(ref plot_fsc.py:11-14 applies the same QA to ptycho reconstructions).
Also records per-epoch wall time, exercising the ptycho engine's
epoch-in-one-call device scan.

Usage: PYTHONPATH=. python -u benchmarks/closed_loop_ptycho.py
           [--preset adhesin_ptycho] [--n-theta 500] [--n-epochs N]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(preset="adhesin_ptycho", n_theta=None, n_epochs=None, out=None,
        seed=0, learning_rate=None, reg_scale=None, n_photons=None,
        sim_cache=None):
    from beyond_dof_tpu.configs.presets import PTYCHO_PRESETS, make_phantom
    from beyond_dof_tpu.sim.acquire import (create_ptychography_data,
                                            add_poisson_noise_ptycho)
    from beyond_dof_tpu.recon.ptycho import reconstruct_ptychography
    from beyond_dof_tpu.ops.quality import (fourier_shell_correlation,
                                            half_bit_threshold)
    from beyond_dof_tpu.utils.plots import plot_fsc

    out = out or "benchmarks/artifacts/%s" % preset
    os.makedirs(out, exist_ok=True)
    p = PTYCHO_PRESETS[preset]
    gd, gb = make_phantom(p["phantom"])
    probe_pos = np.asarray(p["probe_pos"], dtype=int)

    sim = dict(p["simulate"])
    # --n-photons overrides the preset budget (the reference's dose-
    # fraction-study regime, ref create_noisy_data.py:20); 0 = noiseless
    if n_photons is None:
        n_photons = sim.pop("n_photons_total", None)
    else:
        sim.pop("n_photons_total", None)
        n_photons = n_photons or None
    if n_theta:
        sim["n_theta"] = n_theta
    t0 = time.time()
    cache = sim_cache or os.path.join(out,
                                      "sim_cache_%d.npy" % sim.get("n_theta", 0))
    if os.path.exists(cache):
        data = np.load(cache)
        print("sim cache hit: %s" % cache, flush=True)
    else:
        data = create_ptychography_data(gd, gb, probe_pos=probe_pos, **sim)
        np.save(cache, np.asarray(data))
    if n_photons:
        n_sample_pixel = int(np.count_nonzero(gd > 1e-10))
        data, mean_snr = add_poisson_noise_ptycho(
            np.asarray(data), n_photons, n_sample_pixel, gd.shape)
        print("Average SNR is {}.".format(mean_snr), flush=True)
    else:
        mean_snr = None
    t_sim = time.time() - t0

    rec = dict(p["reconstruct"])
    if n_epochs is not None:
        rec["n_epochs"] = n_epochs
    if learning_rate is not None:
        rec["learning_rate"] = learning_rate
    if reg_scale is not None:
        # regularizer-ceiling probe (the reference's own alpha-sweep
        # methodology, ref plot_loss_terms.py / loss.txt) — the chain that
        # took full-field cone_256 from 49.6% -> 100% of FSC shells
        for k in ("alpha_d", "alpha_b", "gamma"):
            if rec.get(k):
                rec[k] = rec[k] * reg_scale
    rec.update(output_folder=out, save_outputs=True, verbose=True, seed=seed)

    # per-epoch wall times via the engine's own epoch log lines
    import beyond_dof_tpu.recon.ptycho as pt
    epoch_times = []
    t_mark = [time.time()]
    orig = pt.print_flush

    def probe_log(*a, **k):
        msg = " ".join(str(x) for x in a)
        if msg.startswith("Epoch"):
            now = time.time()
            epoch_times.append(round(now - t_mark[0], 3))
            t_mark[0] = now
        orig(*a, **k)

    pt.print_flush = probe_log
    try:
        t0 = time.time()
        d, b, info = reconstruct_ptychography(
            probe_pos=probe_pos, data=data, **rec)
        t_rec = time.time() - t0
    finally:
        pt.print_flush = orig

    flat = d.shape[-1] == 1
    if flat:
        # 2D (single-slice) presets are scored with the ring correlation
        # (ref util.py:1013-1048), not 3-D shells
        from beyond_dof_tpu.ops.quality import fourier_ring_correlation
        radii, fsc = fourier_ring_correlation(d[..., 0], gd[..., 0])
        thr = half_bit_threshold(radii, d[..., 0].shape)
    else:
        radii, fsc = fourier_shell_correlation(d, gd)
        thr = half_bit_threshold(radii, d.shape)
    fsc = np.asarray(fsc)[: len(radii)]
    above = fsc > thr
    cross = int(np.argmin(above)) if not above.all() else len(radii)
    plot_fsc(d[..., 0] if flat else d, gd[..., 0] if flat else gd,
             save_path=os.path.join(out, "fsc"), ring=flat)
    np.save(os.path.join(out, "fsc", "half_bit_threshold.npy"), thr)

    result = {
        "metric": "%s_fsc_half_bit_fraction" % preset,
        "value": float(above.mean()),
        "unit": "fraction of shells above 1/2-bit",
        "resolution_frac_nyquist": float(radii[min(cross, len(radii) - 1)]
                                         / radii[-1]),
        "n_theta": sim.get("n_theta"), "n_pos": int(len(probe_pos)),
        "n_photons_total": n_photons,
        "mean_snr": None if mean_snr is None else float(mean_snr),
        "sim_seconds": round(t_sim, 1), "recon_seconds": round(t_rec, 1),
        "epoch_seconds_median": float(np.median(epoch_times[1:]
                                                or epoch_times)),
        "epoch_times": epoch_times,
        "final_loss": float(info["loss"][-1]),
        "loss": [float(x) for x in info["loss"]],
        "out": out,
    }
    with open(os.path.join(out, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="adhesin_ptycho")
    ap.add_argument("--n-theta", type=int, default=None)
    ap.add_argument("--n-epochs", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--learning-rate", type=float, default=None)
    ap.add_argument("--reg-scale", type=float, default=None,
                    help="multiply the preset's alpha_d/alpha_b/gamma")
    ap.add_argument("--n-photons", type=float, default=None,
                    help="override the preset photon budget (0 = noiseless)")
    ap.add_argument("--sim-cache", default=None,
                    help="shared noiseless simulation cache path")
    a = ap.parse_args()
    print(json.dumps(run(a.preset, a.n_theta, a.n_epochs, a.out,
                         learning_rate=a.learning_rate,
                         reg_scale=a.reg_scale, n_photons=a.n_photons,
                         sim_cache=a.sim_cache)), flush=True)
