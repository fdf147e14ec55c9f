"""Generic closed-loop full-field artifact: simulate -> reconstruct -> FSC.

Runs ANY full-field preset end to end with its own hyperparameters
(ref reconstruct_fullfield.py:19-269) and scores the reconstruction
against the phantom with the 3-D FSC and the 1/2-bit criterion.
Complements the workload-specific scripts (closed_loop_adhesin.py,
closed_loop_cone_pp.py, closed_loop_2d.py) for the cone_256 /
cone_256_180 / cone_far / cone_noisy presets.

Usage: python -u benchmarks/closed_loop_fullfield.py --preset cone_256
           [--n-theta 500] [--out benchmarks/artifacts/<preset>]
"""

import argparse
import json
import os
import time

import numpy as np


def run(preset="cone_256", n_theta=None, n_epochs=None, out=None, seed=0,
        support_mask=None, auto_epochs=False, final_epochs=None,
        reg_scale=None, n_photons=None, sim_cache=None, precision=None,
        precision_polish_epochs=None):
    from beyond_dof_tpu.configs.presets import FULLFIELD_PRESETS, make_phantom
    from beyond_dof_tpu.sim.acquire import (create_fullfield_data,
                                            add_poisson_noise_fullfield)
    from beyond_dof_tpu.recon.fullfield import reconstruct_fullfield
    from beyond_dof_tpu.ops.quality import (fourier_shell_correlation,
                                            half_bit_threshold)
    from beyond_dof_tpu.utils.plots import plot_fsc

    out = out or "benchmarks/artifacts/%s" % preset
    os.makedirs(out, exist_ok=True)
    p = FULLFIELD_PRESETS[preset]
    gd, gb = make_phantom(p["phantom"])

    mask = None
    if support_mask == "cone":
        # the truncated-cone envelope mask the reference workload hand-tunes
        # (ref create_support_mask.py:10-20) — essential in the far-field
        # preset, whose Fourier-magnitude loss cannot see a Y-translation
        # of the object (see benchmarks/diag_cone_far.py)
        from beyond_dof_tpu.models.phantom import cone_support_mask
        mask = cone_support_mask(gd.shape[0])

    sim = dict(p["simulate"])
    preset_photons = sim.pop("n_photons_total", None)
    # --n-photons overrides the preset budget (the reference's own
    # dose-fraction sweep, ref create_noisy_data.py:20 n_ph_tx in
    # {1.75e6, 1.75e7, 1.75e8}); the cache stores NOISELESS data so one
    # simulation serves every dose
    if n_photons is None:
        n_photons = preset_photons
    if n_theta:
        sim["n_theta"] = n_theta
    t0 = time.time()
    cache = sim_cache or os.path.join(out,
                                      "sim_cache_%d.npy" % sim.get("n_theta", 0))
    if os.path.exists(cache):
        data = np.load(cache)
        print("sim cache hit: %s" % cache, flush=True)
    else:
        # 50 rotated 256^3 volume pairs don't fit 16 GB HBM; 10 do.
        # At 512^3 even 10 pairs are 10.7 GB before transients; use 4.
        n = gd.shape[0]
        batch_size = 50 if n <= 128 else (10 if n <= 256 else 4)
        data = create_fullfield_data(gd, gb, batch_size=batch_size, **sim)
        np.save(cache, np.asarray(data))
    mean_snr = None
    if n_photons:
        n_sample_pixel = int(np.count_nonzero(gd > 1e-10))
        data, mean_snr = add_poisson_noise_fullfield(
            np.asarray(data), n_photons, n_sample_pixel)
        print("Average SNR is {}.".format(mean_snr), flush=True)
    t_sim = time.time() - t0

    rec = dict(p["reconstruct"])
    if n_epochs is not None:
        rec["n_epochs"] = n_epochs
    rec.update(output_folder=out, save_outputs=True, verbose=True, seed=seed)
    if auto_epochs:
        # run every level to the reference convergence criterion
        # (n_epochs='auto', crit_conv_rate default; ref fullfield.py:570-594)
        rec.update(n_epochs="auto", n_epoch_final_pass=None)
    if final_epochs is not None:
        # quality-ceiling probe: extend only the full-resolution pass
        rec["n_epoch_final_pass"] = final_epochs
    if reg_scale is not None:
        # regularizer-ceiling probe (the reference's own alpha-sweep
        # methodology, ref plot_loss_terms.py / loss.txt)
        for k in ("alpha_d", "alpha_b", "gamma"):
            if rec.get(k):
                rec[k] = rec[k] * reg_scale
    if mask is not None:
        rec["finite_support_mask"] = mask
    if precision is not None:
        # 'auto' = the mixed-precision multiscale schedule (bf16x3 descent,
        # HIGHEST polish on the last precision_polish_epochs of ds1)
        rec["precision"] = precision
        if precision_polish_epochs is not None:
            rec["precision_polish_epochs"] = precision_polish_epochs
    t0 = time.time()
    d, b, info = reconstruct_fullfield(data=data, **rec)
    t_rec = time.time() - t0

    radii, fsc = fourier_shell_correlation(d, gd)
    fsc = np.asarray(fsc)[: len(radii)]
    thr = half_bit_threshold(radii, d.shape)
    above = fsc > thr
    cross = int(np.argmin(above)) if not above.all() else len(radii)
    plot_fsc(d, gd, save_path=os.path.join(out, "fsc"))
    np.save(os.path.join(out, "fsc", "half_bit_threshold.npy"), thr)

    result = {
        "metric": "%s_fsc_half_bit_fraction" % preset,
        "value": float(above.mean()),
        "unit": "fraction of shells above 1/2-bit",
        "resolution_frac_nyquist": float(radii[min(cross, len(radii) - 1)]
                                         / radii[-1]),
        "n_theta": sim.get("n_theta"), "sim_seconds": round(t_sim, 1),
        "n_photons_total": n_photons,
        "mean_snr": None if mean_snr is None else float(mean_snr),
        "recon_seconds": round(t_rec, 1),
        "precision": precision,
        "final_loss": float(info["loss"][-1]),
        "loss_first_last_per_level": {
            str(k): [float(v["loss"][0]), float(v["loss"][-1])]
            for k, v in info.get("per_level", {}).items() if v.get("loss")},
        "out": out,
    }
    with open(os.path.join(out, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="cone_256")
    ap.add_argument("--n-theta", type=int, default=None)
    ap.add_argument("--n-epochs", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--support-mask", default=None, choices=[None, "cone"],
                    help="analytic finite-support mask (ref "
                         "create_support_mask.py workflow)")
    ap.add_argument("--auto-epochs", action="store_true",
                    help="n_epochs='auto' at every level (reference "
                         "crit_conv_rate stopping)")
    ap.add_argument("--final-epochs", type=int, default=None,
                    help="override n_epoch_final_pass (quality-ceiling probe)")
    ap.add_argument("--reg-scale", type=float, default=None,
                    help="scale alpha_d/alpha_b/gamma (regularizer-ceiling probe)")
    ap.add_argument("--n-photons", type=float, default=None,
                    help="override the preset photon budget (dose sweep, "
                         "ref create_noisy_data.py:20)")
    ap.add_argument("--sim-cache", default=None,
                    help="path of the noiseless sim cache to share across "
                         "dose-sweep runs")
    ap.add_argument("--precision", default=None,
                    choices=[None, "highest", "high", "auto"],
                    help="DFT precision; 'auto' = mixed multiscale schedule")
    ap.add_argument("--polish-epochs", type=int, default=None,
                    help="HIGHEST polish epochs at ds1 under --precision auto")
    a = ap.parse_args()
    print(json.dumps(run(a.preset, a.n_theta, a.n_epochs, a.out,
                         support_mask=a.support_mask,
                         auto_epochs=a.auto_epochs,
                         final_epochs=a.final_epochs,
                         reg_scale=a.reg_scale, n_photons=a.n_photons,
                         sim_cache=a.sim_cache, precision=a.precision,
                         precision_polish_epochs=a.polish_epochs)),
          flush=True)
