"""Workload-scale closed-loop reconstruction quality artifact.

Runs the reference's adhesin workload end-to-end — 64^3 phantom, 500-angle
simulation, full-field AD reconstruction with the preset hyperparameters
(ref reconstruct_fullfield.py:19-47 params_adhesin) — then scores the
reconstruction against the phantom with the 3D FSC and the 1/2-bit
information criterion (the reference workflow's quality judge,
ref plot_fsc.py:11-14). Artifacts (fsc npy/pdf, convergence curves, epoch
times) land in ``benchmarks/artifacts/adhesin64/``.

Usage: python -u benchmarks/closed_loop_adhesin.py [--n-epochs 30]
           [--n-theta 500] [--out benchmarks/artifacts/adhesin64]
"""

import argparse
import json
import os
import time


def run(n_epochs=30, n_theta=500, out="benchmarks/artifacts/adhesin64",
        seed=0):
    import numpy as np
    from beyond_dof_tpu.models.phantom import adhesin_phantom
    from beyond_dof_tpu.sim.acquire import create_fullfield_data
    from beyond_dof_tpu.recon.fullfield import reconstruct_fullfield
    from beyond_dof_tpu.ops.quality import (fourier_shell_correlation,
                                            half_bit_threshold)
    from beyond_dof_tpu.utils.plots import plot_fsc
    from beyond_dof_tpu.configs.presets import FULLFIELD_PRESETS

    os.makedirs(out, exist_ok=True)
    preset = FULLFIELD_PRESETS["adhesin"]
    gd, gb = adhesin_phantom(64)

    t0 = time.time()
    data = create_fullfield_data(gd, gb, n_theta=n_theta, batch_size=50,
                                 **{k: v for k, v in preset["simulate"].items()
                                    if k != "n_theta"})
    t_sim = time.time() - t0

    rec = dict(preset["reconstruct"])
    rec.update(n_epochs=n_epochs, output_folder=out, save_outputs=True,
               verbose=True, seed=seed)
    t0 = time.time()
    d, b, info = reconstruct_fullfield(data=data, **rec)
    t_rec = time.time() - t0

    radii, fsc = fourier_shell_correlation(d, gd)
    fsc = np.asarray(fsc)[: len(radii)]
    thr = half_bit_threshold(radii, d.shape)
    above = fsc > thr
    # resolution = first crossing below the 1/2-bit curve (Nyquist units)
    cross = np.argmin(above) if not above.all() else len(radii)
    resolution_frac_nyquist = float(radii[min(cross, len(radii) - 1)]
                                    / radii[-1])
    plot_fsc(d, gd, save_path=os.path.join(out, "fsc"))
    np.save(os.path.join(out, "fsc", "half_bit_threshold.npy"), thr)

    result = {
        "metric": "adhesin64_fsc_half_bit_fraction",
        "value": float(above.mean()),
        "unit": "fraction of shells above 1/2-bit",
        "resolution_frac_nyquist": resolution_frac_nyquist,
        "n_theta": n_theta, "n_epochs": n_epochs,
        "sim_seconds": round(t_sim, 2),
        "recon_seconds": round(t_rec, 2),
        "recon_s_per_epoch": round(t_rec / n_epochs, 3),
        "final_loss": float(info["loss"][-1]),
        "out": out,
    }
    with open(os.path.join(out, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n-epochs", type=int, default=30)
    p.add_argument("--n-theta", type=int, default=500)
    p.add_argument("--out", default="benchmarks/artifacts/adhesin64")
    a = p.parse_args()
    print(json.dumps(run(a.n_epochs, a.n_theta, a.out)), flush=True)
