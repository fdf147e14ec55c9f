"""Single-distance 2D workload (params_2d / params_2d_cell) end to end.

The reference's largest-plane full-field workload is the 1024^2
single-slice phase reconstruction (ref reconstruct_fullfield.py:160-206,
'2d_cell'): one in-line hologram at a single distance, phase-only object,
200 Adam epochs. This script simulates the hologram through the engine's
own forward, reconstructs with the preset hyperparameters, and scores the
recovered phase against the phantom slice with the 2-D FRC.

Usage: python -u benchmarks/closed_loop_2d.py [--preset 2d_cell]
           [--n-epochs 200] [--out benchmarks/artifacts/cell_2d]
"""

import argparse
import json
import os
import time

import numpy as np


def run(preset="2d_cell", n_epochs=None, out="benchmarks/artifacts/cell_2d",
        seed=0):
    from beyond_dof_tpu.configs.presets import FULLFIELD_PRESETS, make_phantom
    from beyond_dof_tpu.sim.acquire import create_fullfield_data
    from beyond_dof_tpu.recon.fullfield import reconstruct_fullfield
    from beyond_dof_tpu.ops.quality import (fourier_ring_correlation,
                                            half_bit_threshold)

    os.makedirs(out, exist_ok=True)
    p = FULLFIELD_PRESETS[preset]
    gd, gb = make_phantom(p["phantom"])

    t0 = time.time()
    data = create_fullfield_data(gd, gb, **p["simulate"])
    t_sim = time.time() - t0

    rec = dict(p["reconstruct"])
    if n_epochs is not None:
        rec["n_epochs"] = n_epochs
    rec.update(output_folder=out, save_outputs=True, verbose=True, seed=seed)

    epoch_times = []
    t_mark = [time.time()]
    import beyond_dof_tpu.recon.fullfield as ff
    orig = ff.print_flush

    def probe_log(*a, **k):
        msg = " ".join(str(x) for x in a)
        if msg.startswith("Iteration"):
            now = time.time()
            epoch_times.append(round(now - t_mark[0], 4))
            t_mark[0] = now
        orig(*a, **k)

    ff.print_flush = probe_log
    try:
        t0 = time.time()
        d, b, info = reconstruct_fullfield(data=data, **rec)
        t_rec = time.time() - t0
    finally:
        ff.print_flush = orig

    radii, frc = fourier_ring_correlation(d[:, :, 0], gd[:, :, 0])
    thr = half_bit_threshold(radii, d[:, :, 0].shape)
    frac = float((np.asarray(frc)[: len(radii)] > thr).mean())
    steady = epoch_times[1:] or epoch_times
    result = {
        "metric": "%s_epoch_seconds" % preset,
        "value": float(np.median(steady)),
        "unit": "s/epoch",
        "n_epochs": rec["n_epochs"], "sim_seconds": round(t_sim, 1),
        "recon_seconds": round(t_rec, 1),
        "final_loss": float(info["loss"][-1]),
        "first_loss": float(info["loss"][0]),
        "frc_half_bit_fraction": frac, "out": out,
    }
    with open(os.path.join(out, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="2d_cell")
    ap.add_argument("--n-epochs", type=int, default=None)
    ap.add_argument("--out", default="benchmarks/artifacts/cell_2d")
    a = ap.parse_args()
    print(json.dumps(run(a.preset, a.n_epochs, a.out)), flush=True)
