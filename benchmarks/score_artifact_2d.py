"""Post-hoc FRC scoring of a saved single-slice full-field artifact.

closed_loop_fullfield.py used to crash AFTER the reconstruction finished on
(Y, X, 1) objects (empty FSC shell sampling — fixed in ops/quality.py by the
degenerate-axis FRC dispatch); the reconstruction TIFFs were already on disk.
This reloads them, regenerates the preset phantom, and writes the result.json
the closed loop would have written, with timings recovered from the run log.

Usage: python -u benchmarks/score_artifact_2d.py --preset 2d_cell_2048 \
           --artifact benchmarks/artifacts/cell_2d_2048 \
           [--log benchmarks/logs_r5/cell_2d_2048.log]
"""

import argparse
import json
import os
import re


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", required=True)
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--log", default=None)
    a = ap.parse_args()

    import jax
    # scoring is host-side analysis; never contend for the chip
    # (JAX_PLATFORMS env alone is ignored on this host — config required)
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from beyond_dof_tpu.configs.presets import FULLFIELD_PRESETS, make_phantom
    from beyond_dof_tpu.io.tiff import read_tiff
    from beyond_dof_tpu.ops.quality import (fourier_shell_correlation,
                                            half_bit_threshold)
    from beyond_dof_tpu.utils.plots import plot_fsc

    p = FULLFIELD_PRESETS[a.preset]
    gd, gb = make_phantom(p["phantom"])
    d = np.asarray(read_tiff(os.path.join(a.artifact, "delta_ds_1.tiff")),
                   np.float32)
    d = d.reshape(gd.shape)

    radii, fsc = fourier_shell_correlation(d, gd)
    fsc = np.asarray(fsc)[: len(radii)]
    thr = half_bit_threshold(radii, (gd.shape[0], gd.shape[1]))
    above = fsc > thr
    cross = int(np.argmin(above)) if not above.all() else len(radii)
    plot_fsc(d, gd, save_path=os.path.join(a.artifact, "fsc"))
    np.save(os.path.join(a.artifact, "fsc", "half_bit_threshold.npy"), thr)

    final_loss = epoch_s = recon_s = None
    if a.log and os.path.exists(a.log):
        txt = open(a.log).read()
        losses = re.findall(r"Iteration \d+; loss = ([0-9.e+-]+);", txt)
        times = re.findall(r"time = ([0-9.e+-]+) s", txt)
        total = re.findall(r"Total time: ([0-9.]+)", txt)
        if losses:
            final_loss = float(losses[-1])
        if len(times) > 1:
            epoch_s = float(np.median([float(t) for t in times[1:]]))
        if total:
            recon_s = float(total[-1])

    result = {
        "metric": "%s_fsc_half_bit_fraction" % a.preset,
        "value": float(above.mean()),
        "unit": "fraction of shells above 1/2-bit",
        "resolution_frac_nyquist": float(radii[min(cross, len(radii) - 1)]
                                         / radii[-1]),
        "n_theta": p["simulate"].get("n_theta"),
        "recon_seconds": recon_s,
        "epoch_seconds_median": epoch_s,
        "final_loss": final_loss,
        "scored_post_hoc": "benchmarks/score_artifact_2d.py (recon TIFFs "
                           "from the original run; FSC stage re-run after "
                           "the degenerate-axis fix)",
        "out": a.artifact,
    }
    with open(os.path.join(a.artifact, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
