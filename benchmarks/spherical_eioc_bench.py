"""Retry epoch_in_one_call for the spherical (point-probe) forward.

Round 2 excluded the spherical forward from the epoch-in-one-call device
scan because chaining every minibatch of an epoch into one program crashed
the TPU worker during compilation — at a time when the step still contained
the gather-based resample (plan tables baked in, ~5 min compiles). The
separable resample (five banded-matmul einsums, geometry computed on device)
made the step program small; this bench re-tests the scan and records
epoch times for both dispatch modes on the cone_pp 256^3 workload
(ref reconstruct_fullfield.py:238-269).

Usage: PYTHONPATH=. python -u benchmarks/spherical_eioc_bench.py
           [--n-epochs 3] [--n-theta 500] [--size 256]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "benchmarks/spherical_eioc.json"
CACHE = "benchmarks/artifacts/cone_pp_256/sim_cache_%d_%d.npy"


def run_mode(data, rec, eioc):
    import beyond_dof_tpu.recon.fullfield as ff
    from beyond_dof_tpu.recon.fullfield import reconstruct_fullfield

    epoch_times = []
    t_mark = [time.time()]
    orig = ff.print_flush

    def probe_log(*a, **k):
        msg = " ".join(str(x) for x in a)
        if msg.startswith("Iteration"):
            now = time.time()
            epoch_times.append(round(now - t_mark[0], 3))
            t_mark[0] = now
        orig(*a, **k)

    ff.print_flush = probe_log
    try:
        t_mark[0] = time.time()
        d, b, info = reconstruct_fullfield(
            data=data, epoch_in_one_call=eioc, **rec)
    finally:
        ff.print_flush = orig
    return epoch_times, [float(x) for x in info["loss"]]


def main(n_epochs=3, n_theta=500, size=256):
    from beyond_dof_tpu.configs.presets import FULLFIELD_PRESETS

    cache = CACHE % (size, n_theta)
    if not os.path.exists(cache):
        raise SystemExit("no sim cache at %s — run closed_loop_cone_pp first"
                         % cache)
    data = np.load(cache)

    rec = dict(FULLFIELD_PRESETS["cone_pp"]["reconstruct"])
    rec.update(n_epochs=n_epochs, multiscale_level=1, n_epoch_final_pass=None,
               save_outputs=False, verbose=True, seed=0, shrink_cycle=None,
               output_folder="benchmarks/artifacts/cone_pp_256/eioc_tmp")

    t_scan, loss_scan = run_mode(data, rec, True)
    t_loop, loss_loop = run_mode(data, rec, False)

    result = {
        "metric": "spherical_epoch_in_one_call_epoch_seconds",
        "value": float(np.median(t_scan[1:] or t_scan)),
        "unit": "s/epoch (device scan; first epoch includes compile)",
        "per_minibatch_dispatch_s_per_epoch": float(np.median(t_loop[1:]
                                                              or t_loop)),
        "epoch_times_scan": t_scan, "epoch_times_loop": t_loop,
        "loss_scan": loss_scan, "loss_loop": loss_loop,
        "n_theta": n_theta, "size": size, "n_epochs": n_epochs,
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-epochs", type=int, default=3)
    ap.add_argument("--n-theta", type=int, default=500)
    ap.add_argument("--size", type=int, default=256)
    a = ap.parse_args()
    main(a.n_epochs, a.n_theta, a.size)
