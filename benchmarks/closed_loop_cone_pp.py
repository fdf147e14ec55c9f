"""cone_pp (point-probe / cone-beam) workload at 256^3, end to end.

Simulates cone-beam data with the split-complex spherical propagator
(model-matched) and reconstructs with the engine's ``probe_type='point'``
path using the params_cone_pp hyperparameters
(ref reconstruct_fullfield.py:238-269). Records epoch times and FSC vs the
phantom into ``benchmarks/artifacts/cone_pp_256/``.

The spherical path is the reference's deprecated-but-shipped cone-beam mode
(ref util.py:582-641); this run is the workload-scale record VERDICT r1
item 9 asked for. Epoch count is an argument (default 3) — the point is the
on-chip epoch time and a finite, decreasing loss, not a converged volume.

Usage: python -u benchmarks/closed_loop_cone_pp.py [--n-epochs 3]
           [--n-theta 500] [--size 256]
"""

import argparse
import json
import os
import time

import numpy as np


def run(n_epochs=3, n_theta=500, size=256,
        out="benchmarks/artifacts/cone_pp_256", seed=0, no_reg=False,
        reg_scale=None):
    import jax.numpy as jnp
    from beyond_dof_tpu.constants import PI
    from beyond_dof_tpu.models.phantom import cone_foam_phantom
    from beyond_dof_tpu.models.fullfield import rotate_and_project_batch_split
    from beyond_dof_tpu.recon.fullfield import reconstruct_fullfield
    from beyond_dof_tpu.configs.presets import FULLFIELD_PRESETS

    os.makedirs(out, exist_ok=True)
    sph = dict(dist_to_source_cm=1e-4, det_psize_cm=3e-7,
               theta_max=PI / 15, phi_max=PI / 15)
    gd, gb = cone_foam_phantom(size)

    # ---- model-matched simulation through the split spherical forward ----
    import jax
    from beyond_dof_tpu.ops.spherical import build_spherical_plan
    t0 = time.time()
    theta_ls = -np.linspace(0, 2 * np.pi, n_theta).astype(np.float32)
    ones = jnp.ones((size, size), jnp.float32)
    zeros = jnp.zeros((size, size), jnp.float32)
    batch = 5
    # plan travels as a jit ARGUMENT: its resample coords + kernel stacks
    # are ~370 MB at 256^3 and would blow the remote-compile body cap as
    # baked constants
    plan = build_spherical_plan((size, size, size), 5000, 1e-7,
                                sph["dist_to_source_cm"],
                                det_psize_cm=sph["det_psize_cm"],
                                theta_max=sph["theta_max"],
                                phi_max=sph["phi_max"], free_prop_cm=1e-4)
    print("plan built t=%.1fs" % (time.time() - t0), flush=True)

    @jax.jit
    def fwd(d, b, th, plan):
        return rotate_and_project_batch_split(
            d, b, th, ones, zeros, 5000, 1e-7, free_prop_cm=1e-4,
            forward_algorithm="spherical", plan=plan, **sph)

    gd_d, gb_d = jnp.asarray(gd), jnp.asarray(gb)
    cache = os.path.join(out, "sim_cache_%d_%d.npy" % (size, n_theta))
    if os.path.exists(cache):
        data = np.load(cache)
        t_sim = 0.0
        print("sim cache hit: %s" % cache, flush=True)
    else:
        data = np.empty((n_theta, size, size), np.complex64)
        for i0 in range(0, n_theta, batch):
            th = jnp.asarray(theta_ls[i0:i0 + batch])
            re, im = fwd(gd_d, gb_d, th, plan)
            data[i0:i0 + th.shape[0]] = np.asarray(re) + 1j * np.asarray(im)
            if i0 % 100 == 0:
                print("sim %d/%d t=%.1fs" % (i0 + batch, n_theta,
                                             time.time() - t0), flush=True)
        t_sim = time.time() - t0
        np.save(cache, data)

    # ---- reconstruction: params_cone_pp hyperparameters ------------------
    rec = dict(FULLFIELD_PRESETS["cone_pp"]["reconstruct"])
    rec.update(n_epochs=n_epochs, multiscale_level=1, n_epoch_final_pass=None,
               output_folder=out, save_outputs=True, verbose=True, seed=seed,
               shrink_cycle=None)
    if no_reg:
        # diagnostic.json finding: at the preset's own alphas the regularizer
        # (2.77e-6 at init) dominates the data term (2.1e-7) 13x, so the
        # objective's global minimum is near the ZERO object — no optimizer
        # can recover the phantom. With alphas off, descent at the preset lr
        # reaches 3.5e-9 in 60 steps (engine exonerated). This run records
        # the recoverable-quality ceiling of the workload.
        rec.update(alpha_d=0, alpha_b=0, gamma=0)
    if reg_scale is not None:
        # normalized regularizers: the diagnostic measured the preset's reg
        # term 13x the data term at init (diagnostic.json) — scaling the
        # alphas by 1/13 balances the objective instead of removing it
        # (the middle ground between the preset floor and alpha=0 drift)
        for key in ("alpha_d", "alpha_b", "gamma"):
            if rec.get(key):
                rec[key] = rec[key] * reg_scale
    epoch_times = []
    t_mark = [time.time()]

    import beyond_dof_tpu.recon.fullfield as ff
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
        t0 = time.time()
        d, b, info = reconstruct_fullfield(data=data, **rec)
        t_rec = time.time() - t0
    finally:
        ff.print_flush = orig

    from beyond_dof_tpu.ops.quality import (fourier_shell_correlation,
                                            half_bit_threshold)
    radii, fsc = fourier_shell_correlation(d, gd)
    thr = half_bit_threshold(radii, d.shape)
    result = {
        "metric": "cone_pp_256_epoch_seconds",
        "value": float(np.median(epoch_times[1:] or epoch_times)),
        "unit": "s/epoch",
        "epoch_times": epoch_times, "sim_seconds": round(t_sim, 1),
        "recon_seconds": round(t_rec, 1), "n_theta": n_theta,
        "n_epochs": n_epochs, "final_loss": float(info["loss"][-1]),
        "loss": [float(x) for x in info["loss"]],
        "fsc_half_bit_fraction": float((np.asarray(fsc)[: len(radii)]
                                        > thr).mean()),
        "out": out,
    }
    with open(os.path.join(out, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n-epochs", type=int, default=3)
    p.add_argument("--n-theta", type=int, default=500)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--out", default="benchmarks/artifacts/cone_pp_256")
    p.add_argument("--no-reg", action="store_true")
    p.add_argument("--reg-scale", type=float, default=None,
                   help="scale the preset alphas (e.g. 0.077 = the "
                        "diagnostic's 13x imbalance normalized)")
    a = p.parse_args()
    print(json.dumps(run(a.n_epochs, a.n_theta, a.size, a.out,
                         no_reg=a.no_reg, reg_scale=a.reg_scale)),
          flush=True)
