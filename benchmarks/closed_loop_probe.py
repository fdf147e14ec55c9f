"""Probe-retrieval closed loop: joint probe+object recovery quality.

The reference treats probe optimization as a first-class mode — its own
Adam/learning rate, a back-propagated initial guess, and an optional pupil
constraint (ref tensorflow_recon/fullfield.py:308-351,442-455,546-548,
util.py:1081-1091). This artifact demonstrates the mode actually *works*:
data are simulated with a known gaussian probe the reconstruction is NOT
told about, and the engine recovers probe and object jointly.

Three runs on the same simulated adhesin data:
  * ``plane-mismatch`` — reconstruct assuming the preset's plane probe
    (what you get if you ignore the illumination);
  * ``retrieved``      — probe_type='optimizable', initial guess
    back-propagated from the data (ref util.py:1081-1091), pupil
    constraint applied;
  * ``oracle``         — probe_type='fixed' with the TRUE probe (upper
    bound at this epoch budget).

Recorded per run: object FSC above 1/2-bit + resolution; for the
retrieved run, the probe recovery error after removing the global
complex-scale gauge (1 - |<p_hat, p>| / (|p_hat| |p|) residual).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u
           benchmarks/closed_loop_probe.py [--n-epochs 30]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRUE_PROBE = {"probe_mag_sigma": 24.0, "probe_phase_sigma": 24.0,
              "probe_phase_max": 0.5}


def fsc_stats(d, gd):
    from beyond_dof_tpu.ops.quality import (fourier_shell_correlation,
                                            half_bit_threshold)
    radii, fsc = fourier_shell_correlation(d, gd)
    fsc = np.asarray(fsc)[: len(radii)]
    thr = half_bit_threshold(radii, d.shape)
    above = fsc > thr
    cross = int(np.argmin(above)) if not above.all() else len(radii)
    return float(above.mean()), float(radii[min(cross, len(radii) - 1)]
                                      / radii[-1])


def probe_error(p_hat, p_true):
    """Relative residual after the optimal global complex scale.

    min_c ||c p_hat - p|| / ||p|| = sqrt(1 - |<p_hat, p>|^2 /
    (||p_hat||^2 ||p||^2)) — the complex-scale gauge (global phase and
    amplitude) is a true gauge of the bilinear probe-object model.
    """
    a = np.asarray(p_hat).ravel()
    b = np.asarray(p_true).ravel()
    corr = np.abs(np.vdot(a, b)) / (np.linalg.norm(a) * np.linalg.norm(b)
                                    + 1e-30)
    return float(np.sqrt(max(0.0, 1.0 - corr * corr)))


def run(n_epochs=30, n_theta=500, out="benchmarks/artifacts/probe_retrieval",
        seed=0):
    from beyond_dof_tpu.models.phantom import adhesin_phantom
    from beyond_dof_tpu.models.probe import gaussian_probe
    from beyond_dof_tpu.sim.acquire import create_fullfield_data
    from beyond_dof_tpu.recon.fullfield import reconstruct_fullfield
    from beyond_dof_tpu.ops.image import circ_mask
    from beyond_dof_tpu.configs.presets import FULLFIELD_PRESETS

    os.makedirs(out, exist_ok=True)
    preset = FULLFIELD_PRESETS["adhesin"]
    gd, gb = adhesin_phantom(64)
    p_true = gaussian_probe((64, 64), **TRUE_PROBE)

    t0 = time.time()
    cache = os.path.join(out, "sim_cache_%d.npy" % n_theta)
    if os.path.exists(cache):
        data = np.load(cache)
    else:
        data = create_fullfield_data(
            gd, gb, n_theta=n_theta, batch_size=50, probe_type="gaussian",
            **{**{k: v for k, v in preset["simulate"].items()
                  if k != "n_theta"}, **TRUE_PROBE})
        np.save(cache, np.asarray(data))
    t_sim = time.time() - t0

    base = dict(preset["reconstruct"])
    # Match the engine's forward convention to the simulator's: the sim
    # follows the reference's NumPy twin (NO propagation after the last
    # slice, ref npfuncs.py:40-41) while the engine default follows the
    # reference's TF engine (propagates every slice, ref util.py:465-483).
    # The reference's own closed loop carries this mismatch; it is invisible
    # for plane probes (~1e-11 loss floor at 800 eV / 0.67 nm voxels) but is
    # a ~7e-7 floor for structured probes — large enough to confound the
    # oracle-vs-retrieved comparison this artifact exists for.
    base.update(n_epochs=n_epochs, save_outputs=True, verbose=True, seed=seed,
                propagate_last=False)

    result = {"metric": "probe_retrieval_adhesin", "n_theta": n_theta,
              "n_epochs": n_epochs, "sim_seconds": round(t_sim, 1),
              "true_probe": TRUE_PROBE, "runs": {}}

    jobs = {
        "plane_mismatch": dict(probe_type="plane"),
        "retrieved": dict(probe_type="optimizable", probe_initial=None,
                          probe_learning_rate=1e-3,
                          pupil_function=circ_mask((64, 64), 0.98)),
        "oracle": dict(probe_type="fixed",
                       probe_initial=(np.abs(p_true), np.angle(p_true))),
    }
    for name, kw in jobs.items():
        rec = dict(base)
        rec.pop("probe_type", None)
        rec.update(kw, output_folder=os.path.join(out, name))
        t0 = time.time()
        d, b, info = reconstruct_fullfield(data=data, **rec)
        t_rec = time.time() - t0
        frac, res = fsc_stats(d, gd)
        row = {"fsc_half_bit_fraction": frac,
               "resolution_frac_nyquist": res,
               "recon_seconds": round(t_rec, 1),
               "final_loss": float(info["loss"][-1])}
        if name == "retrieved":
            row["probe_rel_error_initial"] = probe_error(
                np.ones((64, 64), np.complex64), p_true)
            row["probe_rel_error_recovered"] = probe_error(
                info["probe"], p_true)
        result["runs"][name] = row
        print(name, json.dumps(row), flush=True)

    result["value"] = result["runs"]["retrieved"]["fsc_half_bit_fraction"]
    result["unit"] = "fraction of shells above 1/2-bit (retrieved probe)"
    with open(os.path.join(out, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-epochs", type=int, default=30)
    ap.add_argument("--n-theta", type=int, default=500)
    ap.add_argument("--out", default="benchmarks/artifacts/probe_retrieval")
    a = ap.parse_args()
    print(json.dumps(run(a.n_epochs, a.n_theta, a.out)), flush=True)
