"""Decisive adhesin_ptycho diagnostic: why the workload records 35.5%.

The adhesin_ptycho record (FSC above 1/2-bit for 35.5% of shells,
crossing 0.39 Nyquist) is converged at 5 epochs, unchanged by 60 epochs
(`adhesin_ptycho_e60`) and unchanged by the alpha/10 reg-tuning that took
full-field cone_256 from 49.6% to 100% (`adhesin_ptycho_regtuned`). So the
ceiling is NOT the epoch budget and NOT the regularizers. Three hypotheses
remain on the record:

  (A) information limit — the failing FSC shells are (near-)null directions
      of the ptycho measurement at this geometry (18-pixel probe windows,
      23x23 grid, far-field magnitudes), so no optimizer can recover them;
  (B) optimization stall — the data can see the error but Adam at the
      preset lr=1e-7 stops descending (lr-bound, like cell_ptycho_2d's
      preset-lr blowup in the other direction);
  (C) gauge — a registration mismatch (translation) depresses mid shells,
      the far-field/2D-ptycho pattern (diag_cone_far.py, diag_ptycho_2d.py).

Measurements, on a model-matched 50-angle subset of the preset geometry
(ref reconstruct_ptycho.py:9-43 params_adhesin hyperparameters):

  1. FSC shell pass/fail map + integer-shift registration      -> (C)
  2. data-space distances: err(recon), err(zero) vs err(GT)=0  -> (A)/(B)
     [err = the engine's mean squared magnitude loss]
  3. failing-shell nullspace test: add the reconstruction's own
     failing-shell error to the TRUE object, re-simulate, measure the
     relative data change                                       -> (A)
  4. lr probe: data-only Adam from the converged recon state at
     lr in {1e-7 (preset), 1e-6, 1e-5}, 30 single-angle steps; does any
     lr move err below err(recon) and the FSC above 35.5%?      -> (B)

Writes benchmarks/artifacts/adhesin_ptycho/diagnostic.json.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u
           benchmarks/diag_adhesin_ptycho.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART = "benchmarks/artifacts/adhesin_ptycho"
N_SUB = 50  # evenly spaced subset of the preset's 500 angles


def fsc_stats(d, gd):
    from beyond_dof_tpu.ops.quality import (fourier_shell_correlation,
                                            half_bit_threshold)
    radii, fsc = fourier_shell_correlation(d, gd)
    fsc = np.asarray(fsc)[: len(radii)]
    thr = half_bit_threshold(radii, d.shape)
    above = fsc > thr
    cross = int(np.argmin(above)) if not above.all() else len(radii)
    return {
        "fraction_above": float(above.mean()),
        "resolution_frac_nyquist": float(radii[min(cross, len(radii) - 1)]
                                         / radii[-1]),
        "failing_shells": [int(i) for i in np.nonzero(~above)[0]],
        "n_shells": int(len(radii)),
    }


def best_shift_3d(a, b):
    fa = np.fft.fftn(a)
    fb = np.fft.fftn(b)
    cc = np.fft.ifftn(fa * np.conj(fb)).real
    shift = np.unravel_index(np.argmax(cc), cc.shape)
    return tuple(int(s) if s <= n // 2 else int(s - n)
                 for s, n in zip(shift, cc.shape))


def shell_residual(d, gd, shells, n_shells):
    """Keep (d - gd)'s Fourier content only in the given FSC shells.

    Uses the exact integer-radius binning of ops.quality.radial_bin_index
    (failing-shell index i corresponds to bin radius i+1, since the FSC
    curve drops the DC bin)."""
    from beyond_dof_tpu.ops.quality import radial_bin_index
    bins = np.fft.ifftshift(radial_bin_index(d.shape))
    keep = np.isin(bins, np.asarray(shells, dtype=int) + 1)
    fr = np.fft.fftn(d.astype(np.float64) - gd.astype(np.float64))
    return np.real(np.fft.ifftn(fr * keep)).astype(np.float32)


def main():
    from beyond_dof_tpu.configs.presets import PTYCHO_PRESETS, make_phantom
    from beyond_dof_tpu.io import tiff
    from beyond_dof_tpu.sim.acquire import create_ptychography_data

    p = PTYCHO_PRESETS["adhesin_ptycho"]
    gd, gb = make_phantom(p["phantom"])
    gd, gb = np.asarray(gd), np.asarray(gb)
    probe_pos = np.asarray(p["probe_pos"], dtype=int)
    sim = dict(p["simulate"])
    sim.pop("n_photons_total", None)
    sim["n_theta"] = N_SUB

    d = np.asarray(tiff.read_tiff(os.path.join(ART, "delta_ds_1.tiff")),
                   dtype=np.float32)
    b = np.asarray(tiff.read_tiff(os.path.join(ART, "beta_ds_1.tiff")),
                   dtype=np.float32)

    res = {"artifact": ART, "n_angle_subset": N_SUB}

    # --- 1. FSC map + registration (hypothesis C) -------------------------
    res["as_is"] = fsc_stats(d, gd)
    sh = best_shift_3d(gd, d)
    res["best_shift_px"] = list(sh)
    res["after_shift"] = fsc_stats(np.roll(d, sh, axis=(0, 1, 2)), gd)
    print("as-is: %.3f above; failing shells %s; best shift %s"
          % (res["as_is"]["fraction_above"],
             res["as_is"]["failing_shells"], sh), flush=True)

    # --- 2. data-space distances (A vs B) ---------------------------------
    t0 = time.time()
    sims = {}
    for name, (dd, bb) in (("gt", (gd, gb)), ("recon", (d, b)),
                           ("zero", (np.zeros_like(gd), np.zeros_like(gb)))):
        sims[name] = np.abs(np.asarray(create_ptychography_data(
            dd, bb, probe_pos=probe_pos, **sim)))
        print("simulated %s subset (%.0f s)" % (name, time.time() - t0),
              flush=True)
    err_recon = float(np.mean((sims["recon"] - sims["gt"]) ** 2))
    err_zero = float(np.mean((sims["zero"] - sims["gt"]) ** 2))
    res["err_recon_vs_gt"] = err_recon
    res["err_zero_vs_gt"] = err_zero
    res["err_recon_over_err_zero"] = err_recon / err_zero
    res["data_rel_change_recon"] = float(
        np.sqrt(err_recon) / np.sqrt(np.mean(sims["gt"] ** 2)))
    print("err(recon)=%.3e err(zero)=%.3e ratio=%.4f" %
          (err_recon, err_zero, err_recon / err_zero), flush=True)

    # --- 3. failing-shell nullspace test (A) ------------------------------
    fail = res["as_is"]["failing_shells"]
    n_shells = res["as_is"]["n_shells"]
    r = shell_residual(d, gd, fail, n_shells)
    pert = np.abs(np.asarray(create_ptychography_data(
        gd + r, gb, probe_pos=probe_pos, **sim)))
    mse = float(np.mean((pert - sims["gt"]) ** 2))
    res["nullspace_test"] = {
        "n_shells_perturbed": len(fail),
        "residual_rms": float(np.sqrt(np.mean(r ** 2))),
        "object_rel_change": float(np.sqrt(np.mean(r ** 2))
                                   / np.sqrt(np.mean(gd ** 2))),
        "data_mse_from_perturbation": mse,
        "data_rel_change": float(np.sqrt(mse)
                                 / np.sqrt(np.mean(sims["gt"] ** 2))),
        "data_rel_change_vs_recon": float(np.sqrt(mse / max(err_recon, 1e-30))),
    }
    res["after_shell_registration"] = fsc_stats(d - r, gd)
    print("nullspace: obj moves %.1f%%, data moves %.3e rel" %
          (100 * res["nullspace_test"]["object_rel_change"],
           res["nullspace_test"]["data_rel_change"]), flush=True)

    # --- 4. lr probe from the converged state (B) -------------------------
    import jax
    import jax.numpy as jnp
    import optax
    from beyond_dof_tpu.models.probe import build_probe
    from beyond_dof_tpu.models.ptycho import (compute_pad_arr, ptycho_forward,
                                              ptycho_forward_split, safe_mag)
    from beyond_dof_tpu.ops.image import circ_mask, gaussian_filter_nd
    from beyond_dof_tpu.ops.splitfft import complex_supported

    probe_size = tuple(sim["probe_size"])
    obj_size = gd.shape
    pad_arr = compute_pad_arr(probe_pos, probe_size, obj_size)
    probe = build_probe("gaussian", probe_size,
                        probe_mag_sigma=sim["probe_mag_sigma"],
                        probe_phase_sigma=sim["probe_phase_sigma"],
                        probe_phase_max=sim["probe_phase_max"])
    mask2d = circ_mask(probe_size, 0.9)
    probe = probe * mask2d
    probe_mask = gaussian_filter_nd(mask2d, 3.0)
    theta_ls = -np.linspace(0, sim["theta_end"], N_SUB).astype(np.float32)

    use_split = not complex_supported()
    p_re = jnp.asarray(np.real(probe).astype(np.float32))
    p_im = jnp.asarray(np.imag(probe).astype(np.float32))
    pos_dev = jnp.asarray(probe_pos.astype(np.int32))
    mag_dev = jnp.asarray(sims["gt"].astype(np.float32))
    th_dev = jnp.asarray(theta_ls)

    def loss_fn(params, i):
        dd, bb = params
        if use_split:
            re, im = ptycho_forward_split(
                dd, bb, th_dev[i], pos_dev, p_re, p_im, sim["energy_ev"],
                sim["psize_cm"], probe_size, pad_arr, probe_mask=probe_mask,
                free_prop_cm="inf", remat=False, n_dp_batch=50)
            mag = safe_mag(re, im)
        else:
            ex = ptycho_forward(
                dd, bb, th_dev[i], pos_dev, jnp.asarray(probe),
                sim["energy_ev"], sim["psize_cm"], probe_size, pad_arr,
                probe_mask=probe_mask, free_prop_cm="inf", remat=False,
                n_dp_batch=50)
            mag = safe_mag(jnp.real(ex), jnp.imag(ex))
        return jnp.mean((mag - mag_dev[i]) ** 2)

    vg = jax.jit(jax.value_and_grad(loss_fn))

    res["lr_probe"] = {}
    n_steps = 30
    for lr in (1e-7, 1e-6, 1e-5):
        params = (jnp.asarray(d), jnp.asarray(b))
        opt = optax.adam(lr)
        st = opt.init(params)
        losses = []
        t0 = time.time()
        for k in range(n_steps):
            val, g = vg(params, k % N_SUB)
            up, st = opt.update(g, st, params)
            params = optax.apply_updates(params, up)
            params = tuple(jnp.clip(x, 0.0, None) for x in params)
            losses.append(float(val))
        d_new = np.asarray(params[0])
        stats = fsc_stats(d_new, gd)
        res["lr_probe"]["%g" % lr] = {
            "loss_first": losses[0], "loss_last": losses[-1],
            "loss_min": min(losses),
            "fsc_after": stats["fraction_above"],
            "resolution_after": stats["resolution_frac_nyquist"],
            "seconds": round(time.time() - t0, 1),
        }
        print("lr %g: loss %.3e -> %.3e, FSC %.3f (%.0f s)" %
              (lr, losses[0], losses[-1], stats["fraction_above"],
               time.time() - t0), flush=True)

    with open(os.path.join(ART, "diagnostic.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: res[k] for k in
                      ("err_recon_over_err_zero", "best_shift_px")}),
          flush=True)


if __name__ == "__main__":
    main()
