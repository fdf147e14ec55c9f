"""2D-ptycho FRC gauge analysis: why the first ring dips below 1/2-bit.

Both cell_ptycho_2d artifacts report a 0.01-Nyquist resolution crossing —
the FRC fails in the very FIRST ring while ~half of all rings pass. That is
the signature of a low-frequency gauge mismatch, not a resolution limit.
2D ptychography has exact gauges the magnitude loss cannot see (the same
class as the far-field translation/twin gauge diagnosed in
``diag_cone_far.py``):

  * a global phase constant of the object (|psi|^2 data are blind to it);
  * a global linear phase ramp, which is exactly a transverse shift of the
    far-field pattern / an offset of the probe-position origin;
  * equivalently, a sub-pixel translation of the object against the probe
    grid.

This script registers each committed 2D-ptycho reconstruction against its
phantom over (a) integer translation (FFT cross-correlation) and (b) the
constant+ramp plane gauge (least-squares plane fit of the difference),
and records the FRC before/after each stage. The reference's own FRC QA
(ref tensorflow_recon/util.py:1013-1048, plot_fsc.py:11-14) scores
registered reconstructions of measured data implicitly — simulation makes
the gauge visible. Writes ``gauge_analysis.json`` into each artifact dir.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def frc_stats(d, gd):
    from beyond_dof_tpu.ops.quality import (fourier_ring_correlation,
                                            half_bit_threshold)
    radii, frc = fourier_ring_correlation(d, gd)
    frc = np.asarray(frc)[: len(radii)]
    thr = half_bit_threshold(radii, d.shape)
    above = frc > thr
    cross = int(np.argmin(above)) if not above.all() else len(radii)
    return {
        "fraction_above": float(above.mean()),
        "resolution_frac_nyquist": float(radii[min(cross, len(radii) - 1)]
                                         / radii[-1]),
        "first_ring_frc": float(frc[0]),
        "first_ring_threshold": float(thr[0]),
    }


def best_shift_2d(a, b):
    fa = np.fft.fft2(a)
    fb = np.fft.fft2(b)
    cc = np.fft.ifft2(fa * np.conj(fb)).real
    shift = np.unravel_index(np.argmax(cc), cc.shape)
    return tuple(s if s <= n // 2 else s - n for s, n in zip(shift, cc.shape))


def remove_plane_gauge(d, gd):
    """Project the constant+ramp gauge out of d against gd.

    The 3-parameter family c0 + c1*y + c2*x is an exact gauge of the
    ptychographic phase (global phase constant and linear ramp); the
    least-squares member minimizing ||d - plane - gd|| is removed.
    """
    h, w = d.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    basis = np.stack([np.ones_like(yy), yy - yy.mean(), xx - xx.mean()],
                     axis=-1).reshape(-1, 3)
    resid = (d - gd).reshape(-1).astype(np.float64)
    coef, *_ = np.linalg.lstsq(basis, resid, rcond=None)
    plane = (basis @ coef).reshape(h, w)
    return (d - plane).astype(np.float32), [float(c) for c in coef]


def lowpass_residual(d, gd, n_rings=4):
    """The lowest-frequency component of the reconstruction error.

    Keeps only Fourier components within ``n_rings`` of DC (the rings whose
    FRC fails) of (d - gd); everything else zeroed.
    """
    h, w = d.shape
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    r = np.sqrt(fy * fy + fx * fx)
    keep = r <= (n_rings / max(h, w))
    fr = np.fft.fft2(d.astype(np.float64) - gd.astype(np.float64))
    return np.real(np.fft.ifft2(fr * keep)).astype(np.float32)


def nullspace_perturbation_test(preset_name, d, gd, art, n_rings=4):
    """Is the low-frequency error visible to the data at all?

    Adds the reconstruction's own low-frequency error to the TRUE object and
    simulates the preset's ptycho data for both. If the relative data change
    is at/below the converged loss floor, those components are (near-)null
    directions of single-angle ptychography — the optimizer cannot be
    expected to recover them, and the first-ring FRC dip is a property of
    the measurement, not the engine.
    """
    from beyond_dof_tpu.configs.presets import PTYCHO_PRESETS
    from beyond_dof_tpu.sim.acquire import create_ptychography_data

    p = PTYCHO_PRESETS[preset_name]
    sim = dict(p["simulate"])
    sim.pop("n_photons_total", None)
    probe_pos = np.asarray(p["probe_pos"], dtype=int)

    r = lowpass_residual(d, gd, n_rings)
    gd3 = gd[..., None].astype(np.float32)
    gb3 = np.zeros_like(gd3)
    pert3 = (gd + r)[..., None].astype(np.float32)

    # the engine's loss is mean squared MAGNITUDE error (ptycho_loss);
    # the simulated far fields are complex — compare their magnitudes
    data0 = np.abs(np.asarray(create_ptychography_data(
        gd3, gb3, probe_pos=probe_pos, **sim)))
    data1 = np.abs(np.asarray(create_ptychography_data(
        pert3, gb3, probe_pos=probe_pos, **sim)))
    mse = float(np.mean((data1 - data0) ** 2))
    rel = float(np.sqrt(mse) / (np.sqrt(np.mean(data0 ** 2)) + 1e-30))
    return {
        "n_rings_perturbed": n_rings,
        "residual_rms": float(np.sqrt(np.mean(r ** 2))),
        "object_rel_change": float(np.sqrt(np.mean(r ** 2))
                                   / (np.sqrt(np.mean(gd ** 2)) + 1e-30)),
        "data_mse_from_perturbation": mse,
        "data_rel_change": rel,
    }


def analyze(art, phantom_kwargs, preset_name=None):
    from beyond_dof_tpu.io import tiff
    from beyond_dof_tpu.configs.presets import make_phantom

    gd, _ = make_phantom(phantom_kwargs)
    gd = np.asarray(gd)[..., 0]
    d = np.asarray(tiff.read_tiff(os.path.join(art, "delta_ds_1.tiff")),
                   dtype=np.float32)
    if d.ndim == 3:
        d = d[..., 0]

    res = {"artifact": art}
    res["as_is"] = frc_stats(d, gd)

    sh = best_shift_2d(gd, d)
    d_sh = np.roll(d, sh, axis=(0, 1))
    res["best_shift_px"] = [int(s) for s in sh]
    res["after_shift"] = frc_stats(d_sh, gd)

    d_pl, coef = remove_plane_gauge(d_sh, gd)
    res["plane_coef_const_y_x"] = coef
    res["after_shift_and_plane"] = frc_stats(d_pl, gd)

    # plane gauge alone (no integer shift), for attribution
    d_pl0, coef0 = remove_plane_gauge(d, gd)
    res["after_plane_only"] = frc_stats(d_pl0, gd)

    if preset_name is not None:
        res["nullspace_test"] = nullspace_perturbation_test(
            preset_name, d, gd, art)
        # FRC with the near-null rings replaced by truth: what the record
        # would read if the unconstrained subspace were registered out
        r = lowpass_residual(d, gd)
        res["after_nullspace_registration"] = frc_stats(d - r, gd)

    with open(os.path.join(art, "gauge_analysis.json"), "w") as f:
        json.dump(res, f, indent=1)
    return res


def main():
    jobs = [
        ("benchmarks/artifacts/ptycho_2d",
         {"kind": "cone_foam", "size": 256, "flat": True}, "ptycho_2d"),
        ("benchmarks/artifacts/cell_ptycho_2d",
         {"kind": "cone_foam", "size": 325, "flat": True}, "cell_ptycho_2d"),
        ("benchmarks/artifacts/cell_ptycho_2d_lr",
         {"kind": "cone_foam", "size": 325, "flat": True}, "cell_ptycho_2d"),
    ]
    out = [analyze(art, kw, name) for art, kw, name in jobs
           if os.path.isdir(art)]
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
