"""cone_far gauge analysis: why the loss falls while FSC stays 0.

The far-field preset (``free_prop_cm='inf'``,
ref reconstruct_fullfield.py:110-143) measures FOURIER MAGNITUDES — the
loss is blind to (at least) two exact gauges of the exit wave:

  * transverse translation: |F{psi(x - a)}| == |F{psi(x)}|. A shift along
    the tomographic rotation axis (Y) is CONSISTENT across all angles, so
    the whole object can drift along Y with zero loss penalty;
  * the conjugate twin psi*(-x), suppressed here by non-negativity but not
    eliminated.

This script checks whether the round-2 cone_far reconstruction (loss fell
8.3e-4 -> 1.2e-4, FSC 0.0) is gauge-drifted rather than wrong: it registers
the reconstructed volume against the phantom over integer shifts (FFT
cross-correlation) and over the point-reflected twin, and records the FSC
before/after. Writes benchmarks/artifacts/cone_far/gauge_analysis.json.

The fix the analysis motivates — a finite-support mask, which the reference
workload itself uses (hand-tuned cone envelope, ref create_support_mask.py:
10-20; auto-Paganin fallback, ref fullfield.py:242-257) — is exercised by
re-running ``closed_loop_fullfield.py --preset cone_far --support-mask cone``.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best_shift(a, b):
    """Integer shift maximizing the circular cross-correlation of b onto a."""
    fa = np.fft.fftn(a)
    fb = np.fft.fftn(b)
    cc = np.fft.ifftn(fa * np.conj(fb)).real
    shift = np.unravel_index(np.argmax(cc), cc.shape)
    return tuple(s if s <= n // 2 else s - n
                 for s, n in zip(shift, cc.shape))


def fsc_fraction(d, gd):
    from beyond_dof_tpu.ops.quality import (fourier_shell_correlation,
                                            half_bit_threshold)
    radii, fsc = fourier_shell_correlation(d, gd)
    fsc = np.asarray(fsc)[: len(radii)]
    thr = half_bit_threshold(radii, d.shape)
    above = fsc > thr
    cross = int(np.argmin(above)) if not above.all() else len(radii)
    return float(above.mean()), float(radii[min(cross, len(radii) - 1)]
                                      / radii[-1])


def main(art="benchmarks/artifacts/cone_far"):
    from beyond_dof_tpu.io import tiff
    from beyond_dof_tpu.models.phantom import cone_foam_phantom

    gd, _ = cone_foam_phantom(256)
    d = np.asarray(tiff.read_tiff(os.path.join(art, "delta_ds_1.tiff")),
                   dtype=np.float32)

    res = {}
    res["fsc_as_is"], res["res_as_is"] = fsc_fraction(d, gd)

    sh = best_shift(gd, d)
    d_reg = np.roll(d, sh, axis=(0, 1, 2))
    res["best_shift_vox"] = [int(s) for s in sh]
    res["fsc_after_shift"], res["res_after_shift"] = fsc_fraction(d_reg, gd)

    # conjugate twin: point reflection through the volume center
    d_twin = d[::-1, ::-1, ::-1]
    sh_t = best_shift(gd, d_twin)
    d_twin_reg = np.roll(d_twin, sh_t, axis=(0, 1, 2))
    res["twin_best_shift_vox"] = [int(s) for s in sh_t]
    res["fsc_twin_after_shift"], res["res_twin_after_shift"] = \
        fsc_fraction(d_twin_reg, gd)

    # correlation coefficients, a shift-sensitive sanity cross-check
    def corr(a, b):
        a = a - a.mean()
        b = b - b.mean()
        return float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)
                                      + 1e-30))
    res["corr_as_is"] = corr(d, gd)
    res["corr_after_shift"] = corr(d_reg, gd)
    res["corr_twin_after_shift"] = corr(d_twin_reg, gd)

    # registered record (VERDICT r4 weak item 5): the best of the exact
    # gauge variants (identity/twin x integer shift), surfaced by
    # collect_results.py exactly like the 2D-ptycho registered crossings
    # (same schema as diag_ptycho_2d.py's after_nullspace_registration)
    variants = {
        "shift": (res["fsc_after_shift"], res["res_after_shift"]),
        "twin+shift": (res["fsc_twin_after_shift"],
                       res["res_twin_after_shift"]),
    }
    mode = max(variants, key=lambda m: variants[m][0])
    res["after_nullspace_registration"] = {
        "fsc_half_bit_fraction": variants[mode][0],
        "resolution_frac_nyquist": variants[mode][1],
        "mode": mode,
    }

    with open(os.path.join(art, "gauge_analysis.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)
    return res


if __name__ == "__main__":
    main(*sys.argv[1:])
