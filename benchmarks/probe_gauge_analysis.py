"""Gauge decomposition of the retrieved probe's residual error.

The probe-retrieval artifact records a pointwise (scale-gauge-removed)
probe error of ~0.37 even though the data loss drops six decades — the
probe converges within the joint probe x object equivalence class of the
bilinear model, not to the pointwise truth. This script quantifies how
much of that residual is PURE GAUGE by removing, cumulatively:

  1. global complex scale   c * p            (exact gauge: object absorbs 1/c)
  2. linear phase ramp      exp(i(ax+by))    (tilt <-> lateral object shift,
                                              the standard ptycho/holography
                                              raster gauge, cf. the
                                              reference's own FRC QA caveats)
  3. quadratic phase        exp(i d r^2)     (defocus <-> object z-position /
                                              Fresnel-scaling gauge)

Ramp/defocus coefficients are fit by maximizing the normalized complex
correlation |<p_hat * e^{i phi}, p_true>| (the scale gauge is then exact
in closed form) with plain gradient ascent on (a, b, d) — smooth, 3
parameters, CPU jax.

Writes a "gauge_analysis" block into the artifact's result.json.

Usage: python benchmarks/probe_gauge_analysis.py \
           [--artifact benchmarks/artifacts/probe_retrieval]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_probe(folder):
    from beyond_dof_tpu.io.tiff import read_tiff
    mag = np.asarray(read_tiff(os.path.join(folder, "probe_mag_ds_1.tiff")))
    ph = np.asarray(read_tiff(os.path.join(folder, "probe_phase_ds_1.tiff")))
    return mag * np.exp(1j * ph)


def residual_after_scale(p_hat, p_true):
    a, b = p_hat.ravel(), p_true.ravel()
    corr = np.abs(np.vdot(a, b)) / (np.linalg.norm(a) * np.linalg.norm(b)
                                    + 1e-30)
    return float(np.sqrt(max(0.0, 1.0 - corr * corr)))


def fit_phase_gauge(p_hat, p_true, use_defocus, steps=4000, lr=0.03):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")

    n = p_hat.shape[0]
    y, x = np.meshgrid(np.arange(n) - n / 2, np.arange(n) - n / 2,
                       indexing="ij")
    # normalized coordinates keep the three parameters at comparable scale
    y = y / (n / 2)
    x = x / (n / 2)
    r2 = x * x + y * y
    hr = jnp.asarray(p_hat.real, jnp.float32)
    hi = jnp.asarray(p_hat.imag, jnp.float32)
    tr = jnp.asarray(p_true.real, jnp.float32)
    ti = jnp.asarray(p_true.imag, jnp.float32)
    xx, yy, rr = map(jnp.asarray, (x, y, r2))
    nh = jnp.sqrt(jnp.sum(hr * hr + hi * hi))
    nt = jnp.sqrt(jnp.sum(tr * tr + ti * ti))

    def corr(params):
        a, b, d = params
        phi = a * xx + b * yy + (d * rr if use_defocus else 0.0)
        c, s = jnp.cos(phi), jnp.sin(phi)
        gr = hr * c - hi * s
        gi = hr * s + hi * c
        re = jnp.sum(gr * tr + gi * ti)
        im = jnp.sum(gr * ti - gi * tr)
        return jnp.sqrt(re * re + im * im) / (nh * nt + 1e-30)

    grad = jax.jit(jax.grad(lambda p: -corr(p)))
    corr_j = jax.jit(corr)

    # multistart over tilt/defocus scales: the correlation landscape is
    # oscillatory in (a, b) beyond ~pi, and gradient ascent is local
    best = (0.0, np.zeros(3, np.float32))
    for a0 in (-4.0, -1.0, 0.0, 1.0, 4.0):
        for b0 in (-4.0, -1.0, 0.0, 1.0, 4.0):
            for d0 in ((-4.0, -1.0, 0.0, 1.0, 4.0) if use_defocus
                       else (0.0,)):
                p = np.array([a0, b0, d0], np.float32)
                m = np.zeros_like(p)
                for i in range(steps):
                    g = np.asarray(grad(p))
                    m = 0.9 * m + g
                    p = p - lr * m
                c = float(corr_j(p))
                if c > best[0]:
                    best = (c, p)
    c, p = best
    return float(np.sqrt(max(0.0, 1.0 - c * c))), [float(v) for v in p]


def main(artifact):
    from beyond_dof_tpu.models.probe import gaussian_probe

    with open(os.path.join(artifact, "result.json")) as f:
        result = json.load(f)
    p_true = np.asarray(gaussian_probe((64, 64), **result["true_probe"]))
    p_hat = load_probe(os.path.join(artifact, "retrieved"))

    out = {"scale_only": residual_after_scale(p_hat, p_true)}
    out["scale_ramp"], ramp = fit_phase_gauge(p_hat, p_true, False)
    out["ramp_coeffs_rad_per_halfwidth"] = ramp[:2]
    out["scale_ramp_defocus"], full = fit_phase_gauge(p_hat, p_true, True)
    out["defocus_coeff_rad"] = full[2]
    # control: the plane-probe guess through the same pipeline — how much
    # of the gap closes for a probe with NO information about the truth
    plane = np.ones_like(p_true)
    out["control_plane_scale_only"] = residual_after_scale(plane, p_true)
    out["control_plane_scale_ramp_defocus"], _ = fit_phase_gauge(
        plane, p_true, True)

    result["runs"]["retrieved"]["gauge_analysis"] = out
    with open(os.path.join(artifact, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", default="benchmarks/artifacts/probe_retrieval")
    main(ap.parse_args().artifact)
