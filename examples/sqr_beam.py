"""Square-beam propagation demo: TF vs IR at short / critical / long z.

Rebuild of the reference's Voelz-textbook demo (ref simulation/sqr_beam.py:22-44
with simulation/rect.py): a 2 m x 2 m square aperture, 0.5 um light, propagated
to z = 1000/2000/4000/20000 m with both the transfer-function (TF) and
impulse-response (IR) single-distance propagators.

The point of the demo is the sampling regimes (see
docs/wave_propagation_overview.md):
at the critical distance z_crit = step * L / wavel both methods agree; below it
TF is accurate and IR aliases; above it IR is accurate and TF wraps. The demo
prints the TF/IR midline disagreement at each z and saves cross-section plots
when matplotlib is available.

Run: python examples/sqr_beam.py  (CPU-friendly; forces the CPU backend so it
works regardless of TPU complex64 support).
"""

import numpy as np


def rect(x, width=1.0):
    """1-D rectangle function (ref simulation/rect.py)."""
    return (np.abs(x) <= width / 2.0).astype(np.float32)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from beyond_dof_tpu.ops.fresnel import prop_tf, prop_ir

    m = 250                       # samples per side
    L = 0.5                       # side length (m)
    step = L / m
    wavel = 0.5e-6                # wavelength (m)
    w = 0.051                     # half-width of the square (m)
    z_crit = step * L / wavel     # TF/IR crossover distance (= L^2 / (M lambda))

    x = np.linspace(-L / 2.0, L / 2.0 - step, m)
    X, Y = np.meshgrid(x, x)
    u1 = (rect(X, 2 * w) * rect(Y, 2 * w)).astype(np.complex64)

    print("z_crit = %.0f m" % z_crit)
    rows = []
    for z in (1000.0, z_crit, 4000.0, 20000.0):
        u_tf = np.asarray(prop_tf(u1, step, L, wavel, z))
        u_ir = np.asarray(prop_ir(u1, step, L, wavel, z))
        mid_tf = np.abs(u_tf[m // 2])
        mid_ir = np.abs(u_ir[m // 2])
        dis = np.abs(mid_tf - mid_ir).max()
        regime = ("TF accurate (short z)" if z < z_crit * 0.99 else
                  "both agree (z = z_crit)" if z < z_crit * 1.01 else
                  "IR accurate (long z)")
        rows.append((z, mid_tf, mid_ir))
        print("z = %8.0f m: max |TF - IR| on midline = %.3f   <- %s"
              % (z, dis, regime))

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(len(rows), 1, figsize=(6, 2.2 * len(rows)))
        for ax, (z, mid_tf, mid_ir) in zip(np.atleast_1d(axes), rows):
            ax.plot(x, mid_tf, label="TF")
            ax.plot(x, mid_ir, "--", label="IR")
            ax.set_title("z = %.0f m" % z)
            ax.legend()
        fig.tight_layout()
        fig.savefig("sqr_beam.png", dpi=120)
        print("Wrote sqr_beam.png")
    except Exception:
        print("matplotlib unavailable; skipped plots")


if __name__ == "__main__":
    main()
