"""One-off A/B: 1024^2 split multislice, layout x precision.

Reconciles the 11.3k slices/s XLA roof (multislice_bench, z-last grids)
with the 5.6k HIGHEST number from precision_bench (z-first grids), and
measures Precision.HIGH (bf16x3) on both layouts.  Device-side fori_loop
differencing per the axon timing rules.

Usage: PYTHONPATH=. python -u benchmarks/precision_ab_1024.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(size=1024, nz=128, iters=5):
    import jax
    import jax.numpy as jnp
    from beyond_dof_tpu.ops import splitfft
    from beyond_dof_tpu.ops.multislice import multislice_propagate_batch_split

    rng = np.random.RandomState(0)
    delta_zf = (rng.rand(nz, 1, size, size) * 1e-7).astype(np.float32)
    beta_zf = (delta_zf * 0.06).astype(np.float32)
    # z-last view of the same grids: (1, y, x, nz)
    delta_zl = np.transpose(delta_zf[:, 0], (1, 2, 0))[None]
    beta_zl = np.transpose(beta_zf[:, 0], (1, 2, 0))[None]

    p_re = jnp.ones((1, size, size), jnp.float32)
    p_im = jnp.zeros((1, size, size), jnp.float32)

    out = {"metric": "precision_ab_1024", "size": size, "nz": nz}
    for layout, (d, b) in (("zfirst", (delta_zf, beta_zf)),
                           ("zlast", (delta_zl, beta_zl))):
        d_dev, b_dev = jnp.asarray(d), jnp.asarray(b)
        for prec in ("HIGHEST", "HIGH"):
            splitfft.set_precision(prec)

            def fwd(gd, gb, pr, pi):
                return multislice_propagate_batch_split(
                    gd, gb, pr, pi, 5000, 1e-7, propagate_last=True,
                    remat=False, grids_zfirst=(layout == "zfirst"),
                    use_pallas=False)

            def make_timed(n):
                @jax.jit
                def timed(gd, gb, pr, pi):
                    def body(_, w):
                        re, im = fwd(gd, gb, w[0], w[1])
                        return jnp.stack([re, im])
                    w = jax.lax.fori_loop(0, n, body, jnp.stack([pr, pi]))
                    return jnp.sum(w[0] ** 2 + w[1] ** 2)
                return timed

            t1, t2 = make_timed(iters), make_timed(2 * iters)
            float(t1(d_dev, b_dev, p_re, p_im))
            float(t2(d_dev, b_dev, p_re, p_im))
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                float(t1(d_dev, b_dev, p_re, p_im))
                dt1 = time.time() - t0
                t0 = time.time()
                float(t2(d_dev, b_dev, p_re, p_im))
                dt2 = time.time() - t0
                best = min(best, (dt2 - dt1) / iters)
            key = "%s_%s" % (layout, prec)
            out[key] = {"slices_per_sec": round(nz / best, 1),
                        "s_per_volume": best}
            print(key, json.dumps(out[key]), flush=True)
    splitfft.set_precision("HIGHEST")
    with open("benchmarks/precision_ab_1024.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
