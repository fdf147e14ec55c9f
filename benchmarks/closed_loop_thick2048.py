"""Beyond-VMEM closed loop: thick-slab holography at a 2048^2+ plane.

The reference's entire reason to exist is scaling the transverse plane of
the multislice AD reconstruction (ref README.md:1-11; the truncated-kernel
propagator cnn_propagator/propagation.py:18-133 exists only to decompose
big planes) — yet its largest reconstructed plane is 1024^2
(ref reconstruct_fullfield.py:160-206). This artifact reconstructs a
(N, N, NZ) slab at N >= 2048 end to end ON ONE CHIP, with every forward
and backward propagation running through the blocked two-pass Pallas
kernel's invertible AD path (the production auto-route for >1024^2 planes
in ops/multislice.py).

Workload: beyond-depth-of-focus thick-slab in-line holography. A 32-slice
slab at 5 keV / 1 nm voxels spans ~4 depths of focus (DOF = 2 psize^2 /
lambda ~ 8 nm), so a single-distance hologram cannot be refocused to all
slices at once — the classic beyond-DOF regime (Du et al., Sci. Adv. 6,
eaay3700). Depth is encoded by the per-slice Fresnel defocus inside the
multislice model; measurement diversity comes from a tilt series x
distance series of in-line holograms (probe tilts are integer-frequency
phase ramps; distances follow the 2d_cell critical-sampling scale,
ref reconstruct_fullfield.py:160-206) — no object rotation, so the
transverse plane never has to fit a rotation FOV and the geometry scales
to arbitrary N on one chip.

The phantom is the central (N, N, NZ) slab of the N^3 cone-foam phantom
with 10x the cone_256 contrast (delta 8.7e-6 — at 32 slices the
accumulated phase matches the 256-slice flagship's regime).

Quality is scored against the known slab: per-slice FRC (mean and central
slice), the 3-D voxel correlation, and the per-slice correlation profile
(depth resolution is DOF-limited by physics; the record keeps raw
numbers + the profile rather than a single shell fraction, since 3-D FSC
shells are ill-defined on a 64:1 aspect-ratio volume).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u
           benchmarks/closed_loop_thick2048.py [--size 2048] [--nz 32]
           [--n-epochs 150] [--lr 1e-6]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tilt_probe(size, my, mx):
    """Integer-frequency plane-wave tilt: exp(2 pi i (my y + mx x) / N)."""
    y = np.arange(size)[:, None]
    x = np.arange(size)[None, :]
    ph = 2.0 * np.pi * (my * y + mx * x) / float(size)
    return np.cos(ph).astype(np.float32), np.sin(ph).astype(np.float32)


def run(size=2048, nz=32, n_epochs=150, lr=1e-6, gamma=1e-9, seed=0,
        tilt_m=64, n_dists=3, out=None, probe_epochs=0):
    import jax
    import jax.numpy as jnp
    import optax
    from beyond_dof_tpu.models.phantom import cone_foam_phantom
    from beyond_dof_tpu.ops.multislice import multislice_propagate_batch_split
    from beyond_dof_tpu.ops.regularizers import total_variation_3d
    from beyond_dof_tpu.ops.quality import (fourier_ring_correlation,
                                            half_bit_threshold)
    from beyond_dof_tpu.models.ptycho import safe_mag

    out = out or "benchmarks/artifacts/thick_%d" % size
    os.makedirs(out, exist_ok=True)

    t0 = time.time()
    z0 = size // 2 - nz // 2
    gd, gb = cone_foam_phantom(size, delta=8.7e-6, beta=5.1e-7,
                               z_slab=(z0, z0 + nz))
    t_phantom = time.time() - t0
    print("phantom", gd.shape, round(t_phantom, 1), "s", flush=True)

    energy_ev, psize_cm = 5000.0, 1e-7
    # critical-sampling distance scale of the 2d_cell recipe, per plane size
    base_cm = 0.00040322580645161285 * (size / 1024.0)
    dists = [base_cm * (2 ** i) for i in range(n_dists)]
    tilts = [(0, 0), (tilt_m, 0), (-tilt_m, 0), (0, tilt_m), (0, -tilt_m)]

    probes = [tilt_probe(size, my, mx) for (my, mx) in tilts]
    # z-first object layout: (Z, B, Y, X) grids skip the on-device
    # transpose copy (ops/multislice grids_zfirst)
    dz_true = jnp.asarray(np.moveaxis(gd, -1, 0)[:, None])
    bz_true = jnp.asarray(np.moveaxis(gb, -1, 0)[:, None])

    def forward(dz, bz, p_re, p_im, dist_cm):
        return multislice_propagate_batch_split(
            dz, bz, p_re, p_im, energy_ev, psize_cm, free_prop_cm=dist_cm,
            propagate_last=True, remat="invertible", grids_zfirst=True)

    # ---- simulate the tilt x distance hologram series ---------------------
    @jax.jit
    def simulate(dz, bz):
        mags = []
        for p_re, p_im in probes:
            for dist in dists:
                re, im = forward(dz, bz, jnp.asarray(p_re), jnp.asarray(p_im),
                                 dist)
                mags.append(safe_mag(re[0], im[0]))
        return jnp.stack(mags)

    t0 = time.time()
    mags_meas = simulate(dz_true, bz_true)
    mags_meas.block_until_ready()
    t_sim = time.time() - t0
    print("simulated", mags_meas.shape, round(t_sim, 1), "s", flush=True)

    # ---- reconstruct -------------------------------------------------------
    n_views = float(len(probes) * len(dists))

    def loss_fn(params):
        dz, bz = params["delta"][:, None], params["beta"][:, None]
        err = 0.0
        i = 0
        for p_re, p_im in probes:
            for dist in dists:
                re, im = forward(dz, bz, jnp.asarray(p_re), jnp.asarray(p_im),
                                 dist)
                err = err + jnp.mean((safe_mag(re[0], im[0])
                                      - mags_meas[i]) ** 2)
                i += 1
        err = err / n_views
        reg = gamma * total_variation_3d(params["delta"])
        return err + reg, err

    tx = optax.adam(lr)
    params = {"delta": jnp.zeros((nz, size, size), jnp.float32),
              "beta": jnp.zeros((nz, size, size), jnp.float32)}
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        (loss, err), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = jax.tree.map(lambda a: jnp.maximum(a, 0.0), params)
        return params, opt_state, loss, err

    losses, epoch_times = [], []
    t_rec0 = time.time()
    for epoch in range(n_epochs):
        t0 = time.time()
        params, opt_state, loss, err = step(params, opt_state)
        loss = float(loss)
        epoch_times.append(round(time.time() - t0, 3))
        losses.append(loss)
        if epoch % 10 == 0 or epoch == n_epochs - 1:
            print("Epoch %d loss %.4e (%.2f s)" % (epoch, loss,
                                                   epoch_times[-1]),
                  flush=True)
    t_rec = time.time() - t_rec0

    d = np.moveaxis(np.asarray(params["delta"]), 0, -1)  # (Y, X, Z)

    # ---- quality ----------------------------------------------------------
    def frc_frac(a, b):
        radii, frc = fourier_ring_correlation(a, b)
        thr = half_bit_threshold(radii, a.shape)
        frc = np.asarray(frc)[: len(radii)]
        above = frc > thr
        cross = int(np.argmin(above)) if not above.all() else len(radii)
        return float(above.mean()), float(radii[min(cross, len(radii) - 1)]
                                          / radii[-1])

    def corr(a, b):
        a = a - a.mean()
        b = b - b.mean()
        return float((a * b).sum()
                     / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))

    slice_frc = [frc_frac(d[:, :, z], gd[:, :, z]) for z in range(nz)]
    profile = [corr(d[:, :, z], gd[:, :, z]) for z in range(nz)]
    mid = nz // 2
    result = {
        "metric": "thick_%d_central_slice_frc_half_bit_fraction" % size,
        "value": slice_frc[mid][0],
        "unit": "fraction of rings above 1/2-bit (central slice)",
        "size": size, "nz": nz, "n_views": int(n_views),
        "tilt_m": tilt_m, "dists_cm": dists,
        "dof_slices": 2 * (psize_cm * 1e7) ** 2 / (1240.0 / energy_ev),
        "n_epochs": n_epochs, "lr": lr, "gamma": gamma,
        "phantom_seconds": round(t_phantom, 1),
        "sim_seconds": round(t_sim, 1),
        "recon_seconds": round(t_rec, 1),
        "epoch_seconds_median": float(np.median(epoch_times[1:]
                                                or epoch_times)),
        "central_slice_frc": slice_frc[mid],
        "mean_slice_frc_fraction": float(np.mean([s[0] for s in slice_frc])),
        "volume_correlation": corr(d, gd),
        "per_slice_correlation": [round(c, 4) for c in profile],
        "loss_first_last": [losses[0], losses[-1]],
        "out": out,
    }
    np.save(os.path.join(out, "losses.npy"), np.asarray(losses))
    np.save(os.path.join(out, "per_slice_correlation.npy"),
            np.asarray(profile))
    with open(os.path.join(out, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--nz", type=int, default=32)
    ap.add_argument("--n-epochs", type=int, default=150)
    ap.add_argument("--lr", type=float, default=1e-6)
    ap.add_argument("--gamma", type=float, default=1e-9)
    ap.add_argument("--tilt-m", type=int, default=64)
    ap.add_argument("--n-dists", type=int, default=3)
    ap.add_argument("--out", default=None)
    a = ap.parse_args()
    run(a.size, a.nz, a.n_epochs, a.lr, a.gamma, tilt_m=a.tilt_m,
        n_dists=a.n_dists, out=a.out)
