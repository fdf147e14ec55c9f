"""Beyond-VMEM closed loop: thick-slab holography at a 2048^2+ plane.

The reference's entire reason to exist is scaling the transverse plane of
the multislice AD reconstruction (ref README.md:1-11; the truncated-kernel
propagator cnn_propagator/propagation.py:18-133 exists only to decompose
big planes) — yet its largest reconstructed plane is 1024^2
(ref reconstruct_fullfield.py:160-206). This artifact reconstructs a
(NZ, N, N) slab at N >= 2048 end to end ON ONE CHIP, with every forward
and backward multislice propagation running through the blocked two-pass
Pallas kernel's invertible AD path (the production auto-route for >1024^2
planes in ops/multislice.py).

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

Relay-safe structure (the gotchas that killed earlier big-plane benches):
  * probes are built ON DEVICE (jitted tilt ramps) — no multi-100MB
    closure constants in the compile POST;
  * the measured magnitudes and the per-distance detector kernels are jit
    ARGUMENTS (device-resident between steps), never closures;
  * the phantom slab is uploaded slice-by-slice (16 MB chunks), the
    result downloaded the same way;
  * the multislice exit field is distance-independent, so the loss scans
    the probe axis ONCE (5 blocked sweeps/epoch, not 15) and fans out to
    the distance series with three split-DFT kernel applications.

Quality is scored against the known slab: per-slice FRC (mean and central
slice), the z-integrated projection FRC (the in-focus quantity every
single-DOF method measures), the 3-D voxel correlation, per-slice and
per-DOF-band correlation profiles. Depth resolution is DOF-limited by
physics (~8 slices here); the record keeps raw numbers + profiles rather
than a single shell fraction, since 3-D FSC shells are ill-defined on a
64:1 aspect-ratio volume.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u
           benchmarks/closed_loop_thick2048.py [--size 2048] [--nz 32]
           [--n-epochs 300] [--lr 1e-6] [--n-tilts 5] [--n-dists 3]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(size=2048, nz=32, n_epochs=300, lr=1e-6, gamma=1e-9, seed=0,
        tilt_m=64, n_tilts=5, n_dists=3, out=None, n_bubbles=None,
        scoped_vmem_kib=None, single_material=False):
    import jax
    import jax.numpy as jnp
    import optax
    from beyond_dof_tpu.models.phantom import cone_foam_phantom
    from beyond_dof_tpu.models.ptycho import safe_mag
    from beyond_dof_tpu.ops.multislice import (_final_kernel,
                                               multislice_propagate_batch_split)
    from beyond_dof_tpu.ops.fresnel import ifftshift2
    from beyond_dof_tpu.ops.quality import (fourier_ring_correlation,
                                            half_bit_threshold)
    from beyond_dof_tpu.ops.regularizers import total_variation_3d
    from beyond_dof_tpu.ops.splitfft import (apply_kernel_split_perm,
                                             permute_kernel_2d)

    out = out or "benchmarks/artifacts/thick_%d" % size
    os.makedirs(out, exist_ok=True)

    # ---- phantom slab (host) + chunked upload ------------------------------
    # host rasterization is ~25 min at 4096 — cache the deterministic slab
    t0 = time.time()
    z0 = size // 2 - nz // 2
    cache = "/tmp/thick_phantom_%d_%d_%s.npz" % (size, nz, n_bubbles)
    if os.path.exists(cache):
        zf = np.load(cache)
        gd, gb = zf["gd"], zf["gb"]
    else:
        gd, gb = cone_foam_phantom(size, delta=8.7e-6, beta=5.1e-7,
                                   z_slab=(z0, z0 + nz),
                                   n_bubbles=n_bubbles)
        gd = np.ascontiguousarray(np.moveaxis(gd, -1, 0))  # (Z, Y, X)
        gb = np.ascontiguousarray(np.moveaxis(gb, -1, 0))
        np.savez(cache, gd=gd, gb=gb)
    t_phantom = time.time() - t0
    print("phantom", gd.shape, round(t_phantom, 1), "s", flush=True)

    def upload_zfirst(a):
        # slice-sized device_put chunks; single multi-100MB transfers have
        # died on the relay link before (ROUND_NOTES r4)
        return jnp.stack([jax.device_put(a[z]) for z in range(a.shape[0])])

    dz_true = upload_zfirst(gd)[:, None]  # (Z, B=1, Y, X)
    bz_true = upload_zfirst(gb)[:, None]
    print("uploaded", flush=True)

    # ---- geometry: tilt x distance series ----------------------------------
    energy_ev, psize_cm = 5000.0, 1e-7
    lmbda_nm = 1240.0 / energy_ev
    voxel_nm = np.array([psize_cm * 1e7] * 3)
    size_nm = np.array([size, size, nz]) * voxel_nm
    base_cm = 0.00040322580645161285 * (size / 1024.0)
    dists = [base_cm * (2 ** i) for i in range(n_dists)]
    all_tilts = [(0, 0), (tilt_m, 0), (-tilt_m, 0), (0, tilt_m),
                 (0, -tilt_m), (tilt_m, tilt_m), (-tilt_m, -tilt_m)]
    tilts = all_tilts[:n_tilts]

    @jax.jit
    def make_probes():
        y = jnp.arange(size, dtype=jnp.float32)[:, None]
        x = jnp.arange(size, dtype=jnp.float32)[None, :]
        res_re, res_im = [], []
        for my, mx in tilts:
            ph = (2.0 * np.pi / size) * (my * y + mx * x)
            res_re.append(jnp.cos(ph))
            res_im.append(jnp.sin(ph))
        return jnp.stack(res_re), jnp.stack(res_im)

    probes_re, probes_im = make_probes()
    probes_re.block_until_ready()

    # per-distance detector kernels, pre-permuted into the split-DFT
    # frequency order (same as the engine's free-prop tail,
    # ops/multislice.py) — device args, one 16/64 MB put per plane
    h2r, h2i = [], []
    for dist in dists:
        h2 = _final_kernel(dist * 1e7, lmbda_nm, voxel_nm, (size, size),
                           size_nm, "TF")
        h2p = permute_kernel_2d(ifftshift2(np.asarray(h2)))
        h2r.append(jax.device_put(np.real(h2p).astype(np.float32)))
        h2i.append(jax.device_put(np.imag(h2p).astype(np.float32)))
    h2r = jnp.stack(h2r)
    h2i = jnp.stack(h2i)
    print("kernels ready", flush=True)

    def exit_field(dz, bz, p_re, p_im):
        re, im = multislice_propagate_batch_split(
            dz, bz, p_re, p_im, energy_ev, psize_cm, free_prop_cm=None,
            propagate_last=True, remat="invertible", grids_zfirst=True)
        return re[0], im[0]

    def detector_mags(re, im, kr, ki):
        def one(carry, h):
            dre, dim = apply_kernel_split_perm(re[None], im[None],
                                               h[0], h[1])
            return carry, safe_mag(dre[0], dim[0])
        _, mags = jax.lax.scan(one, 0.0, (kr, ki))
        return mags  # (n_dists, N, N)

    # ---- simulate the tilt x distance hologram series ----------------------
    @jax.jit
    def simulate(dz, bz, p_re, p_im, kr, ki):
        def per_probe(carry, probe):
            re, im = exit_field(dz, bz, probe[0], probe[1])
            return carry, detector_mags(re, im, kr, ki)
        _, mags = jax.lax.scan(per_probe, 0.0, (p_re, p_im))
        return mags  # (n_tilts, n_dists, N, N)

    t0 = time.time()
    mags_meas = simulate(dz_true, bz_true, probes_re, probes_im, h2r, h2i)
    mags_meas.block_until_ready()
    t_sim = time.time() - t0
    print("simulated", mags_meas.shape, round(t_sim, 1), "s", flush=True)

    # the true slab is only needed again for host-side scoring (gd/gb
    # stay on the host) — free its 2 x nz x N^2 device copy before the
    # train step compiles. At 4096^2/nz=16 this is 2.0 GiB of the HBM
    # headroom the step needs (attempt c OOMed at 17.27/15.75 GiB).
    dz_true.delete()
    bz_true.delete()
    del dz_true, bz_true

    # ---- reconstruct --------------------------------------------------------
    n_views = float(n_tilts * n_dists)

    # single-material mode: the phantom IS one material (beta/delta constant
    # everywhere — same Paganin-type constraint the reference's mask
    # bootstrap leans on, ref util.py:1094-1119), so beta = r*delta is an
    # EXACT reparameterization, not a prior. Optimizing delta alone halves
    # params/grads/Adam moments: -4 GiB of the 4.53 GiB HBM overshoot that
    # killed the 4096^2 attempt e.
    beta_ratio = 5.1e-7 / 8.7e-6  # the phantom's material constants above

    def loss_fn(params, p_re, p_im, kr, ki, meas):
        if single_material:
            dz = params["delta"][:, None]
            bz = beta_ratio * dz
        else:
            dz, bz = params["delta"][:, None], params["beta"][:, None]

        def per_probe(carry, xs):
            pr, pi, meas_p = xs
            re, im = exit_field(dz, bz, pr, pi)
            mags = detector_mags(re, im, kr, ki)
            return carry + jnp.sum(jnp.mean(
                (mags - meas_p) ** 2, axis=(-2, -1))), None

        err, _ = jax.lax.scan(per_probe, jnp.float32(0.0),
                              (p_re, p_im, meas))
        err = err / n_views
        reg = gamma * total_variation_3d(params["delta"])
        return err + reg, err

    # under single-material also store the Adam first moment in bf16
    # (mu_dtype; nu stays f32 for the sqrt normalization) — another
    # 0.5 GiB at 4096^2/nz=16, recorded in the result json
    tx = optax.adam(lr, mu_dtype=jnp.bfloat16 if single_material else None)
    params = {"delta": jnp.zeros((nz, size, size), jnp.float32)}
    if not single_material:
        params["beta"] = jnp.zeros((nz, size, size), jnp.float32)
    opt_state = tx.init(params)

    def step_impl(params, opt_state, p_re, p_im, kr, ki, meas):
        (loss, err), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, p_re, p_im, kr, ki, meas)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = jax.tree.map(lambda a: jnp.maximum(a, 0.0), params)
        return params, opt_state, loss, err

    # at 4096^2 the train step's pallas_call fusion needs a >16 MB scoped
    # VMEM allocation; the TPU-only flag can't go through XLA_FLAGS (the
    # client-side CPU XLA fatals on unknown flags) — pass it per-compile
    co = ({"xla_tpu_scoped_vmem_limit_kib": str(scoped_vmem_kib)}
          if scoped_vmem_kib else None)
    # donate params + opt_state: without donation the step holds both the
    # old and new (params, mu, nu) triples live across the update — an
    # extra 6 GiB at 4096^2/nz=16, the bulk of attempt c's 1.52 GiB OOM
    # overshoot
    step = jax.jit(step_impl, donate_argnums=(0, 1), compiler_options=co)

    losses, epoch_times = [], []
    t_rec0 = time.time()
    for epoch in range(n_epochs):
        t0 = time.time()
        params, opt_state, loss, err = step(params, opt_state, probes_re,
                                            probes_im, h2r, h2i, mags_meas)
        loss = float(loss)
        epoch_times.append(round(time.time() - t0, 3))
        losses.append(loss)
        if epoch % 20 == 0 or epoch == n_epochs - 1:
            print("Epoch %d loss %.4e (%.2f s)" % (epoch, loss,
                                                   epoch_times[-1]),
                  flush=True)
    t_rec = time.time() - t_rec0

    # chunked download (Z, Y, X)
    d = np.stack([np.asarray(params["delta"][z]) for z in range(nz)])

    # ---- quality ------------------------------------------------------------
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

    slice_frc = [frc_frac(d[z], gd[z]) for z in range(nz)]
    profile = [corr(d[z], gd[z]) for z in range(nz)]
    proj_frc = frc_frac(d.sum(0), gd.sum(0))
    dof_slices = 2 * (psize_cm * 1e7) ** 2 / lmbda_nm  # slices per DOF
    band = max(1, int(round(dof_slices)))
    dof_bands = [corr(d[i:i + band].sum(0), gd[i:i + band].sum(0))
                 for i in range(0, nz - band + 1, band)]
    mid = nz // 2
    result = {
        "metric": "thick_%d_projection_frc_half_bit_fraction" % size,
        "value": proj_frc[0],
        "unit": "fraction of rings above 1/2-bit (z-integrated projection)",
        "size": size, "nz": nz, "n_views": int(n_views),
        "tilt_m": tilt_m, "n_tilts": n_tilts, "dists_cm": dists,
        "dof_slices": dof_slices,
        "n_epochs": n_epochs, "lr": lr, "gamma": gamma,
        "single_material": single_material,
        "phantom_seconds": round(t_phantom, 1),
        "sim_seconds": round(t_sim, 1),
        "recon_seconds": round(t_rec, 1),
        "epoch_seconds_median": float(np.median(epoch_times[1:]
                                                or epoch_times)),
        "projection_frc": proj_frc,
        "central_slice_frc": slice_frc[mid],
        "mean_slice_frc_fraction": float(np.mean([s[0] for s in slice_frc])),
        "volume_correlation": corr(d, gd),
        "per_slice_correlation": [round(c, 4) for c in profile],
        "per_dof_band_correlation": [round(c, 4) for c in dof_bands],
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
    ap.add_argument("--n-epochs", type=int, default=300)
    ap.add_argument("--lr", type=float, default=1e-6)
    ap.add_argument("--gamma", type=float, default=1e-9)
    ap.add_argument("--tilt-m", type=int, default=64)
    ap.add_argument("--n-tilts", type=int, default=5)
    ap.add_argument("--n-dists", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--n-bubbles", type=int, default=None,
                    help="cap the phantom bubble count (the default "
                         "(size//8)^2 is hours of host rasterization at "
                         "4096; the slab only intersects a fraction anyway)")
    ap.add_argument("--scoped-vmem-kib", type=int, default=None,
                    help="raise the TPU scoped-VMEM limit for the train "
                         "step compile (needed at 4096^2)")
    ap.add_argument("--single-material", action="store_true",
                    help="optimize delta only, beta = (5.1e-7/8.7e-6)*delta "
                         "(exact for the one-material phantom; halves "
                         "params/grads/Adam state — the 4096^2 HBM lever)")
    a = ap.parse_args()
    run(a.size, a.nz, a.n_epochs, a.lr, a.gamma, tilt_m=a.tilt_m,
        n_tilts=a.n_tilts, n_dists=a.n_dists, out=a.out,
        n_bubbles=a.n_bubbles, scoped_vmem_kib=a.scoped_vmem_kib,
        single_material=a.single_material)
