"""Decisive cone_pp diagnostic: engine defect vs signal floor.

The round-2 cone_pp closed loop (params_cone_pp hyperparameters,
ref reconstruct_fullfield.py:238-269) recorded a loss flat at ~8e-9 and FSC
at noise. Two hypotheses were left open on the record:

  (A) signal floor — the cone-beam forward at these hyperparameters is
      (nearly) insensitive to the object, so no optimizer can descend;
  (B) engine defect — the spherical-resample gradient is too inexact to
      descend (the separable resample's adjoint is the exact transposed
      einsum, but that had not been demonstrated on the workload).

This script separates them with direct measurements on the SAME cached data
the artifact used (model-matched simulation through the split spherical
forward):

  1. available signal:  err(empty object)  = E[(|psi_0| - |data|)^2]
  2. model-match floor: err(ground truth)  — float32 noise of the forward
  3. starting point:    err(engine random init)
  4. regularizer scale: alpha_d*L1 + alpha_b*L1 + gamma*TV at init, vs err
  5. gradient quality:  cosine( -grad err |_random , x_GT - x_random )
  6. descent probe:     Adam on err only, lr sweep {1e-7 (preset), 1e-6,
                        1e-5}, 60 steps on a fixed 25-angle subset

If (2) ~= (3) the data carries no usable gradient signal (hypothesis A,
quantified); if (2) << (3) but 6 stalls at the preset lr while larger lr
descends, the preset lr is the binding constraint; if the cosine in 5 is
near zero, hypothesis B.

Writes benchmarks/artifacts/cone_pp_256/diagnostic.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(size=256, n_theta=500, n_probe_angles=25,
         out="benchmarks/artifacts/cone_pp_256"):
    import jax
    import jax.numpy as jnp
    from beyond_dof_tpu.constants import PI
    from beyond_dof_tpu.models.phantom import cone_foam_phantom
    from beyond_dof_tpu.models.fullfield import rotate_and_project_batch_split
    from beyond_dof_tpu.ops.spherical import build_spherical_plan
    from beyond_dof_tpu.ops.regularizers import (l1_norm, total_variation_3d)

    sph = dict(dist_to_source_cm=1e-4, det_psize_cm=3e-7,
               theta_max=PI / 15, phi_max=PI / 15)
    cache = os.path.join(out, "sim_cache_%d_%d.npy" % (size, n_theta))
    data = np.load(cache)
    theta_ls = -np.linspace(0, 2 * np.pi, n_theta).astype(np.float32)
    gd, gb = cone_foam_phantom(size)

    plan = build_spherical_plan((size, size, size), 5000, 1e-7,
                                sph["dist_to_source_cm"],
                                det_psize_cm=sph["det_psize_cm"],
                                theta_max=sph["theta_max"],
                                phi_max=sph["phi_max"], free_prop_cm=1e-4)
    ones = jnp.ones((size, size), jnp.float32)
    zeros = jnp.zeros((size, size), jnp.float32)

    def err_fn(d, b, th, mag, plan):
        re, im = rotate_and_project_batch_split(
            d, b, th, ones, zeros, 5000, 1e-7, free_prop_cm=1e-4,
            forward_algorithm="spherical", plan=plan, **sph)
        return jnp.mean((jnp.sqrt(re * re + im * im) - mag) ** 2)

    err_jit = jax.jit(err_fn)
    vg = jax.jit(jax.value_and_grad(err_fn, argnums=(0, 1)))

    # fixed evenly-spaced probe subset, batches of 5 (the preset minibatch)
    batch = 5
    idx = np.linspace(0, n_theta - 1, n_probe_angles).astype(int)
    ths = jnp.asarray(theta_ls[idx])
    mags = jnp.asarray(np.abs(data[idx]).astype(np.float32))

    def mean_err(d, b):
        es = [float(err_jit(d, b, ths[i:i + batch], mags[i:i + batch], plan))
              for i in range(0, n_probe_angles, batch)]
        return float(np.mean(es))

    gd_d, gb_d = jnp.asarray(gd), jnp.asarray(gb)
    zero_d = jnp.zeros_like(gd_d)

    # engine random init (recon/fullfield._init_object defaults, seed 0)
    rng = np.random.RandomState(0)
    d0 = rng.normal(size=gd.shape, loc=8.7e-7, scale=1e-7)
    b0 = rng.normal(size=gd.shape, loc=5.1e-8, scale=1e-8)
    d0[d0 < 0] = 0
    b0[b0 < 0] = 0
    d0 = jnp.asarray(d0.astype(np.float32))
    b0 = jnp.asarray(b0.astype(np.float32))

    t0 = time.time()
    res = {}
    mag_np = np.abs(data[idx])
    res["data_mag_mean"] = float(mag_np.mean())
    res["data_mag_std"] = float(mag_np.std())
    res["err_empty"] = mean_err(zero_d, zero_d)
    res["err_ground_truth"] = mean_err(gd_d, gb_d)
    res["err_random_init"] = mean_err(d0, b0)
    print("signal (empty)=%.3e  floor (GT)=%.3e  random=%.3e  t=%.0fs"
          % (res["err_empty"], res["err_ground_truth"],
             res["err_random_init"], time.time() - t0), flush=True)

    # regularizer magnitudes at the random init (preset alphas)
    alpha_d, alpha_b, gamma = 1.5e-7, 1.5e-8, 1e-7
    res["reg_l1_delta"] = float(alpha_d * l1_norm(d0))
    res["reg_l1_beta"] = float(alpha_b * l1_norm(b0))
    res["reg_tv_delta"] = float(gamma * total_variation_3d(d0))
    res["reg_total_at_init"] = (res["reg_l1_delta"] + res["reg_l1_beta"]
                                + res["reg_tv_delta"])
    print("reg at init: l1_d=%.3e l1_b=%.3e tv=%.3e (err scale %.3e)"
          % (res["reg_l1_delta"], res["reg_l1_beta"], res["reg_tv_delta"],
             res["err_random_init"]), flush=True)

    # gradient alignment with the direction to ground truth
    gd_sum = None
    gb_sum = None
    for i in range(0, n_probe_angles, batch):
        _, (gdd, gbb) = vg(d0, b0, ths[i:i + batch], mags[i:i + batch], plan)
        gd_sum = gdd if gd_sum is None else gd_sum + gdd
        gb_sum = gbb if gb_sum is None else gb_sum + gbb
    g = jnp.concatenate([gd_sum.ravel(), gb_sum.ravel()])
    direction = jnp.concatenate([(gd_d - d0).ravel(), (gb_d - b0).ravel()])
    res["grad_norm"] = float(jnp.linalg.norm(g))
    res["grad_cosine_to_truth"] = float(
        jnp.vdot(-g, direction)
        / (jnp.linalg.norm(g) * jnp.linalg.norm(direction) + 1e-30))
    print("grad norm=%.3e  cosine(-g, x*-x0)=%.4f t=%.0fs"
          % (res["grad_norm"], res["grad_cosine_to_truth"],
             time.time() - t0), flush=True)

    # descent probe: Adam on err only (no regularizers), fixed subset
    import optax

    def descend(lr, n_steps=60):
        tx = optax.adam(lr)
        params = {"d": d0, "b": b0}
        state = tx.init(params)

        @jax.jit
        def step(params, state, th, mag, plan):
            def loss(p):
                return err_fn(p["d"], p["b"], th, mag, plan)
            val, grads = jax.value_and_grad(loss)(params)
            ups, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, ups)
            params = jax.tree.map(lambda x: jnp.maximum(x, 0.0), params)
            return params, state, val

        traj = []
        for s in range(n_steps):
            i = (s * batch) % n_probe_angles
            params, state, val = step(params, state, ths[i:i + batch],
                                      mags[i:i + batch], plan)
            traj.append(float(val))
        final = mean_err(params["d"], params["b"])
        return traj, final

    res["descent"] = {}
    for lr in (1e-7, 1e-6, 1e-5):
        traj, final = descend(lr)
        res["descent"]["lr_%g" % lr] = {
            "first_losses": traj[:3], "last_losses": traj[-3:],
            "final_mean_err": final}
        print("lr=%g: %.3e -> %.3e (mean err after: %.3e) t=%.0fs"
              % (lr, traj[0], traj[-1], final, time.time() - t0), flush=True)

    res["wall_s"] = round(time.time() - t0, 1)
    with open(os.path.join(out, "diagnostic.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    main()
