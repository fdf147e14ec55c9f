"""Is the retrieved probe's 0.37 pointwise error in the data's null space?

The gauge decomposition (probe_gauge_analysis.py) showed scale/ramp/defocus
explain almost none of the retrieved probe's residual vs truth — and a
no-information plane probe scores BETTER pointwise. The adhesin_ptycho
diagnostic found the same signature for object shells: components invisible
to the magnitude measurement. This closes the loop for the probe:

    simulate holograms with (TRUE object, RETRIEVED probe) and compare to
    the artifact's data (TRUE object, TRUE probe) under the training loss
    (magnitude MSE). If that residual is at the retrieved run's converged
    loss floor, the 37%-different probe is DATA-EQUIVALENT to the truth:
    the error lives in the hologram magnitude's null directions, and joint
    recovery has converged as far as the measurement can distinguish.

Controls: the plane probe through the same comparison (should sit at the
plane_mismatch run's 7e-2 loss), and the probe backprop initial guess.

Writes a "null_space_diagnostic" block into the artifact's result.json.

Usage: JAX_PLATFORMS=cpu python benchmarks/diag_probe_null.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(artifact="benchmarks/artifacts/probe_retrieval"):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from beyond_dof_tpu.models.phantom import adhesin_phantom
    from beyond_dof_tpu.models.probe import (gaussian_probe,
                                             create_probe_initial_guess)
    from beyond_dof_tpu.sim.acquire import create_fullfield_data
    from probe_gauge_analysis import load_probe

    with open(os.path.join(artifact, "result.json")) as f:
        result = json.load(f)
    n_theta = result["n_theta"]
    gd, gb = adhesin_phantom(64)
    p_true = np.asarray(gaussian_probe((64, 64), **result["true_probe"]))
    p_hat = load_probe(os.path.join(artifact, "retrieved")).astype(
        np.complex64)

    data = np.load(os.path.join(artifact, "sim_cache_%d.npy" % n_theta))
    mag_true = np.abs(data).astype(np.float32)

    from beyond_dof_tpu.configs.presets import FULLFIELD_PRESETS
    sim_kw = {k: v for k, v in
              FULLFIELD_PRESETS["adhesin"]["simulate"].items()
              if k not in ("n_theta", "probe_type")}

    def data_loss(probe):
        probe = np.asarray(probe, np.complex64)
        sim = create_fullfield_data(
            gd, gb, n_theta=n_theta, batch_size=50, probe_type="fixed",
            wavefront_initial=(np.abs(probe), np.angle(probe)), **sim_kw)
        return float(np.mean((np.abs(sim).astype(np.float32)
                              - mag_true) ** 2))

    out = {
        "loss_true_probe_control": data_loss(p_true),  # sim noise floor
        "loss_retrieved_probe_true_object": data_loss(p_hat),
        "loss_plane_probe_true_object": data_loss(
            np.ones_like(p_true)),
        # back_prop distance matches recon/fullfield.py:314-316
        # (free_prop None -> through-object distance only)
        "loss_backprop_init_true_object": data_loss(
            np.asarray(create_probe_initial_guess(
                data, sim_kw["psize_cm"] * gd.shape[2] * 1e7,
                sim_kw["energy_ev"], sim_kw["psize_cm"] * 1e7))),
        "retrieved_run_final_loss":
            result["runs"]["retrieved"]["final_loss"],
        "plane_mismatch_final_loss":
            result["runs"]["plane_mismatch"]["final_loss"],
    }
    result["runs"]["retrieved"]["null_space_diagnostic"] = out
    with open(os.path.join(artifact, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
