"""Experiment parameter presets.

TPU-native rebuild of the reference's driver-script parameter dictionaries
(ref tensorflow_recon/reconstruct_fullfield.py:19-269,
reconstruct_ptycho.py:9-221, create_fullfield_data.py, cnn_propagator
drivers). Same experiment names and hyperparameters; phantom generation
parameters are included so each preset is self-contained (the reference's
.npy phantoms are among its missing large blobs).
"""

import numpy as np

PI = np.pi

# ---------------------------------------------------------------------------
# Full-field reconstruction presets (ref reconstruct_fullfield.py:19-269)
# ---------------------------------------------------------------------------

FULLFIELD_PRESETS = {
    "adhesin": {
        "phantom": {"kind": "adhesin", "size": 64},
        "simulate": {"energy_ev": 800, "psize_cm": 0.67e-7, "free_prop_cm": None,
                     "n_theta": 500, "theta_end": 2 * PI},
        "reconstruct": {"theta_st": 0, "theta_end": 2 * PI, "n_epochs": 5,
                        "alpha_d": 1.e-9, "alpha_b": 1.e-10, "gamma": 0,
                        "learning_rate": 1e-7, "energy_ev": 800,
                        "psize_cm": 0.67e-7, "minibatch_size": 10,
                        "n_epochs_mask_release": 200, "shrink_cycle": 9999,
                        "free_prop_cm": None, "n_batch_per_update": 1,
                        "multiscale_level": 1, "probe_type": "plane",
                        "forward_algorithm": "fresnel"},
    },
    "cone_256": {
        "phantom": {"kind": "cone_foam", "size": 256},
        "simulate": {"energy_ev": 5000, "psize_cm": 1.e-7, "free_prop_cm": 1e-4,
                     "n_theta": 500, "theta_end": 2 * PI},
        "reconstruct": {"theta_st": 0, "theta_end": 2 * PI, "n_epochs": 10,
                        "alpha_d": 1.5e-8, "alpha_b": 1.5e-9, "gamma": 1e-11,
                        "learning_rate": 1e-7, "energy_ev": 5000,
                        "psize_cm": 1.e-7, "minibatch_size": 10,
                        "n_epochs_mask_release": 10, "shrink_cycle": None,
                        "free_prop_cm": 1e-4, "n_batch_per_update": 1,
                        "multiscale_level": 3, "n_epoch_final_pass": 6,
                        "probe_type": "plane", "forward_algorithm": "fresnel"},
    },
    "cone_256_180": {
        "phantom": {"kind": "cone_foam", "size": 256},
        "simulate": {"energy_ev": 5000, "psize_cm": 1.e-7, "free_prop_cm": 1e-4,
                     "n_theta": 500, "theta_end": PI},
        "reconstruct": {"theta_st": 0, "theta_end": PI, "n_epochs": 10,
                        "alpha_d": 1.5e-8, "alpha_b": 1.5e-9, "gamma": 1e-11,
                        "learning_rate": 1e-7, "energy_ev": 5000,
                        "psize_cm": 1.e-7, "minibatch_size": 10,
                        "n_epochs_mask_release": 10, "shrink_cycle": None,
                        "free_prop_cm": 1e-4, "multiscale_level": 3,
                        "n_epoch_final_pass": 6, "probe_type": "plane",
                        "forward_algorithm": "fresnel"},
    },
    "cone_512": {
        # the reference generates this dataset (params_cone_512, ref
        # create_fullfield_data.py:31-47: 512^3 foam, 5 keV, 500 angles,
        # free_prop 1e-4) but ships no recon preset for it; recon
        # hyperparameters mirror params_cone with the unnormalized L1/TV
        # weights divided by the 8x volume ratio (same per-voxel weight)
        # and minibatch 2 (10 rotated 512^3 pairs do not fit 16 GB HBM)
        "phantom": {"kind": "cone_foam", "size": 512},
        "simulate": {"energy_ev": 5000, "psize_cm": 1.e-7, "free_prop_cm": 1e-4,
                     "n_theta": 500, "theta_end": 2 * PI},
        "reconstruct": {"theta_st": 0, "theta_end": 2 * PI, "n_epochs": 10,
                        "alpha_d": 1.9e-9, "alpha_b": 1.9e-10, "gamma": 1.25e-12,
                        "learning_rate": 1e-7, "energy_ev": 5000,
                        "psize_cm": 1.e-7, "minibatch_size": 2,
                        "n_epochs_mask_release": 10, "shrink_cycle": None,
                        "free_prop_cm": 1e-4, "n_batch_per_update": 1,
                        "multiscale_level": 3, "n_epoch_final_pass": 6,
                        "probe_type": "plane", "forward_algorithm": "fresnel"},
    },
    "cone_far": {
        "phantom": {"kind": "cone_foam", "size": 256},
        "simulate": {"energy_ev": 5000, "psize_cm": 1.e-7, "free_prop_cm": "inf",
                     "n_theta": 500, "theta_end": 2 * PI},
        "reconstruct": {"theta_st": 0, "theta_end": 2 * PI, "n_epochs": 10,
                        "alpha_d": 0, "alpha_b": 0, "gamma": 0,
                        "learning_rate": 1e-7, "energy_ev": 5000,
                        "psize_cm": 1.e-7, "minibatch_size": 10,
                        "n_epochs_mask_release": 10, "shrink_cycle": 1,
                        "free_prop_cm": "inf", "multiscale_level": 3,
                        "n_epoch_final_pass": 6, "probe_type": "plane",
                        "forward_algorithm": "fresnel"},
    },
    "2d": {
        # flat = projected object: delta/beta hold the whole sample's
        # optical thickness in one 1-voxel slice (phase ~1 rad at 5 keV,
        # the regime the reference's measured 2D datasets live in and its
        # lr 2e-4/4e-3 presets were tuned for)
        "phantom": {"kind": "cone_foam", "size": 512, "flat": True,
                    "delta": 4e-2, "beta": 2.4e-3},
        "simulate": {"energy_ev": 5000, "psize_cm": 1.e-7,
                     "free_prop_cm": 1e-4, "n_theta": 1, "theta_end": 0},
        "reconstruct": {"theta_st": 0, "theta_end": 0, "n_epochs": 200,
                        "alpha_d": 0, "alpha_b": 0, "gamma": 1e-11,
                        "learning_rate": 2e-4, "energy_ev": 5000,
                        "psize_cm": 1.e-7, "minibatch_size": 1,
                        "n_epochs_mask_release": 1000, "shrink_cycle": 5,
                        "free_prop_cm": 1e-4, "multiscale_level": 1,
                        "probe_type": "plane", "object_type": "phase_only",
                        "forward_algorithm": "fresnel", "obj_dim_z": 1},
    },
    "2d_cell": {
        "phantom": {"kind": "cone_foam", "size": 1024, "flat": True,
                    "delta": 4e-2, "beta": 2.4e-3},
        "simulate": {"energy_ev": 5000, "psize_cm": 1.e-7,
                     "free_prop_cm": 0.00040322580645161285, "n_theta": 1,
                     "theta_end": 0},
        "reconstruct": {"theta_st": 0, "theta_end": 0, "n_epochs": 200,
                        "alpha_d": 0, "alpha_b": 0, "gamma": 1e-9,
                        "learning_rate": 4e-3, "energy_ev": 5000,
                        "psize_cm": 1.e-7, "minibatch_size": 1,
                        "n_epochs_mask_release": 1000, "shrink_cycle": None,
                        "free_prop_cm": 0.00040322580645161285,
                        "multiscale_level": 1, "probe_type": "plane",
                        "object_type": "phase_only",
                        "forward_algorithm": "fresnel", "obj_dim_z": 1},
    },
    # 2d_cell scaled beyond the reference's largest plane (1024^2,
    # ref reconstruct_fullfield.py:160-206): same recipe, 4x / 16x the
    # plane area; free_prop_cm scales with the critical-sampling distance
    # (z_crit ~ L * psize / lambda, simulation/wave_prop_overview.ipynb)
    "2d_cell_2048": {
        "phantom": {"kind": "cone_foam", "size": 2048, "flat": True,
                    "delta": 4e-2, "beta": 2.4e-3},
        "simulate": {"energy_ev": 5000, "psize_cm": 1.e-7,
                     "free_prop_cm": 2 * 0.00040322580645161285, "n_theta": 1,
                     "theta_end": 0},
        "reconstruct": {"theta_st": 0, "theta_end": 0, "n_epochs": 200,
                        "alpha_d": 0, "alpha_b": 0, "gamma": 1e-9,
                        "learning_rate": 4e-3, "energy_ev": 5000,
                        "psize_cm": 1.e-7, "minibatch_size": 1,
                        "n_epochs_mask_release": 1000, "shrink_cycle": None,
                        "free_prop_cm": 2 * 0.00040322580645161285,
                        "multiscale_level": 1, "probe_type": "plane",
                        "object_type": "phase_only",
                        "forward_algorithm": "fresnel", "obj_dim_z": 1},
    },
    "2d_cell_4096": {
        # n_bubbles capped: the default (size//8)^2 = 262k would be >10 min
        # of host rasterization; the cap only thins the foam density
        "phantom": {"kind": "cone_foam", "size": 4096, "flat": True,
                    "delta": 4e-2, "beta": 2.4e-3, "n_bubbles": 60000},
        "simulate": {"energy_ev": 5000, "psize_cm": 1.e-7,
                     "free_prop_cm": 4 * 0.00040322580645161285, "n_theta": 1,
                     "theta_end": 0},
        "reconstruct": {"theta_st": 0, "theta_end": 0, "n_epochs": 200,
                        "alpha_d": 0, "alpha_b": 0, "gamma": 1e-9,
                        "learning_rate": 4e-3, "energy_ev": 5000,
                        "psize_cm": 1.e-7, "minibatch_size": 1,
                        "n_epochs_mask_release": 1000, "shrink_cycle": None,
                        "free_prop_cm": 4 * 0.00040322580645161285,
                        "multiscale_level": 1, "probe_type": "plane",
                        "object_type": "phase_only",
                        "forward_algorithm": "fresnel", "obj_dim_z": 1},
    },
    "cone_noisy": {
        "phantom": {"kind": "cone_foam", "size": 256},
        "simulate": {"energy_ev": 5000, "psize_cm": 1.e-7, "free_prop_cm": 1e-4,
                     "n_theta": 500, "theta_end": 2 * PI,
                     "n_photons_total": 1e7},
        "reconstruct": {"theta_st": 0, "theta_end": 2 * PI, "n_epochs": 10,
                        "alpha_d": 1.5e-7, "alpha_b": 1.5e-8, "gamma": 5e-8,
                        "learning_rate": 1e-7, "energy_ev": 5000,
                        "psize_cm": 1.e-7, "minibatch_size": 10,
                        "n_epochs_mask_release": 10, "shrink_cycle": 1,
                        "free_prop_cm": 1e-4, "multiscale_level": 3,
                        "n_epoch_final_pass": 6, "probe_type": "plane",
                        "forward_algorithm": "fresnel"},
    },
    "cone_pp": {
        "phantom": {"kind": "cone_foam", "size": 256},
        "simulate": {"energy_ev": 5000, "psize_cm": 1.e-7, "free_prop_cm": 1e-4,
                     "n_theta": 500, "theta_end": 2 * PI},
        "reconstruct": {"theta_st": 0, "theta_end": 2 * PI, "n_epochs": 7,
                        "alpha_d": 1.5e-7, "alpha_b": 1.5e-8, "gamma": 1e-7,
                        "learning_rate": 1e-7, "energy_ev": 5000,
                        "psize_cm": 1.e-7, "minibatch_size": 5,
                        "shrink_cycle": 1, "free_prop_cm": 1e-4,
                        "multiscale_level": 3, "n_epoch_final_pass": 6,
                        "probe_type": "point", "forward_algorithm": "fresnel",
                        "dist_to_source_cm": 1e-4, "det_psize_cm": 3e-7,
                        "theta_max": PI / 15, "phi_max": PI / 15},
    },
}

# ---------------------------------------------------------------------------
# Ptychography presets (ref reconstruct_ptycho.py:9-221)
# ---------------------------------------------------------------------------

PTYCHO_PRESETS = {
    "adhesin_ptycho": {
        "phantom": {"kind": "adhesin", "size": 64},
        "simulate": {"energy_ev": 800, "psize_cm": 0.67e-7, "n_theta": 500,
                     "theta_end": 2 * PI, "probe_size": (18, 18),
                     "probe_mag_sigma": 10, "probe_phase_sigma": 10,
                     "probe_phase_max": 0.5},
        "reconstruct": {"theta_st": 0, "theta_end": 2 * PI, "n_epochs": 5,
                        "obj_size": (64, 64, 64), "alpha_d": 1e-9,
                        "alpha_b": 1e-10, "gamma": 0, "probe_size": (18, 18),
                        "learning_rate": 1e-7, "energy_ev": 800,
                        "psize_cm": 0.67e-7, "multiscale_level": 1,
                        "n_dp_batch": 50, "probe_type": "gaussian",
                        "probe_mag_sigma": 10, "probe_phase_sigma": 10,
                        "probe_phase_max": 0.5,
                        "forward_algorithm": "fresnel",
                        "object_type": "normal"},
        "probe_pos": [(y, x) for y in np.linspace(9, 55, 23, dtype=int)
                      for x in np.linspace(9, 55, 23, dtype=int)],
    },
    "cone_ptycho": {
        "phantom": {"kind": "cone_foam", "size": 256},
        "simulate": {"energy_ev": 5000, "psize_cm": 1.e-7, "n_theta": 500,
                     "theta_end": 2 * PI, "probe_size": (72, 72),
                     "probe_mag_sigma": 6, "probe_phase_sigma": 6,
                     "probe_phase_max": 0.5},
        "reconstruct": {"theta_st": 0, "theta_end": 2 * PI,
                        "theta_downsample": 5, "n_epochs": 5,
                        "obj_size": (256, 256, 256), "alpha_d": 1e-9,
                        "alpha_b": 1e-10, "gamma": 1e-9,
                        "probe_size": (72, 72), "learning_rate": 1e-7,
                        "energy_ev": 5000, "psize_cm": 1.e-7,
                        "multiscale_level": 1, "n_dp_batch": 20,
                        "probe_type": "gaussian", "probe_mag_sigma": 6,
                        "probe_phase_sigma": 6, "probe_phase_max": 0.5,
                        "forward_algorithm": "fresnel"},
        "probe_pos": [(y, x) for y in np.arange(23) * 12
                      for x in np.arange(23) * 12],
    },
    # single-projection 2D ptycho (ref params_2d, reconstruct_ptycho.py:81-113)
    "ptycho_2d": {
        "phantom": {"kind": "cone_foam", "size": 256, "flat": True},
        "simulate": {"energy_ev": 5000, "psize_cm": 1.e-7, "n_theta": 1,
                     "theta_end": 0, "probe_size": (72, 72),
                     "probe_mag_sigma": 6, "probe_phase_sigma": 6,
                     "probe_phase_max": 0.5},
        "reconstruct": {"theta_st": 0, "theta_end": 0, "n_epochs": 500,
                        "obj_size": (256, 256, 1), "alpha_d": 0,
                        "alpha_b": 0, "gamma": 5e-11, "probe_size": (72, 72),
                        "learning_rate": 1e-6, "energy_ev": 5000,
                        "psize_cm": 1.e-7, "multiscale_level": 1,
                        "n_dp_batch": 20, "probe_type": "gaussian",
                        "probe_mag_sigma": 6, "probe_phase_sigma": 6,
                        "probe_phase_max": 0.5,
                        "forward_algorithm": "fresnel",
                        "object_type": "normal"},
        "probe_pos": [(y, x) for y in np.arange(23) * 12
                      for x in np.arange(23) * 12],
    },
    # phase-only 2D cell (ref params_2d_cell, reconstruct_ptycho.py:115-151;
    # the reference's measured cell dataset is replaced by a flat phantom —
    # its data file is not in the repository)
    "cell_ptycho_2d": {
        "phantom": {"kind": "cone_foam", "size": 325, "flat": True},
        "simulate": {"energy_ev": 5000, "psize_cm": 1.e-7, "n_theta": 1,
                     "theta_end": 0, "probe_size": (72, 72),
                     "probe_mag_sigma": 6, "probe_phase_sigma": 6,
                     "probe_phase_max": 0.5},
        "reconstruct": {"theta_st": 0, "theta_end": 0, "n_epochs": 200,
                        "obj_size": (325, 325, 1), "alpha_d": 0,
                        "alpha_b": 0, "gamma": 0, "probe_size": (72, 72),
                        "learning_rate": 4e-3, "energy_ev": 5000,
                        "psize_cm": 1.e-7, "multiscale_level": 1,
                        "n_dp_batch": 20, "probe_type": "gaussian",
                        "probe_mag_sigma": 6, "probe_phase_sigma": 6,
                        "probe_phase_max": 0.5,
                        "forward_algorithm": "fresnel",
                        "object_type": "phase_only"},
        "probe_pos": [(y, x) for y in np.arange(33) * 10
                      for x in np.arange(34) * 10],
    },
    # Poisson-noisy cone resume run (ref params_cone_marc_noisy,
    # reconstruct_ptycho.py:153-188; the reference warm-starts from a prior
    # reconstruction via initial_guess — pass one to reconstruct_ptychography)
    "cone_ptycho_noisy": {
        "phantom": {"kind": "cone_foam", "size": 256},
        "simulate": {"energy_ev": 5000, "psize_cm": 1.e-7, "n_theta": 500,
                     "theta_end": 2 * PI, "probe_size": (72, 72),
                     "probe_mag_sigma": 6, "probe_phase_sigma": 6,
                     "probe_phase_max": 0.5, "n_photons_total": 2e5},
        "reconstruct": {"theta_st": 0, "theta_end": 2 * PI, "n_epochs": 1,
                        "obj_size": (256, 256, 256), "alpha_d": 1e-9,
                        "alpha_b": 1e-10, "gamma": 1e-9,
                        "probe_size": (72, 72), "learning_rate": 1e-7,
                        "energy_ev": 5000, "psize_cm": 1.e-7,
                        "multiscale_level": 1, "n_dp_batch": 20,
                        "probe_type": "gaussian", "probe_mag_sigma": 6,
                        "probe_phase_sigma": 6, "probe_phase_max": 0.5,
                        "forward_algorithm": "fresnel"},
        "probe_pos": [(y, x) for y in np.arange(23) * 12
                      for x in np.arange(23) * 12],
    },
    # finite-difference (BPM) forward cone ptycho (ref params_cone,
    # reconstruct_ptycho.py:190-221, forward_algorithm='fd')
    "cone_ptycho_fd": {
        "phantom": {"kind": "cone_foam", "size": 256},
        "simulate": {"energy_ev": 5000, "psize_cm": 1.e-7, "n_theta": 500,
                     "theta_end": 2 * PI, "probe_size": (72, 72),
                     "probe_mag_sigma": 6, "probe_phase_sigma": 6,
                     "probe_phase_max": 0.5},
        "reconstruct": {"theta_st": 0, "theta_end": 2 * PI, "n_epochs": 1,
                        "obj_size": (256, 256, 256), "alpha_d": 0,
                        "alpha_b": 0, "gamma": 0, "probe_size": (72, 72),
                        "learning_rate": 1e-7, "energy_ev": 5000,
                        "psize_cm": 1.e-7, "multiscale_level": 1,
                        "n_dp_batch": 100, "probe_type": "gaussian",
                        "probe_mag_sigma": 6, "probe_phase_sigma": 6,
                        "probe_phase_max": 0.5, "forward_algorithm": "fd"},
        "probe_pos": [(y, x) for y in np.arange(23) * 12
                      for x in np.arange(23) * 12],
    },
}


def make_phantom(spec):
    """Instantiate the phantom described by a preset's ``phantom`` block."""
    from ..models.phantom import adhesin_phantom, cone_foam_phantom
    kind = spec["kind"]
    size = spec["size"]
    flat = spec.get("flat")
    if kind == "adhesin":
        gd, gb = adhesin_phantom(size)
    elif kind == "cone_foam":
        # flat (single-slice 2D, ref params_2d / 2d_cell): rasterize only
        # the mid slab — identical values, seconds instead of ~13 min of
        # host time at 1024
        slab = (size // 2, size // 2 + 1) if flat else None
        kw = {k: spec[k] for k in ("delta", "beta", "n_bubbles")
              if k in spec}
        gd, gb = cone_foam_phantom(size, z_slab=slab, **kw)
        return gd, gb
    else:
        raise ValueError(kind)
    if flat:
        gd = gd[:, :, size // 2: size // 2 + 1]
        gb = gb[:, :, size // 2: size // 2 + 1]
    return gd, gb
