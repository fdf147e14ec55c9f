"""Run provenance, logging, and small host-side helpers.

TPU-native rebuild of the reference misc layer
(ref: tensorflow_recon/misc.py:3-76, util.py:1064-1066,
cnn_propagator/util.py:248-277, fullfield.py:177-198).
"""

import os
import sys

__all__ = ["SUMMARY_PRESET_PTYCHO", "SUMMARY_PRESET_PP", "SUMMARY_PRESET_FF",
           "create_summary", "print_flush", "split_tasks", "create_batches",
           "fullfield_output_folder", "ptycho_output_folder"]

SUMMARY_PRESET_PTYCHO = ['obj_size', 'probe_size', 'output_folder',
                         'theta_downsample', 'n_theta', 'n_pos', 'n_epochs',
                         'learning_rate', 'alpha_d', 'alpha_b', 'gamma',
                         'n_dp_batch', 'minibatch_size', 'free_prop_cm',
                         'psize_cm', 'energy_ev', 'fname', 'probe_mag_sigma',
                         'probe_phase_sigma', 'probe_phase_max']

SUMMARY_PRESET_PP = ['obj_size', 'output_folder', 'theta_downsample', 'n_theta',
                     'n_epochs', 'learning_rate', 'alpha_d', 'alpha_b', 'gamma',
                     'minibatch_size', 'free_prop_cm', 'psize_cm', 'energy_ev',
                     'fname', 'dist_to_source_cm', 'det_psize_cm', 'theta_max',
                     'phi_max', 'probe_type']

SUMMARY_PRESET_FF = ['obj_size', 'output_folder', 'theta_downsample', 'n_theta',
                     'n_epochs', 'learning_rate', 'alpha_d', 'alpha_b', 'gamma',
                     'minibatch_size', 'free_prop_cm', 'psize_cm', 'energy_ev',
                     'fname', 'object_type']


def create_summary(save_path, locals_dict, var_list=None, preset=None):
    """Dump selected hyperparameters to ``summary.txt`` (ref misc.py:61-76)."""
    if preset == 'ptycho':
        var_list = SUMMARY_PRESET_PTYCHO
    elif preset == 'pp':
        var_list = SUMMARY_PRESET_PP
    elif preset == 'fullfield':
        var_list = SUMMARY_PRESET_FF
    os.makedirs(save_path, exist_ok=True)
    with open(os.path.join(save_path, 'summary.txt'), 'w') as f:
        for var_name in var_list:
            f.write('{:<20}{}\n'.format(var_name, str(locals_dict.get(var_name))))


def print_flush(a, designate_rank=None, this_rank=None):
    """Rank-filtered flushed print (ref cnn_propagator/util.py:248-256)."""
    if designate_rank is None or this_rank == designate_rank:
        print(a)
        sys.stdout.flush()


def split_tasks(arr, split_size):
    """Chunk a sequence (ref ptychography.py:29-34)."""
    res = []
    ind = 0
    while ind < len(arr):
        res.append(arr[ind:min(ind + split_size, len(arr))])
        ind += split_size
    return res


create_batches = split_tasks


def fullfield_output_folder(minibatch_size, n_epochs_mask_release, shrink_cycle,
                            n_epochs, alpha_d, alpha_b, gamma, learning_rate,
                            energy_ev, dim, n_theta, free_prop_cm,
                            multiscale_level, theta_end):
    """Auto-generated output folder name (ref fullfield.py:177-198)."""
    import numpy as np
    name = ('recon_360_minibatch_{}_mskrls_{}_shrink_{}_iter_{}_alphad_{}_'
            'alphab_{}_gamma_{}_rate_{}_energy_{}_size_{}_ntheta_{}_prop_{}_'
            'ms_{}_tpu').format(minibatch_size, n_epochs_mask_release,
                                shrink_cycle, n_epochs, alpha_d, alpha_b, gamma,
                                learning_rate, energy_ev, dim, n_theta,
                                free_prop_cm, multiscale_level)
    if abs(np.pi - theta_end) < 1e-3:
        name += '_180'
    return name


def ptycho_output_folder(minibatch_size, n_epochs, alpha_d, alpha_b,
                         learning_rate, energy_ev, dim, n_theta,
                         multiscale_level, theta_end):
    """Auto-generated ptycho output folder name (ref ptychography.py:149-166)."""
    import numpy as np
    name = ('recon_ptycho_minibatch_{}_iter_{}_alphad_{}_alphab_{}_rate_{}_'
            'energy_{}_size_{}_ntheta_{}_ms_{}_tpu').format(
        minibatch_size, n_epochs, alpha_d, alpha_b, learning_rate, energy_ev,
        dim, n_theta, multiscale_level)
    if abs(np.pi - theta_end) < 1e-3:
        name += '_180'
    return name
