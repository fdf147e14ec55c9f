"""Data-exchange HDF5 I/O and rotation-lookup persistence.

The reference stores measured/simulated data as HDF5 ``exchange/data``
complex64 stacks (data-exchange standard, ref tensorflow_recon/
simulation.py:49-51) and rotation lookup tables as pickled/.npy folders named
``arrsize_{Y}_{X}_{X}_ntheta_{N}`` (ref util.py:760-767).
"""

import os

import numpy as np
import h5py

__all__ = ["write_exchange_data", "read_exchange_data", "open_exchange_data",
           "save_rotation_lookup", "load_rotation_lookup", "lookup_folder_name"]


def write_exchange_data(fname, data):
    """Write an ``exchange/data`` complex64 dataset (creating the file)."""
    d = os.path.dirname(fname)
    if d:
        os.makedirs(d, exist_ok=True)
    with h5py.File(fname, "w") as f:
        grp = f.create_group("exchange")
        grp.create_dataset("data", data=np.asarray(data).astype(np.complex64))
    return fname


def read_exchange_data(fname, theta_downsample=None):
    """Read the full ``exchange/data`` stack into memory (ref fullfield.py:153-162)."""
    with h5py.File(fname, "r") as f:
        dat = f["exchange/data"][...]
    if theta_downsample is not None:
        dat = dat[::theta_downsample]
    return dat


def open_exchange_data(fname):
    """Open lazily (ptycho reads per-batch from disk, ref ptychography.py:132-134)."""
    f = h5py.File(fname, "r")
    return f, f["exchange/data"]


def lookup_folder_name(array_size, n_theta):
    """(ref util.py:761)."""
    return "arrsize_{}_{}_{}_ntheta_{}".format(array_size[0], array_size[1],
                                               array_size[2], n_theta)


def save_rotation_lookup(inds, array_size, n_theta, dest_folder=None):
    """Persist a rotation gather table from ops.rotate.rotation_lookup."""
    if dest_folder is None:
        dest_folder = lookup_folder_name(array_size, n_theta)
    os.makedirs(dest_folder, exist_ok=True)
    np.save(os.path.join(dest_folder, "gather_inds.npy"), np.asarray(inds))
    return dest_folder


def load_rotation_lookup(src_folder):
    return np.load(os.path.join(src_folder, "gather_inds.npy"))
