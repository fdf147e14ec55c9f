"""Legacy ``Simulator`` facade (xdesign-style API).

TPU-native rebuild of the reference's Simulator class
(ref tensorflow_recon/util.py:31-153): holds a (delta, beta) grid plus beam
metadata and initializes wavefronts of the four supported types
('plane', 'spot', 'spherical', 'point_projection_lens').
"""

import os

import numpy as np

from ..constants import PI

__all__ = ["Simulator"]


class Simulator(object):
    """Optical simulation based on multislice propagation.

    Parameters
    ----------
    energy : float
        Beam energy in eV.
    grid : (delta_grid, beta_grid)
        Voxelized refractive-index decrement / absorption grids (Y, X, Z).
    psize : list of 3 floats
        Voxel size in cm.
    """

    def __init__(self, energy, grid=None, psize=None, type="refractive_index"):
        if type != "refractive_index":
            raise ValueError("Currently only delta and beta grids are supported.")
        if grid is not None:
            self.grid_delta, self.grid_beta = grid
        else:
            self.grid_delta = self.grid_beta = None
        self.energy_kev = energy * 1.0e-3
        self.voxel_nm = np.array(psize) * 1.0e7
        self.mean_voxel_nm = np.prod(self.voxel_nm) ** (1.0 / 3)
        self._ndim = 3
        self.size_nm = np.array(self.grid_delta.shape) * self.voxel_nm
        self.shape = list(self.grid_delta.shape)
        self.lmbda_nm = 1.24 / self.energy_kev
        temp = [np.arange(self.shape[i]) * self.voxel_nm[i] for i in range(3)]
        self.mesh = np.meshgrid(*temp, indexing="xy")
        self.wavefront = np.zeros(self.shape[:-1], dtype=np.complex64)

    def save_grid(self, save_path="data/sav/grid"):
        os.makedirs(save_path, exist_ok=True)
        np.save(os.path.join(save_path, "grid_delta"), self.grid_delta)
        np.save(os.path.join(save_path, "grid_beta"), self.grid_beta)
        np.save(os.path.join(save_path, "grid_pars"),
                np.array([self.shape, list(self.voxel_nm),
                          [self.energy_kev * 1e3] * 3], dtype=object))

    def read_grid(self, save_path="data/sav/grid"):
        self.grid_delta = np.load(os.path.join(save_path, "grid_delta.npy"))
        self.grid_beta = np.load(os.path.join(save_path, "grid_beta.npy"))

    def save_slice_images(self, save_path="data/sav/slices"):
        from ..io import tiff
        os.makedirs(save_path, exist_ok=True)
        tiff.write_tiff(self.grid_delta, os.path.join(save_path, "delta"))
        tiff.write_tiff(self.grid_beta, os.path.join(save_path, "beta"))

    def initialize_wavefront(self, type, **kwargs):
        """Initialize the incident wavefront (ref util.py:104-153).

        'plane' | 'spot' (kwargs: width) | 'spherical' (kwargs: dist_to_source)
        | 'point_projection_lens' (kwargs: focal_length, lens_sample_dist).
        """
        wave_shape = np.asarray(self.shape[:-1])
        self.wavefront = np.zeros(self.shape[:-1], dtype=np.complex64)
        if type == "plane":
            self.wavefront[...] = 1.0
        elif type == "spot":
            wid = kwargs["width"]
            radius = int(wid / 2)
            center = np.array(wave_shape / 2, dtype=int)
            self.wavefront[center[0] - radius: center[0] - radius + wid,
                           center[1] - radius: center[1] - radius + wid] = 1.0
        elif type == "spherical":
            z = kwargs["dist_to_source"]
            xx = self.mesh[0][:, :, 0].copy()
            yy = self.mesh[1][:, :, 0].copy()
            xx -= xx[0, -1] / 2
            yy -= yy[-1, 0] / 2
            r = np.sqrt(xx ** 2 + yy ** 2 + z ** 2)
            self.wavefront = np.exp(-1j * 2 * np.pi * r / self.lmbda_nm)
        elif type == "point_projection_lens":
            f = kwargs["focal_length"]
            s = kwargs["lens_sample_dist"]
            xx = self.mesh[0][:, :, 0].copy()
            yy = self.mesh[1][:, :, 0].copy()
            xx -= xx[0, -1] / 2
            yy -= yy[-1, 0] / 2
            r = np.sqrt(xx ** 2 + yy ** 2)
            theta = np.arctan(r / (s - f))
            path = np.mod(s / np.cos(theta), self.lmbda_nm)
            phase = path * 2 * PI
            wavefront = np.ones(tuple(wave_shape)).astype("complex64")
            wavefront = wavefront + 1j * np.tan(phase)
            self.wavefront = wavefront / np.abs(wavefront)
        else:
            raise ValueError("Unknown wavefront type: %s" % type)
        return self.wavefront

    def propagate(self, free_prop_cm=None, batch=False):
        """Run multislice propagation of the stored wavefront through the grid."""
        from ..ops.multislice import multislice_propagate_batch
        psize_cm = self.voxel_nm[0] * 1e-7
        out = multislice_propagate_batch(
            self.grid_delta[None], self.grid_beta[None], self.wavefront,
            self.energy_kev * 1e3, psize_cm, free_prop_cm=free_prop_cm)
        return np.asarray(out)[0]
