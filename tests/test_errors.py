"""Negative-path behavior: clear errors for invalid configurations."""

import numpy as np
import pytest

from beyond_dof_tpu.models.phantom import adhesin_phantom
from beyond_dof_tpu.models.probe import build_probe
from beyond_dof_tpu.ops.tiled import (multislice_propagate_cnn,
                                      multislice_propagate_tiled)
from beyond_dof_tpu.models.fullfield import rotate_and_project_batch
from beyond_dof_tpu.parallel.mesh import make_mesh


def _phantom():
    gd, gb = adhesin_phantom(16)
    return gd[None], gb[None], np.ones((16, 16), np.complex64)


def test_even_kernel_size_rejected():
    gd, gb, probe = _phantom()
    with pytest.raises(AssertionError, match="odd"):
        multislice_propagate_cnn(gd, gb, probe, 5000, 1e-7, kernel_size=4)


def test_halo_wider_than_tile_rejected():
    gd, gb, probe = _phantom()
    mesh = make_mesh(n_data=1, tile_yx=(4, 1))  # tiles of 4 rows
    with pytest.raises(AssertionError, match="halo"):
        multislice_propagate_tiled(gd, gb, probe, 5000, 1e-7, mesh,
                                   kernel_size=17)


def test_indivisible_tiling_rejected():
    gd, gb, probe = _phantom()
    mesh = make_mesh(n_data=1, tile_yx=(3, 1))  # 16 % 3 != 0
    with pytest.raises(AssertionError):
        multislice_propagate_tiled(gd, gb, probe, 5000, 1e-7, mesh,
                                   kernel_size=5)


def test_unknown_forward_algorithm():
    gd, gb, probe = _phantom()
    import jax.numpy as jnp
    with pytest.raises(ValueError, match="forward_algorithm"):
        rotate_and_project_batch(jnp.asarray(gd[0]), jnp.asarray(gb[0]),
                                 jnp.asarray([0.1], jnp.float32), probe,
                                 800, 0.67e-7, forward_algorithm="nope")


def test_unknown_probe_type():
    with pytest.raises(ValueError, match="probe type"):
        build_probe("warp-drive", (8, 8))


def test_mesh_too_large_rejected():
    with pytest.raises(AssertionError, match="devices"):
        make_mesh(n_data=100, tile_yx=(2, 2))
