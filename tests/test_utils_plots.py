import os

import numpy as np
import pytest

from beyond_dof_tpu.utils.plots import plot_fsc, plot_loss_terms, dump_diffraction_data
from beyond_dof_tpu.utils.misc import (create_summary, split_tasks,
                                       fullfield_output_folder,
                                       ptycho_output_folder, print_flush)
from beyond_dof_tpu.io.exchange import write_exchange_data
from beyond_dof_tpu.io import tiff
from beyond_dof_tpu.ops.pallas_kernels import multislice_pallas_split
from beyond_dof_tpu.ops.multislice import multislice_propagate_batch
from beyond_dof_tpu.models.phantom import adhesin_phantom


def test_plot_fsc_outputs(tmp_path):
    rng = np.random.RandomState(0)
    vol = rng.rand(16, 16, 16).astype(np.float32)
    radii, curve = plot_fsc(vol, vol, save_path=str(tmp_path / "fsc"))
    assert os.path.exists(str(tmp_path / "fsc" / "fsc.npy"))
    assert np.all(np.asarray(curve)[: len(radii)] > 0.99)


def test_plot_loss_terms(tmp_path):
    f = tmp_path / "loss.txt"
    f.write_text("1e-7 5.5636 5.5570 0.0066\n1e-6 5.6 5.5 0.1\n")
    dat = plot_loss_terms(str(f), save_path=str(tmp_path / "lt.pdf"))
    assert dat.shape == (2, 4)


def test_dump_diffraction_data(tmp_path):
    data = (np.random.rand(3, 8, 8) + 1j * np.random.rand(3, 8, 8)).astype(np.complex64)
    h5 = str(tmp_path / "d.h5")
    write_exchange_data(h5, data)
    dest = dump_diffraction_data(h5, dest_folder=str(tmp_path / "raw"))
    mag = tiff.read_tiff(os.path.join(dest, "mag.tiff"))
    assert mag.shape == (3, 8, 8)
    assert np.abs(mag - np.abs(data)).max() < 1e-6


def test_create_summary_and_misc(tmp_path):
    create_summary(str(tmp_path), {"obj_size": (4, 4, 4), "n_theta": 10},
                   var_list=["obj_size", "n_theta", "missing"])
    text = (tmp_path / "summary.txt").read_text()
    assert "obj_size" in text and "None" in text
    assert split_tasks(list(range(5)), 2) == [[0, 1], [2, 3], [4]]
    assert "minibatch_10" in fullfield_output_folder(
        10, None, 1, 5, 0, 0, 0, 1e-7, 800, 64, 100, None, 1, 2 * np.pi)
    assert ptycho_output_folder(10, 5, 0, 0, 1e-7, 800, 64, 100, 1,
                                np.pi).endswith("_180")
    print_flush("rank filtered", designate_rank=0, this_rank=1)  # silent


def test_pallas_fused_kernel_interpret_matches_scan():
    """The fused whole-propagation Pallas kernel (interpret mode on CPU)
    vs the complex lax.scan path."""
    gd, gb = adhesin_phantom(16)
    probe = np.ones((16, 16), np.complex64)
    ref = np.asarray(multislice_propagate_batch(
        gd[None], gb[None], probe, 800, 0.67e-7, propagate_last=True))[0]
    re, im = multislice_pallas_split(gd, gb,
                                     np.ones((16, 16), np.float32),
                                     np.zeros((16, 16), np.float32),
                                     800, 0.67e-7)
    out = np.asarray(re) + 1j * np.asarray(im)
    assert np.abs(out - ref).max() < 1e-5
