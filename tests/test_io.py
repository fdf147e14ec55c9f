import os

import numpy as np
import pytest

from beyond_dof_tpu.io import tiff
from beyond_dof_tpu.io.exchange import (write_exchange_data, read_exchange_data,
                                        open_exchange_data, save_rotation_lookup,
                                        load_rotation_lookup, lookup_folder_name)
from beyond_dof_tpu.ops.rotate import rotation_lookup


def test_tiff_roundtrip_2d(tmp_path):
    arr = np.random.rand(33, 47).astype(np.float32)
    f = tiff.write_tiff(arr, str(tmp_path / "img"))
    back = tiff.read_tiff(f)
    assert back.shape == arr.shape
    assert np.abs(back - arr).max() == 0


def test_tiff_roundtrip_multipage(tmp_path):
    arr = np.random.rand(5, 16, 24).astype(np.float32)
    f = tiff.write_tiff(arr, str(tmp_path / "vol"))
    back = tiff.read_tiff(f)
    assert back.shape == arr.shape
    assert np.abs(back - arr).max() == 0


def test_tiff_complex_writes_magnitude(tmp_path):
    arr = (np.random.rand(8, 8) + 1j * np.random.rand(8, 8)).astype(np.complex64)
    f = tiff.write_tiff(arr, str(tmp_path / "cx"))
    back = tiff.read_tiff(f)
    assert np.abs(back - np.abs(arr)).max() < 1e-6


def test_tiff_stack_roundtrip(tmp_path):
    arr = np.random.rand(4, 8, 8).astype(np.float32)
    tiff.write_tiff_stack(arr, str(tmp_path / "stk"))
    back = tiff.read_tiff_stack(str(tmp_path / "stk"), range(4))
    assert np.abs(back - arr).max() == 0


def test_exchange_roundtrip(tmp_path):
    data = (np.random.rand(3, 8, 8) + 1j * np.random.rand(3, 8, 8)).astype(np.complex64)
    fname = str(tmp_path / "data.h5")
    write_exchange_data(fname, data)
    back = read_exchange_data(fname)
    assert np.abs(back - data).max() == 0
    f, dset = open_exchange_data(fname)
    assert dset.shape == data.shape
    f.close()
    assert read_exchange_data(fname, theta_downsample=2).shape[0] == 2


def test_rotation_lookup_persistence(tmp_path):
    inds = rotation_lookup((8, 8, 8), 4)
    folder = save_rotation_lookup(inds, (8, 8, 8), 4,
                                  dest_folder=str(tmp_path / lookup_folder_name((8, 8, 8), 4)))
    back = load_rotation_lookup(folder)
    assert np.array_equal(back, inds)
