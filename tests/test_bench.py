import json
import subprocess
import sys

import numpy as np
import pytest

from benchmarks.multislice_bench import run_benchmark, _numpy_baseline_slices_per_sec
from benchmarks.tiled_bench import kernel_size_sweep, tiled_scaling


def test_numpy_baseline_positive():
    assert _numpy_baseline_slices_per_sec(32, n_probe=2) > 0


@pytest.mark.parametrize("force_split", [False, True])
def test_run_benchmark_schema(force_split, tmp_path, monkeypatch):
    # tiny problem; n_iters floors at 300 but 16^2 x 4 volumes are trivial
    r = run_benchmark(size=16, n_slices=4, batch=1, n_iters=300,
                      force_split=force_split)
    assert set(r) >= {"metric", "value", "unit", "vs_baseline"}
    assert r["value"] > 0
    assert r["detail"]["path"] == ("split_matmul_dft" if force_split
                                   else "complex_fft")
    json.dumps(r)  # JSON-serializable


def test_kernel_size_sweep_csv(tmp_path):
    rows = kernel_size_sweep(size=16, n_slices=4, kernel_sizes=(3, 5),
                             csv_path=str(tmp_path / "c.csv"))
    text = (tmp_path / "c.csv").read_text()
    assert text.startswith("kernel_size,time")
    assert len(rows) == 2


def test_tiled_scaling_keys():
    res = tiled_scaling(size=16, n_slices=4, kernel_size=3, tiles=((2, 1),))
    assert "serial" in res and "2x1" in res
    assert all(v > 0 for v in res.values())
