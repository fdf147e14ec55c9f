import json
import os
import subprocess
import sys

import numpy as np
import pytest

from beyond_dof_tpu.configs.presets import (FULLFIELD_PRESETS, PTYCHO_PRESETS,
                                            make_phantom)


def test_presets_complete():
    # the reference's experiment suite (ref reconstruct_fullfield.py:19-269)
    for name in ["adhesin", "cone_256", "cone_256_180", "cone_far", "2d",
                 "2d_cell", "cone_noisy", "cone_pp"]:
        assert name in FULLFIELD_PRESETS
        p = FULLFIELD_PRESETS[name]
        assert "phantom" in p and "simulate" in p and "reconstruct" in p
    # the reference ships 6 ptycho experiment dicts
    # (ref reconstruct_ptycho.py:9-221)
    for name in ["adhesin_ptycho", "cone_ptycho", "ptycho_2d",
                 "cell_ptycho_2d", "cone_ptycho_noisy", "cone_ptycho_fd"]:
        assert name in PTYCHO_PRESETS
        p = PTYCHO_PRESETS[name]
        assert "phantom" in p and "simulate" in p and "reconstruct" in p
    for name in ["adhesin_ptycho", "cone_ptycho", "ptycho_2d",
                 "cone_ptycho_noisy", "cone_ptycho_fd"]:
        assert len(PTYCHO_PRESETS[name]["probe_pos"]) == 529  # 23 x 23 grid
    assert len(PTYCHO_PRESETS["cell_ptycho_2d"]["probe_pos"]) == 33 * 34
    assert PTYCHO_PRESETS["cone_ptycho_fd"]["reconstruct"][
        "forward_algorithm"] == "fd"
    assert PTYCHO_PRESETS["cell_ptycho_2d"]["reconstruct"][
        "object_type"] == "phase_only"


def test_make_phantom_kinds():
    gd, gb = make_phantom({"kind": "adhesin", "size": 16})
    assert gd.shape == (16, 16, 16)
    gd, gb = make_phantom({"kind": "cone_foam", "size": 16, "flat": True})
    assert gd.shape == (16, 16, 1)


def test_cli_simulate_and_reconstruct(tmp_path):
    """End-to-end CLI drive on a tiny problem (adhesin preset, 4 angles)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from beyond_dof_tpu.configs.presets import FULLFIELD_PRESETS, make_phantom;"
        "from beyond_dof_tpu.sim.acquire import create_fullfield_data;"
        "from beyond_dof_tpu.recon.fullfield import reconstruct_fullfield;"
        "import numpy as np;"
        "p = FULLFIELD_PRESETS['adhesin'];"
        "gd, gb = make_phantom(dict(p['phantom'], size=16));"
        "sim = dict(p['simulate'], n_theta=4);"
        "data = create_fullfield_data(gd, gb, **sim);"
        "r = dict(p['reconstruct'], n_epochs=1, minibatch_size=2,"
        "         save_outputs=False, verbose=False, shrink_cycle=None);"
        "d, b, info = reconstruct_fullfield(data=data, **r);"
        "print('LOSS', info['loss'][-1])"
    )
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=600,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert "LOSS" in out.stdout, out.stderr


def test_cli_help():
    from beyond_dof_tpu import cli
    with pytest.raises(SystemExit):
        cli.main(["--help"])


def test_cli_dump_and_fsc(tmp_path, monkeypatch):
    """dump (H5 -> TIFF mag/phase, ref dump_diffraction_data.py:6-9) and
    fsc (recon-vs-phantom curve, ref plot_fsc.py:11-14) subcommands."""
    import numpy as np
    from beyond_dof_tpu import cli
    from beyond_dof_tpu.io.exchange import write_exchange_data

    monkeypatch.chdir(tmp_path)
    rng = np.random.RandomState(0)
    data = (rng.rand(3, 8, 8) + 1j * rng.rand(3, 8, 8)).astype(np.complex64)
    write_exchange_data("d.h5", data)
    cli.main(["dump", "--data", "d.h5", "--out", "raw"])
    assert (tmp_path / "raw" / "mag.tiff").exists()
    assert (tmp_path / "raw" / "phase.tiff").exists()

    vol = rng.rand(8, 8, 8).astype(np.float32)
    np.save("vol.npy", vol)
    cli.main(["fsc", "--recon", "vol.npy", "--reference", "vol.npy",
              "--out", "fscdir"])
    fsc = np.load(tmp_path / "fscdir" / "fsc.npy")
    assert np.allclose(fsc[: 3], 1.0, atol=1e-5)
