"""Analysis plotting helpers (FSC/FRC curves, regularizer alpha-sweeps).

TPU-native rebuild of the reference's plotting drivers
(ref tensorflow_recon/plot_fsc.py:1-15, plot_loss_terms.py:1-26,
util.py:1004-1010). All functions degrade to no-ops when matplotlib is
unavailable and always return the underlying arrays.
"""

import os

import numpy as np

__all__ = ["plot_fsc", "plot_loss_terms", "dump_diffraction_data"]


def _plt():
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        return plt
    except Exception:
        return None


def plot_fsc(obj, ref, save_path="fsc", step_size=1, ring=False):
    """FSC (3D) or FRC (2D) curve of a reconstruction vs ground truth.

    Saves radii/fsc npys and a PDF plot like the reference
    (ref plot_fsc.py:11-14, util.py:1004-1010). Returns (radii, curve).
    """
    from ..ops.quality import fourier_shell_correlation, fourier_ring_correlation
    os.makedirs(save_path, exist_ok=True)
    fn = fourier_ring_correlation if (ring or np.asarray(obj).ndim == 2) \
        else fourier_shell_correlation
    radii, curve = fn(obj, ref, step_size=step_size)
    curve = np.asarray(curve)
    np.save(os.path.join(save_path, "radii.npy"), radii)
    np.save(os.path.join(save_path, "fsc.npy"), curve)
    plt = _plt()
    if plt is not None and len(radii):
        plt.figure()
        plt.plot(np.asarray(radii, float) / radii[-1], curve[: len(radii)])
        plt.xlabel("Spatial frequency (1 / Nyquist)")
        plt.ylabel("FRC" if ring else "FSC")
        plt.savefig(os.path.join(save_path, "fsc.pdf"), format="pdf")
        plt.close()
    return radii, curve


def plot_loss_terms(loss_txt="loss.txt", save_path="loss_terms.pdf"):
    """Regularizer alpha-sweep plot from a loss.txt of
    ``alpha total mismatch tv`` rows (ref plot_loss_terms.py:5-26).
    Returns the parsed (n, 4) array."""
    dat = np.loadtxt(loss_txt)
    dat = np.atleast_2d(dat)
    plt = _plt()
    if plt is not None:
        plt.figure()
        plt.loglog(dat[:, 0], dat[:, 1], label="Total loss")
        plt.loglog(dat[:, 0], dat[:, 2], label="Mismatch")
        plt.loglog(dat[:, 0], dat[:, 3], label="TV")
        plt.xlabel("alpha")
        plt.legend()
        plt.savefig(save_path, format="pdf")
        plt.close()
    return dat


def dump_diffraction_data(fname, dest_folder="raw_data"):
    """Dump an exchange H5 to magnitude/phase TIFF stacks
    (ref dump_diffraction_data.py:6-9)."""
    from ..io.exchange import read_exchange_data
    from ..io import tiff
    dat = read_exchange_data(fname)
    tiff.write_tiff(np.abs(dat), os.path.join(dest_folder, "mag"))
    tiff.write_tiff(np.angle(dat), os.path.join(dest_folder, "phase"))
    return dest_folder
