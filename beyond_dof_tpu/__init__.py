"""beyond_dof_tpu — TPU-native framework for X-ray wave-optics simulation and
AD-based beyond-depth-of-focus 3D reconstruction.

A from-scratch JAX/XLA/pjit/Pallas rebuild with the capabilities of the
reference ``beyond_dof`` codebase (TF1/autograd/MPI), redesigned TPU-first:

* L0  physics constants                       -> :mod:`.constants`
* L1  propagation kernels & wave ops          -> :mod:`.ops.fresnel`,
      :mod:`.ops.multislice`, :mod:`.ops.tiled` (halo-exchange propagator)
* L2  geometry / rotation / resampling        -> :mod:`.ops.rotate`,
      :mod:`.ops.spherical`, :mod:`.ops.image`
* L3  forward simulation / data generation    -> :mod:`.sim.acquire`,
      :mod:`.models.phantom`
* L4  AD reconstruction engines               -> :mod:`.recon`
* L5  distributed execution (mesh/collectives)-> :mod:`.parallel`
* L6  drivers / config / CLI                  -> :mod:`.configs`, :mod:`.cli`
* L7  analysis / QA / classical baselines     -> :mod:`.ops.quality`,
      :mod:`.ops.tomo`
"""

__version__ = "0.1.0"

from . import constants  # noqa: F401

_TOP_LEVEL = {
    "reconstruct_fullfield": ".recon.fullfield",
    "reconstruct_ptychography": ".recon.ptycho",
    "reconstruct_pureproj": ".recon.pureproj",
    "create_fullfield_data": ".sim.acquire",
    "create_ptychography_data": ".sim.acquire",
    "multislice_propagate_batch": ".ops.multislice",
    "multislice_propagate_cnn": ".ops.tiled",
    "multislice_propagate_tiled": ".ops.tiled",
    "Simulator": ".models.simulator",
    "make_mesh": ".parallel.mesh",
}


def __getattr__(name):
    """Lazy top-level exports of the main user-facing APIs."""
    if name in _TOP_LEVEL:
        import importlib
        mod = importlib.import_module(_TOP_LEVEL[name], __name__)
        return getattr(mod, name)
    raise AttributeError("module %r has no attribute %r" % (__name__, name))
