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
