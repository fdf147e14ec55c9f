"""Device-mesh construction and multi-host initialization.

TPU-native replacement of the reference's three distribution mechanisms
(Horovod data parallelism, mpi4py allreduce, and the fake ``pseudo.py``
shells — ref tensorflow_recon/fullfield.py:118-145, pseudo.py:3-33):

* data parallelism over angles/positions = a ``data`` mesh axis; gradient
  reduction is inserted by the SPMD partitioner (no explicit allreduce code);
* spatial tiling of the wavefield plane = ``(ty, tx)`` mesh axes with
  ICI halo exchange (see :mod:`beyond_dof_tpu.ops.tiled`);
* the "pseudo" single-process fallback is simply a 1-device mesh — the same
  compiled program runs unchanged.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "init_distributed", "P"]


def make_mesh(n_data=None, tile_yx=(1, 1), devices=None):
    """Build a ``(data, ty, tx)`` mesh over the available devices.

    ``n_data`` defaults to whatever is left after the spatial tile grid.
    A 1x1x1 mesh on a single device reproduces serial execution.
    """
    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    ty, tx = tile_yx
    if n_data is None:
        n_data = n_dev // (ty * tx)
    assert n_data * ty * tx <= n_dev, (
        "mesh (%d,%d,%d) needs more than %d devices" % (n_data, ty, tx, n_dev))
    dev_arr = np.asarray(devices[: n_data * ty * tx]).reshape(n_data, ty, tx)
    return Mesh(dev_arr, axis_names=("data", "ty", "tx"))


def data_sharding(mesh, ndim, batch_axis=0):
    """NamedSharding that splits axis ``batch_axis`` over the ``data`` axis."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh):
    return NamedSharding(mesh, P())


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host initialization (replaces ``hvd.init``/``MPI_Init``).

    No-op for single-process runs; on a multi-host TPU pod slice call this
    once per host before building the mesh.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()
