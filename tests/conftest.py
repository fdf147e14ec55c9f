"""Test configuration: force an 8-device virtual CPU mesh.

Sharding correctness is validated on virtual CPU devices
(xla_force_host_platform_device_count), mirroring the reference's
"pseudo" fake-distributed shells (ref tensorflow_recon/pseudo.py) but
actually executing the multi-device code path.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
