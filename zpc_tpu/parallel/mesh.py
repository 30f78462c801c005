"""Device mesh / topology layer — the distributed communication backend.

The reference has **no** distributed backend (SURVEY §5.8): its multi-device
story is per-GPU contexts + peer copies + groups-by-MemoryLocation
(simulation/mpm/Simulator.cpp:44-118, cuda/Cuda.cu:345-348).  The TPU-native
equivalent is first-class here:

* device discovery       -> ``jax.devices()`` (replaces ``Cuda::instance``)
* ``clone(MemoryLocation)`` cross-device copies -> shardings +
  ``jax.device_put``
* peer-to-peer copies    -> XLA collectives over ICI (``psum``,
  ``all_gather``, ``ppermute``) inside ``shard_map``
* multi-process          -> the same code over a multi-host mesh (DCN);
  mesh axes are logical, placement is jax's.

Helpers here wrap the small amount of boilerplate the sim layer needs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_leading", "replicated", "P", "Mesh",
           "local_to_global_index"]


def make_mesh(n_devices: Optional[int] = None, axis: str = "d",
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (data/domain axis)."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_leading(mesh: Mesh, axis: str = "d") -> NamedSharding:
    """Sharding that splits the leading array axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_to_global_index(n_local: int, axis: str = "d"):
    """Inside shard_map: global indices of this shard's leading axis."""
    import jax.numpy as jnp

    shard = jax.lax.axis_index(axis)
    return shard * n_local + jnp.arange(n_local)
