"""Device mesh construction + common shardings."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the pose/ray data axis (ICI on a single slice)."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"need {n_devices} devices, have {len(devices)} "
                f"({[d.platform for d in devices[:1]]})"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def pose_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (pose/ray/image) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
