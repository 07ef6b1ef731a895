"""Device mesh construction + common shardings.

`auto_mesh()` is the production wiring point: every hot stage (NGP training,
the physics check, the fused imagine-and-score loop) calls it and shards its
batch axis over all visible devices when more than one is present — this is
what replaces the reference's single-device chunked loops
(clip_scoring.py:167-185, physics_utils.py:308-370) on a v5e-8 slice.
``D2R_MESH=0`` forces single-device everywhere (used by the parity tests).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"

_AUTO_MESH: Mesh | None = None


def auto_mesh() -> Mesh | None:
    """The process-wide 1-D data mesh over all visible devices, or None when
    only one device is visible or ``D2R_MESH=0``.

    The env var is re-read on every call (cheap) so tests can toggle the
    sharded and single-device paths within one process; the Mesh object
    itself is cached so jit caches keyed on it stay warm.
    """
    if os.environ.get("D2R_MESH", "1") == "0":
        return None
    if len(jax.devices()) <= 1:
        return None
    global _AUTO_MESH
    if _AUTO_MESH is None or _AUTO_MESH.size != len(jax.devices()):
        _AUTO_MESH = data_mesh()
    return _AUTO_MESH


def score_mesh_for(n_poses: int, clip_batch: int) -> Mesh | None:
    """Mesh for a scoring run of `n_poses` candidates, or None when the grid
    is too small to amortize sharding: the sharded program pads every dispatch
    to n_dev * clip_batch poses, so tiny grids (a few dozen poses) would pay
    more in padding than they gain in parallelism. Reference demo grids are
    70k-2.2M poses (BASELINE.md) — far past the threshold."""
    mesh = auto_mesh()
    if mesh is None:
        return None
    if n_poses < 2 * mesh.size * clip_batch:
        return None
    return mesh


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
