"""Multiresolution hash-grid encoding (Instant-NGP, Müller et al. 2022).

TPU-native replacement for tiny-cuda-nn's HashGrid (the encoder inside the
reference's pyngp engine, SURVEY.md §2b.1). Pure JAX: the per-level corner
gathers lower to XLA dynamic-gathers which TPU executes as vector loads; the
trilinear blend and level concat fuse into the downstream MLP matmul.

Design notes (TPU-first):
- one packed (L, T, F) table parameter => a single gather per level batch,
  vmapped over levels; no Python loops inside jit.
- levels whose dense grid fits in T entries use dense indexing, matching
  instant-ngp's dense/hash switch, selected statically per level.
- f32 table; gradients flow via XLA's gather transpose (scatter-add).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# instant-ngp's spatial hash primes (coherent in x).
_PRIMES = (1, 2654435761, 805459861)


class HashGridConfig(NamedTuple):
    n_levels: int = 16
    n_features: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    max_resolution: int = 2048

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def per_level_scale(self) -> float:
        if self.n_levels == 1:
            return 1.0
        return math.exp(
            (math.log(self.max_resolution) - math.log(self.base_resolution))
            / (self.n_levels - 1)
        )

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features

    def level_resolutions(self) -> np.ndarray:
        b = self.per_level_scale
        return np.array(
            [int(math.floor(self.base_resolution * (b**l))) for l in range(self.n_levels)],
            dtype=np.int32,
        )

    def level_is_dense(self) -> np.ndarray:
        res = self.level_resolutions()
        return ((res + 1).astype(np.int64) ** 3 <= self.table_size).astype(np.int32)


def init_hash_table(key: jax.Array, cfg: HashGridConfig) -> jnp.ndarray:
    """Uniform(-1e-4, 1e-4) init, as instant-ngp."""
    return jax.random.uniform(
        key,
        (cfg.n_levels, cfg.table_size, cfg.n_features),
        minval=-1e-4,
        maxval=1e-4,
        dtype=jnp.float32,
    )


def _corner_indices(grid_xyz: jnp.ndarray, res: jnp.ndarray, dense: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """Table index for integer grid coords.

    grid_xyz: (..., 3) int32 in [0, res]. res: scalar int32 (level resolution).
    dense: scalar int32 (1 => dense indexing fits).
    """
    x, y, z = grid_xyz[..., 0], grid_xyz[..., 1], grid_xyz[..., 2]
    stride = res + 1
    dense_idx = (x + stride * (y + stride * z)).astype(jnp.uint32)
    ux = x.astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
    uy = y.astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
    uz = z.astype(jnp.uint32) * jnp.uint32(_PRIMES[2])
    hash_idx = (ux ^ uy ^ uz) & jnp.uint32(table_size - 1)
    return jnp.where(dense == 1, dense_idx & jnp.uint32(table_size - 1), hash_idx).astype(jnp.int32)


# The 8 cube-corner offsets, shaped for broadcasting: (8, 3).
_CORNERS = np.array(
    [[i & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], dtype=np.int32
)


def hash_encode(
    positions01: jnp.ndarray, table: jnp.ndarray, cfg: HashGridConfig
) -> jnp.ndarray:
    """Encode positions in [0,1]^3 -> (..., L*F) features.

    positions01: (..., 3) float32 (values outside [0,1] are clamped; the
    caller masks out-of-aabb samples separately).
    table: (L, T, F) float32.
    """
    batch_shape = positions01.shape[:-1]
    pos = jnp.clip(positions01.reshape(-1, 3), 0.0, 1.0)  # (N, 3)

    res_arr = jnp.asarray(cfg.level_resolutions())  # (L,)
    dense_arr = jnp.asarray(cfg.level_is_dense())  # (L,)
    corners = jnp.asarray(_CORNERS)  # (8, 3)

    def encode_level(table_l, res, dense):
        # instant-ngp: x_grid = pos * res + 0.5 is NOT used; it uses
        # pos * res, floor, with grid spanning res+1 corners.
        xf = pos * res.astype(jnp.float32)  # (N, 3)
        x0 = jnp.floor(xf).astype(jnp.int32)
        x0 = jnp.clip(x0, 0, res - 1)
        w = xf - x0.astype(jnp.float32)  # (N, 3) in [0,1]
        corner_xyz = x0[:, None, :] + corners[None, :, :]  # (N, 8, 3)
        idx = _corner_indices(corner_xyz, res, dense, cfg.table_size)  # (N, 8)
        feats = jnp.take(table_l, idx.reshape(-1), axis=0).reshape(
            idx.shape + (cfg.n_features,)
        )  # (N, 8, F)
        # Trilinear weights per corner: prod over dims of (w or 1-w).
        cw = jnp.where(corners[None, :, :] == 1, w[:, None, :], 1.0 - w[:, None, :])
        weights = cw.prod(axis=-1)  # (N, 8)
        return (feats * weights[..., None]).sum(axis=1)  # (N, F)

    feats = jax.vmap(encode_level, in_axes=(0, 0, 0), out_axes=1)(
        table, res_arr, dense_arr
    )  # (N, L, F)
    return feats.reshape(batch_shape + (cfg.out_dim,))
