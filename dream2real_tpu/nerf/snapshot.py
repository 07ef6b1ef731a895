"""NGP snapshot save/load — replaces instant-ngp's `.ingp` binary format.

Parity surface: pyngp save_snapshot/load_snapshot (reference
reconstruction/train_ngp.py:145-146, reconstruction/ngp_visual_model.py:22-29).
We keep the reference's *file naming* conventions (`full_base.ingp`,
`fg_base.ingp`, `bg_base.ingp` inside data_dir) so the cache workflow is
unchanged, but the payload is our own: a numpy .npz with the parameter pytree
plus a JSON header carrying NGPConfig and the optimized camera poses.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from dream2real_tpu.nerf.hashgrid import HashGridConfig
from dream2real_tpu.nerf.model import NGPConfig

_MAGIC = "dream2real_tpu.ngp.v1"


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> Any:
    tree: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_snapshot(path: str, params: Any, cfg: NGPConfig, extra: dict | None = None):
    flat = _flatten(params)
    cfg_dict = cfg._asdict()
    cfg_dict["grid"] = cfg.grid._asdict()
    cfg_dict["aabb_min"] = list(cfg.aabb_min)
    cfg_dict["aabb_max"] = list(cfg.aabb_max)
    header = {"magic": _MAGIC, "cfg": cfg_dict, "extra": extra or {}}
    # Write through a file handle so numpy does not append ".npz" — the cache
    # layout uses the reference's exact file names (e.g. "fg_base.ingp").
    with open(path, "wb") as f:
        np.savez(
            f,
            __header__=np.frombuffer(json.dumps(header).encode(), np.uint8),
            **flat,
        )


def load_snapshot(path: str) -> tuple[Any, NGPConfig, dict]:
    with np.load(path if path.endswith(".npz") else _npz_path(path)) as z:
        header = json.loads(bytes(z["__header__"].tobytes()).decode())
        if header.get("magic") != _MAGIC:
            raise ValueError(f"not a dream2real_tpu snapshot: {path}")
        flat = {k: z[k] for k in z.files if k != "__header__"}
    c = dict(header["cfg"])
    c["grid"] = HashGridConfig(**c["grid"])
    c["aabb_min"] = tuple(c["aabb_min"])
    c["aabb_max"] = tuple(c["aabb_max"])
    cfg = NGPConfig(**c)
    return _unflatten(flat), cfg, header["extra"]


def _npz_path(path: str) -> str:
    # np.savez appends .npz; accept both spellings transparently so callers
    # can keep using the reference's `.ingp` file names.
    import os

    return path if os.path.exists(path) else path + ".npz"


def snapshot_path(path: str) -> str:
    """Resolve a reference-style snapshot name to the on-disk file."""
    return _npz_path(path)
