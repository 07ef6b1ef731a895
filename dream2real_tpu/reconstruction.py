"""NeRF reconstruction driver: dataset IO + training orchestration.

Parity targets:
- reconstruction/train_ngp.py:42-162 (`build_vis_model`): poses.txt ->
  transforms.json conversion when optimising extrinsics (47-51), training
  with the convergence governor, snapshot save, optimised-pose export
  (opt_cam_poses.npy + fg/bg transforms.json stubs, 145-242);
- reconstruction/ngp_visual_model.py:20-79 (`get_vis_ngps`): write masked
  RGBA images (mask as alpha, 39-46), then train fg/bg task NeRFs
  warm-started from the full-scene snapshot (52-57, fg_scene/bg_scene.json).

The NGP engine itself is dream2real_tpu.nerf (pure JAX); `NGPModel` bundles
(params, NGPConfig, RenderSettings) as the "vis_model" handle the engine and
renderer pass around (the reference passes pyngp Testbed objects).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dream2real_tpu.nerf.model import NGPConfig
from dream2real_tpu.nerf.render import RenderSettings
from dream2real_tpu.nerf.snapshot import load_snapshot, save_snapshot, snapshot_path
from dream2real_tpu.nerf.trainer import (
    TrainConfig,
    init_train_state,
    make_train_chunk,
    optimized_poses,
    train_with_governor,
)
from dream2real_tpu.ops import cameras

#: Observability: sharding decision of the most recent build_vis_model run.
LAST_TRAIN_INFO: dict = {}


@dataclasses.dataclass
class NGPModel:
    """The vis_model handle (replaces pyngp.Testbed at the API boundary)."""

    params: dict
    cfg: NGPConfig
    settings: RenderSettings

    @classmethod
    def load(cls, path: str, settings: Optional[RenderSettings] = None) -> "NGPModel":
        params, cfg, extra = load_snapshot(snapshot_path(path))
        if settings is None:
            # Restore the RenderSettings the model was trained with (saved in
            # the snapshot header by build_vis_model) so a cache-replayed run
            # renders with the SAME near/far/sample counts as the fresh run
            # that wrote the snapshot — e.g. fg_scene.json's near_distance=0.1
            # vs the RenderSettings() default 0.05 changed crop-march ranges
            # and shifted CLIP scores ~0.8% between fresh and replayed runs.
            s = extra.get("settings")
            if s:
                dt = jnp.bfloat16 if s.get("compute_dtype", "bfloat16") == "bfloat16" else jnp.float32
                settings = RenderSettings(
                    n_coarse=int(s["n_coarse"]), n_fine=int(s["n_fine"]),
                    near=float(s["near"]), far=float(s["far"]),
                    min_transmittance=float(s["min_transmittance"]),
                    compute_dtype=dt,
                )
        return cls(
            params=params["field"] if "field" in params else params,
            cfg=cfg,
            settings=settings or RenderSettings(),
        )


def raw_poses_convert(cfg, out_path: str):
    """poses.txt -> transforms.json with full intrinsics/distortion.

    Parity: utils/accio2ngp.py:45-130 (frames carry NGP-convention matrices:
    y/z columns flipped).
    """
    out = {
        "fl_x": cfg.fx,
        "fl_y": cfg.fy,
        "k1": getattr(cfg, "k1", 0.0),
        "k2": getattr(cfg, "k2", 0.0),
        "k3": getattr(cfg, "k3", 0.0),
        "k4": getattr(cfg, "k4", 0.0),
        "p1": getattr(cfg, "p1", 0.0),
        "p2": getattr(cfg, "p2", 0.0),
        "is_fisheye": getattr(cfg, "is_fisheye", False),
        "cx": cfg.cx,
        "cy": cfg.cy,
        "w": cfg.W,
        "h": cfg.H,
        "aabb_scale": 2,
        "scale": cfg.scale,
        "offset": cfg.offset,
        "frames": [],
    }
    if cfg.camera_angle_x is not None:
        out["camera_angle_x"] = cfg.camera_angle_x
        out["camera_angle_y"] = cfg.camera_angle_y
    traj = np.loadtxt(os.path.join(cfg.data_dir, "poses.txt")).reshape(-1, 4, 4)
    for i, c2w in enumerate(traj):
        m = c2w.copy()
        m[:3, 1] *= -1
        m[:3, 2] *= -1
        out["frames"].append(
            {"file_path": f"./images/rgb_{i:04d}.png", "transform_matrix": m.tolist()}
        )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)


def load_transforms_dataset(transforms_path: str, data_dir: str):
    """Read a transforms.json: images (RGBA uint8), accio poses, intrinsics,
    distortion. Frames' matrices are NGP convention -> flipped back to accio.
    """
    from PIL import Image

    with open(transforms_path) as f:
        meta = json.load(f)
    K = np.array(
        [
            [meta["fl_x"], 0, meta["cx"]],
            [0, meta["fl_y"], meta["cy"]],
            [0, 0, 1.0],
        ]
    )
    dist = None
    if any(meta.get(k) for k in ("k1", "k2", "p1", "p2", "k3", "k4")):
        dist = np.array(
            [meta.get(k, 0.0) for k in ("k1", "k2", "p1", "p2", "k3", "k4")]
        )
    imgs, poses = [], []
    for fr in meta["frames"]:
        p = os.path.join(data_dir, fr["file_path"].lstrip("./"))
        img = np.asarray(Image.open(p))
        if img.shape[-1] == 3:
            img = np.concatenate(
                [img, np.full(img.shape[:2] + (1,), 255, np.uint8)], axis=-1
            )
        imgs.append(img)
        m = np.asarray(fr["transform_matrix"], np.float32)
        m[:3, 1] *= -1  # NGP -> accio
        m[:3, 2] *= -1
        poses.append(m)
    return np.stack(imgs), np.stack(poses), K, dist


def _aabb_from_cfg(cfg, poses: np.ndarray, pad: float = 0.15):
    """Field AABB: scene_phys_bounds when the config has them, else the
    camera-position bounding box padded."""
    b = getattr(cfg, "scene_phys_bounds", None)
    if b is not None:
        lo = np.asarray(b[0], np.float64) - pad
        hi = np.asarray(b[1], np.float64) + pad
        return tuple(lo.tolist()), tuple(hi.tolist())
    t = poses[:, :3, 3]
    lo = t.min(axis=0) - 1.0
    hi = t.max(axis=0) + 1.0
    return tuple(lo.tolist()), tuple(hi.tolist())


def field_spec(cfg, poses: Optional[np.ndarray] = None,
               field_overrides: Optional[dict] = None):
    """(NGPConfig, RenderSettings) a build_vis_model run with this config
    will use. Deterministic from the config alone when scene_phys_bounds is
    set (poses only matter for the camera-bbox AABB fallback) — this is what
    lets the scoring prefetch construct the renderer/score program with the
    final shapes BEFORE task-NeRF training finishes."""
    aabb_min, aabb_max = _aabb_from_cfg(cfg, poses)
    field_kw = dict(aabb_min=aabb_min, aabb_max=aabb_max)
    if field_overrides:
        field_kw.update(field_overrides)
    ngp_cfg = NGPConfig(**field_kw)
    nc, nf = (
        int(v) for v in os.environ.get("D2R_TRAIN_SAMPLING", "32,32").split(",")
    )
    settings = RenderSettings(
        n_coarse=nc, n_fine=nf, near=cfg.near_distance, far=cfg.max_depth
    )
    return ngp_cfg, settings


def build_vis_model(
    cfg,
    dynamic_time_extension: bool = True,
    render_distract: bool = False,
    images_override: Optional[np.ndarray] = None,
    depths: Optional[np.ndarray] = None,
    field_overrides: Optional[dict] = None,
    train_overrides: Optional[dict] = None,
    log_fn=None,
    warm_start: bool = True,
):
    """Train a NeRF per config; returns (NGPModel, opt_cam_poses or None).

    Parity: train_ngp.py:42-162. opt_cam_poses are exported in the accio
    convention (y/z flip applied, train_ngp.py:220-226) and saved to
    data_dir/opt_cam_poses.npy; fg/bg transforms.json stubs are written for
    the task-NeRF stage.
    """
    transforms_path = cfg.files
    if cfg.optimize_extrinsics:
        raw_poses_convert(cfg, transforms_path)

    imgs, poses, K, dist = load_transforms_dataset(transforms_path, cfg.data_dir)
    if images_override is not None:
        imgs = np.asarray(images_override)

    # TRAINING sample strategy (D2R_TRAIN_SAMPLING="nc,nf" overrides):
    # hierarchical 32+32 by default. Flat uniform (e.g. "64,0") is ~25%
    # faster and measured BETTER on chunky geometry (33.1 vs 32.3 dB on the
    # default synthetic tabletop) but it undersamples THIN objects — the
    # 6 cm rect-scene box got ~2-3 samples/ray and the fg field trained to
    # fog (identity PSNR 28->18 dB, argmax broke). The coarse->fine pass is
    # what concentrates samples on thin surfaces, so it stays the default.
    ngp_cfg, settings = field_spec(cfg, poses, field_overrides)

    steps_scale = float(os.environ.get("D2R_TRAIN_STEPS_SCALE", "1.0"))
    tc_kw = dict(
        n_steps=max(1, int(cfg.n_steps * steps_scale)),
        optimize_extrinsics=bool(cfg.optimize_extrinsics),
        dynamic_time_extension=dynamic_time_extension and not render_distract,
        # Scale the governor's hard cap with the step scale so quick runs
        # cannot be extended back to 40k steps (train_ngp.py:97 semantics).
        max_infinity_steps=max(1000, int(40000 * steps_scale)),
    )
    if train_overrides:
        tc_kw.update(train_overrides)
    tc = TrainConfig(**tc_kw)

    h, w = imgs.shape[1:3]
    dirs_cam = cameras.pixel_dirs(
        h, w, jnp.asarray(K), None if dist is None else jnp.asarray(dist)
    )
    state = init_train_state(ngp_cfg, tc, n_images=len(imgs))

    if warm_start and cfg.load_snapshot and os.path.exists(snapshot_path(cfg.load_snapshot_path)):
        # Warm start from the full-scene snapshot (ngp_visual_model.py:52-57).
        params_loaded, cfg_loaded, _ = load_snapshot(snapshot_path(cfg.load_snapshot_path))
        if cfg_loaded == ngp_cfg:
            state["params"]["field"] = (
                params_loaded["field"] if "field" in params_loaded else params_loaded
            )

    # Alpha-masked training set (fg/bg task NeRFs): importance-sample the
    # opaque pixels, else the mostly-transparent supervision starves the
    # object and the field collapses to empty.
    fg_pixels = None
    alpha = imgs[..., 3]
    opaque_frac = float((alpha > 127).mean())
    if opaque_frac < 0.5:
        coords = np.argwhere(alpha > 127)
        if len(coords):
            if len(coords) > (1 << 20):
                sel = np.linspace(0, len(coords) - 1, 1 << 20).astype(int)
                coords = coords[sel]
            fg_pixels = jnp.asarray(coords.astype(np.int32))

    # Multi-chip: dp-shard the ray batch over the data mesh (SURVEY §2c —
    # replaces nothing in the reference, which trains single-GPU via pyngp;
    # here every visible chip contributes to every training step).
    # D2R_TRAIN_BATCH_SCALE_MESH=1 additionally scales the global ray batch
    # by the mesh size (constant per-chip work, larger effective batch) —
    # default off so sharded and single-device runs keep identical training
    # semantics.
    from dream2real_tpu.parallel.mesh import auto_mesh, pose_sharding

    mesh = auto_mesh()
    ray_sharding = None
    if mesh is not None:
        if os.environ.get("D2R_TRAIN_BATCH_SCALE_MESH") == "1":
            tc = dataclasses.replace(tc, batch_rays=tc.batch_rays * mesh.size)
        if tc.batch_rays % mesh.size == 0:
            ray_sharding = pose_sharding(mesh)
    LAST_TRAIN_INFO.clear()
    LAST_TRAIN_INFO.update(
        mesh_devices=1 if ray_sharding is None else mesh.size,
        batch_rays=tc.batch_rays,
    )

    chunk = make_train_chunk(
        ngp_cfg,
        tc,
        settings,
        jnp.asarray(imgs),
        jnp.asarray(poses),
        dirs_cam,
        depths=None if depths is None else jnp.asarray(depths),
        fg_pixels=fg_pixels,
        ray_sharding=ray_sharding,
    )
    state, losses = train_with_governor(chunk, state, tc, log_fn=log_fn)

    opt_cam_poses = None
    if cfg.optimize_extrinsics:
        opt_cam_poses = np.asarray(optimized_poses(state["params"], jnp.asarray(poses)))
    if images_override is None:
        # Full-scene build: the fg/bg task-NeRF stage always loads its poses
        # from {fg,bg}_transforms.json / opt_cam_poses.npy, so export them
        # even when extrinsics optimisation is off (raw poses then).
        exported = opt_cam_poses if opt_cam_poses is not None else np.asarray(poses)
        np.save(os.path.join(cfg.data_dir, "opt_cam_poses.npy"), exported)
        export_task_transforms(cfg, exported)

    model = NGPModel(params=state["params"]["field"], cfg=ngp_cfg, settings=settings)
    if cfg.save_snapshot:
        save_snapshot(
            cfg.save_snapshot_path,
            {"field": model.params},
            ngp_cfg,
            extra={
                "losses_tail": [float(x) for x in losses[-5:]],
                # RenderSettings travel with the snapshot so cache replay
                # (NGPModel.load) renders exactly like the run that trained
                # the model (near_distance comes from the per-scene config).
                "settings": {
                    "n_coarse": settings.n_coarse,
                    "n_fine": settings.n_fine,
                    "near": settings.near,
                    "far": settings.far,
                    "min_transmittance": settings.min_transmittance,
                    "compute_dtype": (
                        "bfloat16" if settings.compute_dtype == jnp.bfloat16
                        else "float32"
                    ),
                },
            },
        )
    return model, opt_cam_poses


def export_task_transforms(cfg, opt_cam_poses_accio: np.ndarray):
    """Write fg_transforms.json / bg_transforms.json with the optimised poses
    (train_ngp.py:165-242). Frame matrices stored in NGP convention, file
    paths under images_fg/ and images_bg/."""
    base = {
        "fl_x": cfg.fx,
        "fl_y": cfg.fy,
        "k1": getattr(cfg, "k1", 0.0),
        "k2": getattr(cfg, "k2", 0.0),
        "k3": getattr(cfg, "k3", 0.0),
        "k4": getattr(cfg, "k4", 0.0),
        "p1": getattr(cfg, "p1", 0.0),
        "p2": getattr(cfg, "p2", 0.0),
        "is_fisheye": getattr(cfg, "is_fisheye", False),
        "cx": cfg.cx,
        "cy": cfg.cy,
        "w": cfg.W,
        "h": cfg.H,
        "aabb_scale": 1,
        "scale": cfg.scale,
        "offset": cfg.offset,
    }
    if cfg.camera_angle_x is not None:
        base["camera_angle_x"] = cfg.camera_angle_x
        base["camera_angle_y"] = cfg.camera_angle_y
    for tag in ("fg", "bg"):
        out = dict(base)
        out["frames"] = []
        for i, m_accio in enumerate(opt_cam_poses_accio):
            m = np.asarray(m_accio).copy()
            m[:3, 1] *= -1  # accio -> NGP for the file format
            m[:3, 2] *= -1
            out["frames"].append(
                {
                    "file_path": f"./images_{tag}/rgb_{i:04d}.png",
                    "transform_matrix": m.tolist(),
                }
            )
        with open(os.path.join(cfg.data_dir, f"{tag}_transforms.json"), "w") as f:
            json.dump(out, f, indent=2)


def get_vis_ngps(
    rgbs,
    movable_masks,
    scene_type,
    use_cache: bool = False,
    data_dir: Optional[str] = None,
    fg: bool = True,
    render_distract: bool = False,
    cfg_dir: Optional[str] = None,
    depths=None,
    scene_phys_bounds=None,
    field_overrides: Optional[dict] = None,
    train_overrides: Optional[dict] = None,
    warm_start: bool = False,
) -> NGPModel:
    """Build (or load) the fg / task-bg NeRF. Parity: ngp_visual_model.py:20-79.

    warm_start: the reference warm-starts fg/bg from full_base.ingp
    (ngp_visual_model.py:52-57) because NGP hash features transfer; the MLP
    field fine-tunes WORSE than it cold-starts (stale full-scene geometry must
    be unlearned), so cold start is the default here.

    movable_masks semantics (scene_model.py:104): True = pixels to make
    TRANSPARENT (mask as inverted alpha, ngp_visual_model.py:43-44).
    """
    from PIL import Image

    from dream2real_tpu.cfg import Config

    snap = os.path.join(data_dir, "fg_base.ingp" if fg else "bg_base.ingp")
    if use_cache:
        print(f'Using cached {"fg" if fg else "bg"} model')
        return NGPModel.load(snap)

    tag = "fg" if fg else "bg"
    out_path = os.path.join(data_dir, f"images_{tag}")
    os.makedirs(out_path, exist_ok=True)
    rgbs = np.asarray(rgbs)
    masks = np.asarray(movable_masks)
    alphas = (1 - masks.astype(np.uint8)) * 255
    rgba = np.concatenate([rgbs, alphas[..., None]], axis=-1).astype(np.uint8)
    for i in range(rgba.shape[0]):
        Image.fromarray(rgba[i]).save(os.path.join(out_path, f"rgb_{i:04d}.png"))

    cfg_dir = cfg_dir or os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = Config(os.path.join(cfg_dir, f"{tag}_scene.json"), data_dir)
    if scene_phys_bounds is not None:
        cfg.scene_phys_bounds = scene_phys_bounds
    model, _ = build_vis_model(
        cfg,
        render_distract=render_distract,
        images_override=rgba,
        depths=depths,
        field_overrides=field_overrides,
        train_overrides=train_overrides,
        warm_start=warm_start,
    )
    return model
