"""ImaginationEngine — the pipeline orchestrator.

Parity target: dream2real.py:43-402. Same three-call API driven by demo.py:
``build_scene_model()`` -> ``interpret_user_instr(instr)`` ->
``dream_best_pose(task_model)``, same cache flags, same artifacts
(goal_pose.txt / pose_batch.txt / pose_scores.txt / best_render.png,
dream2real.py:356-358).

TPU-first orchestration differences:
- the NGP training / rendering / physics / CLIP stages are the JAX components
  of this package (no Python->C++ boundaries, SURVEY §3.1);
- model residency hand-offs (`free()` calls to fit 24 GB,
  dream2real.py:135,165) become no-ops on v5e HBM but keep the lifecycle;
- interactive Open3D visualisation is replaced by offline exports
  (vis/cost_volume.py) — this framework targets headless TPU hosts.
"""

from __future__ import annotations

import os
import pathlib
from typing import Optional

import numpy as np

from dream2real_tpu.cfg import Config
from dream2real_tpu.data.loader import D2RDataLoader
from dream2real_tpu.lang.llm import LangModel
from dream2real_tpu.nerf.combined import CombinedRenderer
from dream2real_tpu.perception.captioner import Captioner
from dream2real_tpu.perception.segmentation import Segmentor
from dream2real_tpu.physics.collision import make_unsupcol_check
from dream2real_tpu.reconstruction import build_vis_model
from dream2real_tpu.sampling import get_virtual_cam_poses
from dream2real_tpu.scene_model import ObjectModel, SceneModel, TaskModel
from dream2real_tpu.scoring import optimise_pose_grid
from dream2real_tpu.ops.cameras import clip_view_intrinsics_like
from dream2real_tpu.utils.profiling import StageTimer, trace

_CURR_DIR = pathlib.Path(__file__).parent.absolute()


def _aabb_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    return bool(
        np.allclose(np.asarray(a[0]), np.asarray(b[0]))
        and np.allclose(np.asarray(a[1]), np.asarray(b[1]))
    )


class ImaginationEngine:
    """Imagination engine for generating task models from user instructions."""

    def __init__(
        self,
        cfg: Config,
        embodied: bool = False,
        llm_backend=None,
        caption_backend=None,
        clip_loader=None,
        ngp_overrides: Optional[dict] = None,
        mask_generator=None,
        propagator=None,
    ):
        self.embodied = embodied
        self.cfg = cfg
        self.data_dir = cfg.data_dir
        self.use_phys = cfg.use_phys
        self.use_phys_tsdf = cfg.use_phys_tsdf
        self.lazy_phys_mods = cfg.lazy_phys_mods
        self.multi_view_captions = cfg.multi_view_captions
        self.use_cache_dynamic_masks = cfg.use_cache_dynamic_masks
        self.use_cache_segs = cfg.use_cache_segs
        self.use_cache_captions = cfg.use_cache_captions
        self.use_cache_phys = cfg.use_cache_phys
        self.use_cache_cam_poses = cfg.use_cache_cam_poses
        self.use_cache_renders = cfg.use_cache_renders
        self.use_cache_goal_pose = cfg.use_cache_goal_pose
        self.render_distractors = cfg.render_distractors
        self.spatial_smoothing = cfg.spatial_smoothing
        self.use_cache_vis = cfg.use_cache_vis
        self.use_vis_pcds = cfg.use_vis_pcds
        self.pcds_type = cfg.pcds_type
        self.render_cam_pose_idx = cfg.render_cam_pose_idx
        self.scene_type = cfg.scene_type
        self.topdown = cfg.scene_type in [0, 3]  # dream2real.py:69
        self.physics_only = cfg.physics_only
        self.single_view_idx = cfg.single_view_idx
        self.sample_bounds = getattr(cfg, "sample_bounds", None)
        self.use_templates = getattr(cfg, "use_templates", False)
        self.clip_batch = getattr(cfg, "clip_batch", 256)
        from dream2real_tpu.ops.cameras import normalize_distortion

        # Brown-Conrady lens model of the scan camera (reference camera
        # block, cfg.py:101-112); None for pinhole configs.
        self.distortion = normalize_distortion(
            getattr(cfg, "distortion_array", None)
        )
        self.ngp_overrides = ngp_overrides or {}

        self.depths_gt = None
        self.scene_model = None
        # Per-stage wall-clock observability (the reference's FAQ-level "how
        # long does each stage take", README.md:124-126); report via
        # `stage_timer.report()` — demo.py prints it after the run.
        self.stage_timer = StageTimer()
        self.segmentor = Segmentor(
            mask_generator=mask_generator, propagator=propagator
        )
        self.caption = cfg.caption
        if cfg.caption:
            self.captioner = Captioner(
                topdown=self.topdown,
                read_cache=self.use_cache_captions,
                cache_path=os.path.join(self.data_dir, "captions.json"),
                backend=caption_backend,
            )
        # Hole inpainting (dream2real.py:84-87): the reference constructs
        # the SD-2 inpaint pipeline at init when the flag is set and never
        # calls it downstream (load-only). We mirror the flag->construction
        # contract lazily (perception/diffusion.py gates the checkpoint and
        # falls back to telea) and additionally expose inpaint_images() so
        # the path is actually drivable.
        self.inpaint_holes = bool(getattr(cfg, "inpaint_holes", False))
        self.lang_model = LangModel(
            cache_path=os.path.join(self.data_dir, "lang_cache.json")
            if os.path.exists(os.path.join(self.data_dir, "lang_cache.json"))
            else str(_CURR_DIR / "lang" / "cache.json"),
            read_cache=cfg.use_cache_llm,
            backend=llm_backend,
        )
        self.renderer = None
        self.clip_loader = clip_loader
        self._clip_scorer = None
        self._tokenizer = None
        # _get_clip may be entered concurrently by the scoring-prefetch
        # thread (prefetch.py) and the main thread.
        import threading

        self._clip_lock = threading.Lock()
        self._score_prefetch = None

        assert cfg.scene_centre is not None
        assert cfg.scene_phys_bounds is not None
        assert cfg.sample_res is not None
        self.scene_centre = cfg.scene_centre
        self.scene_phys_bounds = cfg.scene_phys_bounds
        self.sample_res = cfg.sample_res

    # ------------------------------------------------------------------

    def build_scene_model(self, raw_data=None):
        """Load scan, segment, reconstruct, caption -> SceneModel
        (dream2real.py:101-177)."""
        print("Building scene model...")
        intrinsics = self.cfg.intrinsics_matrix()
        with self.stage_timer.stage("data_load"):
            dataloader = D2RDataLoader(self.cfg)
            rgbs, depths, raw_cam_poses = (
                dataloader.load_rgbds() if raw_data is None else raw_data
            )
            self.out_scene_bound_masks = dataloader.remove_background(
                intrinsics, self.scene_phys_bounds,
                use_cache=self.use_cache_dynamic_masks,
                distortion=self.distortion,
            )
        if self.inpaint_holes:
            # Fill sensor holes before segmentation/captioning consume the
            # frames (the reference gates its inpainter on this flag but
            # leaves it uncalled — see inpaint_images).
            rgbs = self.inpaint_images(rgbs)
        self.depths_gt = np.stack(
            [np.asarray(depths[i]) for i in self.render_cam_pose_idx]
        )

        video_path = os.path.join(self.data_dir, "seg_images")
        with self.stage_timer.stage("segmentation"):
            if os.path.exists(video_path):
                masks = self.segmentor.segment_associate(
                    video_path, depths, dataloader.T_WC_data, intrinsics,
                    self.data_dir, self.out_scene_bound_masks, self.scene_centre,
                    show=self.cfg.visseg, use_cache=self.use_cache_segs,
                )
            else:
                masks = self.segmentor.segment(
                    np.asarray(rgbs), depths, self.data_dir,
                    show=self.cfg.visseg, use_cache=self.use_cache_segs,
                )
            self.segmentor.free()
        masks = np.asarray(masks)

        # mask idx 0 = bground, 255 = outside scene bounds (dream2real.py:139).
        uniq = np.unique(masks)
        num_objs = len(uniq) - 1 if 255 in uniq else len(uniq)

        if self.use_cache_cam_poses:
            print("Using cached optimised camera poses")
            opt_cam_poses = np.load(os.path.join(self.data_dir, "opt_cam_poses.npy"))
            self._full_model = None
        else:
            with self.stage_timer.stage("full_scene_nerf"):
                self._full_model, opt_cam_poses = build_vis_model(
                    self.cfg,
                    # The reference ALSO opts the full-scene model out of the
                    # convergence governor: dream2real.py:150 passes
                    # dynamic_time_extension=False (extension only applies to
                    # the fg/bg task NeRFs via get_vis_ngps' default True).
                    dynamic_time_extension=False,
                    render_distract=self.render_distractors,
                    depths=np.asarray(depths),
                    field_overrides=self.ngp_overrides.get("field"),
                    train_overrides=self.ngp_overrides.get("train"),
                )
            if opt_cam_poses is None:
                opt_cam_poses = np.asarray(raw_cam_poses)
        opt_cam_poses = [np.asarray(p, np.float32) for p in opt_cam_poses]

        if self.lazy_phys_mods:
            phys_models = [None] * num_objs
            init_poses = [None] * num_objs
        else:
            from dream2real_tpu.physics.models import get_phys_models

            with self.stage_timer.stage("physics_models"):
                phys_models, init_poses = get_phys_models(
                    depths, opt_cam_poses, intrinsics, masks, num_objs,
                    self.scene_phys_bounds,
                    save_dir=os.path.join(self.data_dir, "phys_mods/"),
                    vis=False, use_cache=self.use_cache_phys,
                    use_phys_tsdf=self.use_phys_tsdf,
                    distortion=self.distortion,
                )

        if self.caption:
            with self.stage_timer.stage("captioning"):
                captions, thumbnails = self.captioner.caption_objs(
                    num_objs, rgbs, masks, self.lang_model,
                    self.out_scene_bound_masks,
                    topdown=self.topdown, multi_view=self.multi_view_captions,
                    single_view_idx=self.single_view_idx,
                )
                self.captioner.free()
        else:
            cache_path = os.path.join(self.data_dir, "captions.json")
            if os.path.exists(cache_path):
                import json

                captions = json.load(open(cache_path))
            else:
                captions = ["__background__"] + [
                    f"object {i}" for i in range(1, num_objs)
                ]
            thumbnails = [None] * num_objs

        vis_models = [None] * num_objs
        objs = [
            ObjectModel(
                captions[i], vis_models[i], phys_models[i], init_poses[i],
                thumbnails[i] if i < len(thumbnails) else None, i,
            )
            for i in range(num_objs)
        ]
        self.scene_model = SceneModel(
            self.scene_centre, objs, objs[0], np.asarray(rgbs), depths,
            opt_cam_poses, intrinsics, masks, self.scene_phys_bounds,
            self.scene_type, distortion=self.distortion,
        )

    # ------------------------------------------------------------------

    def inpaint_images(self, rgbs, masks=None):
        """Fill scan holes in RGB frames when cfg.inpaint_holes is set.

        Parity+: the reference constructs its SD-2 inpainter under this
        flag but never invokes it (dream2real.py:84-87 — load-only); here
        the flag gates an actually-drivable path. masks: optional per-frame
        (H, W) hole masks; None auto-detects white holes
        (reference diffusion.py:24-27). SD-2 runs only with a local
        checkpoint; otherwise a deterministic telea fill is used
        (perception/diffusion.py).
        """
        rgbs = np.asarray(rgbs)
        if not self.inpaint_holes:
            return rgbs
        from dream2real_tpu.perception.diffusion import inpaint

        with self.stage_timer.stage("inpaint_holes"):
            out = [
                inpaint(rgbs[i],
                        None if masks is None else np.asarray(masks[i]))
                for i in range(len(rgbs))
            ]
        return np.stack(out)

    def determine_movable_obj(self, user_instr):
        obj_captions = [obj.name for obj in self.scene_model.objs]
        movable_idx = self.lang_model.get_movable_obj_idx(user_instr, obj_captions)
        return self.scene_model.objs[movable_idx], movable_idx

    def determine_relevant_objs(self, norm_caption, movable_obj_idx):
        obj_captions = [obj.name for obj in self.scene_model.objs]
        relevant_idxs = self.lang_model.get_relevant_obj_idxs(
            norm_caption, obj_captions, movable_obj_idx
        )
        if len(relevant_idxs) == 0:
            raise RuntimeError(
                "Error: None of the captioned objects were determined to be relevant."
            )
        return [self.scene_model.objs[idx] for idx in relevant_idxs]

    def interpret_user_instr(self, user_instr, goal_caption=None, norm_captions=None):
        """Parse instruction -> TaskModel (dream2real.py:216-280)."""
        if self.scene_model is None:
            raise RuntimeError(
                "Must call build_scene_model() first before receiving user instructions"
            )
        with self.stage_timer.stage("llm_interpret"):
            if goal_caption is None:
                goal_caption, norm_caption = self.lang_model.parse_instr(user_instr)
                print("Goal caption:", goal_caption)
                print("Normalised caption:", norm_caption)
                norm_captions = [norm_caption]
            movable_obj, movable_obj_idx = self.determine_movable_obj(user_instr)
            relevant_objs = self.determine_relevant_objs(
                goal_caption, movable_obj_idx
            )

        if self.lazy_phys_mods:
            with self.stage_timer.stage("task_phys_models"):
                (
                    [bground_phys, movable_phys],
                    [bground_init_pose, movable_init_pose],
                ) = TaskModel.create_lazy_phys_mods(
                    self.scene_model, movable_obj, self.scene_phys_bounds,
                    save_dir=os.path.join(self.data_dir, "phys_mod/"),
                    embodied=self.embodied, vis=False,
                    use_cache=self.use_cache_phys,
                    use_phys_tsdf=self.use_phys_tsdf,
                    use_vis_pcds=self.use_vis_pcds,
                    single_view_idx=self.single_view_idx,
                )

        # Scoring-setup prefetch: warm the CLIP/renderer/score-program/physics
        # jit caches in a background thread while task-NeRF training owns the
        # device timeline (see prefetch.py). Best-effort — dream_best_pose
        # verifies every prediction before reusing.
        self._score_prefetch = None
        fresh_run = not (self.use_cache_goal_pose or self.use_cache_renders)
        want_scoring = (
            fresh_run
            and not self.use_vis_pcds
            and not self.physics_only
            and len(self.render_cam_pose_idx) == 1
            and self.depths_gt is not None
        )
        want_phys = (
            fresh_run and self.use_phys and self.lazy_phys_mods
            and movable_init_pose is not None
        )
        if (want_scoring or want_phys) and os.environ.get("D2R_PREFETCH", "1") != "0":
            from dream2real_tpu.prefetch import start_scoring_prefetch

            res = getattr(self.cfg, "render_res", 336)
            clip_K = clip_view_intrinsics_like(
                self.scene_model.intrinsics,
                (self.cfg.height, self.cfg.width), res=res,
            )
            fg_phys_h = (
                movable_phys if self.lazy_phys_mods else movable_obj.phys_model
            )
            obj_aabb, fg_crop = self._movable_crop(fg_phys_h, res)
            phys_spec = None
            if want_phys:
                phys_spec = dict(
                    bg_phys=bground_phys, fg_phys=movable_phys,
                    init_pose=np.asarray(movable_init_pose),
                    scene_centre=self.scene_centre, sample_res=self.sample_res,
                    scene_type=self.scene_type,
                    bounds_override=self.sample_bounds, embodied=self.embodied,
                )
            self._score_prefetch = start_scoring_prefetch(
                self._get_clip,
                goal_caption, norm_captions,
                use_templates=self.use_templates,
                data_dir=self.data_dir,
                scene_phys_bounds=self.scene_phys_bounds,
                field_overrides=self.ngp_overrides.get("field"),
                res=res,
                clip_K=clip_K,
                obj_aabb=obj_aabb,
                fg_crop=fg_crop,
                render_poses=get_virtual_cam_poses(
                    self.scene_model.opt_cam_poses, self.render_cam_pose_idx
                ),
                depth_gt=None if self.depths_gt is None else self.depths_gt[0],
                save_renders=getattr(self.cfg, "save_renders", True),
                scoring=want_scoring,
                phys=phys_spec,
                # Upper bound on the valid candidate count, for the mesh/slab
                # decision when the physics prefetch can't supply the real one.
                n_poses_hint=int(np.prod(self.sample_res)),
            )

        depths_np = np.asarray(self.scene_model.depths)
        with self.stage_timer.stage("task_nerfs"):
            movable_obj.vis_model = TaskModel.create_movable_vis_model(
                self.scene_model, movable_obj, self.out_scene_bound_masks,
                os.path.join(self.data_dir, "movable_vis_mod/"),
                use_vis_pcds=self.use_vis_pcds, pcds_type=self.pcds_type,
                single_view_idx=self.single_view_idx, use_cache=self.use_cache_vis,
                data_dir=self.data_dir, depths=depths_np,
                field_overrides=self.ngp_overrides.get("field"),
                train_overrides=self.ngp_overrides.get("train"),
            )

            task_bground_obj, task_bground_masks = TaskModel.create_task_bground_obj(
                self.scene_model, movable_obj, relevant_objs,
                self.out_scene_bound_masks,
                os.path.join(self.data_dir, "task_bground_vis_mod/"),
                use_vis_pcds=self.use_vis_pcds, pcds_type=self.pcds_type,
                single_view_idx=self.single_view_idx,
                render_distractors=self.render_distractors,
                use_cache=self.use_cache_vis, data_dir=self.data_dir,
                depths=depths_np,
                field_overrides=self.ngp_overrides.get("field"),
                train_overrides=self.ngp_overrides.get("train"),
            )

        if self.lazy_phys_mods:
            movable_obj.phys_model = movable_phys
            movable_obj.pose = movable_init_pose
            task_bground_obj.phys_model = bground_phys

        return TaskModel(
            user_instr, goal_caption, norm_captions, self.scene_model,
            movable_obj, task_bground_obj, task_bground_masks, self.topdown,
        )

    # ------------------------------------------------------------------

    def _get_clip(self):
        with self._clip_lock:
            return self._get_clip_locked()

    def _get_clip_locked(self):
        if self._clip_scorer is None:
            from dream2real_tpu.clip.scorer import ClipScorer
            from dream2real_tpu.clip.tokenizer import ClipTokenizer

            if self.clip_loader is not None:
                params, ccfg = self.clip_loader()
            else:
                try:
                    from dream2real_tpu.clip.convert import load_clip

                    params, ccfg = load_clip()
                    print("Loaded CLIP ViT-L/14-336 weights.")
                except FileNotFoundError:
                    # Without real weights the pipeline would still run and
                    # write a semantically meaningless goal_pose.txt — that
                    # must be a loud failure, not a warning, unless the run
                    # explicitly opts in (hermetic demos, mechanics tests).
                    if os.environ.get("D2R_ALLOW_RANDOM_CLIP") != "1":
                        raise RuntimeError(
                            "No local CLIP checkpoint found (reference scorer: "
                            "openai/clip-vit-large-patch14-336, "
                            "clip_scoring.py:150-151). Set D2R_CLIP_PATH to a "
                            "checkpoint for real scoring, or set "
                            "D2R_ALLOW_RANDOM_CLIP=1 to proceed with a small "
                            "RANDOM CLIP whose scores are self-consistent but "
                            "not semantic (goal_pose.txt will be meaningless)."
                        ) from None
                    import jax

                    from dream2real_tpu.clip.model import CLIPConfig, init_clip_params

                    print(
                        "WARNING: no local CLIP checkpoint found — using a "
                        "small RANDOM CLIP (D2R_ALLOW_RANDOM_CLIP=1). Scores "
                        "are self-consistent but not semantic."
                    )
                    ccfg = CLIPConfig(
                        image_size=336, patch_size=28, vision_width=128,
                        vision_layers=4, vision_heads=4, text_width=128,
                        text_layers=2, text_heads=4, projection_dim=64,
                    )
                    params = init_clip_params(jax.random.PRNGKey(0), ccfg)
            self._clip_scorer = ClipScorer(params, ccfg, batch_size=self.clip_batch)
            self._tokenizer = ClipTokenizer(
                context_length=ccfg.context_length, vocab_size=ccfg.vocab_size
            )
        return self._clip_scorer, self._tokenizer

    def _movable_crop(self, fg_phys_h, res: int):
        """(obj_aabb, fg_crop) for the cropped fast path, from the movable's
        collision shell. Deterministic from the phys handle + config, so the
        scoring prefetch computes the identical values before training. The
        fg_crop CLIPPING GUARD (grow the window if a candidate's projected
        AABB exceeds it) runs over the physics-valid candidates — in the
        prefetch thread when one is live (prefetch.py), else as the runtime
        backstop in optimise_pose_grid."""
        obj_aabb = None
        fg_crop = 0
        if fg_phys_h is not None and getattr(fg_phys_h, "points", None) is not None:
            pts = fg_phys_h.points
            pv = pts[pts[:, 3] > 0, :3]
            if len(pv):
                pad = 0.03
                obj_aabb = (
                    tuple(pv.min(axis=0) - pad), tuple(pv.max(axis=0) + pad)
                )
                # res//2 covers the projected object with margin on all
                # demo scenes; a worst-case-pose-exact adaptive bound was
                # measured LARGER (apparent size grows for candidates
                # toward the camera — which clipping wouldn't hurt, since
                # those score badly either way). Config fg_crop overrides;
                # D2R_FG_CROP overrides both (perf A/B + its oracle gate).
                fg_crop = int(os.environ.get(
                    "D2R_FG_CROP",
                    self.cfg.raw.get("engine", {}).get("fg_crop", res // 2),
                ))
        return obj_aabb, fg_crop

    def dream_best_pose(self, task_model, vis_cost_vol: bool = True):
        """Imagine + score candidate placements (dream2real.py:282-402)."""
        movable_init_pose = np.asarray(task_model.movable_obj.pose)
        pf = self._score_prefetch.result() if self._score_prefetch else None

        phys_check = None
        if self.use_phys and not self.use_cache_renders:
            with self.stage_timer.stage("phys_check_build"):
                bg_phys = task_model.task_bground_obj.phys_model
                fg_phys = task_model.movable_obj.phys_model
                # Handles retained for robot motion planning in embodied runs
                # (dream2real.py:317-318 parity).
                self.static_phys_handles = [bg_phys]
                self.movable_phys_handle = fg_phys
                if (
                    pf is not None
                    and pf.get("phys_check") is not None
                    and pf.get("phys_bg") is bg_phys
                    and pf.get("phys_fg") is fg_phys
                    and np.array_equal(pf.get("phys_init_pose"), movable_init_pose)
                ):
                    phys_check = pf["phys_check"]
                else:
                    if pf is not None:  # stale physics prefetch: drop it
                        pf = dict(pf)
                        pf.pop("is_valid", None)
                    phys_check = make_unsupcol_check(
                        bg_phys.tsdf,
                        fg_phys.points,
                        movable_init_pose,
                        self.scene_centre,
                        self.sample_res,
                        disallow_regrasp=self.embodied,
                    )

        if self.use_vis_pcds and not self.use_cache_goal_pose:
            from dream2real_tpu.pcd.renderer import PointCloudRenderer

            self.renderer = PointCloudRenderer(task_model)
        else:
            fg = task_model.movable_obj.vis_model
            bg = task_model.task_bground_obj.vis_model
            res = getattr(self.cfg, "render_res", 336)
            # Object AABB from the movable's collision shell -> cropped fast
            # path (fg marched only in its projected window).
            clip_K = clip_view_intrinsics_like(
                self.scene_model.intrinsics,
                (self.cfg.height, self.cfg.width),
                res=res,
            )
            obj_aabb, fg_crop = self._movable_crop(
                task_model.movable_obj.phys_model, res
            )
            # Adopt the prefetch thread's clipping-guard bump: it was
            # computed over the SAME physics-valid candidate set the runtime
            # guard in optimise_pose_grid uses (contingent on the phys check
            # itself having been adopted above), so the prefetched score
            # program's window size is final and the warm-up survives.
            if (
                pf is not None
                and pf.get("fg_crop")
                and phys_check is not None
                and phys_check is pf.get("phys_check")
                and _aabb_equal(pf.get("obj_aabb"), obj_aabb)
            ):
                fg_crop = max(fg_crop, pf["fg_crop"])
            pf_r = None if pf is None else pf.get("renderer")
            if (
                pf_r is not None
                and pf_r.fg_cfg == fg.cfg
                and pf_r.bg_cfg == bg.cfg
                and pf_r.settings == fg.settings
                and pf_r.res == res
                and np.allclose(pf_r.intrinsics, clip_K)
                and pf_r.fg_crop == min(fg_crop, res)
                and _aabb_equal(pf_r.obj_aabb, obj_aabb)
            ):
                # The prefetched renderer was built with dummy params of
                # these exact shapes and its jit wrappers were warmed during
                # training — swap in the trained weights and reuse it.
                pf_r.fg_params = fg.params
                pf_r.bg_params = bg.params
                self.renderer = pf_r
            else:
                if pf_r is not None:
                    print("# prefetch: renderer config mismatch, rebuilding")
                    pf = dict(pf)
                    for k in ("renderer", "score_fn", "score_fn_key"):
                        pf.pop(k, None)
                self.renderer = CombinedRenderer(
                    fg.params, fg.cfg, bg.params, bg.cfg,
                    settings=fg.settings,
                    res=res,
                    intrinsics=clip_K,
                    out_render_path=os.path.join(self.data_dir, "cb_render"),
                    obj_aabb=obj_aabb,
                    fg_crop=fg_crop,
                )

        if self.use_cache_goal_pose:
            best_pose = np.loadtxt(os.path.join(self.data_dir, "goal_pose.txt"))
            pose_batch = np.loadtxt(os.path.join(self.data_dir, "pose_batch.txt"))
            pose_scores = np.loadtxt(os.path.join(self.data_dir, "pose_scores.txt"))
        else:
            clip_scorer, tokenizer = (None, None)
            if not self.physics_only:
                clip_scorer, tokenizer = self._get_clip()
            with self.stage_timer.stage("imagine_and_score"), trace("imagine-loop"):
                best_pose, pose_batch, pose_scores = optimise_pose_grid(
                    self.renderer,
                    self.depths_gt,
                    self.render_cam_pose_idx,
                    task_model,
                    self.data_dir,
                    sample_res=self.sample_res,
                    phys_check=phys_check,
                    use_templates=self.use_templates,
                    scene_type=self.scene_type,
                    use_vis_pcds=self.use_vis_pcds,
                    use_cache_renders=self.use_cache_renders,
                    smoothing=self.spatial_smoothing,
                    physics_only=self.physics_only,
                    clip_scorer=clip_scorer,
                    tokenizer=tokenizer,
                    bounds_override=self.sample_bounds,
                    save_renders=getattr(self.cfg, "save_renders", True),
                    prefetch=pf,
                )
            np.savetxt(os.path.join(self.data_dir, "goal_pose.txt"), best_pose)
            np.savetxt(os.path.join(self.data_dir, "pose_batch.txt"), pose_batch)
            np.savetxt(os.path.join(self.data_dir, "pose_scores.txt"), pose_scores)

        if vis_cost_vol:
            try:
                with self.stage_timer.stage("artifacts"):
                    from dream2real_tpu.vis.cost_volume import (
                        export_cost_volume,
                        export_multiverse,
                    )

                    export_cost_volume(
                        pose_scores, self.sample_res, pose_batch,
                        os.path.join(self.data_dir, "cost_volume.png"),
                    )
                    fg_h = task_model.movable_obj.phys_model
                    bg_h = task_model.task_bground_obj.phys_model
                    if fg_h is not None and getattr(fg_h, "points", None) is not None:
                        export_multiverse(
                            pose_scores, pose_batch, fg_h.points,
                            movable_init_pose,
                            os.path.join(self.data_dir, "multiverse.png"),
                            bground_points=None if bg_h is None else bg_h.points,
                        )
            except Exception as e:  # visualisation is best-effort
                print("cost volume export skipped:", e)

        if getattr(self.cfg, "gui", False):
            # The reference's vis.gui pops Open3D windows + the NGP GUI
            # (geometry_utils.py:137-249, train_ngp.py:59-60); on headless
            # TPU hosts the flag exports an interactive self-contained HTML
            # viewer of the same geometry instead.
            try:
                with self.stage_timer.stage("artifacts"):
                    self._export_viewer(task_model, best_pose)
            except Exception as e:
                print("viewer export skipped:", e)

        return np.asarray(best_pose).reshape(4, 4)

    def _export_viewer(self, task_model, best_pose) -> str:
        from dream2real_tpu.vis.viewer import export_scene_html

        points, meshes, frames = [], [], []
        fg_h = task_model.movable_obj.phys_model
        bg_h = task_model.task_bground_obj.phys_model
        if fg_h is not None and getattr(fg_h, "points", None) is not None:
            pts = np.asarray(fg_h.points)
            pv = pts[pts[:, 3] > 0, :3]
            points.append((pv, np.tile([255, 80, 80], (len(pv), 1)), "movable"))
        if bg_h is not None and getattr(bg_h, "points", None) is not None:
            pts = np.asarray(bg_h.points)
            pv = pts[pts[:, 3] > 0, :3]
            points.append((pv, np.tile([120, 120, 140], (len(pv), 1)),
                           "background"))
        mesh_dir = os.path.join(self.data_dir, "phys_mod")
        if os.path.isdir(mesh_dir):
            from dream2real_tpu.physics.mesh import load_obj

            for fn in sorted(os.listdir(mesh_dir)):
                if fn.startswith("mesh_concave_") and fn.endswith(".obj"):
                    try:
                        v, f = load_obj(os.path.join(mesh_dir, fn))
                        meshes.append((v, f, "#44cc88", fn[:-4]))
                    except Exception:
                        pass
        for i in self.render_cam_pose_idx:
            frames.append((np.asarray(self.scene_model.opt_cam_poses[i]),
                           f"cam{i}"))
        frames.append((np.asarray(best_pose).reshape(4, 4), "goal"))
        out = export_scene_html(
            os.path.join(self.data_dir, "viewer.html"),
            points=points, meshes=meshes, frames=frames,
            title="dream2real_tpu — imagined placement",
        )
        print(f"interactive viewer exported: {out}")
        return out
