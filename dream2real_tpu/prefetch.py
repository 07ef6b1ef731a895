"""Scoring-setup prefetch: overlap imagine-and-score setup with NeRF training.

At demo scale (a few hundred candidate poses) the warm imagine stage used to
pay ~25 s of setup serially before the first score came back: CLIP weight
load, text towers, the fused render+CLIP program's compile/deserialize (the
first pose slab alone was ~21 s with a warm persistent cache), the background
render compile, the best-render re-render compile, and the physics-check
launch. None of that needs the TRAINED NeRF weights — only their shapes,
which are fully determined by the config (`reconstruction.field_spec`). So a
background thread builds the CombinedRenderer and the fused score program
with dummy params of the final shapes and runs one warm-up call of each jit
wrapper while task-NeRF training owns the device timeline; the real calls
later hit warm jit caches and pay only compute.

The physics stage is prefetched for real, not just warmed: the phys models
and the candidate grid exist before training starts, so the validity mask is
computed during training and handed to `optimise_pose_grid`.

All of it is best-effort: any mismatch between the predicted and the actual
renderer configuration (or any exception in the thread) falls back to the
serial path. The reference has no analogue (its stages are strictly
sequential, dream2real.py:282-402); this is the TPU build's answer to
"iteration latency is a feature" (reference README FAQ).
"""

from __future__ import annotations

import os
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    """Block until x is computed, via a scalar reduction (big-array D2H is
    slow on tunneled TPU backends; block_until_ready does not wait there)."""
    if isinstance(x, (tuple, list)):
        for v in x:
            _sync(v)
    elif hasattr(x, "astype"):
        float(jnp.sum(x.astype(jnp.float32)))


class ScoringPrefetch:
    """Handle for the background setup thread. `result()` joins and returns
    the prefetch dict, or None if the thread failed (callers fall back)."""

    def __init__(self):
        self._box = {}
        self._thread: Optional[threading.Thread] = None

    def result(self, timeout: float = 1800.0):
        if self._thread is not None:
            self._thread.join(timeout)
            if self._thread.is_alive():
                print("# prefetch: still running past timeout; falling back")
                return None
        return self._box.get("out")


def start_scoring_prefetch(
    get_clip,
    goal_caption: str,
    norm_captions,
    use_templates: bool,
    data_dir: str,
    scene_phys_bounds,
    field_overrides: Optional[dict],
    res: int,
    clip_K: np.ndarray,
    obj_aabb,
    fg_crop: int,
    render_poses: Optional[np.ndarray],
    depth_gt: Optional[np.ndarray],
    save_renders: bool,
    cfg_dir: Optional[str] = None,
    phys: Optional[dict] = None,
    scoring: bool = True,
    n_poses_hint: Optional[int] = None,
) -> ScoringPrefetch:
    """Spawn the setup thread. Arguments mirror what `engine.dream_best_pose`
    + `scoring._fused_score` will reconstruct later; the consumer verifies
    the prediction matched before reusing anything.

    phys: optional dict(bg_phys=, fg_phys=, init_pose=, scene_centre=,
    sample_res=, scene_type=, bounds_override=, embodied=) — when given, the
    physics check is built AND evaluated over the real candidate grid.

    n_poses_hint: expected VALID candidate count, used for the mesh/slab
    decision (scoring._slab_spec) when the physics prefetch has not produced
    the real validity mask; pass the full grid size as an upper bound.
    """
    handle = ScoringPrefetch()

    def _run():
        import time

        t0 = time.time()
        out = {}
        # Dummy-execution warm-ups only pay off where compiles are expensive
        # (TPU); on the CPU test mesh they would double test wall-clock.
        # D2R_PREFETCH_WARM=1 forces them (used by the prefetch tests).
        warm = (
            jax.default_backend() == "tpu"
            or os.environ.get("D2R_PREFETCH_WARM") == "1"
        )
        try:
            # ---- physics first: cheapest, and unblocks the earliest stage.
            if phys is not None:
                from dream2real_tpu.physics.collision import make_unsupcol_check
                from dream2real_tpu.sampling import sample_poses_grid

                phys_check = make_unsupcol_check(
                    phys["bg_phys"].tsdf,
                    phys["fg_phys"].points,
                    np.asarray(phys["init_pose"]),
                    phys["scene_centre"],
                    phys["sample_res"],
                    disallow_regrasp=phys["embodied"],
                )
                pose_batch = np.asarray(
                    sample_poses_grid(
                        phys["scene_centre"], phys["sample_res"],
                        scene_type=phys["scene_type"],
                        bounds_override=phys["bounds_override"],
                    )
                )
                is_valid = np.asarray(phys_check(jnp.asarray(pose_batch)))
                out["phys_check"] = phys_check
                out["phys_fg"] = phys["fg_phys"]
                out["phys_bg"] = phys["bg_phys"]
                out["phys_init_pose"] = np.asarray(phys["init_pose"])
                out["pose_batch"] = pose_batch
                out["is_valid"] = is_valid

            if not scoring:
                print(f"# prefetch: physics done in {time.time()-t0:.1f}s",
                      flush=True)
                handle._box["out"] = out or None
                return

            # ---- fg_crop clipping guard, over the PHYSICS-VALID candidates
            # (the same set optimise_pose_grid's runtime guard checks): grow
            # the window now so the score program below is compiled at its
            # final static size. The full grid would over-size the window —
            # the poses that project largest (toward the camera) are
            # colliding ones the phys check removes.
            crop = fg_crop
            if (
                obj_aabb is not None and crop and crop < res
                and render_poses is not None
                and out.get("is_valid") is not None
            ):
                valid = out["pose_batch"][out["is_valid"]]
                if len(valid):
                    from dream2real_tpu.nerf.combined import required_crop

                    need = required_crop(
                        obj_aabb, clip_K, res, out["phys_init_pose"],
                        render_poses, valid,
                    )
                    if need > crop:
                        print(
                            f"# prefetch fg_crop guard: valid candidates "
                            f"need {need}px, growing window from {crop}px",
                            flush=True,
                        )
                        crop = need
            out["obj_aabb"] = obj_aabb
            out["fg_crop"] = crop

            # ---- CLIP + text towers.
            clip_scorer, tokenizer = get_clip()
            from dream2real_tpu.clip.scorer import build_captions

            captions = build_captions(goal_caption, norm_captions, use_templates)
            txt = clip_scorer.text_embeddings(np.asarray(tokenizer(captions)))
            _sync(txt)
            out["clip_scorer"] = clip_scorer
            out["tokenizer"] = tokenizer
            out["captions"] = captions
            out["txt"] = txt

            # ---- Renderer with dummy params of the final shapes.
            from dream2real_tpu.cfg import Config
            from dream2real_tpu.nerf.combined import CombinedRenderer
            from dream2real_tpu.nerf.model import init_ngp_params
            from dream2real_tpu.reconstruction import field_spec

            cdir = cfg_dir or os.path.join(
                os.path.dirname(__file__), "..", "configs"
            )
            specs = {}
            for tag in ("fg", "bg"):
                c = Config(os.path.join(cdir, f"{tag}_scene.json"), data_dir)
                if scene_phys_bounds is not None:
                    c.scene_phys_bounds = scene_phys_bounds
                specs[tag] = field_spec(c, None, field_overrides)
            fg_cfg, fg_settings = specs["fg"]
            bg_cfg, _ = specs["bg"]
            dummy_fg = init_ngp_params(jax.random.PRNGKey(0), fg_cfg)
            dummy_bg = init_ngp_params(jax.random.PRNGKey(1), bg_cfg)
            renderer = CombinedRenderer(
                dummy_fg, fg_cfg, dummy_bg, bg_cfg,
                settings=fg_settings, res=res, intrinsics=clip_K,
                out_render_path=os.path.join(data_dir, "cb_render"),
                obj_aabb=obj_aabb, fg_crop=crop,
            )
            out["renderer"] = renderer

            # ---- Background-render warm-up (compiles the cached wrapper).
            eye = jnp.eye(4)
            # bool: movable_masks are boolean arrays downstream; dtype is
            # part of the jit cache key, so the warm-up must match.
            dummy_mask = None if depth_gt is None else np.ones(
                np.asarray(depth_gt).shape, bool
            )
            bg_view = None
            if warm:
                bg_view = renderer.render_background(eye, depth_gt, dummy_mask)
                _sync(tuple(bg_view))

            # ---- Fused score program warm-up at the first-slab shape, with
            # the same mesh/slab decision _fused_score will make (the real
            # valid count when the physics prefetch produced it, else the
            # caller's hint).
            from dream2real_tpu.parallel.imagine import make_imagine_and_score
            from dream2real_tpu.scoring import _slab_spec

            n_norm = 0 if norm_captions is None else len(norm_captions)
            cb = min(32, clip_scorer.batch_size)
            if out.get("is_valid") is not None:
                k_pred = int(np.asarray(out["is_valid"]).sum())
            else:
                k_pred = n_poses_hint if n_poses_hint is not None else 1 << 30
            mesh, slab, _quantum = _slab_spec(cb, k_pred)
            score_fn = make_imagine_and_score(
                renderer.fg_cfg, clip_scorer.cfg, renderer.settings,
                renderer.dirs_cam, n_norm_captions=n_norm,
                use_templates=use_templates, clip_batch=cb,
                obj_aabb=renderer.obj_aabb, fg_crop=renderer.fg_crop,
                crop_settings=renderer.crop_settings,
                intrinsics=renderer.intrinsics, row_chunk=renderer.row_chunk,
                return_renders=save_renders, mesh=mesh,
            )
            if warm:
                chunk = jnp.tile(jnp.eye(4)[None], (slab, 1, 1))
                r = score_fn(
                    dummy_fg, clip_scorer.params, eye, eye, bg_view, txt, chunk
                )
                _sync(r)
            out["score_fn"] = score_fn
            out["score_fn_key"] = (
                n_norm, use_templates, cb, bool(save_renders),
                1 if mesh is None else mesh.size,
            )

            # ---- Best-render re-render warm-up (k=1 chunk of render()).
            if warm:
                renderer.render(
                    np.eye(4, dtype=np.float32)[None],
                    np.eye(4, dtype=np.float32)[None],
                    [0],
                    depths_gt=None if depth_gt is None else np.asarray(depth_gt)[None],
                    movable_masks=None if dummy_mask is None else dummy_mask[None],
                    T_WO_1=np.eye(4, dtype=np.float32), save=False,
                )
            print(f"# prefetch: scoring setup {'warmed' if warm else 'built'} "
                  f"in {time.time()-t0:.1f}s", flush=True)
            handle._box["out"] = out
        except Exception as e:  # best-effort: consumers fall back
            print(f"# prefetch failed (serial fallback): {type(e).__name__}: {e}",
                  flush=True)
            # Keep whatever completed (phys / clip+txt) but never hand out a
            # renderer or score program whose warm-up did not finish.
            for k in ("renderer", "score_fn", "score_fn_key"):
                out.pop(k, None)
            handle._box["out"] = out or None

    t = threading.Thread(target=_run, name="scoring-prefetch", daemon=True)
    handle._thread = t
    t.start()
    return handle
