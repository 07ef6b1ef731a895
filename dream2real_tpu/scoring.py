"""Grid pose optimisation: sample -> physics mask -> render -> CLIP -> argmax.

Parity target: clip_scoring.py:71-235 (`optimise_pose_grid`). Flow and
artifacts match the reference: cached-render replay from cb_render/ +
pose_scores.txt (89-104), physics-only random-valid baseline (119-125),
goal/norm logit ratio (196-203), score scatter into the full grid (205-209),
spatial smoothing (211-216), argmax + best_render.png (218-223).

TPU-first differences: the physics check is one batched launch, the renderer
is a compiled scan (no per-pose Python), CLIP runs fused batches, and nothing
round-trips through disk unless artifact saving is requested.
"""

from __future__ import annotations

import os
import jax.numpy as jnp
import numpy as np

from dream2real_tpu.sampling import get_virtual_cam_poses, sample_poses_grid
from dream2real_tpu.smoothing import spatially_smooth_heatmap

#: Observability: filled in by _fused_score with the sharding decision of the
#: most recent run ({"n_poses", "mesh_devices", "slab", "clip_batch"}), then
#: by optimise_pose_grid with the score vectors ("raw_scores" pre-smoothing,
#: "smoothed_scores", "best_idx") — lets tests compare sharded vs
#: single-device runs on the quantity that matters (per-pose scores) rather
#: than an argmax that legitimately flips on floating-point ties.
LAST_RUN_INFO: dict = {}


def _slab_spec(clip_batch: int, n_poses: int):
    """(mesh, slab, quantum) for a scoring run.

    Shared by _fused_score and the scoring prefetch (prefetch.py) so the
    prefetched program is built with the same mesh decision and dispatch
    shapes as the real run. Dispatches pad to `quantum` = n_dev * clip_batch
    (each device's sub-batch must fill whole CLIP batches); the default slab
    scales with the mesh so per-launch wall-clock stays constant (the
    tunneled TPU runtime kills launches over ~1-2 min).
    """
    from dream2real_tpu.parallel.mesh import score_mesh_for

    mesh = score_mesh_for(n_poses, clip_batch)
    n_dev = 1 if mesh is None else mesh.size
    q = n_dev * clip_batch
    slab = int(os.environ.get("D2R_SCORE_SLAB", "0")) // q * q
    if slab <= 0:
        slab = max(q, (256 * n_dev) // q * q)
    return mesh, slab, q


def _fused_score(
    renderer, clip_scorer, tokenizer, task_model, valid_poses, render_poses,
    depths_gt, movable_masks, T_WO_1, use_templates, save_renders=False,
    prefetch=None, tail_warm=None,
):
    """On-device render->composite->CLIP scoring (no per-render D2H).

    Dispatches in slabs (the TPU runtime kills launches over ~1-2 min) padded
    to the CLIP batch size; padding scores are discarded.

    save_renders=True streams each slab's u8 composites to
    renderer.out_render_path (cb_render/ artifact parity) from a writer
    thread: the D2H fetch + PNG encode of slab s overlaps slab s+1's device
    compute, so artifact saving no longer forces the slow unfused path.
    """
    import time

    from dream2real_tpu.clip.scorer import build_captions
    from dream2real_tpu.parallel.imagine import make_imagine_and_score

    perf = os.environ.get("D2R_PERF_LOG") == "1"
    _t = time.time()

    def _lap(tag):
        nonlocal _t
        if perf:
            print(f"# fused_score {tag}: {time.time() - _t:.2f}s", flush=True)
        _t = time.time()

    captions = build_captions(
        task_model.goal_caption, task_model.norm_captions, use_templates
    )
    n_norm = 0 if task_model.norm_captions is None else len(task_model.norm_captions)
    cb = min(32, clip_scorer.batch_size)
    save_dir = renderer.out_render_path if save_renders else None

    # Multi-chip: shard the pose batch over the data mesh (parallel/mesh.py).
    # This replaces the reference's single-device chunked CLIP loop
    # (clip_scoring.py:167-185) with one sharded program per slab — renders
    # and CLIP stay chip-local; only the (K,) score vector gathers over ICI.
    poses = np.asarray(valid_poses, np.float32).reshape(-1, 4, 4)
    k = len(poses)
    mesh, slab, quantum = _slab_spec(cb, k)
    n_dev = 1 if mesh is None else mesh.size
    LAST_RUN_INFO.clear()
    LAST_RUN_INFO.update(
        n_poses=k, mesh_devices=n_dev, slab=slab, clip_batch=cb
    )
    if mesh is not None:
        print(f"# fused_score: pose batch sharded over {n_dev} devices")

    # Reuse the prefetched text embeddings + warmed score program when they
    # were built for exactly this renderer/scorer/caption set (prefetch.py);
    # the first slab then pays only compute, not compile/deserialize.
    txt = score_fn = None
    if (
        prefetch is not None
        and prefetch.get("score_fn") is not None
        and prefetch.get("renderer") is renderer
        and prefetch.get("clip_scorer") is clip_scorer
        and prefetch.get("captions") == captions
        and prefetch.get("score_fn_key")
        == (n_norm, use_templates, cb, save_dir is not None, n_dev)
    ):
        txt = prefetch["txt"]
        score_fn = prefetch["score_fn"]
        _lap("text embeddings + score_fn (prefetched)")
    if txt is None:
        txt = clip_scorer.text_embeddings(np.asarray(tokenizer(captions)))
        if perf:
            float(jnp.sum(jnp.asarray(txt).astype(jnp.float32)))
        _lap("text embeddings")
    if score_fn is None:
        score_fn = make_imagine_and_score(
            renderer.fg_cfg, clip_scorer.cfg, renderer.settings, renderer.dirs_cam,
            n_norm_captions=n_norm, use_templates=use_templates, clip_batch=cb,
            obj_aabb=renderer.obj_aabb, fg_crop=renderer.fg_crop,
            crop_settings=renderer.crop_settings, intrinsics=renderer.intrinsics,
            row_chunk=renderer.row_chunk, return_renders=save_dir is not None,
            mesh=mesh,
        )
        _lap("score_fn build")
    bg = renderer.render_background(
        jnp.asarray(render_poses[0]),
        None if depths_gt is None else depths_gt[0],
        None if movable_masks is None else movable_masks[0],
    )
    if perf:  # sync via scalar reductions (big-array D2H is slow on axon)
        for x in bg:
            if hasattr(x, "shape"):
                float(jnp.sum(x.astype(jnp.float32)))
    _lap("bg render")
    T_WC = jnp.asarray(np.asarray(render_poses[0], np.float32))
    T_WO = jnp.asarray(np.asarray(T_WO_1, np.float32))
    out = np.empty(k, np.float32)

    writer = futures = None
    if save_dir is not None:
        import shutil
        from concurrent.futures import ThreadPoolExecutor

        if os.path.exists(save_dir):
            shutil.rmtree(save_dir)
        os.makedirs(save_dir)

        def _write(imgs_box, start, count):
            # Native C++ PNG encoder (releases the GIL in the writer thread);
            # PIL fallback when libd2r_native isn't built.
            from dream2real_tpu.native import png_write

            arr = np.asarray(imgs_box[0])[:count]
            # Free the HBM buffer before the (slow) encode. The buffer is
            # passed in a one-element list so clearing it here actually drops
            # the last reference (a plain arg would stay pinned in the
            # executor's args tuple for the whole encode).
            imgs_box.clear()
            for j in range(count):
                path = os.path.join(save_dir, f"cb_rgb_{start + j:04d}.png")
                if not png_write(path, arr[j]):
                    from PIL import Image

                    Image.fromarray(arr[j]).save(path)

        # D2R_WRITER_THREADS > 1 overlaps one thread's D2H fetch with
        # another's PNG encode (the native encoder releases the GIL). On the
        # tunneled axon runtime save throughput is D2H-bound (~3 MB/s, see
        # PERF.md) so extra threads change little; on a real TPU host D2H is
        # PCIe-fast and encode becomes the bottleneck, where this scales.
        writer = ThreadPoolExecutor(
            max_workers=max(1, int(os.environ.get("D2R_WRITER_THREADS", "1")))
        )
        futures = []

    # Dispatch ALL slabs before fetching anything: on the tunneled runtime a
    # render D2H serializes with compute, so interleaved fetch-per-slab was
    # paying (compute + D2H) serially. Score fetches are tiny; the u8 render
    # slabs drain through the writer thread AFTER their compute has been
    # enqueued, with a pending-bytes cap so a reference-scale run (70k poses
    # = ~23 GB of renders) never accumulates them all in HBM.
    pending: list = []  # (start, n, scores_dev, imgs_dev | None)
    pending_img_bytes = 0
    peak_pending = 0
    img_bytes = slab * renderer.res * renderer.res * 3
    MAX_PENDING = int(os.environ.get("D2R_RENDER_PENDING_MB", "1536")) * 2**20
    t_dispatch0 = time.time()

    def _drain(entry):
        nonlocal pending_img_bytes, peak_pending
        start, n, scores_dev, imgs_dev = entry
        if imgs_dev is not None:
            futures.append(writer.submit(_write, [imgs_dev], start, n))
            del imgs_dev
            pending_img_bytes -= img_bytes
            # The device buffer stays alive until the writer THREAD has
            # fetched it, so the cap must bound the writer backlog too:
            # compute outruns PNG encoding, and with the backlog uncounted a
            # 70k save_renders run re-accumulated every slab's render in HBM
            # and OOMed the chip (r4_tpu_session.log 08:18). Retire finished
            # futures, then block on the oldest once the backlog alone
            # exceeds the cap (throughput then = encode throughput, which is
            # the physical limit anyway).
            while futures and futures[0].done():
                futures.pop(0).result()
            peak_pending = max(
                peak_pending, pending_img_bytes + len(futures) * img_bytes
            )
            while len(futures) * img_bytes > MAX_PENDING:
                futures.pop(0).result()
        out[start : start + n] = np.asarray(scores_dev)[:n]

    # One H2D for the whole pose batch, sliced per slab DEVICE-side: the
    # former per-slab jnp.asarray(chunk) paid one tunnel-latency H2D per
    # dispatch (~32 ms x 274 slabs at reference scale). Padding the tail to
    # `quantum` up front keeps every dispatch shape identical to before
    # (slab is a quantum multiple, _slab_spec).
    pad_total = (-k) % quantum
    if pad_total:
        poses = np.concatenate(
            [poses, np.tile(np.eye(4, dtype=np.float32)[None], (pad_total, 1, 1))]
        )
    poses_dev = jnp.asarray(poses)
    for s in range(0, k, slab):
        n = min(slab, k - s)
        result = score_fn(
            renderer.fg_params, clip_scorer.params, T_WO, T_WC, bg,
            txt, poses_dev[s : s + min(slab, len(poses) - s)],
        )
        if save_dir is not None:
            scores, imgs = result
            pending.append((s, n, scores, imgs))
            pending_img_bytes += img_bytes
            peak_pending = max(peak_pending, pending_img_bytes)
        else:
            pending.append((s, n, result, None))
        while pending_img_bytes > MAX_PENDING:
            _drain(pending.pop(0))
        if s == 0:
            _lap("first slab (dispatch)")
            if tail_warm is not None:
                # Compile the tail programs (best-render re-render, smoothing)
                # on the otherwise-idle host while the device chews through
                # the remaining slabs. XLA compilation is host-side work; at
                # reference scale the un-warmed tail compiles cost ~1/4 of
                # the whole run (see PERF.md round 5).
                import threading

                threading.Thread(target=tail_warm, daemon=True).start()
    t_drain0 = time.time()
    if save_dir is None and len(pending) > 1 and os.environ.get(
        "D2R_SCORE_FETCH_CONCAT", "1"
    ) == "1":
        # One device-side concat + ONE D2H instead of a latency-bound fetch
        # per slab (the tunneled runtime pays a host-sync floor per transfer;
        # at 70k poses that is ~274 round-trips for ~1 KB each). Each entry's
        # valid prefix is sliced device-side so pad-carrying slabs (the final
        # one, or every one when slab % quantum != 0) stay aligned.
        out[:] = np.asarray(
            jnp.concatenate([e[2][: e[1]] for e in pending])
        )
        pending.clear()
    while pending:
        _drain(pending.pop(0))
    _lap("all slabs (compute + score/render D2H)")
    LAST_RUN_INFO["peak_pending_mb"] = round(peak_pending / 2**20, 1)
    LAST_RUN_INFO["dispatch_s"] = round(t_drain0 - t_dispatch0, 2)
    LAST_RUN_INFO["drain_s"] = round(time.time() - t_drain0, 2)
    LAST_RUN_INFO["n_slabs"] = -(-k // slab)
    if writer is not None:
        for f in futures:
            f.result()  # surface writer-thread exceptions
        writer.shutdown()
    return out


def optimise_pose_grid(
    renderer,
    depths_gt,
    render_cam_pose_idx,
    task_model,
    data_dir: str,
    sample_res=None,
    phys_check=None,
    use_templates: bool = False,
    scene_type: int = 0,
    use_vis_pcds: bool = False,
    use_cache_renders: bool = False,
    smoothing: bool = True,
    physics_only: bool = False,
    clip_scorer=None,
    tokenizer=None,
    bounds_override=None,
    seed: int = 0,
    save_renders: bool = True,
    prefetch=None,
):
    """Returns (best_pose (4,4) np, pose_batch (N,16) np, pose_scores (N,) np).

    save_renders=False enables the FUSED path: render->composite->CLIP scoring
    stays on-device in one compiled program per pose slab (no per-render D2H,
    no cb_render artifacts — the best render is re-rendered afterwards for
    best_render.png). Requires a single render view, like every reference
    demo config (render_cam_pose_idx=[0]; with multiple views the reference's
    own score scatter at clip_scoring.py:205-206 would shape-mismatch).
    """
    import time

    perf = os.environ.get("D2R_PERF_LOG") == "1"
    stage_s: dict = {}
    _t = time.time()

    def _lap(tag):
        nonlocal _t
        stage_s[tag] = round(time.time() - _t, 2)
        if perf:
            print(f"# optimise_pose_grid {tag}: {stage_s[tag]:.2f}s", flush=True)
        _t = time.time()

    if sample_res is None:
        sample_res = [40, 40, 1, 1, 1, 1]
    scene_model = task_model.scene_model
    pose_batch = np.asarray(
        sample_poses_grid(
            scene_model.scene_centre, sample_res, scene_type=scene_type,
            bounds_override=bounds_override,
        )
    )
    n = pose_batch.shape[0]
    _lap("sample_grid")

    if use_cache_renders:
        print("Using cached renders")
        old_scores = np.loadtxt(os.path.join(data_dir, "pose_scores.txt"))
        valid_idxs = np.nonzero(old_scores)[0]
        valid_poses = pose_batch[valid_idxs]
        render_dir = os.path.join(data_dir, "cb_render")
        from PIL import Image

        renders = np.stack(
            [
                np.asarray(Image.open(os.path.join(render_dir, f)).convert("RGB"))
                for f in sorted(os.listdir(render_dir))
            ]
        )
        assert len(renders) == len(valid_poses), (
            f"Expected {len(valid_poses)} renders, got {len(renders)}. "
            "Try running without use_cache_renders."
        )
    else:
        print("Running pre-render checks...")
        if (
            prefetch is not None
            and phys_check is not None
            and prefetch.get("is_valid") is not None
            and np.array_equal(prefetch.get("pose_batch"), pose_batch)
        ):
            is_valid = prefetch["is_valid"]  # computed during training
        elif phys_check is not None:
            is_valid = np.asarray(phys_check(jnp.asarray(pose_batch)))
        else:
            is_valid = np.ones(n, bool)
        valid_idxs = np.nonzero(is_valid)[0]
        valid_poses = pose_batch[valid_idxs]
        _lap("phys_check")
        print(
            f"Of {n} sampled poses, {len(valid_idxs)} passed pre-render checks "
            f"({100 * len(valid_idxs) / n:.2f}%)."
        )
        if len(valid_idxs) == 0:
            raise Exception("No poses passed pre-render checks. Exiting.")

        if physics_only:
            print("Physics only method")
            ridx = np.random.default_rng(seed).integers(len(valid_idxs))
            best = valid_poses[ridx].reshape(4, 4)
            return best, pose_batch, np.ones(n, np.float32)

        render_poses = get_virtual_cam_poses(
            scene_model.opt_cam_poses, render_cam_pose_idx
        )
        movable_masks = np.asarray(task_model.movable_masks)[list(render_cam_pose_idx)]
        T_WO_1 = np.asarray(task_model.movable_obj.pose)

        # fg_crop clipping guard: if any candidate's projected extent exceeds
        # the crop window, grow the window (static shape -> recompile) rather
        # than silently losing fg pixels. The reference renders full frames
        # unconditionally (combined_rendering.py:121-130).
        if not use_vis_pcds and getattr(renderer, "fg_crop", 0):
            need = renderer.crop_required(T_WO_1, render_poses, valid_poses)
            if need > renderer.fg_crop:
                print(
                    f"# fg_crop guard: projected extent needs {need}px, window "
                    f"is {renderer.fg_crop}px — growing (recompile)"
                )
                renderer.bump_crop(need)
                if prefetch is not None:
                    # The prefetched score program baked the old crop size.
                    prefetch = dict(prefetch)
                    prefetch.pop("score_fn", None)
                    prefetch.pop("score_fn_key", None)

        # Fused path for every single-view NeRF run (all reference demo
        # configs); save_renders streams cb_render/ from a writer thread
        # instead of dropping to the slow D2H path. Requires a real
        # ClipScorer (fused program embeds the image tower).
        fused = (
            not use_vis_pcds
            and len(render_cam_pose_idx) == 1
            and hasattr(renderer, "render_background")
            and hasattr(clip_scorer, "params")
        )
        if fused:
            print(f"Fused imagine-and-score over {len(valid_poses)} poses...")

            def _tail_warm():
                # Warm (trace + compile + one tiny execute) the two programs
                # the post-scoring tail needs — the best-render re-render and
                # the smoothing conv — so they are cache hits when the slab
                # loop finishes. Runs on a background thread overlapped with
                # the slab compute; failures are non-fatal (the tail would
                # just compile inline as before).
                try:
                    if smoothing:
                        np.asarray(spatially_smooth_heatmap(
                            jnp.zeros(n, jnp.float32), sample_res))
                    renderer.render(
                        valid_poses[:1], render_poses, render_cam_pose_idx,
                        depths_gt=depths_gt, movable_masks=movable_masks,
                        T_WO_1=T_WO_1, save=False,
                    )
                except Exception as e:  # pragma: no cover - best-effort warm
                    print(f"# tail_warm failed (non-fatal): {e!r}", flush=True)

            tail_warm = (
                _tail_warm
                if os.environ.get("D2R_TAIL_WARM", "1") == "1"
                else None
            )
            scores_valid = _fused_score(
                renderer, clip_scorer, tokenizer, task_model, valid_poses,
                render_poses, depths_gt, movable_masks, T_WO_1, use_templates,
                save_renders=save_renders, prefetch=prefetch,
                tail_warm=tail_warm,
            )
            renders = None
            _lap("fused_score")
        elif use_vis_pcds:
            # Point-cloud ablation renderer signature (clip_scoring.py:131).
            print(f"Rendering {len(valid_poses)} imagined scenes (pcd)...")
            renders = np.stack(
                renderer.render(
                    render_poses[0], valid_poses, task_model,
                    hide_movable=False,
                )
            )
        else:
            print(f"Rendering {len(valid_poses)} imagined scenes...")
            renders = renderer.render(
                valid_poses,
                render_poses,
                render_cam_pose_idx,
                depths_gt=depths_gt,
                movable_masks=movable_masks,
                T_WO_1=T_WO_1,
                save=save_renders,
            )

    task_model.free_visual_models()  # lifecycle parity (clip_scoring.py:143)

    if renders is not None:
        print("Evaluating rendered images using CLIP...")
        scores_valid = clip_scorer.score(
            renders,
            task_model.goal_caption,
            task_model.norm_captions,
            tokenizer,
            use_templates=use_templates,
        )

    pose_scores = np.zeros(n, np.float32)
    pose_scores[valid_idxs] = scores_valid
    render_idxs = np.zeros(n, np.int64)
    render_idxs[valid_idxs] = np.arange(len(valid_idxs))
    LAST_RUN_INFO["raw_scores"] = pose_scores.copy()

    if smoothing:
        print("Applying spatial smoothing...")
        pose_scores = np.asarray(
            spatially_smooth_heatmap(jnp.asarray(pose_scores), sample_res)
        )
        _lap("smoothing")
    LAST_RUN_INFO["smoothed_scores"] = pose_scores.copy()

    best_pose_idx = int(np.argmax(pose_scores))
    LAST_RUN_INFO["best_idx"] = best_pose_idx
    best_pose = valid_poses[render_idxs[best_pose_idx]]
    if renders is not None:
        best_render = renders[render_idxs[best_pose_idx]]
    else:
        # Fused path: materialize just the winning render for the artifact.
        best_render = renderer.render(
            best_pose[None],
            get_virtual_cam_poses(scene_model.opt_cam_poses, render_cam_pose_idx),
            render_cam_pose_idx,
            depths_gt=depths_gt,
            movable_masks=np.asarray(task_model.movable_masks)[
                list(render_cam_pose_idx)
            ],
            T_WO_1=np.asarray(task_model.movable_obj.pose),
            save=False,
        )[0]
    _lap("best_render")

    from PIL import Image

    Image.fromarray(np.asarray(best_render)).save(
        os.path.join(data_dir, "best_render.png")
    )
    _lap("artifacts")
    LAST_RUN_INFO["stage_s"] = stage_s
    return best_pose.reshape(4, 4), pose_batch, pose_scores
