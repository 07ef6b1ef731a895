"""Real-TPU drive of the save_renders writer-backlog fix (scoring.py).

Small shapes, but D2R_RENDER_PENDING_MB=1 forces the backlog-cap path on
every slab (each slab's render exceeds the cap), so the drive exercises:
dispatch-ahead -> pending drain -> writer submit -> backlog block -> PNG
writes — on the real device where buffer lifetime actually pins HBM. Checks
all PNGs land, scores are finite/nonzero-varied, and LAST_RUN_INFO reports
a bounded peak.

Run: D2R_RENDER_PENDING_MB=1 python experiments/verify_save_drive.py /tmp/dir
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/d2r_verify_save"
    print(f"# devices: {jax.devices()}", flush=True)

    from dream2real_tpu import scoring
    from dream2real_tpu.clip.model import CLIPConfig, init_clip_params
    from dream2real_tpu.clip.scorer import ClipScorer
    from dream2real_tpu.nerf.combined import CombinedRenderer
    from dream2real_tpu.nerf.model import NGPConfig, init_ngp_params
    from dream2real_tpu.nerf.render import RenderSettings
    from dream2real_tpu.scoring import _fused_score

    class _FakeTaskModel:
        goal_caption = "a red box on the green box"
        norm_captions = ["a red box and a green box"]

    def _tok(texts, vocab=128, ctx=16):
        import hashlib

        ids = np.zeros((len(texts), ctx), np.int32)
        for r, t in enumerate(texts):
            toks = [1]
            for wd in t.split():
                toks.append(2 + int(hashlib.md5(wd.encode()).hexdigest(), 16) % 124)
            toks = toks[: ctx - 1] + [127]
            ids[r, : len(toks)] = toks
        return ids

    res = 112
    f = 0.9 * res
    K = np.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1.0]])
    ncfg = NGPConfig(
        field_type="mlp", mlp_width=64, mlp_depth=4, skip_layer=2,
        posenc_deg=5, geo_feat_dim=15,
        aabb_min=(0.0, -0.6, -0.1), aabb_max=(1.1, 0.6, 0.9),
    )
    params = init_ngp_params(jax.random.PRNGKey(0), ncfg)
    settings = RenderSettings(n_coarse=16, n_fine=16, near=0.05, far=2.0)
    obj_aabb = ((0.35, -0.1, 0.0), (0.65, 0.1, 0.15))
    T_WO_1 = np.eye(4, dtype=np.float32)
    T_WO_1[:3, 3] = [0.5, 0.0, 0.05]
    renderer = CombinedRenderer(
        params, ncfg, params, ncfg, settings=settings, res=res,
        intrinsics=K, row_chunk=28, obj_aabb=obj_aabb, fg_crop=48,
        out_render_path=out_dir,
    )
    cam = np.array(
        [[1, 0, 0, 0.5], [0, -1, 0, 0.0], [0, 0, -1, 0.7], [0, 0, 0, 1]],
        np.float32,
    )
    ccfg = CLIPConfig(
        eot_id=127, image_size=res, patch_size=14, vision_width=256,
        vision_layers=4, vision_heads=4, vocab_size=128, context_length=16,
        text_width=128, text_layers=2, text_heads=2, projection_dim=96,
    )
    scorer = ClipScorer(init_clip_params(jax.random.PRNGKey(7), ccfg), ccfg,
                        batch_size=8)
    n = 96
    poses = np.tile(T_WO_1[None], (n, 1, 1)).astype(np.float32)
    poses[:, 0, 3] += np.linspace(-0.08, 0.12, n)
    poses[:, 2, 3] += np.linspace(0.0, 0.04, n)

    scores = _fused_score(
        renderer, scorer, _tok, _FakeTaskModel(), poses, cam[None], None,
        None, T_WO_1, use_templates=False, save_renders=True,
    )
    files = sorted(os.listdir(out_dir))
    info = scoring.LAST_RUN_INFO
    print(f"# scores: n={len(scores)} std={np.std(scores):.5f} "
          f"finite={np.all(np.isfinite(scores))}", flush=True)
    print(f"# pngs written: {len(files)}; peak_pending_mb="
          f"{info.get('peak_pending_mb')}", flush=True)
    assert len(files) == n, (len(files), n)
    assert np.all(np.isfinite(scores)) and np.std(scores) > 0
    # Run with D2R_SCORE_SLAB=8 + D2R_RENDER_PENDING_MB=1: 12 slabs of
    # ~0.3 MB against a 1 MB cap. The unfixed code let every slab pile up
    # (3.4 MB here, ~23 GB at reference scale); the fixed design bounds
    # total in-flight renders by 2x the cap (undrained-pending cap +
    # writer-backlog cap) plus one dispatch slab of slack.
    cap_mb = float(os.environ.get("D2R_RENDER_PENDING_MB", "1536"))
    slab_mb = info["slab"] * res * res * 3 / 2**20
    assert info.get("peak_pending_mb", 1e9) <= 2 * cap_mb + slab_mb, info
    print("SAVE-DRIVE PASS", flush=True)


if __name__ == "__main__":
    main()
