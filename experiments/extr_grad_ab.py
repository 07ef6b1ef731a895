"""A/B the fused training kernel's APPROXIMATE extrinsics gradients (real TPU).

The fused pallas training step (nerf/train_kernel.py) backpropagates to ray
origins/dirs through the sample-position path only, dropping the |d| delta
scale, SH color-basis and ray-aabb-ts paths (module docstring "Gradient
contract"). Pose refinement therefore sees the dominant term, not the exact
autodiff gradient the XLA path (D2R_PALLAS_TRAIN=0) computes. This experiment
quantifies what that approximation costs where it matters — the recovered
camera poses — instead of leaving "converges in practice" (trainer.py:152-165)
as an untested claim.

Protocol: synthetic scene, odd-indexed cameras perturbed by a fixed random
rotation + translation; even cameras stay exact as gauge anchors. Train the
full-scene config (optimize_extrinsics=True, production TrainConfig defaults)
once per (gradient mode x init-error level), same seed, and report per-run
final loss, mean/max rotation error (deg) and translation error (mm) over the
perturbed cameras, plus step rate.

Init-error levels (round-4, VERDICT weak #4: the 1-deg point is the easy
operating regime; joint refinement matters most when init poses are bad):
1 deg / 10 mm, 5 deg / 30 mm, 10 deg / 60 mm.

Usage: python experiments/extr_grad_ab.py [n_steps] [out.json] [deg:mm ...]
Knobs: D2R_BENCH_RES / D2R_BENCH_VIEWS / D2R_BENCH_BATCH (shrink for smoke).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dream2real_tpu.utils.health import wait_tpu_healthy


def _rot_err_deg(Ra, Rb):
    cos = (np.trace(Ra.T @ Rb) - 1) / 2
    return float(np.degrees(np.arccos(np.clip(cos, -1, 1))))


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    levels = [
        tuple(float(v) for v in a.split(":")) for a in sys.argv[3:]
    ] or [(1.0, 10.0), (5.0, 30.0), (10.0, 60.0)]
    wait_tpu_healthy(900.0)

    import jax
    import jax.numpy as jnp

    from dream2real_tpu.data import synth
    from dream2real_tpu.nerf.model import NGPConfig
    from dream2real_tpu.nerf.trainer import (
        TrainConfig, init_train_state, make_train_chunk, optimized_poses,
        train_with_governor,
    )
    from dream2real_tpu.ops import cameras

    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)

    res = int(os.environ.get("D2R_BENCH_RES", "336"))
    n_views = int(os.environ.get("D2R_BENCH_VIEWS", "16"))
    scene = synth.default_scene()
    f = 0.9 * res
    K = np.array([[f, 0, res / 2], [0, f, res / 2], [0, 0, 1.0]])
    cams = synth.orbit_poses(scene.centre, n_views, radius=0.5, height=0.4)
    rgbs, depths = [], []
    for i in range(len(cams)):
        rgb, depth, _ = synth.render_scene(scene, cams[i], K, res, res)
        rgbs.append(rgb)
        depths.append(depth)
    rgba = jnp.asarray(np.concatenate(
        [np.stack(rgbs), np.full((len(cams), res, res, 1), 255, np.uint8)], -1))
    dirs_cam = cameras.pixel_dirs(res, res, jnp.asarray(K))

    from dream2real_tpu.nerf.render import RenderSettings

    ngp_cfg = NGPConfig(aabb_min=(0.0, -0.6, -0.1), aabb_max=(1.1, 0.6, 0.9))
    settings = RenderSettings(n_coarse=32, n_fine=32, near=0.05, far=2.0)
    tc = TrainConfig(
        n_steps=n_steps,
        batch_rays=int(os.environ.get("D2R_BENCH_BATCH", "4096")),
        optimize_extrinsics=True, poll_steps=200,
        dynamic_time_extension=False, seed=3,
    )
    true_poses = cams.astype(np.float32)
    perturbed = list(range(1, n_views, 2))

    def perturb(rot_deg: float, trans_mm: float) -> np.ndarray:
        """Fixed perturbation of the odd cameras (even ones anchor the
        gauge): `rot_deg` about a random axis + `trans_mm` offset."""
        rng = np.random.default_rng(7)
        poses = true_poses.copy()
        for i in perturbed:
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            ang = np.radians(rot_deg)
            kx, ky, kz = axis
            Kx = np.array([[0, -kz, ky], [kz, 0, -kx], [-ky, kx, 0]], np.float32)
            R = np.eye(3, dtype=np.float32) + np.sin(ang) * Kx + (1 - np.cos(ang)) * Kx @ Kx
            poses[i, :3, :3] = poses[i, :3, :3] @ R
            t = rng.normal(size=3)
            poses[i, :3, 3] += (trans_mm / 1e3 * t / np.linalg.norm(t)).astype(np.float32)
        return poses

    results = {"n_steps": n_steps, "levels": {}}
    for rot_deg, trans_mm in levels:
        poses = perturb(rot_deg, trans_mm)
        init_rot = [_rot_err_deg(poses[i, :3, :3], true_poses[i, :3, :3]) for i in perturbed]
        init_tr = [1e3 * np.linalg.norm(poses[i, :3, 3] - true_poses[i, :3, 3]) for i in perturbed]
        key = f"{rot_deg:g}deg_{trans_mm:g}mm"
        lvl = {"init": {"rot_deg": float(np.mean(init_rot)),
                        "trans_mm": float(np.mean(init_tr)),
                        "rot_deg_max": float(np.max(init_rot)),
                        "trans_mm_max": float(np.max(init_tr))}}
        print(f"## level {key}: init rot {np.mean(init_rot):.3f} deg, "
              f"trans {np.mean(init_tr):.1f} mm", flush=True)
        for name, flag in [("xla_exact", "0"), ("fused_approx", "1")]:
            os.environ["D2R_PALLAS_TRAIN"] = flag
            state = init_train_state(ngp_cfg, tc, n_images=n_views)
            chunk = make_train_chunk(
                ngp_cfg, tc, settings, rgba, jnp.asarray(poses), dirs_cam,
                depths=jnp.asarray(np.stack(depths)))
            t0 = time.time()
            state, losses = train_with_governor(chunk, state, tc)
            dt = time.time() - t0
            opt = np.asarray(optimized_poses(state["params"], jnp.asarray(poses)))
            rot = [_rot_err_deg(opt[i, :3, :3], true_poses[i, :3, :3]) for i in perturbed]
            tr = [1e3 * np.linalg.norm(opt[i, :3, 3] - true_poses[i, :3, 3]) for i in perturbed]
            anc = [_rot_err_deg(opt[i, :3, :3], true_poses[i, :3, :3])
                   for i in range(0, n_views, 2)]
            lvl[name] = {
                "final_loss": float(losses[-1]),
                "rot_deg": float(np.mean(rot)), "rot_deg_max": float(np.max(rot)),
                "trans_mm": float(np.mean(tr)), "trans_mm_max": float(np.max(tr)),
                "anchor_rot_deg": float(np.mean(anc)),
                "steps_per_s": len(losses) * tc.poll_steps / dt,
            }
            print(f"{name:13s}: loss {losses[-1]:.5f}  "
                  f"rot {np.mean(rot):.3f} deg (max {np.max(rot):.3f})  "
                  f"trans {np.mean(tr):.1f} mm (max {np.max(tr):.1f})  "
                  f"anchors {np.mean(anc):.3f} deg  "
                  f"{lvl[name]['steps_per_s']:.0f} steps/s", flush=True)
        xe, fa = lvl["xla_exact"], lvl["fused_approx"]
        print(f"approx-vs-exact @ {key}: rot +{fa['rot_deg'] - xe['rot_deg']:.3f} deg, "
              f"trans +{fa['trans_mm'] - xe['trans_mm']:.2f} mm, "
              f"speed {fa['steps_per_s'] / max(xe['steps_per_s'], 1e-9):.2f}x", flush=True)
        results["levels"][key] = lvl
    if out_path:
        json.dump(results, open(out_path, "w"), indent=1)
        print(f"# wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
