"""Experiment/ablation runner.

Parity target: reference experiments/run_exp.py:8-53 — identical argv and
flow to demo.py but without the interactive confirmation, used with the
per-scene ablation configs (configs/{shopping,pool,X,shelf}/*.json encoding
the paper baselines: physics_only, no_smooth, no_norm, pcd, distract,
vis_prior, dream2real_first).
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dream2real_tpu.cfg import Config, validate_cache_flags  # noqa: E402
from dream2real_tpu.engine import ImaginationEngine  # noqa: E402

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("data_dir", type=str)
    parser.add_argument("out_dir", type=str)
    parser.add_argument("cfg_path", type=str)
    parser.add_argument("user_instr", type=str)
    parser.add_argument("--goal_caption", type=str, default=None)
    parser.add_argument("--norm_captions", type=str, nargs="+", default=None)
    args = parser.parse_args()

    cfg = Config(args.cfg_path, args.out_dir)
    validate_cache_flags(cfg)

    if not os.path.isdir(args.data_dir):
        raise ValueError("data_dir does not exist.")
    os.makedirs(args.out_dir, exist_ok=True)
    if not os.path.isdir(os.path.join(args.out_dir, "images")):
        for name in os.listdir(args.data_dir):
            src = os.path.join(args.data_dir, name)
            dst = os.path.join(args.out_dir, name)
            if os.path.isdir(src):
                shutil.copytree(src, dst, dirs_exist_ok=True)
            else:
                shutil.copy2(src, dst)

    print(f"Running with config: {args.cfg_path}")
    imagination = ImaginationEngine(cfg)
    imagination.build_scene_model()
    task_model = imagination.interpret_user_instr(
        args.user_instr, goal_caption=args.goal_caption, norm_captions=args.norm_captions
    )
    movable_best_pose = imagination.dream_best_pose(task_model)
    print("Predicted pose for movable object:")
    print(movable_best_pose)
