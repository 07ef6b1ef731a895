"""Dream2Real-TPU demo entry point.

CLI parity with reference demo.py:9-57: same argv
(data_dir out_dir cfg_path user_instr [--goal_caption] [--norm_captions...]),
same cache-flag consistency asserts, same data_dir -> out_dir copy, same
result.txt output.
"""

import argparse
import os
import shutil

from dream2real_tpu.cfg import Config, validate_cache_flags
from dream2real_tpu.engine import ImaginationEngine

if __name__ == "__main__":
    # data_dir need only have depth/, images/, poses.txt (+ optional
    # seg_images/, masks/, transforms.json).
    parser = argparse.ArgumentParser()
    parser.add_argument("data_dir", type=str, help="Raw scan data directory (read-only).")
    parser.add_argument("out_dir", type=str, help="Output/intermediate artifact directory.")
    parser.add_argument("cfg_path", type=str, help="Config JSON (variants/ablations).")
    parser.add_argument("user_instr", type=str, help="User instruction")
    parser.add_argument("--goal_caption", type=str, default=None)
    parser.add_argument("--norm_captions", type=str, nargs="+", default=None)
    args = parser.parse_args()

    # out_dir, not data_dir: never write into the raw scan (demo.py:24-25).
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
    print("--- stage timings ---")
    print(imagination.stage_timer.report())

    with open("result.txt", "w") as f:
        f.write(f"user_instr: {args.user_instr}\n")
        f.write(f"goal_caption: {task_model.goal_caption}\n")
        f.write(f"norm_captions: {task_model.norm_captions}\n")
        f.write("goal_pose:\n")
        f.write(f"{movable_best_pose}\n")
