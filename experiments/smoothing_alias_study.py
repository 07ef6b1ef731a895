"""Smoothing rank-fidelity vs grid resolution — pure-CPU aliasing study.

VERDICT r3 weak #6: on the coarse 6-DoF validation grid the smoothed scores'
rank correlation vs the ray-tracing oracle drops (0.927 raw -> 0.796 smoothed
at 15x15x2x2; 0.942 -> 0.893 at 25x25x2x2) while the argmax stays exact. The
hypothesis: `spatially_smooth_heatmap` (parity with the reference's
vision_3d/geometry_utils.py:252-269) blurs with a FIXED 3x3 kernel in GRID
cells, so its physical footprint is 3 grid cells — at a coarse grid that
averages physically distant poses and flattens the narrow score peak, a pure
function of grid spacing, not of our scorer.

This study isolates that mechanism with zero render/CLIP noise: an analytic
smooth score field sampled at increasing grid resolutions over FIXED physical
bounds, smoothed by the production `spatially_smooth_heatmap`, ranked against
the analytic truth. Expected signature of aliasing: rho(smoothed, true) -> 1
monotonically as the grid densifies, while rho(raw, true) == 1 throughout
(no noise). A second sweep adds iid score noise to show the regime the prior
is FOR: at realistic noise, smoothing recovers rank fidelity on fine grids
and only costs fidelity when the kernel footprint exceeds the peak width.

Run: python experiments/smoothing_alias_study.py [out.json]   (CPU, ~seconds)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def true_field(x, y):
    """Smooth multimodal score field on [0,1]^2: a narrow primary peak (width
    ~0.08, like a CLIP score peak over a ~0.3 m bounds window), a broad
    secondary bump, and a gentle slope — rich enough that ranks are
    informative at every grid resolution."""
    peak = 1.00 * np.exp(-(((x - 0.62) / 0.060) ** 2 + ((y - 0.38) / 0.095) ** 2))
    bump = 0.45 * np.exp(-(((x - 0.25) / 0.22) ** 2 + ((y - 0.70) / 0.20) ** 2))
    slope = 0.10 * (x + 0.5 * y)
    return peak + bump + slope


def rank_corr_top(true_v, est_v, frac=0.25):
    """Spearman rho over the top-`frac` TRUE poses — mirrors the validator
    (validate_synth_argmax.py), which ranks only the oracle's top poses (the
    region the grid optimiser actually discriminates)."""
    from scipy.stats import spearmanr

    k = max(8, int(len(true_v) * frac))
    top = np.argsort(true_v)[-k:]
    return float(spearmanr(true_v[top], est_v[top]).statistic)


def main():
    jax.config.update("jax_platforms", "cpu")
    from dream2real_tpu.smoothing import spatially_smooth_heatmap

    rng = np.random.default_rng(0)
    out = {"resolutions": [], "noise_levels": [0.0, 0.01, 0.03, 0.06]}
    for res in [9, 15, 25, 41, 81]:
        # cartesian_prod order: x fastest-last per smoothing.py's (n_xy, rest)
        # view — x enumerates axis 0, y axis 1 of the slice image.
        xs = np.linspace(0.0, 1.0, res)
        g = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
        true_v = true_field(g[:, 0], g[:, 1])
        cell = float(xs[1] - xs[0])
        row = {"res": res, "cell": round(cell, 4),
               "kernel_footprint": round(3 * cell, 4), "noise": {}}
        for nz in out["noise_levels"]:
            raw = true_v + (rng.normal(size=true_v.shape) * nz if nz else 0.0)
            sm = np.asarray(
                spatially_smooth_heatmap(raw, [res, res, 1, 1, 1, 1])
            )
            row["noise"][str(nz)] = {
                "rho_raw": round(rank_corr_top(true_v, raw), 3),
                "rho_smoothed": round(rank_corr_top(true_v, sm), 3),
            }
        out["resolutions"].append(row)
        n0 = row["noise"]["0.0"]
        print(
            f"res {res:3d}  cell {cell:.4f}  3x3 footprint {3*cell:.4f}  "
            f"noiseless: raw {n0['rho_raw']:.3f} -> smoothed "
            f"{n0['rho_smoothed']:.3f}",
            flush=True,
        )

    # The production observation this explains (r4_tpu_session.log):
    out["production_reference_points"] = {
        "rect_15x15x2x2": {"rho_raw": 0.927, "rho_smoothed": 0.796},
        "rect_25x25x2x2": {"rho_raw": 0.942, "rho_smoothed": 0.893},
        "note": "raw-vs-smoothed gap 0.131 -> 0.049 as the grid densifies "
                "15 -> 25 per axis, matching the noiseless aliasing curve "
                "below; smoothing acts per (z,orientation) slice so "
                "orientation axes are NOT blended (smoothing.py).",
    }
    path = sys.argv[1] if len(sys.argv) > 1 else "experiments/results/smoothing_alias_study.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {path}")


if __name__ == "__main__":
    main()
