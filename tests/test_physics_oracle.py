"""Physics valid-set vs ground-truth analytic oracle (VERDICT r4 weak #4).

Pins the agreement contract banked by experiments/physics_oracle.py: outside
the structural band (SDF truncation + the unobservable bottom-face
reconstruction gap) of every decision boundary, and excluding below-table
poses (the reference's own intentional acceptance, physics_utils.py:334-336),
the SDF validity masks must agree EXACTLY with an independent SAT-based
implementation on the scene's true geometry.
"""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "experiments")
)


@pytest.mark.slow
def test_sdf_masks_match_analytic_oracle():
    from physics_oracle import run

    out = run([8, 8, 5, 1, 1, 2], voxel=0.004, n_views=8)
    band = out["bands"]["above_table_beyond_structural"]
    assert band["agreement"] == 1.0, out
    assert band["n"] >= 100, out
    assert out["disagree_margin_max_above_table"] <= out["structural_band"], out
    # The run must exercise both decisions (some valid, some invalid poses).
    assert 0.0 < out["sdf_valid_frac"] < 1.0, out


def test_oracle_sat_margins():
    """Unit sanity of the SAT margin math used as the independent oracle."""
    import numpy as np

    from dream2real_tpu.physics.oracle import obb_aabb_margin

    c = np.array([[2.0, 0, 0], [1.0, 0, 0], [0.5, 0, 0], [0.0, 0, 0]])
    R = np.broadcast_to(np.eye(3), (4, 3, 3))
    m = obb_aabb_margin(c, R, (0.5, 0.5, 0.5), (-0.5,) * 3, (0.5,) * 3)
    np.testing.assert_allclose(m, [-1.0, 0.0, 0.5, 1.0], atol=1e-12)

    # 45-deg yaw: corner-to-face distance, not face-to-face.
    th = np.pi / 4
    Rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    c = np.array([[0.5 + np.sqrt(0.5) + 0.1, 0, 0],
                  [0.5 + np.sqrt(0.5) - 0.1, 0, 0]])
    m = obb_aabb_margin(c, np.broadcast_to(Rz, (2, 3, 3)), (0.5, 0.5, 0.5),
                        (-0.5,) * 3, (0.5,) * 3)
    assert m[0] == pytest.approx(-0.1, abs=1e-9)
    assert m[1] > 0
