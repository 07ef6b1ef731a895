"""On-device physics: TSDF fusion + batched pose-validity checks.

Replaces the reference's Open3D VoxelBlockGrid fusion + PyBullet sequential
CPU validity loop (vision_3d/physics_utils.py, hot loop #3 in SURVEY.md §3.1)
with JAX programs: dense TSDF fusion scanned over frames, and
collision/support/stability tests vmapped over the entire candidate pose
batch in one launch.
"""

from dream2real_tpu.physics.tsdf import TSDFGrid, fuse_tsdf  # noqa: F401
from dream2real_tpu.physics.collision import make_unsupcol_check  # noqa: F401
