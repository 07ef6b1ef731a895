"""SE(3) / SO(3) utilities in JAX.

Replaces the reference's pytorch3d usage (the only two pytorch3d calls are
``euler_angles_to_matrix`` at vision_3d/obj_pose_opt.py:51 and
``matrix_to_quaternion`` at vision_3d/physics_utils.py:255) plus the
OpenCV("accio") <-> NGP pose-convention flip (utils/accio2ngp.py:133-139) and
the virtual-camera pose trick (reconstruction/combined_rendering.py:250-263).

All functions are pure, jittable, and batched over leading axes where noted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Pose-chain math must be exact: TPU matmuls default to bf16 inputs, which is
# fine for NeRF/CLIP compute but corrupts camera/object transforms (millimetre
# errors at metre scale). All 4x4 composition in this module uses f32 MXU
# passes.
_HI = jax.lax.Precision.HIGHEST


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, precision=_HI)


def _axis_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix about a named axis. angle: (...,) -> (..., 3, 3)."""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    o = jnp.ones_like(angle)
    z = jnp.zeros_like(angle)
    if axis == "X":
        rows = [o, z, z, z, c, -s, z, s, c]
    elif axis == "Y":
        rows = [c, z, s, z, o, z, -s, z, c]
    elif axis == "Z":
        rows = [c, -s, z, s, c, z, z, z, o]
    else:
        raise ValueError(axis)
    return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """Euler angles -> rotation matrices, matching pytorch3d semantics.

    For convention "XYZ": R = Rx(a) @ Ry(b) @ Rz(c) with euler[..., 0]=a etc.
    euler: (..., 3) -> (..., 3, 3).
    """
    if len(convention) != 3:
        raise ValueError(convention)
    mats = [_axis_rotation(axis, euler[..., i]) for i, axis in enumerate(convention)]
    return _mm(_mm(mats[0], mats[1]), mats[2])


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (w, x, y, z), matching pytorch3d.

    m: (..., 3, 3) -> (..., 4). Branch-free (uses the numerically-stable
    four-candidate construction so it is safely vmappable/jittable).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four quaternion candidates, squared magnitudes of (w, x, y, z).
    q_abs_sq = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs_sq, 0.0))

    quat_by_w = jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1)
    quat_by_x = jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], -1)
    quat_by_y = jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], -1)
    quat_by_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], -1)
    quat_candidates = jnp.stack([quat_by_w, quat_by_x, quat_by_y, quat_by_z], axis=-2)
    denom = 2.0 * jnp.maximum(q_abs[..., None], 0.1)
    quat_candidates = quat_candidates / denom

    best = jnp.argmax(q_abs, axis=-1)
    quat = jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]
    # Canonical sign: w >= 0.
    return quat * jnp.where(quat[..., :1] < 0, -1.0, 1.0)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z) -> rotation matrix. q: (..., 4) -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = [
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ]
    return jnp.stack(rows, axis=-1).reshape(q.shape[:-1] + (3, 3))


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential map, so(3) -> SO(3). w: (..., 3) -> (..., 3, 3).

    Used for the learnable per-image extrinsics refinement (TPU equivalent of
    pyngp's optimize_extrinsics, reference reconstruction/train_ngp.py:66).
    """
    # Unnormalized Rodrigues: R = I + A*K + B*K^2 with K = skew(w),
    # A = sin(t)/t, B = (1-cos t)/t^2. Taylor branches + the safe-where trick
    # keep both value AND gradient finite at w == 0 (a plain norm-and-divide
    # version produces NaN grads at zero, which silently poisons joint
    # pose+field optimisation).
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    small = theta_sq < 1e-8
    theta_sq_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(theta_sq_safe)
    A = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq_safe)

    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    K = jnp.stack(
        [zeros, -wz, wy, wz, zeros, -wx, -wy, wx, zeros], axis=-1
    ).reshape(w.shape[:-1] + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + A[..., None] * K + B[..., None] * _mm(K, K)


def make_pose(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble (..., 4, 4) homogeneous transforms from (...,3,3) and (...,3)."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def pose_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Fast analytic inverse of rigid transforms. T: (..., 4, 4)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -_mm(Rt, t[..., None])[..., 0]
    return make_pose(Rt, ti)


def accio_to_ngp(T: jnp.ndarray) -> jnp.ndarray:
    """OpenCV("accio") -> NGP camera convention: flip y and z columns.

    Parity: utils/accio2ngp.py:133-139. Works on (..., 4, 4) batches.
    Involutive: ngp_to_accio is the same flip.
    """
    flip = jnp.array([1.0, -1.0, -1.0, 1.0], dtype=T.dtype)
    return T * flip  # broadcasts over the last (column) axis; row 3 is 0,0,0,1.


ngp_to_accio = accio_to_ngp  # The y/z column flip is its own inverse.


def convert_virtual_pose(
    T_WO_1: jnp.ndarray, T_WO_2: jnp.ndarray, T_WC_1: jnp.ndarray
) -> jnp.ndarray:
    """Virtual-camera pose trick: T_WC_2 s.t. T_C1_O2 == T_C2_O1.

    Moving the camera to T_WC_2 and rendering the object at its *original* pose
    is equivalent to rendering the object moved to T_WO_2 from camera T_WC_1.
    Parity: reconstruction/combined_rendering.py:250-263.

    All args broadcast; typical use is T_WO_2 batched (K, 4, 4).
    """
    T_O2_O1 = _mm(pose_inverse(T_WO_2), T_WO_1)
    T_O1_C1 = _mm(pose_inverse(T_WO_1), T_WC_1)
    return _mm(_mm(T_WO_1, T_O2_O1), T_O1_C1)


def cartesian_prod_6(axes: list[jnp.ndarray]) -> jnp.ndarray:
    """torch.cartesian_prod semantics for 6 1-D arrays: last axis fastest.

    Returns (prod(len), 6). Parity: vision_3d/obj_pose_opt.py:47.
    """
    grids = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([g.reshape(-1) for g in grids], axis=-1)
