"""SE(3) math parity tests (vs. scipy / torch reference implementations)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from dream2real_tpu.ops import se3


def test_euler_angles_to_matrix_matches_scipy(rng):
    eulers = rng.uniform(-np.pi, np.pi, size=(64, 3)).astype(np.float32)
    ours = np.asarray(se3.euler_angles_to_matrix(jnp.asarray(eulers), "XYZ"))
    # pytorch3d 'XYZ' == intrinsic rotations Rx @ Ry @ Rz == scipy extrinsic 'xyz' reversed:
    # Rx(a)Ry(b)Rz(c) is scipy.Rotation.from_euler('XYZ', [a,b,c]) (intrinsic).
    ref = R.from_euler("XYZ", eulers).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_matrix_to_quaternion_roundtrip(rng):
    eulers = rng.uniform(-np.pi, np.pi, size=(128, 3)).astype(np.float32)
    mats = se3.euler_angles_to_matrix(jnp.asarray(eulers), "XYZ")
    quats = se3.matrix_to_quaternion(mats)
    # wxyz -> scipy xyzw
    q = np.asarray(quats)
    ref = R.from_matrix(np.asarray(mats)).as_quat()  # xyzw
    ref_wxyz = np.concatenate([ref[:, 3:4], ref[:, :3]], axis=1)
    # canonical sign w >= 0
    ref_wxyz *= np.where(ref_wxyz[:, :1] < 0, -1.0, 1.0)
    np.testing.assert_allclose(q, ref_wxyz, atol=1e-4)


def test_quaternion_to_matrix_inverse(rng):
    q = rng.normal(size=(32, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    m = se3.quaternion_to_matrix(jnp.asarray(q))
    q2 = np.asarray(se3.matrix_to_quaternion(m))
    qc = q * np.where(q[:, :1] < 0, -1.0, 1.0)
    np.testing.assert_allclose(q2, qc, atol=1e-4)


def test_pose_inverse(rng):
    eulers = rng.uniform(-np.pi, np.pi, size=(8, 3)).astype(np.float32)
    t = rng.normal(size=(8, 3)).astype(np.float32)
    T = se3.make_pose(se3.euler_angles_to_matrix(jnp.asarray(eulers)), jnp.asarray(t))
    inv = se3.pose_inverse(T)
    prod = np.asarray(T @ inv)
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)


def test_accio_to_ngp_is_column_flip_and_involutive(rng):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R.from_euler("xyz", [0.3, -0.2, 0.9]).as_matrix()
    T[:3, 3] = [1, 2, 3]
    out = np.asarray(se3.accio_to_ngp(jnp.asarray(T)))
    ref = T.copy()
    ref[:3, 1] *= -1  # utils/accio2ngp.py:137-138
    ref[:3, 2] *= -1
    np.testing.assert_allclose(out, ref, atol=0)
    np.testing.assert_allclose(np.asarray(se3.ngp_to_accio(jnp.asarray(out))), T, atol=0)
    # Bottom row untouched.
    np.testing.assert_allclose(out[3], [0, 0, 0, 1], atol=0)


def test_convert_virtual_pose_property(rng):
    """T_C2_O1 must equal T_C1_O2 (combined_rendering.py:250-263)."""
    def rand_pose():
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R.from_euler("xyz", rng.uniform(-1, 1, 3)).as_matrix()
        T[:3, 3] = rng.normal(size=3)
        return jnp.asarray(T)

    T_WO1, T_WO2, T_WC1 = rand_pose(), rand_pose(), rand_pose()
    T_WC2 = se3.convert_virtual_pose(T_WO1, T_WO2, T_WC1)
    lhs = np.asarray(se3.pose_inverse(T_WC2) @ T_WO1)  # T_C2_O1
    rhs = np.asarray(se3.pose_inverse(T_WC1) @ T_WO2)  # T_C1_O2
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_so3_exp_matches_scipy(rng):
    w = rng.normal(size=(16, 3)).astype(np.float32) * 0.5
    ours = np.asarray(se3.so3_exp(jnp.asarray(w)))
    ref = R.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # Tiny angles.
    w0 = np.zeros((2, 3), dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(se3.so3_exp(jnp.asarray(w0))), np.tile(np.eye(3), (2, 1, 1)), atol=1e-6
    )


def test_cartesian_prod_matches_torch():
    import torch

    axes_np = [np.linspace(0, 1, n).astype(np.float32) for n in (3, 2, 4, 1, 2, 1)]
    ours = np.asarray(se3.cartesian_prod_6([jnp.asarray(a) for a in axes_np]))
    ref = torch.cartesian_prod(*[torch.tensor(a) for a in axes_np]).numpy()
    np.testing.assert_allclose(ours, ref, atol=0)
