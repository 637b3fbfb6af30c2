"""Round-trip and convention tests for rotation conversions.

The reference has no unit tests (SURVEY.md §4); these pin the invariants its
pytorch3d-derived helpers rely on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syntalker_tpu.ops import rotations as rot


def random_axis_angle(key, shape=(64,)):
    axis = jax.random.normal(key, shape + (3,))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    angle = jax.random.uniform(jax.random.fold_in(key, 1), shape + (1,), minval=0.01, maxval=np.pi - 0.01)
    return axis * angle


class TestQuaternion:
    def test_axis_angle_quaternion_roundtrip(self):
        aa = random_axis_angle(jax.random.PRNGKey(0))
        q = rot.axis_angle_to_quaternion(aa)
        back = rot.quaternion_to_axis_angle(q)
        np.testing.assert_allclose(np.asarray(back), np.asarray(aa), atol=1e-5)

    def test_unit_norm(self):
        aa = random_axis_angle(jax.random.PRNGKey(1))
        q = rot.axis_angle_to_quaternion(aa)
        np.testing.assert_allclose(np.asarray(jnp.linalg.norm(q, axis=-1)), 1.0, atol=1e-6)

    def test_identity(self):
        q = rot.axis_angle_to_quaternion(jnp.zeros((3,)))
        np.testing.assert_allclose(np.asarray(q), [1.0, 0, 0, 0], atol=1e-7)


class TestMatrix:
    def test_matrices_are_rotations(self):
        aa = random_axis_angle(jax.random.PRNGKey(2))
        m = rot.axis_angle_to_matrix(aa)
        eye = jnp.einsum("...ij,...kj->...ik", m, m)
        np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(m)), 1.0, atol=1e-5)

    def test_matrix_quaternion_roundtrip(self):
        aa = random_axis_angle(jax.random.PRNGKey(3))
        q = rot.axis_angle_to_quaternion(aa)
        q2 = rot.matrix_to_quaternion(rot.quaternion_to_matrix(q))
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-5)

    def test_aa_matrix_roundtrip(self):
        aa = random_axis_angle(jax.random.PRNGKey(4), shape=(128,))
        back = rot.matrix_to_axis_angle(rot.axis_angle_to_matrix(aa))
        np.testing.assert_allclose(np.asarray(back), np.asarray(aa), atol=1e-4)

    def test_near_pi_rotations(self):
        # The quaternion extraction must stay stable near θ=π where w→0.
        axis = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0],
                         [0.6, 0.8, 0.0]])
        aa = jnp.asarray(axis * (np.pi - 1e-4))
        back = rot.matrix_to_axis_angle(rot.axis_angle_to_matrix(aa))
        np.testing.assert_allclose(np.asarray(back), np.asarray(aa), atol=1e-3)

    def test_known_rotation_90deg_z(self):
        aa = jnp.array([0.0, 0.0, np.pi / 2])
        m = np.asarray(rot.axis_angle_to_matrix(aa))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(m, expected, atol=1e-6)


class TestRotation6D:
    def test_matrix_6d_roundtrip(self):
        aa = random_axis_angle(jax.random.PRNGKey(5))
        m = rot.axis_angle_to_matrix(aa)
        m2 = rot.rotation_6d_to_matrix(rot.matrix_to_rotation_6d(m))
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-5)

    def test_6d_is_first_two_rows(self):
        aa = random_axis_angle(jax.random.PRNGKey(6), shape=())
        m = rot.axis_angle_to_matrix(aa)
        d6 = rot.matrix_to_rotation_6d(m)
        np.testing.assert_allclose(np.asarray(d6[:3]), np.asarray(m[0]), atol=1e-7)
        np.testing.assert_allclose(np.asarray(d6[3:]), np.asarray(m[1]), atol=1e-7)

    def test_gram_schmidt_handles_unnormalized(self):
        d6 = jnp.array([2.0, 0, 0, 1.0, 3.0, 0])
        m = rot.rotation_6d_to_matrix(d6)
        eye = jnp.einsum("ij,kj->ik", m, m)
        np.testing.assert_allclose(np.asarray(eye), np.eye(3), atol=1e-6)

    def test_full_chain_on_reference_clip(self):
        # Real motion data from the reference demo assets: the aa->6d->aa
        # chain used by _load_data/_g_test must be lossless.
        poses = np.load("/root/reference/demo/examples/2_scott_0_1_1.npz")["poses"][:32]
        aa = jnp.asarray(poses.reshape(32, 55, 3))
        d6 = rot.axis_angle_to_rotation_6d(aa)
        assert d6.shape == (32, 55, 6)
        m1 = rot.axis_angle_to_matrix(aa)
        m2 = rot.rotation_6d_to_matrix(d6)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), atol=1e-5)


class TestGeodesic:
    def test_zero_for_same(self):
        aa = random_axis_angle(jax.random.PRNGKey(7))
        m = rot.axis_angle_to_matrix(aa)
        d = rot.geodesic_distance(m, m)
        assert float(jnp.max(d)) < 1e-2  # arccos eps clamp keeps it near 0

    def test_angle_recovery(self):
        angle = 0.7
        aa = jnp.array([0.0, 0.0, angle])
        m = rot.axis_angle_to_matrix(aa)
        eye = jnp.broadcast_to(jnp.eye(3), m.shape)
        d = rot.geodesic_distance(m, eye)
        np.testing.assert_allclose(float(d), angle, atol=1e-5)


class TestJointMasks:
    def test_part_dims(self):
        from syntalker_tpu.data import joints as J

        assert J.UPPER_6D_IDX.shape == (78,)
        assert J.HANDS_6D_IDX.shape == (180,)
        assert J.LOWER_6D_IDX.shape == (54,)
        assert J.JOINT_MASK_UPPER.sum() == 39
        assert J.JOINT_MASK_HANDS.sum() == 90
        assert J.JOINT_MASK_LOWER.sum() == 27
        # parts + face + eyes cover the full skeleton without overlap
        overlap = (
            J.JOINT_MASK_UPPER.astype(int)
            + J.JOINT_MASK_HANDS.astype(int)
            + J.JOINT_MASK_LOWER.astype(int)
            + J.JOINT_MASK_FACE.astype(int)
        )
        assert overlap.max() == 1
        assert overlap.sum() == (13 + 30 + 9 + 1) * 3

    def test_scatter_roundtrip(self):
        from syntalker_tpu.data import joints as J

        x = np.random.default_rng(0).normal(size=(4, 165)).astype(np.float32)
        part = x[..., J.UPPER_AA_IDX]
        full = J.scatter_part(part, J.UPPER_AA_IDX, 165)
        np.testing.assert_array_equal(full[..., J.UPPER_AA_IDX], part)
        assert np.all(full[..., ~J.JOINT_MASK_UPPER] == 0)

    def test_scatter_jax(self):
        from syntalker_tpu.data import joints as J

        x = jnp.ones((2, 78))
        full = J.scatter_part(x, J.UPPER_6D_IDX, 330)
        assert full.shape == (2, 330)
        assert float(full.sum()) == 78 * 2
