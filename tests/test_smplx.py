"""SMPL-X FK/LBS tests on synthetic skeletons (the released model npz is
not shipped; geometry invariants pin the implementation)."""

import jax.numpy as jnp
import numpy as np
import pytest

from syntalker_tpu.ops import smplx as S


def chain_parents(n):
    p = np.arange(-1, n - 1, dtype=np.int32)
    return p


class TestForwardKinematics:
    def test_identity_pose_keeps_rest(self):
        rest = jnp.asarray(np.random.default_rng(0).normal(size=(2, 55, 3)).astype(np.float32))
        pose = jnp.zeros((2, 55, 3))
        joints, rotg = S.forward_kinematics(rest, pose)
        np.testing.assert_allclose(np.asarray(joints), np.asarray(rest), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(rotg), np.broadcast_to(np.eye(3), rotg.shape), atol=1e-6
        )

    def test_translation_applied(self):
        rest = jnp.zeros((1, 55, 3))
        pose = jnp.zeros((1, 55, 3))
        trans = jnp.asarray([[1.0, 2.0, 3.0]])
        joints, _ = S.forward_kinematics(rest, pose, trans)
        np.testing.assert_allclose(np.asarray(joints[0, 0]), [1, 2, 3], atol=1e-6)

    def test_root_rotation_rotates_whole_body(self):
        rest = jnp.asarray(
            np.concatenate([np.zeros((1, 1, 3)), np.ones((1, 54, 3))], 1).astype(np.float32)
        )
        pose = jnp.zeros((1, 55, 3)).at[0, 0, 2].set(np.pi / 2)  # 90° about z at root
        joints, _ = S.forward_kinematics(rest, pose)
        # child at (1,1,1) relative to root rotates to (-1,1,1)
        child = np.asarray(joints[0, 1])
        np.testing.assert_allclose(child, [-1, 1, 1], atol=1e-5)

    def test_elbow_chain(self):
        # 3-joint chain along +x; rotate middle joint 90° about z
        parents = chain_parents(3)
        rest = jnp.asarray([[[0, 0, 0], [1, 0, 0], [2, 0, 0]]], dtype=jnp.float32)
        pose = jnp.zeros((1, 3, 3)).at[0, 1, 2].set(np.pi / 2)
        joints, _ = S.forward_kinematics(rest, pose, parents=parents)
        np.testing.assert_allclose(np.asarray(joints[0, 1]), [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(joints[0, 2]), [1, 1, 0], atol=1e-5)

    def test_bone_lengths_preserved(self):
        rng = np.random.default_rng(1)
        rest = jnp.asarray(rng.normal(size=(1, 55, 3)).astype(np.float32))
        pose = jnp.asarray(rng.normal(size=(1, 55, 3)).astype(np.float32) * 0.5)
        joints, _ = S.forward_kinematics(rest, pose)
        for j in range(1, 55):
            p = int(S.PARENTS[j])
            l0 = float(jnp.linalg.norm(rest[0, j] - rest[0, p]))
            l1 = float(jnp.linalg.norm(joints[0, j] - joints[0, p]))
            np.testing.assert_allclose(l1, l0, atol=1e-4)


class TestLBS:
    def _toy_model(self):
        # 2-joint chain, 4 vertices rigidly attached to joint 1
        v_template = np.array(
            [[1, 0.1, 0], [1, -0.1, 0], [1.5, 0.1, 0], [1.5, -0.1, 0]], np.float32
        )
        parents = np.array([-1, 0], np.int32)
        jreg = np.array([[0.0] * 4, [0.25] * 4], np.float32)
        jreg[0] = 0  # root at origin via regressor on zeros... use explicit
        # regress root from nothing: set root row to zero -> rest root = 0
        weights = np.zeros((4, 2), np.float32)
        weights[:, 1] = 1.0
        return S.SMPLXModel(
            v_template=v_template,
            shapedirs=np.zeros((4, 3, 1), np.float32),
            posedirs=np.zeros((9, 12), np.float32),
            j_regressor=jreg,
            lbs_weights=weights,
            parents=parents,
            num_betas=1,
            num_expr=0,
        )

    def test_rigid_rotation_about_joint(self):
        model = self._toy_model()
        pose = jnp.zeros((1, 2, 3)).at[0, 1, 2].set(np.pi / 2)
        out = S.lbs(model, pose, jnp.zeros((1, 1)))
        verts = np.asarray(out["vertices"][0])
        # joint1 rest position = mean of verts = (1.25, 0, 0); vertices
        # rotate 90° about z around that pivot
        pivot = np.array([1.25, 0, 0])
        expect0 = pivot + np.array([-0.1, 1 - 1.25, 0])[[1, 0, 2]] * np.array([-1, 1, 1])
        # compute directly: v' = Rz90 (v - pivot) + pivot
        Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        vt = model.v_template
        expect = (Rz @ (vt - pivot).T).T + pivot
        np.testing.assert_allclose(verts, expect, atol=1e-5)

    def test_betas_move_rest_joints(self):
        model = self._toy_model()
        model = S.SMPLXModel(
            **{
                **model.__dict__,
                "shapedirs": np.ones((4, 3, 1), np.float32),
            }
        )
        rest0, _ = S.rest_joints(model, jnp.zeros((1, 1)))
        rest1, _ = S.rest_joints(model, jnp.ones((1, 1)))
        np.testing.assert_allclose(
            np.asarray(rest1 - rest0)[0, 1], [1, 1, 1], atol=1e-6
        )


class TestFootContacts:
    def test_static_pose_always_contact(self):
        model = TestLBS()._toy_model()
        # reuse the generic FK path: feed a 55-joint fake via forward_joints
        # not applicable to toy; test the velocity rule directly instead
        import jax

        feet = jnp.zeros((10, 4, 3))
        v = jnp.linalg.norm(feet[1:] - feet[:-1], axis=-1)
        v = jnp.concatenate([v, jnp.zeros((1, 4))], axis=0)
        contacts = (v < 0.01).astype(jnp.float32)
        assert np.asarray(contacts).all()

    def test_moving_feet_no_contact(self):
        t = jnp.arange(10, dtype=jnp.float32)
        feet = jnp.zeros((10, 4, 3)).at[:, :, 0].add(t[:, None] * 0.1)
        v = jnp.linalg.norm(feet[1:] - feet[:-1], axis=-1)
        v = jnp.concatenate([v, jnp.zeros((1, 4))], axis=0)
        contacts = np.asarray((v < 0.01).astype(jnp.float32))
        assert not contacts[:-1].any()
        assert contacts[-1].all()  # trailing zero-velocity convention
