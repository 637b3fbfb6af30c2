"""HumanML3D-style 623-dim motion representation for SMPL-X (52 joints).

Capability parity with the reference's h3d pipeline: the 623-dim layout and
body-part masks (rvq_beatx_train.py:261-295), the representation recovery
(`recover_root_rot_pos` / `recover_from_ric`, utils/plot_script.py:15-52),
and the feature construction performed offline by the process_h3d_*
notebooks (root-relative positions/rotations/velocities + foot contacts).

Layout (dims):
  [0]        root rotation velocity (y-angle per frame)
  [1:3]      root xz linear velocity (root frame)
  [3]        root height
  [4:157]    51 non-root local joint positions (xyz, root frame)
  [157:463]  51 non-root local joint rotations (6d)
  [463:619]  52 joint velocities (xyz, root frame)
  [619:623]  foot contacts
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


H3D_DIM = 623
NUM_H3D_JOINTS = 52  # 55 minus jaw + eyes
# 52-joint selection out of the SMPL-X 55 (drop jaw 22, eyes 23/24)
H3D_JOINT_SELECTION = tuple(range(22)) + tuple(range(25, 55))

ROOT_SLICE = (0, 4)
POS_SLICE = (4, 4 + 51 * 3)  # 157
ROT_SLICE = (157, 157 + 51 * 6)  # 463
VEL_SLICE = (463, 463 + 52 * 3)  # 619
CONTACT_SLICE = (619, 623)

UPPER_JOINTS_52 = (3, 6, 9, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21)
HANDS_JOINTS_52 = tuple(range(22, 52))
LOWER_JOINTS_52 = (0, 1, 2, 4, 5, 7, 8, 10, 11)


def _joint_feature_dims(i: int) -> list[int]:
    dims = []
    if i > 0:
        dims += list(range(4 + (i - 1) * 3, 4 + (i - 1) * 3 + 3))
        dims += list(range(4 + 51 * 3 + (i - 1) * 6, 4 + 51 * 3 + (i - 1) * 6 + 6))
    dims += list(range(4 + 51 * 9 + i * 3, 4 + 51 * 9 + i * 3 + 3))
    return dims


def part_mask_623(part: str) -> np.ndarray:
    """Feature indices of one body part in the 623-dim vector
    (rvq_beatx_train.py:261-295)."""
    if part == "upper":
        joints = UPPER_JOINTS_52
        extra: list[int] = []
    elif part == "hands":
        joints = HANDS_JOINTS_52
        extra = []
    elif part in ("lower", "lower_trans"):
        joints = LOWER_JOINTS_52
        extra = list(range(0, 4)) + list(range(619, 623))
    else:
        raise ValueError(part)
    dims = list(extra)
    for i in joints:
        dims.extend(_joint_feature_dims(i))
    return np.asarray(sorted(set(dims)) if part.startswith("lower") else dims, np.int32)


H3D_PART_DIMS = {"upper": 156, "hands": 360, "lower": 107}


# ---------------------------------------------------------------------------
# recovery (plot_script.py:15-52) — JAX
# ---------------------------------------------------------------------------


def _qinv(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0])


def _qrot(q, v):
    """Rotate vectors v (..., 3) by quaternions q (..., 4) (w,x,y,z)."""
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2 * (q[..., :1] * uv + uuv)


def recover_root_rot_pos(data: jax.Array):
    """Integrate root yaw/velocity channels -> (quat (..., T, 4), pos (..., T, 3))."""
    rot_vel = data[..., 0]
    r_rot_ang = jnp.concatenate(
        [jnp.zeros_like(rot_vel[..., :1]), rot_vel[..., :-1]], axis=-1
    )
    r_rot_ang = jnp.cumsum(r_rot_ang, axis=-1)
    zeros = jnp.zeros_like(r_rot_ang)
    r_rot_quat = jnp.stack(
        [jnp.cos(r_rot_ang), zeros, jnp.sin(r_rot_ang), zeros], axis=-1
    )
    vel_xz = jnp.concatenate(
        [jnp.zeros_like(data[..., :1, 1:3]), data[..., :-1, 1:3]], axis=-2
    )
    r_pos = jnp.stack(
        [vel_xz[..., 0], jnp.zeros_like(vel_xz[..., 0]), vel_xz[..., 1]], axis=-1
    )
    r_pos = _qrot(_qinv(r_rot_quat), r_pos)
    r_pos = jnp.cumsum(r_pos, axis=-2)
    r_pos = r_pos.at[..., 1].set(data[..., 3])
    return r_rot_quat, r_pos


def recover_from_ric(data: jax.Array, joints_num: int = NUM_H3D_JOINTS) -> jax.Array:
    """623-dim features -> global joint positions (..., T, J, 3)."""
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    positions = data[..., 4 : (joints_num - 1) * 3 + 4]
    positions = positions.reshape(positions.shape[:-1] + (joints_num - 1, 3))
    q = _qinv(r_rot_quat)[..., None, :]
    positions = _qrot(jnp.broadcast_to(q, positions.shape[:-1] + (4,)), positions)
    positions = positions.at[..., 0].add(r_pos[..., None, 0])
    positions = positions.at[..., 2].add(r_pos[..., None, 2])
    return jnp.concatenate([r_pos[..., None, :], positions], axis=-2)


# ---------------------------------------------------------------------------
# construction (process_h3d notebooks equivalent) — JAX
# ---------------------------------------------------------------------------


def h3d_features_from_pose(
    pose_aa: jax.Array,  # (T, 165)
    betas: jax.Array,  # (300,)
    trans: jax.Array,  # (T, 3)
    smplx_model,
    contacts: jax.Array,  # (T, 4)
) -> jax.Array:
    """SMPL-X pose -> 623-d features via the JAX FK (the on-line equivalent
    of the process_h3d notebooks' offline featurization)."""
    from syntalker_tpu.ops import rotations as R
    from syntalker_tpu.ops import smplx as S

    t = pose_aa.shape[0]
    joints = S.forward_joints(
        smplx_model, pose_aa, jnp.tile(betas[None], (t, 1)), trans
    )[:, jnp.asarray(H3D_JOINT_SELECTION)]
    aa = pose_aa.reshape(t, 55, 3)[:, jnp.asarray(H3D_JOINT_SELECTION)[1:]]
    rot6d = R.axis_angle_to_rotation_6d(aa)  # (T, 51, 6)
    return build_h3d_features(joints, rot6d, contacts)


def build_h3d_features(
    joints: jax.Array,  # (T, 52, 3) global joint positions (y-up)
    rotations_6d: jax.Array,  # (T, 51, 6) local joint rotations (non-root)
    contacts: jax.Array,  # (T, 4)
) -> jax.Array:
    """Assemble the 623-dim representation from FK outputs. The inverse of
    :func:`recover_from_ric` up to the yaw decomposition: root yaw is taken
    as the heading of the hips (x-axis) projected to the ground plane."""
    t = joints.shape[0]
    root = joints[:, 0]

    # heading half-angle from the hip lateral axis; the 623-d root channel
    # stores *half-angle* velocity (recover builds quats as [cosθ, 0, sinθ, 0]
    # with θ = cumsum(channel 0), i.e. θ is the quaternion half angle).
    across = joints[:, 2] - joints[:, 1]  # right_hip - left_hip
    heading = jnp.arctan2(across[:, 0], across[:, 2])
    # wrapped increments -> canonical half-angle with phi[0] = 0
    d = heading[1:] - heading[:-1]
    d = jnp.arctan2(jnp.sin(d), jnp.cos(d))
    phi = 0.5 * jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(d)], axis=0)
    zeros = jnp.zeros_like(phi)
    r_quat = jnp.stack([jnp.cos(phi), zeros, jnp.sin(phi), zeros], axis=-1)

    rot_vel = jnp.concatenate([phi[1:] - phi[:-1], jnp.zeros((1,))], axis=0)

    # root xz path canonicalized to start at the origin
    xz = jnp.asarray([1.0, 0.0, 1.0])
    root = root - root[0] * xz

    # root-frame xz velocity: v_t maps root_t -> root_{t+1}, expressed in
    # frame t+1 (recover applies qinv(quat_{t+1}) before integrating).
    vel_root = root[1:] - root[:-1]
    vel_local = _qrot(r_quat[1:], vel_root)
    vel_local = jnp.concatenate([vel_local, jnp.zeros((1, 3))], axis=0)

    root_feats = jnp.stack(
        [rot_vel, vel_local[:, 0], vel_local[:, 2], root[:, 1]], axis=-1
    )

    # local positions: root xz removed, absolute y kept (HumanML3D keeps
    # ground-relative heights; recover_from_ric adds back only xz)
    local = joints[:, 1:] - joints[:, :1] * xz
    local = _qrot(jnp.broadcast_to(r_quat[:, None, :], local.shape[:-1] + (4,)), local)

    # joint velocities (root frame)
    jvel = jnp.concatenate([joints[1:] - joints[:-1], jnp.zeros((1, 52, 3))], axis=0)
    jvel = _qrot(jnp.broadcast_to(r_quat[:, None, :], jvel.shape[:-1] + (4,)), jvel)

    return jnp.concatenate(
        [
            root_feats,
            local.reshape(t, -1),
            rotations_6d.reshape(t, -1),
            jvel.reshape(t, -1),
            contacts,
        ],
        axis=-1,
    )
