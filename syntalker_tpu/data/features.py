"""On-device pose featurization: axis-angle -> per-part rot6d.

The `_load_data` device path of the diffusion trainer
(diffusion_rvqvae_trainer.py:244-298): slice the 165-dof axis-angle pose
into body parts, convert each to 6D rotations, and (for the lower body)
append the normalized translation velocity. Runs under jit as part of the
training step.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from syntalker_tpu.data import joints as J
from syntalker_tpu.ops import rotations as rot


def _part_rot6d(pose_aa: jax.Array, idx, n_joints: int) -> jax.Array:
    b, t, _ = pose_aa.shape
    part = pose_aa[..., idx].reshape(b, t, n_joints, 3)
    return rot.axis_angle_to_rotation_6d(part).reshape(b, t, n_joints * 6)


def pose_to_part_rot6d(pose_aa: jax.Array) -> Dict[str, jax.Array]:
    """(B, T, 165) axis-angle -> dict of per-part rot6d features
    (upper 78 / hands 180 / lower 54 / jaw 6 / full 330)."""
    return {
        "upper": _part_rot6d(pose_aa, J.UPPER_AA_IDX, J.UPPER_JOINT_COUNT),
        "hands": _part_rot6d(pose_aa, J.HANDS_AA_IDX, J.HANDS_JOINT_COUNT),
        "lower": _part_rot6d(pose_aa, J.LOWER_AA_IDX, J.LOWER_JOINT_COUNT),
        "jaw": _part_rot6d(pose_aa, J.FACE_AA_IDX, 1),
        "full": rot.axis_angle_to_rotation_6d(
            pose_aa.reshape(*pose_aa.shape[:-1], J.NUM_JOINTS, 3)
        ).reshape(*pose_aa.shape[:-1], J.ROT6D_DIM),
    }
