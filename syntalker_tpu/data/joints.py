"""SMPL-X joint tables and body-part feature masks.

Capability parity with the reference's ``dataloaders/data_tools.py:18-860``
(joints_list) and the body-part mask arithmetic at
``diffusion_rvqvae_trainer.py:199-219`` / ``rvq_beatx_train.py:210-258``.

The SMPL-X 2020 skeleton has 55 pose joints (165 axis-angle dof). The
framework carves them into four body parts:

- **upper**  : 13 joints (spine chain + shoulders/arms/neck/head)
- **hands**  : 30 joints (both hands)
- **lower**  : 9 joints  (pelvis + legs/feet), plus the root translation
               velocity channel when ``use_trans``
- **face**   : jaw (+ eyes excluded from generation)

All masks are precomputed numpy constants so device code receives them as
static gather indices — never data-dependent shapes.
"""

from __future__ import annotations

import numpy as np

NUM_JOINTS = 55
AXIS_ANGLE_DIM = NUM_JOINTS * 3  # 165
ROT6D_DIM = NUM_JOINTS * 6  # 330

# SMPL-X joint-name order (2020 neutral model, 55 pose joints). Mirrors the
# reference table `beat_smplx_joints` (dataloaders/data_tools.py:222-446).
JOINT_NAMES = (
    "pelvis", "left_hip", "right_hip", "spine1", "left_knee", "right_knee",
    "spine2", "left_ankle", "right_ankle", "spine3", "left_foot", "right_foot",
    "neck", "left_collar", "right_collar", "head", "left_shoulder",
    "right_shoulder", "left_elbow", "right_elbow", "left_wrist", "right_wrist",
    "jaw", "left_eye_smplhf", "right_eye_smplhf",
    "left_index1", "left_index2", "left_index3",
    "left_middle1", "left_middle2", "left_middle3",
    "left_pinky1", "left_pinky2", "left_pinky3",
    "left_ring1", "left_ring2", "left_ring3",
    "left_thumb1", "left_thumb2", "left_thumb3",
    "right_index1", "right_index2", "right_index3",
    "right_middle1", "right_middle2", "right_middle3",
    "right_pinky1", "right_pinky2", "right_pinky3",
    "right_ring1", "right_ring2", "right_ring3",
    "right_thumb1", "right_thumb2", "right_thumb3",
)
assert len(JOINT_NAMES) == NUM_JOINTS

# Body-part joint indices. Mirrors diffusion_rvqvae_trainer.py:199-212 (the
# canonical per-part index lists used to slice the 330-dim rot6d features)
# and `beat_smplx_upper/hands/lower` (data_tools.py:563-796).
UPPER_JOINTS = (3, 6, 9, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21)
HANDS_JOINTS = tuple(range(25, 55))
LOWER_JOINTS = (0, 1, 2, 4, 5, 7, 8, 10, 11)
FACE_JOINTS = (22,)  # jaw; eyes (23, 24) are never modeled
# Upper-body joints used by the BeatAlign metric (utils/metric.py:54).
BEAT_ALIGN_UPPER_JOINTS = UPPER_JOINTS

UPPER_JOINT_COUNT = len(UPPER_JOINTS)  # 13
HANDS_JOINT_COUNT = len(HANDS_JOINTS)  # 30
LOWER_JOINT_COUNT = len(LOWER_JOINTS)  # 9

# Feature dims of each body-part RVQ-VAE (diffusion_rvqvae_trainer.py:105-137).
UPPER_DIM = UPPER_JOINT_COUNT * 6  # 78
HANDS_DIM = HANDS_JOINT_COUNT * 6  # 180
LOWER_DIM = LOWER_JOINT_COUNT * 6  # 54
LOWER_TRANS_DIM = LOWER_DIM + 3  # 57 (with translation velocity)

# Latent geometry (configs/diffusion_rvqvae_128.yaml:34-38; cfg_sampler.py:171-186).
LATENT_DIM_PER_PART = 512
NUM_PARTS = 3
LATENT_DIM = LATENT_DIM_PER_PART * NUM_PARTS  # 1536
LATENT_SLICES = {
    "upper": (0, 512),
    "hands": (512, 1024),
    "lower": (1024, 1536),
}


def _feature_indices(joint_ids, per_joint: int) -> np.ndarray:
    """Flat feature indices covering `per_joint` consecutive dims per joint."""
    idx = []
    for j in joint_ids:
        idx.extend(range(j * per_joint, (j + 1) * per_joint))
    return np.asarray(idx, dtype=np.int32)


# rot6d-space (330-dim) gather indices per part.
UPPER_6D_IDX = _feature_indices(UPPER_JOINTS, 6)
HANDS_6D_IDX = _feature_indices(HANDS_JOINTS, 6)
LOWER_6D_IDX = _feature_indices(LOWER_JOINTS, 6)

# axis-angle-space (165-dim) gather indices per part.
UPPER_AA_IDX = _feature_indices(UPPER_JOINTS, 3)
HANDS_AA_IDX = _feature_indices(HANDS_JOINTS, 3)
LOWER_AA_IDX = _feature_indices(LOWER_JOINTS, 3)
FACE_AA_IDX = _feature_indices(FACE_JOINTS, 3)  # jaw = dims 66:69


def boolean_mask(indices: np.ndarray, dim: int) -> np.ndarray:
    m = np.zeros(dim, dtype=bool)
    m[indices] = True
    return m


# Boolean masks mirroring the reference's joint_mask_* arrays
# (diffusion_rvqvae_trainer.py:48-60).
JOINT_MASK_UPPER = boolean_mask(UPPER_AA_IDX, AXIS_ANGLE_DIM)
JOINT_MASK_HANDS = boolean_mask(HANDS_AA_IDX, AXIS_ANGLE_DIM)
JOINT_MASK_LOWER = boolean_mask(LOWER_AA_IDX, AXIS_ANGLE_DIM)
JOINT_MASK_FACE = boolean_mask(FACE_AA_IDX, AXIS_ANGLE_DIM)


def scatter_part(part_features: np.ndarray, indices: np.ndarray, dim: int):
    """Inverse selection: scatter per-part features back into the full vector.

    Vectorized equivalent of the reference's per-row python loop
    (`inverse_selection_tensor`, diffusion_rvqvae_trainer.py:236-242).
    Works for numpy or jax arrays of shape (..., len(indices)).
    """
    import jax.numpy as jnp

    xp = jnp if not isinstance(part_features, np.ndarray) else np
    out_shape = part_features.shape[:-1] + (dim,)
    if xp is np:
        out = np.zeros(out_shape, dtype=part_features.dtype)
        out[..., indices] = part_features
        return out
    out = jnp.zeros(out_shape, dtype=part_features.dtype)
    return out.at[..., indices].set(part_features)
