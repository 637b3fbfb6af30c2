"""SMPL-X body model (forward kinematics + linear blend skinning) in JAX.

The reference delegates to the ``smplx`` torch package (betas=300,
expressions=100, 2020 neutral model) for foot-contact labeling
(beat_sep_lower.py:284-330), eval joints and face vertices
(diffusion_rvqvae_trainer.py:626-667), and rendering. This is the on-device
JAX equivalent (SURVEY.md §2.9): a joints-only fast path for FK consumers
(contacts, BeatAlign, L1Div need no vertices — the reference always paid
the full 10k-vertex LBS) and a full LBS path for vertex consumers.

Everything is batched, jittable, and differentiable. Model data loads from
the standard ``SMPLX_*.npz`` release file; tests run on synthetic
skeletons via the explicit ``parents`` argument.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from syntalker_tpu.ops import rotations as rot

NUM_JOINTS = 55

# SMPL-X kinematic tree: parent index per joint (pelvis = -1). Matches the
# kintree_table of SMPLX_NEUTRAL_2020.npz (models/motion_representation.py:69).
PARENTS = np.array(
    [
        -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
        18, 19, 15, 15, 15,
        20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,
        21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53,
    ],
    dtype=np.int32,
)


@dataclasses.dataclass(frozen=True)
class SMPLXModel:
    """Static model data (numpy, baked into jit as constants)."""

    v_template: np.ndarray  # (V, 3)
    shapedirs: np.ndarray  # (V, 3, n_shape + n_expr)
    posedirs: np.ndarray  # (P, V*3) pose blendshape basis
    j_regressor: np.ndarray  # (J, V)
    lbs_weights: np.ndarray  # (V, J)
    parents: np.ndarray = dataclasses.field(default_factory=lambda: PARENTS)
    num_betas: int = 300
    num_expr: int = 100


def load_smplx_npz(path: str | Path, num_betas: int = 300, num_expr: int = 100) -> SMPLXModel:
    """Load the released SMPL-X npz (e.g. SMPLX_NEUTRAL_2020.npz)."""
    d = np.load(path, allow_pickle=True)
    shapedirs = np.asarray(d["shapedirs"], np.float32)
    # released file carries 400 shape+expr dirs; slice to the used counts
    n_shape = min(num_betas, shapedirs.shape[-1])
    if shapedirs.shape[-1] > 300:
        sd = np.concatenate(
            [shapedirs[..., :num_betas], shapedirs[..., 300 : 300 + num_expr]], axis=-1
        )
    else:
        sd = shapedirs[..., :n_shape]
    posedirs = np.asarray(d["posedirs"], np.float32)
    if posedirs.ndim == 3:  # (V, 3, P) -> (P, V*3)
        posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    parents = np.asarray(d["kintree_table"], np.int64)[0, :NUM_JOINTS].astype(np.int32)
    parents[0] = -1
    return SMPLXModel(
        v_template=np.asarray(d["v_template"], np.float32),
        shapedirs=sd.astype(np.float32),
        posedirs=posedirs,
        j_regressor=np.asarray(d["J_regressor"], np.float32)[:NUM_JOINTS],
        lbs_weights=np.asarray(d["weights"], np.float32)[:, :NUM_JOINTS],
        parents=parents,
        num_betas=num_betas,
        num_expr=num_expr,
    )


def synthetic_smplx_model(
    verts_per_joint: int = 4, seed: int = 0, num_betas: int = 300, num_expr: int = 100
) -> SMPLXModel:
    """Geometry-plausible stand-in model for tests/benchmarks when the
    released SMPLX npz is unavailable: `verts_per_joint` vertices rigidly
    attached around each joint of a randomized rest skeleton."""
    rng = np.random.default_rng(seed)
    rest = np.zeros((NUM_JOINTS, 3), np.float32)
    for j in range(1, NUM_JOINTS):
        rest[j] = rest[PARENTS[j]] + rng.normal(0, 0.08, 3).astype(np.float32)
    v = NUM_JOINTS * verts_per_joint
    v_template = (
        np.repeat(rest, verts_per_joint, axis=0)
        + rng.normal(0, 0.02, (v, 3)).astype(np.float32)
    )
    jreg = np.zeros((NUM_JOINTS, v), np.float32)
    weights = np.zeros((v, NUM_JOINTS), np.float32)
    for j in range(NUM_JOINTS):
        sl = slice(j * verts_per_joint, (j + 1) * verts_per_joint)
        jreg[j, sl] = 1.0 / verts_per_joint
        weights[sl, j] = 1.0
    return SMPLXModel(
        v_template=v_template,
        shapedirs=rng.normal(0, 1e-4, (v, 3, num_betas + num_expr)).astype(np.float32),
        posedirs=np.zeros(((NUM_JOINTS - 1) * 9, v * 3), np.float32),
        j_regressor=jreg,
        lbs_weights=weights,
        num_betas=num_betas,
        num_expr=num_expr,
    )


def rest_joints(model: SMPLXModel, betas: jax.Array, expressions: Optional[jax.Array] = None):
    """Shaped rest-pose joint locations (B, J, 3)."""
    coeffs = betas
    if expressions is not None:
        coeffs = jnp.concatenate([betas, expressions], axis=-1)
    v_shaped = jnp.asarray(model.v_template) + jnp.einsum(
        "vcs,bs->bvc", jnp.asarray(model.shapedirs[..., : coeffs.shape[-1]]), coeffs
    )
    joints = jnp.einsum("jv,bvc->bjc", jnp.asarray(model.j_regressor), v_shaped)
    return joints, v_shaped


def forward_kinematics(
    rest: jax.Array,  # (B, J, 3) rest joint locations
    pose_aa: jax.Array,  # (B, J, 3) axis-angle per joint
    trans: Optional[jax.Array] = None,  # (B, 3)
    parents: np.ndarray = PARENTS,
):
    """Rigid FK down the kinematic tree.

    Returns (joints (B, J, 3), rot_global (B, J, 3, 3), rel_transforms
    (B, J, 4, 4) for LBS). Unrolled over the static tree (J=55 small
    matmuls; XLA fuses the chain).
    """
    b, j, _ = rest.shape
    R = rot.axis_angle_to_matrix(pose_aa)  # (B, J, 3, 3)

    rots = [R[:, 0]]
    pos = [rest[:, 0]]
    for i in range(1, j):
        p = int(parents[i])
        rots.append(rots[p] @ R[:, i])
        pos.append(pos[p] + jnp.einsum("bij,bj->bi", rots[p], rest[:, i] - rest[:, p]))
    rot_global = jnp.stack(rots, axis=1)
    joints = jnp.stack(pos, axis=1)

    if trans is not None:
        joints = joints + trans[:, None, :]
    return joints, rot_global


def relative_transforms(
    rest: jax.Array, joints: jax.Array, rot_global: jax.Array
) -> jax.Array:
    """(B, J, 4, 4) skinning transforms: G_posed · G_rest⁻¹."""
    b, j, _ = rest.shape
    t = joints - jnp.einsum("bjik,bjk->bji", rot_global, rest)
    A = jnp.zeros((b, j, 4, 4))
    A = A.at[:, :, :3, :3].set(rot_global)
    A = A.at[:, :, :3, 3].set(t)
    A = A.at[:, :, 3, 3].set(1.0)
    return A


def forward_joints(
    model: SMPLXModel,
    pose_aa: jax.Array,  # (B, 165) or (B, 55, 3)
    betas: jax.Array,  # (B, num_betas)
    trans: Optional[jax.Array] = None,
    expressions: Optional[jax.Array] = None,
) -> jax.Array:
    """Joints-only FK fast path -> (B, 55, 3).

    Matches smplx's 'joints'[:, :55] output (vertex-free: ~1000x less work
    than the reference's full-vertex call used for contacts/metrics).
    """
    if pose_aa.ndim == 2:
        pose_aa = pose_aa.reshape(pose_aa.shape[0], -1, 3)
    rest, _ = rest_joints(model, betas, expressions)
    joints, _ = forward_kinematics(rest, pose_aa, trans, model.parents)
    return joints


def lbs(
    model: SMPLXModel,
    pose_aa: jax.Array,  # (B, 165) or (B, 55, 3)
    betas: jax.Array,
    trans: Optional[jax.Array] = None,
    expressions: Optional[jax.Array] = None,
):
    """Full linear blend skinning -> dict(vertices (B, V, 3), joints (B, 55, 3)).

    Standard SMPL-X pipeline: shape blendshapes, pose-corrective
    blendshapes, FK, skinning (equivalent to smplx.SMPLX.forward with
    use_pca=False, flat_hand_mean=True semantics on raw axis-angle input).
    """
    if pose_aa.ndim == 2:
        pose_aa = pose_aa.reshape(pose_aa.shape[0], -1, 3)
    b = pose_aa.shape[0]
    rest, v_shaped = rest_joints(model, betas, expressions)
    joints, rot_global = forward_kinematics(rest, pose_aa, None, model.parents)

    # pose blendshapes from non-root joint rotations
    R = rot.axis_angle_to_matrix(pose_aa)
    ident = jnp.eye(3)
    pose_feature = (R[:, 1:] - ident).reshape(b, -1)  # (B, (J-1)*9)
    pd = jnp.asarray(model.posedirs)
    v_posed = v_shaped + (pose_feature @ pd).reshape(b, -1, 3)

    A = relative_transforms(rest, joints, rot_global)  # (B, J, 4, 4)
    W = jnp.asarray(model.lbs_weights)  # (V, J)
    T = jnp.einsum("vj,bjik->bvik", W, A)  # (B, V, 4, 4)
    v_h = jnp.concatenate([v_posed, jnp.ones((b, v_posed.shape[1], 1))], axis=-1)
    verts = jnp.einsum("bvik,bvk->bvi", T, v_h)[..., :3]

    if trans is not None:
        verts = verts + trans[:, None, :]
        joints = joints + trans[:, None, :]
    return {"vertices": verts, "joints": joints}


def foot_contacts(
    model: SMPLXModel,
    pose_aa: jax.Array,  # (T, 165)
    betas: jax.Array,  # (T, num_betas)
    trans: jax.Array,  # (T, 3)
    expressions: Optional[jax.Array] = None,
    threshold: float = 0.01,
) -> jax.Array:
    """Per-frame foot-contact labels (T, 4) for joints (7, 8, 10, 11):
    contact = inter-frame foot-joint displacement < threshold
    (beat_sep_lower.py:284-330; the last frame repeats its predecessor's
    zero-velocity convention)."""
    joints = forward_joints(model, pose_aa, betas, trans, expressions)
    feet = joints[:, (7, 8, 10, 11), :]  # (T, 4, 3)
    v = jnp.linalg.norm(feet[1:] - feet[:-1], axis=-1)  # (T-1, 4)
    v = jnp.concatenate([v, jnp.zeros((1, 4))], axis=0)
    return (v < threshold).astype(jnp.float32)
