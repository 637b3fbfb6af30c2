"""Rotation representation conversions in pure JAX.

Capability parity with the reference's pytorch3d-derived helpers
(``/root/reference/utils/rotation_conversions.py``): axis-angle, quaternion
(w, x, y, z), rotation matrix, and the continuous 6D representation of
Zhou et al. (CVPR 2019).

Everything here is shape-polymorphic over leading batch dimensions, jittable,
vmappable, and differentiable. Conventions match the reference so that motion
features produced by either stack are interchangeable:

- quaternions are (w, x, y, z) with non-negative w on the forward path,
- ``matrix_to_rotation_6d`` takes the first two *rows* of the matrix,
- ``rotation_6d_to_matrix`` Gram-Schmidt-orthonormalizes rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# axis-angle <-> quaternion
# ---------------------------------------------------------------------------


def axis_angle_to_quaternion(axis_angle: jax.Array) -> jax.Array:
    """(..., 3) rotation vectors -> (..., 4) unit quaternions (w, x, y, z).

    Uses a Taylor expansion of sin(θ/2)/θ near θ=0 so the map stays smooth
    and differentiable at the identity (same trick as the reference,
    rotation_conversions.py:526-550).
    """
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = angle * 0.5
    # sin(θ/2)/θ with series fallback: 0.5 - θ²/48 for small θ.
    small = angle < 1e-6
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angle * angle) / 48.0,
        jnp.sin(half) / jnp.where(small, 1.0, angle),
    )
    return jnp.concatenate([jnp.cos(half), axis_angle * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(quaternion: jax.Array) -> jax.Array:
    """(..., 4) quaternions (w, x, y, z) -> (..., 3) rotation vectors."""
    norms = jnp.linalg.norm(quaternion[..., 1:], axis=-1, keepdims=True)
    half_angle = jnp.arctan2(norms, quaternion[..., :1])
    angle = 2.0 * half_angle
    small = jnp.abs(angle) < 1e-6
    # θ / sin(θ/2), series: 2 + θ²/12 for small θ  => inverse factor below.
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angle * angle) / 48.0,
        jnp.sin(half_angle) / jnp.where(small, 1.0, angle),
    )
    return quaternion[..., 1:] / jnp.maximum(sin_half_over_angle, _EPS)


# ---------------------------------------------------------------------------
# quaternion <-> matrix
# ---------------------------------------------------------------------------


def quaternion_to_matrix(quaternion: jax.Array) -> jax.Array:
    """(..., 4) quaternions (w, x, y, z) -> (..., 3, 3) rotation matrices."""
    w, x, y, z = jnp.moveaxis(quaternion, -1, 0)
    two_s = 2.0 / jnp.sum(quaternion * quaternion, axis=-1)
    m = jnp.stack(
        [
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(quaternion.shape[:-1] + (3, 3))


def matrix_to_quaternion(matrix: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrices -> (..., 4) quaternions (w, x, y, z).

    Branch-free variant of the standard four-candidate extraction: all four
    candidate quaternions are computed and the best-conditioned one selected
    by ``where``, keeping the op XLA-friendly (no data-dependent control
    flow) and numerically stable for every rotation.
    """
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Squared absolute values of the four candidates (×4).
    q_abs2 = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs2, 0.0))

    # Candidate quaternions (unnormalized), rows indexed by which component
    # has the largest magnitude.
    cand = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )  # (..., 4 candidates, 4 components)

    denom = 2.0 * jnp.maximum(q_abs[..., None], 0.1)
    cand = cand / denom

    best = jnp.argmax(q_abs2, axis=-1)
    quat = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)
    quat = quat[..., 0, :]
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    # Canonicalize to non-negative real part.
    return jnp.where(quat[..., :1] < 0, -quat, quat)


# ---------------------------------------------------------------------------
# axis-angle <-> matrix
# ---------------------------------------------------------------------------


def axis_angle_to_matrix(axis_angle: jax.Array) -> jax.Array:
    """(..., 3) rotation vectors -> (..., 3, 3) matrices (via quaternion)."""
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: jax.Array) -> jax.Array:
    """(..., 3, 3) matrices -> (..., 3) rotation vectors (via quaternion)."""
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


# ---------------------------------------------------------------------------
# 6D representation (Zhou et al.)
# ---------------------------------------------------------------------------


def matrix_to_rotation_6d(matrix: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 6): first two rows, flattened.

    Matches the reference convention (rotation_conversions.py:547-550).
    """
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """(..., 6) -> (..., 3, 3) via Gram-Schmidt on the two encoded rows."""
    a1 = d6[..., :3]
    a2 = d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    a2_proj = jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 - a2_proj
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def axis_angle_to_rotation_6d(axis_angle: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 6) fused helper for the data path."""
    return matrix_to_rotation_6d(axis_angle_to_matrix(axis_angle))


def rotation_6d_to_axis_angle(d6: jax.Array) -> jax.Array:
    """(..., 6) -> (..., 3) fused helper for the decode path."""
    return matrix_to_axis_angle(rotation_6d_to_matrix(d6))


# ---------------------------------------------------------------------------
# losses / distances
# ---------------------------------------------------------------------------


def geodesic_distance(m1: jax.Array, m2: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Geodesic angle between rotation matrices (..., 3, 3) -> (...).

    Equivalent to the reference's GeodesicLoss (optimizers/loss_factory.py:10).
    """
    m = jnp.einsum("...ij,...kj->...ik", m1, m2)
    cos = (m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2] - 1.0) * 0.5
    cos = jnp.clip(cos, -1.0 + eps, 1.0 - eps)
    return jnp.arccos(cos)
