"""Normalization statistics for BEAT2 pose features.

Capability parity with the reference's shipped ``mean_std/*.npy`` handling
(diffusion_rvqvae_trainer.py:188-226): the 330-dim rot6d mean/std is sliced
into the per-body-part sub-vectors used to normalize each RVQ-VAE's input,
plus the 3-dim translation-velocity stats.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from syntalker_tpu.data import joints as J


@dataclasses.dataclass(frozen=True)
class PoseStats:
    mean_full: np.ndarray  # (330,)
    std_full: np.ndarray  # (330,)
    trans_mean: np.ndarray  # (3,)
    trans_std: np.ndarray  # (3,)

    @property
    def mean_upper(self):
        return self.mean_full[J.UPPER_6D_IDX]

    @property
    def std_upper(self):
        return self.std_full[J.UPPER_6D_IDX]

    @property
    def mean_hands(self):
        return self.mean_full[J.HANDS_6D_IDX]

    @property
    def std_hands(self):
        return self.std_full[J.HANDS_6D_IDX]

    @property
    def mean_lower(self):
        return self.mean_full[J.LOWER_6D_IDX]

    @property
    def std_lower(self):
        return self.std_full[J.LOWER_6D_IDX]

    def normalize_part(self, x, part: str):
        mean = getattr(self, f"mean_{part}")
        std = getattr(self, f"std_{part}")
        return (x - mean) / std

    def denormalize_part(self, x, part: str):
        mean = getattr(self, f"mean_{part}")
        std = getattr(self, f"std_{part}")
        return x * std + mean


def load_pose_stats(mean_std_dir: str | Path) -> PoseStats:
    """Load the shipped beatx_2_330 / beatx_2_trans stats."""
    d = Path(mean_std_dir)
    return PoseStats(
        mean_full=np.load(d / "beatx_2_330_mean.npy").astype(np.float32),
        std_full=np.load(d / "beatx_2_330_std.npy").astype(np.float32),
        trans_mean=np.load(d / "beatx_2_trans_mean.npy").astype(np.float32),
        trans_std=np.load(d / "beatx_2_trans_std.npy").astype(np.float32),
    )


@dataclasses.dataclass(frozen=True)
class H3DStats:
    """Normalization stats for the 623-dim representation (shipped as
    mean_std/beatx_1-30_amass_h3d_{mean,std}.npy)."""

    mean: np.ndarray  # (623,)
    std: np.ndarray  # (623,)

    def normalize(self, x):
        return (x - self.mean) / self.std

    def denormalize(self, x):
        return x * self.std + self.mean


def load_h3d_stats(mean_std_dir: str | Path) -> H3DStats:
    d = Path(mean_std_dir)
    return H3DStats(
        mean=np.load(d / "beatx_1-30_amass_h3d_mean.npy").astype(np.float32),
        std=np.maximum(
            np.load(d / "beatx_1-30_amass_h3d_std.npy").astype(np.float32), 1e-6
        ),
    )


def identity_h3d_stats() -> H3DStats:
    return H3DStats(mean=np.zeros(623, np.float32), std=np.ones(623, np.float32))


def compute_pose_stats(pose_rot6d: np.ndarray, trans_v: np.ndarray) -> PoseStats:
    """Dataset mean/std of 330-d rot6d + translation velocity — produces
    the same artifacts as the shipped mean_std/beatx_2_330_*.npy
    (the reference computed these offline)."""
    return PoseStats(
        mean_full=pose_rot6d.reshape(-1, J.ROT6D_DIM).mean(0).astype(np.float32),
        std_full=np.maximum(
            pose_rot6d.reshape(-1, J.ROT6D_DIM).std(0), 1e-6
        ).astype(np.float32),
        trans_mean=trans_v.reshape(-1, 3).mean(0).astype(np.float32),
        trans_std=np.maximum(trans_v.reshape(-1, 3).std(0), 1e-6).astype(np.float32),
    )


def compute_h3d_stats(h3d_feats: np.ndarray) -> "H3DStats":
    """Dataset mean/std of the 623-d representation (the
    cal_mean_variance.ipynb step of process_h3d_*, README.md:166-176)."""
    flat = h3d_feats.reshape(-1, 623)
    return H3DStats(
        mean=flat.mean(0).astype(np.float32),
        std=np.maximum(flat.std(0), 1e-6).astype(np.float32),
    )


def compute_mean_joint_velocity(
    joints_per_clip: list[np.ndarray], fps: int = 30
) -> np.ndarray:
    """Per-joint mean speed over a dataset (beat_sep_lower.py:117-197,
    weights/mean_vel_smplxflame_30.npy) — normalizes BeatAlign velocities.

    Matches the reference's finite-difference scheme exactly: forward diff
    at the first frame, central diff in the middle, backward diff at the
    last — so every frame contributes one speed sample."""
    sums = np.zeros(55)
    count = 0
    for joints in joints_per_clip:  # (T, 55, 3)
        dt = 1.0 / fps
        init = (joints[1:2] - joints[0:1]) / dt
        mid = (joints[2:] - joints[:-2]) / (2 * dt)
        fin = (joints[-1:] - joints[-2:-1]) / dt
        vel = np.concatenate([init, mid, fin], axis=0)  # (T, 55, 3)
        speed = np.linalg.norm(vel, axis=2)
        sums += speed.sum(0)
        count += speed.shape[0]
    return (sums / max(count, 1)).astype(np.float32)


def compute_mean_velocity_from_clips(
    clips: list[dict], smplx_model, fps: int = 30, chunk: int = 512
) -> np.ndarray:
    """In-framework replacement for the reference's offline
    ``calculate_mean_velocity`` (beat_sep_lower.py:117-197): run the JAX
    SMPL-X joint FK over each cached clip's poses/betas/trans/expressions
    and average per-joint speeds. Returns the (55,) array the reference
    saves as ``weights/mean_vel_*.npy``."""
    import jax
    import jax.numpy as jnp

    from syntalker_tpu.ops.smplx import forward_joints

    fk = jax.jit(lambda p, b, t, e: forward_joints(smplx_model, p, b, t, e))
    joints_per_clip = []
    for c in clips:
        poses = np.asarray(c["poses"], np.float32)
        n = poses.shape[0]
        betas = np.tile(np.asarray(c["betas"], np.float32).reshape(1, -1), (n, 1))
        trans = np.asarray(c["trans"], np.float32)
        exps = np.asarray(c.get("facial"), np.float32) if c.get("facial") is not None else None
        outs = []
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            # pad the tail chunk so every call reuses one compiled shape
            pad = chunk - (e - s)
            sl = slice(s, e)
            p_, b_, t_ = (np.pad(a[sl], ((0, pad),) + ((0, 0),) * (a.ndim - 1)) for a in (poses, betas, trans))
            x_ = (
                np.pad(exps[sl, :100], ((0, pad), (0, 0)))
                if exps is not None and exps.shape[1] >= 100
                else None
            )
            j = np.asarray(fk(jnp.asarray(p_), jnp.asarray(b_), jnp.asarray(t_),
                              jnp.asarray(x_) if x_ is not None else None))
            outs.append(j[: e - s])
        joints_per_clip.append(np.concatenate(outs, axis=0))
    return compute_mean_joint_velocity(joints_per_clip, fps=fps)


def identity_pose_stats() -> PoseStats:
    """Unit stats for tests / unnormalized runs."""
    return PoseStats(
        mean_full=np.zeros(J.ROT6D_DIM, np.float32),
        std_full=np.ones(J.ROT6D_DIM, np.float32),
        trans_mean=np.zeros(3, np.float32),
        trans_std=np.ones(3, np.float32),
    )
