"""AMASS motion loading + BEATX/AMASS mixture sampling.

Capability parity with ``dataloaders/mix_sep.py:149-171`` (Z-up -> Y-up
re-orientation, betas padded to 300, zero expressions) and the
``train_h3d.py:46-87`` WeightedRandomSampler mixture (amass:beat ≈ 0.5).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterator

import numpy as np

from syntalker_tpu.ops import rotations as rot

# Blender Z-up -> Y-up basis changes (mix_sep.py:157-163)
_ROT_YUP = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, -1.0, 0.0]], np.float32)
_TRANS_YUP = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]], np.float32)


def load_amass_npz(path: str | Path) -> Dict[str, np.ndarray]:
    """AMASS SMPL-X npz -> BEAT-compatible dict (poses 165, trans 3,
    betas 300, expressions 100)."""
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=True)
    poses = np.asarray(data["poses"], np.float32)
    if poses.shape[1] > 165:
        poses = poses[:, :165]
    elif poses.shape[1] < 165:
        poses = np.pad(poses, ((0, 0), (0, 165 - poses.shape[1])))
    n = poses.shape[0]

    # re-orient the global rotation Z-up -> Y-up
    root_m = np.asarray(rot.axis_angle_to_matrix(jnp.asarray(poses[:, :3])))
    root_m = np.einsum("ij,kjl->kil", _ROT_YUP, root_m)
    poses[:, :3] = np.asarray(rot.matrix_to_axis_angle(jnp.asarray(root_m)))

    trans = np.einsum("bi,ij->bj", np.asarray(data["trans"], np.float32), _TRANS_YUP)

    betas = np.zeros(300, np.float32)
    src_betas = np.asarray(data["betas"], np.float32).reshape(-1)
    betas[: min(16, len(src_betas))] = src_betas[:16]

    return {
        "poses": poses,
        "trans": trans.astype(np.float32),
        "betas": betas,
        "expressions": np.zeros((n, 100), np.float32),
    }


class WeightedMixtureLoader:
    """Sample batches from several caches with per-source weights
    (train_h3d.py:46-87 WeightedRandomSampler equivalent, deterministic)."""

    def __init__(self, loaders: Dict[str, object], weights: Dict[str, float], seed: int = 0):
        assert set(loaders) == set(weights)
        self.loaders = loaders
        names = sorted(loaders)
        w = np.asarray([weights[n] for n in names], np.float64)
        self.names = names
        self.p = w / w.sum()
        self.seed = seed

    def epoch(self, epoch: int, steps: int) -> Iterator:
        rng = np.random.default_rng(self.seed + epoch)
        iters = {n: iter(self.loaders[n].epoch(epoch)) for n in self.names}
        for _ in range(steps):
            name = self.names[rng.choice(len(self.names), p=self.p)]
            try:
                yield name, next(iters[name])
            except StopIteration:
                iters[name] = iter(self.loaders[name].epoch(epoch + 1))
                yield name, next(iters[name])
