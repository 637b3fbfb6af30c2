"""MotionCLIP: motion encoder aligned to a CLIP text/image space.

Capability parity with ``models/motionclip.py`` (Encoder_TRANSFORMER :26,
MOTIONCLIP :195, get_model :245): an ACTOR-style transformer that embeds
22-joint rot6d body motion into a 512-d CLIP-aligned space. The reference
gates it behind ``use_motionclip`` (default False, utils/config.py:58) and
concatenates the style embedding per frame in the denoiser
(denoiser.py:103-104,172-174) — the same plumbing our MDM exposes via
``use_prompt``/``prompt_dim=512``.

The CLIP text tower is an external frozen artifact; training aligns motion
embeddings to precomputed CLIP text features by cosine loss.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from syntalker_tpu.models.tmr import ActorAgnosticEncoder, TMRConfig


@dataclasses.dataclass(frozen=True)
class MotionCLIPConfig:
    clip_dim: int = 512
    latent_dim: int = 256
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 4
    input_feats: int = 22 * 6  # body joints rot6d (denoiser.py:302)


class MotionCLIP(nn.Module):
    cfg: MotionCLIPConfig = MotionCLIPConfig()

    def setup(self):
        tcfg = TMRConfig(
            latent_dim=self.cfg.latent_dim,
            ff_size=self.cfg.ff_size,
            num_layers=self.cfg.num_layers,
            num_heads=self.cfg.num_heads,
        )
        self.encoder = ActorAgnosticEncoder(tcfg, input_dim=self.cfg.input_feats)
        self.proj = nn.Dense(self.cfg.clip_dim)

    def __call__(self, motion: jax.Array, mask=None) -> jax.Array:
        """(B, T, 132) rot6d body motion -> (B, 512) CLIP-space embedding
        (the `mu` the reference uses, diffusion_rvqvae_trainer.py:308)."""
        mu, _ = self.encoder(motion, mask)
        return self.proj(mu)


def clip_alignment_loss(motion_emb: jax.Array, clip_emb: jax.Array) -> jax.Array:
    """1 − cosine similarity against frozen CLIP features."""
    m = motion_emb / jnp.linalg.norm(motion_emb, axis=-1, keepdims=True)
    c = clip_emb / jnp.linalg.norm(clip_emb, axis=-1, keepdims=True)
    return jnp.mean(1.0 - jnp.sum(m * c, axis=-1))
