"""MotionCLIP: motion encoder aligned to a CLIP text/image space.

Capability parity with ``models/motionclip.py`` (Encoder_TRANSFORMER :26,
MOTIONCLIP :195, get_model :245): an ACTOR-style transformer that embeds
22-joint rot6d body motion into a 512-d CLIP-aligned space. The reference
gates it behind ``use_motionclip`` (default False, utils/config.py:58) and
concatenates the style embedding per frame in the denoiser
(denoiser.py:103-104,172-174) — our MDM mirrors this via
``MDMConfig(use_motionclip=True)``: the (B, 512) embedding from this
encoder feeds ``style=`` on train/encode_cond/sample_windows, with
zero-vector null conditioning and CFG-style train dropout.

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


class MotionCLIPDecoder(nn.Module):
    """CLIP-space latent -> motion (Decoder_TRANSFORMER, motionclip.py:96-193).

    ACTOR-style: learned per-frame time queries cross-attend to the single
    latent token through pre-LN blocks; a final projection emits rot6d
    frames. Static ``num_frames`` keeps the XLA program shape-stable."""

    cfg: MotionCLIPConfig = MotionCLIPConfig()
    num_frames: int = 60

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        """(B, clip_dim) -> (B, num_frames, input_feats)."""
        c = self.cfg
        b = z.shape[0]
        queries = self.param(
            "time_queries",
            nn.initializers.normal(0.02),
            (self.num_frames, c.latent_dim),
        )
        h = jnp.tile(queries[None], (b, 1, 1))
        zt = nn.Dense(c.latent_dim, name="latent_in")(z)[:, None, :]  # (B, 1, D)
        for i in range(c.num_layers // 2):
            q = nn.LayerNorm(name=f"ln_q{i}")(h)
            attn = nn.MultiHeadDotProductAttention(
                num_heads=c.num_heads, name=f"cross{i}"
            )(q, zt, zt)
            h = h + attn
            f = nn.LayerNorm(name=f"ln_f{i}")(h)
            f = nn.Dense(c.ff_size, name=f"fc1_{i}")(f)
            f = nn.gelu(f)
            f = nn.Dense(c.latent_dim, name=f"fc2_{i}")(f)
            h = h + f
        return nn.Dense(c.input_feats, name="out")(h)


def make_motionclip_train_step(encoder: MotionCLIP, decoder: MotionCLIPDecoder,
                               optimizer, lambdas=None):
    """Joint encode/decode training (MOTIONCLIP.forward + compute_loss,
    motionclip.py:195-236): rot6d reconstruction + velocity + cosine
    alignment to frozen CLIP text features, weighted by ``lambdas``."""
    import optax

    lambdas = lambdas or {"rc": 1.0, "vel": 1.0, "clip": 1.0}

    def step(params, opt_state, batch):
        def loss_fn(p):
            emb = encoder.apply({"params": p["enc"]}, batch["motion"])
            rec = decoder.apply({"params": p["dec"]}, emb)
            rc = jnp.mean((rec - batch["motion"]) ** 2)
            vel = jnp.mean(
                (jnp.diff(rec, axis=1) - jnp.diff(batch["motion"], axis=1)) ** 2
            )
            clip_l = clip_alignment_loss(emb, batch["clip_emb"])
            loss = lambdas["rc"] * rc + lambdas["vel"] * vel + lambdas["clip"] * clip_l
            return loss, {"rc": rc, "vel": vel, "clip": clip_l}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["loss"] = loss
        return params, opt_state, metrics

    return step
