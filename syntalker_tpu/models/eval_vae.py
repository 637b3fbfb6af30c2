"""Evaluation / auxiliary autoencoders: FGD featurizer + face VQ-VAE.

Capability parity with ``models/motion_representation.py`` /
``models/motion_encoder.py``:

- :class:`VAESKConv` — the skeleton-conv VAE whose ``map2latent`` embedding
  defines the FGD metric (LocalEncoder over the SMPL-X edge graph +
  VQDecoderV3; motion_representation.py:67-95, eval config: 330-dim rot6d,
  4 layers, growth [1,1,2,1], latent 240),
- :class:`VQVAEConvZero` — the stride-1 face VQ-VAE (jaw rot6d +
  expressions, 106-dim, 2 layers, 256 codes; motion_representation.py:178),
- the conv encoder/decoder zoo pieces those need (VQEncoderV3/V5,
  VQDecoderV3/V5, ResBlock) and the legacy β-commit quantizer
  (models/quantizer.py:6-78).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from syntalker_tpu.models.skeleton import (
    SkeletonResidual,
    build_edge_topology,
    find_neighbor,
    pooling_matrix,
    skeleton_pooling_plan,
)
from syntalker_tpu.ops.smplx import PARENTS


@dataclasses.dataclass(frozen=True)
class EvalVAEConfig:
    input_dim: int = 330  # vae_test_dim
    latent_dim: int = 240  # vae_length
    num_layers: int = 4  # vae_layer
    growth: Tuple[int, ...] = (1, 1, 2, 1)  # vae_grow
    channel_base: int = 6
    kernel_size: int = 4
    skeleton_dist: int = 2
    window: int = 32  # vae_test_len


class ResBlock(nn.Module):
    """Conv-LeakyReLU-Conv residual (models/utils/layer.py:203-216)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels, (3,), padding=((1, 1),), name="conv1")(x)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.channels, (3,), padding=((1, 1),), name="conv2")(h)
        return x + h


class VQEncoderV3(nn.Module):
    """Strided conv encoder, T -> T / 2**layers (motion_encoder.py:65-94)."""

    channels: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = nn.Conv(self.channels, (4,), strides=(2,), padding=((1, 1),), name=f"down_{i}")(x)
            x = nn.leaky_relu(x, 0.2)
            x = ResBlock(self.channels, name=f"res_{i}")(x)
        return x


class VQEncoderV5(nn.Module):
    """Stride-1 variant (motion_encoder.py:159-189) — used by the face VQVAE."""

    channels: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = nn.Conv(self.channels, (3,), padding=((1, 1),), name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, 0.2)
            x = ResBlock(self.channels, name=f"res_{i}")(x)
        return x


class VQDecoderV3(nn.Module):
    """Upsampling decoder, T -> T * 2**layers (motion_encoder.py:299-327)."""

    out_dim: int
    channels: int
    num_layers: int

    @nn.compact
    def __call__(self, z):
        if z.shape[-1] != self.channels:
            z = nn.Conv(self.channels, (3,), padding=((1, 1),), name="proj")(z)
        for i in range(2):
            z = ResBlock(self.channels, name=f"res_{i}")(z)
        for i in range(self.num_layers):
            z = jnp.repeat(z, 2, axis=-2)  # nearest x2
            out_c = self.out_dim if i == self.num_layers - 1 else self.channels
            z = nn.Conv(out_c, (3,), padding=((1, 1),), name=f"up_{i}")(z)
            z = nn.leaky_relu(z, 0.2)
        return nn.Conv(self.out_dim, (3,), padding=((1, 1),), name="head")(z)


class VQDecoderV5(nn.Module):
    """Stride-1 decoder with one final ×1 stage (motion_encoder.py:227-257)."""

    out_dim: int
    channels: int
    num_layers: int

    @nn.compact
    def __call__(self, z):
        if z.shape[-1] != self.channels:
            z = nn.Conv(self.channels, (3,), padding=((1, 1),), name="proj")(z)
        for i in range(2):
            z = ResBlock(self.channels, name=f"res_{i}")(z)
        for i in range(self.num_layers):
            out_c = self.out_dim if i == self.num_layers - 1 else self.channels
            z = nn.Conv(out_c, (3,), padding=((1, 1),), name=f"conv_{i}")(z)
            z = nn.leaky_relu(z, 0.2)
        return nn.Conv(self.out_dim, (3,), padding=((1, 1),), name="head")(z)


class LocalEncoder(nn.Module):
    """Skeleton-conv encoder over the SMPL-X edge graph
    (motion_encoder.py:698-789). T -> T / 2**layers, 330 -> 240 channels."""

    cfg: EvalVAEConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        edges = build_edge_topology(PARENTS.tolist())
        channel_base = [c.channel_base]
        for g in c.growth:
            channel_base.append(channel_base[-1] * g)

        topologies = [edges]
        for i in range(c.num_layers):
            topo = topologies[i]
            neigh = find_neighbor(topo, c.skeleton_dist)
            in_pj = channel_base[i]
            out_pj = channel_base[i + 1]
            last = i == c.num_layers - 1
            plan = skeleton_pooling_plan(topo, last_pool=last)
            pw = pooling_matrix(plan, out_pj, len(topo))
            x = SkeletonResidual(
                tuple(tuple(n) for n in neigh),
                in_pj,
                out_pj,
                c.kernel_size,
                tuple(map(tuple, pw.tolist())),
                name=f"layer_{i}",
            )(x)
            topologies.append(plan.new_edges)
        return x


def legacy_vq(z: jax.Array, codebook: jax.Array, beta: float = 0.25):
    """Plain argmin VQ with β-commit loss (models/quantizer.py:17-46).

    Returns (loss, z_q straight-through, indices, perplexity)."""
    d = z.shape[-1]
    flat = z.reshape(-1, d)
    dist = (
        jnp.sum(flat**2, axis=1, keepdims=True)
        + jnp.sum(codebook**2, axis=1)
        - 2.0 * flat @ codebook.T
    )
    idx = jnp.argmin(dist, axis=1)
    z_q = codebook[idx].reshape(z.shape)
    loss = jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2) + beta * jnp.mean(
        (jax.lax.stop_gradient(z_q) - z) ** 2
    )
    z_st = z + jax.lax.stop_gradient(z_q - z)
    onehot = jax.nn.one_hot(idx, codebook.shape[0])
    e_mean = onehot.mean(axis=0)
    perplexity = jnp.exp(-jnp.sum(e_mean * jnp.log(e_mean + 1e-10)))
    return loss, z_st, idx.reshape(z.shape[:-1]), perplexity


class VAESKConv(nn.Module):
    """FGD eval model: skeleton encoder + conv decoder
    (motion_representation.py:67-75). ``map2latent`` is the FGD embedding
    (VAEConv.map2latent:55-61, used at diffusion_rvqvae_trainer.py:618)."""

    cfg: EvalVAEConfig = EvalVAEConfig()

    def setup(self):
        self.encoder = LocalEncoder(self.cfg)
        self.decoder = VQDecoderV3(self.cfg.input_dim, self.cfg.latent_dim, self.cfg.num_layers)

    def __call__(self, x):
        z = self.encoder(x)
        return {"poses_feat": z, "rec_pose": self.decoder(z)}

    def map2latent(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)


class VQVAEConvZero(nn.Module):
    """Face VQ-VAE: stride-1 convs, 256-code argmin VQ
    (motion_representation.py:178-211). Used to embed jaw+expression; the
    face is copied from GT at generation time (trainer :526)."""

    input_dim: int = 106  # jaw rot6d (6) + expressions (100)
    latent_dim: int = 256  # vae_length (face override, trainer :66)
    num_layers: int = 2  # vae_layer (face override, trainer :65)
    codebook_size: int = 256
    beta: float = 0.25

    def setup(self):
        self.encoder = VQEncoderV5(self.latent_dim, self.num_layers)
        self.decoder = VQDecoderV5(self.input_dim, self.latent_dim, self.num_layers)
        self.codebook = self.param(
            "codebook",
            nn.initializers.uniform(scale=2.0 / self.codebook_size),
            (self.codebook_size, self.latent_dim),
        )

    def __call__(self, x):
        z = self.encoder(x)
        loss, z_q, idx, perp = legacy_vq(z, self.codebook, self.beta)
        return {
            "rec_pose": self.decoder(z_q),
            "embedding_loss": loss,
            "perplexity": perp,
            "poses_feat": z_q,
        }

    def map2index(self, x):
        z = self.encoder(x)
        flat = z.reshape(-1, z.shape[-1])
        dist = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            + jnp.sum(self.codebook**2, axis=1)
            - 2.0 * flat @ self.codebook.T
        )
        return jnp.argmin(dist, axis=1).reshape(z.shape[:-1])

    def map2latent(self, x):
        idx = self.map2index(x)
        return self.codebook[idx]

    def decode_indices(self, idx):
        return self.decoder(self.codebook[idx])
