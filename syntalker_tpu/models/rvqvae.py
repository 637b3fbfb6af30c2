"""Body-part RVQ-VAE: dilated 1D-conv encoder/decoder + residual EMA codebooks.

Capability parity with the reference ``models/vq/model.py`` /
``models/vq/encdec.py`` / ``models/vq/resnet.py``, re-designed for TPU:

- feature-last ``(B, T, C)`` layout so XLA lowers the convs onto the MXU
  without transposes,
- the quantizer is the functional module in
  :mod:`syntalker_tpu.ops.quantize` — its EMA state travels in the train
  state, not in module buffers,
- strided/dilated convs use explicit static paddings equal to the torch
  arithmetic so temporal shapes match the reference exactly (T -> T/4 with
  ``down_t=2``).

Hyperparameters of the shipped config (diffusion_rvqvae_trainer.py:89-103):
width 512, depth 3, dilation growth 3, down_t 2, stride 2, 512 codes x 512
dims x 6 quantizers, relu, no norm.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from syntalker_tpu.ops.quantize import (
    RVQConfig,
    RVQOutput,
    RVQState,
    init_rvq_state,
    rvq_dequantize,
    rvq_encode,
    rvq_forward,
    rvq_quantize_eval,
)


@dataclasses.dataclass(frozen=True)
class RVQVAEConfig:
    input_dim: int  # 78 upper / 180 hands / 57 lower+trans
    width: int = 512
    output_emb_width: int = 512
    down_t: int = 2
    stride_t: int = 2
    depth: int = 3
    dilation_growth_rate: int = 3
    dropout_rate: float = 0.2
    quantizer: RVQConfig = dataclasses.field(default_factory=RVQConfig)

    @property
    def temporal_scale(self) -> int:
        return self.stride_t**self.down_t  # 4 with the shipped config


class ResConv1DBlock(nn.Module):
    """Dilated residual conv block (models/vq/resnet.py:11-74), norm=None."""

    channels: int
    dilation: int
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        h = nn.relu(x)
        h = nn.Conv(
            self.channels,
            kernel_size=(3,),
            kernel_dilation=(self.dilation,),
            padding=((self.dilation, self.dilation),),
            name="conv_dilated",
        )(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, kernel_size=(1,), name="conv_proj")(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        return x + h


class Resnet1D(nn.Module):
    """Stack of dilated residual blocks; decoder reverses dilation order."""

    channels: int
    depth: int
    dilation_growth_rate: int
    reverse_dilation: bool = False
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        dilations = [self.dilation_growth_rate**d for d in range(self.depth)]
        if self.reverse_dilation:
            dilations = dilations[::-1]
        for i, dil in enumerate(dilations):
            x = ResConv1DBlock(
                self.channels, dil, self.dropout_rate, name=f"block_{i}"
            )(x, train=train)
        return x


class ConvEncoder(nn.Module):
    """T -> T / stride_t**down_t temporal compressor (encdec.py:5-34)."""

    cfg: RVQVAEConfig

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        c = self.cfg
        h = nn.Conv(c.width, kernel_size=(3,), padding="SAME", name="stem")(x)
        h = nn.relu(h)
        for i in range(c.down_t):
            # torch Conv1d(k=2*stride, s=stride, p=stride//2): halves T.
            h = nn.Conv(
                c.width,
                kernel_size=(2 * c.stride_t,),
                strides=(c.stride_t,),
                padding=((c.stride_t // 2, c.stride_t // 2),),
                name=f"down_{i}",
            )(h)
            # NB: the reference's Resnet1D defaults to reverse_dilation=True
            # (resnet.py:77), so encoder blocks run dilations [9, 3, 1] too
            h = Resnet1D(
                c.width,
                c.depth,
                c.dilation_growth_rate,
                reverse_dilation=True,
                dropout_rate=c.dropout_rate,
                name=f"res_{i}",
            )(h, train=train)
        h = nn.Conv(c.output_emb_width, kernel_size=(3,), padding="SAME", name="head")(h)
        return h


class ConvDecoder(nn.Module):
    """Latent -> pose features with nearest-neighbor x2 upsampling
    (encdec.py:37-68)."""

    cfg: RVQVAEConfig

    @nn.compact
    def __call__(self, z: jax.Array, *, train: bool = False) -> jax.Array:
        c = self.cfg
        h = nn.Conv(c.width, kernel_size=(3,), padding="SAME", name="stem")(z)
        h = nn.relu(h)
        for i in range(c.down_t):
            h = Resnet1D(
                c.width,
                c.depth,
                c.dilation_growth_rate,
                reverse_dilation=True,
                dropout_rate=c.dropout_rate,
                name=f"res_{i}",
            )(h, train=train)
            # nearest x2 upsample: repeat along T
            h = jnp.repeat(h, c.stride_t, axis=-2)
            h = nn.Conv(c.width, kernel_size=(3,), padding="SAME", name=f"up_{i}")(h)
        h = nn.Conv(c.width, kernel_size=(3,), padding="SAME", name="mid")(h)
        h = nn.relu(h)
        h = nn.Conv(c.input_dim, kernel_size=(3,), padding="SAME", name="head")(h)
        return h


class RVQVAE(nn.Module):
    """Encoder + residual quantizer + decoder for one body part.

    The quantizer state (EMA codebooks) is passed in/out explicitly; linen
    params hold only the conv weights. All entry points mirror the
    reference surface (models/vq/model.py):

    - ``__call__``   <-> ``forward`` (train path: ST quantize + decode)
    - ``encode``     <-> ``encode`` (tokens)
    - ``decode_indices`` <-> ``forward_decoder``
    - ``map2latent`` <-> ``map2latent`` (pre-quantization latent)
    - ``latent2origin`` <-> ``latent2origin`` (snap + decode)
    """

    cfg: RVQVAEConfig

    def setup(self):
        self.encoder = ConvEncoder(self.cfg)
        self.decoder = ConvDecoder(self.cfg)

    def __call__(
        self,
        x: jax.Array,
        state: RVQState,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, RVQOutput]:
        z = self.encoder(x, train=train)
        out = rvq_forward(z, state, self.cfg.quantizer, train=train, rng=rng)
        rec = self.decoder(out.quantized, train=train)
        return rec, out

    def encode(self, x: jax.Array, state: RVQState) -> jax.Array:
        z = self.encoder(x, train=False)
        return rvq_encode(z, state, self.cfg.quantizer)

    def decode_indices(self, indices: jax.Array, state: RVQState) -> jax.Array:
        z = rvq_dequantize(indices, state, self.cfg.quantizer)
        return self.decoder(z, train=False)

    def map2latent(self, x: jax.Array) -> jax.Array:
        """(B, T, input_dim) -> (B, T/4, 512) continuous pre-VQ latent."""
        return self.encoder(x, train=False)

    def latent2origin(self, z: jax.Array, state: RVQState) -> jax.Array:
        """Continuous latent -> snapped -> decoded pose features."""
        zq, _ = rvq_quantize_eval(z, state, self.cfg.quantizer)
        return self.decoder(zq, train=False)


def create_rvqvae(cfg: RVQVAEConfig, rng: jax.Array, example_len: int = 64):
    """Initialize (module, params, quantizer state) for one body part."""
    module = RVQVAE(cfg)
    x = jnp.zeros((1, example_len, cfg.input_dim), jnp.float32)
    state = init_rvq_state(cfg.quantizer)
    params = module.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        x,
        state,
        train=False,
    )["params"]
    return module, params, state
