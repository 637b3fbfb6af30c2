"""MDM transformer denoiser over the concatenated body-part latent.

Capability parity with the reference ``models/denoiser.py`` (BEAT2 path) and
``models/denoiser_h3d.py`` (text-prompt path), unified and re-designed for
TPU:

- **Split conditioning from denoising.** The reference re-runs the raw-audio
  conv encoder + text embedding inside every one of the 1000/50 sampler NFE
  calls even though they do not depend on (x_t, t). Here
  :meth:`MDM.encode_cond` computes the fused per-frame conditioning once and
  :meth:`MDM.denoise` (the function inside the ``lax.scan`` sampler loop)
  consumes it — removing ~NFE× redundant conv work from the hot loop.
- feature-last layout, static shapes, no Python control flow under jit.
- BatchNorm in the audio encoder is replaced by GroupNorm: the reference
  needed SyncBatchNorm collectives under DDP (train.py:90); GroupNorm is
  batch-statistics-free so data parallelism needs no extra collectives and
  eval/train behavior match. (Weight-level parity with the torch checkpoint
  is impossible anyway — checkpoints are retrained.)

Architecture (denoiser.py:12-343): latent 512, 8 pre-LN blocks, 4 heads,
ff 1024, GELU, drop-path 0.1; NeoX-style RoPE applied once to the block
input sequence over 8 rotary sub-heads of dim 64 (denoiser.py:178-186);
x0-prediction output head.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

import functools

# torch-matching kernel init (nn.Linear / nn.Conv1d default,
# kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)), var = 1/(3 fan_in)).
# flax's lecun-normal default (var = 1/fan_in) inflates the 8-block
# residual stream ~3x at init; with the shipped grad-clip 0.99
# (configs/diffusion_rvqvae_128.yaml:108) that clips init grad-norms of
# ~5.2 down to 0.99 — a ~5x effective-LR starvation vs the reference
# (measured init grad-norm 0.9 in torch on the same data). Matching the
# init scale restores the reference's training dynamics.
_TORCH_KERNEL_INIT = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
_Dense = functools.partial(nn.Dense, kernel_init=_TORCH_KERNEL_INIT)
_Conv = functools.partial(nn.Conv, kernel_init=_TORCH_KERNEL_INIT)


@dataclasses.dataclass(frozen=True)
class MDMConfig:
    latent_total_dim: int = 1536  # 3 body parts x 512
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 4
    rope_heads: int = 8  # RoPE is applied over 8 sub-heads (denoiser.py:100,179)
    dropout: float = 0.1  # used as drop-path rate (denoiser.py:83)
    audio_feat_dim: int = 256  # args.audio_f
    word_feat_dim: int = 256  # args.word_f
    word_embed_dim: int = 300  # fasttext
    vocab_size: int = 11195  # args.word_index_num
    n_seed: int = 4  # args.pre_frames
    squeeze_scale: int = 4  # args.vqvae_squeeze_scale
    # train-time CFG dropout: prompt p=0.3, audio/word p=0 (reference
    # denoiser_h3d.py:58,62; the BEAT2 variant applies neither)
    cond_mask_prob: float = 0.3
    cond_mask_prob_audio: float = 0.0
    # text-prompt (h3d) extensions
    use_prompt: bool = False
    prompt_dim: int = 256  # TMR latent dim
    # MotionCLIP style conditioning (reference use_motionclip,
    # denoiser.py:103-104,172-174): a per-sample 512-d style embedding
    # concatenated to every frame and projected back to latent_dim. The
    # null condition is zeros (reference mask_cond zeroes the feature),
    # unlike the prompt path's learned null embedding.
    use_motionclip: bool = False
    style_dim: int = 512
    dtype: jnp.dtype = jnp.float32  # compute dtype for the blocks
    # compile the block stack as one lax.scan over stacked layer params —
    # ~num_layers× smaller HLO (and compile time) with identical math
    scan_blocks: bool = True
    # WavEncoder conv compute dtype. The strided-conv pyramid over 68k raw
    # samples dominates the diffusion train step (BASELINE.md: MFU 0.134,
    # conv-pipeline-bound); bf16 runs those convs at the MXU's native rate.
    # Params stay f32 and every GroupNorm/BatchNorm computes its statistics
    # in f32, so only the conv arithmetic is reduced-precision.
    audio_dtype: jnp.dtype = jnp.float32
    # pack pairs of output positions on the WavEncoder's 64-channel
    # stride-1 convs so they fill all 128 MXU output lanes (exact math,
    # same param tree — see _pair_packed_conv1d). MEASURED NEGATIVE
    # (round 4, docs/train_roofline_round4.md): bf16 b128 34.3→34.6 ms,
    # f32 b128 44.1→47.0 ms — XLA's conv lowering already fills the lanes
    # (it blocks output positions itself), so the +6.7% wedge FLOPs only
    # hurt. Kept off as an ablation instrument.
    audio_conv_pack: bool = False
    # wav-encoder normalization: 'group' (training default — stateless),
    # 'batch' (reference-exact BatchNorm; batch_stats collection threads
    # through TrainState.model_state, and GSPMD makes the statistics
    # global-batch under a data mesh = SyncBatchNorm for free), or 'none'
    # (converted reference checkpoints with BN folded into convs)
    audio_norm: str = "group"
    # rematerialize block activations in backward (jax.checkpoint): trades
    # ~30% more flops for O(1) activation memory across layers — enables
    # much larger batches per chip
    remat: bool = False


class Conditioning(struct.PyTreeNode):
    """Timestep-independent conditioning, computed once per sampler call."""

    at_feat: jax.Array  # (B, T_latent, 256) fused audio+word features
    seed_emb: jax.Array  # (B, latent_dim) seed-pose embedding
    prompt_feat: Optional[jax.Array] = None  # (B, prompt_dim) or None
    style_feat: Optional[jax.Array] = None  # (B, style_dim) MotionCLIP or None


def _group_norm(x: jax.Array, name: str) -> jax.Array:
    groups = min(32, x.shape[-1])
    while x.shape[-1] % groups:
        groups //= 2
    return nn.GroupNorm(num_groups=groups, name=name)(x)


class _ConvP(nn.Module):
    """Bare conv parameters with nn.Conv's exact names, shapes and inits —
    declared so :class:`AudioBasicBlock` can run two same-geometry convs as
    one fused conv while keeping the parameter tree (and its per-path init
    RNG, hence bitwise-identical initialization) unchanged."""

    kw: int
    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", _TORCH_KERNEL_INIT, (self.kw, self.cin, self.cout))
        b = self.param("bias", nn.initializers.zeros, (self.cout,))
        return k, b


def _pair_packed_conv1d(x, kernel, bias, *, dtype):
    """Exact stride-1 'same' conv1d with two adjacent output positions
    packed into one output row of 2·Cout channels.

    The WavEncoder's stride-1 convs are 64→64 channels, so each MXU issue
    fills only 64 of the 128 output lanes — the measured lane-fill bound on
    the conv pyramid that dominates the diffusion train step (BASELINE.md).
    Packing output positions (2m, 2m+1) into one row makes the conv
    (k+1)//2 taps × 2Cin → 2Cout (here 8×128→128: full lanes), at the cost
    of a zero wedge in the packed kernel (+1/k FLOPs ≈ 6.7%).

    Derivation: with xp = pad(x, (p, p)) and z[m] = (xp[2m], xp[2m+1]),
    y[2m]   = Σ_j xp[2m+j]·K[j]  = Σ_s z[m+s]·(K[2s], K[2s+1])
    y[2m+1] = Σ_j xp[2m+1+j]·K[j] = Σ_s z[m+s]·(K[2s-1], K[2s])
    with K[-1] = K[k] = 0 — i.e. one valid conv over z with the packed
    kernel Kp[s] = [[K[2s], K[2s-1]], [K[2s+1], K[2s]]]. Exact: every
    product is one of the original conv's products (zero wedges add
    nothing); only the f32 accumulation order differs. Parameters are the
    caller's plain (k, Cin, Cout) kernel — the packing is a trace-time
    rearrangement, so checkpoints and init are unchanged.
    """
    k, cin, cout = kernel.shape
    assert k % 2 == 1, "odd tap count required ('same' padding)"
    pad = (k - 1) // 2
    b, t, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad + (t % 2)), (0, 0)))
    z = xp.reshape(b, -1, 2 * cin)
    kz = jnp.zeros((1, cin, cout), kernel.dtype)
    kpad = jnp.concatenate([kernel, kz])  # K[j],   j = 0..k
    km1 = jnp.concatenate([kz, kernel])  # K[j-1], j = 0..k
    top = jnp.concatenate([kpad, km1], axis=-1)  # (k+1, Cin, 2Cout)
    kp = top.reshape((k + 1) // 2, 2 * cin, 2 * cout)
    y2 = jax.lax.conv_general_dilated(
        z.astype(dtype), kp.astype(dtype),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    y = y2.reshape(b, -1, cout)[:, :t]
    return y + bias.astype(dtype)


class AudioBasicBlock(nn.Module):
    """Residual conv block of the wav encoder (models/utils/layer.py:144-184).

    kernel 15; `pad` mirrors the torch `first_dilation` padding so the
    16 kHz -> 30 fps temporal arithmetic matches the reference exactly.

    norm: 'group' (our training default — no cross-replica sync needed) or
    'none' (for reference checkpoints converted with BatchNorm running
    stats folded into the conv weights, see syntalker_tpu.convert).

    TPU note: in the downsample configuration, ``conv1`` and ``down_conv``
    read the SAME input with identical kernel/stride/padding, and the
    encoder's channel widths (64/128) fill at most half of the MXU's 128
    output lanes — so the two convs execute as ONE conv with concatenated
    output channels, split before the (per-channel-parameterized) norms.
    Exact: no cross-terms exist between output channels, and the param
    tree/init is byte-identical to the two-conv form. The WavEncoder is
    ~80% of the diffusion train step's FLOPs (BASELINE.md), and its MFU is
    bounded by exactly this narrow-channel lane fill.
    """

    channels: int
    stride: int
    pad: int
    downsample: bool
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32
    # pack pairs of output positions on the stride-1 convs whose channel
    # count fills ≤ half the MXU's 128 output lanes (_pair_packed_conv1d).
    # Exact math, identical param tree; off switches back to plain convs.
    pack: bool = True

    def _conv_s1(self, x, name, train):
        """Stride-1 'same' k=15 conv — packed when lane-fill-bound.

        With ``norm='batch'`` the packed form is FORCED: XLA's lowering of
        the plain stride-1 conv followed by a train-mode BatchNorm is
        pathological on TPU — measured 528 ms vs 8.6 ms packed for the
        full WavEncoder forward at batch 128 (scripts/probe_bn4.py, round
        5; every other pack x norm cell is 5-9 ms). The packed conv is
        exact (zero-wedge kernel, no cross-terms) and its param tree is
        byte-identical, so this costs nothing and un-cliffs every shipped
        training config (they default to audio_norm='batch')."""
        if (self.pack or self.norm == "batch") and 2 * self.channels <= 128:
            k, b = _ConvP(15, x.shape[-1], self.channels, name=name)()
            return _pair_packed_conv1d(x.astype(self.dtype), k, b,
                                       dtype=self.dtype)
        return _Conv(
            self.channels, kernel_size=(15,), padding=((7, 7),),
            dtype=self.dtype, name=name,
        )(x)

    def _norm(self, x, name, train):
        # normalization statistics always in f32 (bf16 mean/var over 13k+
        # timesteps loses precision); the convs around it run in self.dtype
        x = x.astype(jnp.float32)
        if self.norm == "none":
            return x
        if self.norm == "batch":
            # reference-exact BatchNorm1d (torch momentum 0.1 -> flax 0.9).
            # Under jit over a data-sharded mesh the batch statistics are
            # the TRUE global-batch moments (XLA reduces across shards), so
            # this is the reference's SyncBatchNorm with zero extra code.
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name=name,
            )(x)
        return _group_norm(x, name)

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        if self.downsample:
            # fused conv1 ‖ down_conv (see class docstring)
            c = self.channels
            k1, b1 = _ConvP(15, x.shape[-1], c, name="conv1")()
            kd, bd = _ConvP(15, x.shape[-1], c, name="down_conv")()
            kk = jnp.concatenate([k1, kd], axis=-1).astype(self.dtype)
            bb = jnp.concatenate([b1, bd]).astype(self.dtype)
            out = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kk,
                window_strides=(self.stride,),
                padding=((self.pad, self.pad),),
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + bb
            h, sc = out[..., :c], out[..., c:]
            sc = self._norm(sc, "down_norm", train)
        elif self.stride == 1 and self.pad == 7:
            h = self._conv_s1(x, "conv1", train)
            sc = x.astype(jnp.float32)
        else:
            h = _Conv(
                self.channels,
                kernel_size=(15,),
                strides=(self.stride,),
                padding=((self.pad, self.pad),),
                dtype=self.dtype,
                name="conv1",
            )(x)
            sc = x.astype(jnp.float32)
        h = self._norm(h, "norm1", train)
        h = nn.leaky_relu(h, 0.01)
        h = self._conv_s1(h, "conv2", train)
        h = self._norm(h, "norm2", train)
        return nn.leaky_relu(h + sc, 0.01)


class WavEncoder(nn.Module):
    """Raw 16 kHz (amplitude, onset) channels -> 30 fps features.

    Stride/padding plan (denoiser.py:304-322): 5·6·1·6·1·3 with pads
    1700/0/7/0/7/0 maps 16000/30·F samples to exactly F frames.
    """

    out_dim: int = 256
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32
    pack: bool = True  # see AudioBasicBlock.pack

    @nn.compact
    def __call__(self, wav: jax.Array, *, train: bool = False) -> jax.Array:
        # wav: (B, S) mono or (B, S, 2) feature channels
        if wav.ndim == 2:
            wav = wav[..., None]
        d = self.out_dim
        plan = [
            (d // 4, 5, 1700, True),
            (d // 4, 6, 0, True),
            (d // 4, 1, 7, False),
            (d // 2, 6, 0, True),
            (d // 2, 1, 7, False),
            (d, 3, 0, True),
        ]
        h = wav
        for i, (c, s, p, down) in enumerate(plan):
            h = AudioBasicBlock(
                c, s, p, down, norm=self.norm, dtype=self.dtype,
                pack=self.pack, name=f"block_{i}",
            )(h, train=train)
        return h  # (B, F, out_dim)


def _sinusoidal_table(length: int, dim: int) -> jax.Array:
    """Transformer sin/cos table (denoiser.py:210-227), (length, dim)."""
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32) * (-jnp.log(10000.0) / dim))
    tab = jnp.zeros((length, dim))
    tab = tab.at[:, 0::2].set(jnp.sin(pos * div))
    tab = tab.at[:, 1::2].set(jnp.cos(pos * div))
    return tab


def rope_angles(n: int, dim: int) -> jax.Array:
    """NeoX-style rotary angles (n, dim): freqs duplicated across halves
    (denoiser.py:324-334)."""
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    freqs = jnp.arange(n, dtype=jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.concatenate([freqs, freqs], axis=-1)


def apply_rope(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Rotate (..., n, d) by half-split rotation (denoiser.py:336-343)."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * jnp.cos(angles) + rotated * jnp.sin(angles)


class TransformerBlock(nn.Module):
    """Pre-LN ViT block (models/timm_transformer/transformer.py:154-199):
    fused-qkv attention (no bias), GELU MLP, per-sample drop-path.

    The fused qkv kernel is stored head-aligned as (C, 3, H, head_dim)
    (``nn.DenseGeneral``) rather than the torch-style flat (C, 3C): under
    tensor parallelism the head axis shards cleanly over ``model`` so each
    device computes whole heads locally — the flat layout's contiguous
    3C shard cuts mid-k/v and forced GSPMD to all-gather the (B, T, 3C)
    qkv activation every block (measured: scripts/audit_tp_collectives.py).
    Numerics and init are bitwise-identical to the flat kernel (DenseGeneral
    inits on the flattened 2-D shape; C-order reshape preserves the
    part-major column order); legacy checkpoints migrate by reshape
    (:func:`migrate_qkv_kernels`)."""

    dim: int
    num_heads: int
    mlp_dim: int
    drop_path: float
    dtype: jnp.dtype = jnp.float32

    def _drop_path(self, x: jax.Array, train: bool) -> jax.Array:
        if not train or self.drop_path <= 0.0:
            return x
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask / keep

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        b, n, c = x.shape
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        qkv = nn.DenseGeneral(
            (3, self.num_heads, c // self.num_heads),
            use_bias=False,
            dtype=self.dtype,
            kernel_init=_TORCH_KERNEL_INIT,
            name="qkv",
        )(h)  # (B, N, 3, H, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = jnp.swapaxes(q, 1, 2)  # (B, H, N, D)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        scale = (c // self.num_heads) ** -0.5
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = jnp.swapaxes(out, 1, 2).reshape(b, n, c)
        out = _Dense(c, dtype=self.dtype, name="proj")(out)
        x = x + self._drop_path(out, train)

        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = _Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)  # exact erf GELU (torch nn.GELU)
        h = _Dense(c, dtype=self.dtype, name="fc2")(h)
        return x + self._drop_path(h, train)


class _TimestepMLP(nn.Module):
    """Sinusoidal table -> SiLU MLP (denoiser.py:231-245)."""

    latent_dim: int

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        table = _sinusoidal_table(5000, self.latent_dim)
        e = table[t]
        e = _Dense(self.latent_dim, name="fc1")(e)
        e = nn.silu(e)
        return _Dense(self.latent_dim, name="fc2")(e)


class _ScanBlockBody(nn.Module):
    """lax.scan body wrapper: (carry, None) -> (carry, None) around one
    TransformerBlock, so the stack compiles as a single scanned layer."""

    dim: int
    num_heads: int
    mlp_dim: int
    drop_path: float
    dtype: jnp.dtype = jnp.float32
    train: bool = False  # static field: nn.scan drops call-time kwargs

    @nn.compact
    def __call__(self, carry, _unused):
        out = TransformerBlock(
            self.dim, self.num_heads, self.mlp_dim, self.drop_path,
            dtype=self.dtype, name="block",
        )(carry, train=self.train)
        return out, None


class MDM(nn.Module):
    """x0-predicting denoiser over (B, T_latent, 1536) latents."""

    cfg: MDMConfig

    # ---- conditioning (timestep-independent) -----------------------------

    @nn.compact
    def encode_cond(
        self,
        audio: jax.Array,  # (B, S, 2) raw 16kHz onset+amplitude channels
        word: jax.Array,  # (B, F) int32 word ids per motion frame
        seed: jax.Array,  # (B, n_seed, 1536) seed latent frames
        *,
        prompt: Optional[jax.Array] = None,  # (B, prompt_dim) TMR embedding
        style: Optional[jax.Array] = None,  # (B, style_dim) MotionCLIP embed
        uncond_audio: bool | jax.Array = False,
        uncond_prompt: bool | jax.Array = False,
        uncond_style: bool | jax.Array = False,
        train: bool = False,
        cond_rng: Optional[jax.Array] = None,
    ) -> Conditioning:
        c = self.cfg
        audio_feat = WavEncoder(
            c.audio_feat_dim, norm=c.audio_norm, dtype=c.audio_dtype,
            pack=c.audio_conv_pack, name="wav_encoder",
        )(audio, train=train)

        word_table = self.param(
            "word_embedding",
            nn.initializers.normal(0.02),
            (c.vocab_size, c.word_embed_dim),
        )
        text_feat = word_table[word]  # (B, F, 300)
        text_feat = _Dense(c.word_feat_dim, name="text_encoder")(text_feat)

        b = audio_feat.shape[0]
        if train and c.cond_mask_prob_audio > 0 and cond_rng is not None:
            # train-time CFG dropout of the audio+word condition
            # (denoiser_h3d.py:128-145); one Bernoulli per sample.
            drop = jax.random.bernoulli(
                jax.random.fold_in(cond_rng, 0), c.cond_mask_prob_audio, (b, 1, 1)
            )
            audio_feat = audio_feat * (1.0 - drop)
            text_feat = text_feat * (1.0 - drop)
        mask_a = jnp.asarray(uncond_audio, jnp.float32).reshape(-1, 1, 1)
        audio_feat = audio_feat * (1.0 - mask_a)
        text_feat = text_feat * (1.0 - mask_a)

        # the conv arithmetic can overshoot the word-frame count by a frame
        # for off-spec lengths; align on the common prefix
        f_common = min(audio_feat.shape[1], text_feat.shape[1])
        at = jnp.concatenate(
            [audio_feat[:, :f_common], text_feat[:, :f_common]], axis=-1
        )
        at = _Dense(c.audio_feat_dim, name="mix_audio_text")(at)
        # average-pool to the latent frame rate (denoiser.py:157)
        f = at.shape[1] // c.squeeze_scale
        at = at[:, : f * c.squeeze_scale].reshape(b, f, c.squeeze_scale, -1).mean(2)

        seed_emb = _Dense(c.latent_dim, name="embed_seed")(seed.reshape(b, -1))

        prompt_feat = None
        if c.use_prompt:
            # learned unconditional prompt embedding (denoiser_h3d.py:59,
            # 116-122): the null condition is a trainable vector, not zeros
            null_prompt = self.param(
                "uncond_prompt_embedding", nn.initializers.zeros, (1, c.prompt_dim)
            )
            if prompt is None:
                prompt = jnp.tile(null_prompt, (b, 1))
            if train and c.cond_mask_prob > 0 and cond_rng is not None:
                dropp = jax.random.bernoulli(
                    jax.random.fold_in(cond_rng, 1), c.cond_mask_prob, (b, 1)
                )
                prompt = prompt * (1.0 - dropp) + null_prompt * dropp
            mask_p = jnp.asarray(uncond_prompt, jnp.float32).reshape(-1, 1)
            prompt_feat = prompt * (1.0 - mask_p) + null_prompt * mask_p

        style_feat = None
        if c.use_motionclip:
            # reference mask_cond (denoiser.py:109-118): train-time Bernoulli
            # dropout to zeros; force_mask (uncond_style) also zeros — the
            # MotionCLIP null condition is the zero vector.
            if style is None:
                style = jnp.zeros((b, c.style_dim))
            if train and c.cond_mask_prob > 0 and cond_rng is not None:
                drop_s = jax.random.bernoulli(
                    jax.random.fold_in(cond_rng, 2), c.cond_mask_prob, (b, 1)
                )
                style = style * (1.0 - drop_s)
            mask_s = jnp.asarray(uncond_style, jnp.float32).reshape(-1, 1)
            style_feat = style * (1.0 - mask_s)

        return Conditioning(
            at_feat=at, seed_emb=seed_emb, prompt_feat=prompt_feat,
            style_feat=style_feat,
        )

    # ---- timestep embedding (precomputable outside the NFE loop) ---------

    @nn.compact
    def embed_timesteps(self, t: jax.Array) -> jax.Array:
        """(N,) int timesteps -> (N, latent) embeddings. Timestep-only —
        samplers precompute this for their whole schedule once per window
        instead of inside every NFE step."""
        return _TimestepMLP(self.cfg.latent_dim, name="time_mlp")(t)

    # ---- denoising step (inside the sampler scan) ------------------------

    @nn.compact
    def denoise(
        self,
        x_t: jax.Array,  # (B, T, 1536) noisy latent
        t: jax.Array,  # (B,) int32 timesteps (original 0..999 indexing)
        cond: Conditioning,
        *,
        train: bool = False,
        t_emb: Optional[jax.Array] = None,  # (B, latent) precomputed
    ) -> jax.Array:
        c = self.cfg
        b, n, _ = x_t.shape

        if t_emb is None:
            t_emb = _TimestepMLP(c.latent_dim, name="time_mlp")(t)

        x_emb = _Dense(c.latent_dim, name="input_process")(x_t)  # (B, T, 512)
        style = (cond.seed_emb + t_emb)[:, None, :].repeat(n, axis=1)
        at = cond.at_feat[:, :n]
        xseq = jnp.concatenate([style, x_emb, at], axis=-1)
        xseq = _Dense(c.latent_dim, name="input_process2")(xseq)

        if c.use_prompt and cond.prompt_feat is not None:
            p = cond.prompt_feat[:, None, :].repeat(n, axis=1)
            xseq = jnp.concatenate([xseq, p], axis=-1)
            xseq = _Dense(c.latent_dim, name="input_process3")(xseq)

        if c.use_motionclip and cond.style_feat is not None:
            # reference input_process3 under use_motionclip (denoiser.py:
            # 103-104,172-174); named input_process_style here because our
            # input_process3 serves the h3d prompt path — both can coexist
            s = cond.style_feat[:, None, :].repeat(n, axis=1)
            xseq = jnp.concatenate([xseq, s], axis=-1)
            xseq = _Dense(c.latent_dim, name="input_process_style")(xseq)

        # RoPE over rope_heads sub-chunks of the embedding (denoiser.py:178-186).
        # Applied on (B, N, RH, hd) directly — the angle broadcast makes the
        # head transpose unnecessary (transposes are relayouts on TPU and
        # were a measurable cost inside the NFE loop).
        hd = c.latent_dim // c.rope_heads
        xh = xseq.reshape(b, n, c.rope_heads, hd)
        xh = apply_rope(xh, rope_angles(n, hd)[:, None, :])
        xseq = xh.reshape(b, n, c.latent_dim)

        xseq = self._blocks(xseq, train)

        return _Dense(c.latent_total_dim, name="output_process")(xseq)

    def _blocks(self, xseq: jax.Array, train: bool) -> jax.Array:
        """The bare transformer stack; shared scope ('blocks' / 'block_i')
        between :meth:`denoise` and :meth:`run_blocks`."""
        c = self.cfg
        xseq = xseq.astype(c.dtype)
        if c.scan_blocks:
            body = nn.remat(_ScanBlockBody) if c.remat else _ScanBlockBody
            ScannedBlock = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=c.num_layers,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )
            xseq, _ = ScannedBlock(
                c.latent_dim,
                c.num_heads,
                c.ff_size,
                drop_path=c.dropout,
                dtype=c.dtype,
                train=train,
                name="blocks",
            )(xseq, None)
        else:
            for i in range(c.num_layers):
                xseq = TransformerBlock(
                    c.latent_dim,
                    c.num_heads,
                    c.ff_size,
                    drop_path=c.dropout,
                    dtype=c.dtype,
                    name=f"block_{i}",
                )(xseq, train=train)
        return xseq.astype(jnp.float32)

    @nn.compact
    def run_blocks(self, xseq: jax.Array, *, train: bool = False) -> jax.Array:
        """Apply only the transformer stack to a prepared (B, T, latent)
        sequence. Used by the lean latency sampler
        (:func:`syntalker_tpu.generation.sample_windows_lean`), which
        precomputes every conditioning projection outside the NFE scan and
        needs just the blocks per step. Parameter paths are identical to
        :meth:`denoise` (same 'blocks' scope), so any checkpoint works."""
        return self._blocks(xseq, train)

    def __call__(
        self,
        x_t: jax.Array,
        t: jax.Array,
        audio: jax.Array,
        word: jax.Array,
        seed: jax.Array,
        *,
        prompt: Optional[jax.Array] = None,
        style: Optional[jax.Array] = None,
        uncond_audio: bool | jax.Array = False,
        uncond_prompt: bool | jax.Array = False,
        uncond_style: bool | jax.Array = False,
        train: bool = False,
        cond_rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Full forward = encode_cond + denoise (training / simple eval)."""
        cond = self.encode_cond(
            audio,
            word,
            seed,
            prompt=prompt,
            style=style,
            uncond_audio=uncond_audio,
            uncond_prompt=uncond_prompt,
            uncond_style=uncond_style,
            train=train,
            cond_rng=cond_rng,
        )
        return self.denoise(x_t, t, cond, train=train)


def mdm_variables(params_or_vars) -> dict:
    """Accept either a bare param tree or a full variables dict.

    With ``audio_norm='batch'`` the module carries a ``batch_stats``
    collection alongside ``params``; every apply site routes through this
    helper so both forms work everywhere."""
    if isinstance(params_or_vars, dict) and "params" in params_or_vars:
        return params_or_vars
    return {"params": params_or_vars}


def create_mdm(cfg: MDMConfig, rng: jax.Array, *, frames: int = 128):
    """Initialize (module, params-or-variables) with example shapes.

    Returns the bare param tree for stateless configs; for
    ``audio_norm='batch'`` returns the full variables dict (params +
    batch_stats) — downstream code handles both via :func:`mdm_variables`.
    """
    module = MDM(cfg)
    b = 1
    t_latent = frames // cfg.squeeze_scale
    samples = 16000 // 30 * frames
    params = module.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        jnp.zeros((b, t_latent, cfg.latent_total_dim)),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b, samples, 2)),
        jnp.zeros((b, frames), jnp.int32),
        jnp.zeros((b, cfg.n_seed, cfg.latent_total_dim)),
        prompt=jnp.zeros((b, cfg.prompt_dim)) if cfg.use_prompt else None,
        style=jnp.zeros((b, cfg.style_dim)) if cfg.use_motionclip else None,
    )
    if set(params.keys()) == {"params"}:
        params = params["params"]
    return module, params


def migrate_qkv_kernels(tree, num_heads: int):
    """Reshape legacy flat qkv kernels to the head-aligned layout in place.

    Pre-round-3 checkpoints store the fused attention kernel flat —
    ``(C, 3C)`` unrolled or ``(L, C, 3C)`` scan-stacked. The head-aligned
    layout is the same memory in C-order, so migration is a pure reshape to
    ``(..., C, 3, H, C // H)``; the contraction (and therefore every
    checkpointed model's numerics) is unchanged. Already-migrated trees pass
    through untouched, so load paths can call this unconditionally.
    """

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k == "qkv" and isinstance(v, dict) and "kernel" in v:
                kern = v["kernel"]
                if kern.ndim in (2, 3) and kern.shape[-1] == 3 * kern.shape[-2]:
                    c = kern.shape[-2]
                    new_shape = kern.shape[:-1] + (3, num_heads, c // num_heads)
                    v = dict(v, kernel=kern.reshape(new_shape))
            out[k] = walk(v) if isinstance(v, dict) else v
        return out

    return walk(tree)


def apply_word_embedding(params: dict, matrix) -> dict:
    """Overwrite the ``word_embedding`` table with a pretrained matrix.

    One-step ingestion of the reference's fasttext vocab matrix
    (``vocab.pkl``'s ``word_embedding_weights``, build_vocab.py:135-198 —
    the reference loads it inside MDM.__init__, denoiser.py:64-66) into an
    initialized param tree; the table stays trainable afterwards
    (``freeze_wordembed: False`` in the shipped config). Raises on shape
    mismatch so a stale vocab fails loudly.
    """
    m = jnp.asarray(matrix, jnp.float32)
    cur = params["word_embedding"]
    if m.shape != cur.shape:
        raise ValueError(
            f"vocab embedding {m.shape} != model word_embedding {cur.shape}; "
            f"init the MDM with vocab_size={m.shape[0]}, "
            f"word_embed_dim={m.shape[1]}"
        )
    out = dict(params)
    out["word_embedding"] = m
    return out
