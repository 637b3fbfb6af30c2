"""torch → JAX checkpoint conversion for reference-trained artifacts.

Users of the reference stack hold torch checkpoints (body-part RVQ-VAEs
`net_300000.pth`, denoiser `last_500.bin`, eval VAE, face VQVAE). This
module maps them into this framework's parameter trees so existing
checkpoints keep working (SURVEY.md §7: treat pretrained torch artifacts as
frozen oracles).

Exactly convertible (verified against the reference run as a torch oracle,
tests/test_convert.py):
- RVQVAE conv encoder/decoder + residual EMA codebooks
  (:func:`convert_rvqvae`) — tokens and decode outputs match,
- the MDM denoiser (:func:`convert_mdm`) — the audio encoder's eval-mode
  BatchNorm is an affine map per channel and is folded into the conv
  weights (build the target with ``MDMConfig(audio_norm='none')``); the
  full forward matches to <5e-3 relative error,
- the FGD eval VAE (:func:`convert_eval_vae`) and the legacy face VQVAE
  (:func:`convert_face_vqvae`), so FGD / face metrics computed here are
  numerically comparable to the reference's (its ``weights/*.bin``
  checkpoints load via :func:`load_torch_eval_checkpoint`).

Layout rules: torch Conv1d (out, in, k) → flax (k, in, out);
torch Linear (out, in) → flax (in, out); embeddings map directly.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from syntalker_tpu.ops.quantize import RVQState


def _conv(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))


def _linear(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (1, 0)))


def _np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def convert_rvqvae(
    state_dict: Dict, *, down_t: int = 2, depth: int = 3, num_quantizers: int = 6
) -> Tuple[Dict, RVQState]:
    """Reference RVQVAE state_dict -> (flax params, RVQState).

    Mirrors the module graphs of models/vq/encdec.py (Sequential index
    layout: encoder [0]=stem, [2+i]=down block (conv + resnet), [-1]=head;
    decoder [0]=stem, [2+i]=res+up block, [-3]=mid, [-1]=head) and
    models/vq/quantizer.py EMA buffers.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    params: Dict = {"encoder": {}, "decoder": {}}

    def res_block(prefix: str) -> Dict:
        # ResConv1DBlock: conv1 (dilated k3), conv2 (k1)
        return {
            "conv_dilated": {
                "kernel": _conv(sd[f"{prefix}.conv1.weight"]),
                "bias": sd[f"{prefix}.conv1.bias"],
            },
            "conv_proj": {
                "kernel": _conv(sd[f"{prefix}.conv2.weight"]),
                "bias": sd[f"{prefix}.conv2.bias"],
            },
        }

    def resnet(prefix: str) -> Dict:
        return {
            f"block_{d}": res_block(f"{prefix}.model.{d}")
            for d in range(depth)
        }

    # --- encoder: model.0 stem conv, model.{2+i} = Sequential(conv, Resnet1D),
    # model.{2+down_t} head conv (encdec.py:18-31)
    enc = params["encoder"]
    enc["stem"] = {
        "kernel": _conv(sd["encoder.model.0.weight"]),
        "bias": sd["encoder.model.0.bias"],
    }
    for i in range(down_t):
        base = f"encoder.model.{2 + i}"
        enc[f"down_{i}"] = {
            "kernel": _conv(sd[f"{base}.0.weight"]),
            "bias": sd[f"{base}.0.bias"],
        }
        enc[f"res_{i}"] = resnet(f"{base}.1")
    head_idx = 2 + down_t
    enc["head"] = {
        "kernel": _conv(sd[f"encoder.model.{head_idx}.weight"]),
        "bias": sd[f"encoder.model.{head_idx}.bias"],
    }

    # --- decoder: model.0 stem, model.{2+i} = Sequential(Resnet1D, Upsample,
    # conv), model.{2+down_t} mid conv, model.{4+down_t} head (encdec.py:50-63)
    dec = params["decoder"]
    dec["stem"] = {
        "kernel": _conv(sd["decoder.model.0.weight"]),
        "bias": sd["decoder.model.0.bias"],
    }
    for i in range(down_t):
        base = f"decoder.model.{2 + i}"
        dec[f"res_{i}"] = resnet(f"{base}.0")
        dec[f"up_{i}"] = {
            "kernel": _conv(sd[f"{base}.2.weight"]),
            "bias": sd[f"{base}.2.bias"],
        }
    mid_idx = 2 + down_t
    dec["mid"] = {
        "kernel": _conv(sd[f"decoder.model.{mid_idx}.weight"]),
        "bias": sd[f"decoder.model.{mid_idx}.bias"],
    }
    dec["head"] = {
        "kernel": _conv(sd[f"decoder.model.{mid_idx + 2}.weight"]),
        "bias": sd[f"decoder.model.{mid_idx + 2}.bias"],
    }

    # --- quantizer EMA buffers (quantizer.py:40-47; codebook per layer)
    codebooks = np.stack(
        [sd[f"quantizer.layers.{q}.codebook"] for q in range(num_quantizers)]
    )
    qstate = RVQState(
        codebook=codebooks.astype(np.float32),
        code_sum=codebooks.astype(np.float32),  # counts/sums aren't saved;
        code_count=np.ones(codebooks.shape[:2], np.float32),  # EMA warm start
        initialized=np.asarray(True),
    )
    return {"params": params}, qstate


def _fold_bn(conv_w, conv_b, bn_w, bn_b, bn_mean, bn_var, eps=1e-5):
    """Fold eval-mode BatchNorm into the preceding conv (flax layout).

    BN(conv(x)) = conv(x)·s + t with s = γ/√(σ²+ε), t = β − μ·s — an
    affine per output channel, absorbable into the conv weights/bias."""
    s = bn_w / np.sqrt(bn_var + eps)
    return conv_w * s[None, None, :], conv_b * s + (bn_b - bn_mean * s)


def convert_mdm(state_dict: Dict, num_layers: int = 8, num_heads: int = 4) -> Dict:
    """Reference MDM (models/denoiser.py) state_dict -> our flax params.

    Exact mapping for every submodule; the audio encoder's BatchNorm running
    stats are folded into its convs, so the converted model must be built
    with ``MDMConfig(audio_norm='none')``. Use for porting released
    reference checkpoints (e.g. last_500.bin) into this framework.
    """
    sd = {k.removeprefix("module."): _np(v) for k, v in state_dict.items()}
    params: Dict = {}

    # --- wav encoder: 6 BasicBlocks with BN folding (layer.py:144-184) ----
    wav: Dict = {}
    for i in range(6):
        base = f"WavEncoder.feat_extractor.{i}"
        blk: Dict = {}
        for conv, bn, name in (
            ("conv1", "bn1", "conv1"),
            ("conv2", "bn2", "conv2"),
        ):
            w, b = _fold_bn(
                _conv(sd[f"{base}.{conv}.weight"]), sd[f"{base}.{conv}.bias"],
                sd[f"{base}.{bn}.weight"], sd[f"{base}.{bn}.bias"],
                sd[f"{base}.{bn}.running_mean"], sd[f"{base}.{bn}.running_var"],
            )
            blk[name] = {"kernel": w, "bias": b}
        if f"{base}.downsample.0.weight" in sd:
            w, b = _fold_bn(
                _conv(sd[f"{base}.downsample.0.weight"]),
                sd[f"{base}.downsample.0.bias"],
                sd[f"{base}.downsample.1.weight"], sd[f"{base}.downsample.1.bias"],
                sd[f"{base}.downsample.1.running_mean"],
                sd[f"{base}.downsample.1.running_var"],
            )
            blk["down_conv"] = {"kernel": w, "bias": b}
        wav[f"block_{i}"] = blk
    params["wav_encoder"] = wav

    # --- text/word conditioning -------------------------------------------
    params["word_embedding"] = sd["text_pre_encoder_body.weight"]
    params["text_encoder"] = {
        "kernel": _linear(sd["text_encoder_body.weight"]),
        "bias": sd["text_encoder_body.bias"],
    }
    params["mix_audio_text"] = {
        "kernel": _linear(sd["mix_audio_text.weight"]),
        "bias": sd["mix_audio_text.bias"],
    }
    params["embed_seed"] = {
        "kernel": _linear(sd["embed_text.weight"]),
        "bias": sd["embed_text.bias"],
    }

    # --- timestep MLP (denoiser.py:231-245) --------------------------------
    params["time_mlp"] = {
        "fc1": {
            "kernel": _linear(sd["embed_timestep.time_embed.0.weight"]),
            "bias": sd["embed_timestep.time_embed.0.bias"],
        },
        "fc2": {
            "kernel": _linear(sd["embed_timestep.time_embed.2.weight"]),
            "bias": sd["embed_timestep.time_embed.2.bias"],
        },
    }

    # --- in/out projections -------------------------------------------------
    params["input_process"] = {
        "kernel": _linear(sd["input_process.poseEmbedding.weight"]),
        "bias": sd["input_process.poseEmbedding.bias"],
    }
    params["input_process2"] = {
        "kernel": _linear(sd["input_process2.weight"]),
        "bias": sd["input_process2.bias"],
    }
    params["output_process"] = {
        "kernel": _linear(sd["output_process.poseFinal.weight"]),
        "bias": sd["output_process.poseFinal.bias"],
    }

    # --- transformer blocks, stacked for the nn.scan layout ----------------
    def stacked(fn):
        return np.stack([fn(i) for i in range(num_layers)])

    blk = f"mytimmblocks"
    params["blocks"] = {"block": {
        "norm1": {
            "scale": stacked(lambda i: sd[f"{blk}.{i}.norm1.weight"]),
            "bias": stacked(lambda i: sd[f"{blk}.{i}.norm1.bias"]),
        },
        # torch's flat (C, 3C) in_proj is part-major then head-major in its
        # columns; C-order reshape onto the head-aligned (C, 3, H, hd)
        # kernel layout is therefore exact (see TransformerBlock docstring)
        "qkv": {"kernel": stacked(
            lambda i: _linear(sd[f"{blk}.{i}.attn.qkv.weight"])
        ).reshape(num_layers, -1, 3, num_heads,
                  sd[f"{blk}.0.attn.qkv.weight"].shape[1] // num_heads)},
        "proj": {
            "kernel": stacked(lambda i: _linear(sd[f"{blk}.{i}.attn.proj.weight"])),
            "bias": stacked(lambda i: sd[f"{blk}.{i}.attn.proj.bias"]),
        },
        "norm2": {
            "scale": stacked(lambda i: sd[f"{blk}.{i}.norm2.weight"]),
            "bias": stacked(lambda i: sd[f"{blk}.{i}.norm2.bias"]),
        },
        "fc1": {
            "kernel": stacked(lambda i: _linear(sd[f"{blk}.{i}.mlp.fc1.weight"])),
            "bias": stacked(lambda i: sd[f"{blk}.{i}.mlp.fc1.bias"]),
        },
        "fc2": {
            "kernel": stacked(lambda i: _linear(sd[f"{blk}.{i}.mlp.fc2.weight"])),
            "bias": stacked(lambda i: sd[f"{blk}.{i}.mlp.fc2.bias"]),
        },
    }}
    return {"params": params}


def _res_block_t(sd: Dict, prefix: str) -> Dict:
    """ResBlock (layer.py:203-216): model.0 / model.2 convs."""
    return {
        "conv1": {
            "kernel": _conv(sd[f"{prefix}.model.0.weight"]),
            "bias": sd[f"{prefix}.model.0.bias"],
        },
        "conv2": {
            "kernel": _conv(sd[f"{prefix}.model.2.weight"]),
            "bias": sd[f"{prefix}.model.2.bias"],
        },
    }


def _vq_decoder(sd: Dict, prefix: str, num_layers: int, *, upsampling: bool) -> Dict:
    """VQDecoderV3 (upsampling=True, motion_encoder.py:299-327) or
    VQDecoderV5 (upsampling=False, :227-257) Sequential -> our param tree.

    Sequential layout: [proj conv (only if input_size != channels[0])],
    2 ResBlocks, then per stage (Upsample,) Conv, LeakyReLU, and a head conv.
    """
    out: Dict = {}
    has_proj = f"{prefix}.main.0.weight" in sd  # main.0 is a conv, not ResBlock
    p = 1 if has_proj else 0
    if has_proj:
        out["proj"] = {
            "kernel": _conv(sd[f"{prefix}.main.0.weight"]),
            "bias": sd[f"{prefix}.main.0.bias"],
        }
    out["res_0"] = _res_block_t(sd, f"{prefix}.main.{p}")
    out["res_1"] = _res_block_t(sd, f"{prefix}.main.{p + 1}")
    stage_stride = 3 if upsampling else 2  # V3 stages carry a param-less Upsample
    conv_off = 1 if upsampling else 0
    name = "up" if upsampling else "conv"
    for i in range(num_layers):
        idx = p + 2 + stage_stride * i + conv_off
        out[f"{name}_{i}"] = {
            "kernel": _conv(sd[f"{prefix}.main.{idx}.weight"]),
            "bias": sd[f"{prefix}.main.{idx}.bias"],
        }
    head = p + 2 + stage_stride * num_layers
    out["head"] = {
        "kernel": _conv(sd[f"{prefix}.main.{head}.weight"]),
        "bias": sd[f"{prefix}.main.{head}.bias"],
    }
    return out


def convert_eval_vae(state_dict: Dict, num_layers: int = 4) -> Dict:
    """Reference VAESKConv (motion_representation.py:67-75) -> our
    :class:`~syntalker_tpu.models.eval_vae.VAESKConv` params.

    Encoder: LocalEncoder layers.{i}.0 = SkeletonResidual
    (utils/skeleton.py:547-585): residual.0 masked conv, residual.1
    GroupNorm(10), shortcut k=1 conv. The 0/1 topology masks are static and
    re-derived on our side, so only weight/bias transfer. The reference's
    ``fc_mu``/``fc_logvar`` heads are skipped: the eval model is used
    non-variationally (VAEConv.map2latent with variational=False, :55-61),
    so they never touch the FGD embedding.

    Use on ``weights/AESKConv_240_100.bin`` (configs/diffusion_rvqvae_128.yaml
    e_name=VAESKConv) to compute FGD comparable to the reference's.
    """
    sd = {k.removeprefix("module."): _np(v) for k, v in state_dict.items()}
    enc: Dict = {}
    for i in range(num_layers):
        base = f"encoder.layers.{i}.0"
        enc[f"layer_{i}"] = {
            "conv": {
                "kernel": _conv(sd[f"{base}.residual.0.weight"]),
                "bias": sd[f"{base}.residual.0.bias"],
            },
            "norm": {
                "scale": sd[f"{base}.residual.1.weight"],
                "bias": sd[f"{base}.residual.1.bias"],
            },
            "shortcut": {
                "kernel": _conv(sd[f"{base}.shortcut.weight"]),
                "bias": sd[f"{base}.shortcut.bias"],
            },
        }
    params = {
        "encoder": enc,
        "decoder": _vq_decoder(sd, "decoder", num_layers, upsampling=True),
    }
    return {"params": params}


def convert_face_vqvae(state_dict: Dict, num_layers: int = 2) -> Dict:
    """Reference VQVAEConvZero (motion_representation.py:178-211) -> our
    :class:`~syntalker_tpu.models.eval_vae.VQVAEConvZero` params.

    Encoder VQEncoderV5 (motion_encoder.py:159-189): Sequential
    [Conv,LeakyReLU,ResBlock] x n; quantizer codebook is the nn.Embedding
    weight (quantizer.py:14); decoder VQDecoderV5.
    """
    sd = {k.removeprefix("module."): _np(v) for k, v in state_dict.items()}
    enc: Dict = {}
    for i in range(num_layers):
        enc[f"conv_{i}"] = {
            "kernel": _conv(sd[f"encoder.main.{3 * i}.weight"]),
            "bias": sd[f"encoder.main.{3 * i}.bias"],
        }
        enc[f"res_{i}"] = _res_block_t(sd, f"encoder.main.{3 * i + 2}")
    params = {
        "encoder": enc,
        "decoder": _vq_decoder(sd, "decoder", num_layers, upsampling=False),
        "codebook": sd["quantizer.embedding.weight"],
    }
    return {"params": params}


def load_torch_rvqvae(path: str, **kw) -> Tuple[Dict, RVQState]:
    """Load a reference net_*.pth ({'net': state_dict}) and convert."""
    import torch

    blob = torch.load(path, map_location="cpu")
    sd = blob.get("net", blob)
    # strip DataParallel prefixes (other_tools.py:771-791 semantics)
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    return convert_rvqvae(sd, **kw)


def load_torch_eval_checkpoint(path: str) -> Dict:
    """Load a reference eval checkpoint ({'model_state': state_dict}) and
    return the DataParallel-prefix-stripped state_dict
    (other_tools.py:771-791 semantics). Feed to :func:`convert_eval_vae`
    (AESKConv_240_100.bin) or :func:`convert_face_vqvae` (face VQVAE)."""
    import torch

    blob = torch.load(path, map_location="cpu")
    sd = blob.get("model_state", blob)
    return {k.removeprefix("module."): v for k, v in sd.items()}
