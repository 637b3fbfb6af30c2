"""Controlled probe of audio conditioning in the sampler path (VERDICT #4).

On the round-1 overfit checkpoints (outputs/smoke_xl: 8k RVQ iters + 500
diffusion epochs on the demo clip), sample the same windows three ways with
the SAME noise key:
  (i)   true audio + words,
  (ii)  shuffled audio (the clip's audio rolled by half its length — valid
        speech statistics, wrong alignment),
  (iii) unconditional (audio+word features zeroed via the model's
        uncond_audio mask — the CFG null branch).

If the sampler uses the conditioning, latent MSE vs GT must order
(i) < (ii) ≈ (iii). Reference sampling protocol being probed:
diffusion_rvqvae_trainer.py:419-456 (window loop), p_sample_loop eval path.

Run: python scripts/probe_conditioning.py [--ckpt-root outputs/smoke_xl]
Writes <ckpt_root>/probe_cond.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

NPZ = "/root/reference/demo/examples/2_scott_0_1_1.npz"
WAV = "/root/reference/demo/examples/2_scott_0_1_1.wav"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-root", type=str, default="outputs/smoke_xl")
    ap.add_argument("--frames", type=int, default=480)
    ap.add_argument("--sampler", choices=["ddim", "ddpm"], default="ddim")
    ap.add_argument("--steps", type=str, default="ddim50")
    args = ap.parse_args()
    root = Path(args.ckpt_root)

    from syntalker_tpu import generation as G
    from syntalker_tpu.config import DataConfig, ExperimentConfig
    from syntalker_tpu.data.cache import preprocess_clip
    from syntalker_tpu.data.features import pose_to_part_rot6d
    from syntalker_tpu.data.stats import load_pose_stats
    from syntalker_tpu.diffusion.schedule import make_diffusion
    from syntalker_tpu.models.denoiser import MDM, MDMConfig
    from syntalker_tpu.train.diffusion_trainer import make_latent_encoder
    from syntalker_tpu.train.loop import load_rvq_stack
    from syntalker_tpu.train.state import latest_checkpoint, load_checkpoint_raw

    report = json.loads((root / "report.json").read_text())
    lat_scale = report["latent_scale"]

    # numeric-sorted latest step (lexicographic glob would pick step_8000
    # over step_10000)
    rvq_ckpts = tuple(
        str(latest_checkpoint(root / "rvq" / f"rvq_{p}"))
        for p in ("upper", "hands", "lower")
    )
    cfg = ExperimentConfig(
        data=DataConfig(mean_std_dir="/root/reference/mean_std"),
        rvq_ckpts=rvq_ckpts,
        latent_scale=lat_scale,
    )
    rvq = load_rvq_stack(cfg, jax.random.PRNGKey(0))
    stats = load_pose_stats("/root/reference/mean_std")

    raw = load_checkpoint_raw(root / "diff" / "step_0")
    mdm_params = jax.tree.map(jnp.asarray, raw["params"])
    mdm = MDM(MDMConfig())

    arrays = preprocess_clip(NPZ, WAV, None, None)
    nf = args.frames
    pose = jnp.asarray(arrays["poses"][None, :nf])
    trans_v = jnp.asarray(arrays["trans_v"][None, :nf])
    parts = pose_to_part_rot6d(pose)
    enc = make_latent_encoder(rvq, stats, latent_scale=lat_scale)
    gt_latents = enc(parts["upper"], parts["hands"], parts["lower"], trans_v)

    plan = G.plan_windows(nf)
    diffusion = make_diffusion(steps=1000, timestep_respacing=args.steps)

    audio = arrays["audio"][None, : nf * 533]
    words = arrays["word"][None, :nf]
    # (ii): roll by half the clip — real speech, wrong alignment
    audio_shuf = np.roll(audio, audio.shape[1] // 2, axis=1)
    words_shuf = np.roll(words, words.shape[1] // 2, axis=1)

    seed0 = gt_latents[:, : plan.pre_frames]
    key = jax.random.PRNGKey(3)

    @jax.jit
    def run(aw, ww, uncond):
        return G.sample_windows(
            mdm, mdm_params, diffusion, plan, aw, ww, seed0, key,
            sampler=args.sampler, uncond_audio=uncond,
        )

    def mse_vs_gt(aw, ww, uncond):
        lat = run(jnp.asarray(aw), jnp.asarray(ww), jnp.asarray(uncond, jnp.float32))
        n = lat.shape[1]
        return float(jnp.mean((lat - gt_latents[:, :n]) ** 2))

    t0 = time.time()
    results = {
        "true_audio": mse_vs_gt(G.window_audio(audio, plan), G.window_words(words, plan), 0.0),
        "shuffled_audio": mse_vs_gt(
            G.window_audio(audio_shuf, plan), G.window_words(words_shuf, plan), 0.0
        ),
        "uncond": mse_vs_gt(G.window_audio(audio, plan), G.window_words(words, plan), 1.0),
        "gt_latent_var": float(jnp.var(gt_latents)),
        "sampler": f"{args.sampler}/{args.steps}",
        "frames": nf,
        "wall_s": round(time.time() - t0, 1),
    }
    results["margin_shuffled"] = results["shuffled_audio"] - results["true_audio"]
    results["margin_uncond"] = results["uncond"] - results["true_audio"]
    out = root / f"probe_cond_{args.sampler}.json"
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
