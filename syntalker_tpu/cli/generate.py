"""Single-clip audio→motion generation CLI (the demo path without Gradio).

Usage: python -m syntalker_tpu.cli.generate -c configs/diffusion_beat2.yaml \
           --wav input.wav [--textgrid input.TextGrid] \
           [--upper-prompt "raising arms"] [--render]

Equivalent of the reference ``demo.py`` / ``test_h3d.py`` generation
surface: wav (+ optional word alignment + optional per-body-part text
prompts) -> motion npz (+ stick-figure video). ASR/forced alignment are
external preprocessing in the reference (whisper + MFA subprocess,
demo.py:41-78); here the TextGrid is an optional input and silence-words
are used when absent.
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from syntalker_tpu import generation as G
from syntalker_tpu.cli.common import base_parser, load_smplx_if_available, setup
from syntalker_tpu.data import audio as A
from syntalker_tpu.data.stats import identity_pose_stats, load_pose_stats
from syntalker_tpu.data.textgrid import words_tier
from syntalker_tpu.data.vocab import Vocab, words_to_frame_ids
from syntalker_tpu.diffusion.schedule import make_diffusion
from syntalker_tpu.models.denoiser import create_mdm, migrate_qkv_kernels
from syntalker_tpu.train import state as ts
from syntalker_tpu.train.loop import load_rvq_stack

log = logging.getLogger("syntalker")


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("--wav", type=str, required=True)
    p.add_argument("--textgrid", type=str, default="")
    p.add_argument(
        "--transcript", type=str, default="",
        help="transcript text; energy-aligned to the audio when no TextGrid "
             "is given (stand-in for the reference's MFA step, demo.py:76-78)",
    )
    p.add_argument("--out", type=str, default="./outputs/generated.npz")
    p.add_argument("--render", action="store_true")
    p.add_argument("--upper-prompt", type=str, default="")
    p.add_argument("--hands-prompt", type=str, default="")
    p.add_argument("--lower-prompt", type=str, default="")
    args = p.parse_args(argv)
    cfg = setup(args)

    rng = jax.random.PRNGKey(cfg.train.seed)
    mdm, mdm_params = create_mdm(cfg.mdm, rng, frames=cfg.data.pose_length)
    if cfg.test_ckpt:
        mdm_params = ts.load_model_variables(cfg.test_ckpt)
        # pre-round-3 checkpoints store flat qkv kernels; reshape to the
        # head-aligned layout (numerics unchanged)
        mdm_params = migrate_qkv_kernels(mdm_params, cfg.mdm.num_heads)
    rvq = load_rvq_stack(cfg, jax.random.fold_in(rng, 99))
    diffusion = make_diffusion(
        schedule=cfg.diffusion.schedule,
        steps=cfg.diffusion.steps,
        timestep_respacing=cfg.diffusion.timestep_respacing or "ddim50",
    )
    stats = (
        load_pose_stats(cfg.data.mean_std_dir)
        if Path(cfg.data.mean_std_dir).exists()
        else identity_pose_stats()
    )

    # featurize the input audio
    y, sr = A.load_wav_mono(args.wav, cfg.data.audio_sr)
    feats = A.onset_amplitude_features(y, sr)[None]  # (1, S, 2)
    n_frames = int(len(y) / sr * cfg.data.pose_fps)
    plan = G.plan_windows(
        n_frames, pose_length=cfg.data.pose_length, pre_frames=cfg.pre_frames
    )

    if args.textgrid and cfg.data.vocab_path:
        vocab = Vocab.load(cfg.data.vocab_path)
        word = words_to_frame_ids(words_tier(args.textgrid), n_frames, vocab)[None]
    elif args.transcript and cfg.data.vocab_path:
        # no forced alignment available: place words over voiced audio by
        # cumulative-energy share instead of uniformly
        vocab = Vocab.load(cfg.data.vocab_path)
        intervals = A.align_words_by_energy(args.transcript.split(), y, sr)
        word = words_to_frame_ids(intervals, n_frames, vocab)[None]
    else:
        word = np.zeros((1, n_frames), np.int32)

    aw = jnp.asarray(G.window_audio(feats, plan, sr=sr, fps=cfg.data.pose_fps))
    ww = jnp.asarray(G.window_words(word, plan))
    seed = jnp.zeros((1, plan.pre_frames, cfg.mdm.latent_total_dim))

    prompts = None
    if args.upper_prompt or args.hands_prompt or args.lower_prompt:
        from syntalker_tpu.models.tmr import embed_prompts

        prompts = embed_prompts(
            cfg,
            {
                "upper": args.upper_prompt or None,
                "hands": args.hands_prompt or None,
                "lower": args.lower_prompt or None,
            },
        )

    latents = G.sample_windows(
        mdm,
        mdm_params,
        diffusion,
        plan,
        aw,
        ww,
        seed,
        jax.random.fold_in(rng, 7),
        sampler="ddim" if diffusion.num_steps < cfg.diffusion.steps else cfg.diffusion.sampler,
        prompts=prompts,
        guidance={"audio_scale": cfg.guidance.audio_scale, "prompt_scale": cfg.guidance.prompt_scale},
    )
    dec = G.decode_latents(
        latents, rvq_modules=rvq, stats=stats, latent_scale=cfg.latent_scale
    )

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        out,
        poses=np.asarray(dec["axis_angle"][0]),
        trans=np.asarray(dec["trans"][0]),
        betas=np.zeros(300, np.float32),
        expressions=np.zeros((dec["axis_angle"].shape[1], 100), np.float32),
        model="smplx2020",
        gender="neutral",
        mocap_frame_rate=30,
    )
    log.info(f"motion -> {out} ({dec['axis_angle'].shape[1]} frames)")

    if args.render:
        from syntalker_tpu.render import render_npz

        video = render_npz(out, out.with_suffix(""), smplx_model=load_smplx_if_available(cfg))
        log.info(f"video -> {video}")


if __name__ == "__main__":
    main()
