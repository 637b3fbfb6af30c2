"""HumanML3D-suite evaluation CLI (text-control stack).

Usage: python -m syntalker_tpu.cli.test_h3d -c configs/diffusion_h3d.yaml \
           test_ckpt=./outputs/ckpt/step_N [--replications 20]

Equivalent of the reference ``test_h3d.py`` + the eval half of
``h3d_diffusion_new_trainer.py`` (:818-905 test loop, :907-1060 metric
replications): generate every test clip on the 623-d representation, embed
generated/GT motion with the BiGRU co-embedding oracle, report
FID / Diversity / Matching / R-precision as mean ± 95% CI.

The oracle is the committed self-hosted artifact
(``weights/t2m_oracle/bigru.npz``, scripts/train_t2m_oracle.py) unless
``--oracle`` points elsewhere; caption text features come from the
deterministic captioner (data/captions.py) over GT joints, the same corpus
the oracle was trained on.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import jax
import numpy as np

from syntalker_tpu.cli.common import base_parser, load_smplx_if_available, setup
from syntalker_tpu.data.beat_builder import build_beat_cache
from syntalker_tpu.data.cache import ClipConfig
from syntalker_tpu.diffusion.schedule import make_diffusion
from syntalker_tpu.eval import t2m
from syntalker_tpu.eval.harness_h3d import H3DEvaluator
from syntalker_tpu.models.denoiser import create_mdm, migrate_qkv_kernels
from syntalker_tpu.models.tmr import load_text_pipeline
from syntalker_tpu.train import state as ts
from syntalker_tpu.train.loop import load_rvq_stack

log = logging.getLogger("syntalker")


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("--oracle", type=str, default="",
                   help="path to a bigru oracle npz (default: the committed artifact)")
    p.add_argument("--tmr", type=str, default="",
                   help="TMR artifact npz for the prompt text pipeline "
                        "(default: weights/t2m_oracle/tmr.npz when present; "
                        "'none' forces the untrained fallback)")
    p.add_argument("--replications", type=int, default=20)
    p.add_argument("--max-clips", type=int, default=None)
    p.add_argument("--mm-repeats", type=int, default=0)
    p.add_argument("--steering-clips", type=int, default=4,
                   help="clips for the tracked prompt-steering metric")
    p.add_argument("--no-steering", action="store_true")
    args = p.parse_args(argv)
    cfg = setup(args)
    smplx_model = load_smplx_if_available(cfg)

    cache, _ = build_beat_cache(
        cfg.data.data_path,
        cfg.data.cache_path,
        split="test",
        speakers=cfg.data.training_speakers,
        cfg=ClipConfig(pose_length=cfg.data.pose_length),
        smplx_model=smplx_model,
    )

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
        timestep_respacing=cfg.diffusion.timestep_respacing or None,
    )
    from syntalker_tpu.data.stats import identity_h3d_stats, load_h3d_stats

    h3d_stats = (
        load_h3d_stats(cfg.data.mean_std_dir)
        if Path(cfg.data.mean_std_dir).exists()
        else identity_h3d_stats()
    )

    oracle = t2m.T2MEvaluator.from_artifact(args.oracle or None)
    # prompt text pipeline: the TRAINED TMR text head (same align space the
    # prompt channel was trained against) — a fresh TextPipeline() would
    # embed prompts with random weights and void the steering measurement
    text_pipeline = None
    if args.tmr != "none":
        tmr_path = Path(args.tmr) if args.tmr else (
            Path(__file__).resolve().parents[2] / "weights/t2m_oracle/tmr.npz")
        if tmr_path.exists():
            text_pipeline = load_text_pipeline(tmr_path)
            log.info(f"prompt text pipeline: {tmr_path}")
        elif args.tmr:
            raise FileNotFoundError(tmr_path)
    evaluator = H3DEvaluator(
        mdm=mdm,
        mdm_params=mdm_params,
        diffusion=diffusion,
        rvq_modules=rvq,
        h3d_stats=h3d_stats,
        text_pipeline=text_pipeline,
        t2m_evaluator=oracle,
        pose_length=cfg.data.pose_length,
        pre_frames=cfg.pre_frames,
        latent_scale=cfg.latent_scale,
    )

    # caption text features from GT joints (the oracle's training corpus
    # format): word hash-vectors + POS one-hots per clip
    from syntalker_tpu.data.captions import caption_batch
    from syntalker_tpu.data.h3d import recover_from_ric

    n_clips = min(len(cache), args.max_clips or len(cache))
    text_features = []
    captions = []
    for i in range(n_clips):
        import jax.numpy as jnp

        feats = cache.get(i)["h3d"]
        joints = np.asarray(recover_from_ric(jnp.asarray(feats[None])))
        we, po, ln, caps = caption_batch(joints)
        log.info(f"clip {i} caption: {caps[0].text}")
        text_features.append({"word_embs": we, "pos_ohot": po, "cap_lens": ln})
        captions.append(caps[0].text)

    results = evaluator.evaluate(
        cache,
        jax.random.fold_in(rng, 7),
        text_features=text_features,
        replications=args.replications,
        max_clips=args.max_clips,
        mm_repeats=args.mm_repeats,
    )
    out = {
        k: {"mean": np.asarray(v[0]).tolist(), "ci95": np.asarray(v[1]).tolist()}
        for k, v in results.items()
    }
    if cfg.mdm.use_prompt and not args.no_steering:
        # tracked steering number (VERDICT r3 #9): prompted-vs-unprompted
        # oracle-distance gain + off-part leakage on the first clips
        out.update(evaluator.steering_metrics(
            cache, jax.random.fold_in(rng, 8),
            captions=captions, text_features=text_features,
            max_clips=min(n_clips, args.steering_clips),
        ))
    out_path = Path(cfg.train.ckpt_dir or ".") / "h3d_metrics.json"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(out, indent=1))
    log.info(f"h3d metrics -> {out_path}\n{json.dumps(out, indent=1)}")


if __name__ == "__main__":
    main()
