"""BEAT2 evaluation CLI: FGD / BeatAlign / L1Div on the test split.

Usage: python -m syntalker_tpu.cli.test -c configs/diffusion_beat2.yaml \
           test_ckpt=./outputs/ckpt/step_100000
Equivalent of the reference ``test.py`` (+ trainer.test(999)).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import jax
import numpy as np

from syntalker_tpu.cli.common import base_parser, load_smplx_if_available, setup
from syntalker_tpu.config import ExperimentConfig
from syntalker_tpu.data.beat_builder import build_beat_cache
from syntalker_tpu.data.cache import ClipConfig
from syntalker_tpu.data.stats import identity_pose_stats, load_pose_stats
from syntalker_tpu.diffusion.schedule import make_diffusion
from syntalker_tpu.eval.harness import GestureEvaluator
from syntalker_tpu.models.denoiser import create_mdm, migrate_qkv_kernels
from syntalker_tpu.models.eval_vae import EvalVAEConfig, VAESKConv
from syntalker_tpu.train import state as ts
from syntalker_tpu.train.loop import load_rvq_stack

log = logging.getLogger("syntalker")


def build_evaluator(
    cfg: ExperimentConfig,
    smplx_model=None,
    eval_vae_ckpt: str = "",
    mean_velocity: np.ndarray | None = None,
):
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
    stats = (
        load_pose_stats(cfg.data.mean_std_dir)
        if Path(cfg.data.mean_std_dir).exists()
        else identity_pose_stats()
    )
    eval_vae = VAESKConv(EvalVAEConfig())
    import jax.numpy as jnp

    ev_params = eval_vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 330)))["params"]
    if eval_vae_ckpt:
        ev_params = ts.load_checkpoint_raw(eval_vae_ckpt)["params"]

    mean_vel_path = (
        Path(cfg.data.data_path) / "weights" / "mean_vel_smplxflame_30.npy"
    )
    mean_vel = (
        mean_velocity
        if mean_velocity is not None
        else (np.load(mean_vel_path) if mean_vel_path.exists() else None)
    )

    return GestureEvaluator(
        mdm=mdm,
        mdm_params=mdm_params,
        diffusion=diffusion,
        rvq_modules=rvq,
        stats=stats,
        eval_vae=eval_vae,
        eval_vae_params=ev_params,
        smplx_model=smplx_model,
        mean_velocity=mean_vel,
        pose_length=cfg.data.pose_length,
        pre_frames=cfg.pre_frames,
        latent_scale=cfg.latent_scale,
        sampler=cfg.diffusion.sampler,
    )


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("--eval-vae-ckpt", type=str, default="")
    p.add_argument("--max-clips", type=int, default=None)
    p.add_argument(
        "--batch-clips", type=int, default=1,
        help="generate N same-window-count clips per device batch",
    )
    args = p.parse_args(argv)
    cfg = setup(args)
    smplx_model = load_smplx_if_available(cfg)

    test_cache, _ = build_beat_cache(
        cfg.data.data_path,
        cfg.data.cache_path,
        split="test",
        speakers=cfg.data.training_speakers,
        cfg=ClipConfig(pose_length=cfg.data.pose_length),
        smplx_model=smplx_model,
    )
    # mean joint velocity (BeatAlign normalizer): load the dataset stat if
    # shipped, else compute it in-framework from the test clips via JAX FK
    # (replaces the reference's offline calculate_mean_velocity,
    # beat_sep_lower.py:117-197) and persist it beside the cache.
    mean_vel = None
    mv_file = Path(cfg.data.data_path) / "weights" / "mean_vel_smplxflame_30.npy"
    if not mv_file.exists() and smplx_model is not None:
        from syntalker_tpu.data.stats import compute_mean_velocity_from_clips

        mv_cache = Path(cfg.data.cache_path) / "mean_vel_smplxflame_30.npy"
        if mv_cache.exists():
            mean_vel = np.load(mv_cache)
        else:
            log.info("computing mean joint velocity from cached clips (JAX FK)")
            mean_vel = compute_mean_velocity_from_clips(
                list(test_cache.clips.values()), smplx_model
            )
            mv_cache.parent.mkdir(parents=True, exist_ok=True)
            np.save(mv_cache, mean_vel)

    evaluator = build_evaluator(cfg, smplx_model, args.eval_vae_ckpt, mean_vel)
    result = evaluator.evaluate(
        test_cache,
        jax.random.PRNGKey(999),
        out_dir=Path(args.run_dir) / "results",
        max_clips=args.max_clips,
        batch_clips=args.batch_clips,
    )
    out = Path(args.run_dir) / "metrics.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(result.as_dict(), indent=1))
    log.info(f"metrics -> {out}")


if __name__ == "__main__":
    main()
