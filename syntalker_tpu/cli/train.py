"""Diffusion (denoiser) training CLI.

Usage: python -m syntalker_tpu.cli.train -c configs/diffusion_beat2.yaml
Equivalent of the reference ``train.py`` (epoch loop + periodic eval +
checkpointing) without the mp.spawn/NCCL scaffolding — parallelism comes
from the mesh inside DiffusionTrainer.
"""

from __future__ import annotations

import logging

import syntalker_tpu.components  # noqa: F401 — populate registries
from syntalker_tpu.cli.common import base_parser, load_smplx_if_available, setup
from syntalker_tpu.data.cache import ClipConfig
from syntalker_tpu.registry import DATASETS, TRAINERS

log = logging.getLogger("syntalker")


def main(argv=None):
    args = base_parser(__doc__).parse_args(argv)
    cfg = setup(args)
    smplx_model = load_smplx_if_available(cfg)

    clip_cfg = ClipConfig(
        pose_fps=cfg.data.pose_fps,
        audio_sr=cfg.data.audio_sr,
        pose_length=cfg.data.pose_length,
        stride=cfg.data.stride,
    )
    build_cache = DATASETS.get(cfg.data.dataset)
    train_cache, _vocab = build_cache(
        cfg.data.data_path,
        cfg.data.cache_path,
        split="train",
        speakers=cfg.data.training_speakers,
        cfg=clip_cfg,
        smplx_model=smplx_model,
    )

    trainer = TRAINERS.get(cfg.trainer)(cfg, train_cache)
    for epoch in range(cfg.train.epochs):
        metrics = trainer.train_epoch(epoch)
        log.info(f"epoch {epoch}: {metrics}")
        if (epoch + 1) % cfg.train.test_period == 0 or epoch == cfg.train.epochs - 1:
            path = trainer.save()
            log.info(f"checkpoint: {path}")


if __name__ == "__main__":
    main()
