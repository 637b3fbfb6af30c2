"""Body-part RVQ-VAE training CLI.

Usage: python -m syntalker_tpu.cli.train_rvq -c configs/rvq_beat2.yaml \
           rvq_train.body_part=upper
Equivalent of ``rvq_beatx_train.py`` (300k iterations per body part; the
three parts train independently and in parallel).
"""

from __future__ import annotations

import logging

from syntalker_tpu.cli.common import base_parser, load_smplx_if_available, setup
from syntalker_tpu.data.beat_builder import build_beat_cache
from syntalker_tpu.data.cache import ClipConfig
from syntalker_tpu.train.loop import RVQTrainer

log = logging.getLogger("syntalker")


def main(argv=None):
    args = base_parser(__doc__).parse_args(argv)
    cfg = setup(args)
    smplx_model = load_smplx_if_available(cfg)

    clip_cfg = ClipConfig(
        pose_fps=cfg.data.pose_fps,
        audio_sr=cfg.data.audio_sr,
        pose_length=cfg.rvq_train.window,  # 64-frame windows (beat2_rvqvae.yaml:39)
        stride=cfg.data.stride,
    )
    cache, _ = build_beat_cache(
        cfg.data.data_path,
        cfg.data.cache_path + "_rvq",
        split="train",
        speakers=cfg.data.training_speakers,
        cfg=clip_cfg,
        smplx_model=smplx_model,
    )

    trainer = RVQTrainer(cfg, cache)
    trainer.train()
    path = trainer.save()
    log.info(f"final checkpoint: {path}")


if __name__ == "__main__":
    main()
