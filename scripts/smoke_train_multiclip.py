"""Multi-clip multi-speaker smoke training + batched eval + loader audit.

VERDICT r2 #3 (the on-chip half): exercise the FULL data path at N≫1 —
speaker-filtered splits over a 16-clip 4-speaker synthetic BEAT2 corpus,
cache construction, RVQ + diffusion training through the production
trainers, host-loader throughput vs device step time (does the 1-core host
pipeline starve the chip?), and bucketed batched eval over heterogeneous
test-clip lengths with known beat structure.

Writes outputs/smoke_multiclip/report.json. ~15 min on the chip:

    python scripts/smoke_train_multiclip.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path("outputs/smoke_multiclip")
REF_MEAN_STD = "/root/reference/mean_std"
NPZ = "/root/reference/demo/examples/2_scott_0_1_1.npz"
WAV = "/root/reference/demo/examples/2_scott_0_1_1.wav"

RVQ_ITERS = 400
DIFF_EPOCHS = 6


def main():
    import jax

    from syntalker_tpu.config import (
        DataConfig,
        DiffusionConfig,
        ExperimentConfig,
        RVQTrainConfig,
        TrainConfig,
    )
    from syntalker_tpu.data.beat_builder import build_beat_cache
    from syntalker_tpu.data.cache import BatchLoader, ClipConfig, PrefetchLoader
    from syntalker_tpu.data.synthetic import make_corpus
    from syntalker_tpu.models.denoiser import MDMConfig

    OUT.mkdir(parents=True, exist_ok=True)
    report = {}

    # ---- 1. corpus + caches ----
    corpus_root = OUT / "beat2_synth"
    if not (corpus_root / "train_test_split.csv").exists():
        ids = make_corpus(
            corpus_root, speakers=(2, 4, 6, 8), clips_per_speaker=4,
            seconds_range=(8, 20), base_npz=NPZ, base_wav=WAV, seed=0,
        )
        print(f"corpus: {len(ids)} clips")
    t0 = time.time()
    train_cache, vocab = build_beat_cache(
        corpus_root, OUT / "cache", split="train", speakers=(2, 4, 6, 8),
        cfg=ClipConfig(pose_length=128, stride=64),
    )
    test_cache, _ = build_beat_cache(
        corpus_root, OUT / "cache", split="test", speakers=(2, 4, 6, 8),
        cfg=ClipConfig(pose_length=128), vocab=vocab,
    )
    report["cache"] = {
        "build_seconds": time.time() - t0,
        "train_windows": len(train_cache),
        "train_clips": len({w.clip for w in train_cache.windows}),
        "test_clips": len(test_cache),
        "vocab_words": vocab.n_words,
    }
    print(json.dumps(report["cache"]))

    mdm_cfg = MDMConfig(vocab_size=max(vocab.n_words, 16), audio_norm="batch")
    base = dict(
        data=DataConfig(
            data_path=str(corpus_root), cache_path=str(OUT / "cache"),
            mean_std_dir=REF_MEAN_STD,
        ),
        mdm=mdm_cfg,
        diffusion=DiffusionConfig(),
    )

    # ---- 2. RVQ training (3 parts) ----
    from syntalker_tpu.train.loop import RVQTrainer

    rvq_ckpts = []
    t0 = time.time()
    for part in ("upper", "hands", "lower"):
        cfg = ExperimentConfig(
            **base,
            train=TrainConfig(batch_size=32, ckpt_dir=str(OUT / f"rvq_{part}")),
            rvq_train=RVQTrainConfig(
                batch_size=32, body_part=part, save_every=10**9
            ),
        )
        tr = RVQTrainer(cfg, train_cache)
        tr.train(total_iters=RVQ_ITERS)
        rvq_ckpts.append(str(tr.save(RVQ_ITERS)))
    report["rvq_seconds"] = time.time() - t0

    # ---- 3. calibrated latent scale + diffusion training ----
    from syntalker_tpu.train.loop import DiffusionTrainer

    cfg = ExperimentConfig(
        **base,
        train=TrainConfig(batch_size=16, ckpt_dir=str(OUT / "diff"),
                          log_period=10),
        rvq_ckpts=tuple(rvq_ckpts),
    )
    trainer = DiffusionTrainer(cfg, train_cache)

    # loader audit: host batch-assembly rate vs device step time
    loader = BatchLoader(train_cache, 16, seed=0)
    t0 = time.time()
    n_batches = 0
    for b in loader.epoch(0):
        n_batches += 1
    host_s_per_batch = (time.time() - t0) / max(n_batches, 1)

    t0 = time.time()
    losses = []
    for ep in range(DIFF_EPOCHS):
        m = trainer.train_epoch(ep)
        losses.append(m.get("train/predict_x0_loss", float("nan")))
        print(f"epoch {ep}: {m}")
    diff_seconds = time.time() - t0
    steps = DIFF_EPOCHS * len(loader)
    step_s = diff_seconds / max(steps, 1)
    report["diffusion"] = {
        "first_epoch_loss": losses[0], "last_epoch_loss": losses[-1],
        "seconds": diff_seconds, "s_per_step_incl_host": step_s,
    }
    report["loader"] = {
        "host_s_per_batch": host_s_per_batch,
        "train_s_per_step": step_s,
        # PrefetchLoader overlaps assembly with device compute; utilization
        # is the fraction of step time NOT spent waiting on the host
        "device_utilization_bound": max(0.0, 1.0 - host_s_per_batch / max(step_s, 1e-9)),
        "prefetch_hides_host": host_s_per_batch < step_s,
    }
    ckpt = trainer.save(steps)

    # prefetch-overlap check: one epoch through PrefetchLoader should not be
    # slower than the raw loader epoch + step time budget
    pf = PrefetchLoader(loader, depth=2)
    t0 = time.time()
    for b in pf.epoch(1):
        pass
    report["loader"]["prefetch_epoch_seconds"] = time.time() - t0

    # ---- 4. batched eval over heterogeneous test clips ----
    from syntalker_tpu.cli.test import build_evaluator
    from syntalker_tpu.data.stats import compute_mean_velocity_from_clips
    from syntalker_tpu.ops.smplx import synthetic_smplx_model

    smplx_model = synthetic_smplx_model()
    mean_vel = compute_mean_velocity_from_clips(
        list(test_cache.clips.values()), smplx_model
    )
    eval_cfg = ExperimentConfig(
        **base,
        train=TrainConfig(batch_size=16, ckpt_dir=str(OUT / "diff")),
        rvq_ckpts=tuple(rvq_ckpts),
        test_ckpt=str(ckpt),
    )
    evaluator = build_evaluator(eval_cfg, smplx_model, "", mean_vel)
    t0 = time.time()
    result = evaluator.evaluate(
        test_cache, jax.random.PRNGKey(999), batch_clips=2,
    )
    report["eval"] = result.as_dict()
    report["eval"]["wall_seconds"] = time.time() - t0
    (OUT / "report.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
