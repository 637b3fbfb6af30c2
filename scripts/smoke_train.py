"""End-to-end training smoke on real data (the shipped demo clip).

Runs the full pipeline at reduced budget on one chip:
  1. train the three body-part RVQ-VAEs (full-width, few thousand iters),
  2. train the diffusion denoiser on the frozen RVQ latents,
  3. generate with the trained stack and report reconstruction/latent
     quality vs ground truth.

This is a correctness artifact, not a benchmark: it checks that every
training + generation path runs on real data without NaNs and that losses
actually decrease. Run: python scripts/smoke_train.py [--iters N]
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

from syntalker_tpu.config import DataConfig, ExperimentConfig, RVQTrainConfig, TrainConfig
from syntalker_tpu.data.cache import BeatCache, ClipConfig, preprocess_clip
from syntalker_tpu.data.features import pose_to_part_rot6d
from syntalker_tpu.data.stats import load_pose_stats
from syntalker_tpu.models.denoiser import MDMConfig
from syntalker_tpu.train.loop import DiffusionTrainer, RVQTrainer
from syntalker_tpu.utils.tracking import setup_logging

NPZ = "/root/reference/demo/examples/2_scott_0_1_1.npz"
WAV = "/root/reference/demo/examples/2_scott_0_1_1.wav"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rvq-iters", type=int, default=1200)
    ap.add_argument("--diff-epochs", type=int, default=12)
    ap.add_argument("--out", type=str, default="./outputs/smoke")
    ap.add_argument("--representation", choices=["beat330", "h3d623"],
                    default="beat330")
    args = ap.parse_args()
    log = setup_logging(args.out)
    out_dir = Path(args.out)

    t_start = time.time()
    smplx_model = None
    if args.representation == "h3d623":
        from syntalker_tpu.ops.smplx import synthetic_smplx_model

        smplx_model = synthetic_smplx_model()
    arrays = preprocess_clip(NPZ, WAV, None, None, smplx_model=smplx_model)

    # RVQ training cache: 64-frame windows, dense stride for more samples
    rvq_cache = BeatCache(out_dir / "cache_rvq")
    rvq_cache.add_clip("clip", arrays, ClipConfig(pose_length=64, stride=4), is_test=False)
    rvq_cache.save_index()
    log.info(f"rvq cache: {len(rvq_cache)} windows")

    diff_cache = BeatCache(out_dir / "cache_diff")
    diff_cache.add_clip("clip", arrays, ClipConfig(pose_length=128, stride=16), is_test=False)
    diff_cache.save_index()
    log.info(f"diffusion cache: {len(diff_cache)} windows")

    report = {}

    # ---- stage 1: RVQ-VAEs -------------------------------------------------
    rvq_ckpts = []
    for part in ("upper", "hands", "lower"):
        cfg = ExperimentConfig(
            representation=args.representation,
            train=TrainConfig(batch_size=32, log_period=200, seed=11,
                              ckpt_dir=str(out_dir / "rvq")),
            rvq_train=RVQTrainConfig(
                body_part=part, batch_size=32, lr=2e-4, warmup_iters=100,
                milestones=(args.rvq_iters,), save_every=10**9,
            ),
            data=DataConfig(mean_std_dir="/root/reference/mean_std"),
        )
        trainer = RVQTrainer(cfg, rvq_cache)
        first_metrics = None
        it = 0
        with trainer.mesh:
            while it < args.rvq_iters:
                for batch in trainer.loader.epoch(it):
                    from syntalker_tpu.parallel.mesh import shard_batch

                    b = shard_batch({k: batch[k] for k in trainer._batch_keys}, trainer.mesh)
                    trainer.state, m = trainer.step(trainer.state, b)
                    if first_metrics is None:
                        first_metrics = {k: float(v) for k, v in m.items()}
                    it += 1
                    if it % 300 == 0:
                        log.info(f"[{part}] iter {it}: loss {float(m['loss']):.4f} "
                                 f"recon {float(m['recon']):.4f} perp {float(m['perplexity']):.0f}")
                    if it >= args.rvq_iters:
                        break
        last = {k: float(v) for k, v in m.items()}
        path = trainer.save(args.rvq_iters)
        rvq_ckpts.append(str(path))
        report[f"rvq_{part}"] = {"first_loss": first_metrics["loss"], "last_loss": last["loss"],
                                 "last_recon": last["recon"], "perplexity": last["perplexity"]}
        log.info(f"[{part}] {report[f'rvq_{part}']}")
        assert last["loss"] < first_metrics["loss"], f"{part} RVQ did not learn"

    # ---- stage 2: diffusion -------------------------------------------------
    # calibrate the latent normalizer on the freshly trained encoders
    from syntalker_tpu.train.diffusion_trainer import calibrate_latent_scale
    from syntalker_tpu.train.loop import load_rvq_stack

    stats = load_pose_stats("/root/reference/mean_std")
    cfg = ExperimentConfig(
        representation=args.representation,
        mdm=MDMConfig(audio_norm="batch"),  # full-size, shipped config
        train=TrainConfig(batch_size=32, log_period=50, seed=7,
                          ckpt_dir=str(out_dir / "diff")),
        data=DataConfig(mean_std_dir="/root/reference/mean_std", pose_length=128),
        rvq_ckpts=tuple(rvq_ckpts),
    )
    rvq_stack = load_rvq_stack(cfg, jax.random.PRNGKey(0))

    from syntalker_tpu.data import joints as JT

    def h3d_latents(rvq, feats):
        from syntalker_tpu.data.h3d import part_mask_623
        from syntalker_tpu.data.stats import load_h3d_stats

        h3d_stats = load_h3d_stats("/root/reference/mean_std")
        x = h3d_stats.normalize(feats)
        lat = []
        for name in JT.LATENT_SLICES:
            module, params, _q = rvq[name]
            lat.append(module.apply({"params": params},
                                    x[..., part_mask_623(name)], method="map2latent"))
        return jnp.concatenate(lat, axis=-1)

    if args.representation == "h3d623":
        raw_lat = h3d_latents(rvq_stack, jnp.asarray(arrays["h3d"][None, :512]))
        lat_scale = float(jnp.std(raw_lat))
    else:
        sample_parts = pose_to_part_rot6d(jnp.asarray(arrays["poses"][None, :512]))
        lat_scale = calibrate_latent_scale(
            rvq_stack, stats, sample_parts, jnp.asarray(arrays["trans_v"][None, :512])
        )
    log.info(f"calibrated latent_scale: {lat_scale:.3f}")
    report["latent_scale"] = lat_scale
    cfg = ExperimentConfig(**{**cfg.__dict__, "latent_scale": lat_scale})
    dtrainer = DiffusionTrainer(cfg, diff_cache)
    losses = []
    for epoch in range(args.diff_epochs):
        metrics = dtrainer.train_epoch(epoch)
        losses.append(metrics["train/predict_x0_loss"])
        log.info(f"diffusion epoch {epoch}: {losses[-1]:.4f}")
    report["diffusion"] = {"first_epoch_loss": losses[0], "last_epoch_loss": losses[-1]}
    assert losses[-1] < losses[0], "diffusion did not learn"
    dtrainer.save(0)

    # ---- stage 3: generation quality vs GT latents --------------------------
    from syntalker_tpu import generation as G
    from syntalker_tpu.data import joints as J
    from syntalker_tpu.diffusion.schedule import make_diffusion

    plan = G.plan_windows(480)  # 16 s
    if args.representation == "h3d623":
        gt_latents = h3d_latents(
            dtrainer.rvq, jnp.asarray(arrays["h3d"][None, :480])
        ) / lat_scale
    else:
        pose = jnp.asarray(arrays["poses"][None, :480])
        trans_v = jnp.asarray(arrays["trans_v"][None, :480])
        parts = pose_to_part_rot6d(pose)
        from syntalker_tpu.train.diffusion_trainer import make_latent_encoder

        enc = make_latent_encoder(dtrainer.rvq, stats, latent_scale=lat_scale)
        gt_latents = enc(parts["upper"], parts["hands"], parts["lower"], trans_v)

    audio = arrays["audio"][None, : 480 * 533]
    aw = jnp.asarray(G.window_audio(audio, plan))
    ww = jnp.asarray(G.window_words(arrays["word"][None, :480], plan))
    ddim = make_diffusion(steps=1000, timestep_respacing="ddim50")
    latents = G.sample_windows(
        dtrainer.mdm, dtrainer.state.params, ddim, plan, aw, ww,
        gt_latents[:, : plan.pre_frames], jax.random.PRNGKey(3), sampler="ddim",
    )
    n = latents.shape[1]
    lat_mse = float(jnp.mean((latents - gt_latents[:, :n]) ** 2))
    gt_var = float(jnp.var(gt_latents[:, :n]))
    report["generation"] = {"latent_mse": lat_mse, "gt_latent_var": gt_var}
    log.info(f"generation: latent MSE {lat_mse:.4f} vs GT variance {gt_var:.4f}")

    if args.representation == "h3d623":
        from syntalker_tpu.data.stats import load_h3d_stats

        dec = G.decode_latents_h3d(
            latents, rvq_modules=dtrainer.rvq,
            h3d_stats=load_h3d_stats("/root/reference/mean_std"),
            latent_scale=lat_scale,
        )
        assert np.isfinite(np.asarray(dec["joints"])).all()
        nfr = dec["features"].shape[1]
        feat_mse = float(jnp.mean(
            (dec["features"] - jnp.asarray(arrays["h3d"][None, :nfr])) ** 2
        ))
        report["generation"]["h3d_feature_mse_vs_gt"] = feat_mse
        log.info(f"generation: h3d feature MSE vs GT {feat_mse:.4f}")
    else:
        dec = G.decode_latents(
            latents, rvq_modules=dtrainer.rvq, stats=stats, latent_scale=lat_scale
        )
        assert np.isfinite(np.asarray(dec["axis_angle"])).all()
        gt6d = parts["full"][:, : dec["rot6d"].shape[1]]
        rot_mse = float(jnp.mean((dec["rot6d"] - gt6d) ** 2))
        report["generation"]["rot6d_mse_vs_gt"] = rot_mse
        log.info(f"generation: rot6d MSE vs GT {rot_mse:.4f}")
    report["wall_minutes"] = (time.time() - t_start) / 60
    (out_dir / "report.json").write_text(json.dumps(report, indent=1))
    log.info(f"SMOKE OK: {json.dumps(report, indent=1)}")


if __name__ == "__main__":
    main()
