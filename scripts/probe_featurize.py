"""One-off: bisect the sustained-train 0.68 s/step (round 4).

probe_sustained_step.py showed the EXACT trainer step at 0.59 s/step even
on a fixed pre-gathered batch, vs the 34 ms benched MDM step @ b128 bf16.
The delta must live in (some combination of):

  A. featurize: pose->rot6d + 3x frozen RVQ map2latent (params CLOSED OVER
     as HLO constants) + stats normalize
  B. the sustained MDMConfig (audio_norm='batch', small vocab) vs the bench
     default config
  C. something about the batch contents (audio length etc.)

Times, with chained-slope (20 steps, one readback) on the real chip:
  1. jit(featurize) alone on the sustained batch
  2. jit(raw_step) on the PRE-FEATURIZED batch, sustained config
  3. jit(featurize with RVQ params as ARGUMENTS)

    python scripts/probe_featurize.py
"""

import dataclasses
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))

from sustained_train import OUT, _caches, _exp_cfg  # noqa: E402


def chain_time(fn, *args, n=20, warm=2, get=None):
    import jax

    out = None
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0] if get is None else get(out)
    jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from syntalker_tpu.train.loop import DiffusionTrainer

    train_cache, _test, vocab = _caches()
    cfg = _exp_cfg(vocab.n_words, batch_size=128, ckpt_dir=OUT / "diff_probe2",
                   dtype="bf16")
    cfg = dataclasses.replace(cfg, rvq_ckpts=tuple(json.loads(
        (OUT / "rvq_ckpts.json").read_text())))
    trainer = DiffusionTrainer(cfg, train_cache)
    ds = trainer.device_dataset()
    idx = next(iter(ds.epoch_indices(0)))
    batch = jax.block_until_ready(jax.tree.map(lambda a: a[idx], ds.arrays))
    print(json.dumps({"batch_shapes": {k: list(v.shape) + [str(v.dtype)]
                                       for k, v in batch.items()}}), flush=True)

    # --- rebuild the exact featurize the trainer fused in ---------------
    from syntalker_tpu.data import joints as J
    from syntalker_tpu.data.features import pose_to_part_rot6d
    from syntalker_tpu.train.diffusion_trainer import make_latent_encoder

    encode_latent = make_latent_encoder(
        trainer.rvq, trainer.stats, latent_scale=cfg.latent_scale)

    def featurize(b):
        pose_aa = b["pose"][..., : J.AXIS_ANGLE_DIM]
        parts = pose_to_part_rot6d(pose_aa)
        latent_in = encode_latent(
            parts["upper"], parts["hands"], parts["lower"], b["trans_v"])
        return {"latent_in": latent_in, "audio": b["audio"], "word": b["word"]}

    t0 = time.time()
    f_feat = jax.jit(featurize)
    feat_batch = jax.block_until_ready(f_feat(batch))
    print(json.dumps({"featurize_compile_s": round(time.time() - t0, 1)}),
          flush=True)
    s = chain_time(f_feat, batch, get=lambda o: o["latent_in"])
    print(json.dumps({"featurize_s_per_call": round(s, 4)}), flush=True)

    # --- rot6d alone -----------------------------------------------------
    f_rot = jax.jit(lambda b: pose_to_part_rot6d(
        b["pose"][..., : J.AXIS_ANGLE_DIM])["upper"])
    s = chain_time(f_rot, batch)
    print(json.dumps({"rot6d_s_per_call": round(s, 4)}), flush=True)

    # --- RVQ encode with params as ARGUMENTS ------------------------------
    params_by_part = {k: v[1] for k, v in trainer.rvq.items()}
    modules = {k: v[0] for k, v in trainer.rvq.items()}
    stats = trainer.stats

    def encode_args(params3, b):
        pose_aa = b["pose"][..., : J.AXIS_ANGLE_DIM]
        parts = pose_to_part_rot6d(pose_aa)
        u = stats.normalize_part(parts["upper"], "upper")
        h = stats.normalize_part(parts["hands"], "hands")
        l = stats.normalize_part(parts["lower"], "lower")
        tv = (b["trans_v"] - stats.trans_mean) / stats.trans_std
        feats = {"upper": u, "hands": h,
                 "lower": jnp.concatenate([l, tv], axis=-1)}
        lat = [modules[n].apply({"params": params3[n]}, feats[n],
                                method="map2latent")
               for n in J.LATENT_SLICES]
        return jnp.concatenate(lat, axis=-1) / cfg.latent_scale

    f_args = jax.jit(encode_args)
    s = chain_time(f_args, params_by_part, batch)
    print(json.dumps({"featurize_args_s_per_call": round(s, 4)}), flush=True)

    # --- raw step on the pre-featurized batch, sustained config ----------
    from syntalker_tpu.diffusion.schedule import make_diffusion
    from syntalker_tpu.train.diffusion_trainer import (
        DiffusionTrainConfig, make_diffusion_train_step)

    raw_step = make_diffusion_train_step(
        trainer.mdm, trainer.diffusion, trainer.optimizer,
        DiffusionTrainConfig(cfg.pre_frames, cfg.latent_scale))
    f_step = jax.jit(raw_step)
    t0 = time.time()
    state2, m = f_step(trainer.state, feat_batch)
    jax.block_until_ready(m["predict_x0_loss"])
    print(json.dumps({"rawstep_compile_s": round(time.time() - t0, 1)}),
          flush=True)
    s0 = trainer.state
    t0 = time.time()
    for _ in range(20):
        s0, m = f_step(s0, feat_batch)
    jax.device_get(m["predict_x0_loss"])
    print(json.dumps({"rawstep_s_per_step": round((time.time() - t0) / 20, 4)}),
          flush=True)


if __name__ == "__main__":
    main()
