"""One-off: slope-timed arms for the sustained-train 0.68 s/step mystery.

probe_featurize.py showed featurize with RVQ params CLOSED OVER costs
70.5 ms/call vs 4.2 ms with params as ARGUMENTS, and a raw-step average of
2.085 s/step — but that average was a single 20-step chain that includes
the one-time executable load onto the remote runtime. This probe times
every arm by chained-SLOPE (marginal cost between a 5- and a 20-step
chain, min of 3 reps, one readback per chain), the only methodology that
survives the tunnel (CLAUDE.md):

  A. trainer.step_indexed   — production path (gather + featurize in-jit,
                              RVQ params closed over as HLO constants)
  B. trainer.step           — fixed pre-gathered batch, featurize in-jit
  C. raw step               — pre-featurized batch (no featurize at all)
  D. raw step, bench config — bench_train's synthetic batch + default
                              MDMConfig for cross-checking C
  E. fused step, RVQ params as ARGUMENTS (no big HLO constants)

    python scripts/probe_step_arms.py
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


def slope(step_fn, state, batch, *, n_long=20, n_short=5, reps=3):
    import jax

    def chain(n):
        s = state
        for _ in range(n):
            s, m = step_fn(s, batch)
        jax.device_get(m["predict_x0_loss"])

    chain(2)  # warm: compile hit + executable load + layout settle
    times = {}
    for n in (n_short, n_long):
        rs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            chain(n)
            rs.append(time.perf_counter() - t0)
        times[n] = min(rs)
    per = (times[n_long] - times[n_short]) / (n_long - n_short)
    return per, times


def main():
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from syntalker_tpu.train.loop import DiffusionTrainer

    train_cache, _test, vocab = _caches()
    cfg = _exp_cfg(vocab.n_words, batch_size=128, ckpt_dir=OUT / "diff_probe3",
                   dtype="bf16")
    cfg = dataclasses.replace(cfg, rvq_ckpts=tuple(json.loads(
        (OUT / "rvq_ckpts.json").read_text())))
    trainer = DiffusionTrainer(cfg, train_cache)

    rvq_bytes = sum(
        np.prod(a.shape) * a.dtype.itemsize
        for _, params, _ in trainer.rvq.values()
        for a in jax.tree.leaves(params))
    print(json.dumps({"rvq_param_mb": round(rvq_bytes / 1e6, 1)}), flush=True)

    ds = trainer.device_dataset()
    idxs = list(ds.epoch_indices(0))
    batch = jax.block_until_ready(jax.tree.map(lambda a: a[idxs[0]], ds.arrays))

    with trainer.mesh:
        # --- A: production indexed step --------------------------------
        def stepA(s, b):
            return trainer.step_indexed(s, ds.arrays, idxs[0])

        per, times = slope(stepA, trainer.state, None)
        print(json.dumps({"A_step_indexed_s": round(per, 4),
                          "chains": times}), flush=True)

        # --- B: fixed batch, featurize in-jit ---------------------------
        per, times = slope(trainer.step, trainer.state, batch)
        print(json.dumps({"B_fixed_batch_s": round(per, 4),
                          "chains": times}), flush=True)

        # --- C: raw step on pre-featurized batch ------------------------
        from syntalker_tpu.train.diffusion_trainer import (
            DiffusionTrainConfig, make_diffusion_train_step)

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
            return {"latent_in": latent_in, "audio": b["audio"],
                    "word": b["word"]}

        feat_batch = jax.block_until_ready(jax.jit(featurize)(batch))
        raw = jax.jit(make_diffusion_train_step(
            trainer.mdm, trainer.diffusion, trainer.optimizer,
            DiffusionTrainConfig(cfg.pre_frames, cfg.latent_scale)))
        per, times = slope(raw, trainer.state, feat_batch)
        print(json.dumps({"C_raw_step_s": round(per, 4),
                          "chains": times}), flush=True)

        # --- E: fused step with RVQ params as arguments ------------------
        params3 = {k: v[1] for k, v in trainer.rvq.items()}
        modules = {k: v[0] for k, v in trainer.rvq.items()}
        stats = trainer.stats
        import jax.numpy as jnp

        def featurize_args(p3, b):
            pose_aa = b["pose"][..., : J.AXIS_ANGLE_DIM]
            parts = pose_to_part_rot6d(pose_aa)
            u = stats.normalize_part(parts["upper"], "upper")
            h = stats.normalize_part(parts["hands"], "hands")
            lo = stats.normalize_part(parts["lower"], "lower")
            tv = (b["trans_v"] - stats.trans_mean) / stats.trans_std
            feats = {"upper": u, "hands": h,
                     "lower": jnp.concatenate([lo, tv], axis=-1)}
            lat = [modules[n].apply({"params": p3[n]}, feats[n],
                                    method="map2latent")
                   for n in J.LATENT_SLICES]
            latent_in = jnp.concatenate(lat, axis=-1) / cfg.latent_scale
            return {"latent_in": latent_in, "audio": b["audio"],
                    "word": b["word"]}

        raw_unjit = make_diffusion_train_step(
            trainer.mdm, trainer.diffusion, trainer.optimizer,
            DiffusionTrainConfig(cfg.pre_frames, cfg.latent_scale))

        fused_args = jax.jit(
            lambda s, p3, b: raw_unjit(s, featurize_args(p3, b)))

        def stepE(s, b):
            return fused_args(s, params3, b)

        per, times = slope(stepE, trainer.state, batch)
        print(json.dumps({"E_fused_args_s": round(per, 4),
                          "chains": times}), flush=True)

    # --- D: bench cross-check (default MDMConfig, synthetic batch) ------
    from bench_train import bench_diffusion, chained_slope

    step, state, bbatch = bench_diffusion(
        jax.random.PRNGKey(3), b=128, dtype="bf16")
    per = chained_slope(step, state, bbatch)
    print(json.dumps({"D_bench_raw_s": round(per, 4)}), flush=True)


if __name__ == "__main__":
    main()
