"""Root-cause the sustained-train step anomaly (round 5).

Round 4 fixed the closure-captured RVQ stack (featurize 70.5 -> 4.2 ms
as-args) yet the sustained loop still runs ~684 ms/step where
bench_train's chained-slope says the raw train step is ~34 ms @ b128
bf16. This probe builds the EXACT stage_diff trainer (same corpus, same
config, same checkpointed RVQs) and slope-times each layer of the real
path:

  A. step_indexed chain       (gather + featurize + train step, as shipped)
  B. step(host-batch) chain   (featurize + train step; batch pre-uploaded)
  C. bench-style raw step     (pre-featurized batch; the 34 ms anchor,
                               but with the sustained audio_norm='batch')
  D. featurize-only as-args

A-B isolates the on-device gather; B-C isolates featurize + the frozen
tree's per-dispatch cost; C anchors against BASELINE's sweep numbers.

Run AFTER outputs/sustained has its corpus + rvq ckpts:
    python scripts/probe_sustained_step.py [batch] [dtype]
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))


def slope(fn, n_long=20, n_short=5, reps=3):
    fn(2)  # warm
    out = {}
    for n in (n_short, n_long):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(n)
            ts.append(time.perf_counter() - t0)
        out[n] = min(ts)
    per = (out[n_long] - out[n_short]) / (n_long - n_short)
    return per, out


def main(b=128, dtype="bf16"):
    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import sustained_train as st
    from syntalker_tpu.train.loop import DiffusionTrainer

    train_cache, _test, vocab = st._caches()
    cfg = st._exp_cfg(vocab.n_words, batch_size=b,
                      ckpt_dir=st.OUT / "probe_ckpt", dtype=dtype)
    cfg = dataclasses.replace(cfg, rvq_ckpts=tuple(json.loads(
        (st.OUT / "rvq_ckpts.json").read_text())))
    trainer = DiffusionTrainer(cfg, train_cache)
    ds = trainer.device_dataset()
    idx = next(ds.epoch_indices(0))
    report = {"batch": b, "dtype": dtype, "windows": ds.n}

    with trainer.mesh:
        # ---- A: the shipped sustained path ----
        def chain_indexed(n):
            s = trainer.state
            for _ in range(n):
                s, m = trainer.step_indexed(s, ds.arrays, idx)
            jax.device_get(m["predict_x0_loss"])

        per, raw = slope(chain_indexed)
        report["A_step_indexed_ms"] = round(per * 1e3, 2)
        report["A_raw"] = {k: round(v, 3) for k, v in raw.items()}
        print(json.dumps({"A_step_indexed_ms": report["A_step_indexed_ms"],
                          "raw": report["A_raw"]}), flush=True)

        # ---- B: host-batch step (featurize included, no gather) ----
        batch = next(iter(trainer.loader.epoch(0)))
        dev_batch = jax.device_put(
            {k: batch[k] for k in trainer._batch_keys if k in batch})

        def chain_step(n):
            s = trainer.state
            for _ in range(n):
                s, m = trainer.step(s, dev_batch)
            jax.device_get(m["predict_x0_loss"])

        per, raw = slope(chain_step)
        report["B_step_hostbatch_ms"] = round(per * 1e3, 2)
        print(json.dumps({"B_step_hostbatch_ms": report["B_step_hostbatch_ms"],
                          "raw": {k: round(v, 3) for k, v in raw.items()}}),
              flush=True)

        # ---- D: featurize alone, frozen as args ----
        feat = jax.jit(trainer._featurize) if hasattr(trainer, "_featurize") \
            else None
        if feat is None:
            # featurize is a local closure; rebuild the same computation
            from syntalker_tpu.data import joints as J
            from syntalker_tpu.data.features import pose_to_part_rot6d
            from syntalker_tpu.train.diffusion_trainer import (
                make_latent_encoder_fn,
            )

            encode_latent = make_latent_encoder_fn(
                {n_: m for n_, (m, _p, _q) in trainer.rvq.items()},
                trainer.stats, latent_scale=cfg.latent_scale)

            def featurize(frozen, batch):
                import jax.numpy as jnp
                pose_aa = batch["pose"][..., : J.AXIS_ANGLE_DIM]
                parts = pose_to_part_rot6d(pose_aa)
                return encode_latent(frozen["rvq"], parts["upper"],
                                     parts["hands"], parts["lower"],
                                     batch["trans_v"])

            feat = jax.jit(featurize)

        def chain_feat(n):
            out = None
            for _ in range(n):
                out = feat(trainer._frozen, dev_batch)
            jax.device_get(out[0, 0, 0])

        per, raw = slope(chain_feat)
        report["D_featurize_ms"] = round(per * 1e3, 2)
        print(json.dumps({"D_featurize_ms": report["D_featurize_ms"]}),
              flush=True)

    # ---- C: bench-style raw step with the sustained audio_norm ----
    from bench_train import bench_diffusion, chained_slope

    step, state, bbatch = bench_diffusion(
        jax.random.PRNGKey(3), b=b, dtype=dtype,
        audio_norm=cfg.mdm.audio_norm, vocab_size=cfg.mdm.vocab_size)
    per = chained_slope(step, state, bbatch)
    report["C_raw_step_ms"] = round(per * 1e3, 2)
    print(json.dumps({"C_raw_step_ms": report["C_raw_step_ms"]}), flush=True)

    out_path = ROOT / "outputs" / "sustained" / "probe_step.json"
    out_path.write_text(json.dumps(report, indent=1))
    print(json.dumps(report))


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dt = sys.argv[2] if len(sys.argv) > 2 else "bf16"
    main(b, dt)
