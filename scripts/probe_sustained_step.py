"""One-off: where do the sustained-train 0.68 s/step go? (round 4)

Builds the EXACT stage_diff trainer (same corpus cache, same bf16 b128
config, device-resident dataset) and times, separately:

  1. chained step_indexed x N, ONE final sync  -> device+dispatch slope
  2. the same with a per-25-step float() pull   -> the stage_diff loop shape
  3. the pure raw step on a FIXED pre-gathered batch (no index gather)

    python scripts/probe_sustained_step.py
"""

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))

from sustained_train import OUT, _caches, _exp_cfg  # noqa: E402


def main():
    import dataclasses

    import jax

    from syntalker_tpu.train.loop import DiffusionTrainer

    train_cache, _test, vocab = _caches()
    cfg = _exp_cfg(vocab.n_words, batch_size=128, ckpt_dir=OUT / "diff_probe",
                   dtype="bf16")
    cfg = dataclasses.replace(cfg, rvq_ckpts=tuple(json.loads(
        (OUT / "rvq_ckpts.json").read_text())))
    trainer = DiffusionTrainer(cfg, train_cache)
    t0 = time.time()
    ds = trainer.device_dataset()
    print(json.dumps({"upload_s": round(time.time() - t0, 1)}), flush=True)
    idxs = list(ds.epoch_indices(0)) + list(ds.epoch_indices(1))

    with trainer.mesh:
        # compile + settle
        t0 = time.time()
        state, metrics = trainer.step_indexed(trainer.state, ds.arrays, idxs[0])
        print(json.dumps(
            {"compile_s": round(time.time() - t0, 1),
             "first_loss": float(metrics["predict_x0_loss"])}), flush=True)

        def chained(n, pull_every=None):
            s = state
            t0 = time.time()
            for i in range(n):
                s, m = trainer.step_indexed(s, ds.arrays, idxs[i % len(idxs)])
                if pull_every and (i + 1) % pull_every == 0:
                    float(m["predict_x0_loss"])
            jax.device_get(m["predict_x0_loss"])
            return (time.time() - t0) / n

        for tag, n, pull in (("warm3", 3, None), ("chain20", 20, None),
                             ("chain20_pull25", 20, 25),
                             ("chain40", 40, None)):
            print(json.dumps({tag + "_s_per_step": round(chained(n, pull), 4)}),
                  flush=True)

        # fixed batch: no on-device gather, featurize still in-jit
        batch = jax.tree.map(lambda a: a[idxs[0]], ds.arrays)
        batch = jax.block_until_ready(batch)
        t0 = time.time()
        s, m = trainer.step(state, batch)
        jax.device_get(m["predict_x0_loss"])
        print(json.dumps({"fixed_compile_s": round(time.time() - t0, 1)}),
              flush=True)
        s = state
        t0 = time.time()
        for i in range(20):
            s, m = trainer.step(s, batch)
        jax.device_get(m["predict_x0_loss"])
        print(json.dumps({"fixed_chain20_s_per_step":
                          round((time.time() - t0) / 20, 4)}), flush=True)


if __name__ == "__main__":
    main()
