"""Sustained full-pipeline training on the scaled synthetic corpus, with a
deliberate mid-run SIGKILL + orbax resume (VERDICT r3 #7).

Pipeline: 64-clip / 8-speaker / variable-length BEAT2-layout corpus →
cache → 3 body-part RVQ-VAEs → diffusion (bf16 fast-training config,
audio_norm='batch', batch at the round-4 sweep knee). The diffusion stage
runs as a SUBPROCESS that the orchestrator SIGKILLs partway through; the
rerun restores the full train state (params + optimizer + batch_stats +
step) from the latest orbax checkpoint and must continue the loss curve
without a discontinuity (asserted from the per-step loss log).

The orchestrator arms the SIGKILL only after the child has written its
first orbax checkpoint (plus a grace window), so the resumed run always
has state to restore and the continuity assertion always has loss rows on
both sides of the resume step.

Outputs: outputs/sustained/report.json + docs/sustained_train_round5.md.

    python scripts/sustained_train.py                  # full run (~1-2 h)
    python scripts/sustained_train.py --quick          # minutes (CI-scale)
    python scripts/sustained_train.py --stage diff ... # internal child
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

OUT = ROOT / "outputs" / "sustained"
REF_MEAN_STD = "/root/reference/mean_std"
NPZ = "/root/reference/demo/examples/2_scott_0_1_1.npz"
WAV = "/root/reference/demo/examples/2_scott_0_1_1.wav"
SPEAKERS = tuple(range(1, 9))


def _exp_cfg(vocab_n, *, batch_size, ckpt_dir, dtype="bf16"):
    import jax.numpy as jnp

    from syntalker_tpu.config import (
        DataConfig, DiffusionConfig, ExperimentConfig, TrainConfig,
    )
    from syntalker_tpu.models.denoiser import MDMConfig

    kw = {}
    if dtype == "bf16":
        kw = dict(dtype=jnp.bfloat16, audio_dtype=jnp.bfloat16)
    mdm_cfg = MDMConfig(vocab_size=max(vocab_n, 16), audio_norm="batch", **kw)
    return ExperimentConfig(
        data=DataConfig(
            data_path=str(OUT / "beat2_synth"), cache_path=str(OUT / "cache"),
            mean_std_dir=REF_MEAN_STD,
        ),
        mdm=mdm_cfg,
        diffusion=DiffusionConfig(),
        train=TrainConfig(batch_size=batch_size, ckpt_dir=str(ckpt_dir),
                          log_period=50, device_data=True),
    )


def _caches():
    from syntalker_tpu.data.beat_builder import build_beat_cache
    from syntalker_tpu.data.cache import ClipConfig

    train_cache, vocab = build_beat_cache(
        OUT / "beat2_synth", OUT / "cache", split="train", speakers=SPEAKERS,
        cfg=ClipConfig(pose_length=128, stride=64),
    )
    test_cache, _ = build_beat_cache(
        OUT / "beat2_synth", OUT / "cache", split="test", speakers=SPEAKERS,
        cfg=ClipConfig(pose_length=128), vocab=vocab,
    )
    return train_cache, test_cache, vocab


# --------------------------------------------------------------------------
# child stage: diffusion training with per-step loss log + periodic ckpt
# --------------------------------------------------------------------------

def stage_diff(args):
    import jax

    from syntalker_tpu.train import state as ts
    from syntalker_tpu.train.loop import DiffusionTrainer

    train_cache, _test, vocab = _caches()
    import dataclasses

    cfg = _exp_cfg(vocab.n_words, batch_size=args.batch,
                   ckpt_dir=OUT / "diff", dtype=args.dtype)
    cfg = dataclasses.replace(cfg, rvq_ckpts=tuple(json.loads(
        (OUT / "rvq_ckpts.json").read_text())))
    trainer = DiffusionTrainer(cfg, train_cache)
    start = trainer.maybe_resume()
    # device-resident dataset: the whole corpus is uploaded once and batches
    # are gathered on-device — through the 42 MB/s tunnel the per-step batch
    # transfer (~1.4 s at batch 128) otherwise dominates the 34 ms step
    t0 = time.time()
    ds = trainer.device_dataset()
    upload_s = time.time() - t0
    steps_per_epoch = len(ds)
    log_path = OUT / "diff_loss.jsonl"
    step = start
    # timing split (honest names): dispatch = async enqueue cost of the
    # jitted step (host-side); sync = blocking device readbacks (absorbs
    # the actual device execution backlog every 25 steps); host = the rest
    # of the Python loop (index generation, logging, ckpt I/O).
    t_dispatch = 0.0
    t_sync = 0.0
    t_run0 = time.time()
    with open(log_path, "a") as logf, trainer.mesh:
        if start > 0:
            logf.write(json.dumps({"resume_marker": start}) + "\n")
            logf.flush()
        ep = start // steps_per_epoch
        while step < args.steps:
            skip = step - ep * steps_per_epoch  # mid-epoch resume offset
            for it, idx in enumerate(ds.epoch_indices(ep)):
                if it < skip:
                    continue
                t0 = time.time()
                trainer.state, metrics = trainer.step_indexed(
                    trainer.state, ds.arrays, idx)
                t_dispatch += time.time() - t0
                step += 1
                if step % 25 == 0 or step == args.steps:
                    t0 = time.time()
                    loss = float(metrics["predict_x0_loss"])  # blocks
                    t_sync += time.time() - t0
                    row = {"step": step, "loss": loss,
                           "t": round(time.time() - t_run0, 1)}
                    logf.write(json.dumps(row) + "\n")
                    logf.flush()
                    if step % 200 == 0:
                        print(json.dumps(row), flush=True)
                if step % args.save_every == 0 or step == args.steps:
                    trainer.save(step)
                if step >= args.steps:
                    break
            ep += 1
    wall = time.time() - t_run0
    done = step - start
    host = max(wall - t_dispatch - t_sync, 0.0)
    summary = {
        "resumed_from": start, "end_step": step, "wall_s": round(wall, 1),
        "dataset_upload_s": round(upload_s, 1),
        "s_per_step_incl_host": round(wall / max(done, 1), 4),
        "dispatch_s_per_step": round(t_dispatch / max(done, 1), 4),
        "device_sync_s_per_step": round(t_sync / max(done, 1), 4),
        "host_s_per_step": round(host / max(done, 1), 4),
        "device_utilization_lower_bound": round(
            (t_dispatch + t_sync) / max(wall, 1e-9), 4),
    }
    (OUT / f"diff_run_{start}.json").write_text(json.dumps(summary))
    print(json.dumps(summary))


# --------------------------------------------------------------------------
# orchestrator
# --------------------------------------------------------------------------

def main(args):
    import jax

    from syntalker_tpu.config import RVQTrainConfig
    from syntalker_tpu.data.synthetic import make_corpus
    from syntalker_tpu.train.loop import RVQTrainer

    OUT.mkdir(parents=True, exist_ok=True)
    report = {"config": {"quick": args.quick, "dtype": args.dtype,
                         "batch": args.batch, "steps": args.steps}}

    # ---- 1. corpus (64 clips / 8 speakers / 8-30 s heterogeneous) ----
    corpus_root = OUT / "beat2_synth"
    if not (corpus_root / "train_test_split.csv").exists():
        t0 = time.time()
        ids = make_corpus(
            corpus_root, speakers=SPEAKERS, clips_per_speaker=8,
            seconds_range=(8, 30), base_npz=NPZ, base_wav=WAV, seed=0,
        )
        report["corpus"] = {"clips": len(ids), "seconds": time.time() - t0}
        print(json.dumps(report["corpus"]), flush=True)

    t0 = time.time()
    train_cache, test_cache, vocab = _caches()
    report["cache"] = {
        "build_seconds": round(time.time() - t0, 1),
        "train_windows": len(train_cache),
        "train_clips": len({w.clip for w in train_cache.windows}),
        "test_clips": len(test_cache),
    }
    print(json.dumps(report["cache"]), flush=True)

    # ---- 2. RVQ x3 (resume at stage granularity) ----
    ckpts_file = OUT / "rvq_ckpts.json"
    if not ckpts_file.exists():
        rvq_ckpts = []
        t0 = time.time()
        for part in ("upper", "hands", "lower"):
            import dataclasses

            cfg = _exp_cfg(vocab.n_words, batch_size=256,
                           ckpt_dir=OUT / f"rvq_{part}", dtype=args.dtype)
            cfg = dataclasses.replace(cfg, rvq_train=RVQTrainConfig(
                batch_size=256, body_part=part, save_every=10**9))
            tr = RVQTrainer(cfg, train_cache)
            tr.train(total_iters=args.rvq_iters)
            rvq_ckpts.append(str(tr.save(args.rvq_iters)))
            print(f"rvq {part} done", flush=True)
        report["rvq_seconds"] = round(time.time() - t0, 1)
        ckpts_file.write_text(json.dumps(rvq_ckpts))

    # ---- 3. diffusion as a killable subprocess ----
    child = [sys.executable, __file__, "--stage", "diff",
             "--steps", str(args.steps), "--batch", str(args.batch),
             "--dtype", args.dtype, "--save-every", str(args.save_every)]
    log = open(OUT / "diff_child.log", "a")
    if not args.no_kill and not (OUT / "killed.marker").exists():
        from syntalker_tpu.train import state as ts

        print(f"[orchestrator] launching diffusion; SIGKILL {args.kill_grace}s "
              f"after the first checkpoint (max wait {args.kill_after}s)",
              flush=True)
        proc = subprocess.Popen(child, stdout=log, stderr=subprocess.STDOUT)
        # arm the kill only once a checkpoint exists to resume from — a
        # fixed timer can land during compile/before the first save, which
        # leaves the rerun nothing to restore (the round-4 failure mode)
        t0 = time.time()
        ckpt_seen = None
        while time.time() - t0 < args.kill_after and proc.poll() is None:
            ckpt_seen = ts.latest_checkpoint(str(OUT / "diff"))
            if ckpt_seen:
                break
            time.sleep(5)
        if proc.poll() is None and ckpt_seen:
            time.sleep(args.kill_grace)  # let some post-ckpt steps land
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)  # by PID — never by pattern
        proc.wait()
        (OUT / "killed.marker").write_text(
            f"killed after ckpt {ckpt_seen} at {time.time()}")
        report["killed_after_ckpt"] = str(ckpt_seen)
    elif (OUT / "killed.marker").exists():
        # the kill already happened (possibly in a prior orchestrator run
        # that crashed before the relaunch) — carry its record forward
        report["killed_after_ckpt"] = (OUT / "killed.marker").read_text().strip()
    print("[orchestrator] (re)launching diffusion to completion", flush=True)
    rc = subprocess.run(child, stdout=log, stderr=subprocess.STDOUT).returncode
    if rc != 0:
        raise RuntimeError(f"diffusion child failed rc={rc}")

    # ---- 4. loss-curve continuity across the kill ----
    # the loss log is append-only across runs; the resumed child writes a
    # {"resume_marker": step} line, which cleanly separates pre-kill rows
    # from post-resume rows (the pre-kill run usually got past the ckpt
    # step before dying, so step ranges alone would overlap)
    lines = [json.loads(ln)
             for ln in (OUT / "diff_loss.jsonl").read_text().splitlines()]
    marker_i = max((i for i, r in enumerate(lines) if "resume_marker" in r),
                   default=None)
    runs = sorted(OUT.glob("diff_run_*.json"),
                  key=lambda p: int(p.stem.split("_")[-1]))
    resume_step = lines[marker_i]["resume_marker"] if marker_i is not None else None
    report["resume_step"] = resume_step
    rows_pre = ([r for r in lines[:marker_i] if "step" in r]
                if marker_i is not None else [])
    rows_post = ([r for r in lines[marker_i + 1:] if "step" in r]
                 if marker_i is not None else [r for r in lines if "step" in r])
    if resume_step:
        before = [r["loss"] for r in rows_pre
                  if resume_step - 500 <= r["step"] <= resume_step]
        after = [r["loss"] for r in rows_post
                 if resume_step < r["step"] <= resume_step + 500]
        if not before or not after:
            # kill landed during compile (no steps before the resume) or at
            # the very last step (none after) — nothing to compare
            report["continuity"] = {"skipped": "no loss rows on one side "
                                               f"of resume step {resume_step}"}
        else:
            mb, ma = float(np.mean(before)), float(np.mean(after))
            sd = float(np.std([r["loss"] for r in rows_pre
                               if resume_step - 1000 <= r["step"] <= resume_step]
                              or [0.1]))
            report["continuity"] = {
                "mean_loss_before": mb, "mean_loss_after": ma,
                "window_std": sd, "ok": bool(ma <= mb + 3 * max(sd, 0.01)),
            }
            assert report["continuity"]["ok"], report["continuity"]
    losses = [r["loss"] for r in rows_pre + rows_post]
    report["diffusion"] = {
        "first_loss": losses[0], "last_loss": float(np.mean(losses[-10:])),
        "total_steps": rows_post[-1]["step"] if rows_post else None,
        **json.loads(runs[-1].read_text()),
    }

    # ---- 5. batched eval over held-out clips ----
    from syntalker_tpu.cli.test import build_evaluator
    from syntalker_tpu.data.stats import compute_mean_velocity_from_clips
    from syntalker_tpu.ops.smplx import synthetic_smplx_model
    from syntalker_tpu.train import state as ts

    smplx_model = synthetic_smplx_model()
    mean_vel = compute_mean_velocity_from_clips(
        list(test_cache.clips.values()), smplx_model)
    import dataclasses

    eval_cfg = _exp_cfg(vocab.n_words, batch_size=16, ckpt_dir=OUT / "diff",
                        dtype=args.dtype)
    eval_cfg = dataclasses.replace(
        eval_cfg,
        rvq_ckpts=tuple(json.loads(ckpts_file.read_text())),
        test_ckpt=str(ts.latest_checkpoint(str(OUT / "diff"))),
    )
    evaluator = build_evaluator(eval_cfg, smplx_model, "", mean_vel)
    t0 = time.time()
    result = evaluator.evaluate(test_cache, jax.random.PRNGKey(999),
                                batch_clips=2)
    report["eval"] = result.as_dict()
    report["eval"]["wall_seconds"] = round(time.time() - t0, 1)

    (OUT / "report.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["all", "diff"], default="all")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--rvq-iters", type=int, default=None)
    ap.add_argument("--save-every", type=int, default=None)
    ap.add_argument("--kill-after", type=float, default=None,
                    help="max seconds to wait for the first checkpoint")
    ap.add_argument("--kill-grace", type=float, default=None,
                    help="seconds to keep training past the first ckpt")
    ap.add_argument("--no-kill", action="store_true")
    args = ap.parse_args()
    if args.steps is None:
        args.steps = 400 if args.quick else 40000
    if args.rvq_iters is None:
        args.rvq_iters = 300 if args.quick else 20000
    if args.save_every is None:
        args.save_every = 100 if args.quick else 2000
    if args.kill_after is None:
        args.kill_after = 300 if args.quick else 2400
    if args.kill_grace is None:
        args.kill_grace = 15 if args.quick else 60
    if args.stage == "diff":
        stage_diff(args)
    else:
        main(args)
