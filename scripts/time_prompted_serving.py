"""Measured ms/window for PROMPTED batched serving (VERDICT r4 #5, last leg).

The prompted service path (per-part text-prompt CFG + optional style —
reference diffusion/cfg_sampler.py:57-117 x test_h3d.py:196-246) runs
`generation.sample_windows` with batch-stacked CFG branches: one prompted
part costs 3 model branches per NFE step (uncond / audio / audio+prompt),
so its compute per request is ~3x the unprompted lean path at equal batch.
This probe measures the real service surface end-to-end: full-size MDM
(use_prompt=True), full-size RVQ decode, single-window requests, timed
through `MotionGenerationService.flush()` (includes host prep + readback,
like production) with a warm executable.

Prints one JSON line per configuration:
  {"path": "prompted"|"lean", "batch": B, "ms_per_window": ..., ...}

Run: python scripts/time_prompted_serving.py [--batches 16,64]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(batches, tiny=False):
    import jax

    cache_dir = pathlib.Path(__file__).parents[1] / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from syntalker_tpu.config import body_part_rvq_config
    from syntalker_tpu.data.stats import identity_pose_stats
    from syntalker_tpu.diffusion.schedule import make_diffusion
    from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
    from syntalker_tpu.models.rvqvae import create_rvqvae
    from syntalker_tpu.ops.quantize import RVQConfig, rvq_forward
    from syntalker_tpu.serving import MotionGenerationService, MotionRequest

    rng = jax.random.PRNGKey(0)
    if tiny:  # CPU smoke of the probe itself, not a perf config
        cfg = MDMConfig(latent_dim=32, ff_size=64, num_layers=1, num_heads=2,
                        rope_heads=4, audio_feat_dim=16, word_feat_dim=16,
                        word_embed_dim=8, vocab_size=64, use_prompt=True,
                        prompt_dim=8)
        diffusion = make_diffusion(steps=4)
        q = RVQConfig(num_quantizers=2, nb_code=16, code_dim=512)
    else:
        cfg = MDMConfig(use_prompt=True)
        diffusion = make_diffusion(
            schedule="cosine", steps=1000, timestep_respacing="ddim50"
        )
        q = RVQConfig()
    mdm, params = create_mdm(cfg, rng, frames=128)
    rvq = {}
    for i, part in enumerate(("upper", "hands", "lower")):
        rcfg = body_part_rvq_config(
            part, quantizer=q, **({"width": 32, "depth": 1} if tiny else {}))
        module, p, state = create_rvqvae(rcfg, jax.random.fold_in(rng, i))
        z = jax.random.normal(jax.random.fold_in(rng, 100 + i), (1, 600, 512))
        state = rvq_forward(z, state, q, train=True,
                            rng=jax.random.fold_in(rng, 200 + i)).state
        rvq[part] = (module, p, state)

    g = np.random.default_rng(0)
    results = []
    for bs in batches:
        svc = MotionGenerationService(
            mdm=mdm, mdm_params=params, diffusion=diffusion,
            rvq_modules=rvq, stats=identity_pose_stats(),
            max_batch=bs, max_seconds=128 / 30,  # single window
        )

        def run_flush(prompted, n_timed=3):
            def enqueue():
                for i in range(bs):
                    kw = {}
                    if prompted:
                        kw = dict(
                            prompts={"upper": g.normal(
                                0, 1, cfg.prompt_dim).astype(np.float32)},
                            guidance={"audio_scale": 1.0, "prompt_scale": 4.0},
                        )
                    svc.submit(MotionRequest(
                        audio=g.normal(0, 0.1, 16000 * 4).astype(np.float32),
                        request_id=f"r{i}", **kw))

            enqueue()
            t0 = time.perf_counter()
            svc.flush()  # warm (compile on first call)
            warm = time.perf_counter() - t0
            ts = []
            for _ in range(n_timed):
                enqueue()
                t0 = time.perf_counter()
                svc.flush()
                ts.append(time.perf_counter() - t0)
            return statistics.median(ts), warm

        for path in ("prompted", "lean"):
            wall, warm = run_flush(path == "prompted")
            row = {
                "path": path, "batch": bs,
                "ms_per_window": round(wall / bs * 1e3, 3),
                "flush_wall_s": round(wall, 4),
                "motion_s_per_s": round(bs * (128 / 30.0) / wall, 1),
                "warm_s": round(warm, 1),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,64")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny-model CPU smoke of the probe itself")
    a = ap.parse_args()
    main([int(b) for b in a.batches.split(",")], tiny=a.tiny)
