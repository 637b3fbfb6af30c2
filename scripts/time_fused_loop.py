"""Batch-1 latency probe: XLA scan vs per-step fused vs full-loop fused.

The e2e bench's batch-1 path spends ~150 us per NFE step while the 8-block
stack alone is ~45 us — the rest is in/out projections, RoPE, the DDIM
update and the small-kernel dispatch boundaries between them. This probe
times the three samplers on the bench clip (16 windows x DDIM-50, full-size
MDM, random weights) on the real chip:

    python scripts/time_fused_loop.py [--batch 1]

1. sample_windows        — the XLA lax.scan path (current bench headline)
2. sample_windows_fused  — per-NFE-step fused block-stack kernel (serving)
3. sample_windows_fused_loop — whole 50-step loop in ONE kernel per window
"""

from __future__ import annotations

import argparse
import json
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    cache_dir = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from syntalker_tpu import generation as G
    from syntalker_tpu.data import joints as J
    from syntalker_tpu.diffusion.schedule import make_diffusion
    from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
    from syntalker_tpu.ops.mdm_pallas import (
        make_fused_ddim_window,
        make_fused_denoise,
    )

    rng = jax.random.PRNGKey(0)
    mdm_cfg = MDMConfig()
    mdm, mdm_params = create_mdm(mdm_cfg, rng, frames=128)
    diffusion = make_diffusion(
        schedule="cosine", steps=1000, timestep_respacing="ddim50"
    )

    b = args.batch
    plan = G.plan_windows(1906)
    audio = np.random.default_rng(0).normal(
        size=(b, 533 * plan.n_frames, 2)
    ).astype(np.float32)
    words = np.zeros((b, plan.n_frames), np.int32)
    aw = jnp.asarray(G.window_audio(audio, plan))
    ww = jnp.asarray(G.window_words(words, plan))
    seed0 = jnp.zeros((b, plan.pre_frames, J.LATENT_DIM))
    key = jax.random.PRNGKey(1)

    results = {}

    def timeit(name, fn):
        t0 = time.perf_counter()
        out = jax.device_get(fn())
        warm = time.perf_counter() - t0
        assert np.isfinite(out).all(), name
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = jax.device_get(fn())
            ts.append(time.perf_counter() - t0)
        med = statistics.median(ts)
        results[name] = {
            "wall_s": round(med, 4),
            "ms_per_window": round(med / plan.num_windows * 1e3, 3),
            "warm_s": round(warm, 1),
            "runs": [round(t, 4) for t in ts],
        }
        print(f"{name}: {json.dumps(results[name])}", flush=True)
        return out

    # params/inputs as ARGUMENTS — a nullary closure would inline ~25 MB of
    # weights as HLO constants and stall the remote compiler (CLAUDE.md)
    xla = jax.jit(
        lambda p, a, w, s, k: G.sample_windows(
            mdm, p, diffusion, plan, a, w, s, k, sampler="ddim"
        )
    )
    ref = timeit("xla_scan", lambda: xla(mdm_params, aw, ww, seed0, key))

    fused_step = make_fused_denoise(mdm_cfg, mdm_params, tile_samples=1)
    out = timeit(
        "fused_per_step",
        lambda: G.sample_windows_fused(
            mdm, mdm_params, diffusion, plan, aw, ww, seed0, key,
            fused=fused_step,
        ),
    )
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    results["fused_per_step"]["rel_err_vs_xla"] = round(float(err), 4)

    sampler = G.make_fused_loop_sampler(mdm, mdm_params, diffusion, plan)
    out = timeit("fused_full_loop", lambda: sampler(aw, ww, seed0, key))
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    results["fused_full_loop"]["rel_err_vs_xla"] = round(float(err), 4)

    print(json.dumps({"batch": b, "windows": plan.num_windows, **results}))


if __name__ == "__main__":
    main()
