"""End-to-end benchmark: audio→motion generation throughput on one chip.

Measures the flagship inference path of the shipped SynTalker config
(diffusion_rvqvae_128 + ddim50): a 1906-frame (63.5 s @ 30 fps) clip — the
length of the reference demo example — generated as 16 autoregressive
windows of 128 frames, each window = conditioning encode + 50-step DDIM
scan over the full-size MDM (8 blocks, 512-d), then RVQ snap+decode of all
three body parts and rot6d→axis-angle recovery.

Reported metric: realtime factor (seconds of motion generated per second of
wallclock). `vs_baseline`: the reference demo pipeline reports 1–4 minutes
per clip on GPU (demo.py:744-747); using the favourable 60 s sampling-only
estimate for this clip length gives a baseline realtime factor of ~1.06.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    # persistent compilation cache: the big windowed-sampler program takes
    # minutes to compile cold; repeated bench runs hit the cache.
    import pathlib

    cache_dir = pathlib.Path(__file__).parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from syntalker_tpu import generation as G
    from syntalker_tpu.data import joints as J
    from syntalker_tpu.data.stats import identity_pose_stats
    from syntalker_tpu.diffusion.schedule import make_diffusion
    from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
    from syntalker_tpu.models.rvqvae import RVQVAEConfig, create_rvqvae
    from syntalker_tpu.ops.quantize import RVQConfig, rvq_forward

    rng = jax.random.PRNGKey(0)

    # full-size models (random weights; compute cost is weight-independent)
    mdm_cfg = MDMConfig()
    mdm, mdm_params = create_mdm(mdm_cfg, rng, frames=128)
    diffusion = make_diffusion(schedule="cosine", steps=1000, timestep_respacing="ddim50")

    rvq_modules = {}
    for i, (name, dim) in enumerate([("upper", 78), ("hands", 180), ("lower", 57)]):
        cfg = RVQVAEConfig(input_dim=dim, quantizer=RVQConfig())
        module, params, state = create_rvqvae(cfg, jax.random.fold_in(rng, i))
        z = jax.random.normal(jax.random.fold_in(rng, 100 + i), (1, 600, 512))
        state = rvq_forward(z, state, cfg.quantizer, train=True,
                            rng=jax.random.fold_in(rng, 200 + i)).state
        rvq_modules[name] = (module, params, state)

    n_frames = 1906
    plan = G.plan_windows(n_frames)
    motion_seconds = plan.out_latent_frames * 4 / 30.0

    b = 1
    audio = np.random.default_rng(0).normal(size=(b, 533 * plan.n_frames, 2)).astype(np.float32)
    words = np.zeros((b, plan.n_frames), np.int32)
    aw = jnp.asarray(G.window_audio(audio, plan))
    ww = jnp.asarray(G.window_words(words, plan))
    seed0 = jnp.zeros((b, plan.pre_frames, J.LATENT_DIM))
    stats = identity_pose_stats()

    @jax.jit
    def e2e(aw, ww, seed0, key):
        latents = G.sample_windows(
            mdm, mdm_params, diffusion, plan, aw, ww, seed0, key, sampler="ddim"
        )
        out = G.decode_latents(latents, rvq_modules=rvq_modules, stats=stats)
        return out["axis_angle"], out["trans"]

    # warmup/compile. NOTE: timings use jax.device_get (full host readback)
    # rather than block_until_ready — on tunneled backends only a readback
    # guarantees execution completed, and the real pipeline materializes
    # outputs to host anyway (npz export).
    t0 = time.perf_counter()
    out = jax.device_get(e2e(aw, ww, seed0, jax.random.PRNGKey(1)))
    compile_s = time.perf_counter() - t0

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = jax.device_get(e2e(aw, ww, seed0, jax.random.PRNGKey(2 + i)))
        times.append(time.perf_counter() - t0)
    wall = min(times)
    assert all(map(lambda a: np.isfinite(a).all(), out)), "non-finite output"

    realtime = motion_seconds / wall
    baseline_realtime = 63.5 / 60.0  # see module docstring
    result = {
        "metric": "e2e_audio2motion_realtime_1chip",
        "value": round(realtime, 3),
        "unit": "x_realtime(ddim50,128f-windows)",
        "vs_baseline": round(realtime / baseline_realtime, 2),
    }
    print(json.dumps(result))
    # side-channel detail (not the parsed line)
    import sys

    print(
        f"# {motion_seconds:.1f}s motion in {wall:.2f}s wall "
        f"({plan.num_windows} windows x 50 NFE; compile {compile_s:.1f}s)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
