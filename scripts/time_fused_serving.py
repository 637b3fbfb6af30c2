"""Focused timing of the fused Pallas serving denoise (batch 256).

Times the 50-NFE loop for several tile_samples values and prints
ms/window + MFU per configuration. Used to iterate on the kernel without
paying bench.py's full e2e path. Two modes:

- default: the per-step fused stack (`make_fused_denoise`), 50 host
  dispatches per loop;
- ``--loop``: the full-NFE-loop kernel (`make_fused_ddim_window`), the
  whole 50-step DDIM loop as ONE pallas_call (the production use_fused
  serving path — in/out projections, RoPE and the DDIM update in-kernel).

Run: python scripts/time_fused_serving.py [--loop] [--group G[,G...]] [tile ...]

``--group`` sweeps ``attn_group`` (samples per block-diagonal attention
dot: g·T score rows fill the MXU, at g× wasted score FLOPs + exps).
"""

from __future__ import annotations

import pathlib
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

V5E_PEAK_FLOPS = 197e12


def main(tiles, loop=False, groups=(1,)):
    import jax
    import jax.numpy as jnp

    cache_dir = pathlib.Path(__file__).parents[1] / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from syntalker_tpu.models.denoiser import Conditioning, MDMConfig, create_mdm
    from syntalker_tpu.ops.mdm_pallas import (
        make_fused_ddim_window, make_fused_denoise,
    )

    cfg = MDMConfig()
    rng = jax.random.PRNGKey(0)
    _, params = create_mdm(cfg, rng, frames=128)

    bs, t = 256, 32
    cond = Conditioning(
        at_feat=jnp.asarray(
            np.random.default_rng(0).normal(size=(bs, t, cfg.audio_feat_dim)),
            jnp.float32,
        ),
        seed_emb=jnp.asarray(
            np.random.default_rng(1).normal(size=(bs, cfg.latent_dim)), jnp.float32
        ),
    )
    x0 = jax.random.normal(jax.random.fold_in(rng, 1), (bs, t, cfg.latent_total_dim))
    te0 = jax.random.normal(jax.random.fold_in(rng, 2), (bs, cfg.latent_dim))

    # per-step FLOPs (matches bench.py mdm_denoise_flops semantics: matmuls)
    d, ff, L = cfg.latent_dim, cfg.ff_size, cfg.num_layers
    n = t
    per_tok = 2 * d * (3 * d) + 2 * d * d + 2 * d * ff * 2
    attn = 2 * 2 * n * n * d
    block_flops = per_tok * n + attn
    io_flops = n * (
        2 * cfg.latent_total_dim * d + 2 * (2 * d + cfg.audio_feat_dim) * d
        + 2 * d * cfg.latent_total_dim
    )
    step_flops = bs * (L * block_flops + io_flops)
    loop_flops = 50 * step_flops

    if loop:
        from syntalker_tpu.diffusion.schedule import make_diffusion

        diffusion = make_diffusion(
            schedule="cosine", steps=1000, timestep_respacing="ddim50"
        )

    for tile in tiles:
        for group in groups:
            if tile % group:
                continue
            if loop:
                run = make_fused_ddim_window(
                    cfg, params, diffusion, tile_samples=tile, attn_group=group
                )
                jax.block_until_ready(run(x0, cond))
                ts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    x = run(x0, cond)
                    jax.device_get(x[0, 0, 0])
                    ts.append(time.perf_counter() - t0)
            else:
                fused = make_fused_denoise(cfg, params, tile_samples=tile)
                x = fused(x0, te0, cond)
                jax.block_until_ready(x)
                ts = []
                for _ in range(5):
                    x = x0
                    t0 = time.perf_counter()
                    for _i in range(50):
                        x = fused(x, te0, cond)
                    jax.device_get(x[0, 0, 0])
                    ts.append(time.perf_counter() - t0)
            wall = statistics.median(ts)
            print(
                f"{'loop ' if loop else ''}tile={tile} group={group}: "
                f"{wall/bs*1e3:.3f} ms/window, "
                f"MFU {loop_flops/wall/V5E_PEAK_FLOPS:.3f} "
                f"(times {[round(x_*1e3) for x_ in ts]} ms)",
                flush=True,
            )


if __name__ == "__main__":
    args = sys.argv[1:]
    loop = "--loop" in args
    args = [a for a in args if a != "--loop"]
    groups = (1,)
    if "--group" in args:
        i = args.index("--group")
        groups = tuple(int(g) for g in args[i + 1].split(","))
        args = args[:i] + args[i + 2 :]
    if groups != (1,) and not loop:
        # the per-step path (make_fused_denoise) does not take attn_group —
        # sweeping it there would print rows that all measured group=1
        sys.exit("--group requires --loop (per-step path has no attn_group)")
    tiles = [int(a) for a in args] or ([16, 32] if loop else [4, 8])
    main(tiles, loop=loop, groups=groups)
