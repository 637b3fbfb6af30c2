"""Serving-loop roofline: attribute the batch-256 denoise time, push MFU.

VERDICT r2 #2: the serving knee ran at MFU 0.35 with no accounting of
where the other 65% goes. This script measures, on the real chip at the
serving config (batch 256, T=32 latent frames, 50 NFE):

1. baseline      — the production XLA denoise loop (f32 params, DEFAULT
                   matmul precision = bf16 multiplies on TPU),
2. bf16_act      — MDMConfig(dtype=bf16): activations stored bf16 through
                   the blocks (halves elementwise/LN HBM traffic),
3. pallas_tile8  — the fused Pallas block stack, 8 samples per grid step
                   (256-row MXU tiles, activations VMEM-resident across
                   all 8 layers, bf16 weights),
4. matmul_floor  — the block stack's six matmuls alone (no LN/attention/
                   gelu/residual), same shapes: the MXU-roofline floor any
                   full implementation can approach but not beat,

Attribution: baseline - matmul_floor - inout ≈ elementwise/LN/attention/
relayout cost that fusion can recover. Prints one JSON line + a table.

Run: python scripts/roofline_serving.py  (real chip; ~5 compiles)
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

V5E_PEAK_FLOPS = 197e12
BS = 256
T = 32
NFE = 50


def timed(fn, *args, n=5):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])  # warm + barrier
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    import pathlib

    cache_dir = pathlib.Path(__file__).parents[1] / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import mdm_denoise_flops  # analytic matmul FLOPs (bench.py)
    from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
    from syntalker_tpu.ops.mdm_pallas import make_fused_denoise, stack_block_weights

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

    rng = jax.random.PRNGKey(0)
    cfg = MDMConfig()
    mdm, params = create_mdm(cfg, rng, frames=128)

    audio = jax.random.normal(jax.random.fold_in(rng, 0), (BS, 533 * 128, 2))
    word = jnp.zeros((BS, 128), jnp.int32)
    seedl = jnp.zeros((BS, 4, cfg.latent_total_dim))
    cond = mdm.apply({"params": params}, audio, word, seedl, method="encode_cond")
    t_embs = mdm.apply(
        {"params": params}, jnp.arange(0, 1000, 1000 // NFE, dtype=jnp.int32),
        method="embed_timesteps",
    )
    x0 = jax.random.normal(jax.random.fold_in(rng, 1), (BS, T, cfg.latent_total_dim))
    flops = NFE * mdm_denoise_flops(cfg, BS, T)

    def loop_of(denoise_fn):
        def run(x, cond, t_embs):
            def step(x, te):
                return denoise_fn(x, jnp.tile(te[None], (x.shape[0], 1)), cond), None
            x, _ = jax.lax.scan(step, x, t_embs)
            return x
        return jax.jit(run)

    results = {}

    # 1. baseline: production XLA denoise
    def xla_denoise(x, t_emb, cond):
        return mdm.apply(
            {"params": params}, x, jnp.zeros((x.shape[0],), jnp.int32), cond,
            t_emb=t_emb, method="denoise",
        )

    wall = timed(loop_of(xla_denoise), x0, cond, t_embs)
    results["baseline"] = wall

    # 2. bf16 stored activations
    cfg16 = MDMConfig(dtype=jnp.bfloat16)
    mdm16 = type(mdm)(cfg16)

    def bf16_denoise(x, t_emb, cond):
        return mdm16.apply(
            {"params": params}, x, jnp.zeros((x.shape[0],), jnp.int32), cond,
            t_emb=t_emb, method="denoise",
        )

    results["bf16_act"] = timed(loop_of(bf16_denoise), x0, cond, t_embs)

    # 3. fused Pallas stack (host-dispatch loop: the remote compiler stalls
    # >9 min on the scan-embedded pallas call vs seconds standalone; the
    # async dispatch queue keeps the device saturated regardless)
    for tile in (4, 8, 16):
        try:
            fused = make_fused_denoise(cfg, params, tile_samples=tile)
            te0 = jnp.tile(t_embs[0][None], (BS, 1))
            jax.block_until_ready(fused(x0, te0, cond))
            ts = []
            for _ in range(5):
                x = x0
                t0 = time.perf_counter()
                for _i in range(NFE):
                    x = fused(x, te0, cond)
                jax.device_get(x[0, 0, 0])
                ts.append(time.perf_counter() - t0)
            results[f"pallas_tile{tile}"] = statistics.median(ts)
        except Exception as e:
            print(f"# pallas tile{tile} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # 4. matmul floor: the stack's matmuls alone at identical shapes
    p = params["params"] if "params" in params else params
    w = stack_block_weights(p["blocks"]["block"])
    wf = {k: v.astype(jnp.float32) for k, v in w.items()}

    def matmul_floor(x, t_emb, cond):
        h = x @ p["input_process"]["kernel"]
        h = jnp.concatenate([h, h, cond.at_feat[:, :T]], axis=-1) @ p["input_process2"]["kernel"]
        for li in range(cfg.num_layers):
            qkv = h @ wf["wqkv"][li]
            h = qkv[..., : cfg.latent_dim] @ wf["wproj"][li]
            f = h @ wf["wfc1"][li]
            h = f @ wf["wfc2"][li]
        return h @ p["output_process"]["kernel"]

    results["matmul_floor"] = timed(loop_of(matmul_floor), x0, cond, t_embs)

    # (a num_layers=1 "in/out-only" probe was dropped: its model needs its
    # own uncached multi-minute encode_cond compile through the tunnel, and
    # the overhead it isolates is already bounded by pallas_tile* - matmul_floor)

    out = {
        "metric": "serving_roofline_b256",
        "flops_analytic": flops,
        **{k: round(v, 4) for k, v in results.items()},
        **{
            f"mfu_{k}": round(flops / v / V5E_PEAK_FLOPS, 4)
            for k, v in results.items()
            if k in ("baseline", "bf16_act") or k.startswith("pallas")
        },
        "ms_per_window_baseline": round(results["baseline"] / BS * 1e3, 3),
        **{
            f"ms_per_window_{k}": round(v / BS * 1e3, 3)
            for k, v in results.items() if k.startswith("pallas")
        },
    }
    print(json.dumps(out))
    base = results["baseline"]
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"# {k:16s} {v * 1e3:8.1f} ms  ({base / v:4.2f}x vs baseline)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
