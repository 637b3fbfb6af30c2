"""Measure the diffusion train step with bf16 WavEncoder convs (one chip).

BASELINE.md attributes the diffusion train step's low MFU (0.134) to the
WavEncoder strided-conv pyramid; `MDMConfig(audio_dtype=bf16)` runs those
convs at the MXU's native bf16 rate while keeping params and all
normalization statistics f32. This probe times the production train step
under f32 vs bf16 audio convs (and optionally bf16 blocks on top), plus the
isolated encode_cond fwd+bwd, so the attribution and the win are both
measured rather than asserted.

Run: python scripts/probe_audio_dtype.py
"""

from __future__ import annotations

import json
import pathlib
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def timed_median(fn, sync_s, n=5):
    import jax

    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.device_get(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return max(statistics.median(ts) - sync_s, 1e-9), ts


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = pathlib.Path(__file__).parents[1] / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from syntalker_tpu.diffusion.schedule import make_diffusion
    from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
    from syntalker_tpu.train.diffusion_trainer import (
        DiffusionTrainConfig,
        make_diffusion_train_step,
    )
    from syntalker_tpu.train.state import (
        create_train_state,
        make_diffusion_optimizer,
    )

    # host-sync cost of the tunnel readback
    tiny = jax.jit(lambda k: jax.random.normal(k, (4,)))
    jax.device_get(tiny(jax.random.PRNGKey(0)))
    sync_s = statistics.median(
        [timed_once(tiny) for _ in range(5)]
    )

    b = 40
    g = np.random.default_rng(1)
    batch = jax.device_put({
        "latent_in": g.normal(size=(b, 32, 1536)).astype(np.float32),
        "audio": g.normal(size=(b, 533 * 128, 2)).astype(np.float32),
        "word": np.zeros((b, 128), np.int32),
    })
    diffusion = make_diffusion(schedule="cosine", steps=1000)
    opt = make_diffusion_optimizer()

    results = {}
    variants = {
        "f32": MDMConfig(),
        "audio_bf16": MDMConfig(audio_dtype=jnp.bfloat16),
        "audio_bf16_blocks_bf16": MDMConfig(
            audio_dtype=jnp.bfloat16, dtype=jnp.bfloat16
        ),
    }
    for name, cfg in variants.items():
        rng = jax.random.PRNGKey(0)
        module, params = create_mdm(cfg, rng, frames=128)
        state = create_train_state(params, opt, rng)
        step = jax.jit(
            make_diffusion_train_step(module, diffusion, opt, DiffusionTrainConfig())
        )
        state, m = step(state, batch)
        jax.block_until_ready(state.params)
        loss0 = float(m["predict_x0_loss"])

        holder = {"state": state}

        def run():
            holder["state"], metrics = step(holder["state"], batch)
            return metrics["predict_x0_loss"]

        dev_s, ts = timed_median(run, sync_s)
        results[name] = {
            "ms_device": round(dev_s * 1e3, 2),
            "samples_per_s": round(b / dev_s, 0),
            "first_loss": round(loss0, 4),
            "times_ms": [round(t * 1e3, 1) for t in ts],
        }
        print(name, results[name], flush=True)

    # isolated encode_cond fwd+bwd under both dtypes: the attribution
    for name in ("f32", "audio_bf16"):
        cfg = variants[name]
        rng = jax.random.PRNGKey(0)
        module, params = create_mdm(cfg, rng, frames=128)

        def cond_loss(p, audio, word):
            cond = module.apply(
                {"params": p}, audio, word,
                jnp.zeros((b, 4, 1536)), method="encode_cond",
            )
            return (cond.at_feat ** 2).mean() + (cond.seed_emb ** 2).mean()

        gfn = jax.jit(jax.value_and_grad(cond_loss))
        v, gr = gfn(params, batch["audio"], batch["word"])
        jax.block_until_ready(gr)

        def run():
            v, gr = gfn(params, batch["audio"], batch["word"])
            return v

        dev_s, ts = timed_median(run, sync_s)
        results[f"encode_cond_gradstep_{name}"] = {
            "ms_device": round(dev_s * 1e3, 2),
            "times_ms": [round(t * 1e3, 1) for t in ts],
        }
        print(f"encode_cond_gradstep_{name}", results[f"encode_cond_gradstep_{name}"], flush=True)

    out = pathlib.Path(__file__).parents[1] / "docs" / "audio_dtype_probe.json"
    out.write_text(json.dumps({"batch": b, "results": results}, indent=1))
    print(json.dumps(results, indent=1))


def timed_once(tiny):
    import jax

    r = tiny(jax.random.PRNGKey(2))
    t0 = time.perf_counter()
    jax.device_get(r)
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
