"""Isolate the fused-DDIM-window kernel cost: one dispatch, one window.

    python scripts/probe_fused_loop_micro.py
"""
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    cache_dir = pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from syntalker_tpu import generation as G
    from syntalker_tpu.data import joints as J
    from syntalker_tpu.diffusion.schedule import make_diffusion
    from syntalker_tpu.models.denoiser import MDMConfig, create_mdm, mdm_variables
    from syntalker_tpu.ops.mdm_pallas import make_fused_ddim_window, make_fused_denoise

    rng = jax.random.PRNGKey(0)
    cfg = MDMConfig()
    mdm, params = create_mdm(cfg, rng, frames=128)
    diffusion = make_diffusion(schedule="cosine", steps=1000, timestep_respacing="ddim50")

    b = 1
    audio = jnp.asarray(
        np.random.default_rng(0).normal(size=(b, 533 * 128, 2)), jnp.float32
    )
    word = jnp.zeros((b, 128), jnp.int32)
    seed = jnp.zeros((b, 4, J.LATENT_DIM))
    cond = jax.jit(
        lambda p, a, w, s: mdm.apply(mdm_variables(p), a, w, s, method="encode_cond")
    )(params, audio, word, seed)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (b, 32, J.LATENT_DIM))

    def bench(name, fn, reps=10):
        jax.device_get(fn())  # warm/compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn()
            jax.device_get(r[0, 0, 0])
            ts.append(time.perf_counter() - t0)
        print(f"{name}: median {statistics.median(ts)*1e3:.2f} ms  "
              f"runs {[round(t*1e3,1) for t in ts]}", flush=True)

    # 1. the full-loop kernel, ONE dispatch
    loop = make_fused_ddim_window(cfg, params, diffusion)
    bench("fused_loop_kernel(50 NFE)", lambda: loop(x0, cond))

    # 2. one per-step fused kernel dispatch (the block stack alone)
    step = make_fused_denoise(cfg, params, tile_samples=1)
    te = jnp.zeros((b, cfg.latent_dim))
    bench("fused_step_kernel(1 NFE)", lambda: step(x0, te, cond))

    # 3. XLA single-window 50-step scan for reference
    tmap = jnp.asarray(diffusion.timestep_map)
    t_embs = jax.jit(
        lambda p: mdm.apply(mdm_variables(p), tmap, method="embed_timesteps")
    )(params)

    @jax.jit
    def xla_loop(p, x, cond, te_all):
        v = mdm_variables(p)

        def stepf(x, te):
            out = mdm.apply(
                v, x, jnp.zeros((x.shape[0],), jnp.int32), cond,
                t_emb=jnp.tile(te[None], (x.shape[0], 1)), method="denoise",
            )
            return out, None

        x, _ = jax.lax.scan(stepf, x, te_all)
        return x

    bench("xla_scan(50 NFE)", lambda: xla_loop(params, x0, cond, t_embs))


if __name__ == "__main__":
    main()
