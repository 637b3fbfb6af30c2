"""Diffusion train-step time attribution (VERDICT r3 #1b) — one chip.

Decomposes the bf16/f32 step at the swept batch knee into:
  - encode_cond forward+backward (the WavEncoder conv pyramid + word mix),
  - denoise forward+backward at fixed conditioning (the transformer),
  - per-WavEncoder-block forward+backward at the true activation shapes,
all by chained-slope timing (the only honest per-step method through the
tunnel — CLAUDE.md). The residual (step − encode − denoise) is the loss
glue + optimizer update. Output feeds docs/train_roofline_round5.md.

Run: python scripts/probe_train_breakdown.py [batch] [dtype]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

V5E_PEAK = 197e12


def slope(fn, n_long=20, n_short=5, reps=3):
    import jax

    fn(2)
    out = {}
    for n in (n_short, n_long):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(n)
            ts.append(time.perf_counter() - t0)
        out[n] = min(ts)
    return (out[n_long] - out[n_short]) / (n_long - n_short)


def main(b=128, dtype="bf16"):
    import jax
    import jax.numpy as jnp

    cache_dir = pathlib.Path(__file__).parents[1] / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench_train import bench_diffusion, chained_slope  # noqa: E402

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from syntalker_tpu.models.denoiser import (
        AudioBasicBlock,
        MDMConfig,
        create_mdm,
    )

    rng = jax.random.PRNGKey(0)
    res = {"batch": b, "dtype": dtype}

    # ---- full step --------------------------------------------------------
    step, state, batch = bench_diffusion(jax.random.fold_in(rng, 3), b=b, dtype=dtype)
    res["full_step_ms"] = round(chained_slope(step, state, batch) * 1e3, 2)
    print(json.dumps(res), flush=True)

    cfg_kw = {}
    if dtype == "bf16":
        cfg_kw = dict(dtype=jnp.bfloat16, audio_dtype=jnp.bfloat16)
    cfg = MDMConfig(**cfg_kw)
    mdm, params = create_mdm(cfg, jax.random.fold_in(rng, 1), frames=128)
    g = np.random.default_rng(0)
    audio = jax.device_put(g.normal(size=(b, 533 * 128, 2)).astype(np.float32))
    word = jax.device_put(np.zeros((b, 128), np.int32))
    seed = jax.device_put(g.normal(size=(b, 4, 1536)).astype(np.float32))

    # ---- encode_cond fwd+bwd ----------------------------------------------
    # NOTE (round 5): the grad call and the chaining param update MUST live
    # in ONE jitted function — an eager tree.map between dispatches costs
    # one tunnel op per param leaf per iteration and inflated every
    # component row by ~2x (full-step 34 ms vs components summing to 72).
    @jax.jit
    def enc_fb(params, audio, word, seed, probe):
        def loss(p):
            c = mdm.apply({"params": p}, audio, word, seed, method="encode_cond")
            return jnp.sum(c.at_feat * probe) + jnp.sum(c.seed_emb)

        gr = jax.grad(loss)(params)
        # data-dependence so iterations chain (tiny f32 * 1e-20)
        return jax.tree.map(lambda a, d: a + 1e-20 * d.astype(a.dtype),
                            params, gr)

    at_shape = mdm.apply(
        {"params": params}, audio, word, seed, method="encode_cond"
    ).at_feat.shape
    probe = jax.device_put(g.normal(size=at_shape).astype(np.float32))

    def run_enc(n):
        p = params
        for _ in range(n):
            p = enc_fb(p, audio, word, seed, probe)
        jax.device_get(jax.tree.leaves(p)[0].ravel()[0])

    res["encode_fb_ms"] = round(slope(run_enc) * 1e3, 2)
    print(json.dumps(res), flush=True)

    # ---- denoise fwd+bwd at fixed conditioning -----------------------------
    cond = mdm.apply({"params": params}, audio, word, seed, method="encode_cond")
    x_t = jax.device_put(g.normal(size=(b, 32, 1536)).astype(np.float32))
    t = jax.device_put(np.full((b,), 17, np.int32))

    @jax.jit
    def den_fb(params, x_t, t, cond, probe):
        def loss(p):
            out = mdm.apply({"params": p}, x_t, t, cond, method="denoise")
            return jnp.sum(out * probe)

        gr = jax.grad(loss)(params)
        return jax.tree.map(lambda a, d: a + 1e-20 * d.astype(a.dtype),
                            params, gr)

    probe_d = jax.device_put(g.normal(size=(b, 32, 1536)).astype(np.float32))

    def run_den(n):
        p = params
        for _ in range(n):
            p = den_fb(p, x_t, t, cond, probe_d)
        jax.device_get(jax.tree.leaves(p)[0].ravel()[0])

    res["denoise_fb_ms"] = round(slope(run_den) * 1e3, 2)
    print(json.dumps(res), flush=True)

    # ---- per-block fwd+bwd at true pyramid shapes ---------------------------
    # shapes after each stage for 533*128 = 68224 input samples
    plan = [
        ("b0", 64, 5, 1700, True, 68224, 2),
        ("b1", 64, 6, 0, True, 14322, 64),
        ("b2", 64, 1, 7, False, 2385, 64),
        ("b3", 128, 6, 0, True, 2385, 64),
        ("b4", 128, 1, 7, False, 396, 128),
        ("b5", 256, 3, 0, True, 396, 128),
    ]
    adt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    for name, ch, s, p_, down, t_in, c_in in plan:
        blk = AudioBasicBlock(ch, s, p_, down, norm="group", dtype=adt)
        x = jax.device_put(g.normal(size=(b, t_in, c_in)).astype(np.float32))
        bp = blk.init(jax.random.PRNGKey(0), x)
        pr = None

        @jax.jit
        def blk_fb(bp, x, pr):
            def loss(q):
                return jnp.sum(blk.apply(q, x) * pr)

            gr = jax.grad(loss)(bp)
            return jax.tree.map(lambda a, d: a + 1e-20 * d.astype(a.dtype),
                                bp, gr)

        y = blk.apply(bp, x)
        pr = jax.device_put(g.normal(size=y.shape).astype(np.float32))

        def run_blk(n, bp=bp, x=x, pr=pr, blk_fb=blk_fb):
            q = bp
            for _ in range(n):
                q = blk_fb(q, x, pr)
            jax.device_get(jax.tree.leaves(q)[0].ravel()[0])

        res[f"{name}_fb_ms"] = round(slope(run_blk) * 1e3, 2)
        print(json.dumps({name: res[f"{name}_fb_ms"], "out": list(y.shape)}),
              flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dt = sys.argv[2] if len(sys.argv) > 2 else "bf16"
    main(b, dt)
