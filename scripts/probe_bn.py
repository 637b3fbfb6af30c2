"""Attribute + fix the audio_norm='batch' train-step cliff (round 5).

probe_sustained_step.py showed the sustained 684 ms/step is entirely the
RAW train step built with the SHIPPED audio_norm='batch' config (A~B~C);
the 34 ms BASELINE sweep number was measured on the MDMConfig default
('group'). This probe slope-times encode_cond fwd+bwd (train=True, the
real mutable-batch_stats path) at b128 bf16 under:

  group    — the MDMConfig default (the benched config),
  batch    — flax nn.BatchNorm on the f32-cast activations (shipped),
  batch_v2 — candidate fix: batch moments computed by f32-accumulated
             reductions directly on the bf16 activations, normalize in
             bf16 (no full-activation f32 round trip), f32 running stats.

Run: python scripts/probe_bn.py [batch]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def slope(fn, n_long=15, n_short=4, reps=3):
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


def bench_norm(norm: str, b: int, patch_fast: bool = False):
    import jax
    import jax.numpy as jnp

    from syntalker_tpu.models import denoiser as D

    cfg = D.MDMConfig(dtype=jnp.bfloat16, audio_dtype=jnp.bfloat16,
                      audio_norm=norm)
    orig = D.AudioBasicBlock._norm
    if patch_fast:
        import flax.linen as nn

        def fast(self, x, name, train):
            if self.norm != "batch":
                return orig(self, x, name, train)
            c = x.shape[-1]
            scale = self.param(f"{name}_scale", nn.initializers.ones, (c,),
                               jnp.float32)
            bias = self.param(f"{name}_bias", nn.initializers.zeros, (c,),
                              jnp.float32)
            ra_mean = self.variable("batch_stats", f"{name}_mean",
                                    lambda: jnp.zeros((c,), jnp.float32))
            ra_var = self.variable("batch_stats", f"{name}_var",
                                   lambda: jnp.ones((c,), jnp.float32))
            if train:
                m = jnp.mean(x, axis=(0, 1), dtype=jnp.float32)
                m2 = jnp.mean(jnp.square(x), axis=(0, 1), dtype=jnp.float32)
                v = jnp.maximum(m2 - jnp.square(m), 0.0)
                if not self.is_initializing():
                    ra_mean.value = 0.9 * ra_mean.value + 0.1 * m
                    ra_var.value = 0.9 * ra_var.value + 0.1 * v
            else:
                m, v = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(v + 1e-5) * scale
            return x * inv.astype(x.dtype) + (bias - m * inv).astype(x.dtype)

        D.AudioBasicBlock._norm = fast
    try:
        rng = jax.random.PRNGKey(0)
        mdm, params = D.create_mdm(cfg, rng, frames=128)
        variables = D.mdm_variables(params)
        p0 = variables["params"]
        bstats = {k: v for k, v in variables.items() if k != "params"}
        g = np.random.default_rng(0)
        audio = jax.device_put(
            g.normal(size=(b, 533 * 128, 2)).astype(np.float32))
        word = jax.device_put(np.zeros((b, 128), np.int32))
        seed = jax.device_put(g.normal(size=(b, 4, 1536)).astype(np.float32))
        kc, kd = jax.random.split(jax.random.PRNGKey(7))

        @jax.jit
        def enc_fb(p, audio, word, seed, probe):
            def loss(pp):
                c, upd = mdm.apply(
                    {"params": pp, **bstats}, audio, word, seed, train=True,
                    cond_rng=kc, method="encode_cond",
                    rngs={"dropout": kd}, mutable=["batch_stats"],
                )
                return jnp.sum(c.at_feat * probe) + jnp.sum(c.seed_emb), upd

            gr, upd = jax.grad(loss, has_aux=True)(p)
            # chain update INSIDE the jit: an eager tree.map between
            # dispatches costs one tunnel op per leaf per iteration and
            # inflates the slope ~2x (see probe_train_breakdown.py).
            return jax.tree.map(
                lambda a, d: a + 1e-20 * d.astype(a.dtype), p, gr)

        at = mdm.apply({"params": p0, **bstats}, audio, word, seed,
                       method="encode_cond").at_feat
        probe = jax.device_put(np.asarray(
            g.normal(size=at.shape), np.float32))

        def run(n):
            p = p0
            for _ in range(n):
                p = enc_fb(p, audio, word, seed, probe)
            jax.device_get(jax.tree.leaves(p)[0].ravel()[0])

        return slope(run)
    finally:
        D.AudioBasicBlock._norm = orig


def main(b=128):
    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    res = {"batch": b}
    for name, kw in (("group", dict(norm="group")),
                     ("batch", dict(norm="batch")),
                     ("batch_v2", dict(norm="batch", patch_fast=True))):
        res[f"enc_fb_ms_{name}"] = round(bench_norm(b=b, **kw) * 1e3, 2)
        print(json.dumps(res), flush=True)
    (ROOT / "outputs" / "sustained" / "probe_bn.json").write_text(
        json.dumps(res, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
