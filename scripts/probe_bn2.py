"""BN cliff bisection, part 2: forward-only vs backward, and the
stop-gradient-moments variant (exact forward, decoupled backward).

probe_bn.py: encode_cond fwd+bwd @ b128 bf16 — group 42 ms, flax BN
687 ms, bf16-normalize BN 585 ms. This separates forward cost from the
batch-coupled backward, and tests two fix candidates:

  fwd_group / fwd_batch      — forward-only slope,
  fb_batch_sg                — batch moments under stop_gradient: the
                               normalizer treats m, v as constants in the
                               backward (forward numerics EXACT; gradient
                               drops the (small, O(1/B·T)) moment terms),
  fb_batch_sg_f32            — same, keeping the f32 pre-cast.

Run: python scripts/probe_bn2.py [batch]
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


def make_sg_norm(orig, f32_cast: bool):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    def sg(self, x, name, train):
        if self.norm != "batch":
            return orig(self, x, name, train)
        if f32_cast:
            x = x.astype(jnp.float32)
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
            m = jax.lax.stop_gradient(
                jnp.mean(x, axis=(0, 1), dtype=jnp.float32))
            m2 = jax.lax.stop_gradient(
                jnp.mean(jnp.square(x), axis=(0, 1), dtype=jnp.float32))
            v = jnp.maximum(m2 - jnp.square(m), 0.0)
            if not self.is_initializing():
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * m
                ra_var.value = 0.9 * ra_var.value + 0.1 * v
        else:
            m, v = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(v + 1e-5) * scale
        return x * inv.astype(x.dtype) + (bias - m * inv).astype(x.dtype)

    return sg


def bench(norm, b, *, fwd_only=False, patch=None):
    import jax
    import jax.numpy as jnp

    from syntalker_tpu.models import denoiser as D

    cfg = D.MDMConfig(dtype=jnp.bfloat16, audio_dtype=jnp.bfloat16,
                      audio_norm=norm)
    orig = D.AudioBasicBlock._norm
    if patch is not None:
        D.AudioBasicBlock._norm = patch(orig)
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

        if fwd_only:
            @jax.jit
            def enc(p, audio, word, seed):
                c, _ = mdm.apply(
                    {"params": p, **bstats}, audio, word, seed, train=True,
                    cond_rng=kc, method="encode_cond",
                    rngs={"dropout": kd}, mutable=["batch_stats"],
                )
                return c.at_feat

            def run(n):
                a = audio
                for _ in range(n):
                    out = enc(p0, a, word, seed)
                    a = a + 1e-20 * out[:, :1, :2].mean()  # chain
                jax.device_get(a.ravel()[0])

            return slope(run)

        @jax.jit
        def enc_fb(p, audio, word, seed, probe):
            def loss(pp):
                c, upd = mdm.apply(
                    {"params": pp, **bstats}, audio, word, seed, train=True,
                    cond_rng=kc, method="encode_cond",
                    rngs={"dropout": kd}, mutable=["batch_stats"],
                )
                return jnp.sum(c.at_feat * probe) + jnp.sum(c.seed_emb), upd

            gr, _ = jax.grad(loss, has_aux=True)(p)
            return gr

        at = mdm.apply({"params": p0, **bstats}, audio, word, seed,
                       method="encode_cond").at_feat
        probe = jax.device_put(np.asarray(g.normal(size=at.shape), np.float32))

        def run(n):
            p = p0
            for _ in range(n):
                gr = enc_fb(p, audio, word, seed, probe)
                p = jax.tree.map(
                    lambda a, d: a + 1e-20 * d.astype(a.dtype), p, gr)
            jax.device_get(jax.tree.leaves(p)[0].ravel()[0])

        return slope(run)
    finally:
        D.AudioBasicBlock._norm = orig


def main(b=128):
    import jax

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    res = {"batch": b}
    for name, kw in (
        ("fwd_group", dict(norm="group", fwd_only=True)),
        ("fwd_batch", dict(norm="batch", fwd_only=True)),
        ("fb_batch_sg", dict(norm="batch",
                             patch=lambda o: make_sg_norm(o, False))),
        ("fb_batch_sg_f32", dict(norm="batch",
                                 patch=lambda o: make_sg_norm(o, True))),
    ):
        res[name + "_ms"] = round(bench(b=b, **kw) * 1e3, 2)
        print(json.dumps(res), flush=True)
    (ROOT / "outputs" / "sustained" / "probe_bn2.json").write_text(
        json.dumps(res, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
