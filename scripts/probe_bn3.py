"""BN cliff bisection, part 3: which op is actually slow?

All WavEncoder activations are <= ~235 MB (biggest: block-0 output
(128, 14322, 64)), so the 650 ms BN forward is ~100x the bandwidth
expectation — a lowering pathology, not traffic. Microbenchmarks:

  bn_alone_T   — flax nn.BatchNorm(train) alone on (128, T, 64) f32
  mean_alone_T — jnp.mean over (0,1) + normalize, same shape
  block0_group / block0_batch — one AudioBasicBlock at the true block-0
                 input (128, 68224, 2), fwd only
  wav_group / wav_batch — the full WavEncoder fwd

Run: python scripts/probe_bn3.py [batch]
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


def main(b=128):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from syntalker_tpu.models.denoiser import AudioBasicBlock, WavEncoder

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    res = {"batch": b}
    g = np.random.default_rng(0)

    # ---- pure-BN / pure-reduce microbenchmarks ----
    for T in (14322,):
        x0 = jax.device_put(g.normal(size=(b, T, 64)).astype(np.float32))

        bn = nn.BatchNorm(use_running_average=False, momentum=0.9,
                          epsilon=1e-5)
        v = bn.init(jax.random.PRNGKey(0), x0)

        @jax.jit
        def bn_fwd(x, v=v, bn=bn):
            y, _ = bn.apply(v, x, mutable=["batch_stats"])
            return y

        def run_bn(n):
            x = x0
            for _ in range(n):
                x = bn_fwd(x)
            jax.device_get(x.ravel()[0])

        res[f"bn_alone_{T}_ms"] = round(slope(run_bn) * 1e3, 2)
        print(json.dumps(res), flush=True)

        @jax.jit
        def mean_norm(x):
            m = jnp.mean(x, axis=(0, 1))
            m2 = jnp.mean(jnp.square(x), axis=(0, 1))
            inv = jax.lax.rsqrt(jnp.maximum(m2 - m * m, 0.0) + 1e-5)
            return (x - m) * inv

        def run_mn(n):
            x = x0
            for _ in range(n):
                x = mean_norm(x)
            jax.device_get(x.ravel()[0])

        res[f"mean_alone_{T}_ms"] = round(slope(run_mn) * 1e3, 2)
        print(json.dumps(res), flush=True)

    # ---- single block-0 fwd, group vs batch ----
    wav0 = jax.device_put(g.normal(size=(b, 533 * 128, 2)).astype(np.float32))
    for norm in ("group", "batch"):
        blk = AudioBasicBlock(64, 5, 1700, True, norm=norm,
                              dtype=jnp.bfloat16)
        v = blk.init(jax.random.PRNGKey(0), wav0, train=True)

        @jax.jit
        def blk_fwd(x, v=v, blk=blk):
            y, _ = blk.apply(v, x, train=True, mutable=["batch_stats"])
            return y

        def run_blk(n):
            acc = None
            x = wav0
            for _ in range(n):
                y = blk_fwd(x)
                x = x + 1e-20 * y[:, :1, :2].astype(x.dtype).mean()
            jax.device_get(x.ravel()[0])

        res[f"block0_{norm}_ms"] = round(slope(run_blk) * 1e3, 2)
        print(json.dumps(res), flush=True)

    # ---- full WavEncoder fwd ----
    for norm in ("group", "batch"):
        enc = WavEncoder(256, norm=norm, dtype=jnp.bfloat16)
        v = enc.init(jax.random.PRNGKey(0), wav0, train=True)

        @jax.jit
        def enc_fwd(x, v=v, enc=enc):
            y, _ = enc.apply(v, x, train=True, mutable=["batch_stats"])
            return y

        def run_enc(n):
            x = wav0
            for _ in range(n):
                y = enc_fwd(x)
                x = x + 1e-20 * y[:, :1, :2].astype(x.dtype).mean()
            jax.device_get(x.ravel()[0])

        res[f"wav_{norm}_ms"] = round(slope(run_enc) * 1e3, 2)
        print(json.dumps(res), flush=True)

    (ROOT / "outputs" / "sustained" / "probe_bn3.json").write_text(
        json.dumps(res, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
