"""BN cliff bisection, part 4: the pack x norm matrix.

probe_bn3 found WavEncoder(BN, pack=True) is fast (8.5 ms fwd) while
encode_cond(BN) — which runs pack=False (MDMConfig.audio_conv_pack
default) — is 651 ms. Grid: WavEncoder fwd at b128 bf16 over
{pack} x {norm}.

Run: python scripts/probe_bn4.py [batch]
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
    import jax
    import jax.numpy as jnp

    from syntalker_tpu.models.denoiser import WavEncoder

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    res = {"batch": b}
    g = np.random.default_rng(0)
    wav0 = jax.device_put(g.normal(size=(b, 533 * 128, 2)).astype(np.float32))

    for pack in (True, False):
        for norm in ("group", "batch"):
            enc = WavEncoder(256, norm=norm, dtype=jnp.bfloat16, pack=pack)
            v = enc.init(jax.random.PRNGKey(0), wav0, train=True)

            @jax.jit
            def enc_fwd(x, v=v, enc=enc):
                y, _ = enc.apply(v, x, train=True, mutable=["batch_stats"])
                return y

            def run(n):
                x = wav0
                for _ in range(n):
                    y = enc_fwd(x)
                    x = x + 1e-20 * y[:, :1, :2].astype(x.dtype).mean()
                jax.device_get(x.ravel()[0])

            res[f"wav_pack{int(pack)}_{norm}_ms"] = round(slope(run) * 1e3, 2)
            print(json.dumps(res), flush=True)

    (ROOT / "outputs" / "sustained" / "probe_bn4.json").write_text(
        json.dumps(res, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
