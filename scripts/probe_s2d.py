"""Space-to-depth reformulation of the WavEncoder's strided convs (r4 #6).

The strided k=15 convs (stride 5/6/3) are the WavEncoder pyramid's
backbone. Hypothesis: their BACKWARD-input pass is the train-MFU ceiling —
XLA lowers grad-wrt-input of a stride-s conv as an input-dilated
(zero-stuffed) convolution, wasting ~s× MXU work on zeros.

Space-to-depth makes the stride structural: pack s consecutive samples
into the channel axis, x (B, T, C) -> (B, T/s, sC), and reshape the kernel
(k, C, O) -> (ceil(k/s), sC, O) (zero-padding the tap axis when s∤k). The
stride-1 packed conv computes the IDENTICAL map (each output position
reads the same 15 samples with the same weights — pure index relabeling),
so fwd is bit-exact in f32 and its backward is a plain stride-1 conv with
no input dilation.

Measures, per strided block at the true b128 activation shapes and for the
whole pyramid: fwd and fwd+bwd chained-slope device time, XLA-strided vs
space-to-depth. Output feeds docs/train_roofline_round5.md.

Run: python scripts/probe_s2d.py [batch]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def s2d_conv(x, w, b, *, stride: int, pad: int):
    """Stride-s k-tap conv as a stride-1 conv over s-packed channels.

    Exact: out[t'] = sum_tau x[s*t' + tau - pad] w[tau]  (tau < k) is
    reproduced with packed tap d = tau // s, packed channel j = tau % s.
    """
    import jax.numpy as jnp
    from jax import lax

    k, cin, cout = w.shape
    kp = -(-k // stride)  # packed taps
    # pad time so it divides the stride, remembering the extra on the right
    t = x.shape[1] + 2 * pad
    t_pad = -(t % -stride)
    xp = jnp.pad(x, ((0, 0), (pad, pad + t_pad), (0, 0)))
    xp = xp.reshape(x.shape[0], (t + t_pad) // stride, stride * cin)
    # kernel: tap tau = s*d + j  ->  W2[d, j*cin + c] = w[s*d + j, c]
    w2 = jnp.zeros((kp * stride, cin, cout), w.dtype).at[:k].set(w)
    w2 = w2.reshape(kp, stride, cin, cout).reshape(kp, stride * cin, cout)
    out = lax.conv_general_dilated(
        xp, w2, window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + b
    # number of valid outputs of the original conv
    n_out = (t - k) // stride + 1
    return out[:, :n_out]


def xla_conv(x, w, b, *, stride: int, pad: int):
    from jax import lax

    return lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=((pad, pad),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + b


def slope_time(fn, *args, n_long=20, n_short=5, reps=3):
    """Chained-slope device seconds per call (the only honest timing
    through the tunnel)."""
    import jax

    # time n sequential dispatches with one final readback; the runtime
    # pipelines them, so (t_long - t_short)/(long-short) is the marginal
    # device cost.
    jf = jax.jit(fn)
    jax.block_until_ready(jf(*args))
    out = {}
    for n in (n_short, n_long):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = None
            for _ in range(n):
                r = jf(*args)
            jax.device_get(jax.tree.leaves(r)[0].ravel()[0])
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

    cdt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    frames = 128
    t0_len = 533 * frames

    # the WavEncoder downsample plan at out_dim=256 (denoiser.py WavEncoder):
    # (cout, stride, pad, T_in, cin); fused conv1||down doubles cout
    plan = [
        ("blk0_s5", 64 * 2, 5, 1700, t0_len, 2),
        ("blk1_s6", 64 * 2, 6, 0, 13646, 64),
        ("blk3_s6", 128 * 2, 6, 0, 2274, 64),
        ("blk5_s3", 256 * 2, 3, 0, 379, 128),
    ]
    res = {"batch": b, "dtype": dtype}
    print(json.dumps({"config": res}), flush=True)

    for name, cout, s, p, t_in, cin in plan:
        x = jnp.asarray(rng.normal(size=(b, t_in, cin)), cdt)
        w = jnp.asarray(rng.normal(size=(15, cin, cout)) * 0.05, cdt)
        bb = jnp.asarray(rng.normal(size=(cout,)) * 0.01, cdt)

        # exactness (f32)
        xf, wf, bf = (a.astype(jnp.float32) for a in (x, w, bb))
        ref = xla_conv(xf, wf, bf, stride=s, pad=p)
        alt = s2d_conv(xf, wf, bf, stride=s, pad=p)
        err = float(jnp.max(jnp.abs(ref - alt)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        assert alt.shape == ref.shape, (alt.shape, ref.shape)

        row = {"block": name, "exact_rel_err_f32": err,
               "shape_in": list(x.shape), "shape_out": list(ref.shape)}

        def fwd_x(xx, fn=None, s=s, p=p, w=w, bb=bb):
            return fn(xx, w, bb, stride=s, pad=p)

        def loss_x(xx, fn, s=s, p=p, w=w, bb=bb):
            return (fn(xx, w, bb, stride=s, pad=p) ** 2).mean()

        import functools

        for label, fn in (("xla", xla_conv), ("s2d", s2d_conv)):
            f = functools.partial(fwd_x, fn=fn)
            row[f"{label}_fwd_ms"] = round(slope_time(f, x) * 1e3, 3)
            g = jax.grad(functools.partial(loss_x, fn=fn))
            row[f"{label}_fwdbwd_ms"] = round(slope_time(g, x) * 1e3, 3)
        # analytic flops (fwd): 2*B*T_out*k*cin*cout
        t_out = ref.shape[1]
        fl = 2.0 * b * t_out * 15 * cin * cout
        row["fwd_gflop"] = round(fl / 1e9, 2)
        row["xla_fwd_mfu"] = round(fl / (row["xla_fwd_ms"] / 1e3) / 197e12, 3)
        row["s2d_fwd_mfu"] = round(fl / (row["s2d_fwd_ms"] / 1e3) / 197e12, 3)
        res[name] = row
        print(json.dumps(row), flush=True)

    out = pathlib.Path(__file__).parents[1] / "docs" / "s2d_probe.json"
    out.write_text(json.dumps(res, indent=1))
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main(*(int(a) if a.isdigit() else a for a in sys.argv[1:]))
