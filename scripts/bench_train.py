"""Training-step MFU benchmark (VERDICT r2 #7) — one TPU chip.

Times the two production train steps at the reference's budgets
(BASELINE.md): the body-part RVQ-VAE step (rvq_beatx_train.py: batch 256,
64-frame windows) and the diffusion/MDM step (diffusion_rvqvae_128.yaml:
batch 40, 128-frame windows, raw-audio conditioning), then divides
compiled-HLO FLOPs by measured device time and the v5e bf16 peak.

FLOP counting: XLA ``cost_analysis`` on the compiled step. This is exact
for the RVQ step (no scans — the quantizer loop is a Python unroll). The
MDM's 8 transformer blocks are ``nn.scan``-stacked by default, and XLA
reports a scan body once regardless of trip count — so the FLOPs are taken
from a compile of the numerically identical ``scan_blocks=False`` build
while the *timing* uses the production scanned build.

Methodology mirrors bench.py: median of 5, each run fenced by a scalar
``device_get`` readback (on the tunneled backend only a readback guarantees
completion; the ~30 ms relay round-trip is measured and subtracted).

Prints one JSON line; run: python scripts/bench_train.py
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

V5E_PEAK_FLOPS = 197e12  # bf16 systolic peak, one v5e chip (as bench.py)


def compiled_flops(jitted, *args) -> float:
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns one dict per comp
        ca = ca[0]
    return float(ca["flops"])


def timed_median(fn, n=5):
    import jax

    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.device_get(jax.tree.leaves(out)[0])  # completion barrier
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), ts


def host_sync_seconds() -> float:
    import jax

    tiny = jax.jit(lambda k: jax.random.normal(k, (4,)))
    jax.device_get(tiny(jax.random.PRNGKey(0)))
    rb = []
    for i in range(5):
        r = tiny(jax.random.PRNGKey(1 + i))
        t0 = time.perf_counter()
        jax.device_get(r)
        rb.append(time.perf_counter() - t0)
    return statistics.median(rb)


def bench_rvq(rng):
    """Reference config: batch 256, 64-frame windows, upper body (78-d)."""
    import jax

    from syntalker_tpu.models.rvqvae import RVQVAEConfig, create_rvqvae
    from syntalker_tpu.ops.quantize import RVQConfig
    from syntalker_tpu.train.rvq_trainer import make_rvq_train_step
    from syntalker_tpu.train.state import create_train_state, make_rvq_optimizer

    cfg = RVQVAEConfig(input_dim=78, quantizer=RVQConfig())
    module, params, qstate = create_rvqvae(cfg, rng, example_len=64)
    opt = make_rvq_optimizer()
    state = create_train_state(params, opt, rng, quantizer_state=qstate)
    batch = jax.device_put(
        np.random.default_rng(0).normal(size=(256, 64, 78)).astype(np.float32)
    )  # device-resident: don't time the tunnel host->device transfer
    step = jax.jit(make_rvq_train_step(module, opt))
    state, _ = step(state, batch)  # warm (compile)
    jax.block_until_ready(state.params)

    def run():
        nonlocal state
        state, metrics = step(state, batch)
        return metrics["loss"]

    wall, ts = timed_median(run)
    return wall, ts


def bench_diffusion(rng, *, scan_blocks=True, b=40, dtype="f32", **cfg_kw):
    """Reference config: batch 40, 128 frames, full-size MDM."""
    import jax
    import jax.numpy as jnp

    from syntalker_tpu.diffusion.schedule import make_diffusion
    from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
    from syntalker_tpu.train.diffusion_trainer import (
        DiffusionTrainConfig,
        make_diffusion_train_step,
    )
    from syntalker_tpu.train.state import create_train_state, make_diffusion_optimizer

    if dtype == "bf16":
        cfg_kw.update(dtype=jnp.bfloat16, audio_dtype=jnp.bfloat16)
    cfg = MDMConfig(scan_blocks=scan_blocks, **cfg_kw)
    module, params = create_mdm(cfg, rng, frames=128)
    opt = make_diffusion_optimizer()
    state = create_train_state(params, opt, rng)
    g = np.random.default_rng(1)
    batch = jax.device_put({
        "latent_in": g.normal(size=(b, 32, 1536)).astype(np.float32),
        "audio": g.normal(size=(b, 533 * 128, 2)).astype(np.float32),
        "word": np.zeros((b, 128), np.int32),
    })  # device-resident (the 22 MB audio would otherwise re-cross the
    # tunnel every timed step and dominate the measurement)
    diffusion = make_diffusion(schedule="cosine", steps=1000)
    step = jax.jit(make_diffusion_train_step(module, diffusion, opt, DiffusionTrainConfig()))
    return step, state, batch


def chained_slope(step, state, batch, *, n_long=20, n_short=5):
    """Per-step device time by chained-slope timing (CLAUDE.md): run the
    step N times data-dependent-chained with ONE readback, at two N, and
    take the slope — immune to the tunnel's per-dispatch sync jitter."""
    import jax

    def chain(n):
        s = state
        for _ in range(n):
            s, m = step(s, batch)
        jax.device_get(m["predict_x0_loss"])

    chain(2)  # warm + touch both branch shapes
    times = {}
    for n in (n_short, n_long):
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            chain(n)
            reps.append(time.perf_counter() - t0)
        times[n] = min(reps)
    return (times[n_long] - times[n_short]) / (n_long - n_short)


def sweep():
    """Training batch/dtype sweep (VERDICT r3 #1a): throughput + MFU at
    batches beyond the reference's GPU-era 40. Every op in the step is
    batch-leading (no cross-example compute), so FLOPs are linear in b and
    the per-batch MFU uses the batch-40 unrolled count scaled by b/40."""
    import pathlib

    import jax

    cache_dir = pathlib.Path(__file__).parents[1] / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    flops40 = _flops_via_cpu_subprocess()["diffusion_flops"]
    rng = jax.random.PRNGKey(0)
    rows = []
    for dtype in ("f32", "bf16"):
        for b in (40, 64, 128, 256):
            try:
                step, state, batch = bench_diffusion(
                    jax.random.fold_in(rng, 3), b=b, dtype=dtype
                )
                dev_s = chained_slope(step, state, batch)
            except Exception as e:
                rows.append({"batch": b, "dtype": dtype,
                             "error": f"{type(e).__name__}: {e}"[:200]})
                print(json.dumps(rows[-1]), flush=True)
                continue
            flops = flops40 * b / 40
            rows.append({
                "batch": b, "dtype": dtype,
                "step_ms": round(dev_s * 1e3, 2),
                "samples_per_s": round(b / dev_s, 0),
                "mfu": round(flops / dev_s / V5E_PEAK_FLOPS, 4),
            })
            print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"sweep": rows}))


def flops_only():
    """Compute both steps' HLO FLOP counts on the local CPU backend (compile
    only, no execution) — compiling the unrolled MDM through the remote-TPU
    tunnel takes minutes, while the count itself is platform-independent."""
    import jax

    rng = jax.random.PRNGKey(0)
    from syntalker_tpu.models.rvqvae import RVQVAEConfig, create_rvqvae
    from syntalker_tpu.ops.quantize import RVQConfig
    from syntalker_tpu.train.rvq_trainer import make_rvq_train_step
    from syntalker_tpu.train.state import create_train_state, make_rvq_optimizer

    cfg = RVQVAEConfig(input_dim=78, quantizer=RVQConfig())
    module, params, qstate = create_rvqvae(cfg, jax.random.fold_in(rng, 1), example_len=64)
    opt = make_rvq_optimizer()
    state = create_train_state(params, opt, rng, quantizer_state=qstate)
    batch = np.zeros((256, 64, 78), np.float32)
    rvq_flops = compiled_flops(jax.jit(make_rvq_train_step(module, opt)), state, batch)

    # audio_conv_pack=False: MFU counts ALGORITHMIC flops — the packed
    # convs' zero-wedge products (+6.7% on those convs) are not useful work
    step_u, state_u, batch_u = bench_diffusion(
        jax.random.fold_in(rng, 2), scan_blocks=False, audio_conv_pack=False
    )
    diff_flops = compiled_flops(step_u, state_u, batch_u)
    print(json.dumps({"rvq_flops": rvq_flops, "diffusion_flops": diff_flops}))


def _flops_via_cpu_subprocess() -> dict:
    import os
    import subprocess

    cache = Path(__file__).parents[1] / ".jax_cache" / "train_flops.json"
    if cache.exists():
        return json.loads(cache.read_text())

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, __file__, "--flops-only"],
        env=env, capture_output=True, text=True, timeout=900,
    )
    if out.returncode != 0:
        raise RuntimeError(f"flops subprocess failed: {out.stderr[-500:]}")
    res = json.loads(out.stdout.strip().splitlines()[-1])
    cache.parent.mkdir(exist_ok=True)
    cache.write_text(json.dumps(res))
    return res


def main():
    import pathlib

    import jax

    cache_dir = pathlib.Path(__file__).parents[1] / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    flops = _flops_via_cpu_subprocess()
    diff_flops = flops["diffusion_flops"]
    rvq_flops = flops["rvq_flops"]

    rng = jax.random.PRNGKey(0)
    sync_s = host_sync_seconds()

    rvq_wall, rvq_ts = bench_rvq(jax.random.fold_in(rng, 1))
    rvq_dev = max(rvq_wall - sync_s, 1e-9)

    step, state, batch = bench_diffusion(jax.random.fold_in(rng, 2), scan_blocks=True)
    state, _ = step(state, batch)
    jax.block_until_ready(state.params)

    def run():
        nonlocal state
        state, metrics = step(state, batch)
        return metrics["predict_x0_loss"]

    diff_wall, diff_ts = timed_median(run)
    diff_dev = max(diff_wall - sync_s, 1e-9)

    result = {
        "metric": "train_step_mfu_1chip",
        "rvq_ms": round(rvq_wall * 1e3, 2),
        "rvq_ms_device": round(rvq_dev * 1e3, 2),
        "rvq_flops": rvq_flops,
        "mfu_rvq_train": round(rvq_flops / rvq_dev / V5E_PEAK_FLOPS, 4),
        "rvq_windows_per_s": round(256 / rvq_dev, 0),
        "diffusion_ms": round(diff_wall * 1e3, 2),
        "diffusion_ms_device": round(diff_dev * 1e3, 2),
        "diffusion_flops": diff_flops,
        "mfu_diffusion_train": round(diff_flops / diff_dev / V5E_PEAK_FLOPS, 4),
        "diffusion_samples_per_s": round(40 / diff_dev, 0),
        "host_sync_ms": round(sync_s * 1e3, 1),
    }
    print(json.dumps(result))
    print(
        f"# rvq times {[round(t*1e3,1) for t in rvq_ts]} ms; "
        f"diffusion times {[round(t*1e3,1) for t in diff_ts]} ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    if "--flops-only" in sys.argv:
        flops_only()
    elif "--sweep" in sys.argv:
        sweep()
    else:
        main()
