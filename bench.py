"""End-to-end benchmark: audio→motion generation throughput on one chip.

Measures the flagship inference path of the shipped SynTalker config
(diffusion_rvqvae_128 + ddim50): a 1906-frame (63.5 s @ 30 fps) clip — the
length of the reference demo example — generated as 16 autoregressive
windows of 128 frames, each window = conditioning encode + 50-step DDIM
scan over the full-size MDM (8 blocks, 512-d), then RVQ snap+decode of all
three body parts and rot6d→axis-angle recovery.

Reported metric: realtime factor (seconds of motion generated per second of
wallclock). `vs_baseline`: the reference demo pipeline reports 1–4 minutes
per clip on GPU (demo.py:744-747); using the favourable 60 s sampling-only
estimate for this clip length gives a baseline realtime factor of ~1.06.

Methodology (round-2 hardening):
- median of 5 timed runs, each timed to full host readback
  (`jax.device_get`) — on the tunneled backend only a readback guarantees
  execution completed, and the real pipeline materializes outputs anyway;
- the host-sync overhead (one relay round trip, measured on a tiny fetch)
  is reported separately, so device-compute time is wall − sync;
- MFU: analytic matmul FLOPs of the denoise path (XLA cost_analysis counts
  a scan body once regardless of trip count, so it can't be used here)
  divided by device time and the v5e bf16 peak (197 TFLOP/s), for (a) the
  full e2e clip and (b) a 50-step denoise-only loop at the batch-256
  serving config (the measured throughput knee of the batch sweep).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_FLOPS = 197e12  # bf16 systolic peak, one v5e chip


def mdm_denoise_flops(cfg, b: int, n: int) -> float:
    """Analytic matmul FLOPs of one MDM.denoise call (2·M·N·K per matmul).

    XLA's cost_analysis undercounts here — it reports a scan/while body
    once regardless of trip count — so MFU uses this closed form. Counts
    the dense projections and attention; the (precomputed) timestep MLP,
    layernorms and RoPE are negligible (<1%)."""
    d, ff, L, total = cfg.latent_dim, cfg.ff_size, cfg.num_layers, cfg.latent_total_dim
    per = 2 * n * total * d  # input_process
    per += 2 * n * (2 * d + cfg.audio_feat_dim) * d  # input_process2
    per += L * (
        2 * n * d * (3 * d)  # qkv
        + 2 * n * d * d  # attn out proj
        + 4 * n * n * d  # scores + values
        + 4 * n * d * ff  # mlp fc1+fc2
    )
    per += 2 * n * d * total  # output_process
    return float(b * per)


def main():
    # persistent compilation cache: the big windowed-sampler program takes
    # minutes to compile cold; repeated bench runs hit the cache.
    import pathlib

    cache_dir = pathlib.Path(__file__).parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from syntalker_tpu import generation as G
    from syntalker_tpu.data import joints as J
    from syntalker_tpu.data.stats import identity_pose_stats
    from syntalker_tpu.diffusion.schedule import make_diffusion
    from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
    from syntalker_tpu.models.rvqvae import RVQVAEConfig, create_rvqvae
    from syntalker_tpu.ops.quantize import RVQConfig, rvq_forward

    rng = jax.random.PRNGKey(0)

    # full-size models (random weights; compute cost is weight-independent)
    mdm_cfg = MDMConfig()
    mdm, mdm_params = create_mdm(mdm_cfg, rng, frames=128)
    diffusion = make_diffusion(schedule="cosine", steps=1000, timestep_respacing="ddim50")

    rvq_modules = {}
    for i, (name, dim) in enumerate([("upper", 78), ("hands", 180), ("lower", 57)]):
        cfg = RVQVAEConfig(input_dim=dim, quantizer=RVQConfig())
        module, params, state = create_rvqvae(cfg, jax.random.fold_in(rng, i))
        z = jax.random.normal(jax.random.fold_in(rng, 100 + i), (1, 600, 512))
        state = rvq_forward(z, state, cfg.quantizer, train=True,
                            rng=jax.random.fold_in(rng, 200 + i)).state
        rvq_modules[name] = (module, params, state)

    n_frames = 1906
    plan = G.plan_windows(n_frames)
    motion_seconds = plan.out_latent_frames * 4 / 30.0

    b = 1
    audio = np.random.default_rng(0).normal(size=(b, 533 * plan.n_frames, 2)).astype(np.float32)
    words = np.zeros((b, plan.n_frames), np.int32)
    aw = jnp.asarray(G.window_audio(audio, plan))
    ww = jnp.asarray(G.window_words(words, plan))
    seed0 = jnp.zeros((b, plan.pre_frames, J.LATENT_DIM))
    stats = identity_pose_stats()

    def e2e(aw, ww, seed0, key):
        # the lean DDIM sampler: algebraically-folded projections + the
        # two-coefficient update — parity-pinned vs sample_windows(ddim)
        # (tests/test_generation.py), ~11% faster at batch 1 on chip
        latents = G.sample_windows_lean(
            mdm, mdm_params, diffusion, plan, aw, ww, seed0, key
        )
        out = G.decode_latents(latents, rvq_modules=rvq_modules, stats=stats)
        return out["axis_angle"], out["trans"]

    e2e_c = jax.jit(e2e)
    t0 = time.perf_counter()
    out = jax.device_get(e2e_c(aw, ww, seed0, jax.random.PRNGKey(1)))
    warm_s = time.perf_counter() - t0

    times = []
    for i in range(5):
        t0 = time.perf_counter()
        out = jax.device_get(e2e_c(aw, ww, seed0, jax.random.PRNGKey(2 + i)))
        times.append(time.perf_counter() - t0)
    wall = statistics.median(times)
    assert all(map(lambda a: np.isfinite(a).all(), out)), "non-finite output"

    # ---- slope-timed e2e variant (VERDICT r4 #2): an 8-window clip of the
    # same program family splits the per-window device cost (the slope
    # between the 16- and 8-window walls) from the fixed overhead (dispatch
    # + relay round trips + readback), which the single-point median cannot
    # do — the r4 291x-vs-366x "regression" question is exactly whether
    # device work grew or the tunnel was slow that day. Slope numbers are
    # robust to the tunnel's fixed costs by construction.
    slope = {}
    try:
        n8 = plan.pre_frames + 8 * (plan.pose_length - plan.pre_frames)
        plan8 = G.plan_windows(n8, pose_length=plan.pose_length,
                               pre_frames=plan.pre_frames)
        assert plan8.num_windows == 8, plan8.num_windows
        audio8 = audio[:, : 533 * plan8.n_frames]
        aw8 = jnp.asarray(G.window_audio(audio8, plan8))
        ww8 = jnp.asarray(G.window_words(words[:, : plan8.n_frames], plan8))

        def e2e8(aw, ww, seed0, key):
            latents = G.sample_windows_lean(
                mdm, mdm_params, diffusion, plan8, aw, ww, seed0, key
            )
            out = G.decode_latents(latents, rvq_modules=rvq_modules, stats=stats)
            return out["axis_angle"], out["trans"]

        e2e8_c = jax.jit(e2e8)
        jax.device_get(e2e8_c(aw8, ww8, seed0, jax.random.PRNGKey(1)))  # warm
        t8 = []
        for i in range(5):
            t0 = time.perf_counter()
            jax.device_get(e2e8_c(aw8, ww8, seed0, jax.random.PRNGKey(2 + i)))
            t8.append(time.perf_counter() - t0)
        wall8 = statistics.median(t8)
        per_window_s = (wall - wall8) / (plan.num_windows - plan8.num_windows)
        fixed_s = wall - plan.num_windows * per_window_s
        slope = {
            "e2e_wall8_s_median5": round(wall8, 4),
            "e2e_window_ms_slope": round(per_window_s * 1e3, 3),
            "e2e_fixed_overhead_s": round(fixed_s, 4),
            "realtime_slope": round(
                motion_seconds / (plan.num_windows * per_window_s), 1
            ),
        }
    except Exception as e:
        print(f"# e2e slope probe failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # host-sync + readback overhead. Two parts on the tunneled backend:
    # (a) the relay round-trip latency (~25-30 ms, measured on a 4-byte
    # fetch), and (b) TRANSFER of the actual outputs — the (T, 165) f32
    # axis-angle + trans are ~1.3 MB, and the relay moves ~30 MB/s, so the
    # full-result fetch costs ~65 ms (measured; a locally attached chip
    # pays neither). device_s subtracts the same-shaped fetch cost, not
    # just the scalar latency (the round-2 methodology under-counted the
    # readback and attributed transfer time to the device).
    tiny = jax.jit(lambda k: jax.random.normal(k, (4,)))
    jax.device_get(tiny(jax.random.PRNGKey(9)))
    rb = []
    for i in range(5):
        r = tiny(jax.random.PRNGKey(10 + i))
        t0 = time.perf_counter()
        jax.device_get(r)
        rb.append(time.perf_counter() - t0)
    sync_s = statistics.median(rb)

    dummy = jax.jit(
        lambda k: jax.tree.map(
            lambda a: jax.random.normal(k, a.shape, a.dtype), out
        )
    )
    jax.device_get(dummy(jax.random.PRNGKey(20)))
    rb = []
    for i in range(5):
        r = dummy(jax.random.PRNGKey(21 + i))
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        jax.device_get(r)
        rb.append(time.perf_counter() - t0)
    fetch_s = statistics.median(rb)
    device_s = max(wall - fetch_s, 1e-9)
    # denoise-only analytic FLOPs (the dominant cost; cond-encode convs and
    # RVQ decode add ~10-15% more, so e2e MFU is a slight underestimate)
    e2e_flops = plan.num_windows * 50 * mdm_denoise_flops(mdm_cfg, b, 32)
    e2e_mfu = e2e_flops / device_s / V5E_PEAK_FLOPS

    # ---- serving-config MFU probe: 50-step denoise loop at batch 256 ------
    # batch sweep (round 2, one v5e chip): 1.06 ms/window @64, 1.03 @128,
    # 0.889 @256, 0.843 @512 — 256 is the knee (bigger batches buy <6% more
    # throughput for 2x the latency); bf16 block compute adds only ~5%
    # (the loop is not MXU-rate-bound), so f32 stays the default.
    serving = {}
    try:
        bs = 256
        k = jax.random.PRNGKey(3)
        audio_w = jax.random.normal(jax.random.fold_in(k, 0), (bs, 533 * 128, 2))
        word_w = jnp.zeros((bs, 128), jnp.int32)
        seed_w = jnp.zeros((bs, 4, J.LATENT_DIM))
        cond = mdm.apply(
            {"params": mdm_params}, audio_w, word_w, seed_w, method="encode_cond"
        )
        ts = jnp.asarray(diffusion.timestep_map, jnp.int32)  # 50 original steps
        t_embs = mdm.apply({"params": mdm_params}, ts, method="embed_timesteps")

        # DDIM eta=0 two-coefficient update in iteration order (same
        # derivation as ops.mdm_pallas.make_fused_ddim_window / the lean
        # sampler) — the XLA loop runs the FULL DDIM recursion so it is
        # both the timing comparator and the on-chip parity oracle for the
        # fused kernel. The update itself is 2 flops/elem — noise.
        s_steps = diffusion.num_steps
        idx = np.arange(s_steps - 1, -1, -1)
        abar_prev = np.asarray(diffusion.alphas_cumprod_prev, np.float64)[idx]
        rr = np.asarray(diffusion.sqrt_recip_alphas_cumprod, np.float64)[idx]
        rm1 = np.asarray(diffusion.sqrt_recipm1_alphas_cumprod, np.float64)[idx]
        s1m = np.sqrt(np.maximum(1.0 - abar_prev, 0.0))
        coef_a = jnp.asarray(s1m * rr / rm1, jnp.float32)
        coef_b = jnp.asarray(np.sqrt(abar_prev) - s1m / rm1, jnp.float32)
        t_embs_iter = t_embs[::-1]  # highest t first

        def denoise_loop(x, cond, t_embs_iter):
            def step(x, it):
                pred_x0 = mdm.apply(
                    {"params": mdm_params},
                    x,
                    jnp.zeros((x.shape[0],), jnp.int32),
                    cond,
                    t_emb=jnp.tile(t_embs_iter[it][None], (x.shape[0], 1)),
                    method="denoise",
                )
                return coef_a[it] * x + coef_b[it] * pred_x0, None

            x, _ = jax.lax.scan(step, x, jnp.arange(s_steps))
            return x

        x0 = jax.random.normal(jax.random.fold_in(k, 1), (bs, 32, J.LATENT_DIM))
        loop_c = jax.jit(denoise_loop)
        xla_ref = jax.device_get(loop_c(x0, cond, t_embs_iter))  # warm
        lt = []
        for _ in range(5):
            t0 = time.perf_counter()
            r = loop_c(x0, cond, t_embs_iter)
            jax.device_get(r[0, 0, 0])  # tiny readback: completion barrier only
            lt.append(time.perf_counter() - t0)
        loop_wall = statistics.median(lt)
        loop_flops = 50 * mdm_denoise_flops(mdm_cfg, bs, 32)
        serving = {
            "serving_batch": bs,
            "serving_ms_per_window": round(loop_wall / bs * 1e3, 3),
            "serving_motion_s_per_s": round(bs * (128 / 30.0) / loop_wall, 1),
            "mfu_denoise_serving": round(loop_flops / loop_wall / V5E_PEAK_FLOPS, 4),
        }

        # ---- fused Pallas serving path (round 3) ------------------------
        # The production use_fused serving path: the ENTIRE 50-step DDIM
        # loop is ONE pallas_call (grid (B/32, NFE, L)) — in/out
        # projections, RoPE and the DDIM update run in-kernel, the
        # (B, T, 1536) state and activations stay VMEM-resident between
        # steps, bf16 layer weights restream under double buffering. Tile
        # sweep (BASELINE.md): 32 samples/grid-step is the knee (64
        # regresses on VMEM pressure). Relative to the round-3 per-step
        # fused path this removes the ~25 ms/loop XLA in/out+RoPE+DDIM
        # segment: 0.56 -> 0.65 MFU measured.
        from syntalker_tpu.ops.mdm_pallas import make_fused_ddim_window

        fused = make_fused_ddim_window(
            mdm_cfg, mdm_params, diffusion, tile_samples=32
        )
        fused_out = jax.device_get(fused(x0, cond))  # warm
        # On-chip Pallas parity gate: every bench run re-validates the real
        # Mosaic lowering (bf16 weights + tanh-GELU) against the XLA DDIM
        # loop above — a regression on the real chip fails the bench
        # instead of landing silently between ad-hoc script runs.
        parity_err = float(
            np.abs(fused_out - xla_ref).max() / (np.abs(xla_ref).max() + 1e-9)
        )
        serving["fused_parity_err"] = round(parity_err, 5)
        # tolerance tightened 5e-2 -> 2e-2 (VERDICT r4 #7): measured err is
        # ~6e-3 (bf16 weight storage + tanh-GELU), so 2e-2 still gives 3x
        # headroom while catching drift the old gate would have hidden 9x.
        serving["fused_parity_ok"] = bool(parity_err < 2e-2)
        if not serving["fused_parity_ok"]:
            # a diverged kernel's perf numbers are meaningless — withhold
            # them so the regression is loud in BENCH_rN, but keep the
            # headline metric alive.
            raise AssertionError(f"fused kernel diverged from XLA: {parity_err}")
        ft = []
        for _ in range(5):
            t0 = time.perf_counter()
            x = fused(x0, cond)
            jax.device_get(x[0, 0, 0])
            ft.append(time.perf_counter() - t0)
        fused_wall = statistics.median(ft)
        serving.update({
            "serving_ms_per_window_pallas": round(fused_wall / bs * 1e3, 3),
            "mfu_denoise_serving_pallas": round(
                loop_flops / fused_wall / V5E_PEAK_FLOPS, 4
            ),
        })

        # On-chip parity for the shard_map-composed mesh path (VERDICT r4
        # #7): the production multi-chip serving form wraps the SAME kernel
        # in shard_map over the data axis — previously parity-tested only on
        # the virtual CPU mesh. A 1-device mesh on the real chip exercises
        # the actual Mosaic lowering under shard_map (the composition that
        # could diverge: spec plumbing, replicated-weight closure, jit of
        # the sharded callable).
        from jax.sharding import Mesh

        mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("data",))
        fused_mesh = make_fused_ddim_window(
            mdm_cfg, mdm_params, diffusion, tile_samples=32, mesh=mesh1
        )
        mesh_out = jax.device_get(fused_mesh(x0, cond))
        mesh_err = float(
            np.abs(mesh_out - xla_ref).max() / (np.abs(xla_ref).max() + 1e-9)
        )
        serving["fused_mesh_parity_err"] = round(mesh_err, 5)
        serving["fused_mesh_parity_ok"] = bool(mesh_err < 2e-2)
        if not serving["fused_mesh_parity_ok"]:
            raise AssertionError(
                f"shard_map fused kernel diverged from XLA: {mesh_err}"
            )
    except Exception as e:  # never lose the headline metric to the probe
        print(f"# serving MFU probe failed: {type(e).__name__}: {e}", file=sys.stderr)

    # ---- training MFU probe (VERDICT r3 #1c): the diffusion train step at
    # the round-4 sweep knee (batch 128, bf16 fast-training config) — the
    # last hot path, published every round alongside the serving numbers.
    train = {}
    try:
        import pathlib as _pl
        import sys as _sys

        _sys.path.insert(0, str(_pl.Path(__file__).parent / "scripts"))
        from bench_train import bench_diffusion, chained_slope

        # compiled-HLO flops of the batch-40 unrolled step (scan bodies are
        # undercounted; packing off so only algorithmic flops count), from
        # `python scripts/bench_train.py --flops-only`; linear in batch.
        DIFF_FLOPS_B40 = 708272914432.0
        fl = _pl.Path(__file__).parent / ".jax_cache" / "train_flops.json"
        if fl.exists():
            DIFF_FLOPS_B40 = json.loads(fl.read_text())["diffusion_flops"]
        tb = 128
        step, state, batch = bench_diffusion(
            jax.random.fold_in(jax.random.PRNGKey(5), 3), b=tb, dtype="bf16"
        )
        dev_s = chained_slope(step, state, batch, n_long=12, n_short=3)
        train = {
            "train_batch": tb,
            "train_step_ms_bf16": round(dev_s * 1e3, 2),
            "train_samples_per_s": round(tb / dev_s, 0),
            "mfu_diffusion_train_bf16": round(
                DIFF_FLOPS_B40 * tb / 40 / dev_s / V5E_PEAK_FLOPS, 4
            ),
        }
    except Exception as e:
        print(f"# train MFU probe failed: {type(e).__name__}: {e}", file=sys.stderr)

    realtime = motion_seconds / wall
    baseline_realtime = 63.5 / 60.0  # see module docstring
    result = {
        "metric": "e2e_audio2motion_realtime_1chip",
        "value": round(realtime, 3),
        "unit": "x_realtime(ddim50,128f-windows)",
        "vs_baseline": round(realtime / baseline_realtime, 2),
        "wall_s_median5": round(wall, 4),
        "wall_s_min": round(min(times), 4),
        "wall_s_max": round(max(times), 4),
        **slope,
        "host_sync_s": round(sync_s, 4),
        "host_fetch_s": round(fetch_s, 4),
        "device_s": round(device_s, 4),
        "realtime_device_only": round(motion_seconds / device_s, 1),
        "mfu_e2e_b1": round(e2e_mfu, 4) if np.isfinite(e2e_mfu) else None,
        **serving,
        **train,
    }
    print(json.dumps(result))
    print(
        f"# {motion_seconds:.1f}s motion in {wall:.3f}s wall "
        f"(median of {len(times)}: {[round(t, 3) for t in times]}; "
        f"host sync {sync_s * 1e3:.1f}ms; {plan.num_windows} windows x 50 NFE; "
        f"warm-run {warm_s:.1f}s; denoise flops {e2e_flops:.3g} analytic)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
