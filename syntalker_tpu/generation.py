"""End-to-end audio→motion generation: windowed autoregressive outpainting.

Capability parity with the reference's ``_g_test`` window loop
(diffusion_rvqvae_trainer.py:359-541): clips longer than ``pose_length``
(128 frames) are sampled in overlapping windows; each window is seeded with
the previous window's last ``pre_frames`` (4) latent frames, then the
windows are stitched (first window whole, later windows minus the seed
overlap), scaled by ``vqvae_latent_scale`` (5), snapped through each
body-part RVQ-VAE (``latent2origin``), denormalized, the lower-body
translation velocity integrated by cumsum, and everything scattered back to
165-dof axis-angle with the jaw copied from the target.

TPU-first structure (SURVEY.md §5 long-context):

- the window loop is a ``lax.scan`` carrying the seed latent — windows are
  precomputed host-side into a stacked (W, ...) axis so every shape is
  static,
- inside each window the denoise chain is itself a ``lax.scan`` over
  timesteps (diffusion.core), so the whole clip generation is ONE compiled
  XLA program,
- conditioning (audio conv encoder + word embeddings) is computed once per
  window, not once per NFE step.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from syntalker_tpu.data import joints as J
from syntalker_tpu.diffusion.cfg import make_bodypart_cfg_model_fn
from syntalker_tpu.diffusion.core import (
    _rng_normal,
    _rng_split,
    ddim_sample,
    ddpm_sample,
)
from syntalker_tpu.diffusion.schedule import DiffusionParams
from syntalker_tpu.models.denoiser import MDM, mdm_variables
from syntalker_tpu.ops import rotations as rot


@dataclasses.dataclass(frozen=True)
class WindowPlan:
    """Static host-side description of the window decomposition
    (mirrors the arithmetic at diffusion_rvqvae_trainer.py:413-416)."""

    n_frames: int  # usable motion frames (trimmed)
    pose_length: int  # frames per window (128)
    pre_frames: int  # latent seed frames (4)
    squeeze: int  # temporal downscale (4)
    num_windows: int
    round_l: int  # fresh frames per window = pose_length - pre*squeeze

    @property
    def latent_window(self) -> int:
        return self.pose_length // self.squeeze  # 32

    @property
    def out_latent_frames(self) -> int:
        lw = self.latent_window
        fresh = lw - self.pre_frames
        return lw + (self.num_windows - 1) * fresh


def plan_windows(
    n_frames: int, *, pose_length: int = 128, pre_frames: int = 4, squeeze: int = 4
) -> WindowPlan:
    n = n_frames - n_frames % (2 * squeeze)  # trim to %8 (trainer :375-385)
    seed_span = pre_frames * squeeze  # 16 frames
    round_l = pose_length - seed_span  # 112
    num = (n - seed_span) // round_l
    if num < 1:
        raise ValueError(f"clip too short: {n_frames} frames < {pose_length}")
    return WindowPlan(
        n_frames=n,
        pose_length=pose_length,
        pre_frames=pre_frames,
        squeeze=squeeze,
        num_windows=num,
        round_l=round_l,
    )


def window_audio(audio: np.ndarray, plan: WindowPlan, sr: int = 16000, fps: int = 30):
    """Stack per-window raw-audio feature slices: (B, S, C) -> (W, B, S_w, C).

    Slice arithmetic mirrors trainer :420-422 (integer samples-per-frame).
    """
    spf = sr // fps  # 533
    wlen = spf * plan.pose_length
    out = []
    for i in range(plan.num_windows):
        start = i * spf * plan.round_l
        sl = audio[:, start : start + wlen]
        if sl.shape[1] < wlen:  # zero-pad the tail window
            pad = wlen - sl.shape[1]
            sl = np.pad(sl, ((0, 0), (0, pad)) + ((0, 0),) * (audio.ndim - 2))
        out.append(sl)
    return np.stack(out)


def window_words(word: np.ndarray, plan: WindowPlan):
    """(B, F) -> (W, B, pose_length) word-id windows (trainer :420)."""
    out = []
    for i in range(plan.num_windows):
        start = i * plan.round_l
        sl = word[:, start : start + plan.pose_length]
        if sl.shape[1] < plan.pose_length:
            sl = np.pad(sl, ((0, 0), (0, plan.pose_length - sl.shape[1])))
        out.append(sl)
    return np.stack(out)


def sample_windows(
    mdm: MDM,
    mdm_params,
    diffusion: DiffusionParams,
    plan: WindowPlan,
    audio_windows: jax.Array,  # (W, B, S_w, 2)
    word_windows: jax.Array,  # (W, B, pose_length)
    init_seed: jax.Array,  # (B, pre_frames, 1536) from GT latents (trainer :429)
    rng: jax.Array,  # one key, or per-clip keys (B, 2) for batched eval
                     # that reproduces sequential draws bitwise
    *,
    sampler: str = "ddpm",
    prompts: Optional[Dict[str, jax.Array]] = None,
    guidance: Optional[dict] = None,
    uncond_audio: bool | jax.Array = False,  # traced: one compile serves both
    style: Optional[jax.Array] = None,  # (B, style_dim) MotionCLIP embedding
) -> jax.Array:
    """Autoregressive windowed sampling; returns stitched latents
    (B, out_latent_frames, 1536) in the model's (÷latent_scale) space."""
    b = audio_windows.shape[1]
    lw = plan.latent_window
    shape = (b, lw, J.LATENT_DIM)
    sample_fn = {"ddpm": ddpm_sample, "ddim": ddim_sample}[sampler]

    # timestep embeddings for the whole schedule, once per clip — keeps the
    # table gather + MLP out of every NFE step
    variables = mdm_variables(mdm_params)
    tmap = jnp.asarray(diffusion.timestep_map)
    t_emb_all = mdm.apply(variables, tmap, method="embed_timesteps")

    def denoise_fn(x, t, cond):
        idx = jnp.searchsorted(tmap, t)  # sampled-step index per batch row
        return mdm.apply(
            variables, x, t, cond, method="denoise",
            t_emb=t_emb_all[idx],
        )

    def encode(audio, word, seed, *, uncond_audio=False, prompt=None, uncond_prompt=False):
        return mdm.apply(
            variables,
            audio,
            word,
            seed,
            prompt=prompt,
            style=style,
            uncond_audio=uncond_audio,
            uncond_prompt=uncond_prompt,
            method="encode_cond",
        )

    use_cfg = prompts is not None
    guidance = guidance or {}

    def body(carry, xs):
        seed, key = carry
        audio, word = xs
        key, k_samp = _rng_split(key)

        if not use_cfg:
            cond = encode(audio, word, seed, uncond_audio=uncond_audio)
            model_fn = lambda x, t: denoise_fn(x, t, cond)  # noqa: E731
        else:
            cond_audio = encode(audio, word, seed, uncond_prompt=True)
            uncond = encode(audio, word, seed, uncond_audio=True, uncond_prompt=True)
            part_conds = {}
            for name in J.LATENT_SLICES:
                p = prompts.get(name) if prompts else None
                part_conds[name] = (
                    None
                    if p is None
                    else encode(audio, word, seed, uncond_audio=True, prompt=p)
                )
            model_fn = make_bodypart_cfg_model_fn(
                denoise_fn,
                cond_audio,
                uncond,
                part_conds,
                audio_scale=guidance.get("audio_scale", 1.0),
                prompt_scale=guidance.get("prompt_scale", 4.0),
            )

        x = sample_fn(diffusion, model_fn, shape, k_samp)
        new_seed = x[:, -plan.pre_frames :, :]
        return (new_seed, key), x

    (_, _), windows = jax.lax.scan(
        body, (init_seed, rng), (audio_windows, word_windows)
    )
    # Stitch: first window whole, later windows minus the seed overlap
    # (trainer :467-474). Static shapes: windows is (W, B, lw, 1536).
    first = windows[0]
    rest = windows[1:, :, plan.pre_frames :, :]
    rest = jnp.moveaxis(rest, 0, 1).reshape(b, -1, J.LATENT_DIM)
    return jnp.concatenate([first, rest], axis=1)


def sample_windows_lean(
    mdm: MDM,
    mdm_params,
    diffusion: DiffusionParams,
    plan: WindowPlan,
    audio_windows: jax.Array,  # (W, B, S_w, 2)
    word_windows: jax.Array,  # (W, B, pose_length)
    init_seed: jax.Array,  # (B, pre_frames, 1536)
    rng: jax.Array,
) -> jax.Array:
    """Latency-optimized windowed DDIM sampler (the batch-1 flagship path).

    Same math as :func:`sample_windows` (sampler="ddim", η=0, no
    CFG/prompt/style), restructured so the NFE scan body is as small as
    XLA allows — at batch 1 the step cost is fixed-overhead-per-op bound
    (the matmul FLOPs are microseconds; measured ~11% off the 16-window
    e2e clip on chip vs the general sampler), so fewer/larger ops in the
    scan body is the lever:

    - ``input_process`` and the x_emb slab of ``input_process2`` fold into
      ONE (1536, 512) matmul: ``x @ (W_in @ W2_mid)`` — exact algebra,
      precomputed once per call;
    - the audio/word slab (``at @ W2_at``) and every bias are precomputed
      per window; the style row ``(seed_emb + t_emb) @ W2_style`` splits
      into a per-window seed row + per-schedule timestep rows (linearity),
      so the scan body adds two precomputed vectors instead of running a
      concat + (T, 1280) matmul;
    - the η=0 DDIM update is the two-coefficient form
      ``x' = a_i x + b_i x0`` (coefficients precomputed over the schedule,
      same derivation as ops.mdm_pallas.make_fused_ddim_window);
    - per step only ``run_blocks`` (the shared 'blocks' scope) goes through
      flax;
    - the ENTIRE audio/word conditioning (the WavEncoder conv pyramid +
      word embedding + mix) is hoisted OUT of the sequential window scan:
      ``at_feat`` is seed-independent, so all W windows run as ONE batched
      (W·B) encode before the scan — W sequential batch-1 conv pyramids
      collapse into one well-filled conv call. Only ``embed_seed`` touches
      the autoregressive carry, and it folds through the style slab into a
      single (pre·1536, 512) matmul inside the scan body.

    RNG consumption is bit-identical to :func:`sample_windows` + η=0
    ``ddim_sample`` (the σ=0 noise draw there multiplies to exact zero, so
    skipping it changes nothing). Everything is jit-compatible: the window
    loop is a ``lax.scan``, so whole-clip generation stays ONE program.
    Numerics match sample_windows(ddim) to f32 re-association tolerance
    (parity-pinned in tests/test_generation.py).
    """
    cfg = mdm.cfg
    b = audio_windows.shape[1]
    lw = plan.latent_window
    shape = (b, lw, J.LATENT_DIM)
    variables = mdm_variables(mdm_params)
    p = variables["params"]
    d = cfg.latent_dim

    tmap = jnp.asarray(diffusion.timestep_map)
    t_emb_all = mdm.apply(variables, tmap, method="embed_timesteps")

    # exact algebraic folds (all f32, hoisted out of both scans by XLA)
    w_in, b_in = p["input_process"]["kernel"], p["input_process"]["bias"]
    w2, b2 = p["input_process2"]["kernel"], p["input_process2"]["bias"]
    w2_style, w2_mid, w2_at = w2[:d], w2[d : 2 * d], w2[2 * d :]
    w_x = w_in @ w2_mid  # (1536, 512)
    bias_c = b_in @ w2_mid + b2  # (512,)
    w_out, b_out = p["output_process"]["kernel"], p["output_process"]["bias"]

    # DDIM η=0 coefficients in iteration order (see make_fused_ddim_window)
    s_steps = diffusion.num_steps
    idx = np.arange(s_steps - 1, -1, -1)
    abar_prev = np.asarray(diffusion.alphas_cumprod_prev, np.float64)[idx]
    r = np.asarray(diffusion.sqrt_recip_alphas_cumprod, np.float64)[idx]
    rm1 = np.asarray(diffusion.sqrt_recipm1_alphas_cumprod, np.float64)[idx]
    s1m = np.sqrt(np.maximum(1.0 - abar_prev, 0.0))
    coef_a = jnp.asarray(s1m * r / rm1, jnp.float32)
    coef_b = jnp.asarray(np.sqrt(abar_prev) - s1m / rm1, jnp.float32)
    # timestep rows through the style slab, iteration order
    t_rows = (t_emb_all @ w2_style)[::-1]  # (S, 512)

    from syntalker_tpu.models.denoiser import apply_rope, rope_angles

    hd = d // cfg.rope_heads
    angles = rope_angles(lw, hd)[:, None, :]

    # ---- hoisted conditioning: at_feat depends only on (audio, word) ------
    # One (W·B)-batched encode replaces W sequential batch-1 WavEncoder
    # pyramids inside the scan (the conv pyramid was the only non-denoise
    # cost on the window critical path). seed_emb from the dummy zero seed
    # is discarded; its cost is one tiny matmul.
    n_win = audio_windows.shape[0]
    aw_flat = audio_windows.reshape((n_win * b,) + audio_windows.shape[2:])
    ww_flat = word_windows.reshape((n_win * b,) + word_windows.shape[2:])
    zero_seed = jnp.zeros((n_win * b, plan.pre_frames, J.LATENT_DIM))
    cond_all = mdm.apply(variables, aw_flat, ww_flat, zero_seed, method="encode_cond")
    at_all = cond_all.at_feat[:, :lw].reshape(n_win, b, lw, -1)
    at_c_all = at_all @ w2_at + bias_c  # (W, B, T, 512)

    # embed_seed folded through the style slab: seed_emb @ w2_style
    # = seed_flat @ (W_es @ w2_style) + b_es @ w2_style (exact algebra)
    w_es, b_es = p["embed_seed"]["kernel"], p["embed_seed"]["bias"]
    w_seed = w_es @ w2_style  # (pre*1536, 512)
    b_seed = b_es @ w2_style  # (512,)

    def body(carry, at_c):
        seed, key = carry
        key, k_samp = _rng_split(key)
        seed_row = seed.reshape(b, -1) @ w_seed + b_seed  # (B, 512)

        k_samp, k0 = _rng_split(k_samp)
        x0_noise = _rng_normal(k0, shape)

        def step(x, it):
            h = x @ w_x + at_c + (seed_row + t_rows[it])[:, None, :]
            xh = h.reshape(b, lw, cfg.rope_heads, hd)
            h = apply_rope(xh, angles).reshape(b, lw, d)
            h = mdm.apply(variables, h, method="run_blocks")
            x0 = h @ w_out + b_out
            return coef_a[it] * x + coef_b[it] * x0, None

        x, _ = jax.lax.scan(step, x0_noise, jnp.arange(s_steps))
        return (x[:, -plan.pre_frames :, :], key), x

    (_, _), windows = jax.lax.scan(body, (init_seed, rng), at_c_all)
    first = windows[0]
    rest = windows[1:, :, plan.pre_frames :, :]
    rest = jnp.moveaxis(rest, 0, 1).reshape(b, -1, J.LATENT_DIM)
    return jnp.concatenate([first, rest], axis=1)


def make_fused_loop_sampler(
    mdm: MDM,
    mdm_params,
    diffusion: DiffusionParams,
    plan: WindowPlan,
    *,
    tile_samples: int = 1,
    interpret: bool = False,
    mesh=None,
):
    """Build the fused-loop windowed sampler: the ENTIRE NFE loop runs as
    one Pallas kernel per window (:func:`ops.mdm_pallas.
    make_fused_ddim_window`), and the host loop is exactly TWO async
    dispatches per window.

    The batch-1 LATENCY variant of :func:`sample_windows_fused`: where that
    path dispatches one fused block-stack kernel per NFE step (50 kernel +
    50 update dispatches per window), here the whole 50-step loop lives
    inside the kernel — the DDIM state never leaves VMEM. Dispatch count
    matters as much as device time on a remote-attached chip (the axon
    relay costs ~27 ms per BLOCKING host round trip, and eager non-jitted
    ops like `jax.random.split` block): all window noises are drawn in one
    jitted program up front (bitwise-identical RNG consumption to
    :func:`sample_windows_fused`), the seed slice is folded into the next
    window's jitted encode, and stitching is one jitted call at the end.

    Returns ``sample(audio_windows, word_windows, init_seed, rng)`` with
    the signature/semantics of :func:`sample_windows` restricted to DDIM
    η=0 without CFG/prompt/style. Factory-style (like the serving path's
    prebuilt ``make_fused_denoise``) so every jit below is traced once, not
    per call.

    ``mesh``: data-parallel composition (VERDICT r3 #3) — the fused kernel
    runs per-device under ``shard_map`` over the mesh's 'data' axis, and
    every surrounding program (encode, noise prep, seed embed, stitch) is
    jitted with batch-axis shardings so the state never gathers between
    windows. Per-sample independence means zero collectives; the kernel
    math is identical per shard (the sharded encode may compile with a
    different conv reduction order, a ~1e-5 conditioning difference —
    pinned at the fused-path tolerance in tests/test_mdm_pallas.py).
    """
    from syntalker_tpu.models.denoiser import Conditioning
    from syntalker_tpu.ops.mdm_pallas import make_fused_ddim_window

    variables = mdm_variables(mdm_params)
    fused = make_fused_ddim_window(
        mdm.cfg, mdm_params, diffusion, tile_samples=tile_samples,
        interpret=interpret, mesh=mesh,
    )
    lw = plan.latent_window
    pre = plan.pre_frames
    n_windows = plan.num_windows
    p = variables["params"]
    w_es, b_es = p["embed_seed"]["kernel"], p["embed_seed"]["bias"]

    if mesh is None:
        jit_b0 = jit_b1 = jax.jit  # batch axis 0 / batch axis 1
    else:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as PS

        def ns(*spec):
            return NamedSharding(mesh, PS(*spec))

        def jit_b0(f):  # programs whose arrays are batch-leading
            return jax.jit(f, out_shardings=ns("data"))

        def jit_b1(f):  # programs over (W, B, ...) window stacks
            return jax.jit(f, out_shardings=ns(None, "data"))

    @jit_b0
    def prep_noise(rng, init_seed):
        # per-window initial noise, drawn in ONE dispatch with the exact
        # split chain of sample_windows_fused (key -> k_samp -> k0 per
        # window) so the two paths consume identical bits
        b = init_seed.shape[0]
        key = rng
        noises = []
        for _ in range(n_windows):
            key, k_samp = _rng_split(key)
            k_samp, k0 = _rng_split(k_samp)
            noises.append(_rng_normal(k0, (b, lw, J.LATENT_DIM)))
        return noises

    @jit_b1
    def encode_all(audio_windows, word_windows):
        # at_feat is seed-independent (the kernel consumes only
        # at_feat + seed_emb): ONE (W·B)-batched WavEncoder call up front
        # replaces a full encode_cond dispatch per window on the
        # autoregressive critical path.
        # Compile-scaling tradeoff: this jit-compiles encode_cond at batch
        # n_windows*B, and large-batch encode_cond COLD-compiles are very
        # slow through the remote tunnel (>9 min at batch 256 —
        # docs/serving_roofline_round3.md). For very long clips or big
        # serving batches, either warm the persistent compilation cache
        # once per shape or fall back to the per-window encode of
        # sample_windows_fused; steady-state serving reuses one (W·B)
        # shape so the cost is one-time.
        n_w, b = audio_windows.shape[:2]
        aw = audio_windows.reshape((n_w * b,) + audio_windows.shape[2:])
        ww = word_windows.reshape((n_w * b,) + word_windows.shape[2:])
        zseed = jnp.zeros((n_w * b, pre, J.LATENT_DIM))
        cond = mdm.apply(variables, aw, ww, zseed, method="encode_cond")
        return cond.at_feat.reshape((n_w, b) + cond.at_feat.shape[1:])

    @jit_b0
    def seed_emb_first(seed):  # embed_seed dense, out-of-flax (exact)
        return seed.reshape(seed.shape[0], -1) @ w_es + b_es

    @jit_b0
    def seed_emb_next(x_prev):
        s = x_prev[:, -pre:, :]
        return s.reshape(s.shape[0], -1) @ w_es + b_es

    @jit_b0
    def stitch(outs):
        windows = jnp.stack(outs)  # (W, B, lw, 1536)
        b = windows.shape[1]
        first = windows[0]
        rest = windows[1:, :, pre:, :]
        rest = jnp.moveaxis(rest, 0, 1).reshape(b, -1, J.LATENT_DIM)
        return jnp.concatenate([first, rest], axis=1)

    def sample(audio_windows, word_windows, init_seed, rng):
        noises = prep_noise(rng, init_seed)
        at_all = encode_all(audio_windows, word_windows)
        outs = []
        x = None
        for w in range(n_windows):
            se = seed_emb_first(init_seed) if w == 0 else seed_emb_next(x)
            cond = Conditioning(
                at_feat=at_all[w], seed_emb=se, prompt_feat=None,
                style_feat=None,
            )
            x = fused(noises[w], cond)
            outs.append(x)
        return stitch(outs)

    return sample


def sample_windows_fused_loop(
    mdm: MDM,
    mdm_params,
    diffusion: DiffusionParams,
    plan: WindowPlan,
    audio_windows: jax.Array,  # (W, B, S_w, 2)
    word_windows: jax.Array,  # (W, B, pose_length)
    init_seed: jax.Array,  # (B, pre_frames, 1536)
    rng: jax.Array,
    *,
    tile_samples: int = 1,
    interpret: bool = False,
    fused=None,  # prebuilt make_fused_loop_sampler result
) -> jax.Array:
    """One-shot wrapper over :func:`make_fused_loop_sampler` (which see).
    Callers sampling repeatedly should build the sampler once and reuse it
    — every call here re-traces the factory's jits."""
    if fused is None:
        fused = make_fused_loop_sampler(
            mdm, mdm_params, diffusion, plan, tile_samples=tile_samples,
            interpret=interpret,
        )
    return fused(audio_windows, word_windows, init_seed, rng)


def sample_windows_fused(
    mdm: MDM,
    mdm_params,
    diffusion: DiffusionParams,
    plan: WindowPlan,
    audio_windows: jax.Array,  # (W, B, S_w, 2)
    word_windows: jax.Array,  # (W, B, pose_length)
    init_seed: jax.Array,  # (B, pre_frames, 1536)
    rng: jax.Array,
    *,
    tile_samples: int = 32,
    interpret: bool = False,
    fused=None,  # prebuilt make_fused_denoise closure (a service caches it
                 # across batches; the bf16 weight casts are not free)
) -> jax.Array:
    """Windowed DDIM sampling through the fused Pallas block stack.

    The serving-throughput variant of :func:`sample_windows`: the NFE loop
    is dispatched from the host (a scan-embedded ``pallas_call`` stalls the
    remote compiler — docs/serving_roofline_round3.md) with each step one
    fused 8-layer kernel (``ops.mdm_pallas.make_fused_denoise``) plus one
    jitted elementwise DDIM update. Dispatches are async, so the device
    stays saturated; at batch 256 this is the ~0.5-MFU path bench.py
    reports as ``mfu_denoise_serving_pallas``.

    Scope (the BEAT2 serving configuration): DDIM only, η=0, no body-part
    CFG/prompt/style conditioning. RNG consumption mirrors
    :func:`sample_windows` + ``ddim_sample`` exactly, so outputs match the
    XLA scan path to the fused kernel's bf16-weight tolerance.
    """
    from syntalker_tpu.ops.mdm_pallas import make_fused_denoise

    b = audio_windows.shape[1]
    lw = plan.latent_window
    shape = (b, lw, J.LATENT_DIM)
    variables = mdm_variables(mdm_params)
    tmap = jnp.asarray(diffusion.timestep_map)
    t_emb_all = mdm.apply(variables, tmap, method="embed_timesteps")
    n_steps = diffusion.num_steps

    if fused is None:
        # largest tile that divides the batch (the kernel tiles samples
        # into shared grid steps; odd batches fall back to smaller tiles)
        tile = max(t for t in range(1, tile_samples + 1) if b % t == 0)
        fused = make_fused_denoise(
            mdm.cfg, mdm_params, tile_samples=tile, interpret=interpret
        )

    @jax.jit
    def encode(audio, word, seed):
        return mdm.apply(variables, audio, word, seed, method="encode_cond")

    @jax.jit
    def ddim_update(x, pred_x0, i):
        from syntalker_tpu.diffusion.core import predict_eps_from_xstart

        t = jnp.full((b,), i, jnp.int32)
        eps = predict_eps_from_xstart(diffusion, x, t, pred_x0)
        abar_prev = diffusion.gather("alphas_cumprod_prev", t)
        return jnp.sqrt(abar_prev) * pred_x0 + jnp.sqrt(
            jnp.maximum(1 - abar_prev, 0.0)
        ) * eps

    seed, key = init_seed, rng
    outs = []
    for w in range(plan.num_windows):
        key, k_samp = _rng_split(key)
        cond = encode(audio_windows[w], word_windows[w], seed)
        k_samp, k0 = _rng_split(k_samp)
        x = _rng_normal(k0, shape)
        for it in range(n_steps):
            i = n_steps - 1 - it
            te = jnp.tile(t_emb_all[i][None], (b, 1))
            pred_x0 = fused(x, te, cond)
            x = ddim_update(x, pred_x0, i)
        outs.append(x)
        seed = x[:, -plan.pre_frames :, :]

    windows = jnp.stack(outs)  # (W, B, lw, 1536)
    first = windows[0]
    rest = windows[1:, :, plan.pre_frames :, :]
    rest = jnp.moveaxis(rest, 0, 1).reshape(b, -1, J.LATENT_DIM)
    return jnp.concatenate([first, rest], axis=1)


def decode_latents_h3d(
    latents: jax.Array,  # (B, T_lat, 1536) model-space (÷scale)
    *,
    rvq_modules: dict,  # part -> (module, params, state)
    h3d_stats,
    latent_scale: float = 5.0,
):
    """Latents -> 623-dim HumanML3D features -> joint positions.

    The text-control test path (h3d_diffusion_new_trainer.py:561-607 +
    recover_from_ric): per-part RVQ snap+decode, scatter through the
    623-d body-part masks, denormalize, recover global joints.
    """
    from syntalker_tpu.data.h3d import H3D_DIM, part_mask_623, recover_from_ric

    z = latents * latent_scale
    b = z.shape[0]
    feats = None
    for name, (lo, hi) in J.LATENT_SLICES.items():
        module, params, state = rvq_modules[name]
        part = module.apply(
            {"params": params}, z[..., lo:hi], state, method="latent2origin"
        )
        if feats is None:
            feats = jnp.zeros((b, part.shape[1], H3D_DIM), part.dtype)
        feats = feats.at[..., jnp.asarray(part_mask_623(name))].set(part)
    feats = h3d_stats.denormalize(feats)
    joints = recover_from_ric(feats)
    return {"features": feats, "joints": joints}


def decode_latents(
    latents: jax.Array,  # (B, T_lat, 1536) model-space (÷scale)
    *,
    rvq_modules: dict,  # part -> (module, params, state)
    stats,
    latent_scale: float = 5.0,
    use_trans: bool = True,
):
    """Latents -> per-part pose features -> full-body rot6d + translation.

    Mirrors trainer :476-531: ×latent_scale, RVQ snap+decode per part,
    denormalize, integrate lower-body translation velocity, scatter parts
    into the 330-dim rot6d vector (jaw/eyes remain zero for the caller to
    fill), and return axis-angle too.
    """
    z = latents * latent_scale
    parts = {}
    for name, (lo, hi) in J.LATENT_SLICES.items():
        module, params, state = rvq_modules[name]
        parts[name] = module.apply(
            {"params": params}, z[..., lo:hi], state, method="latent2origin"
        )
    return decode_parts(parts, stats=stats, use_trans=use_trans)


def decode_parts(parts: Dict[str, jax.Array], *, stats, use_trans: bool = True):
    """Normalized per-part features -> full-body rot6d/axis-angle/trans.

    The post-RVQ half of :func:`decode_latents` (trainer :484-531), shared so
    externally decoded part features (e.g. a torch reference stack under a
    parity experiment) go through the identical denormalize/scatter/rotation
    math as our sampler outputs.
    """
    rec_upper = stats.denormalize_part(parts["upper"], "upper")
    rec_hands = stats.denormalize_part(parts["hands"], "hands")
    lower = parts["lower"]
    rec_trans = None
    if use_trans:
        trans_v = lower[..., -3:] * stats.trans_std + stats.trans_mean
        rec_trans = jnp.cumsum(trans_v, axis=-2)
        # y (height) stays a direct prediction, not integrated (trainer :490)
        rec_trans = rec_trans.at[..., 1].set(trans_v[..., 1])
        lower = lower[..., :-3]
    rec_lower = stats.denormalize_part(lower, "lower")

    b, t = rec_upper.shape[:2]
    rot6d_full = jnp.zeros((b, t, J.ROT6D_DIM), rec_upper.dtype)
    rot6d_full = rot6d_full.at[..., J.UPPER_6D_IDX].set(rec_upper)
    rot6d_full = rot6d_full.at[..., J.HANDS_6D_IDX].set(rec_hands)
    rot6d_full = rot6d_full.at[..., J.LOWER_6D_IDX].set(rec_lower)

    # rot6d -> axis-angle for the SMPL-X / rendering consumers
    m = rot.rotation_6d_to_matrix(rot6d_full.reshape(b, t, J.NUM_JOINTS, 6))
    aa = rot.matrix_to_axis_angle(m).reshape(b, t, J.AXIS_ANGLE_DIM)
    # re-orthonormalized rot6d (reference round-trips :528-531)
    rot6d_clean = rot.matrix_to_rotation_6d(m).reshape(b, t, J.ROT6D_DIM)

    return {
        "rot6d": rot6d_clean,
        "axis_angle": aa,
        "trans": rec_trans,
        "parts": {"upper": rec_upper, "hands": rec_hands, "lower": rec_lower},
    }
