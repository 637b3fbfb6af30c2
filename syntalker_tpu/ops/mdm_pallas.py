"""Fused transformer-stack kernel (Pallas/TPU) for low-batch denoising.

The DDIM sampling loop is latency-bound at batch 1: each NFE step of the
8-layer MDM stack lowers to ~120 small XLA kernels whose fixed per-kernel
cost (~5-7 µs) dominates the actual math (T=32 tokens, D=512). This kernel
collapses the whole block stack into ONE ``pallas_call``:

- grid = (B, L): for each sample, the L grid steps stream layer weights
  HBM→VMEM with the Pallas pipeline's double buffering while computing the
  previous layer,
- the activation (T, D) lives in a revisited VMEM output block across all
  L steps of a sample,
- weights are stored bf16 (halves streaming; matmuls accumulate in f32 via
  ``preferred_element_type``),
- LayerNorm → fused-qkv attention (4 heads) → projection → LayerNorm →
  GELU MLP, numerics matching
  :class:`syntalker_tpu.models.denoiser.TransformerBlock` (pre-LN, no qkv
  bias, f32 softmax).

Round 3 adds ``tile_samples``: the serving configuration (batch 256) tiles
several samples into one grid step so the token-parallel matmuls run at
(tile_samples*T, D) = full MXU row tiles instead of T=32 rows, while
attention stays per-sample via static slices inside the tile. The
activation tile lives in VMEM across all L layers — the elementwise/LN/
residual traffic that bounds the XLA serving loop (measured ~0.35 MFU)
never touches HBM between layers.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32

# v5e has 128 MiB of physical VMEM; XLA's default *scoped* limit is 16 MiB,
# which caps tile_samples at 32 (the tile-64 OOM shows as "scoped vmem limit
# exceeded" at compile time). Raising the per-kernel limit lets the sweep
# explore the real hardware ceiling; 100 MiB leaves headroom for the
# pipeline's own double buffers.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _layer_norm(x, scale, bias, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _dot(a, b):
    return jax.lax.dot(a, b, preferred_element_type=F32)


def _block_math(
    x,  # (S, D) f32 activation, S = tile_samples * T tokens
    ln1_s, ln1_b,  # (D,)
    wqkv,  # (D, 3D) bf16
    wproj, bproj,  # (D, D) bf16, (D,)
    ln2_s, ln2_b,  # (D,)
    wfc1, bfc1,  # (D, F) bf16, (F,)
    wfc2, bfc2,  # (F, D) bf16, (D,)
    *,
    num_heads: int,
    tile_samples: int,
    attn_group: int = 1,
):
    """One pre-LN transformer block on in-register/VMEM values — shared by
    the block-stack kernel and the full-DDIM-loop kernel.

    ``attn_group=g`` groups g samples' tokens into one block-diagonal
    (g·T, g·T) masked score dot: per-sample (T, T) dots fill only T/128 of
    the MXU output tile (T=32 → 25% rows), so grouping trades g× wasted
    score FLOPs + g× softmax exps (scores are ~3% of block FLOPs) for
    full-row MXU fill on the attention matmuls. g must divide
    tile_samples; g=1 is the per-sample batched path, g=tile_samples the
    fully-masked extreme. Numerics are identical: the additive −1e30 mask
    zeroes cross-sample probs exactly (exp underflow), and each softmax
    row still normalizes over its own sample's block only."""
    s, d = x.shape
    t = s // tile_samples  # per-sample sequence length
    hd = d // num_heads
    if tile_samples % attn_group:
        raise ValueError(
            f"attn_group={attn_group} must divide tile_samples={tile_samples}"
        )
    if tile_samples == 1 and attn_group != 1:
        # the latency path below has no grouping — silently ignoring the
        # option would mislabel measurements
        raise ValueError("attn_group > 1 requires tile_samples > 1")

    # --- attention ---------------------------------------------------------
    h = _layer_norm(x, ln1_s, ln1_b)
    qkv = _dot(h.astype(jnp.bfloat16), wqkv)  # (S, 3D) f32 accum
    scale = hd ** -0.5
    if tile_samples == 1:
        # latency path: per-head small matmuls on the single sample
        head_outs = []
        for head in range(num_heads):
            q = qkv[:, head * hd : (head + 1) * hd]
            k = qkv[:, d + head * hd : d + (head + 1) * hd]
            v = qkv[:, 2 * d + head * hd : 2 * d + (head + 1) * hd]
            scores = _dot(q * scale, k.T)  # (T, T)
            probs = jax.nn.softmax(scores, axis=-1)
            head_outs.append(_dot(probs, v))  # (T, hd)
        attn_out = jnp.concatenate(head_outs, axis=-1)
    else:
        # serving path: per-head BATCHED dot over groups of attn_group
        # samples — (nb, gT, hd) x (nb, gT, hd) -> (nb, gT, gT) scores.
        # attn_group=1 recovers the round-3 per-sample batched form (no
        # mask, no wasted score work); attn_group=tile_samples is the
        # original single (S, S) masked matmul that lost at tile 8 (8x the
        # exps). Mosaic lowers the batched dot in-kernel, so there is no
        # per-matmul dispatch cost to amortize either way.
        g = attn_group
        nb = tile_samples // g
        gt = g * t
        if g > 1:
            row = jax.lax.broadcasted_iota(jnp.int32, (gt, gt), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (gt, gt), 1)
            mask = jnp.where((row // t) == (col // t), 0.0, -1e30).astype(F32)
        head_outs = []
        for head in range(num_heads):
            q = qkv[:, head * hd : (head + 1) * hd].reshape(nb, gt, hd)
            k = qkv[:, d + head * hd : d + (head + 1) * hd].reshape(nb, gt, hd)
            v = qkv[:, 2 * d + head * hd : 2 * d + (head + 1) * hd].reshape(nb, gt, hd)
            scores = jax.lax.dot_general(
                q * scale, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=F32,
            )  # (nb, gT, gT)
            if g > 1:
                scores = scores + mask[None]
            probs = jax.nn.softmax(scores, axis=-1)
            out = jax.lax.dot_general(
                probs, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=F32,
            )  # (nb, gT, hd)
            head_outs.append(out.reshape(s, hd))
        attn_out = jnp.concatenate(head_outs, axis=-1)
    x = x + _dot(attn_out.astype(jnp.bfloat16), wproj) + bproj

    # --- mlp ---------------------------------------------------------------
    h = _layer_norm(x, ln2_s, ln2_b)
    h = _dot(h.astype(jnp.bfloat16), wfc1) + bfc1
    # tanh-approx GELU: the flax blocks use exact erf GELU, but erf/erfc has
    # no Mosaic TPU lowering; max deviation ~1e-3 of activation scale, well
    # inside the kernel's bf16-weight tolerance (parity test pins 2e-2)
    h = jax.nn.gelu(h, approximate=True)
    return x + _dot(h.astype(jnp.bfloat16), wfc2) + bfc2


def _block_kernel(
    x_in_ref,  # (1, T, D) f32 — this sample's block input
    ln1_s_ref, ln1_b_ref,  # (1, 1, D)
    wqkv_ref,  # (1, D, 3D) bf16
    wproj_ref, bproj_ref,  # (1, D, D) bf16, (1, 1, D)
    ln2_s_ref, ln2_b_ref,  # (1, 1, D)
    wfc1_ref, bfc1_ref,  # (1, D, F) bf16, (1, 1, F)
    wfc2_ref, bfc2_ref,  # (1, F, D) bf16, (1, 1, D)
    out_ref,  # (1, S, D) f32 — revisited across the L grid steps
    *,
    num_heads: int,
    tile_samples: int,
    attn_group: int = 1,
):
    layer = pl.program_id(1)

    # first layer of each tile consumes the block input; later layers the
    # carried activation
    @pl.when(layer == 0)
    def _():
        out_ref[...] = x_in_ref[...]

    out_ref[0] = _block_math(
        out_ref[0],
        ln1_s_ref[0, 0], ln1_b_ref[0, 0],
        wqkv_ref[0],
        wproj_ref[0], bproj_ref[0, 0],
        ln2_s_ref[0, 0], ln2_b_ref[0, 0],
        wfc1_ref[0], bfc1_ref[0, 0],
        wfc2_ref[0], bfc2_ref[0, 0],
        num_heads=num_heads, tile_samples=tile_samples, attn_group=attn_group,
    )


def stack_block_weights(block_params: Dict) -> Dict[str, jax.Array]:
    """Flax scan-stacked block params ('blocks/block/...') -> the kernel's
    weight dict (matmul weights cast to bf16)."""
    p = block_params
    def vec(a):
        # Mosaic tiling wants >=2 trailing dims; store vectors as (L, 1, D)
        a = jnp.asarray(a, F32)
        return a[:, None, :]

    # head-aligned (L, C, 3, H, hd) qkv kernel -> the kernel's flat (L, C, 3C)
    # view (C-order flatten = the part-major column layout _block_kernel
    # slices); legacy flat kernels pass through
    wqkv = jnp.asarray(p["qkv"]["kernel"], jnp.bfloat16)
    wqkv = wqkv.reshape(wqkv.shape[0], wqkv.shape[1], -1)

    return {
        "ln1_s": vec(p["norm1"]["scale"]),
        "ln1_b": vec(p["norm1"]["bias"]),
        "wqkv": wqkv,
        "wproj": jnp.asarray(p["proj"]["kernel"], jnp.bfloat16),
        "bproj": vec(p["proj"]["bias"]),
        "ln2_s": vec(p["norm2"]["scale"]),
        "ln2_b": vec(p["norm2"]["bias"]),
        "wfc1": jnp.asarray(p["fc1"]["kernel"], jnp.bfloat16),
        "bfc1": vec(p["fc1"]["bias"]),
        "wfc2": jnp.asarray(p["fc2"]["kernel"], jnp.bfloat16),
        "bfc2": vec(p["fc2"]["bias"]),
    }


def make_fused_denoise(cfg, params, *, tile_samples: int = 8, interpret: bool = False):
    """Serving denoise with the Pallas block stack: numerics mirror
    :meth:`MDM.denoise` (input_process → style/audio concat →
    input_process2 → RoPE → block stack → output_process), with the 8-layer
    stack as ONE pallas_call (bf16-stored weights, VMEM-resident
    activations). Signature matches the sampler's needs:
    ``denoise(x_t, t_emb, cond) -> x0_pred``, t_emb precomputed.

    Built from a bare param tree (or full variables) of a stateless-config
    MDM; the prompt/style concat paths are not fused (BEAT2 serving uses
    neither).
    """
    from syntalker_tpu.models.denoiser import apply_rope, rope_angles

    p = params["params"] if isinstance(params, dict) and "params" in params else params
    w = stack_block_weights(p["blocks"]["block"])
    io = {k: p[k] for k in ("input_process", "input_process2", "output_process")}

    # weights are passed as ARGUMENTS to the jitted impl, never closed over:
    # closure capture turns ~25 MB of parameters into inline HLO constants,
    # which stalls the remote (tunnel) compiler indefinitely — measured: the
    # same program compiles in ~1 s with weights as args.
    @functools.partial(jax.jit, static_argnames=("num_heads", "rope_heads",
                                                 "tile_samples", "interpret"))
    def _impl(io, w, x_t, t_emb, seed_emb, at_feat, *, num_heads, rope_heads,
              tile_samples, interpret):
        b, n, _ = x_t.shape

        def dense(name, x):
            return x @ io[name]["kernel"] + io[name]["bias"]

        x_emb = dense("input_process", x_t)
        style = (seed_emb + t_emb)[:, None, :].repeat(n, axis=1)
        xseq = jnp.concatenate([style, x_emb, at_feat[:, :n]], axis=-1)
        xseq = dense("input_process2", xseq)
        d = xseq.shape[-1]
        hd = d // rope_heads
        xh = xseq.reshape(b, n, rope_heads, hd)
        xh = apply_rope(xh, rope_angles(n, hd)[:, None, :])
        xseq = xh.reshape(b, n, d)
        xseq = fused_block_stack(
            xseq, w, num_heads=num_heads, tile_samples=tile_samples,
            interpret=interpret,
        )
        return dense("output_process", xseq)

    def denoise(x_t, t_emb, cond):
        return _impl(
            io, w, x_t, t_emb, cond.seed_emb, cond.at_feat,
            num_heads=cfg.num_heads, rope_heads=cfg.rope_heads,
            tile_samples=tile_samples, interpret=interpret,
        )

    return denoise


def rope_flat_tables(n: int, d: int, rope_heads: int):
    """RoPE as elementwise tables + one matmul on the FLAT (T, D) layout.

    ``apply_rope`` (denoiser.py) is linear in x: x' = cos⊙x + sin⊙rot(x)
    where rot is the per-sub-head half-swap-negate. On the flat layout rot
    is a fixed (D, D) signed permutation P, so the kernel can apply RoPE
    without the (T, RH, hd) reshape (unsupported lane regrouping in
    Mosaic): x' = cos_flat*x + (x@P)*sin_flat. P entries are ±1 — exact in
    bf16 — and the extra (T,D)x(D,D) matmul is noise next to the block
    matmuls. Returns (cos_flat (n,d) f32, sin_flat (n,d) f32, P (d,d) bf16).
    """
    hd = d // rope_heads
    # numpy mirror of denoiser.rope_angles (f32 like the jnp version):
    # callable under an outer jit, where the jnp version would be a tracer
    inv_freq = (
        1.0 / (10000.0 ** (np.arange(0, hd, 2, dtype=np.float32) / np.float32(hd)))
    ).astype(np.float32)
    freqs = np.arange(n, dtype=np.float32)[:, None] * inv_freq[None, :]
    ang = np.concatenate([freqs, freqs], axis=-1)  # (n, hd)
    cos_flat = np.tile(np.cos(ang), (1, rope_heads)).astype(np.float32)
    sin_flat = np.tile(np.sin(ang), (1, rope_heads)).astype(np.float32)
    perm = np.zeros((d, d), np.float32)
    half = hd // 2
    for h in range(rope_heads):
        o = h * hd
        for c in range(half):
            perm[o + c + half, o + c] = -1.0  # rot[c] = -x[c + hd/2]
            perm[o + c, o + c + half] = 1.0  # rot[c + hd/2] = x[c]
    return (
        jnp.asarray(cos_flat),
        jnp.asarray(sin_flat),
        jnp.asarray(perm, jnp.bfloat16),
    )


def _ddim_window_kernel(
    # per-tile / per-step inputs (K = tile_samples; K=1 is the latency path)
    x_init_ref,  # (K, T, C) f32 initial noise, consumed at (step 0, layer 0)
    temb_ref,  # (1, 1, D) f32 — this step's timestep embedding
    ca_ref, cb_ref,  # (1, 1, 1) f32 DDIM x/x0 coefficients for this step
    seed_ref,  # (K, 1, D) f32 seed-latent embedding (per window)
    at_ref,  # (K, T, A) f32 audio+word features (per window)
    # resident tables / io weights
    cos_ref, sin_ref,  # (T, D) f32 flat RoPE tables
    p_ref,  # (D, D) bf16 RoPE half-swap matrix
    w_in_ref, b_in_ref,  # (C, D) bf16, (1, D) f32 — input_process
    w_in2_ref, b_in2_ref,  # (2D+A, D) bf16, (1, D) — input_process2
    w_out_ref, b_out_ref,  # (D, C) bf16, (1, C) — output_process
    # per-layer streamed block weights (leading L axis)
    ln1_s_ref, ln1_b_ref, wqkv_ref, wproj_ref, bproj_ref,
    ln2_s_ref, ln2_b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    # outputs / scratch
    x_ref,  # (K, T, C) f32 — the DDIM state, revisited across all grid steps
    act_ref,  # (K*T, D) f32 scratch — the block activation within one step
    *,
    num_heads: int,
    num_layers: int,
    tile_samples: int,
    attn_group: int = 1,
):
    si = pl.program_id(1)
    li = pl.program_id(2)

    @pl.when((si == 0) & (li == 0))
    def _():
        x_ref[...] = x_init_ref[...]

    d = act_ref.shape[-1]
    k, t, c = x_ref.shape
    s = k * t

    @pl.when(li == 0)
    def _():
        # denoise-step prologue: input projections + RoPE, all VMEM-resident
        x = x_ref[...].reshape(s, c)
        x_emb = _dot(x.astype(jnp.bfloat16), w_in_ref[...]) + b_in_ref[0]
        style = seed_ref[...] + temb_ref[...]  # (K, 1, D)
        # concat([style, x_emb, at]) @ w_in2 as three row-block matmuls;
        # the per-sample style row broadcasts over its T tokens
        style_p = _dot(style.reshape(k, d).astype(jnp.bfloat16), w_in2_ref[0:d])
        h = (
            jnp.broadcast_to(style_p[:, None, :], (k, t, d)).reshape(s, d)
            + _dot(x_emb.astype(jnp.bfloat16), w_in2_ref[d : 2 * d])
            + _dot(at_ref[...].reshape(s, -1).astype(jnp.bfloat16), w_in2_ref[2 * d :])
            + b_in2_ref[0]
        )
        # flat-layout RoPE; the (T, D) tables broadcast over the K samples
        hp = _dot(h.astype(jnp.bfloat16), p_ref[...])
        h = (
            cos_ref[...][None] * h.reshape(k, t, d)
            + sin_ref[...][None] * hp.reshape(k, t, d)
        )
        act_ref[...] = h.reshape(s, d)

    act_ref[...] = _block_math(
        act_ref[...],
        ln1_s_ref[0, 0], ln1_b_ref[0, 0],
        wqkv_ref[0],
        wproj_ref[0], bproj_ref[0, 0],
        ln2_s_ref[0, 0], ln2_b_ref[0, 0],
        wfc1_ref[0], bfc1_ref[0, 0],
        wfc2_ref[0], bfc2_ref[0, 0],
        num_heads=num_heads, tile_samples=tile_samples, attn_group=attn_group,
    )

    @pl.when(li == num_layers - 1)
    def _():
        # output projection + the η=0 DDIM update: x <- a*x + b*x0
        x0 = _dot(act_ref[...].astype(jnp.bfloat16), w_out_ref[...]) + b_out_ref[0]
        x_ref[...] = ca_ref[0, 0] * x_ref[...] + cb_ref[0, 0] * x0.reshape(k, t, c)


def make_fused_ddim_window(cfg, params, diffusion, *, tile_samples: int = 1,
                           attn_group: int = 1, interpret: bool = False,
                           mesh=None):
    """Whole-window DDIM sampler as ONE pallas_call: grid (B/K, NFE, L).

    The batch-1 latency path spends ~150 µs per NFE step in the XLA scan —
    the 8-block stack is only ~45 µs; the rest is the in/out projections,
    RoPE, the DDIM update and ~20 small-kernel dispatch boundaries around
    them. Fusing the ENTIRE 50-step loop keeps the DDIM state x (T, 1536)
    and the activation in VMEM for the whole window; per-layer weights
    restream each step under the pipeline's double buffering (12.5 MB bf16
    x NFE — ~0.8 ms of HBM traffic at 50 NFE, fully overlapped).

    ``tile_samples`` (K) is the serving-throughput knob, as in
    :func:`fused_block_stack`: K samples share a grid step so the
    token-parallel matmuls see K*T rows. Relative to the per-step serving
    path (:func:`make_fused_denoise` + host loop) this additionally moves
    the in/out projections, RoPE and the DDIM update in-kernel — the
    (B, T, 1536) state never round-trips HBM between steps (measured
    ~25 ms of the 140 ms 50-NFE loop at batch 256).

    Scope matches :func:`syntalker_tpu.generation.sample_windows_fused`:
    DDIM η=0, no CFG/prompt/style. Returns ``run(x_init, cond) -> x_final``
    where cond is the window's Conditioning; numerics match the XLA path to
    the kernel's bf16-weight tolerance (parity-tested).
    """
    from syntalker_tpu.models.denoiser import mdm_variables

    p = params["params"] if isinstance(params, dict) and "params" in params else params
    w = stack_block_weights(p["blocks"]["block"])

    def io_w(name):
        return jnp.asarray(p[name]["kernel"], jnp.bfloat16)

    def io_b(name):
        return jnp.asarray(p[name]["bias"], F32)[None, :]

    io = {
        "w_in": io_w("input_process"), "b_in": io_b("input_process"),
        "w_in2": io_w("input_process2"), "b_in2": io_b("input_process2"),
        "w_out": io_w("output_process"), "b_out": io_b("output_process"),
    }

    # DDIM coefficients over the respaced schedule, in ITERATION order
    # (it: 0..S-1 corresponds to step index i = S-1-it; core.ddim_sample):
    #   eps  = (r[i]*x - x0) / rm1[i]
    #   x'   = sqrt(abar_prev[i])*x0 + sqrt(1-abar_prev[i])*eps
    #        = a*x + b*x0 with a = sqrt(1-abar_prev)*r/rm1,
    #                          b = sqrt(abar_prev) - sqrt(1-abar_prev)/rm1
    idx = np.arange(diffusion.num_steps - 1, -1, -1)
    abar_prev = np.asarray(diffusion.alphas_cumprod_prev, np.float64)[idx]
    r = np.asarray(diffusion.sqrt_recip_alphas_cumprod, np.float64)[idx]
    rm1 = np.asarray(diffusion.sqrt_recipm1_alphas_cumprod, np.float64)[idx]
    s1m = np.sqrt(np.maximum(1.0 - abar_prev, 0.0))
    coef_a = jnp.asarray(s1m * r / rm1, F32)[:, None, None]
    coef_b = jnp.asarray(np.sqrt(abar_prev) - s1m / rm1, F32)[:, None, None]

    # per-step timestep embeddings, iteration order (S, 1, D)
    from syntalker_tpu.models.denoiser import MDM

    mdm = MDM(cfg)
    t_emb_all = mdm.apply(
        mdm_variables(params), jnp.asarray(diffusion.timestep_map),
        method="embed_timesteps",
    )
    t_embs = t_emb_all[::-1][:, None, :]

    # weights/tables as ARGUMENTS (closure capture inlines them as HLO
    # constants and stalls the remote compiler — see make_fused_denoise)
    @functools.partial(
        jax.jit,
        static_argnames=(
            "num_heads", "rope_heads", "num_layers", "tile_samples",
            "attn_group", "interpret"
        ),
    )
    def _impl(io, w, t_embs, coef_a, coef_b, x_init, seed_emb, at_feat, *,
              num_heads, rope_heads, num_layers, tile_samples, attn_group,
              interpret):
        b, t, c = x_init.shape
        d = io["w_in"].shape[-1]
        a_dim = io["w_in2"].shape[0] - 2 * d
        s = t_embs.shape[0]
        cos_f, sin_f, perm = rope_flat_tables(t, d, rope_heads)
        at = at_feat[:, :t, :a_dim].astype(F32)
        seed = seed_emb[:, None, :].astype(F32)
        if b % tile_samples:
            raise ValueError(
                f"batch {b} not divisible by tile_samples={tile_samples}"
            )
        k = tile_samples

        def const(shape):
            return pl.BlockSpec(
                shape, lambda bi, si, li: (0,) * len(shape),
                memory_space=pltpu.VMEM,
            )

        def per_b(shape):
            # one K-sample tile per outer grid step
            return pl.BlockSpec(
                (k,) + shape, lambda bi, si, li: (bi,) + (0,) * len(shape),
                memory_space=pltpu.VMEM,
            )

        def per_s(shape):
            return pl.BlockSpec(
                (1,) + shape, lambda bi, si, li: (si,) + (0,) * len(shape),
                memory_space=pltpu.VMEM,
            )

        def per_l(shape):
            return pl.BlockSpec(
                (1,) + shape, lambda bi, si, li: (li,) + (0,) * len(shape),
                memory_space=pltpu.VMEM,
            )

        f = w["wfc1"].shape[-1]
        return pl.pallas_call(
            functools.partial(
                _ddim_window_kernel, num_heads=num_heads,
                num_layers=num_layers, tile_samples=k, attn_group=attn_group,
            ),
            grid=(b // k, s, num_layers),
            in_specs=[
                per_b((t, c)),  # x_init
                per_s((1, d)),  # t_emb
                per_s((1, 1)), per_s((1, 1)),  # coef_a, coef_b
                per_b((1, d)),  # seed_emb
                per_b((t, a_dim)),  # at_feat
                const((t, d)), const((t, d)),  # cos, sin
                const((d, d)),  # P
                const((c, d)), const((1, d)),  # input_process
                const((2 * d + a_dim, d)), const((1, d)),  # input_process2
                const((d, c)), const((1, c)),  # output_process
                per_l((1, d)), per_l((1, d)),  # ln1
                per_l((d, 3 * d)),  # wqkv
                per_l((d, d)), per_l((1, d)),  # proj
                per_l((1, d)), per_l((1, d)),  # ln2
                per_l((d, f)), per_l((1, f)),  # fc1
                per_l((f, d)), per_l((1, d)),  # fc2
            ],
            out_specs=pl.BlockSpec(
                (k, t, c), lambda bi, si, li: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, t, c), F32),
            scratch_shapes=[pltpu.VMEM((k * t, d), F32)],
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )(
            x_init.astype(F32), t_embs, coef_a, coef_b, seed, at,
            cos_f, sin_f, perm,
            io["w_in"], io["b_in"], io["w_in2"], io["b_in2"],
            io["w_out"], io["b_out"],
            w["ln1_s"], w["ln1_b"], w["wqkv"], w["wproj"], w["bproj"],
            w["ln2_s"], w["ln2_b"], w["wfc1"], w["bfc1"], w["wfc2"], w["bfc2"],
        )

    kw = dict(
        num_heads=cfg.num_heads, rope_heads=cfg.rope_heads,
        num_layers=cfg.num_layers, tile_samples=tile_samples,
        attn_group=attn_group, interpret=interpret,
    )

    if mesh is not None:
        # Data-parallel composition (VERDICT r3 #3): a pallas_call is a
        # per-device program, so the idiomatic multi-chip form is shard_map
        # over the mesh's 'data' axis — each device runs the SAME fused
        # kernel on its batch shard (per-sample independence ⇒ zero
        # collectives; numerics identical to the single-chip kernel on the
        # same samples). Weights/tables are replicated; the per-device
        # batch must still divide tile_samples.
        from jax.sharding import PartitionSpec as PS

        if "data" not in mesh.shape:
            raise ValueError(f"mesh needs a 'data' axis, got {mesh.shape}")
        bspec = PS("data")
        rep = PS()

        def _local(io, w, t_embs, coef_a, coef_b, x_init, seed_emb, at_feat):
            return _impl(io, w, t_embs, coef_a, coef_b, x_init, seed_emb,
                         at_feat, **kw)

        sharded = jax.jit(jax.shard_map(
            _local, mesh=mesh,
            in_specs=(rep, rep, rep, rep, rep, bspec, bspec, bspec),
            out_specs=bspec, check_vma=False,
        ))

        def run(x_init, cond):
            n_data = mesh.shape["data"]
            if x_init.shape[0] % (n_data * tile_samples):
                raise ValueError(
                    f"batch {x_init.shape[0]} must divide data axis "
                    f"{n_data} x tile_samples {tile_samples}"
                )
            return sharded(io, w, t_embs, coef_a, coef_b, x_init,
                           cond.seed_emb, cond.at_feat)

        return run

    def run(x_init, cond):
        return _impl(
            io, w, t_embs, coef_a, coef_b, x_init, cond.seed_emb, cond.at_feat,
            **kw,
        )

    return run


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "tile_samples", "attn_group", "interpret"),
)
def fused_block_stack(
    x: jax.Array,  # (B, T, D) f32
    w: Dict[str, jax.Array],  # stacked (L, ...) weights from stack_block_weights
    *,
    num_heads: int = 4,
    tile_samples: int = 1,
    attn_group: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """tile_samples=1: latency path (one sample's activation per grid step).
    tile_samples=k: serving path — k samples share a grid step so the
    token-parallel matmuls see k*T rows (k=8, T=32 -> 256 = 2 full MXU row
    tiles); requires B % k == 0."""
    b, t, d = x.shape
    l = w["wqkv"].shape[0]
    f = w["wfc1"].shape[-1]
    if b % tile_samples:
        raise ValueError(f"batch {b} not divisible by tile_samples={tile_samples}")
    n_tiles = b // tile_samples
    s = tile_samples * t
    xt = x.astype(F32).reshape(n_tiles, s, d)

    def wspec(shape):
        # per-layer weight block, indexed by the layer grid axis
        return pl.BlockSpec(
            (1,) + shape, lambda bi, li: (li,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        functools.partial(
            _block_kernel, num_heads=num_heads, tile_samples=tile_samples,
            attn_group=attn_group,
        ),
        grid=(n_tiles, l),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda bi, li: (bi, 0, 0), memory_space=pltpu.VMEM),
            wspec((1, d)), wspec((1, d)),
            wspec((d, 3 * d)),
            wspec((d, d)), wspec((1, d)),
            wspec((1, d)), wspec((1, d)),
            wspec((d, f)), wspec((1, f)),
            wspec((f, d)), wspec((1, d)),
        ],
        out_specs=pl.BlockSpec(
            (1, s, d), lambda bi, li: (bi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, s, d), F32),
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(
        xt,
        w["ln1_s"], w["ln1_b"], w["wqkv"], w["wproj"], w["bproj"],
        w["ln2_s"], w["ln2_b"], w["wfc1"], w["bfc1"], w["wfc2"], w["bfc2"],
    )
    return out.reshape(b, t, d)
