"""Functional residual vector quantization with EMA-reset codebooks.

Capability parity with the reference's ``models/vq/residual_vq.py`` +
``models/vq/quantizer.py`` (SoundStream-style residual VQ, Algorithm 1 of
arXiv:2107.03312), re-designed for TPU/XLA:

- The codebook is **explicit functional state** (:class:`RVQState`), not a
  mutated buffer. A train step returns the next state; under ``pjit`` the
  one-hot count/sum reductions are global across the data-parallel batch, so
  codebooks never fork between replicas (the reference relied on each GPU
  mutating its own copy — a latent divergence bug we fix by construction).
- Lazy data-dependent codebook init (quantizer.py:60-65) becomes a
  ``jnp.where`` on an ``initialized`` flag — jittable, no Python branching.
- Quantizer dropout (residual_vq.py:112-126) draws the dropped suffix from a
  threaded PRNG key and applies a static-shape layer mask instead of Python
  ``continue``.
- Gumbel sampling at the configured temperature (quantizer.py:18-33) uses
  ``jax.random`` keys.
- The assignment hot path (‖x‖² − 2xCᵀ + ‖c‖² + argmin) is a plain matmul
  chain that XLA tiles onto the MXU; a fused Pallas kernel for the 6-layer
  inference encode lives in :mod:`syntalker_tpu.ops.quantize_pallas`.

All functions take ``(B, T, D)`` feature-last layout (TPU-native), not the
reference's ``(B, C, T)``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@dataclasses.dataclass(frozen=True)
class RVQConfig:
    """Static quantizer hyperparameters (diffusion_rvqvae_trainer.py:89-103)."""

    num_quantizers: int = 6
    nb_code: int = 512
    code_dim: int = 512
    mu: float = 0.99  # EMA decay
    quantize_dropout_prob: float = 0.2
    quantize_dropout_cutoff: int = 0
    gumbel_temperature: float = 0.5
    shared_codebook: bool = False


class RVQState(struct.PyTreeNode):
    """EMA codebook state for all quantizer layers, stacked on axis 0."""

    codebook: jax.Array  # (Q, K, D) float32
    code_sum: jax.Array  # (Q, K, D) float32
    code_count: jax.Array  # (Q, K) float32
    initialized: jax.Array  # () bool


class RVQOutput(struct.PyTreeNode):
    quantized: jax.Array  # (B, T, D) straight-through output
    indices: jax.Array  # (B, T, Q) int32, -1 for dropped layers
    commit_loss: jax.Array  # () mean over active layers
    perplexity: jax.Array  # () mean over active layers
    state: RVQState


def init_rvq_state(cfg: RVQConfig) -> RVQState:
    q = 1 if cfg.shared_codebook else cfg.num_quantizers
    return RVQState(
        codebook=jnp.zeros((q, cfg.nb_code, cfg.code_dim), jnp.float32),
        code_sum=jnp.zeros((q, cfg.nb_code, cfg.code_dim), jnp.float32),
        code_count=jnp.zeros((q, cfg.nb_code), jnp.float32),
        initialized=jnp.asarray(False),
    )


def _tile_to_codebook(x: jax.Array, nb_code: int, rng: jax.Array) -> jax.Array:
    """First `nb_code` rows of the batch, repeated + jittered if too few.

    Mirrors QuantizeEMAReset._tile (quantizer.py:49-58).
    """
    n, d = x.shape
    if n >= nb_code:
        return x[:nb_code]
    reps = -(-nb_code // n)
    out = jnp.tile(x, (reps, 1))[:nb_code]
    std = 0.01 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    return out + jax.random.normal(rng, out.shape, out.dtype) * std


def code_distances(x: jax.Array, codebook: jax.Array) -> jax.Array:
    """Squared L2 distances (N, K) between rows of x (N, D) and codes (K, D).

    The −2xCᵀ term is the MXU matmul; ‖x‖² is constant per row but kept for
    exactness with the reference (quantizer.py:67-75).
    """
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    c2 = jnp.sum(codebook * codebook, axis=-1)
    # full-precision matmul: bf16 distance ties would flip argmin results
    # between this path and the fused Pallas kernel
    cross = jax.lax.dot(
        x, codebook.T, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return x2 - 2.0 * cross + c2[None, :]


def _assign(
    x: jax.Array,
    codebook: jax.Array,
    *,
    temperature: float,
    stochastic: bool,
    rng: Optional[jax.Array],
) -> jax.Array:
    """Nearest-code assignment, optionally Gumbel-perturbed (train only)."""
    logits = -code_distances(x, codebook)
    if stochastic and temperature > 0 and rng is not None:
        u = jax.random.uniform(rng, logits.shape, minval=1e-20, maxval=1.0)
        gumbel = -jnp.log(-jnp.log(u))
        logits = logits / temperature + gumbel
    return jnp.argmax(logits, axis=-1)


def _perplexity(code_count: jax.Array) -> jax.Array:
    prob = code_count / jnp.maximum(jnp.sum(code_count), 1e-7)
    return jnp.exp(-jnp.sum(prob * jnp.log(prob + 1e-7)))


def _layer_cb(state: RVQState, cfg: RVQConfig, q: int) -> int:
    """Codebook slot for layer q (shared codebooks collapse to slot 0)."""
    return 0 if cfg.shared_codebook else q


def rvq_forward(
    x: jax.Array,
    state: RVQState,
    cfg: RVQConfig,
    *,
    train: bool,
    rng: Optional[jax.Array] = None,
    force_dropout_index: int = -1,
) -> RVQOutput:
    """Full residual-VQ forward (train or eval).

    x: (B, T, D). Returns straight-through quantized output, per-layer code
    indices (-1 where a layer was dropped), mean commit loss / perplexity
    over active layers, and the next codebook state.

    Equivalent to ResidualVQ.forward (residual_vq.py:99-168) with the EMA /
    reset / lazy-init state transitions of QuantizeEMAReset made functional.
    """
    b, t, d = x.shape
    nq = cfg.num_quantizers
    flat = x.reshape(b * t, d)
    n = b * t

    if rng is None:
        rng = jax.random.PRNGKey(0)
    rng_drop, rng_init, rng_reset, rng_gumbel = jax.random.split(rng, 4)

    # --- quantizer dropout: drop a random suffix of layers (train only) ---
    if train and cfg.quantize_dropout_prob > 0:
        do_drop = jax.random.bernoulli(rng_drop, cfg.quantize_dropout_prob)
        start_drop = jax.random.randint(
            jax.random.fold_in(rng_drop, 1), (), cfg.quantize_dropout_cutoff, nq
        )
        # active layers: index <= start_drop when dropping, else all
        last_active = jnp.where(do_drop, start_drop, nq - 1)
    else:
        last_active = jnp.asarray(nq - 1)
    if force_dropout_index >= 0:
        last_active = jnp.asarray(force_dropout_index)
    layer_ids = jnp.arange(nq)
    active = layer_ids <= last_active  # (Q,) bool
    num_active = jnp.sum(active.astype(jnp.float32))

    residual = flat
    quantized_out = jnp.zeros_like(flat)
    indices = []
    commit_losses = []
    perplexities = []
    new_codebooks = []
    new_sums = []
    new_counts = []

    nslots = state.codebook.shape[0]
    consumed = [False] * nslots

    for q in range(nq):
        slot = _layer_cb(state, cfg, q)
        layer_rng = jax.random.fold_in(rng_gumbel, q)

        # Lazy init from this layer's input on the first training batch.
        if train:
            init_rows = _tile_to_codebook(
                jax.lax.stop_gradient(residual), cfg.nb_code, jax.random.fold_in(rng_init, q)
            )
            codebook = jnp.where(state.initialized, state.codebook[slot], init_rows)
            code_sum = jnp.where(state.initialized, state.code_sum[slot], init_rows)
            code_count = jnp.where(
                state.initialized, state.code_count[slot], jnp.ones((cfg.nb_code,))
            )
        else:
            codebook = state.codebook[slot]
            code_sum = state.code_sum[slot]
            code_count = state.code_count[slot]

        idx = _assign(
            jax.lax.stop_gradient(residual),
            codebook,
            temperature=cfg.gumbel_temperature,
            stochastic=train,
            rng=layer_rng,
        )
        x_d = codebook[idx]  # (N, D)

        if train:
            # EMA + dead-code reset (quantizer.py:100-123), masked by `active`
            # so dropped layers keep their previous statistics.
            sg_res = jax.lax.stop_gradient(residual)
            onehot = jax.nn.one_hot(idx, cfg.nb_code, dtype=jnp.float32)  # (N, K)
            batch_sum = onehot.T @ sg_res  # (K, D) — MXU
            batch_count = jnp.sum(onehot, axis=0)  # (K,)
            ema_sum = cfg.mu * code_sum + (1.0 - cfg.mu) * batch_sum
            ema_count = cfg.mu * code_count + (1.0 - cfg.mu) * batch_count
            usage = (ema_count >= 1.0).astype(jnp.float32)[:, None]
            code_update = ema_sum / jnp.maximum(ema_count[:, None], 1e-12)
            code_rand = _tile_to_codebook(
                sg_res, cfg.nb_code, jax.random.fold_in(rng_reset, q)
            )
            upd_codebook = usage * code_update + (1.0 - usage) * code_rand
            is_active = active[q]
            new_codebooks.append(jnp.where(is_active, upd_codebook, codebook))
            new_sums.append(jnp.where(is_active, ema_sum, code_sum))
            new_counts.append(jnp.where(is_active, ema_count, code_count))
            perplexities.append(_perplexity(batch_count))
        else:
            onehot = jax.nn.one_hot(idx, cfg.nb_code, dtype=jnp.float32)
            perplexities.append(_perplexity(jnp.sum(onehot, axis=0)))
            new_codebooks.append(codebook)
            new_sums.append(code_sum)
            new_counts.append(code_count)

        commit_losses.append(
            jnp.mean((residual - jax.lax.stop_gradient(x_d)) ** 2)
        )

        # Straight-through + residual update (residual_vq.py:144-148), masked
        # so dropped layers are no-ops with static shapes.
        st = residual + jax.lax.stop_gradient(x_d - residual)
        gate = active[q].astype(flat.dtype)
        quantized_out = quantized_out + gate * st
        residual = residual - gate * jax.lax.stop_gradient(x_d)
        indices.append(jnp.where(active[q], idx, -1))
        consumed[slot] = True

    if cfg.shared_codebook:
        # last active layer's update wins for the shared slot
        new_state_cb = new_codebooks[-1][None]
        new_state_sum = new_sums[-1][None]
        new_state_count = new_counts[-1][None]
    else:
        new_state_cb = jnp.stack(new_codebooks)
        new_state_sum = jnp.stack(new_sums)
        new_state_count = jnp.stack(new_counts)

    active_f = active.astype(jnp.float32)
    commit = jnp.sum(jnp.stack(commit_losses) * active_f) / jnp.maximum(num_active, 1.0)
    perp = jnp.sum(jnp.stack(perplexities) * active_f) / jnp.maximum(num_active, 1.0)

    new_state = RVQState(
        codebook=new_state_cb,
        code_sum=new_state_sum,
        code_count=new_state_count,
        initialized=jnp.asarray(True) if train else state.initialized,
    )

    return RVQOutput(
        quantized=quantized_out.reshape(b, t, d),
        indices=jnp.stack(indices, axis=-1).reshape(b, t, nq),
        commit_loss=commit,
        perplexity=perp,
        state=new_state,
    )


def rvq_encode(x: jax.Array, state: RVQState, cfg: RVQConfig) -> jax.Array:
    """Eval-mode encode to token indices (B, T, Q). Pure argmin, no state.

    Equivalent to ResidualVQ.quantize (residual_vq.py:171-193).
    """
    b, t, d = x.shape
    residual = x.reshape(b * t, d)
    out = []
    for q in range(cfg.num_quantizers):
        codebook = state.codebook[_layer_cb(state, cfg, q)]
        idx = _assign(residual, codebook, temperature=0.0, stochastic=False, rng=None)
        residual = residual - codebook[idx]
        out.append(idx)
    return jnp.stack(out, axis=-1).reshape(b, t, cfg.num_quantizers)


def rvq_dequantize(indices: jax.Array, state: RVQState, cfg: RVQConfig) -> jax.Array:
    """Indices (B, T, Q) -> summed codes (B, T, D); -1 indices contribute 0.

    Equivalent to ResidualVQ.get_codes_from_indices + sum
    (residual_vq.py:64-97).
    """
    b, t, nq = indices.shape
    out = jnp.zeros((b, t, cfg.code_dim), jnp.float32)
    for q in range(nq):
        codebook = state.codebook[_layer_cb(state, cfg, q)]
        idx = indices[..., q]
        mask = (idx >= 0)[..., None]
        code = codebook[jnp.maximum(idx, 0)]
        out = out + jnp.where(mask, code, 0.0)
    return out


def rvq_quantize_eval(
    x: jax.Array, state: RVQState, cfg: RVQConfig
) -> Tuple[jax.Array, jax.Array]:
    """Eval-mode quantize returning (quantized (B,T,D), indices (B,T,Q)).

    This is the `latent2origin` quantization path
    (diffusion_rvqvae_trainer.py:480-482 → models/vq/model.py:102-109): the
    denoiser's continuous latent is snapped onto the residual codebooks
    before decoding.
    """
    idx = rvq_encode(x, state, cfg)
    return rvq_dequantize(idx, state, cfg), idx
