"""Functional DDPM/DDIM core: q-process, losses, and scan-based samplers.

Capability parity with ``diffusion/gaussian_diffusion.py`` (q_sample :235,
posterior :255, p_sample :505, p_sample_loop :607, ddim_sample :741/:888,
training_losses :1236) restructured TPU-first:

- every sampler is **one ``lax.scan`` over timesteps** — the whole denoise
  chain compiles to a single XLA while-loop instead of 1000 Python-driven
  dispatches,
- the model callback signature is ``model_fn(x_t, t) -> pred_x0`` where t is
  already mapped to *original* timestep indices (the respacing wrapper class
  collapses to an array gather),
- prediction target is x0 (the reference's only shipped mode); variance is
  FIXED_SMALL (posterior variance).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from syntalker_tpu.diffusion.schedule import DiffusionParams

ModelFn = Callable[[jax.Array, jax.Array], jax.Array]  # (x_t, t_orig) -> x0_pred


# ---------------------------------------------------------------------------
# forward (q) process
# ---------------------------------------------------------------------------


def q_sample(
    params: DiffusionParams, x_start: jax.Array, t: jax.Array, noise: jax.Array
) -> jax.Array:
    """Sample q(x_t | x_0) at sampled-index timesteps t (B,)."""
    return (
        params.gather("sqrt_alphas_cumprod", t) * x_start
        + params.gather("sqrt_one_minus_alphas_cumprod", t) * noise
    )


def q_posterior_mean(
    params: DiffusionParams, x_start: jax.Array, x_t: jax.Array, t: jax.Array
) -> jax.Array:
    return (
        params.gather("posterior_mean_coef1", t) * x_start
        + params.gather("posterior_mean_coef2", t) * x_t
    )


def predict_eps_from_xstart(
    params: DiffusionParams, x_t: jax.Array, t: jax.Array, x0: jax.Array
) -> jax.Array:
    return (
        params.gather("sqrt_recip_alphas_cumprod", t) * x_t - x0
    ) / params.gather("sqrt_recipm1_alphas_cumprod", t)


# ---------------------------------------------------------------------------
# training loss
# ---------------------------------------------------------------------------


def smooth_l1(a: jax.Array, b: jax.Array, beta: float = 1.0) -> jax.Array:
    """Elementwise Huber/SmoothL1 (torch semantics, beta=1)."""
    d = jnp.abs(a - b)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def training_loss(
    params: DiffusionParams,
    model_fn: ModelFn,
    x_start: jax.Array,  # (B, T, C)
    t: jax.Array,  # (B,) sampled-index timesteps
    noise: jax.Array,
    mask: Optional[jax.Array] = None,  # (B, T) or None = all valid
) -> jax.Array:
    """Per-sample x0-prediction loss (gaussian_diffusion.py:1236-1316 with
    masked_l2 = SmoothL1 normalized by valid element count, :202-215)."""
    x_t = q_sample(params, x_start, t, noise)
    t_orig = jnp.asarray(params.timestep_map)[t]
    pred_x0 = model_fn(x_t, t_orig)
    loss = smooth_l1(pred_x0, x_start)
    if mask is None:
        return jnp.mean(loss, axis=(1, 2))
    # masked_l2 normalizer = (#valid frames) × (feature dim)
    m = mask[..., None].astype(loss.dtype)
    valid = jnp.maximum(jnp.sum(mask.astype(loss.dtype), axis=1), 1.0)
    return jnp.sum(loss * m, axis=(1, 2)) / (valid * x_start.shape[-1])


# ---------------------------------------------------------------------------
# samplers (single lax.scan over timesteps)
# ---------------------------------------------------------------------------
#
# `rng` may be a single PRNG key or a batch of per-row keys (B, 2): with
# per-row keys every batch row consumes exactly the stream a batch-1 run
# with that key would, so batched evaluation reproduces sequential
# evaluation bitwise (protocol equivalence for the eval harness).


def _rng_split(rng):
    if rng.ndim == 2:
        out = jax.vmap(lambda k: jax.random.split(k))(rng)  # (B, 2, 2)
        return out[:, 0], out[:, 1]
    return jax.random.split(rng)


def _rng_fold(rng, i):
    if rng.ndim == 2:
        return jax.vmap(lambda k: jax.random.fold_in(k, i))(rng)
    return jax.random.fold_in(rng, i)


def _rng_normal(rng, shape):
    if rng.ndim == 2:
        # per-row draw: identical values to a (1, ...) draw from the same key
        return jax.vmap(lambda k: jax.random.normal(k, shape[1:]))(rng)
    return jax.random.normal(rng, shape)


def ddpm_sample(
    params: DiffusionParams,
    model_fn: ModelFn,
    shape: tuple,
    rng: jax.Array,
    *,
    clip_denoised: bool = False,
    init_noise: Optional[jax.Array] = None,
) -> jax.Array:
    """Ancestral sampling with FIXED_SMALL variance
    (p_sample_loop, gaussian_diffusion.py:505-671)."""
    rng, k0 = _rng_split(rng)
    x = init_noise if init_noise is not None else _rng_normal(k0, shape)
    b = shape[0]
    tmap = jnp.asarray(params.timestep_map)

    def step(x, it):
        i = params.num_steps - 1 - it  # iterate t = S-1 .. 0
        t = jnp.full((b,), i, jnp.int32)
        pred_x0 = model_fn(x, tmap[t])
        if clip_denoised:
            pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
        mean = q_posterior_mean(params, pred_x0, x, t)
        logvar = params.gather("posterior_log_variance_clipped", t)
        noise = _rng_normal(_rng_fold(rng, it), x.shape)
        nonzero = (i > 0).astype(x.dtype)
        x = mean + nonzero * jnp.exp(0.5 * logvar) * noise
        return x, None

    x, _ = jax.lax.scan(step, x, jnp.arange(params.num_steps))
    return x


def ddim_sample(
    params: DiffusionParams,
    model_fn: ModelFn,
    shape: tuple,
    rng: jax.Array,
    *,
    eta: float = 0.0,
    clip_denoised: bool = False,
    init_noise: Optional[jax.Array] = None,
) -> jax.Array:
    """DDIM sampling (gaussian_diffusion.py:741-948), η=0 deterministic by
    default, over the respaced steps in `params`."""
    rng, k0 = _rng_split(rng)
    x = init_noise if init_noise is not None else _rng_normal(k0, shape)
    b = shape[0]
    tmap = jnp.asarray(params.timestep_map)

    def step(x, it):
        i = params.num_steps - 1 - it
        t = jnp.full((b,), i, jnp.int32)
        pred_x0 = model_fn(x, tmap[t])
        if clip_denoised:
            pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
        eps = predict_eps_from_xstart(params, x, t, pred_x0)
        abar = params.gather("alphas_cumprod", t)
        abar_prev = params.gather("alphas_cumprod_prev", t)
        sigma = (
            eta
            * jnp.sqrt((1 - abar_prev) / (1 - abar))
            * jnp.sqrt(1 - abar / abar_prev)
        )
        mean = (
            jnp.sqrt(abar_prev) * pred_x0
            + jnp.sqrt(jnp.maximum(1 - abar_prev - sigma**2, 0.0)) * eps
        )
        noise = _rng_normal(_rng_fold(rng, it), x.shape)
        nonzero = (i > 0).astype(x.dtype)
        x = mean + nonzero * sigma * noise
        return x, None

    x, _ = jax.lax.scan(step, x, jnp.arange(params.num_steps))
    return x


def sample(
    params: DiffusionParams,
    model_fn: ModelFn,
    shape: tuple,
    rng: jax.Array,
    *,
    method: str = "ddpm",
    **kw,
) -> jax.Array:
    if method == "ddpm":
        return ddpm_sample(params, model_fn, shape, rng, **kw)
    if method == "ddim":
        return ddim_sample(params, model_fn, shape, rng, **kw)
    raise ValueError(f"unknown sampler: {method}")
