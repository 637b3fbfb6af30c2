"""Secondary diffusion machinery for full reference parity.

Covers the parts of ``diffusion/`` outside the shipped hot path:

- PLMS sampler (gaussian_diffusion.py:1004-1200),
- inpainting q/p overwrite (inpainting_gaussian_diffusion.py:5-53),
- VLB terms: normal KL + discretized Gaussian log-likelihood
  (diffusion/losses.py:12-77) and the bpd accounting
  (gaussian_diffusion.py:1201-1234, 1530-1604),
- timestep schedule samplers: uniform + loss-second-moment importance
  sampling (diffusion/resample.py:61-155),
- parameter EMA (diffusion/nn.py:56).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from syntalker_tpu.diffusion.core import (
    ModelFn,
    predict_eps_from_xstart,
    q_posterior_mean,
)
from syntalker_tpu.diffusion.schedule import DiffusionParams


# ---------------------------------------------------------------------------
# PLMS (pseudo linear multi-step)
# ---------------------------------------------------------------------------


def plms_sample(
    params: DiffusionParams,
    model_fn: ModelFn,
    shape: tuple,
    rng: jax.Array,
    *,
    clip_denoised: bool = False,
    init_noise: Optional[jax.Array] = None,
) -> jax.Array:
    """PLMS sampling with the standard 4-step Adams-Bashforth eps history
    (prk warm-up replaced by lower-order multistep starts, as in common
    PLMS implementations)."""
    rng, k0 = jax.random.split(rng)
    x = init_noise if init_noise is not None else jax.random.normal(k0, shape)
    b = shape[0]
    tmap = jnp.asarray(params.timestep_map)

    def eps_at(x, i):
        t = jnp.full((b,), i, jnp.int32)
        pred_x0 = model_fn(x, tmap[t])
        if clip_denoised:
            pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
        return predict_eps_from_xstart(params, x, t, pred_x0), t

    def transfer(x, eps, t):
        abar = params.gather("alphas_cumprod", t)
        abar_prev = params.gather("alphas_cumprod_prev", t)
        pred_x0 = (x - jnp.sqrt(1 - abar) * eps) / jnp.sqrt(abar)
        return jnp.sqrt(abar_prev) * pred_x0 + jnp.sqrt(1 - abar_prev) * eps

    eps_hist = jnp.zeros((4,) + shape)

    def step(carry, it):
        x, hist, n_hist = carry
        i = params.num_steps - 1 - it
        eps, t = eps_at(x, i)
        # multistep combination depending on history length
        e1 = hist[0]
        e2 = hist[1]
        e3 = hist[2]
        eps_prime = jnp.where(
            n_hist == 0,
            eps,
            jnp.where(
                n_hist == 1,
                (3 * eps - e1) / 2,
                jnp.where(
                    n_hist == 2,
                    (23 * eps - 16 * e1 + 5 * e2) / 12,
                    (55 * eps - 59 * e1 + 37 * e2 - 9 * e3) / 24,
                ),
            ),
        )
        x = transfer(x, eps_prime, t)
        hist = jnp.concatenate([eps[None], hist[:-1]], axis=0)
        return (x, hist, jnp.minimum(n_hist + 1, 3)), None

    (x, _, _), _ = jax.lax.scan(
        step, (x, eps_hist, jnp.asarray(0)), jnp.arange(params.num_steps)
    )
    return x


# ---------------------------------------------------------------------------
# inpainting
# ---------------------------------------------------------------------------


def inpainting_model_fn(
    params: DiffusionParams,
    model_fn: ModelFn,
    inpainted_motion: jax.Array,
    inpainting_mask: jax.Array,
) -> ModelFn:
    """Overwrite the known region of the x0 prediction each step
    (inpainting_gaussian_diffusion.py:5-53; START_X-prediction only)."""

    def fn(x_t, t_orig):
        out = model_fn(x_t, t_orig)
        return jnp.where(inpainting_mask, inpainted_motion, out)

    return fn


# ---------------------------------------------------------------------------
# VLB terms
# ---------------------------------------------------------------------------


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N1 || N2), elementwise (losses.py:12-32)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, means, log_scales):
    """Log-likelihood of an 8-bit-discretized Gaussian (losses.py:50-77)."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.maximum(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.maximum(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.maximum(cdf_delta, 1e-12))
        ),
    )


def vb_terms_bpd(
    params: DiffusionParams,
    model_fn: ModelFn,
    x_start: jax.Array,
    x_t: jax.Array,
    t: jax.Array,
) -> jax.Array:
    """Per-sample variational bound term at t, in bits per dim
    (gaussian_diffusion.py:1201-1234) for the FIXED_SMALL x0-pred model."""
    true_mean = q_posterior_mean(params, x_start, x_t, t)
    true_logvar = params.gather("posterior_log_variance_clipped", t)
    t_orig = jnp.asarray(params.timestep_map)[t]
    pred_x0 = model_fn(x_t, t_orig)
    model_mean = q_posterior_mean(params, pred_x0, x_t, t)
    kl = normal_kl(true_mean, true_logvar, model_mean, true_logvar)
    kl = jnp.mean(kl.reshape(kl.shape[0], -1), axis=1) / jnp.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, model_mean, 0.5 * true_logvar
    )
    decoder_nll = jnp.mean(
        decoder_nll.reshape(decoder_nll.shape[0], -1), axis=1
    ) / jnp.log(2.0)
    return jnp.where(t == 0, decoder_nll, kl)


# ---------------------------------------------------------------------------
# schedule samplers (resample.py)
# ---------------------------------------------------------------------------


class UniformSampler:
    def __init__(self, num_steps: int):
        self.num_steps = num_steps

    def sample(self, rng: jax.Array, batch: int):
        t = jax.random.randint(rng, (batch,), 0, self.num_steps)
        return t, jnp.ones((batch,))


class LossSecondMomentResampler:
    """Importance-sample timesteps by the second moment of recent losses
    (resample.py:124-155). History is functional numpy state on the host
    (it gates the *next* batch's t-draws, not the jitted step)."""

    def __init__(self, num_steps: int, history_per_term: int = 10, uniform_prob: float = 0.001):
        self.num_steps = num_steps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._history = np.zeros((num_steps, history_per_term), np.float64)
        self._counts = np.zeros(num_steps, np.int64)

    def weights(self) -> np.ndarray:
        if not (self._counts == self.history_per_term).all():
            return np.ones(self.num_steps)
        w = np.sqrt(np.mean(self._history**2, axis=-1))
        w = w / w.sum()
        return w * (1 - self.uniform_prob) + self.uniform_prob / self.num_steps

    def sample(self, rng: jax.Array, batch: int):
        w = self.weights()
        p = w / w.sum()
        idx = jax.random.choice(
            rng, self.num_steps, (batch,), p=jnp.asarray(p, jnp.float32)
        )
        weights = 1.0 / (self.num_steps * jnp.asarray(p, jnp.float32)[idx])
        return idx, weights

    def update(self, ts: np.ndarray, losses: np.ndarray):
        for t, loss in zip(np.asarray(ts), np.asarray(losses)):
            if self._counts[t] == self.history_per_term:
                self._history[t, :-1] = self._history[t, 1:]
                self._history[t, -1] = loss
            else:
                self._history[t, self._counts[t]] = loss
                self._counts[t] += 1


# ---------------------------------------------------------------------------
# parameter EMA (diffusion/nn.py:56)
# ---------------------------------------------------------------------------


def update_ema(ema_params, params, rate: float = 0.9999):
    return jax.tree.map(lambda e, p: e * rate + p * (1 - rate), ema_params, params)
