"""Diffusion noise schedules and timestep respacing as precomputed arrays.

Capability parity with the reference's guided-diffusion machinery
(``diffusion/gaussian_diffusion.py:20-65`` beta schedules,
``diffusion/respace.py`` SpacedDiffusion, ``diffusion/model_util.py``
factory), reduced to what a functional JAX sampler needs: every schedule
quantity is a static numpy/JAX array baked into the jitted computation, and
respacing is performed once at construction (no wrapper classes remapping
timesteps per call).

The shipped configuration (model_util.py:8-51): cosine schedule, 1000 steps,
predict-x0, FIXED_SMALL variance, MSE(smooth-L1) loss; DDIM path = 'ddim50'.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import numpy as np
import jax.numpy as jnp


def linear_betas(num_steps: int, scale_beta: float = 1.0) -> np.ndarray:
    scale = scale_beta * 1000.0 / num_steps
    return np.linspace(scale * 1e-4, scale * 0.02, num_steps, dtype=np.float64)


def cosine_betas(num_steps: int, max_beta: float = 0.999) -> np.ndarray:
    """betas_for_alpha_bar with the squared-cosine schedule
    (gaussian_diffusion.py:47-65)."""

    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = []
    for i in range(num_steps):
        t1 = i / num_steps
        t2 = (i + 1) / num_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def get_named_beta_schedule(name: str, num_steps: int, scale_beta: float = 1.0):
    if name == "linear":
        return linear_betas(num_steps, scale_beta)
    if name == "cosine":
        return cosine_betas(num_steps)
    raise ValueError(f"unknown beta schedule: {name}")


def space_timesteps(num_timesteps: int, section_counts) -> list[int]:
    """Subset of original timesteps to retain (respace.py:8-62).

    Accepts 'ddimN' strings, comma strings, or count lists. Returns a sorted
    list (the reference returns a set; order matters for our arrays).
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim") :])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == desired:
                    return list(range(0, num_timesteps, stride))
            raise ValueError(
                f"cannot create exactly {desired} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps: list[int] = []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        frac_stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            all_steps.append(start_idx + round(cur))
            cur += frac_stride
        start_idx += size
    return sorted(all_steps)


@dataclasses.dataclass(frozen=True)
class DiffusionParams:
    """All schedule-derived arrays, already respaced. Shapes (S,) where S is
    the number of *sampling* steps (1000 for DDPM, 50 for ddim50)."""

    num_steps: int
    timestep_map: np.ndarray  # (S,) int32 — sampled index -> original t
    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray

    def gather(self, name: str, t: jnp.ndarray) -> jnp.ndarray:
        """Extract schedule values at (sampled-index) timesteps t, shaped
        (B, 1, 1) for broadcasting over (B, T, C)."""
        arr = jnp.asarray(getattr(self, name), jnp.float32)
        return arr[t][:, None, None]


def make_diffusion(
    *,
    schedule: str = "cosine",
    steps: int = 1000,
    timestep_respacing: str | Sequence[int] | None = None,
    scale_beta: float = 1.0,
) -> DiffusionParams:
    betas = get_named_beta_schedule(schedule, steps, scale_beta)
    alphas_cumprod = np.cumprod(1.0 - betas)

    if timestep_respacing:
        use = space_timesteps(steps, timestep_respacing)
        last = 1.0
        new_betas = []
        for i in use:
            new_betas.append(1 - alphas_cumprod[i] / last)
            last = alphas_cumprod[i]
        betas = np.array(new_betas, dtype=np.float64)
        timestep_map = np.array(use, dtype=np.int32)
    else:
        timestep_map = np.arange(steps, dtype=np.int32)

    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    posterior_variance = betas * (1.0 - acp_prev) / (1.0 - acp)
    post_logvar = np.log(np.append(posterior_variance[1], posterior_variance[1:]))

    return DiffusionParams(
        num_steps=len(betas),
        timestep_map=timestep_map,
        betas=betas.astype(np.float32),
        alphas_cumprod=acp.astype(np.float32),
        alphas_cumprod_prev=acp_prev.astype(np.float32),
        sqrt_alphas_cumprod=np.sqrt(acp).astype(np.float32),
        sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - acp).astype(np.float32),
        sqrt_recip_alphas_cumprod=np.sqrt(1.0 / acp).astype(np.float32),
        sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / acp - 1.0).astype(np.float32),
        posterior_variance=posterior_variance.astype(np.float32),
        posterior_log_variance_clipped=post_logvar.astype(np.float32),
        posterior_mean_coef1=(betas * np.sqrt(acp_prev) / (1.0 - acp)).astype(
            np.float32
        ),
        posterior_mean_coef2=(
            (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)
        ).astype(np.float32),
    )
