"""Diffusion (denoiser) training step.

Capability parity with ``diffusion_rvqvae_trainer.py:339-357`` (_g_training)
+ ``train()`` (:543-571): uniform timestep sampling, x0-prediction
SmoothL1 loss on the 1536-dim latent sequence, Adam with global-norm clip.

The batch carries *latents* already produced by the frozen body-part
RVQ-VAE encoders (map2latent ÷ latent_scale, trainer :289-294). Latent
encoding is part of the data path, not the train step — on TPU we fold it
into the same jit when the RVQ params are available (see
``make_latent_encoder``), keeping the whole step on-device.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from syntalker_tpu.data import joints as J
from syntalker_tpu.diffusion.core import training_loss
from syntalker_tpu.diffusion.schedule import DiffusionParams
from syntalker_tpu.models.denoiser import MDM
from syntalker_tpu.train.state import TrainState


@dataclasses.dataclass(frozen=True)
class DiffusionTrainConfig:
    pre_frames: int = 4  # args.pre_frames
    latent_scale: float = 5.0  # args.vqvae_latent_scale


def make_diffusion_train_step(
    mdm: MDM,
    diffusion: DiffusionParams,
    optimizer,
    cfg: DiffusionTrainConfig = DiffusionTrainConfig(),
):
    """Returns a jittable (state, batch) -> (state, metrics) step.

    batch dict:
      latent_in : (B, T_lat, 1536) scaled body-part latents (x0)
      audio     : (B, S, 2) onset+amplitude channels
      word      : (B, F) int32 word ids
      prompt    : optional (B, prompt_dim) TMR embedding (h3d path)
      style     : optional (B, style_dim) MotionCLIP embedding
                  (use_motionclip path; train-time CFG dropout to zeros
                  happens inside encode_cond)
    """

    def step(state: TrainState, batch: Dict[str, jax.Array]):
        rng, (k_t, k_noise, k_cond, k_drop) = state.next_rngs(4)
        x0 = batch["latent_in"]
        b = x0.shape[0]
        t = jax.random.randint(k_t, (b,), 0, diffusion.num_steps)
        noise = jax.random.normal(k_noise, x0.shape)
        seed = x0[:, : cfg.pre_frames]
        mstate = state.model_state or {}

        def loss_fn(params):
            # mutable batch_stats: present only with audio_norm='batch';
            # the running-moment updates come back as (non-differentiated)
            # aux output and thread into TrainState.model_state
            cond, updates = mdm.apply(
                {"params": params, **mstate},
                batch["audio"],
                batch["word"],
                seed,
                prompt=batch.get("prompt"),
                style=batch.get("style"),
                train=True,
                cond_rng=k_cond,
                method="encode_cond",
                rngs={"dropout": k_drop},
                mutable=["batch_stats"],
            )

            def model_fn(x_t, t_orig):
                return mdm.apply(
                    {"params": params, **mstate},
                    x_t,
                    t_orig,
                    cond,
                    train=True,
                    method="denoise",
                    rngs={"dropout": jax.random.fold_in(k_drop, 1)},
                )

            loss = training_loss(diffusion, model_fn, x0, t, noise)
            return jnp.mean(loss), updates

        (loss, stats_updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        import optax

        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_mstate = dict(stats_updates) or state.model_state
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt, rng=rng,
            model_state=new_mstate,
        )
        return new_state, {"predict_x0_loss": loss}

    return step


def calibrate_latent_scale(
    rvq_modules: dict, stats, parts: Dict[str, jax.Array], trans_v: jax.Array,
    *, target_std: float = 1.0,
) -> float:
    """Measure the std of the concatenated RVQ latents on a sample batch and
    return the divisor that normalizes them to `target_std`.

    The reference hardcodes vqvae_latent_scale=5 — a value implicitly tied
    to ITS pretrained encoders' output scale (the diffusion x0 must be
    ~unit-variance for the cosine noise schedule to cover the right SNR
    range). Freshly trained encoders have a different scale; calibrate once
    after RVQ training and store the value in the experiment config.
    """
    enc = make_latent_encoder(rvq_modules, stats, latent_scale=1.0)
    lat = enc(parts["upper"], parts["hands"], parts["lower"], trans_v)
    return float(jnp.std(lat)) / target_std


def make_latent_encoder_fn(modules: dict, stats, *, latent_scale: float = 5.0):
    """Params-as-ARGS pose->latent featurizer core.

    Mirrors _load_data (diffusion_rvqvae_trainer.py:244-294): per-part rot6d
    normalization, frozen RVQ ``map2latent``, concat, ÷latent_scale.

    ``modules`` maps part name -> RVQVAE module (static); the returned
    ``encode(params3, upper, hands, lower, trans_v)`` takes the per-part
    param trees at CALL time. Hot jitted steps must use this form: closure-
    captured params become HLO constants, and constant-heavy executables pay
    a large per-dispatch cost on the tunneled runtime (70.5 ms vs 4.2 ms
    per featurize at batch 128 — scripts/probe_featurize.py, round 4).
    """

    def encode(params3, upper, hands, lower, trans_v):
        u = stats.normalize_part(upper, "upper")
        h = stats.normalize_part(hands, "hands")
        l = stats.normalize_part(lower, "lower")
        tv = (trans_v - stats.trans_mean) / stats.trans_std
        lower_in = jnp.concatenate([l, tv], axis=-1)
        feats = {"upper": u, "hands": h, "lower": lower_in}
        lat = []
        for name in J.LATENT_SLICES:
            lat.append(
                modules[name].apply(
                    {"params": params3[name]}, feats[name], method="map2latent"
                )
            )
        return jnp.concatenate(lat, axis=-1) / latent_scale

    return encode


def make_latent_encoder(rvq_modules: dict, stats, *, latent_scale: float = 5.0):
    """Closure form of :func:`make_latent_encoder_fn` for non-hot callers
    (eval harness, smoke scripts): params bound at build time.

    Input: per-part rot6d features (B, T, dim) **unnormalized** and trans_v
    (B, T, 3). Output: (B, T/4, 1536) latent_in.
    """
    modules = {n: m for n, (m, _p, _q) in rvq_modules.items()}
    params3 = {n: p for n, (_m, p, _q) in rvq_modules.items()}
    core = make_latent_encoder_fn(modules, stats, latent_scale=latent_scale)

    def encode(upper, hands, lower, trans_v):
        return core(params3, upper, hands, lower, trans_v)

    return encode
