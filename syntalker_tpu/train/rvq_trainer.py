"""RVQ-VAE training step: SmoothL1 reconstruction + commit loss, with the
EMA codebook update threaded through the train state.

Capability parity with ``rvq_beatx_train.py:333-404`` (300k iterations,
batch 256, AdamW 2e-4, loss = SmoothL1(rec, gt) + 0.02·commit), as a single
jittable step. Under ``pjit`` the quantizer's one-hot count/sum reductions
are global, so codebooks stay consistent across data-parallel replicas.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from syntalker_tpu.diffusion.core import smooth_l1
from syntalker_tpu.models.rvqvae import RVQVAE
from syntalker_tpu.train.state import TrainState


@dataclasses.dataclass(frozen=True)
class RVQLossConfig:
    commit_weight: float = 0.02  # rvq_beatx_train.py:372-376
    # optional velocity/acceleration terms of ReConsLoss (off in the shipped
    # run, available for parity with --recons_loss variants)
    vel_weight: float = 0.0
    acc_weight: float = 0.0


def rvq_loss(
    rec: jax.Array, gt: jax.Array, commit: jax.Array, cfg: RVQLossConfig
) -> Tuple[jax.Array, dict]:
    recon = jnp.mean(smooth_l1(rec, gt))
    loss = recon + cfg.commit_weight * commit
    metrics = {"recon": recon, "commit": commit}
    if cfg.vel_weight > 0:
        vel = jnp.mean(smooth_l1(rec[:, 1:] - rec[:, :-1], gt[:, 1:] - gt[:, :-1]))
        loss = loss + cfg.vel_weight * vel
        metrics["vel"] = vel
    if cfg.acc_weight > 0:
        rec_a = rec[:, 2:] - 2 * rec[:, 1:-1] + rec[:, :-2]
        gt_a = gt[:, 2:] - 2 * gt[:, 1:-1] + gt[:, :-2]
        acc = jnp.mean(smooth_l1(rec_a, gt_a))
        loss = loss + cfg.acc_weight * acc
        metrics["acc"] = acc
    return loss, metrics


def make_rvq_train_step(module: RVQVAE, optimizer, loss_cfg: RVQLossConfig = RVQLossConfig()):
    """Returns a jittable (state, batch) -> (state, metrics) step.

    batch: (B, T, input_dim) pose features (already normalized host-side).
    """

    def step(state: TrainState, batch: jax.Array):
        rng, (k_q, k_drop) = state.next_rngs(2)

        def loss_fn(params):
            rec, out = module.apply(
                {"params": params},
                batch,
                state.quantizer_state,
                train=True,
                rng=k_q,
                rngs={"dropout": k_drop},
            )
            loss, metrics = rvq_loss(rec, batch, out.commit_loss, loss_cfg)
            metrics["perplexity"] = out.perplexity
            return loss, (out.state, metrics)

        (loss, (new_qstate, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        import optax

        new_params = optax.apply_updates(state.params, updates)
        metrics["loss"] = loss
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            rng=rng,
            quantizer_state=new_qstate,
        )
        return new_state, metrics

    return step
