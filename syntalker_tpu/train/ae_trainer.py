"""Trainers for the auxiliary autoencoder oracles.

The reference ships these as pretrained artifacts (eval VAE
`AESKConv_240_100.bin`, face VQVAE `face_vertex_1layer_790.bin`; the
`ae_total` trainer module is not even present in the snapshot). Here they
are first-class so the whole evaluation stack can be reproduced end to end:

- :func:`make_eval_vae_train_step` — reconstruction training of the
  skeleton-conv FGD featurizer on 330-d rot6d windows,
- :func:`make_face_vqvae_train_step` — face VQ-VAE with the legacy
  β-commit embedding loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from syntalker_tpu.train.state import TrainState


def make_eval_vae_train_step(module, optimizer):
    """(state, batch (B, T, 330)) -> (state, metrics); MSE reconstruction."""

    def step(state: TrainState, batch: jax.Array):
        rng, _ = state.next_rngs(1)

        def loss_fn(params):
            out = module.apply({"params": params}, batch)
            rec = out["rec_pose"]
            loss = jnp.mean((rec - batch) ** 2)
            return loss, {"recon": loss}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["loss"] = loss
        return (
            state.replace(
                step=state.step + 1, params=new_params, opt_state=new_opt, rng=rng
            ),
            metrics,
        )

    return step


def make_face_vqvae_train_step(module, optimizer, embedding_weight: float = 1.0):
    """(state, batch (B, T, 106)) -> (state, metrics); recon + VQ loss."""

    def step(state: TrainState, batch: jax.Array):
        rng, _ = state.next_rngs(1)

        def loss_fn(params):
            out = module.apply({"params": params}, batch)
            recon = jnp.mean((out["rec_pose"] - batch) ** 2)
            loss = recon + embedding_weight * out["embedding_loss"]
            return loss, {
                "recon": recon,
                "embedding": out["embedding_loss"],
                "perplexity": out["perplexity"],
            }

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["loss"] = loss
        return (
            state.replace(
                step=state.step + 1, params=new_params, opt_state=new_opt, rng=rng
            ),
            metrics,
        )

    return step
