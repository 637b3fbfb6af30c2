"""Auxiliary oracle training CLI: FGD eval-VAE, face VQ-VAE, TMR encoders.

Usage:
  python -m syntalker_tpu.cli.train_aux -c configs/rvq_beat2.yaml --model eval_vae
  python -m syntalker_tpu.cli.train_aux -c ... --model face_vqvae
  python -m syntalker_tpu.cli.train_aux -c ... --model tmr

The reference ships these as pretrained artifacts (weights/AESKConv_240_100.bin,
face_vertex_1layer_790.bin, OpenTMA checkpoints); this CLI reproduces them
in-framework so the full evaluation stack is self-hosted.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from syntalker_tpu.cli.common import base_parser, load_smplx_if_available, setup
from syntalker_tpu.data.beat_builder import build_beat_cache
from syntalker_tpu.data.cache import BatchLoader, ClipConfig
from syntalker_tpu.data.features import pose_to_part_rot6d
from syntalker_tpu.train import state as ts

log = logging.getLogger("syntalker")


def train_eval_vae(cfg, cache, iters: int, lr: float):
    from syntalker_tpu.models.eval_vae import EvalVAEConfig, VAESKConv
    from syntalker_tpu.train.ae_trainer import make_eval_vae_train_step

    model = VAESKConv(EvalVAEConfig())
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 330)))["params"]
    opt = optax.adam(lr)
    state = ts.create_train_state(params, opt, jax.random.PRNGKey(1))
    step = jax.jit(make_eval_vae_train_step(model, opt))
    loader = BatchLoader(cache, cfg.train.batch_size, seed=cfg.train.seed)

    it, epoch = 0, 0
    while it < iters:
        for batch in loader.epoch(epoch):
            pose6d = np.asarray(
                pose_to_part_rot6d(jnp.asarray(batch["pose"][..., :165]))["full"]
            )
            state, m = step(state, jnp.asarray(pose6d[:, :32]))
            it += 1
            if it % cfg.train.log_period == 0:
                log.info(f"eval_vae iter {it}: recon {float(m['recon']):.5f}")
            if it >= iters:
                break
        epoch += 1
    return ts.save_checkpoint(f"{cfg.train.ckpt_dir}/eval_vae", state, it)


def train_face_vqvae(cfg, cache, iters: int, lr: float):
    from syntalker_tpu.models.eval_vae import VQVAEConvZero
    from syntalker_tpu.train.ae_trainer import make_face_vqvae_train_step

    model = VQVAEConvZero()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 106)))["params"]
    opt = optax.adam(lr)
    state = ts.create_train_state(params, opt, jax.random.PRNGKey(1))
    step = jax.jit(make_face_vqvae_train_step(model, opt))
    loader = BatchLoader(cache, cfg.train.batch_size, seed=cfg.train.seed)

    it, epoch = 0, 0
    while it < iters:
        for batch in loader.epoch(epoch):
            jaw6d = np.asarray(
                pose_to_part_rot6d(jnp.asarray(batch["pose"][..., :165]))["jaw"]
            )
            face = np.concatenate([jaw6d, batch["facial"]], axis=-1)
            state, m = step(state, jnp.asarray(face))
            it += 1
            if it % cfg.train.log_period == 0:
                log.info(
                    f"face iter {it}: recon {float(m['recon']):.5f} "
                    f"perp {float(m['perplexity']):.0f}"
                )
            if it >= iters:
                break
        epoch += 1
    return ts.save_checkpoint(f"{cfg.train.ckpt_dir}/face_vqvae", state, it)


def train_tmr(cfg, cache, iters: int, lr: float):
    """Contrastive text-motion alignment over the h3d features.

    Captions come from the deterministic rule-based captioner
    (data/captions.py) over joints recovered from each window's h3d
    features, embedded through the TextPipeline (DistilBERT snapshot when
    configured, hash fallback otherwise) — a real text-motion correlation
    either way, replacing the round-1 random-text placeholder."""
    from syntalker_tpu.data.captions import caption_motion
    from syntalker_tpu.data.h3d import recover_from_ric
    from syntalker_tpu.models.tmr import (
        ActorAgnosticEncoder,
        DistilbertTextEncoder,
        TMRConfig,
        TextPipeline,
        make_tmr_train_step,
    )

    tcfg = TMRConfig()
    pipeline = TextPipeline(tcfg)
    text = DistilbertTextEncoder(tcfg)
    motion = ActorAgnosticEncoder(tcfg, input_dim=623)
    rng = jax.random.PRNGKey(0)
    params = {
        "text": text.init(rng, jnp.zeros((1, 8, tcfg.text_feats)), jnp.ones((1, 8)))["params"],
        "motion": motion.init(rng, jnp.zeros((1, 16, 623)))["params"],
    }
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    step = jax.jit(make_tmr_train_step(text, motion, opt))
    loader = BatchLoader(cache, cfg.train.batch_size, seed=cfg.train.seed)

    it, epoch = 0, 0
    while it < iters:
        for batch in loader.epoch(epoch):
            if "h3d" not in batch:
                raise SystemExit("TMR training needs h3d features in the cache "
                                 "(build with an SMPL-X model available)")
            joints = np.asarray(recover_from_ric(jnp.asarray(batch["h3d"])))
            caps = [caption_motion(j).text for j in joints]
            # fixed max_len keeps the jitted step on ONE compiled shape
            text_hidden, text_mask = pipeline.hidden_states(caps)
            batch_t = {
                "text_hidden": jnp.asarray(text_hidden),
                "text_mask": jnp.asarray(text_mask),
                "motion": jnp.asarray(batch["h3d"]),
            }
            params, opt_state, m = step(params, opt_state, batch_t, rng)
            it += 1
            if it % cfg.train.log_period == 0:
                log.info(f"tmr iter {it}: nce {float(m['nce']):.4f}")
            if it >= iters:
                break
        epoch += 1
    state = ts.TrainState(
        step=jnp.asarray(it), params=params, opt_state=opt_state, rng=rng
    )
    return ts.save_checkpoint(f"{cfg.train.ckpt_dir}/tmr", state, it)


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("--model", choices=["eval_vae", "face_vqvae", "tmr"], required=True)
    p.add_argument("--iters", type=int, default=20_000)
    p.add_argument("--lr", type=float, default=1e-4)
    args = p.parse_args(argv)
    cfg = setup(args)
    smplx_model = load_smplx_if_available(cfg)
    cache, _ = build_beat_cache(
        cfg.data.data_path,
        cfg.data.cache_path + "_aux",
        split="train",
        speakers=cfg.data.training_speakers,
        cfg=ClipConfig(pose_length=32 if args.model != "tmr" else 128),
        smplx_model=smplx_model,
    )
    fn = {"eval_vae": train_eval_vae, "face_vqvae": train_face_vqvae, "tmr": train_tmr}[
        args.model
    ]
    path = fn(cfg, cache, args.iters, args.lr)
    log.info(f"saved {args.model} -> {path}")


if __name__ == "__main__":
    main()
