"""Trainer orchestration: epoch/iteration loops around the jitted steps.

Capability parity with the reference trainer layer (train.py:33-253
BaseTrainer, diffusion_rvqvae_trainer.py train/test, rvq_beatx_train.py),
restructured so that ALL device work is inside jitted functions and the
Python loop only moves host batches and records metrics.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from syntalker_tpu.config import ExperimentConfig, body_part_rvq_config
from syntalker_tpu.data import joints as J
from syntalker_tpu.data.cache import BatchLoader, BeatCache
from syntalker_tpu.data.features import pose_to_part_rot6d
from syntalker_tpu.data.stats import PoseStats, identity_pose_stats, load_pose_stats
from syntalker_tpu.diffusion.schedule import make_diffusion
from syntalker_tpu.models.denoiser import create_mdm
from syntalker_tpu.models.rvqvae import create_rvqvae
from syntalker_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from syntalker_tpu.train.diffusion_trainer import (
    DiffusionTrainConfig,
    make_diffusion_train_step,
    make_latent_encoder_fn,
)
from syntalker_tpu.train.rvq_trainer import RVQLossConfig, make_rvq_train_step
from syntalker_tpu.train import state as ts
from syntalker_tpu.utils.tracking import EpochTracker, StepTimer, set_random_seed

log = logging.getLogger("syntalker")


def _make_indexed_step(raw_step, featurize, mesh):
    """Jitted step over a device-resident dataset: gather the batch by index
    on-device, constrain it onto the data axis, then run the normal step.
    The only per-step h2d is the int32 index vector (data/cache.py
    DeviceDataset — the transfer-bound-loader fix).

    ``frozen`` (the RVQ / auxiliary-encoder params featurize needs) is an
    ARGUMENT, not a closure capture: closure-captured arrays are inlined as
    HLO constants, and on the tunneled runtime constant-heavy executables
    pay a large per-dispatch cost (measured: the in-jit featurize alone is
    70.5 ms/call closed-over vs 4.2 ms as-args at batch 128)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    data_sharding = NamedSharding(mesh, P("data"))

    def indexed_step(state, arrays, idx, frozen):
        batch = jax.tree.map(lambda a: a[idx], arrays)
        if mesh.shape["data"] > 1:
            batch = jax.lax.with_sharding_constraint(
                batch, jax.tree.map(lambda _: data_sharding, batch)
            )
        return raw_step(state, featurize(frozen, batch))

    return jax.jit(indexed_step)


def _rvq_cfg(cfg: ExperimentConfig, part: str):
    """Body-part RVQ config sized to match the denoiser latent (one third
    of latent_total_dim per part) and the chosen motion representation."""
    import dataclasses as _dc

    from syntalker_tpu.models.rvqvae import RVQVAEConfig
    from syntalker_tpu.ops.quantize import RVQConfig

    code_dim = cfg.mdm.latent_total_dim // J.NUM_PARTS
    q = RVQConfig(code_dim=code_dim, nb_code=512)
    if cfg.representation == "h3d623":
        from syntalker_tpu.data.h3d import H3D_PART_DIMS

        rcfg = RVQVAEConfig(
            input_dim=H3D_PART_DIMS[part],
            width=cfg.rvq_width,
            depth=cfg.rvq_depth,
            quantizer=q,
        )
    else:
        rcfg = body_part_rvq_config(part, cfg.rvq_width, cfg.rvq_depth, q)
    return _dc.replace(rcfg, output_emb_width=code_dim)


def load_rvq_stack(cfg: ExperimentConfig, rng: jax.Array) -> Dict[str, tuple]:
    """(module, params, quantizer_state) per body part; loads checkpoints
    from cfg.rvq_ckpts when given, else fresh-initializes (for smoke runs)."""
    from syntalker_tpu.ops.quantize import RVQState

    out = {}
    for i, part in enumerate(("upper", "hands", "lower")):
        rcfg = _rvq_cfg(cfg, part)
        module, params, qstate = create_rvqvae(rcfg, jax.random.fold_in(rng, i))
        if i < len(cfg.rvq_ckpts) and cfg.rvq_ckpts[i]:
            raw = ts.load_checkpoint_raw(cfg.rvq_ckpts[i])
            params = raw["params"]
            q = raw["quantizer_state"]
            qstate = RVQState(
                codebook=jnp.asarray(q["codebook"]),
                code_sum=jnp.asarray(q["code_sum"]),
                code_count=jnp.asarray(q["code_count"]),
                initialized=jnp.asarray(q["initialized"]),
            )
        out[part] = (module, params, qstate)
    return out


class DiffusionTrainer:
    """Epoch-based denoiser training (diffusion_rvqvae_trainer.py:543-571)."""

    def __init__(
        self,
        cfg: ExperimentConfig,
        cache: BeatCache,
        stats: Optional[PoseStats] = None,
        tmr_motion: Optional[tuple] = None,  # (module, params) frozen TMR
    ):
        self.cfg = cfg
        set_random_seed(cfg.train.seed)
        rng = jax.random.PRNGKey(cfg.train.seed)
        self.tmr_motion = tmr_motion

        self.mesh = make_mesh(cfg.train.data_parallel, cfg.train.model_parallel)
        self.loader = BatchLoader(cache, cfg.train.batch_size, seed=cfg.train.seed)
        self.stats = stats or (
            load_pose_stats(cfg.data.mean_std_dir)
            if Path(cfg.data.mean_std_dir).exists()
            else identity_pose_stats()
        )

        self.mdm, mdm_params = create_mdm(cfg.mdm, rng, frames=cfg.data.pose_length)
        if cfg.data.vocab_path and Path(cfg.data.vocab_path).exists():
            # reference vocab.pkl / our json vocab: seed the word table with
            # the pretrained fasttext matrix when one is stored
            # (denoiser.py:64-66, build_vocab.py:135-198)
            from syntalker_tpu.data.vocab import Vocab
            from syntalker_tpu.models.denoiser import apply_word_embedding

            vocab = Vocab.load(cfg.data.vocab_path)
            if vocab.word_embedding_weights is not None:
                if isinstance(mdm_params, dict) and "params" in mdm_params:
                    mdm_params = {
                        **mdm_params,
                        "params": apply_word_embedding(
                            mdm_params["params"], vocab.word_embedding_weights
                        ),
                    }
                else:
                    mdm_params = apply_word_embedding(
                        mdm_params, vocab.word_embedding_weights
                    )
        self.rvq = load_rvq_stack(cfg, jax.random.fold_in(rng, 99))
        self.diffusion = make_diffusion(
            schedule=cfg.diffusion.schedule,
            steps=cfg.diffusion.steps,
            timestep_respacing=cfg.diffusion.timestep_respacing or None,
        )
        self.optimizer = ts.make_diffusion_optimizer(cfg.train.lr, cfg.train.grad_clip)
        self.state = ts.create_train_state(mdm_params, self.optimizer, rng)

        if cfg.representation == "h3d623":
            from syntalker_tpu.data.h3d import part_mask_623
            from syntalker_tpu.data.stats import identity_h3d_stats, load_h3d_stats

            h3d_stats = (
                load_h3d_stats(cfg.data.mean_std_dir)
                if Path(cfg.data.mean_std_dir).exists()
                else identity_h3d_stats()
            )
            masks = {p: part_mask_623(p) for p in J.LATENT_SLICES}
            rvq_modules = {n: m for n, (m, _p, _q) in self.rvq.items()}
            tmr_module = self.tmr_motion[0] if self.tmr_motion else None

            def featurize(frozen, batch):
                x = h3d_stats.normalize(batch["h3d"])
                lat = []
                for name in J.LATENT_SLICES:
                    lat.append(
                        rvq_modules[name].apply(
                            {"params": frozen["rvq"][name]},
                            x[..., masks[name]], method="map2latent",
                        )
                    )
                latent_in = jnp.concatenate(lat, axis=-1) / cfg.latent_scale
                out = {
                    "latent_in": latent_in,
                    "audio": batch["audio"],
                    "word": batch["word"],
                }
                if "prompt" in batch:
                    out["prompt"] = batch["prompt"]
                elif tmr_module is not None:
                    # self-supervised prompt channel: the frozen TMR motion
                    # embedding of the GT clip stands in for text at train
                    # time (h3d_diffusion_new_trainer.py:351-392)
                    mu, _ = tmr_module.apply({"params": frozen["tmr"]}, x)
                    out["prompt"] = jax.lax.stop_gradient(mu)
                return out

            self._frozen = {
                "rvq": {n: p for n, (_m, p, _q) in self.rvq.items()},
                **({"tmr": self.tmr_motion[1]} if self.tmr_motion else {}),
            }
            self._batch_keys = ("h3d", "audio", "word")
        else:
            encode_latent = make_latent_encoder_fn(
                {n: m for n, (m, _p, _q) in self.rvq.items()},
                self.stats,
                latent_scale=cfg.latent_scale,
            )

            def featurize(frozen, batch):
                pose_aa = batch["pose"][..., : J.AXIS_ANGLE_DIM]
                parts = pose_to_part_rot6d(pose_aa)
                latent_in = encode_latent(
                    frozen["rvq"], parts["upper"], parts["hands"],
                    parts["lower"], batch["trans_v"],
                )
                return {
                    "latent_in": latent_in,
                    "audio": batch["audio"],
                    "word": batch["word"],
                }

            self._frozen = {"rvq": {n: p for n, (_m, p, _q) in self.rvq.items()}}
            self._batch_keys = ("pose", "trans_v", "audio", "word")

        raw_step = make_diffusion_train_step(
            self.mdm,
            self.diffusion,
            self.optimizer,
            DiffusionTrainConfig(cfg.pre_frames, cfg.latent_scale),
        )

        def fused_step(state, frozen, batch):
            return raw_step(state, featurize(frozen, batch))

        # the frozen featurizer params ride as ARGUMENTS through the jit
        # boundary (device-put once, reused every step) — see
        # _make_indexed_step's docstring for why closure capture is slow on
        # the tunneled runtime.
        self._frozen = jax.device_put(self._frozen)
        jit_step = jax.jit(fused_step)
        indexed = _make_indexed_step(raw_step, featurize, self.mesh)
        self.step = lambda state, batch: jit_step(state, self._frozen, batch)
        self.step_indexed = lambda state, arrays, idx: indexed(
            state, arrays, idx, self._frozen
        )
        self._dataset = None
        self.tracker = EpochTracker({"fid": False, "bc": True, "l1div": True})

        with self.mesh:
            self.state = self.state.replace(
                params=replicate(self.state.params, self.mesh),
                opt_state=replicate(self.state.opt_state, self.mesh),
            )

    def maybe_resume(self) -> int:
        """Restore the full train state from cfg.train.resume or the latest
        checkpoint in ckpt_dir. Returns the restored step (0 if fresh)."""
        path = self.cfg.train.resume or ts.latest_checkpoint(self.cfg.train.ckpt_dir)
        if not path:
            return 0
        self.state = ts.load_checkpoint(path, jax.device_get(self.state))
        step = int(self.state.step)
        log.info(f"resumed from {path} at step {step}")
        return step

    def device_dataset(self):
        """Lazily upload the whole cache to HBM (cfg.train.device_data).
        Placement follows DeviceDataset's >HBM policy: replicated →
        data-axis-sharded → DatasetTooLargeError (the caller falls back to
        the host BatchLoader)."""
        if self._dataset is None:
            from syntalker_tpu.data.cache import DeviceDataset

            self._dataset = DeviceDataset(
                self.loader.cache, self._batch_keys, self.cfg.train.batch_size,
                seed=self.cfg.train.seed, mesh=self.mesh,
            )
            log.info(
                f"device-resident dataset: {self._dataset.n} windows, "
                f"{self._dataset.nbytes / 1e9:.2f} GB uploaded once "
                f"({self._dataset.placement})"
            )
        return self._dataset

    def _epoch_batches(self, epoch: int):
        """Yield step thunks: (run, is_device_resident)."""
        if self.cfg.train.device_data:
            from syntalker_tpu.data.cache import DatasetTooLargeError

            try:
                ds = self.device_dataset()
            except DatasetTooLargeError as e:
                log.warning(f"{e}; streaming batches from the host instead")
                self.cfg = dataclasses.replace(
                    self.cfg,
                    train=dataclasses.replace(self.cfg.train, device_data=False),
                )
            else:
                for idx in ds.epoch_indices(epoch):
                    yield lambda s, i=idx: self.step_indexed(s, ds.arrays, i)
                return
        for batch in self.loader.epoch(epoch):
            b = shard_batch(
                {k: batch[k] for k in self._batch_keys if k in batch},
                self.mesh,
            )
            yield lambda s, b=b: self.step(s, b)

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        timer = StepTimer()
        with self.mesh:
            for it, run in enumerate(self._epoch_batches(epoch)):
                timer.mark_data()
                self.state, metrics = run(self.state)
                if it % self.cfg.train.log_period == 0:
                    loss = float(metrics["predict_x0_loss"])
                    self.tracker.update("predict_x0_loss", "train", loss)
                    timer.mark_step()
                    log.info(
                        f"epoch {epoch} it {it}: loss {loss:.4f} "
                        f"(data {timer.data_s*1e3:.0f}ms step {timer.step_s*1e3:.0f}ms)"
                    )
                if self.cfg.train.debug and it >= 1:
                    # smoke-test the checkpoint round trip each debug epoch
                    # (the reference's --debug save/load/test cycle)
                    path = self.save()
                    self.state = ts.load_checkpoint(path, jax.device_get(self.state))
                    break
        return self.tracker.end_epoch(epoch)

    def save(self, step: Optional[int] = None):
        return ts.save_checkpoint(self.cfg.train.ckpt_dir, self.state, step)


class RVQTrainer:
    """Iteration-based body-part RVQ-VAE training (rvq_beatx_train.py:333-404)."""

    def __init__(self, cfg: ExperimentConfig, cache: BeatCache, stats: Optional[PoseStats] = None):
        self.cfg = cfg
        part = cfg.rvq_train.body_part
        set_random_seed(cfg.train.seed)
        rng = jax.random.PRNGKey(cfg.train.seed)

        self.part = part
        self.stats = stats or (
            load_pose_stats(cfg.data.mean_std_dir)
            if Path(cfg.data.mean_std_dir).exists()
            else identity_pose_stats()
        )
        self.mesh = make_mesh(cfg.train.data_parallel, cfg.train.model_parallel)
        self.loader = BatchLoader(cache, cfg.rvq_train.batch_size, seed=cfg.train.seed)

        rcfg = _rvq_cfg(cfg, part)
        self.module, params, qstate = create_rvqvae(rcfg, rng)
        self.optimizer = ts.make_rvq_optimizer(
            cfg.rvq_train.lr,
            cfg.rvq_train.warmup_iters,
            cfg.rvq_train.milestones,
            cfg.rvq_train.gamma,
        )
        self.state = ts.create_train_state(params, self.optimizer, rng, qstate)

        stats_ref = self.stats
        use_trans = part == "lower" and cfg.data.use_trans

        if cfg.representation == "h3d623":
            from syntalker_tpu.data.h3d import part_mask_623
            from syntalker_tpu.data.stats import identity_h3d_stats, load_h3d_stats

            h3d_stats = (
                load_h3d_stats(cfg.data.mean_std_dir)
                if Path(cfg.data.mean_std_dir).exists()
                else identity_h3d_stats()
            )
            mask = part_mask_623(part)

            # frozen is unused here (the RVQ params are the TRAINED state;
            # the stats closed over are a few KB) but the signature matches
            # _make_indexed_step's params-as-args contract
            def featurize(_frozen, batch):
                return h3d_stats.normalize(batch["h3d"])[..., mask]

            self._batch_keys = ("h3d",)
        else:

            def featurize(_frozen, batch):
                pose_aa = batch["pose"][..., : J.AXIS_ANGLE_DIM]
                parts = pose_to_part_rot6d(pose_aa)
                x = stats_ref.normalize_part(parts[part], part)
                if use_trans:
                    tv = (batch["trans_v"] - stats_ref.trans_mean) / stats_ref.trans_std
                    x = jnp.concatenate([x, tv], axis=-1)
                return x

            self._batch_keys = ("pose", "trans_v")

        raw_step = make_rvq_train_step(
            self.module,
            self.optimizer,
            RVQLossConfig(commit_weight=cfg.rvq_train.commit_weight),
        )

        def fused_step(state, batch):
            return raw_step(state, featurize((), batch))

        indexed = _make_indexed_step(raw_step, featurize, self.mesh)
        self.step = jax.jit(fused_step)
        self.step_indexed = lambda state, arrays, idx: indexed(
            state, arrays, idx, ()
        )
        self._dataset = None
        self.tracker = EpochTracker()

    def device_dataset(self):
        if self._dataset is None:
            from syntalker_tpu.data.cache import DeviceDataset

            self._dataset = DeviceDataset(
                self.loader.cache, self._batch_keys,
                self.cfg.rvq_train.batch_size,
                seed=self.cfg.train.seed, mesh=self.mesh,
            )
        return self._dataset

    def _epoch_batches(self, epoch: int):
        if self.cfg.train.device_data:
            from syntalker_tpu.data.cache import DatasetTooLargeError

            try:
                ds = self.device_dataset()
            except DatasetTooLargeError as e:
                log.warning(f"{e}; streaming batches from the host instead")
                self.cfg = dataclasses.replace(
                    self.cfg,
                    train=dataclasses.replace(self.cfg.train, device_data=False),
                )
            else:
                for idx in ds.epoch_indices(epoch):
                    yield lambda s, i=idx: self.step_indexed(s, ds.arrays, i)
                return
        for batch in self.loader.epoch(epoch):
            b = shard_batch(
                {k: batch[k] for k in self._batch_keys if k in batch},
                self.mesh,
            )
            yield lambda s, b=b: self.step(s, b)

    def train(self, total_iters: Optional[int] = None):
        total = total_iters or self.cfg.rvq_train.total_iters
        if len(self.loader) == 0:
            raise ValueError(
                f"no full batches: {len(self.loader.cache)} windows < "
                f"batch size {self.loader.batch_size}"
            )
        it = 0
        epoch = 0
        with self.mesh:
            while it < total:
                for run in self._epoch_batches(epoch):
                    self.state, metrics = run(self.state)
                    it += 1
                    if it % self.cfg.train.log_period == 0:
                        log.info(
                            f"iter {it}: loss {float(metrics['loss']):.4f} "
                            f"recon {float(metrics['recon']):.4f} "
                            f"perplexity {float(metrics['perplexity']):.1f}"
                        )
                    if it % self.cfg.rvq_train.save_every == 0:
                        self.save(it)
                    if it >= total:
                        break
                epoch += 1
        return self.state

    def save(self, step: Optional[int] = None):
        d = Path(self.cfg.train.ckpt_dir) / f"rvq_{self.part}"
        return ts.save_checkpoint(d, self.state, step)
