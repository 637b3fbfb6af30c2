"""Integration tests: both trainers run end-to-end on the shipped clip with
tiny model configs over the 8-device virtual mesh, and checkpoints
round-trip with full state (params + optimizer + codebooks)."""

import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syntalker_tpu.config import (
    DataConfig,
    ExperimentConfig,
    RVQTrainConfig,
    TrainConfig,
    load_config,
)
from syntalker_tpu.data.cache import BeatCache, ClipConfig, preprocess_clip
from syntalker_tpu.models.denoiser import MDMConfig
from syntalker_tpu.train import state as ts
from syntalker_tpu.train.loop import DiffusionTrainer, RVQTrainer

NPZ = "/root/reference/demo/examples/2_scott_0_1_1.npz"
WAV = "/root/reference/demo/examples/2_scott_0_1_1.wav"

TINY_MDM = dict(
    latent_total_dim=48,
    latent_dim=32,
    ff_size=64,
    num_layers=1,
    num_heads=2,
    rope_heads=4,
    audio_feat_dim=16,
    word_feat_dim=16,
    word_embed_dim=8,
    vocab_size=64,
)


@pytest.fixture(scope="module")
def tiny_cache(tmp_path_factory):
    root = tmp_path_factory.mktemp("cache")
    arrays = preprocess_clip(NPZ, WAV, None, None)
    # keep it small: 16 s of motion
    arrays = {
        k: (v[: 16 * 30] if v.ndim and v.shape[0] > 300 and k != "audio" else v)
        for k, v in arrays.items()
    }
    arrays["audio"] = arrays["audio"][: 16 * 16000]
    cache = BeatCache(root)
    cache.add_clip("clip", arrays, ClipConfig(pose_length=64, stride=32), is_test=False)
    cache.save_index()
    return cache


def tiny_config(tmp_path) -> ExperimentConfig:
    return ExperimentConfig(
        mdm=MDMConfig(**TINY_MDM),
        train=TrainConfig(batch_size=8, log_period=1, ckpt_dir=str(tmp_path / "ckpt"),
                          data_parallel=4, model_parallel=2),
        rvq_train=RVQTrainConfig(batch_size=8, save_every=10_000),
        rvq_width=32,
        rvq_depth=1,
        data=DataConfig(pose_length=64),
    )


def test_latest_checkpoint_skips_inflight_orbax_tmp(tmp_path):
    """An in-progress orbax save dir (step_N.orbax-checkpoint-tmp-*) must be
    invisible to resume pollers — it crashed the sustained orchestrator when
    its name hit int() (round-5 fix in train/state.py latest_checkpoint)."""
    for name in ("step_100", "step_2000",
                 "step_4000.orbax-checkpoint-tmp-1787", "not_a_step"):
        (tmp_path / name).mkdir()
    (tmp_path / "step_9999").write_text("a file, not a ckpt dir")
    found = ts.latest_checkpoint(tmp_path)
    assert found is not None and found.name == "step_2000"
    assert ts.latest_checkpoint(tmp_path / "missing") is None


class TestRVQTrainer:
    def test_runs_and_checkpoints(self, tiny_cache, tmp_path):
        cfg = tiny_config(tmp_path)
        trainer = RVQTrainer(cfg, tiny_cache)
        state = trainer.train(total_iters=3)
        assert int(state.step) == 3
        assert bool(state.quantizer_state.initialized)
        path = trainer.save()
        restored = ts.load_checkpoint(path, jax.device_get(trainer.state))
        np.testing.assert_array_equal(
            np.asarray(restored.step), np.asarray(trainer.state.step)
        )
        # optimizer state persists (the reference dropped it — SURVEY §5)
        ref_leaf = jax.tree.leaves(jax.device_get(trainer.state.opt_state))[0]
        res_leaf = jax.tree.leaves(restored.opt_state)[0]
        np.testing.assert_array_equal(np.asarray(res_leaf), np.asarray(ref_leaf))


class TestDiffusionTrainer:
    def test_epoch_runs_on_mesh(self, tiny_cache, tmp_path):
        cfg = tiny_config(tmp_path)
        trainer = DiffusionTrainer(cfg, tiny_cache)
        metrics = trainer.train_epoch(0)
        assert "train/predict_x0_loss" in metrics
        assert np.isfinite(metrics["train/predict_x0_loss"])
        assert int(trainer.state.step) == len(trainer.loader)

    def test_device_resident_matches_host_path(self, tiny_cache, tmp_path):
        """The DeviceDataset path (whole cache in HBM, on-device gather)
        must produce the SAME batches and step numerics as the host loader:
        identical epoch permutation, and identical loss on the same batch."""
        from syntalker_tpu.data.cache import DeviceDataset
        from syntalker_tpu.parallel.mesh import shard_batch

        cfg = tiny_config(tmp_path)
        trainer = DiffusionTrainer(cfg, tiny_cache)
        ds = trainer.device_dataset()
        # 1) epoch order is bit-identical to BatchLoader's
        host_batches = list(trainer.loader.epoch(3))
        idxs = list(ds.epoch_indices(3))
        assert len(idxs) == len(host_batches)
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(ds.arrays["audio"]))[idxs[0]],
            host_batches[0]["audio"],
        )
        # 2) one step through each path from the same state -> same metrics
        state0 = trainer.state
        with trainer.mesh:
            hb = shard_batch(
                {k: host_batches[0][k] for k in trainer._batch_keys},
                trainer.mesh,
            )
            _, m_host = trainer.step(state0, hb)
            _, m_dev = trainer.step_indexed(state0, ds.arrays, idxs[0])
        np.testing.assert_allclose(
            float(m_host["predict_x0_loss"]),
            float(m_dev["predict_x0_loss"]),
            rtol=1e-5,
        )

    def test_device_resident_epoch_flag(self, tiny_cache, tmp_path):
        cfg = tiny_config(tmp_path)
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, device_data=True)
        )
        trainer = DiffusionTrainer(cfg, tiny_cache)
        metrics = trainer.train_epoch(0)
        assert np.isfinite(metrics["train/predict_x0_loss"])
        assert int(trainer.state.step) == len(trainer.device_dataset())


class TestDeviceDatasetPlacement:
    """The >HBM policy: replicated → data-axis-sharded → host fallback
    (DeviceDataset docstring; VERDICT r4 #8)."""

    def test_sharded_placement_matches_replicated(self, tiny_cache, tmp_path):
        from syntalker_tpu.data.cache import DeviceDataset

        cfg = tiny_config(tmp_path)
        trainer = DiffusionTrainer(cfg, tiny_cache)
        full = trainer.device_dataset()
        assert full.placement == "replicated"
        # budget between per-chip-sharded and full size forces tier 2;
        # n=14 windows over data=4 also exercises the pad-to-even path
        sharded = DeviceDataset(
            trainer.loader.cache, trainer._batch_keys, cfg.train.batch_size,
            seed=cfg.train.seed, mesh=trainer.mesh,
            hbm_budget_bytes=full.nbytes // 2,
        )
        assert sharded.placement == "data_sharded"
        assert sharded.n == full.n
        idx = next(sharded.epoch_indices(0))
        np.testing.assert_array_equal(idx, next(full.epoch_indices(0)))
        with trainer.mesh:
            _, m_full = trainer.step_indexed(trainer.state, full.arrays, idx)
            _, m_shard = trainer.step_indexed(trainer.state, sharded.arrays, idx)
        np.testing.assert_allclose(
            float(m_full["predict_x0_loss"]),
            float(m_shard["predict_x0_loss"]),
            rtol=1e-5,
        )

    def test_too_large_raises(self, tiny_cache, tmp_path):
        from syntalker_tpu.data.cache import DatasetTooLargeError, DeviceDataset

        cfg = tiny_config(tmp_path)
        trainer = DiffusionTrainer(cfg, tiny_cache)
        with pytest.raises(DatasetTooLargeError):
            DeviceDataset(
                trainer.loader.cache, trainer._batch_keys,
                cfg.train.batch_size, seed=0, mesh=trainer.mesh,
                hbm_budget_bytes=1,
            )

    def test_overflow_falls_back_to_host_loader(self, tiny_cache, tmp_path,
                                                monkeypatch):
        import syntalker_tpu.data.cache as cache_mod

        monkeypatch.setattr(cache_mod, "_default_hbm_budget", lambda: 1)
        cfg = tiny_config(tmp_path)
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, device_data=True)
        )
        trainer = DiffusionTrainer(cfg, tiny_cache)
        metrics = trainer.train_epoch(0)
        assert np.isfinite(metrics["train/predict_x0_loss"])
        assert trainer.cfg.train.device_data is False  # policy flipped it
        assert int(trainer.state.step) == len(trainer.loader)

    def test_empty_cache_raises_valueerror(self, tmp_path):
        from syntalker_tpu.data.cache import DeviceDataset

        (tmp_path / "empty").mkdir()
        empty = BeatCache(tmp_path / "empty")
        empty.save_index()
        with pytest.raises(ValueError, match="no windows"):
            DeviceDataset(empty, ("pose",), 8)


class TestConfig:
    def test_yaml_and_overrides(self, tmp_path):
        y = tmp_path / "c.yaml"
        y.write_text(
            "name: exp1\ntrain:\n  batch_size: 16\nmdm:\n  num_layers: 2\n"
        )
        cfg = load_config(y, ["train.lr=1e-3", "latent_scale=7.5"])
        assert cfg.name == "exp1"
        assert cfg.train.batch_size == 16
        assert cfg.mdm.num_layers == 2
        assert cfg.train.lr == 1e-3
        assert cfg.latent_scale == 7.5

    def test_dtype_strings_coerced(self, tmp_path):
        y = tmp_path / "c.yaml"
        y.write_text("mdm:\n  dtype: bf16\n  audio_dtype: bfloat16\n")
        cfg = load_config(y, [])
        assert jnp.zeros((1,), cfg.mdm.dtype).dtype == jnp.bfloat16
        assert jnp.zeros((1,), cfg.mdm.audio_dtype).dtype == jnp.bfloat16
        cfg = load_config(y, ["mdm.dtype=f32"])
        assert jnp.zeros((1,), cfg.mdm.dtype).dtype == jnp.float32

    def test_yaml_numeric_strings_coerced(self, tmp_path):
        # YAML 1.1 parses exponent-only literals as STRINGS ("5e-5"); the
        # loader must coerce them to the annotated numeric type or the
        # optimizer receives a str lr (caught driving the shipped YAML).
        y = tmp_path / "c.yaml"
        y.write_text("train:\n  lr: 5e-5\n  epochs: 2e3\n")
        cfg = load_config(y, [])
        assert cfg.train.lr == 5e-5 and isinstance(cfg.train.lr, float)
        assert cfg.train.epochs == 2000 and isinstance(cfg.train.epochs, int)
        y.write_text("train:\n  epochs: 2.5\n")
        with pytest.raises(ValueError):
            load_config(y)

    def test_shipped_configs_numeric(self):
        # every committed YAML must materialize with numeric lr/epochs
        root = Path(__file__).resolve().parents[1]
        for p in sorted((root / "configs").glob("*.yaml")):
            cfg = load_config(p)
            assert isinstance(cfg.train.lr, float), p.name
            assert isinstance(cfg.train.epochs, int), p.name

    def test_unknown_key_rejected(self, tmp_path):
        y = tmp_path / "c.yaml"
        y.write_text("nonexistent_key: 3\n")
        with pytest.raises(KeyError):
            load_config(y)

    def test_registry(self):
        from syntalker_tpu.registry import Registry

        r = Registry("thing")

        @r.register("a")
        def fa():
            return 1

        assert r.get("a")() == 1
        with pytest.raises(KeyError):
            r.get("missing")


class TestComponentRegistry:
    def test_registries_populated(self):
        import syntalker_tpu.components  # noqa: F401
        from syntalker_tpu.registry import (
            DATASETS,
            EVAL_MODELS,
            MODELS,
            SAMPLERS,
            TRAINERS,
        )

        assert "beat_sep_lower" in DATASETS.names()
        assert {"MDM", "RVQVAE", "MotionCLIP"} <= set(MODELS.names())
        assert {"diffusion_rvqvae", "rvq"} <= set(TRAINERS.names())
        assert {"ddpm", "ddim", "plms"} <= set(SAMPLERS.names())
        assert {"VAESKConv", "VQVAEConvZero"} <= set(EVAL_MODELS.names())

    def test_trainer_resolution(self):
        import syntalker_tpu.components  # noqa: F401
        from syntalker_tpu.registry import TRAINERS
        from syntalker_tpu.train.loop import DiffusionTrainer

        assert TRAINERS.get("diffusion_rvqvae") is DiffusionTrainer
