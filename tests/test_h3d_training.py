"""End-to-end h3d-representation path: cache with 623-d features (synthetic
SMPL-X), RVQ + diffusion trainers on the h3d representation, latent decode
back to joints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syntalker_tpu.config import DataConfig, ExperimentConfig, RVQTrainConfig, TrainConfig
from syntalker_tpu.data.cache import BeatCache, ClipConfig, preprocess_clip
from syntalker_tpu.data.stats import identity_h3d_stats
from syntalker_tpu.models.denoiser import MDMConfig
from syntalker_tpu.ops.smplx import synthetic_smplx_model
from syntalker_tpu.train.loop import DiffusionTrainer, RVQTrainer, _rvq_cfg

NPZ = "/root/reference/demo/examples/2_scott_0_1_1.npz"
WAV = "/root/reference/demo/examples/2_scott_0_1_1.wav"

TINY_MDM = dict(
    latent_total_dim=48, latent_dim=32, ff_size=64, num_layers=1, num_heads=2,
    rope_heads=4, audio_feat_dim=16, word_feat_dim=16, word_embed_dim=8,
    vocab_size=64, use_prompt=True, prompt_dim=16,
)


@pytest.fixture(scope="module")
def h3d_cache(tmp_path_factory):
    root = tmp_path_factory.mktemp("h3dcache")
    smplx_model = synthetic_smplx_model()
    arrays = preprocess_clip(NPZ, WAV, None, None, smplx_model=smplx_model)
    keep = 16 * 30
    arrays = {
        k: (v[:keep] if v.ndim and v.shape[0] > keep and k != "audio" else v)
        for k, v in arrays.items()
    }
    arrays["audio"] = arrays["audio"][: 16 * 16000]
    cache = BeatCache(root)
    cache.add_clip("clip", arrays, ClipConfig(pose_length=64, stride=32), is_test=False)
    cache.save_index()
    return cache


def h3d_config(tmp_path) -> ExperimentConfig:
    return ExperimentConfig(
        representation="h3d623",
        mdm=MDMConfig(**TINY_MDM),
        train=TrainConfig(batch_size=8, log_period=1, ckpt_dir=str(tmp_path / "ckpt")),
        rvq_train=RVQTrainConfig(batch_size=8, body_part="lower"),
        rvq_width=32,
        rvq_depth=1,
        data=DataConfig(pose_length=64, mean_std_dir="/nonexistent"),
    )


def test_cache_has_h3d_features(h3d_cache):
    s = h3d_cache.get(0)
    assert s["h3d"].shape == (64, 623)
    assert np.isfinite(s["h3d"]).all()


def test_h3d_rvq_trainer(h3d_cache, tmp_path):
    cfg = h3d_config(tmp_path)
    trainer = RVQTrainer(cfg, h3d_cache)
    state = trainer.train(total_iters=2)
    assert int(state.step) == 2


def test_h3d_diffusion_trainer_with_prompts(h3d_cache, tmp_path):
    cfg = h3d_config(tmp_path)
    trainer = DiffusionTrainer(cfg, h3d_cache)
    metrics = trainer.train_epoch(0)
    assert np.isfinite(metrics["train/predict_x0_loss"])


def test_h3d_diffusion_trainer_with_tmr_prompt(h3d_cache, tmp_path):
    # self-supervised TMR motion embedding feeds the prompt channel
    from syntalker_tpu.models.tmr import ActorAgnosticEncoder, TMRConfig

    cfg = h3d_config(tmp_path)
    tcfg = TMRConfig(latent_dim=16, ff_size=32, num_layers=1, num_heads=2)
    enc = ActorAgnosticEncoder(tcfg, input_dim=623)
    tparams = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 623)))["params"]
    trainer = DiffusionTrainer(cfg, h3d_cache, tmr_motion=(enc, tparams))
    metrics = trainer.train_epoch(0)
    assert np.isfinite(metrics["train/predict_x0_loss"])


def test_h3d_decode_latents(tmp_path):
    from syntalker_tpu import generation as G
    from syntalker_tpu.models.rvqvae import create_rvqvae
    from syntalker_tpu.ops.quantize import rvq_forward

    cfg = h3d_config(tmp_path)
    # full-width latent (1536) modules for the slice arithmetic
    cfg = ExperimentConfig(
        **{**cfg.__dict__, "mdm": MDMConfig(**{**TINY_MDM, "latent_total_dim": 1536})}
    )
    rng = jax.random.PRNGKey(0)
    rvq_modules = {}
    for i, part in enumerate(("upper", "hands", "lower")):
        rcfg = _rvq_cfg(cfg, part)
        module, params, state = create_rvqvae(rcfg, jax.random.fold_in(rng, i))
        z = jax.random.normal(jax.random.fold_in(rng, 10 + i), (1, 16, 512))
        state = rvq_forward(z, state, rcfg.quantizer, train=True, rng=rng).state
        rvq_modules[part] = (module, params, state)

    latents = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 1536))
    out = G.decode_latents_h3d(
        latents, rvq_modules=rvq_modules, h3d_stats=identity_h3d_stats()
    )
    assert out["features"].shape == (2, 32, 623)
    assert out["joints"].shape == (2, 32, 52, 3)
    assert np.isfinite(np.asarray(out["joints"])).all()
