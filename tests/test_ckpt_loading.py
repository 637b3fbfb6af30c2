"""Checkpoint save → partial (raw) restore into inference stacks."""

import jax
import jax.numpy as jnp
import numpy as np

from syntalker_tpu.config import DataConfig, ExperimentConfig, RVQTrainConfig, TrainConfig
from syntalker_tpu.models.denoiser import MDMConfig


def test_rvq_ckpt_roundtrip_into_stack(tmp_path):
    from syntalker_tpu.data.cache import BeatCache, ClipConfig, preprocess_clip
    from syntalker_tpu.train.loop import RVQTrainer, load_rvq_stack

    arrays = preprocess_clip(
        "/root/reference/demo/examples/2_scott_0_1_1.npz",
        "/root/reference/demo/examples/2_scott_0_1_1.wav",
        None,
        None,
    )
    arrays = {k: (v[:480] if v.ndim and v.shape[0] > 480 and k != "audio" else v) for k, v in arrays.items()}
    arrays["audio"] = arrays["audio"][: 16 * 16000]
    cache = BeatCache(tmp_path / "c")
    cache.add_clip("clip", arrays, ClipConfig(pose_length=64, stride=32), is_test=False)
    cache.save_index()

    cfg = ExperimentConfig(
        mdm=MDMConfig(
            latent_total_dim=48, latent_dim=32, ff_size=64, num_layers=1,
            num_heads=2, rope_heads=4, audio_feat_dim=16, word_feat_dim=16,
            word_embed_dim=8, vocab_size=64,
        ),
        train=TrainConfig(batch_size=8, ckpt_dir=str(tmp_path / "ckpt")),
        rvq_train=RVQTrainConfig(batch_size=8, body_part="upper", save_every=10**9),
        rvq_width=32,
        rvq_depth=1,
        data=DataConfig(mean_std_dir="/nonexistent"),
    )
    trainer = RVQTrainer(cfg, cache)
    trainer.train(total_iters=2)
    path = trainer.save(2)

    cfg2 = ExperimentConfig(**{**cfg.__dict__, "rvq_ckpts": (str(path),)})
    stack = load_rvq_stack(cfg2, jax.random.PRNGKey(0))
    _mod, params, qstate = stack["upper"]
    assert bool(qstate.initialized)
    # loaded params match the trained ones
    trained = jax.device_get(trainer.state.params)
    loaded_leaf = jax.tree.leaves(params)[0]
    trained_leaf = jax.tree.leaves(trained)[0]
    np.testing.assert_allclose(np.asarray(loaded_leaf), np.asarray(trained_leaf))
    np.testing.assert_allclose(
        np.asarray(qstate.codebook),
        np.asarray(jax.device_get(trainer.state.quantizer_state.codebook)),
    )


def test_load_checkpoint_raw_returns_device_arrays(tmp_path):
    """Restored leaves must be jax arrays: numpy leaves break traced
    indexing inside jit (word_embedding[word] in the sampler raised
    TracerArrayConversionError when the generate CLI loaded a checkpoint —
    caught by driving cli.generate end-to-end with trained weights)."""
    import jax
    import jax.numpy as jnp
    import optax

    from syntalker_tpu.train import state as ts

    params = {"table": jnp.arange(12.0).reshape(4, 3)}
    st = ts.create_train_state(params, optax.adam(1e-3), jax.random.PRNGKey(0))
    path = ts.save_checkpoint(tmp_path / "ck", st, 0)
    raw = ts.load_checkpoint_raw(path)
    leaf = raw["params"]["table"]
    assert isinstance(leaf, jax.Array), type(leaf)

    # the failing pattern: index a restored table with a traced int array
    @jax.jit
    def gather(idx):
        return raw["params"]["table"][idx]

    out = gather(jnp.asarray([[0, 2]]))
    assert out.shape == (1, 2, 3)


def test_load_model_variables_preserves_batch_stats(tmp_path):
    """A BN-trained checkpoint (audio_norm='batch') must come back as full
    variables — loading only ["params"] loses batch_stats and inference
    applies with use_running_average=True then raise (ADVICE r2 medium).
    The shipped CLIs load via load_model_variables for exactly this reason."""
    import jax
    from syntalker_tpu.models.denoiser import create_mdm, mdm_variables
    from syntalker_tpu.train import state as ts

    cfg = MDMConfig(
        latent_total_dim=48, latent_dim=32, ff_size=64, num_layers=1,
        num_heads=2, rope_heads=4, audio_feat_dim=16, word_feat_dim=16,
        word_embed_dim=8, vocab_size=32, audio_norm="batch",
    )
    module, variables = create_mdm(cfg, jax.random.PRNGKey(0), frames=32)
    assert "batch_stats" in variables

    opt = ts.make_diffusion_optimizer()
    state = ts.create_train_state(variables, opt, jax.random.PRNGKey(1))
    path = ts.save_checkpoint(tmp_path / "ckpt", state, step=0)

    loaded = ts.load_model_variables(path)
    assert "batch_stats" in loaded, "batch_stats dropped on load"

    # inference apply in eval mode must work (this raised before the fix)
    out = module.apply(
        mdm_variables(loaded),
        jnp.zeros((1, 8, 48)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 533 * 32, 2)),
        jnp.zeros((1, 32), jnp.int32),
        jnp.zeros((1, 4, 48)),
    )
    assert np.all(np.isfinite(np.asarray(out)))


def test_load_model_variables_bare_params(tmp_path):
    """Converted reference checkpoints are bare param trees — accept them."""
    import jax
    from syntalker_tpu.train import state as ts

    cfg = MDMConfig(
        latent_total_dim=48, latent_dim=32, ff_size=64, num_layers=1,
        num_heads=2, rope_heads=4, audio_feat_dim=16, word_feat_dim=16,
        word_embed_dim=8, vocab_size=32,
    )
    from syntalker_tpu.models.denoiser import create_mdm

    _, params = create_mdm(cfg, jax.random.PRNGKey(0), frames=32)
    opt = ts.make_diffusion_optimizer()
    state = ts.create_train_state(params, opt, jax.random.PRNGKey(1))
    path = ts.save_checkpoint(tmp_path / "ckpt", state, step=0)
    loaded = ts.load_model_variables(path)
    assert set(loaded) == {"params"}


def test_migrate_legacy_flat_qkv_kernels():
    """Pre-round-3 checkpoints stored the fused qkv kernel flat, (L, C, 3C);
    the head-aligned layout is the same memory in C-order, so migration is a
    pure reshape and the denoiser output must be bitwise-unchanged."""
    import jax
    import jax.numpy as jnp

    from syntalker_tpu.models.denoiser import create_mdm, migrate_qkv_kernels

    cfg = MDMConfig(
        latent_total_dim=48, latent_dim=32, ff_size=64, num_layers=2,
        num_heads=2, rope_heads=4, audio_feat_dim=16, word_feat_dim=16,
        word_embed_dim=8, vocab_size=32,
    )
    module, params = create_mdm(cfg, jax.random.PRNGKey(0), frames=32)
    kern = params["blocks"]["block"]["qkv"]["kernel"]
    assert kern.shape == (2, 32, 3, 2, 16)

    # forge a legacy checkpoint tree with the flat layout
    legacy = jax.tree.map(lambda x: x, params)
    legacy["blocks"]["block"]["qkv"]["kernel"] = kern.reshape(2, 32, 96)

    migrated = migrate_qkv_kernels(legacy, cfg.num_heads)
    assert migrated["blocks"]["block"]["qkv"]["kernel"].shape == kern.shape
    assert bool(jnp.all(migrated["blocks"]["block"]["qkv"]["kernel"] == kern))
    # idempotent on already-migrated trees, and works wrapped in variables
    again = migrate_qkv_kernels({"params": migrated}, cfg.num_heads)
    assert again["params"]["blocks"]["block"]["qkv"]["kernel"].shape == kern.shape

    args = (
        jnp.ones((1, 8, 48)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 533 * 32, 2)), jnp.zeros((1, 32), jnp.int32),
        jnp.zeros((1, 4, 48)),
    )
    a = module.apply({"params": params}, *args)
    b = module.apply({"params": migrated}, *args)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
