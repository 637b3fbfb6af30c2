"""Full eval-harness integration test: generate + FGD + BeatAlign + L1Div
on the shipped reference clip with tiny (but full-latent-width) models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syntalker_tpu.config import ExperimentConfig, body_part_rvq_config
from syntalker_tpu.data.cache import BeatCache, ClipConfig, preprocess_clip
from syntalker_tpu.data.stats import identity_pose_stats
from syntalker_tpu.diffusion.schedule import make_diffusion
from syntalker_tpu.eval.harness import GestureEvaluator
from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
from syntalker_tpu.models.eval_vae import EvalVAEConfig, VAESKConv
from syntalker_tpu.models.rvqvae import create_rvqvae
from syntalker_tpu.ops.quantize import RVQConfig, rvq_forward
from syntalker_tpu.ops.smplx import synthetic_smplx_model

NPZ = "/root/reference/demo/examples/2_scott_0_1_1.npz"
WAV = "/root/reference/demo/examples/2_scott_0_1_1.wav"


@pytest.fixture(scope="module")
def test_cache(tmp_path_factory):
    root = tmp_path_factory.mktemp("testcache")
    arrays = preprocess_clip(NPZ, WAV, None, None)
    keep = 10 * 30  # 10 s -> 2 generation windows
    arrays = {
        k: (v[:keep] if v.ndim and v.shape[0] >= keep and k != "audio" else v)
        for k, v in arrays.items()
    }
    arrays["audio"] = arrays["audio"][: 10 * 16000]
    cache = BeatCache(root)
    cache.add_clip("clip", arrays, ClipConfig(), is_test=True)
    cache.save_index()
    return cache


def test_full_eval(test_cache, tmp_path):
    rng = jax.random.PRNGKey(0)
    mdm_cfg = MDMConfig(
        latent_dim=32, ff_size=64, num_layers=1, num_heads=2, rope_heads=4,
        audio_feat_dim=16, word_feat_dim=16, word_embed_dim=8, vocab_size=64,
    )
    mdm, mdm_params = create_mdm(mdm_cfg, rng, frames=128)
    diffusion = make_diffusion(steps=4)

    q = RVQConfig(num_quantizers=2, nb_code=32, code_dim=512)
    rvq_modules = {}
    for i, part in enumerate(("upper", "hands", "lower")):
        rcfg = body_part_rvq_config(part, width=32, depth=1, quantizer=q)
        module, params, state = create_rvqvae(rcfg, jax.random.fold_in(rng, i))
        z = jax.random.normal(jax.random.fold_in(rng, 10 + i), (1, 64, 512))
        state = rvq_forward(z, state, q, train=True, rng=rng).state
        rvq_modules[part] = (module, params, state)

    eval_vae = VAESKConv(EvalVAEConfig())
    ev_params = eval_vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 330)))["params"]

    evaluator = GestureEvaluator(
        mdm=mdm,
        mdm_params=mdm_params,
        diffusion=diffusion,
        rvq_modules=rvq_modules,
        stats=identity_pose_stats(),
        eval_vae=eval_vae,
        eval_vae_params=ev_params,
        smplx_model=synthetic_smplx_model(),
        mean_velocity=np.full(55, 0.05, np.float32),
        sampler="ddim",
    )
    result = evaluator.evaluate(
        test_cache, jax.random.PRNGKey(2), out_dir=tmp_path / "results"
    )
    assert result.clips == 1
    assert np.isfinite(result.fid)
    assert np.isfinite(result.l1div) and result.l1div > 0
    assert np.isfinite(result.bc) and 0 <= result.bc <= 1
    # npz outputs exist and carry the expected keys
    res = np.load(tmp_path / "results" / "res_000.npz")
    assert res["poses"].shape[1] == 165
    assert res["trans"].shape[1] == 3
    gt = np.load(tmp_path / "results" / "gt_000.npz")
    # jaw must be copied from GT
    np.testing.assert_allclose(
        res["poses"][:, 66:69], gt["poses"][:, 66:69], atol=1e-6
    )


def test_batched_evaluate_matches_shapes(test_cache, tmp_path):
    """Bucketed batched generation path produces the same metric structure."""
    import jax

    from syntalker_tpu.config import body_part_rvq_config
    from syntalker_tpu.data.stats import identity_pose_stats
    from syntalker_tpu.diffusion.schedule import make_diffusion
    from syntalker_tpu.eval.harness import GestureEvaluator
    from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
    from syntalker_tpu.models.rvqvae import create_rvqvae
    from syntalker_tpu.ops.quantize import RVQConfig, rvq_forward

    rng = jax.random.PRNGKey(0)
    mdm_cfg = MDMConfig(
        latent_dim=32, ff_size=64, num_layers=1, num_heads=2, rope_heads=4,
        audio_feat_dim=16, word_feat_dim=16, word_embed_dim=8, vocab_size=64,
    )
    mdm, mdm_params = create_mdm(mdm_cfg, rng, frames=128)
    q = RVQConfig(num_quantizers=2, nb_code=32, code_dim=512)
    rvq_modules = {}
    for i, part in enumerate(("upper", "hands", "lower")):
        rcfg = body_part_rvq_config(part, width=32, depth=1, quantizer=q)
        module, params, state = create_rvqvae(rcfg, jax.random.fold_in(rng, i))
        z = jax.random.normal(rng, (1, 64, 512))
        state = rvq_forward(z, state, q, train=True, rng=rng).state
        rvq_modules[part] = (module, params, state)

    ev = GestureEvaluator(
        mdm=mdm, mdm_params=mdm_params, diffusion=make_diffusion(steps=4),
        rvq_modules=rvq_modules, stats=identity_pose_stats(), sampler="ddim",
    )
    # two identical-length samples -> one bucket of 2, each with its own key
    s = test_cache.get(0)
    keys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(1), i) for i in (0, 1)])
    outs = ev.evaluate_clips_batched([s, s], keys)
    assert len(outs) == 2
    assert outs[0]["rec_rot6d"].shape == outs[1]["rec_rot6d"].shape
    assert np.isfinite(outs[0]["rec_aa"]).all()
    assert np.isfinite(outs[1]["rec_aa"]).all()

    # protocol equivalence: each batched row must reproduce a sequential
    # evaluate_clip with that clip's key bitwise (DDIM eta=0; VERDICT #6)
    for i in range(2):
        seq = ev.evaluate_clip(s, keys[i])
        np.testing.assert_allclose(
            outs[i]["rec_rot6d"], seq["rec_rot6d"], atol=1e-5,
            err_msg=f"batched row {i} != sequential",
        )


def test_multiclip_batched_eval_full_metrics(tmp_path):
    """Multi-clip eval with mixed lengths: bucketing, batched generation,
    FGD over all clips, L1Div/BeatAlign via the synthetic SMPL-X."""
    import jax

    from syntalker_tpu.config import body_part_rvq_config
    from syntalker_tpu.data.cache import BeatCache, ClipConfig, preprocess_clip
    from syntalker_tpu.data.stats import identity_pose_stats
    from syntalker_tpu.diffusion.schedule import make_diffusion
    from syntalker_tpu.eval.harness import GestureEvaluator
    from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
    from syntalker_tpu.models.eval_vae import EvalVAEConfig, VAESKConv
    from syntalker_tpu.models.rvqvae import create_rvqvae
    from syntalker_tpu.ops.quantize import RVQConfig, rvq_forward
    from syntalker_tpu.ops.smplx import synthetic_smplx_model

    rng = jax.random.PRNGKey(0)
    arrays = preprocess_clip(NPZ, WAV, None, None)
    cache = BeatCache(tmp_path / "cache")
    # three "clips": two 5s (same bucket), one 9s (other bucket)
    for cid, sec in (("a", 5), ("b", 5), ("c", 9)):
        sl = {
            k: (v[: sec * 30] if v.ndim and v.shape[0] > 300 and k != "audio" else v)
            for k, v in arrays.items()
        }
        sl["audio"] = arrays["audio"][: sec * 16000]
        cache.add_clip(cid, sl, ClipConfig(), is_test=True)
    cache.save_index()
    assert len(cache) == 3

    mdm_cfg = MDMConfig(
        latent_dim=32, ff_size=64, num_layers=1, num_heads=2, rope_heads=4,
        audio_feat_dim=16, word_feat_dim=16, word_embed_dim=8, vocab_size=64,
    )
    mdm, mdm_params = create_mdm(mdm_cfg, rng, frames=128)
    q = RVQConfig(num_quantizers=2, nb_code=16, code_dim=512)
    rvq_modules = {}
    for i, part in enumerate(("upper", "hands", "lower")):
        rcfg = body_part_rvq_config(part, width=32, depth=1, quantizer=q)
        module, params, state = create_rvqvae(rcfg, jax.random.fold_in(rng, i))
        z = jax.random.normal(rng, (1, 32, 512))
        state = rvq_forward(z, state, q, train=True, rng=rng).state
        rvq_modules[part] = (module, params, state)
    eval_vae = VAESKConv(EvalVAEConfig())
    ev_params = eval_vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 330)))["params"]

    ev = GestureEvaluator(
        mdm=mdm, mdm_params=mdm_params, diffusion=make_diffusion(steps=4),
        rvq_modules=rvq_modules, stats=identity_pose_stats(),
        eval_vae=eval_vae, eval_vae_params=ev_params,
        smplx_model=synthetic_smplx_model(),
        mean_velocity=np.full(55, 0.05, np.float32),
        sampler="ddim",
    )
    result = ev.evaluate(cache, jax.random.PRNGKey(2), batch_clips=2)
    assert result.clips == 3
    assert np.isfinite(result.fid)
    assert np.isfinite(result.l1div)
    assert 0 <= result.bc <= 1


def test_mixed_length_bucket_metrics_equal_sequential(tmp_path):
    """VERDICT r2 #4: a mixed-length bucket must yield FGD/BC/L1Div
    IDENTICAL to sequential whole-clip eval (ref protocol test.py:72).

    Why truncate-to-shortest is lossless: every plan in a window-count
    bucket generates exactly n = seed_span + W*round_l frames (a function
    of num_windows only), and by construction n <= each clip's own trimmed
    n_frames — so normalizing input buffers to the bucket's shortest plan
    never removes data any window reads. This test proves it through the
    full metric pipeline on clips of 150 and 210 frames (same W=1 bucket,
    60-frame length difference)."""
    import jax

    from syntalker_tpu.config import body_part_rvq_config
    from syntalker_tpu.data.cache import BeatCache, ClipConfig, preprocess_clip
    from syntalker_tpu.data.stats import identity_pose_stats
    from syntalker_tpu.diffusion.schedule import make_diffusion
    from syntalker_tpu.eval.harness import GestureEvaluator
    from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
    from syntalker_tpu.models.eval_vae import EvalVAEConfig, VAESKConv
    from syntalker_tpu.models.rvqvae import create_rvqvae
    from syntalker_tpu.ops.quantize import RVQConfig, rvq_forward
    from syntalker_tpu.ops.smplx import synthetic_smplx_model

    rng = jax.random.PRNGKey(0)
    arrays = preprocess_clip(NPZ, WAV, None, None)
    cache = BeatCache(tmp_path / "cache")
    # 5 s (150 frames) and 7 s (210 frames): both (n-16)//112 == 1 window,
    # true lengths differ by 60 frames
    for cid, sec in (("short", 5), ("long", 7)):
        nf = sec * 30
        sl = {
            k: (v[:nf] if v.ndim and v.shape[0] > 300 and k != "audio" else v)
            for k, v in arrays.items()
        }
        sl["audio"] = arrays["audio"][: sec * 16000]
        cache.add_clip(cid, sl, ClipConfig(), is_test=True)
    cache.save_index()

    mdm_cfg = MDMConfig(
        latent_dim=32, ff_size=64, num_layers=1, num_heads=2, rope_heads=4,
        audio_feat_dim=16, word_feat_dim=16, word_embed_dim=8, vocab_size=64,
    )
    mdm, mdm_params = create_mdm(mdm_cfg, rng, frames=128)
    q = RVQConfig(num_quantizers=2, nb_code=16, code_dim=512)
    rvq_modules = {}
    for i, part in enumerate(("upper", "hands", "lower")):
        rcfg = body_part_rvq_config(part, width=32, depth=1, quantizer=q)
        module, params, state = create_rvqvae(rcfg, jax.random.fold_in(rng, i))
        z = jax.random.normal(rng, (1, 32, 512))
        state = rvq_forward(z, state, q, train=True, rng=rng).state
        rvq_modules[part] = (module, params, state)
    eval_vae = VAESKConv(EvalVAEConfig())
    ev_params = eval_vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 330)))["params"]

    def make_ev():
        return GestureEvaluator(
            mdm=mdm, mdm_params=mdm_params, diffusion=make_diffusion(steps=4),
            rvq_modules=rvq_modules, stats=identity_pose_stats(),
            eval_vae=eval_vae, eval_vae_params=ev_params,
            smplx_model=synthetic_smplx_model(),
            mean_velocity=np.full(55, 0.05, np.float32),
            sampler="ddim",
        )

    seq = make_ev().evaluate(cache, jax.random.PRNGKey(2), batch_clips=1)
    bat = make_ev().evaluate(cache, jax.random.PRNGKey(2), batch_clips=2)
    assert seq.clips == bat.clips == 2
    np.testing.assert_allclose(bat.fid, seq.fid, rtol=1e-5)
    np.testing.assert_allclose(bat.bc, seq.bc, rtol=1e-6)
    np.testing.assert_allclose(bat.l1div, seq.l1div, rtol=1e-6)
