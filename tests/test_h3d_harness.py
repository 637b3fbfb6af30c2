"""H3D evaluation harness integration test (tiny models, synthetic SMPL-X,
2 replications of the full protocol incl. prompted generation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syntalker_tpu.data.cache import BeatCache, ClipConfig, preprocess_clip
from syntalker_tpu.data.stats import identity_h3d_stats
from syntalker_tpu.diffusion.schedule import make_diffusion
from syntalker_tpu.eval import t2m
from syntalker_tpu.eval.harness_h3d import H3DEvaluator
from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
from syntalker_tpu.models.rvqvae import RVQVAEConfig, create_rvqvae
from syntalker_tpu.models.tmr import TextPipeline, TMRConfig
from syntalker_tpu.ops.quantize import RVQConfig, rvq_forward
from syntalker_tpu.ops.smplx import synthetic_smplx_model

NPZ = "/root/reference/demo/examples/2_scott_0_1_1.npz"
WAV = "/root/reference/demo/examples/2_scott_0_1_1.wav"


@pytest.fixture(scope="module")
def h3d_test_cache(tmp_path_factory):
    root = tmp_path_factory.mktemp("h3dtest")
    arrays = preprocess_clip(NPZ, WAV, None, None, smplx_model=synthetic_smplx_model())
    keep = 6 * 30
    arrays = {
        k: (v[:keep] if v.ndim and v.shape[0] > keep and k != "audio" else v)
        for k, v in arrays.items()
    }
    arrays["audio"] = arrays["audio"][: 6 * 16000]
    cache = BeatCache(root)
    cache.add_clip("clip", arrays, ClipConfig(), is_test=True)
    cache.save_index()
    return cache


@pytest.fixture(scope="module")
def evaluator():
    rng = jax.random.PRNGKey(0)
    mdm_cfg = MDMConfig(
        latent_dim=32, ff_size=64, num_layers=1, num_heads=2, rope_heads=4,
        audio_feat_dim=16, word_feat_dim=16, word_embed_dim=8, vocab_size=64,
        use_prompt=True, prompt_dim=16,
    )
    mdm, mdm_params = create_mdm(mdm_cfg, rng, frames=128)
    diffusion = make_diffusion(steps=16, timestep_respacing="ddim4")

    from syntalker_tpu.data.h3d import H3D_PART_DIMS

    q = RVQConfig(num_quantizers=2, nb_code=16, code_dim=512)
    rvq_modules = {}
    for i, part in enumerate(("upper", "hands", "lower")):
        rcfg = RVQVAEConfig(input_dim=H3D_PART_DIMS[part], width=32, depth=1, quantizer=q)
        module, params, state = create_rvqvae(rcfg, jax.random.fold_in(rng, i))
        z = jax.random.normal(jax.random.fold_in(rng, 10 + i), (1, 32, 512))
        state = rvq_forward(z, state, q, train=True, rng=rng).state
        rvq_modules[part] = (module, params, state)

    oracle = t2m.T2MEvaluator(
        t2m.T2MEvalConfig(dim_movement=16, dim_coemb=16, hidden=16)
    )
    pipe = TextPipeline(TMRConfig(latent_dim=16, ff_size=32, num_layers=1, num_heads=2))
    return H3DEvaluator(
        mdm=mdm,
        mdm_params=mdm_params,
        diffusion=diffusion,
        rvq_modules=rvq_modules,
        h3d_stats=identity_h3d_stats(),
        text_pipeline=pipe,
        t2m_evaluator=oracle,
    )


def test_prompted_generation(evaluator, h3d_test_cache):
    sample = h3d_test_cache.get(0)
    out = evaluator.generate_clip(
        sample,
        jax.random.PRNGKey(1),
        prompts={"upper": "wave hands", "hands": None, "lower": None},
    )
    assert out["features"].shape[1] == 623
    assert out["joints"].shape[1:] == (52, 3)
    assert np.isfinite(out["features"]).all()


def test_replication_protocol(evaluator, h3d_test_cache):
    results = evaluator.evaluate(
        h3d_test_cache, jax.random.PRNGKey(2), replications=2, diversity_times=1
    )
    assert "fid" in results and "diversity" in results
    mean, ci = results["fid"]
    assert np.isfinite(mean)


def test_steering_metrics(evaluator, h3d_test_cache):
    """The tracked steering numbers (VERDICT r3 #9) compute and have the
    right structure on a tiny model: a finite gain (sign untestable on
    random weights) and positive part-change/leakage ratios."""
    from syntalker_tpu.data.captions import caption_batch
    from syntalker_tpu.data.h3d import recover_from_ric

    feats = h3d_test_cache.get(0)["h3d"]
    joints = np.asarray(recover_from_ric(jnp.asarray(feats[None])))
    we, po, ln, caps = caption_batch(joints)
    out = evaluator.steering_metrics(
        h3d_test_cache, jax.random.PRNGKey(3),
        captions=[caps[0].text],
        text_features=[{"word_embs": we, "pos_ohot": po, "cap_lens": ln}],
        max_clips=1,
    )
    assert out["steering_clips"] == 1
    assert np.isfinite(out["steering_prompt_gain"])
    assert out["steering_prompted_part_rel_change"] >= 0
    assert out["steering_offpart_leakage"] >= 0
