"""End-to-end windowed generation tests: window plan arithmetic (must match
the reference trainer's), autoregressive scan, latent decode path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syntalker_tpu import generation as G
from syntalker_tpu.data import joints as J
from syntalker_tpu.data.stats import identity_pose_stats
from syntalker_tpu.diffusion.schedule import make_diffusion
from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
from syntalker_tpu.models.rvqvae import RVQVAEConfig, create_rvqvae
from syntalker_tpu.ops.quantize import RVQConfig


class TestWindowPlan:
    def test_reference_clip_arithmetic(self):
        # the shipped demo clip: 1906 frames -> trim 1904, 16 windows,
        # 1808 output frames (452 latent) — mirrors trainer :375-501
        plan = G.plan_windows(1906)
        assert plan.n_frames == 1904
        assert plan.num_windows == (1904 - 16) // 112 == 16
        assert plan.latent_window == 32
        assert plan.out_latent_frames == 32 + 15 * 28 == 452
        assert plan.out_latent_frames * 4 == 1808

    def test_single_window(self):
        plan = G.plan_windows(128)
        assert plan.num_windows == 1
        assert plan.out_latent_frames == 32

    def test_too_short_raises(self):
        with pytest.raises(ValueError):
            G.plan_windows(100)

    def test_window_slicing_shapes(self):
        plan = G.plan_windows(256)  # 2 windows of 128, stride 112
        audio = np.zeros((2, 16000 // 30 * 256, 2), np.float32)
        words = np.zeros((2, 256), np.int64)
        aw = G.window_audio(audio, plan)
        ww = G.window_words(words, plan)
        assert aw.shape == (2, 2, 533 * 128, 2)
        assert ww.shape == (2, 2, 128)


TINY_MDM = MDMConfig(
    latent_total_dim=J.LATENT_DIM,  # full 1536 so slices work
    latent_dim=32,
    ff_size=64,
    num_layers=1,
    num_heads=2,
    rope_heads=4,
    audio_feat_dim=16,
    word_feat_dim=16,
    word_embed_dim=8,
    vocab_size=50,
)


@pytest.fixture(scope="module")
def tiny_stack():
    mdm, mdm_params = create_mdm(TINY_MDM, jax.random.PRNGKey(0), frames=128)
    diffusion = make_diffusion(steps=8)
    return mdm, mdm_params, diffusion


class TestSampleWindows:
    def test_autoregressive_shapes_and_determinism(self, tiny_stack):
        mdm, params, diffusion = tiny_stack
        plan = G.plan_windows(240)  # 2 windows
        b = 1
        audio = np.random.default_rng(0).normal(size=(b, 533 * 240, 2)).astype(np.float32)
        words = np.zeros((b, 240), np.int32)
        aw = jnp.asarray(G.window_audio(audio, plan))
        ww = jnp.asarray(G.window_words(words, plan))
        seed = jnp.zeros((b, plan.pre_frames, J.LATENT_DIM))
        out1 = G.sample_windows(
            mdm, params, diffusion, plan, aw, ww, seed, jax.random.PRNGKey(7)
        )
        out2 = G.sample_windows(
            mdm, params, diffusion, plan, aw, ww, seed, jax.random.PRNGKey(7)
        )
        assert out1.shape == (b, plan.out_latent_frames, J.LATENT_DIM)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_lean_sampler_matches_ddim(self, tiny_stack):
        """sample_windows_lean's algebraic folds (input_process ∘ W2_mid as
        one matmul, per-schedule style rows, two-coefficient DDIM update)
        are exact up to f32 re-association — parity with the reference
        ddim path must be tight, unlike the bf16-weight Pallas bounds."""
        mdm, params, diffusion = tiny_stack
        plan = G.plan_windows(240)  # 2 windows: exercises the seed carry
        b = 2
        g = np.random.default_rng(3)
        audio = g.normal(0, 0.1, (b, 533 * 240, 2)).astype(np.float32)
        words = np.zeros((b, 240), np.int32)
        aw = jnp.asarray(G.window_audio(audio, plan))
        ww = jnp.asarray(G.window_words(words, plan))
        seed = jnp.asarray(g.normal(size=(b, plan.pre_frames, J.LATENT_DIM)), jnp.float32)
        key = jax.random.PRNGKey(11)
        ref = G.sample_windows(
            mdm, params, diffusion, plan, aw, ww, seed, key, sampler="ddim"
        )
        lean = G.sample_windows_lean(
            mdm, params, diffusion, plan, aw, ww, seed, key
        )
        assert lean.shape == ref.shape
        err = float(jnp.abs(lean - ref).max())
        assert err < 1e-3, err

    def test_bodypart_cfg_path_runs(self, tiny_stack):
        mdm0, _, diffusion = tiny_stack
        cfg = MDMConfig(**{**TINY_MDM.__dict__, "use_prompt": True, "prompt_dim": 8})
        mdm, params = create_mdm(cfg, jax.random.PRNGKey(1), frames=128)
        plan = G.plan_windows(128)
        b = 1
        aw = jnp.zeros((1, b, 533 * 128, 2))
        ww = jnp.zeros((1, b, 128), jnp.int32)
        seed = jnp.zeros((b, plan.pre_frames, J.LATENT_DIM))
        out = G.sample_windows(
            mdm, params, diffusion, plan, aw, ww, seed, jax.random.PRNGKey(2),
            sampler="ddim",
            prompts={"upper": jnp.ones((b, 8)), "hands": None, "lower": None},
        )
        assert out.shape == (b, 32, J.LATENT_DIM)
        assert np.isfinite(np.asarray(out)).all()


class TestDecodeLatents:
    def test_decode_shapes_and_trans_integration(self):
        rng = jax.random.PRNGKey(0)
        q = RVQConfig(num_quantizers=2, nb_code=16, code_dim=512)
        rvq_modules = {}
        for name, dim in [("upper", 78), ("hands", 180), ("lower", 57)]:
            cfg = RVQVAEConfig(input_dim=dim, width=32, depth=1, quantizer=q)
            module, params, state = create_rvqvae(cfg, jax.random.fold_in(rng, hash(name) % 1000))
            # give codebooks nonzero values so decode is nontrivial
            from syntalker_tpu.ops.quantize import rvq_forward
            z = jax.random.normal(rng, (2, 8, 512))
            state = rvq_forward(z, state, q, train=True, rng=rng).state
            rvq_modules[name] = (module, params, state)

        latents = jax.random.normal(jax.random.PRNGKey(3), (2, 8, J.LATENT_DIM))
        out = G.decode_latents(
            latents, rvq_modules=rvq_modules, stats=identity_pose_stats()
        )
        b, t = 2, 32  # 8 latent frames x4 upsample
        assert out["rot6d"].shape == (b, t, 330)
        assert out["axis_angle"].shape == (b, t, 165)
        assert out["trans"].shape == (b, t, 3)
        assert out["parts"]["upper"].shape == (b, t, 78)
        # translation x/z are cumulative sums of velocity; check monotone
        # accumulation property on a constant-velocity latent is hard with a
        # random decoder, so just check finiteness + jaw slice untouched
        assert np.isfinite(np.asarray(out["trans"])).all()
        aa = np.asarray(out["axis_angle"])
        assert np.all(aa[..., 66:69] == 0)  # jaw left for caller

    def test_trans_cumsum_semantics(self):
        # directly verify the x/z cumsum + y passthrough rule
        v = jnp.asarray(np.tile([[1.0, 2.0, 3.0]], (4, 1))[None])  # (1,4,3)
        trans = jnp.cumsum(v, axis=-2).at[..., 1].set(v[..., 1])
        expect_x = np.array([1, 2, 3, 4], np.float32)
        np.testing.assert_allclose(np.asarray(trans[0, :, 0]), expect_x)
        np.testing.assert_allclose(np.asarray(trans[0, :, 1]), 2.0)
        np.testing.assert_allclose(np.asarray(trans[0, :, 2]), expect_x * 3)


def test_conditioning_margin_artifact():
    """The probe artifact (scripts/probe_conditioning.py on the overfit
    checkpoints) must show conditional sampling beating unconditional by a
    clear margin, and true alignment beating shuffled audio (VERDICT #4).
    Skips when the training artifacts haven't been produced in this
    environment."""
    import json
    from pathlib import Path

    outputs = Path(__file__).parent.parent / "outputs"
    candidates = [
        outputs / d / "probe_cond_ddim.json" for d in ("smoke_xl_r2", "smoke_xl")
    ]
    art = next((p for p in candidates if p.exists()), None)
    if art is None:
        import pytest

        pytest.skip("probe artifact not present (run scripts/probe_conditioning.py)")
    r = json.loads(art.read_text())
    # invariants, not absolute values: true-audio generation must beat both
    # controls (shuffled audio = alignment matters; uncond = conditioning
    # matters) and land well below an unconditional draw's MSE (=gt var).
    # Round-1 thresholds assumed a pathological uncond branch (margin 5.9);
    # the init-fixed model handles the null branch gracefully (margin ~0.4)
    # while the alignment margin grew 0.15 -> 0.64.
    assert r["margin_uncond"] > 0.1, f"uncond margin collapsed: {r}"
    assert r["margin_shuffled"] > 0.1, f"alignment margin collapsed: {r}"
    assert r["true_audio"] < 0.75 * r["gt_latent_var"], f"conditional MSE too high: {r}"
