"""HumanML3D representation + TMR align-space tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from syntalker_tpu.data import h3d
from syntalker_tpu.models.tmr import (
    ActorAgnosticEncoder,
    DistilbertTextEncoder,
    TextPipeline,
    TMRConfig,
    embed_prompts,
    info_nce,
    make_tmr_train_step,
)


class TestH3DLayout:
    def test_part_masks_match_reference_dims(self):
        assert h3d.part_mask_623("upper").shape == (156,)
        assert h3d.part_mask_623("hands").shape == (360,)
        assert h3d.part_mask_623("lower").shape == (107,)

    def test_masks_disjoint_and_cover(self):
        m = np.zeros(623, int)
        for p in ("upper", "hands", "lower"):
            m[h3d.part_mask_623(p)] += 1
        assert m.max() == 1
        assert m.sum() == 156 + 360 + 107 == 623

    def test_recover_static_pose(self):
        # zero velocities + fixed local offsets -> constant joint positions
        t, j = 8, 52
        feats = np.zeros((t, 623), np.float32)
        local = np.random.default_rng(0).normal(size=(j - 1, 3)).astype(np.float32)
        feats[:, 4 : 4 + 51 * 3] = local.reshape(-1)
        feats[:, 3] = 0.9  # root height
        pos = np.asarray(h3d.recover_from_ric(jnp.asarray(feats)))
        assert pos.shape == (t, 52, 3)
        np.testing.assert_allclose(pos[0], pos[-1], atol=1e-5)
        np.testing.assert_allclose(pos[:, 0, 1], 0.9, atol=1e-6)

    def test_recover_integrates_forward_velocity(self):
        t = 10
        feats = np.zeros((t, 623), np.float32)
        feats[:, 1] = 0.1  # +x velocity in root frame, no rotation
        pos = np.asarray(h3d.recover_from_ric(jnp.asarray(feats)))
        np.testing.assert_allclose(pos[-1, 0, 0], 0.1 * (t - 1), atol=1e-5)

    def test_build_recover_roundtrip_positions(self):
        # construct features from synthetic joints; recover must match the
        # original global positions
        rng = np.random.default_rng(1)
        t = 12
        joints = np.zeros((t, 52, 3), np.float32)
        joints[:, 0] = np.cumsum(rng.normal(0, 0.01, (t, 3)), 0)
        joints[:, 0, 1] = 0.9
        # put hips in sane spots so the heading is well defined
        joints[:, 1] = joints[:, 0] + [0.1, -0.05, 0]
        joints[:, 2] = joints[:, 0] + [-0.1, -0.05, 0]
        for j in range(3, 52):
            joints[:, j] = joints[:, 0] + rng.normal(0, 0.3, 3)
        rot6d = np.tile(
            np.array([1, 0, 0, 0, 1, 0], np.float32), (t, 51, 1)
        )
        feats = h3d.build_h3d_features(
            jnp.asarray(joints), jnp.asarray(rot6d), jnp.zeros((t, 4))
        )
        assert feats.shape == (t, 623)
        rec = np.asarray(h3d.recover_from_ric(feats))
        np.testing.assert_allclose(rec[:, 0, 1], joints[:, 0, 1], atol=1e-4)
        # exact roundtrip up to the xz canonicalization (start at origin)
        canonical = joints - joints[0, 0] * np.array([1.0, 0, 1.0], np.float32)
        np.testing.assert_allclose(rec, canonical, atol=1e-4)


class TestTMR:
    def test_motion_encoder_shapes(self):
        cfg = TMRConfig(latent_dim=32, ff_size=64, num_layers=2, num_heads=2)
        enc = ActorAgnosticEncoder(cfg, input_dim=623)
        x = jnp.zeros((2, 16, 623))
        params = enc.init(jax.random.PRNGKey(0), x)["params"]
        mu, logvar = enc.apply({"params": params}, x)
        assert mu.shape == (2, 32) and logvar.shape == (2, 32)

    def test_mask_hides_padding(self):
        cfg = TMRConfig(latent_dim=32, ff_size=64, num_layers=1, num_heads=2)
        enc = ActorAgnosticEncoder(cfg, input_dim=8)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 10, 8))
        params = enc.init(jax.random.PRNGKey(0), x, jnp.ones((1, 10)))["params"]
        mask = jnp.asarray([[1.0] * 5 + [0.0] * 5])
        mu1, _ = enc.apply({"params": params}, x, mask)
        x2 = x.at[:, 5:].set(99.0)  # garbage in the masked region
        mu2, _ = enc.apply({"params": params}, x2, mask)
        np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), atol=1e-5)

    def test_text_pipeline_fallback(self):
        pipe = TextPipeline(TMRConfig(latent_dim=32, ff_size=64, num_layers=1, num_heads=2))
        e = pipe.embed(["wave your hands", "walk in a circle"])
        assert e.shape == (2, 32)
        e2 = pipe.embed(["wave your hands"])
        np.testing.assert_allclose(np.asarray(e[0]), np.asarray(e2[0]), atol=1e-5)

    def test_embed_prompts_none_passthrough(self):
        pipe = TextPipeline(TMRConfig(latent_dim=16, ff_size=32, num_layers=1, num_heads=2))
        out = embed_prompts(None, {"upper": "raise arms", "hands": None, "lower": ""}, pipe)
        assert out["hands"] is None and out["lower"] is None
        assert out["upper"].shape == (1, 16)

    def test_info_nce_perfect_alignment_low(self):
        e = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
        aligned = float(info_nce(e, e))
        shuffled = float(info_nce(e, jnp.roll(e, 1, axis=0)))
        assert aligned < shuffled

    def test_tmr_train_step_decreases_loss(self):
        cfg = TMRConfig(latent_dim=16, ff_size=32, num_layers=1, num_heads=2, motion_feats=24, text_feats=12)
        text = DistilbertTextEncoder(cfg)
        motion = ActorAgnosticEncoder(cfg, input_dim=24)
        rng = jax.random.PRNGKey(0)
        batch = {
            "text_hidden": jax.random.normal(rng, (8, 6, 12)),
            "text_mask": jnp.ones((8, 6)),
            "motion": jax.random.normal(jax.random.fold_in(rng, 1), (8, 16, 24)),
        }
        params = {
            "text": text.init(rng, batch["text_hidden"], batch["text_mask"])["params"],
            "motion": motion.init(rng, batch["motion"])["params"],
        }
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        step = jax.jit(make_tmr_train_step(text, motion, opt))
        losses = []
        for i in range(30):
            params, opt_state, metrics = step(params, opt_state, batch, rng)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
