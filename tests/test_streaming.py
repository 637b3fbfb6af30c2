"""StreamingMotionSession: chunked streaming vs the offline batch pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syntalker_tpu import generation as G
from syntalker_tpu.data import joints as J
from syntalker_tpu.data.stats import identity_pose_stats
from syntalker_tpu.diffusion.schedule import make_diffusion
from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
from syntalker_tpu.config import body_part_rvq_config
from syntalker_tpu.models.rvqvae import create_rvqvae
from syntalker_tpu.ops.quantize import RVQConfig, rvq_forward
from syntalker_tpu.streaming import StreamingMotionSession


@pytest.fixture(scope="module")
def stack():
    rng = jax.random.PRNGKey(0)
    cfg = MDMConfig(
        latent_dim=32, ff_size=64, num_layers=2, num_heads=2,
        rope_heads=4, audio_feat_dim=16, word_feat_dim=16,
        word_embed_dim=8, vocab_size=64,
    )
    mdm, params = create_mdm(cfg, rng, frames=128)
    q = RVQConfig(num_quantizers=2, nb_code=16, code_dim=512)
    rvq = {}
    for i, part in enumerate(("upper", "hands", "lower")):
        rcfg = body_part_rvq_config(part, width=32, depth=1, quantizer=q)
        module, p, state = create_rvqvae(rcfg, jax.random.fold_in(rng, i))
        z = jax.random.normal(rng, (1, 32, 512))
        state = rvq_forward(z, state, q, train=True, rng=rng).state
        rvq[part] = (module, p, state)
    diffusion = make_diffusion(steps=100, timestep_respacing="ddim4")
    return mdm, params, diffusion, rvq


def _make_session(stack, **kw):
    mdm, params, diffusion, rvq = stack
    return StreamingMotionSession(
        mdm=mdm, mdm_params=params, diffusion=diffusion, rvq_modules=rvq,
        stats=identity_pose_stats(), rng=jax.random.PRNGKey(7), **kw,
    )


def _offline(stack, audio_feats, n_frames, key):
    mdm, params, diffusion, rvq = stack
    plan = G.plan_windows(n_frames)
    aw = jnp.asarray(G.window_audio(audio_feats[None], plan))
    ww = jnp.asarray(G.window_words(np.zeros((1, n_frames), np.int32), plan))
    seed0 = jnp.zeros((1, plan.pre_frames, J.LATENT_DIM))
    lat = G.sample_windows_lean(mdm, params, diffusion, plan, aw, ww, seed0, key)
    return G.decode_latents(lat, rvq_modules=rvq, stats=identity_pose_stats())


class TestStreaming:
    def test_streamed_matches_offline(self, stack):
        """240-frame clip (2 windows) pushed in ragged chunks must match
        the offline sample_windows_lean + decode_latents pipeline: same
        RNG chain (latents identical), decode differing only by the
        finite lookback/lookahead margins."""
        n_frames = 240
        g = np.random.default_rng(0)
        feats = g.normal(0, 0.1, (533 * n_frames, 2)).astype(np.float32)

        off = _offline(stack, feats, n_frames, jax.random.PRNGKey(7))
        off_aa = np.asarray(off["axis_angle"][0])
        off_tr = np.asarray(off["trans"][0])

        sess = _make_session(stack)
        segs = []
        pos = 0
        for sz in (5000, 12345, 40000, 33333, 10**9):  # ragged chunks
            segs += sess.push_audio(feats[pos : pos + sz])
            pos = min(pos + sz, len(feats))
            if pos >= len(feats):
                break
        segs += sess.finish()

        aa = np.concatenate([s["axis_angle"] for s in segs])
        tr = np.concatenate([s["trans"] for s in segs])
        assert aa.shape == off_aa.shape, (aa.shape, off_aa.shape)
        # frame_start bookkeeping is gapless
        starts = [s["frame_start"] for s in segs]
        lens = [len(s["axis_angle"]) for s in segs]
        assert starts[0] == 0
        assert all(
            starts[i] == starts[i - 1] + lens[i - 1] for i in range(1, len(segs))
        )
        # decode margins: measured decoder influence is <=7e-3 of output
        # scale beyond 8 latent frames (module docstring); axis-angle is
        # O(1) scale here
        assert np.abs(aa - off_aa).max() < 5e-2
        # translation carry reproduces the global cumsum
        assert np.abs(tr - off_tr).max() < 1e-3 * max(1.0, np.abs(off_tr).max())

    def test_streamed_prompted_matches_offline(self):
        """The full control surface streams (VERDICT r3 #5): body-part CFG
        prompts + MotionCLIP style through the per-window batched-branch
        program must match the offline prompted sampler
        (sample_windows(prompts=..., style=...)) exactly on latents, with
        the same decode margins as the lean path."""
        rng = jax.random.PRNGKey(0)
        cfg = MDMConfig(
            latent_dim=32, ff_size=64, num_layers=2, num_heads=2,
            rope_heads=4, audio_feat_dim=16, word_feat_dim=16,
            word_embed_dim=8, vocab_size=64, use_prompt=True, prompt_dim=12,
            use_motionclip=True, style_dim=10,
        )
        mdm, params = create_mdm(cfg, rng, frames=128)
        q = RVQConfig(num_quantizers=2, nb_code=16, code_dim=512)
        rvq = {}
        for i, part in enumerate(("upper", "hands", "lower")):
            rcfg = body_part_rvq_config(part, width=32, depth=1, quantizer=q)
            module, p, state = create_rvqvae(rcfg, jax.random.fold_in(rng, i))
            z = jax.random.normal(rng, (1, 32, 512))
            state = rvq_forward(z, state, q, train=True, rng=rng).state
            rvq[part] = (module, p, state)
        diffusion = make_diffusion(steps=100, timestep_respacing="ddim4")

        n_frames = 240
        g = np.random.default_rng(1)
        feats = g.normal(0, 0.1, (533 * n_frames, 2)).astype(np.float32)
        prompts = {"upper": jnp.asarray(g.normal(size=(1, 12)), jnp.float32)}
        style = jnp.asarray(g.normal(size=(1, 10)), jnp.float32)
        guidance = {"audio_scale": 1.0, "prompt_scale": 2.0}

        plan = G.plan_windows(n_frames)
        aw = jnp.asarray(G.window_audio(feats[None], plan))
        ww = jnp.asarray(G.window_words(np.zeros((1, n_frames), np.int32), plan))
        seed0 = jnp.zeros((1, plan.pre_frames, J.LATENT_DIM))
        lat = G.sample_windows(
            mdm, params, diffusion, plan, aw, ww, seed0,
            jax.random.PRNGKey(7), sampler="ddim", prompts=prompts,
            guidance=guidance, style=style,
        )
        off = G.decode_latents(lat, rvq_modules=rvq, stats=identity_pose_stats())
        off_aa = np.asarray(off["axis_angle"][0])
        off_tr = np.asarray(off["trans"][0])

        sess = StreamingMotionSession(
            mdm=mdm, mdm_params=params, diffusion=diffusion, rvq_modules=rvq,
            stats=identity_pose_stats(), rng=jax.random.PRNGKey(7),
            prompts=prompts, guidance=guidance, style=style,
        )
        segs = sess.push_audio(feats) + sess.finish()
        aa = np.concatenate([s["axis_angle"] for s in segs])
        tr = np.concatenate([s["trans"] for s in segs])
        assert aa.shape == off_aa.shape
        assert np.abs(aa - off_aa).max() < 5e-2
        assert np.abs(tr - off_tr).max() < 1e-3 * max(1.0, np.abs(off_tr).max())

        # style-only session exercises the non-CFG general branch
        sess2 = StreamingMotionSession(
            mdm=mdm, mdm_params=params, diffusion=diffusion, rvq_modules=rvq,
            stats=identity_pose_stats(), rng=jax.random.PRNGKey(7),
            style=style,
        )
        lat2 = G.sample_windows(
            mdm, params, diffusion, plan, aw, ww, seed0,
            jax.random.PRNGKey(7), sampler="ddim", style=style,
        )
        off2 = G.decode_latents(lat2, rvq_modules=rvq, stats=identity_pose_stats())
        segs2 = sess2.push_audio(feats) + sess2.finish()
        aa2 = np.concatenate([s["axis_angle"] for s in segs2])
        assert np.abs(aa2 - np.asarray(off2["axis_angle"][0])).max() < 5e-2

    def test_chunking_invariance(self, stack):
        """One big push and many small pushes produce identical output."""
        n_frames = 240
        g = np.random.default_rng(1)
        feats = g.normal(0, 0.1, (533 * n_frames, 2)).astype(np.float32)

        s1 = _make_session(stack)
        segs1 = s1.push_audio(feats) + s1.finish()
        s2 = _make_session(stack)
        segs2 = []
        for i in range(0, len(feats), 7777):
            segs2 += s2.push_audio(feats[i : i + 7777])
        segs2 += s2.finish()

        a1 = np.concatenate([s["axis_angle"] for s in segs1])
        a2 = np.concatenate([s["axis_angle"] for s in segs2])
        np.testing.assert_array_equal(a1, a2)
        t1 = np.concatenate([s["trans"] for s in segs1])
        t2 = np.concatenate([s["trans"] for s in segs2])
        np.testing.assert_array_equal(t1, t2)

    def test_emission_latency_contract(self, stack):
        """Windows emit as soon as their audio is complete: after exactly
        one window of audio, ~one window minus the lookahead is out."""
        sess = _make_session(stack)
        g = np.random.default_rng(2)
        one_window = 533 * 128
        segs = sess.push_audio(
            g.normal(0, 0.1, (one_window - 100, 2)).astype(np.float32)
        )
        assert segs == []  # window not complete yet
        segs = sess.push_audio(g.normal(0, 0.1, (100, 2)).astype(np.float32))
        assert len(segs) == 1
        # 32 latents generated, lookahead 8 held back -> 96 frames out
        assert len(segs[0]["axis_angle"]) == (32 - sess.lookahead) * 4
        assert sess.stream_stats.windows_run == 1

    def test_pad_final_covers_tail(self, stack):
        """finish(pad_final=True) runs one zero-padded window over a tail
        shorter than a full window."""
        sess = _make_session(stack)
        g = np.random.default_rng(3)
        # 128 + 60 frames: one complete window + a 60-frame tail
        feats = g.normal(0, 0.1, (533 * 188, 2)).astype(np.float32)
        segs = sess.push_audio(feats)
        assert sess.stream_stats.windows_run == 1
        segs += sess.finish(pad_final=True)
        assert sess.stream_stats.windows_run == 2
        total = sum(len(s["axis_angle"]) for s in segs)
        assert total == 240  # two windows' stitched span


class TestAOTColdStart:
    def test_save_load_compiled_roundtrip(self, stack, tmp_path):
        """AOT-serialized executables must reproduce the jitted programs
        exactly, and refuse a session whose shapes differ."""
        n_frames = 240
        g = np.random.default_rng(3)
        feats = g.normal(0, 0.1, (533 * n_frames, 2)).astype(np.float32)

        ref = _make_session(stack)
        ref_segs = ref.push_audio(feats) + ref.finish()

        saver = _make_session(stack)
        saver.save_compiled(tmp_path / "aot")

        loaded = _make_session(stack)
        loaded.load_compiled(tmp_path / "aot")
        got_segs = loaded.push_audio(feats) + loaded.finish()

        assert len(got_segs) == len(ref_segs)
        for a, b in zip(got_segs, ref_segs):
            np.testing.assert_allclose(
                a["axis_angle"], b["axis_angle"], atol=1e-6
            )
            np.testing.assert_allclose(a["trans"], b["trans"], atol=1e-6)

    def test_load_compiled_rejects_mismatched_session(self, stack, tmp_path):
        saver = _make_session(stack)
        saver.save_compiled(tmp_path / "aot")
        other = _make_session(stack, lookahead=4)
        with pytest.raises(ValueError, match="don't match"):
            other.load_compiled(tmp_path / "aot")

    def test_load_compiled_rejects_different_weights(self, stack, tmp_path):
        """Executables bake the weights in as constants, so a session with
        the same shapes but DIFFERENT parameter values must be refused —
        otherwise it would silently generate from the saver's weights."""
        mdm, params, diffusion, rvq = stack
        saver = _make_session(stack)
        saver.save_compiled(tmp_path / "aot")
        bumped = jax.tree.map(lambda a: a + 1e-3, params)
        other = StreamingMotionSession(
            mdm=mdm, mdm_params=bumped, diffusion=diffusion, rvq_modules=rvq,
            stats=identity_pose_stats(), rng=jax.random.PRNGKey(7),
        )
        with pytest.raises(ValueError, match="weights_fp"):
            other.load_compiled(tmp_path / "aot")

    def test_load_compiled_rejects_different_latent_scale(self, stack, tmp_path):
        saver = _make_session(stack)
        saver.save_compiled(tmp_path / "aot")
        other = _make_session(stack, latent_scale=7.0)
        with pytest.raises(ValueError, match="weights_fp"):
            other.load_compiled(tmp_path / "aot")
