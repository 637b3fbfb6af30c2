"""Fused transformer-stack kernel vs the flax block stack (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
from syntalker_tpu.ops.mdm_pallas import fused_block_stack, stack_block_weights

CFG = MDMConfig(
    latent_total_dim=48,
    latent_dim=256,
    ff_size=512,
    num_layers=3,
    num_heads=4,
    rope_heads=4,
    audio_feat_dim=16,
    word_feat_dim=16,
    word_embed_dim=8,
    vocab_size=32,
    dropout=0.0,
)


@pytest.fixture(scope="module")
def stack():
    mdm, params = create_mdm(CFG, jax.random.PRNGKey(0), frames=32)
    block_params = params["blocks"]["block"]
    return mdm, params, block_params


def flax_reference(block_params, x, cfg=CFG):
    """Run the stacked flax blocks directly."""
    from syntalker_tpu.models.denoiser import TransformerBlock

    blk = TransformerBlock(cfg.latent_dim, cfg.num_heads, cfg.ff_size, 0.0)
    h = x
    for i in range(cfg.num_layers):
        layer = jax.tree.map(lambda p: p[i], block_params)
        h = blk.apply({"params": layer}, h)
    return h


class TestFusedStack:
    def test_matches_flax_interpret(self, stack):
        _, _, block_params = stack
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, CFG.latent_dim))
        ref = np.asarray(flax_reference(block_params, x))
        w = stack_block_weights(block_params)
        out = np.asarray(
            fused_block_stack(x, w, num_heads=CFG.num_heads, interpret=True)
        )
        # bf16 weights in the kernel: ~1e-2 absolute agreement expected
        assert out.shape == ref.shape
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 2e-2, f"relative error {err}"

    def test_per_sample_independence(self, stack):
        _, _, block_params = stack
        w = stack_block_weights(block_params)
        x = jax.random.normal(jax.random.PRNGKey(2), (3, 32, CFG.latent_dim))
        full = np.asarray(fused_block_stack(x, w, interpret=True))
        one = np.asarray(fused_block_stack(x[1:2], w, interpret=True))
        np.testing.assert_allclose(full[1:2], one, atol=1e-5)


class TestTiledServingStack:
    def test_tile_samples_matches_per_sample(self, stack):
        """tile_samples=4 must match tile_samples=1: attention is
        block-diagonal-masked inside the tile (cross-sample probs are exact
        zeros), so the only differences are accumulation-order drift in the
        larger score/value matmuls amplified through the layer stack —
        bounded well under the kernel's bf16-weight parity tolerance."""
        _, _, block_params = stack
        w = stack_block_weights(block_params)
        x = jax.random.normal(jax.random.PRNGKey(3), (8, 32, CFG.latent_dim))
        base = np.asarray(fused_block_stack(x, w, interpret=True))
        tiled = np.asarray(
            fused_block_stack(x, w, tile_samples=4, interpret=True)
        )
        np.testing.assert_allclose(tiled, base, atol=5e-3, rtol=5e-3)

    def test_attn_group_matches_per_sample(self, stack):
        """attn_group=g (g samples' tokens in one block-diagonal masked
        score dot, for MXU row fill) must match the per-sample batched
        attention: the −1e30 mask makes cross-sample probs exact zeros, so
        the only drift is accumulation order amplified through bf16 casts
        (~1 bf16 ulp)."""
        _, _, block_params = stack
        w = stack_block_weights(block_params)
        x = jax.random.normal(jax.random.PRNGKey(5), (8, 32, CFG.latent_dim))
        base = np.asarray(
            fused_block_stack(x, w, tile_samples=8, interpret=True)
        )
        for g in (2, 4, 8):
            grouped = np.asarray(
                fused_block_stack(
                    x, w, tile_samples=8, attn_group=g, interpret=True
                )
            )
            np.testing.assert_allclose(grouped, base, atol=5e-3, rtol=5e-3)

    def test_attn_group_divisibility_raises(self, stack):
        _, _, block_params = stack
        w = stack_block_weights(block_params)
        x = jnp.zeros((8, 32, CFG.latent_dim))
        with pytest.raises(ValueError, match="attn_group"):
            fused_block_stack(
                x, w, tile_samples=8, attn_group=3, interpret=True
            )

    def test_tile_divisibility_raises(self, stack):
        _, _, block_params = stack
        w = stack_block_weights(block_params)
        x = jnp.zeros((6, 32, CFG.latent_dim))
        with pytest.raises(ValueError, match="divisible"):
            fused_block_stack(x, w, tile_samples=4, interpret=True)


class TestRopeFlat:
    def test_flat_tables_match_apply_rope(self):
        """cos*x + (x@P)*sin on the flat layout == apply_rope on the
        (T, RH, hd) view (RoPE is linear in x)."""
        from syntalker_tpu.models.denoiser import apply_rope, rope_angles
        from syntalker_tpu.ops.mdm_pallas import rope_flat_tables

        n, d, rh = 8, 256, 4
        hd = d // rh
        x = jax.random.normal(jax.random.PRNGKey(0), (n, d))
        ref = apply_rope(
            x.reshape(n, rh, hd), rope_angles(n, hd)[:, None, :]
        ).reshape(n, d)
        cos_f, sin_f, perm = rope_flat_tables(n, d, rh)
        out = cos_f * x + sin_f * (x @ perm.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestFusedDDIMWindow:
    def test_full_loop_kernel_matches_xla_sampler(self):
        """sample_windows_fused_loop (whole NFE loop in one kernel per
        window) must match sample_windows(ddim) — same tolerance as the
        per-step fused path. Needs the real 1536 latent_total_dim
        (sample_windows allocates J.LATENT_DIM), so a dedicated tiny cfg."""
        from syntalker_tpu import generation as G
        from syntalker_tpu.diffusion.schedule import make_diffusion

        cfg = MDMConfig(
            latent_dim=64, ff_size=128, num_layers=2, num_heads=2,
            rope_heads=4, audio_feat_dim=16, word_feat_dim=16,
            word_embed_dim=8, vocab_size=32, dropout=0.0,
        )
        mdm, params = create_mdm(cfg, jax.random.PRNGKey(0), frames=128)
        diffusion = make_diffusion(steps=100, timestep_respacing="ddim4")
        plan = G.plan_windows(240)
        assert plan.num_windows == 2
        b = 2
        g = np.random.default_rng(0)
        aw = jnp.asarray(
            g.normal(0, 0.1, (plan.num_windows, b, 533 * 128, 2)), jnp.float32
        )
        ww = jnp.zeros((plan.num_windows, b, 128), jnp.int32)
        seed0 = jnp.asarray(
            g.normal(size=(b, 4, cfg.latent_total_dim)), jnp.float32
        )
        key = jax.random.PRNGKey(7)

        ref = G.sample_windows(
            mdm, params, diffusion, plan, aw, ww, seed0, key, sampler="ddim"
        )
        out = G.sample_windows_fused_loop(
            mdm, params, diffusion, plan, aw, ww, seed0, key, interpret=True
        )
        assert out.shape == ref.shape
        err = float(jnp.abs(out - ref).max())
        assert err < 2e-2, err

        # serving variant: K samples per grid step must match the XLA path
        # just as tightly (attention is per-sample batched inside the tile)
        tiled = G.sample_windows_fused_loop(
            mdm, params, diffusion, plan, aw, ww, seed0, key,
            tile_samples=2, interpret=True,
        )
        err = float(jnp.abs(tiled - ref).max())
        assert err < 2e-2, err

        # mesh composition (VERDICT r3 #3): the fused kernel shard_mapped
        # over the data axis must reproduce the single-chip fused path.
        # Per-sample independence means each shard's kernel sees exactly
        # the same samples; the residual difference is the sharded
        # encode_all compiling with a different conv reduction order
        # (~1e-5 on the conditioning), amplified through the
        # autoregressive window chain — same tolerance family as
        # fused-vs-XLA above.
        mesh = jax.make_mesh((2,), ("data",))
        sampler = G.make_fused_loop_sampler(
            mdm, params, diffusion, plan, tile_samples=1, interpret=True,
            mesh=mesh,
        )
        sharded = sampler(aw, ww, seed0, key)
        assert sharded.shape == out.shape
        err = float(jnp.abs(sharded - out).max())
        assert err < 2e-2, err


class TestFusedDenoise:
    def test_matches_mdm_denoise(self, stack):
        """The whole fused serving denoise (pre/post XLA + Pallas stack)
        must match MDM.denoise on the same params."""
        from syntalker_tpu.ops.mdm_pallas import make_fused_denoise

        mdm, params, _ = stack
        b = 4
        rng = jax.random.PRNGKey(9)
        x_t = jax.random.normal(jax.random.fold_in(rng, 0), (b, 8, CFG.latent_total_dim))  # frames=32 -> 8 latent frames
        audio = 0.1 * jax.random.normal(jax.random.fold_in(rng, 1), (b, 533 * 32, 2))
        word = jnp.zeros((b, 32), jnp.int32)
        seed = jax.random.normal(jax.random.fold_in(rng, 2), (b, 4, CFG.latent_total_dim))
        t = jnp.array([5, 9, 100, 3], jnp.int32)

        cond = mdm.apply({"params": params}, audio, word, seed, method="encode_cond")
        t_emb = mdm.apply({"params": params}, t, method="embed_timesteps")
        ref = np.asarray(
            mdm.apply({"params": params}, x_t, t, cond, t_emb=t_emb, method="denoise")
        )
        fused = make_fused_denoise(CFG, params, tile_samples=2, interpret=True)
        out = np.asarray(fused(x_t, t_emb, cond))
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 2e-2, f"relative error {err}"  # bf16 weights in kernel
