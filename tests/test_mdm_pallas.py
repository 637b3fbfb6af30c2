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
