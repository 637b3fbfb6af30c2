"""Fused Pallas RVQ-encode kernel vs the XLA reference path (interpreter
mode on CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from syntalker_tpu.ops.quantize import (
    RVQConfig,
    init_rvq_state,
    rvq_forward,
    rvq_quantize_eval,
)
from syntalker_tpu.ops.quantize_pallas import rvq_quantize_eval_fused

CFG = RVQConfig(num_quantizers=4, nb_code=64, code_dim=128, quantize_dropout_prob=0.0)


def trained_state(key):
    state = init_rvq_state(CFG)
    x = jax.random.normal(key, (16, 8, CFG.code_dim))
    for i in range(3):
        state = rvq_forward(
            x, state, CFG, train=True, rng=jax.random.fold_in(key, i)
        ).state
    return state


class TestFusedKernel:
    def test_matches_reference_path(self):
        key = jax.random.PRNGKey(0)
        state = trained_state(key)
        z = jax.random.normal(jax.random.fold_in(key, 9), (4, 8, CFG.code_dim))
        q_ref, idx_ref = rvq_quantize_eval(z, state, CFG)
        q_fused, idx_fused = rvq_quantize_eval_fused(z, state, CFG, interpret=True)
        np.testing.assert_array_equal(np.asarray(idx_fused), np.asarray(idx_ref))
        np.testing.assert_allclose(
            np.asarray(q_fused), np.asarray(q_ref), atol=1e-4
        )

    def test_padding_path(self):
        # N not a multiple of the tile size exercises the pad/unpad logic
        key = jax.random.PRNGKey(1)
        state = trained_state(key)
        z = jax.random.normal(jax.random.fold_in(key, 5), (1, 13, CFG.code_dim))
        q_ref, idx_ref = rvq_quantize_eval(z, state, CFG)
        q_fused, idx_fused = rvq_quantize_eval_fused(z, state, CFG, interpret=True)
        np.testing.assert_array_equal(np.asarray(idx_fused), np.asarray(idx_ref))
        np.testing.assert_allclose(np.asarray(q_fused), np.asarray(q_ref), atol=1e-4)
