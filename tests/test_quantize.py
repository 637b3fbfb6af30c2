"""Invariant tests for the functional residual quantizer (SURVEY.md §4:
straight-through, EMA counts, dropout masking, dequantize round trips)."""

import jax
import jax.numpy as jnp
import numpy as np

from syntalker_tpu.ops.quantize import (
    RVQConfig,
    init_rvq_state,
    rvq_dequantize,
    rvq_encode,
    rvq_forward,
    rvq_quantize_eval,
)

CFG = RVQConfig(num_quantizers=4, nb_code=32, code_dim=16, quantize_dropout_prob=0.0)


def make_batch(key, b=8, t=12, d=16):
    return jax.random.normal(key, (b, t, d))


class TestInitAndEMA:
    def test_lazy_init_flips_flag(self):
        x = make_batch(jax.random.PRNGKey(0))
        state = init_rvq_state(CFG)
        assert not bool(state.initialized)
        out = rvq_forward(x, state, CFG, train=True, rng=jax.random.PRNGKey(1))
        assert bool(out.state.initialized)
        # codebook got data-dependent values
        assert float(jnp.abs(out.state.codebook).sum()) > 0

    def test_ema_counts_move_toward_usage(self):
        x = make_batch(jax.random.PRNGKey(2))
        state = init_rvq_state(CFG)
        out = rvq_forward(x, state, CFG, train=True, rng=jax.random.PRNGKey(3))
        c1 = np.asarray(out.state.code_count)
        out2 = rvq_forward(x, out.state, CFG, train=True, rng=jax.random.PRNGKey(4))
        c2 = np.asarray(out2.state.code_count)
        assert c1.shape == (4, 32)
        assert not np.allclose(c1, c2)

    def test_eval_does_not_mutate_state(self):
        x = make_batch(jax.random.PRNGKey(5))
        state = init_rvq_state(CFG)
        state = rvq_forward(x, state, CFG, train=True, rng=jax.random.PRNGKey(6)).state
        out = rvq_forward(x, state, CFG, train=False)
        np.testing.assert_array_equal(
            np.asarray(out.state.codebook), np.asarray(state.codebook)
        )
        np.testing.assert_array_equal(
            np.asarray(out.state.code_count), np.asarray(state.code_count)
        )


class TestStraightThrough:
    def test_gradient_passes_through(self):
        x = make_batch(jax.random.PRNGKey(7))
        state = init_rvq_state(CFG)
        state = rvq_forward(x, state, CFG, train=True, rng=jax.random.PRNGKey(8)).state

        def f(x):
            out = rvq_forward(x, state, CFG, train=False)
            return jnp.sum(out.quantized)

        g = jax.grad(f)(x)
        # Reference semantics: each active layer contributes an identity
        # gradient, so d(sum quantized)/dx = num_quantizers elementwise.
        np.testing.assert_allclose(np.asarray(g), CFG.num_quantizers, atol=1e-5)

    def test_commit_loss_nonnegative_scalar(self):
        x = make_batch(jax.random.PRNGKey(9))
        state = init_rvq_state(CFG)
        out = rvq_forward(x, state, CFG, train=True, rng=jax.random.PRNGKey(10))
        assert out.commit_loss.shape == ()
        assert float(out.commit_loss) >= 0


class TestDropout:
    def test_dropout_masks_suffix_with_minus_one(self):
        cfg = RVQConfig(
            num_quantizers=4, nb_code=32, code_dim=16, quantize_dropout_prob=1.0
        )
        x = make_batch(jax.random.PRNGKey(11))
        state = init_rvq_state(cfg)
        # probability 1.0 => some suffix is always dropped unless start=nq-1
        found_masked = False
        for seed in range(8):
            out = rvq_forward(x, state, cfg, train=True, rng=jax.random.PRNGKey(seed))
            idx = np.asarray(out.indices)
            cols_masked = (idx == -1).all(axis=(0, 1))
            # masked layers must form a suffix
            if cols_masked.any():
                found_masked = True
                first = int(np.argmax(cols_masked))
                assert cols_masked[first:].all()
                assert not cols_masked[:first].any()
        assert found_masked

    def test_force_dropout_index(self):
        x = make_batch(jax.random.PRNGKey(12))
        state = init_rvq_state(CFG)
        state = rvq_forward(x, state, CFG, train=True, rng=jax.random.PRNGKey(13)).state
        out = rvq_forward(x, state, CFG, train=False, force_dropout_index=1)
        idx = np.asarray(out.indices)
        assert (idx[..., :2] >= 0).all()
        assert (idx[..., 2:] == -1).all()


class TestEncodeDecode:
    def test_encode_matches_forward_indices_eval(self):
        x = make_batch(jax.random.PRNGKey(14))
        state = init_rvq_state(CFG)
        state = rvq_forward(x, state, CFG, train=True, rng=jax.random.PRNGKey(15)).state
        out = rvq_forward(x, state, CFG, train=False)
        idx = rvq_encode(x, state, CFG)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(out.indices))

    def test_dequantize_matches_quantized_eval(self):
        x = make_batch(jax.random.PRNGKey(16))
        state = init_rvq_state(CFG)
        state = rvq_forward(x, state, CFG, train=True, rng=jax.random.PRNGKey(17)).state
        zq, idx = rvq_quantize_eval(x, state, CFG)
        z2 = rvq_dequantize(idx, state, CFG)
        np.testing.assert_allclose(np.asarray(zq), np.asarray(z2), atol=1e-6)

    def test_dequantize_ignores_negative(self):
        state = init_rvq_state(CFG)
        state = rvq_forward(
            make_batch(jax.random.PRNGKey(18)), state, CFG, train=True,
            rng=jax.random.PRNGKey(19),
        ).state
        idx = -jnp.ones((2, 3, CFG.num_quantizers), jnp.int32)
        z = rvq_dequantize(idx, state, CFG)
        np.testing.assert_array_equal(np.asarray(z), 0.0)

    def test_reconstruction_improves_with_more_quantizers(self):
        # residual refinement property: more layers -> lower residual error
        x = make_batch(jax.random.PRNGKey(20), b=32, t=8)
        state = init_rvq_state(CFG)
        for s in range(30):
            state = rvq_forward(
                x, state, CFG, train=True, rng=jax.random.PRNGKey(100 + s)
            ).state
        errs = []
        for k in range(CFG.num_quantizers):
            out = rvq_forward(x, state, CFG, train=False, force_dropout_index=k)
            errs.append(float(jnp.mean((out.quantized - x) ** 2)))
        assert errs[-1] < errs[0]


class TestRVQVAEModel:
    def test_round_trip_shapes(self):
        from syntalker_tpu.models.rvqvae import RVQVAEConfig, create_rvqvae

        cfg = RVQVAEConfig(
            input_dim=78,
            width=64,
            output_emb_width=32,
            depth=2,
            quantizer=RVQConfig(num_quantizers=3, nb_code=16, code_dim=32),
        )
        module, params, state = create_rvqvae(cfg, jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 78))
        rec, out = module.apply(
            {"params": params}, x, state, train=True,
            rng=jax.random.PRNGKey(2),
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        assert rec.shape == x.shape
        assert out.quantized.shape == (2, 16, 32)  # T/4, latent dim
        assert out.indices.shape == (2, 16, 3)

        z = module.apply({"params": params}, x, method="map2latent")
        assert z.shape == (2, 16, 32)
        y = module.apply({"params": params}, z, out.state, method="latent2origin")
        assert y.shape == x.shape

        idx = module.apply({"params": params}, x, out.state, method="encode")
        rec2 = module.apply({"params": params}, idx, out.state, method="decode_indices")
        assert rec2.shape == x.shape

    def test_training_reduces_loss(self):
        import optax
        from syntalker_tpu.models.rvqvae import RVQVAEConfig, create_rvqvae

        cfg = RVQVAEConfig(
            input_dim=12,
            width=32,
            output_emb_width=16,
            depth=1,
            quantizer=RVQConfig(
                num_quantizers=2, nb_code=16, code_dim=16, quantize_dropout_prob=0.0
            ),
        )
        module, params, qstate = create_rvqvae(cfg, jax.random.PRNGKey(0), example_len=16)
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 12))

        @jax.jit
        def step(params, qstate, opt_state, rng):
            def loss_fn(p):
                rec, out = module.apply(
                    {"params": p}, x, qstate, train=True, rng=rng,
                    rngs={"dropout": jax.random.fold_in(rng, 7)},
                )
                loss = jnp.mean((rec - x) ** 2) + 0.02 * out.commit_loss
                return loss, out.state

            (loss, new_q), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), new_q, opt_state, loss

        losses = []
        for i in range(60):
            params, qstate, opt_state, loss = step(
                params, qstate, opt_state, jax.random.PRNGKey(i)
            )
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.7, losses[::10]
