"""Tests for the secondary diffusion machinery (PLMS, inpainting, VLB,
importance sampler, EMA)."""

import jax
import jax.numpy as jnp
import numpy as np

from syntalker_tpu.diffusion import core, schedule
from syntalker_tpu.diffusion import extras as X


class TestPLMS:
    def test_fixed_point_recovery(self):
        p = schedule.make_diffusion(steps=50)
        target = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8))
        out = X.plms_sample(p, lambda x, t: target, target.shape, jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(out), np.asarray(target), atol=1e-3)

    def test_deterministic(self):
        p = schedule.make_diffusion(steps=20)
        model = lambda x, t: x * 0.5  # noqa: E731
        a = X.plms_sample(p, model, (1, 2, 4), jax.random.PRNGKey(0))
        b = X.plms_sample(p, model, (1, 2, 4), jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestInpainting:
    def test_known_region_preserved(self):
        p = schedule.make_diffusion(steps=20)
        known = jnp.full((1, 4, 8), 3.0)
        mask = jnp.zeros((1, 4, 8), bool).at[:, :2].set(True)
        model = X.inpainting_model_fn(p, lambda x, t: jnp.zeros_like(x), known, mask)
        out = core.ddim_sample(p, model, (1, 4, 8), jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(out[:, :2]), 3.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out[:, 2:]), 0.0, atol=1e-4)


class TestVLB:
    def test_normal_kl_zero_for_same(self):
        m = jnp.array([0.3, -0.5])
        lv = jnp.array([0.1, 0.2])
        np.testing.assert_allclose(np.asarray(X.normal_kl(m, lv, m, lv)), 0.0, atol=1e-7)

    def test_vb_perfect_model_small(self):
        p = schedule.make_diffusion(steps=50)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 8)) * 0.5
        t = jnp.array([5, 10, 20, 40])
        noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        xt = core.q_sample(p, x0, t, noise)
        vb_good = X.vb_terms_bpd(p, lambda x, tt: x0, x0, xt, t)
        vb_bad = X.vb_terms_bpd(p, lambda x, tt: x0 + 1.0, x0, xt, t)
        assert (np.asarray(vb_good) < np.asarray(vb_bad)).all()


class TestSamplers:
    def test_uniform(self):
        s = X.UniformSampler(100)
        t, w = s.sample(jax.random.PRNGKey(0), 64)
        assert t.shape == (64,) and int(t.max()) < 100
        np.testing.assert_allclose(np.asarray(w), 1.0)

    def test_importance_warmup_then_weighted(self):
        s = X.LossSecondMomentResampler(10, history_per_term=2)
        np.testing.assert_allclose(s.weights(), 1.0)
        for _ in range(2):
            s.update(np.arange(10), np.linspace(0.1, 5.0, 10))
        w = s.weights()
        assert w[9] > w[0]  # higher-loss timesteps get more mass
        t, imp_w = s.sample(jax.random.PRNGKey(0), 256)
        assert t.shape == (256,)
        assert np.isfinite(np.asarray(imp_w)).all()


class TestEMA:
    def test_update(self):
        ema = {"a": jnp.zeros(3)}
        p = {"a": jnp.ones(3)}
        out = X.update_ema(ema, p, rate=0.9)
        np.testing.assert_allclose(np.asarray(out["a"]), 0.1, atol=1e-7)
