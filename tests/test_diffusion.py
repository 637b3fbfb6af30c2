"""Diffusion core tests: schedule/respacing invariants, q/p consistency,
sampler fixed points, CFG combination arithmetic (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from syntalker_tpu.diffusion import core, schedule


class TestSchedules:
    def test_cosine_betas_bounds(self):
        betas = schedule.cosine_betas(1000)
        assert betas.shape == (1000,)
        assert (betas > 0).all() and (betas <= 0.999).all()

    def test_ddim_respacing_count_and_map(self):
        steps = schedule.space_timesteps(1000, "ddim50")
        assert len(steps) == 50
        assert steps == list(range(0, 1000, 20))

    def test_section_respacing(self):
        steps = schedule.space_timesteps(300, [10, 15, 20])
        assert len(steps) == 45

    def test_respaced_alphas_match_original(self):
        full = schedule.make_diffusion(schedule="cosine", steps=100)
        spaced = schedule.make_diffusion(
            schedule="cosine", steps=100, timestep_respacing="ddim10"
        )
        np.testing.assert_allclose(
            spaced.alphas_cumprod,
            full.alphas_cumprod[spaced.timestep_map],
            rtol=1e-6,
        )

    def test_posterior_coef_identity_at_t0(self):
        p = schedule.make_diffusion(schedule="cosine", steps=50)
        # posterior mean at t=0 must equal pred_x0 exactly
        np.testing.assert_allclose(p.posterior_mean_coef1[0], 1.0, rtol=1e-6)
        np.testing.assert_allclose(p.posterior_mean_coef2[0], 0.0, atol=1e-8)


class TestQProcess:
    def test_q_sample_interpolates(self):
        p = schedule.make_diffusion(steps=100)
        x0 = jnp.ones((2, 4, 8))
        noise = jnp.zeros_like(x0)
        xt = core.q_sample(p, x0, jnp.array([0, 99]), noise)
        # without noise, x_t = sqrt(abar_t) * x0
        np.testing.assert_allclose(
            np.asarray(xt[0, 0, 0]), p.sqrt_alphas_cumprod[0], rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(xt[1, 0, 0]), p.sqrt_alphas_cumprod[99], rtol=1e-6
        )

    def test_eps_recovery(self):
        p = schedule.make_diffusion(steps=100)
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (3, 4, 8))
        noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
        t = jnp.array([5, 50, 90])
        xt = core.q_sample(p, x0, t, noise)
        eps = core.predict_eps_from_xstart(p, xt, t, x0)
        np.testing.assert_allclose(np.asarray(eps), np.asarray(noise), atol=1e-4)


class TestTrainingLoss:
    def test_perfect_model_zero_loss(self):
        p = schedule.make_diffusion(steps=100)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 8))
        noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        loss = core.training_loss(
            p, lambda xt, t: x0, x0, jnp.array([3, 30, 60, 90]), noise
        )
        np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-7)

    def test_masked_loss_ignores_invalid(self):
        p = schedule.make_diffusion(steps=10)
        x0 = jnp.zeros((1, 4, 2))
        noise = jnp.zeros_like(x0)
        bad = jnp.array([[[9.0, 9.0]] * 4])  # model is wrong everywhere

        def model(xt, t):
            return bad

        mask = jnp.array([[1.0, 1.0, 0.0, 0.0]])
        loss = core.training_loss(p, model, x0, jnp.array([0]), noise, mask=mask)
        full = core.training_loss(p, model, x0, jnp.array([0]), noise)
        # same per-element loss, mask halves the valid count -> equal means
        np.testing.assert_allclose(np.asarray(loss), np.asarray(full), rtol=1e-6)

    def test_smooth_l1_regimes(self):
        a = jnp.array([0.0, 0.0])
        b = jnp.array([0.5, 3.0])
        out = np.asarray(core.smooth_l1(a, b))
        np.testing.assert_allclose(out, [0.125, 2.5], rtol=1e-6)


class TestSamplers:
    def test_fixed_point_model_recovers_target(self):
        # A model that always predicts the same x0 must converge exactly to it
        # (posterior coef identity at t=0) for both samplers.
        p = schedule.make_diffusion(steps=50)
        target = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8))
        model = lambda xt, t: target  # noqa: E731
        for fn in (core.ddpm_sample, core.ddim_sample):
            out = fn(p, model, target.shape, jax.random.PRNGKey(3))
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(target), atol=1e-4
            )

    def test_ddim_deterministic(self):
        p = schedule.make_diffusion(steps=100, timestep_respacing="ddim10")
        assert p.num_steps == 10
        model = lambda xt, t: xt * 0.9  # noqa: E731
        a = core.ddim_sample(p, model, (1, 2, 4), jax.random.PRNGKey(0))
        b = core.ddim_sample(p, model, (1, 2, 4), jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_sampler_t_mapping_respaced(self):
        # model receives ORIGINAL timestep indices under respacing
        p = schedule.make_diffusion(steps=100, timestep_respacing="ddim10")
        seen = []

        def model(xt, t):
            seen.append(int(t[0]))
            return jnp.zeros_like(xt)

        with jax.disable_jit():
            core.ddim_sample(p, model, (1, 2, 2), jax.random.PRNGKey(0))
        assert seen == list(range(90, -1, -10))


class TestCFG:
    def _denoise_fn(self):
        # pseudo-denoiser: output = broadcast of at_feat mean (so branches
        # with different conditioning give different constants)
        def fn(x, t, cond):
            val = jnp.mean(cond.at_feat, axis=(1, 2))  # (B,)
            return jnp.ones_like(x) * val[:, None, None]

        return fn

    def _cond(self, v, b=2):
        from syntalker_tpu.models.denoiser import Conditioning

        return Conditioning(
            at_feat=jnp.full((b, 4, 3), v),
            seed_emb=jnp.zeros((b, 8)),
            prompt_feat=None,
        )

    def test_single_cfg_formula(self):
        from syntalker_tpu.diffusion.cfg import make_cfg_model_fn

        fn = self._denoise_fn()
        model = make_cfg_model_fn(fn, self._cond(2.0), self._cond(1.0), scale=3.0)
        x = jnp.zeros((2, 5, 6))
        out = model(x, jnp.zeros((2,), jnp.int32))
        # uncond=1 + 3*(2-1) = 4
        np.testing.assert_allclose(np.asarray(out), 4.0, rtol=1e-6)

    def test_two_cfg_formula(self):
        from syntalker_tpu.diffusion.cfg import make_two_cfg_model_fn

        fn = self._denoise_fn()
        model = make_two_cfg_model_fn(
            fn,
            self._cond(2.0),  # audio branch
            self._cond(5.0),  # prompt branch
            self._cond(1.0),  # uncond
            scale_audio=1.0,
            scale_prompt=2.0,
        )
        out = model(jnp.zeros((2, 5, 6)), jnp.zeros((2,), jnp.int32))
        # 1 + 1*(2-1) + 2*(5-1) = 10
        np.testing.assert_allclose(np.asarray(out), 10.0, rtol=1e-6)

    def test_bodypart_masks(self):
        from syntalker_tpu.diffusion.cfg import make_bodypart_cfg_model_fn

        fn = self._denoise_fn()
        slices = {"upper": (0, 4), "hands": (4, 8), "lower": (8, 12)}
        model = make_bodypart_cfg_model_fn(
            fn,
            self._cond(2.0),  # audio
            self._cond(1.0),  # uncond
            {"upper": None, "hands": self._cond(5.0), "lower": None},
            audio_scale=1.0,
            prompt_scale=4.0,
            latent_slices=slices,
        )
        out = np.asarray(model(jnp.zeros((2, 5, 12)), jnp.zeros((2,), jnp.int32)))
        # unprompted parts: 1 + 1*(2-1) = 2
        np.testing.assert_allclose(out[..., 0:4], 2.0, rtol=1e-6)
        np.testing.assert_allclose(out[..., 8:12], 2.0, rtol=1e-6)
        # prompted hands: 1 + 0*audio + 4*(5-1) = 17
        np.testing.assert_allclose(out[..., 4:8], 17.0, rtol=1e-6)
