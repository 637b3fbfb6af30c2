"""Dataset statistics computation + AMASS loading/mixing tests."""

import numpy as np
import pytest

from syntalker_tpu.data import joints as J
from syntalker_tpu.data.amass import WeightedMixtureLoader, load_amass_npz
from syntalker_tpu.data.stats import (
    compute_h3d_stats,
    compute_mean_joint_velocity,
    compute_pose_stats,
    load_pose_stats,
)


class TestComputedStats:
    def test_pose_stats_shapes_and_values(self):
        rng = np.random.default_rng(0)
        rot6d = rng.normal(2.0, 3.0, (10, 16, 330)).astype(np.float32)
        tv = rng.normal(0.0, 0.1, (10, 16, 3)).astype(np.float32)
        stats = compute_pose_stats(rot6d, tv)
        np.testing.assert_allclose(stats.mean_full.mean(), 2.0, atol=0.1)
        np.testing.assert_allclose(stats.std_full.mean(), 3.0, atol=0.1)
        assert stats.mean_upper.shape == (78,)
        # normalize/denormalize round trip
        x = rot6d[0, :, J.UPPER_6D_IDX].T
        back = stats.denormalize_part(stats.normalize_part(x, "upper"), "upper")
        np.testing.assert_allclose(back, x, atol=1e-4)

    def test_h3d_stats(self):
        feats = np.random.default_rng(1).normal(size=(50, 623)).astype(np.float32)
        s = compute_h3d_stats(feats)
        n = s.normalize(feats)
        np.testing.assert_allclose(n.mean(0), 0.0, atol=1e-5)
        np.testing.assert_allclose(n.std(0), 1.0, atol=1e-4)

    def test_shipped_stats_load(self):
        stats = load_pose_stats("/root/reference/mean_std")
        assert stats.mean_full.shape == (330,)
        assert (stats.std_full > 0).all()
        assert stats.trans_mean.shape == (3,)

    def test_mean_joint_velocity(self):
        # constant-velocity joints -> mean speed = |v| * fps
        t = 31
        joints = np.zeros((t, 55, 3))
        joints[:, :, 0] = np.arange(t)[:, None] * 0.01
        mv = compute_mean_joint_velocity([joints], fps=30)
        np.testing.assert_allclose(mv, 0.3, rtol=1e-5)


class TestAMASS:
    def test_load_amass_reorients(self, tmp_path):
        rng = np.random.default_rng(0)
        n = 8
        poses = np.zeros((n, 156), np.float32)  # SMPL-H-ish width
        poses[:, :3] = [np.pi / 2, 0, 0]  # lying flat in Z-up
        trans = np.tile([1.0, 2.0, 3.0], (n, 1))
        p = tmp_path / "amass.npz"
        np.savez(p, poses=poses, trans=trans, betas=rng.normal(size=16))
        out = load_amass_npz(p)
        assert out["poses"].shape == (n, 165)
        assert out["betas"].shape == (300,)
        assert out["expressions"].shape == (n, 100)
        # trans rotated Z-up -> Y-up: (x, y, z) -> (x, z, -y)... verify via matrix
        np.testing.assert_allclose(out["trans"][0], [1.0, 3.0, -2.0], atol=1e-6)

    def test_weighted_mixture_deterministic(self):
        class FakeLoader:
            def __init__(self, tag):
                self.tag = tag

            def epoch(self, e):
                for i in range(4):
                    yield {"tag": self.tag, "i": i, "e": e}

        mix = WeightedMixtureLoader(
            {"a": FakeLoader("a"), "b": FakeLoader("b")},
            {"a": 0.5, "b": 0.5},
            seed=0,
        )
        run1 = [(n, b["tag"]) for n, b in mix.epoch(0, 10)]
        run2 = [(n, b["tag"]) for n, b in mix.epoch(0, 10)]
        assert run1 == run2
        names = {n for n, _ in run1}
        assert names == {"a", "b"}


class TestLatentCalibration:
    def test_calibrate_latent_scale(self):
        import jax
        import jax.numpy as jnp

        from syntalker_tpu.config import body_part_rvq_config
        from syntalker_tpu.data.stats import identity_pose_stats
        from syntalker_tpu.models.rvqvae import create_rvqvae
        from syntalker_tpu.ops.quantize import RVQConfig
        from syntalker_tpu.train.diffusion_trainer import (
            calibrate_latent_scale,
            make_latent_encoder,
        )

        rng = jax.random.PRNGKey(0)
        q = RVQConfig(num_quantizers=2, nb_code=16, code_dim=24)
        rvq = {}
        for i, part in enumerate(("upper", "hands", "lower")):
            cfg = body_part_rvq_config(part, width=16, depth=1, quantizer=q)
            import dataclasses

            cfg = dataclasses.replace(cfg, output_emb_width=24)
            module, params, state = create_rvqvae(cfg, jax.random.fold_in(rng, i))
            rvq[part] = (module, params, state)
        stats = identity_pose_stats()
        parts = {
            "upper": jax.random.normal(rng, (2, 16, 78)),
            "hands": jax.random.normal(rng, (2, 16, 180)),
            "lower": jax.random.normal(rng, (2, 16, 54)),
        }
        tv = jnp.zeros((2, 16, 3))
        scale = calibrate_latent_scale(rvq, stats, parts, tv)
        assert scale > 0
        enc = make_latent_encoder(rvq, stats, latent_scale=scale)
        lat = enc(parts["upper"], parts["hands"], parts["lower"], tv)
        import numpy as np

        np.testing.assert_allclose(float(jnp.std(lat)), 1.0, rtol=1e-3)
