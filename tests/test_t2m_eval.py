"""HumanML3D metric suite tests."""

import jax
import jax.numpy as jnp
import numpy as np

from syntalker_tpu.eval import t2m


class TestMetricMath:
    def test_distance_matrix(self):
        a = np.array([[0.0, 0], [1, 0]])
        b = np.array([[0.0, 0], [0, 2]])
        d = t2m.euclidean_distance_matrix(a, b)
        np.testing.assert_allclose(d, [[0, 2], [1, np.sqrt(5)]], atol=1e-6)

    def test_r_precision_perfect(self):
        e = np.random.default_rng(0).normal(size=(32, 8))
        matching, r = t2m.matching_and_r_precision(e, e)
        np.testing.assert_allclose(matching, 0.0, atol=1e-6)
        np.testing.assert_allclose(r, 1.0)

    def test_r_precision_random_chance(self):
        rng = np.random.default_rng(1)
        t_emb = rng.normal(size=(256, 8))
        m_emb = rng.normal(size=(256, 8))
        _, r = t2m.matching_and_r_precision(t_emb, m_emb)
        assert r[0] < 0.05  # ~1/256 chance at top-1

    def test_diversity_zero_for_identical(self):
        acts = np.ones((100, 16))
        assert t2m.calculate_diversity(acts, 50) == 0.0

    def test_multimodality(self):
        acts = np.random.default_rng(2).normal(size=(10, 8, 16))
        v = t2m.calculate_multimodality(acts, 4)
        assert v > 0
        same = np.repeat(acts[:, :1], 8, axis=1)
        assert t2m.calculate_multimodality(same, 4) == 0.0

    def test_metric_statistics(self):
        vals = np.array([1.0, 2.0, 3.0, 4.0])
        mean, ci = t2m.get_metric_statistics(vals, 4)
        np.testing.assert_allclose(mean, 2.5)
        assert ci > 0

    def test_replication_protocol(self):
        out = t2m.evaluate_replications(lambda rep: {"fid": float(rep)}, 5)
        mean, ci = out["fid"]
        np.testing.assert_allclose(mean, 2.0)


class TestEvaluatorNets:
    def test_co_embedding_shapes(self):
        cfg = t2m.T2MEvalConfig(
            dim_pose=32, dim_word=12, dim_pos_ohot=4, dim_movement=16,
            dim_coemb=16, hidden=16,
        )
        ev = t2m.T2MEvaluator(cfg)
        motions = np.random.default_rng(0).normal(size=(3, 16, 32)).astype(np.float32)
        m_lens = np.array([16, 12, 8])
        words = np.random.default_rng(1).normal(size=(3, 6, 12)).astype(np.float32)
        pos = np.zeros((3, 6, 4), np.float32)
        cap_lens = np.array([6, 4, 2])
        t_emb, m_emb = ev.get_co_embeddings(words, pos, cap_lens, motions, m_lens)
        assert t_emb.shape == (3, 16)
        assert m_emb.shape == (3, 16)

    def test_length_changes_embedding(self):
        # the GRU stops at m_lens//unit_length movement frames, so different
        # lengths over the same padded sequence give different embeddings
        # (the conv front-end may leak a few boundary frames, same as the
        # reference's movement encoder)
        cfg = t2m.T2MEvalConfig(
            dim_pose=16, dim_word=8, dim_pos_ohot=2, dim_movement=8,
            dim_coemb=8, hidden=8,
        )
        ev = t2m.T2MEvaluator(cfg)
        m = np.random.default_rng(0).normal(size=(1, 16, 16)).astype(np.float32)
        e_full = ev.get_motion_embeddings(m, np.array([16]))
        e_half = ev.get_motion_embeddings(m, np.array([8]))
        assert np.abs(e_full - e_half).max() > 1e-4
        # deterministic
        e_full2 = ev.get_motion_embeddings(m, np.array([16]))
        np.testing.assert_allclose(e_full, e_full2, atol=1e-6)
