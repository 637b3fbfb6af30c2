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


class TestCaptioner:
    """Deterministic rule-based captions (data/captions.py) — the training
    signal for the self-hosted text-control oracle (VERDICT r1 #8)."""

    def _joints(self, kind: str, t=60):
        from syntalker_tpu.data.captions import L_WRIST, R_WRIST, ROOT

        rng = np.random.default_rng(0)
        j = np.tile(rng.normal(0, 0.05, (1, 22, 3)), (t, 1, 1)).astype(np.float32)
        # plausible static skeleton: shoulders ~0.4 apart at y=1.4
        j[:, 16] = [-0.2, 1.4, 0.0]
        j[:, 17] = [0.2, 1.4, 0.0]
        j[:, 20] = [-0.25, 0.8, 0.0]
        j[:, 21] = [0.25, 0.8, 0.0]
        tt = np.arange(t, dtype=np.float32)
        if kind == "left_wave":
            j[:, L_WRIST, 0] += 0.3 * np.sin(tt / 2)
            j[:, L_WRIST, 1] = 1.6  # above the shoulder line
        elif kind == "both_fast":
            j[:, L_WRIST, 2] += 0.4 * np.sin(tt)
            j[:, R_WRIST, 2] += 0.4 * np.cos(tt)
        elif kind == "walk":
            j[:, ROOT, 0] += 0.02 * tt
            j[:, :, 0] += 0.02 * tt[:, None]
        return j

    def test_deterministic_and_distinct(self):
        from syntalker_tpu.data.captions import caption_motion

        a = caption_motion(self._joints("left_wave"))
        b = caption_motion(self._joints("both_fast"))
        c = caption_motion(self._joints("left_wave"))
        assert a.text == c.text
        assert a.text != b.text
        assert "left" in a.text
        assert "both" in b.text
        assert len(a.tokens) == len(a.pos)

    def test_walk_vs_stand(self):
        from syntalker_tpu.data.captions import caption_motion

        assert "walks" in caption_motion(self._joints("walk")).text
        assert "stands" in caption_motion(self._joints("left_wave")).text

    def test_t2m_inputs_shapes(self):
        from syntalker_tpu.data.captions import (
            caption_motion,
            caption_to_t2m_inputs,
        )

        cap = caption_motion(self._joints("both_fast"))
        w, p, n = caption_to_t2m_inputs(cap)
        assert w.shape == (20, 300) and p.shape == (20, 15)
        assert n == len(cap.tokens)
        assert (p[:n].sum(axis=1) == 1).all()
        # hash vectors are word-stable
        w2, _, _ = caption_to_t2m_inputs(cap)
        np.testing.assert_array_equal(w, w2)


class TestOracleTraining:
    def test_contrastive_step_learns_and_roundtrips(self, tmp_path):
        """Co-embedding InfoNCE must fall on a learnable toy corpus, and the
        fp16 npz artifact must round-trip through load_oracle_params."""
        import optax

        from syntalker_tpu.eval.t2m import (
            MotionEncoderBiGRUCo,
            T2MEvalConfig,
            TextEncoderBiGRUCo,
            load_oracle_params,
            make_t2m_oracle_train_step,
            save_oracle_params,
        )

        cfg = T2MEvalConfig(dim_pose=16, dim_movement=16, dim_coemb=16, hidden=32)
        me, te = MotionEncoderBiGRUCo(cfg), TextEncoderBiGRUCo(cfg)
        rng = jax.random.PRNGKey(0)
        params = {
            "motion": me.init(rng, jnp.zeros((1, 16, 16)), jnp.asarray([16]))["params"],
            "text": te.init(rng, jnp.zeros((1, 6, 300)), jnp.zeros((1, 6, 15)),
                            jnp.asarray([6]))["params"],
        }
        opt = optax.adam(3e-4)
        opt_state = opt.init(params)
        step = jax.jit(make_t2m_oracle_train_step(me, te, opt))

        # toy corpus: 2 classes with distinct motions and distinct captions
        rngn = np.random.default_rng(1)
        def batch(b=16):
            cls = rngn.integers(0, 2, b)
            motion = np.where(
                cls[:, None, None], 1.0, -1.0
            ) + 0.1 * rngn.normal(size=(b, 16, 16))
            w = np.zeros((b, 6, 300), np.float32)
            w[np.arange(b), :, cls] = 1.0
            return {
                "motion": jnp.asarray(motion, jnp.float32),
                "m_lens": jnp.full((b,), 16, jnp.int32),
                "word_embs": jnp.asarray(w),
                "pos_ohot": jnp.zeros((b, 6, 15)),
                "cap_lens": jnp.full((b,), 6, jnp.int32),
            }

        first = None
        for _ in range(60):
            params, opt_state, m = step(params, opt_state, batch())
            if first is None:
                first = float(m["nce"])
        last = float(m["nce"])
        assert last < first, (first, last)

        p = save_oracle_params(tmp_path / "oracle.npz", params, meta={"k": 1})
        restored = load_oracle_params(p, params)
        a = jax.tree_util.tree_leaves(params)[0]
        b_ = jax.tree_util.tree_leaves(restored)[0]
        assert np.abs(np.asarray(a) - np.asarray(b_)).max() < 2e-3  # fp16


class TestCommittedOracle:
    def test_from_artifact_loads_trained_weights(self):
        """The committed oracle artifact must load through from_artifact and
        differ from random init (i.e., it actually carries trained weights).
        Metadata records its held-out R-precision above chance."""
        import json
        from pathlib import Path

        from syntalker_tpu.eval.t2m import T2MEvaluator

        art = Path(T2MEvaluator.DEFAULT_ARTIFACT)
        if not art.exists():
            import pytest
            pytest.skip("oracle artifact not present")
        ev = T2MEvaluator.from_artifact()
        fresh = T2MEvaluator(ev.cfg)
        a = jax.tree_util.tree_leaves(ev.params)[0]
        b = jax.tree_util.tree_leaves(fresh.params)[0]
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-3
        emb = ev.get_motion_embeddings(np.zeros((2, 32, ev.cfg.dim_pose)), np.array([32, 32]))
        assert emb.shape == (2, ev.cfg.dim_coemb)
        meta = json.loads(art.with_suffix(".json").read_text())
        assert meta["eval"]["r_precision_top1"] > meta["eval"]["chance_top1"]
