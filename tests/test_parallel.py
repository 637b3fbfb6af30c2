"""Parallelism correctness: sharded execution must be numerically
equivalent to single-device execution (the reference's DDP could fork
EMA codebooks per replica — ours must not, by construction)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from syntalker_tpu.ops.quantize import RVQConfig, init_rvq_state, rvq_forward
from syntalker_tpu.parallel.mesh import make_mesh, replicate, shard_batch, shard_params

CFG = RVQConfig(num_quantizers=3, nb_code=32, code_dim=16, quantize_dropout_prob=0.0)


class TestShardedQuantizer:
    def test_codebook_update_identical_under_data_sharding(self):
        # One global batch, executed (a) on one device, (b) sharded over the
        # 8-device data axis. The EMA counts/sums are global reductions, so
        # the resulting codebooks must match to float tolerance.
        x = jax.random.normal(jax.random.PRNGKey(0), (16, 8, 16))
        state = init_rvq_state(CFG)
        rng = jax.random.PRNGKey(1)

        f = jax.jit(lambda x, s: rvq_forward(x, s, CFG, train=True, rng=rng).state)
        single = f(x, state)

        mesh = make_mesh(data=8, model=1)
        with mesh:
            xs = jax.device_put(x, NamedSharding(mesh, P("data")))
            ss = replicate(state, mesh)
            sharded = f(xs, ss)

        np.testing.assert_allclose(
            np.asarray(single.codebook), np.asarray(sharded.codebook), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(single.code_count), np.asarray(sharded.code_count), atol=1e-5
        )

    def test_quantized_outputs_match(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (16, 4, 16))
        state = init_rvq_state(CFG)
        state = rvq_forward(x, state, CFG, train=True, rng=jax.random.PRNGKey(3)).state

        f = jax.jit(lambda x: rvq_forward(x, state, CFG, train=False).quantized)
        single = f(x)
        mesh = make_mesh(data=8, model=1)
        with mesh:
            sharded = f(jax.device_put(x, NamedSharding(mesh, P("data"))))
        np.testing.assert_allclose(np.asarray(single), np.asarray(sharded), atol=1e-6)


class TestShardedTrainStep:
    def test_diffusion_step_loss_matches_single_device(self):
        from syntalker_tpu.diffusion.schedule import make_diffusion
        from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
        from syntalker_tpu.train.diffusion_trainer import (
            DiffusionTrainConfig,
            make_diffusion_train_step,
        )
        from syntalker_tpu.train.state import create_train_state, make_diffusion_optimizer

        cfg = MDMConfig(
            latent_total_dim=48, latent_dim=32, ff_size=64, num_layers=1,
            num_heads=2, rope_heads=4, audio_feat_dim=16, word_feat_dim=16,
            word_embed_dim=8, vocab_size=32, dropout=0.0,
        )
        frames = 32
        rng = jax.random.PRNGKey(0)
        module, params = create_mdm(cfg, rng, frames=frames)
        diffusion = make_diffusion(steps=8)
        opt = make_diffusion_optimizer()
        step = jax.jit(make_diffusion_train_step(module, diffusion, opt, DiffusionTrainConfig()))

        b = 16
        batch = {
            "latent_in": jax.random.normal(rng, (b, frames // 4, 48)),
            "audio": jax.random.normal(jax.random.fold_in(rng, 1), (b, 533 * frames, 2)),
            "word": jnp.zeros((b, frames), jnp.int32),
        }
        state = create_train_state(params, opt, rng)
        _, m_single = step(state, batch)

        mesh = make_mesh(data=4, model=2)
        with mesh:
            state_s = state.replace(
                params=shard_params(params, mesh),
                opt_state=replicate(state.opt_state, mesh),
                step=replicate(state.step, mesh),
                rng=replicate(state.rng, mesh),
            )
            batch_s = shard_batch(batch, mesh)
            _, m_sharded = step(state_s, batch_s)

        np.testing.assert_allclose(
            float(m_single["predict_x0_loss"]),
            float(m_sharded["predict_x0_loss"]),
            rtol=2e-4,
        )


class TestExplicitTPLayout:
    def test_layout_table_matches_expected_params(self):
        """Every entry of MDM_TP_LAYOUT must match a real MDM parameter, and
        everything else must come back replicated — embeddings in particular
        (VERDICT Weak #6: the old heuristic would have sharded any new large
        kernel; the table defaults new params to replicated)."""
        from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
        from syntalker_tpu.parallel.mesh import MDM_TP_LAYOUT, _path_str, param_specs

        cfg = MDMConfig(
            latent_total_dim=48, latent_dim=32, ff_size=64, num_layers=2,
            num_heads=2, rope_heads=4, audio_feat_dim=16, word_feat_dim=16,
            word_embed_dim=8, vocab_size=32,
        )
        _, params = create_mdm(cfg, jax.random.PRNGKey(0), frames=32)
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        names = {_path_str(p) for p, _ in flat}
        for suffix in MDM_TP_LAYOUT:
            assert any(n == suffix or n.endswith("/" + suffix) for n in names), suffix

        specs = param_specs(params)
        flat_s = dict(
            (_path_str(p), s)
            for p, s in jax.tree_util.tree_flatten_with_path(
                specs, is_leaf=lambda s: isinstance(s, P)
            )[0]
        )
        assert flat_s["word_embedding"] == P()
        assert flat_s["output_process/kernel"] == P()
        assert flat_s["blocks/block/qkv/kernel"] == P(None, None, None, "model", None)
        assert flat_s["blocks/block/fc2/kernel"] == P(None, "model", None)

    def test_bad_layout_raises(self):
        from syntalker_tpu.parallel.mesh import shard_params as sp

        mesh = make_mesh(data=4, model=2)
        params = {"odd": {"kernel": jnp.zeros((3, 5))}}
        try:
            sp(params, mesh, layout={"odd/kernel": P(None, "model")})
        except ValueError as e:
            assert "not divisible" in str(e)
        else:
            raise AssertionError("expected ValueError for indivisible layout")

    def test_fullsize_mdm_tp_matches_replicated(self):
        """Full-size (512-dim, 8-block) MDM denoise under model=2 TP must
        reproduce the replicated model=1 numerics (VERDICT next-round #9)."""
        from syntalker_tpu.models.denoiser import MDMConfig, create_mdm

        cfg = MDMConfig()  # the flagship config
        rng = jax.random.PRNGKey(0)
        module, params = create_mdm(cfg, rng, frames=128)
        b = 2
        args = dict(
            x_t=jax.random.normal(jax.random.fold_in(rng, 1), (b, 32, cfg.latent_total_dim)),
            t=jnp.array([7, 431], jnp.int32),
            audio=0.1 * jax.random.normal(jax.random.fold_in(rng, 2), (b, 533 * 128, 2)),
            word=jnp.zeros((b, 128), jnp.int32),
            seed=jax.random.normal(jax.random.fold_in(rng, 3), (b, 4, cfg.latent_total_dim)),
        )

        f = jax.jit(lambda p, a: module.apply({"params": p}, **a))
        mesh1 = make_mesh(data=8, model=1)
        with mesh1:
            ref = np.asarray(f(shard_params(params, mesh1), replicate(args, mesh1)))

        mesh2 = make_mesh(data=4, model=2)
        with mesh2:
            out = np.asarray(f(shard_params(params, mesh2), replicate(args, mesh2)))
        np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-5)


class TestMultihostHelpers:
    def test_single_process_init(self):
        from syntalker_tpu.parallel.multihost import init_multihost, is_primary

        info = init_multihost()
        assert info["process_count"] == 1
        assert info["global_devices"] == 8
        assert is_primary()


class TestRematAndPrefetch:
    def test_remat_forward_matches(self):
        import jax
        from syntalker_tpu.models.denoiser import MDMConfig, create_mdm

        base = dict(
            latent_total_dim=48, latent_dim=32, ff_size=64, num_layers=2,
            num_heads=2, rope_heads=4, audio_feat_dim=16, word_feat_dim=16,
            word_embed_dim=8, vocab_size=32,
        )
        rng = jax.random.PRNGKey(0)
        m1, p1 = create_mdm(MDMConfig(**base), rng, frames=32)
        m2, p2 = create_mdm(MDMConfig(**base, remat=True), rng, frames=32)
        x = {
            "x_t": jax.random.normal(rng, (2, 8, 48)),
            "t": jnp.array([1, 3]),
            "audio": jax.random.normal(rng, (2, 533 * 32, 2)),
            "word": jnp.zeros((2, 32), jnp.int32),
            "seed": jnp.zeros((2, 4, 48)),
        }
        o1 = m1.apply({"params": p1}, **x)
        o2 = m2.apply({"params": p1}, **x)  # same params, remat wrapper
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
        # gradients flow through the remat path
        def loss(p):
            return jnp.sum(m2.apply({"params": p}, **x) ** 2)
        g = jax.grad(loss)(p1)
        assert np.isfinite(jax.tree.leaves(g)[0]).all()

    def test_prefetch_loader_equivalent(self):
        from syntalker_tpu.data.cache import PrefetchLoader

        class Fake:
            def __len__(self):
                return 3

            def epoch(self, e):
                for i in range(3):
                    yield {"i": i, "e": e}

        pre = PrefetchLoader(Fake(), depth=2)
        assert [b["i"] for b in pre.epoch(0)] == [0, 1, 2]
        assert len(pre) == 3


class TestUnrolledTPLayout:
    def test_unrolled_paths_match_layout(self):
        """scan_blocks=False params (block_0/qkv/kernel, one rank lower than
        the scan-stacked layout) must map
        onto the scan-stacked table with the layer dim dropped — TP must not
        be silently disabled by the unrolled layout (ADVICE r2)."""
        from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
        from syntalker_tpu.parallel.mesh import _path_str, param_specs

        cfg = MDMConfig(
            latent_total_dim=48, latent_dim=32, ff_size=64, num_layers=2,
            num_heads=2, rope_heads=4, audio_feat_dim=16, word_feat_dim=16,
            word_embed_dim=8, vocab_size=32, scan_blocks=False,
        )
        _, params = create_mdm(cfg, jax.random.PRNGKey(0), frames=32)
        specs = param_specs(params)
        flat_s = dict(
            (_path_str(p), s)
            for p, s in jax.tree_util.tree_flatten_with_path(
                specs, is_leaf=lambda s: isinstance(s, P)
            )[0]
        )
        assert flat_s["block_0/qkv/kernel"] == P(None, None, "model", None)
        assert flat_s["block_1/fc2/kernel"] == P("model", None)
        assert flat_s["block_1/fc1/bias"] == P("model")
        assert flat_s["word_embedding"] == P()

    def test_unrolled_tp_matches_replicated(self):
        from syntalker_tpu.models.denoiser import MDMConfig, create_mdm

        cfg = MDMConfig(
            latent_total_dim=48, latent_dim=32, ff_size=64, num_layers=2,
            num_heads=2, rope_heads=4, audio_feat_dim=16, word_feat_dim=16,
            word_embed_dim=8, vocab_size=32, scan_blocks=False,
        )
        rng = jax.random.PRNGKey(0)
        module, params = create_mdm(cfg, rng, frames=32)
        b = 2
        args = dict(
            x_t=jax.random.normal(jax.random.fold_in(rng, 1), (b, 8, 48)),
            t=jnp.array([3, 11], jnp.int32),
            audio=0.1 * jax.random.normal(jax.random.fold_in(rng, 2), (b, 533 * 32, 2)),
            word=jnp.zeros((b, 32), jnp.int32),
            seed=jax.random.normal(jax.random.fold_in(rng, 3), (b, 4, 48)),
        )
        f = jax.jit(lambda p, a: module.apply({"params": p}, **a))
        mesh1 = make_mesh(data=8, model=1)
        with mesh1:
            ref = np.asarray(f(shard_params(params, mesh1), replicate(args, mesh1)))
        mesh2 = make_mesh(data=4, model=2)
        with mesh2:
            out = np.asarray(f(shard_params(params, mesh2), replicate(args, mesh2)))
        np.testing.assert_allclose(out, ref, atol=5e-5, rtol=1e-5)

    def test_no_model_sharded_param_raises(self):
        """model>1 with a layout that matches nothing must fail loudly, not
        silently replicate (the 'TP quietly disabled' hazard)."""
        mesh = make_mesh(data=4, model=2)
        params = {"enc": {"kernel": jnp.zeros((8, 8))}}
        try:
            shard_params(params, mesh, layout={"missing/kernel": P(None, "model")})
        except ValueError as e:
            assert "silently disabled" in str(e)
        else:
            raise AssertionError("expected ValueError when nothing matched")

    def test_rank_mismatch_raises_descriptive(self):
        """A 3-d scan-stacked spec matched against a 2-d param must raise the
        descriptive rank error, not IndexError (ADVICE r2)."""
        mesh = make_mesh(data=4, model=2)
        params = {"w": {"kernel": jnp.zeros((8, 8))}}
        try:
            shard_params(params, mesh, layout={"w/kernel": P(None, None, "model")})
        except ValueError as e:
            assert "rank" in str(e)
        else:
            raise AssertionError("expected ValueError for rank mismatch")
