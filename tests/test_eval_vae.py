"""Skeleton-conv eval VAE + face VQVAE tests: topology plans, masked conv
locality, end-to-end shapes (FGD latent must be 240-d per 1/16-rate frame)."""

import jax
import jax.numpy as jnp
import numpy as np

from syntalker_tpu.models import skeleton as SK
from syntalker_tpu.models.eval_vae import (
    EvalVAEConfig,
    VAESKConv,
    VQVAEConvZero,
    legacy_vq,
)
from syntalker_tpu.ops.smplx import PARENTS


class TestTopology:
    def test_edges(self):
        edges = SK.build_edge_topology(PARENTS.tolist())
        assert len(edges) == 55  # virtual root edge + 54 bones
        assert edges[0] == (0, 55)

    def test_neighbor_symmetry(self):
        edges = SK.build_edge_topology(PARENTS.tolist())
        neigh = SK.find_neighbor(edges, 2)
        for i, ns in enumerate(neigh):
            assert i in ns
            for j in ns:
                assert i in neigh[j]

    def test_pooling_plan_partition(self):
        edges = SK.build_edge_topology(PARENTS.tolist())
        plan = SK.skeleton_pooling_plan(edges)
        covered = sorted(e for g in plan.pooling_list for e in g)
        assert covered == list(range(55))  # every edge pooled exactly once
        assert len(plan.new_edges) == len(plan.pooling_list)

    def test_pool_matrix_rows_sum_to_one(self):
        edges = SK.build_edge_topology(PARENTS.tolist())
        plan = SK.skeleton_pooling_plan(edges)
        w = SK.pooling_matrix(plan, channels_per_edge=2, n_edges=55)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)


class TestSkeletonConv:
    def test_locality_mask(self):
        # an input perturbation on a far edge must not change a local output
        edges = SK.build_edge_topology(PARENTS.tolist())
        neigh = SK.find_neighbor(edges, 1)
        conv = SK.SkeletonConv(
            tuple(tuple(n) for n in neigh), in_per_joint=2, out_per_joint=2,
            kernel_size=3, stride=1, padding=1,
        )
        x = jnp.zeros((1, 8, 55 * 2))
        params = conv.init(jax.random.PRNGKey(0), x)
        y0 = conv.apply(params, x)
        # perturb a hand edge (far from the pelvis edges)
        far_edge = 30
        x2 = x.at[:, :, far_edge * 2].set(10.0)
        y1 = conv.apply(params, x2)
        diff = np.asarray(jnp.abs(y1 - y0).max(axis=(0, 1)))
        changed = set(np.nonzero(diff > 1e-8)[0] // 2)
        assert changed  # neighbors change
        assert changed <= set(neigh[far_edge]), (changed, neigh[far_edge])


class TestVAESKConv:
    def test_fgd_latent_geometry(self):
        cfg = EvalVAEConfig()
        model = VAESKConv(cfg)
        x = jnp.zeros((2, 32, 330))  # vae_test_len window
        params = model.init(jax.random.PRNGKey(0), x)
        z = model.apply(params, x, method="map2latent")
        # 4 stride-2 layers: 32 -> 2 frames; channels must be vae_length=240
        assert z.shape == (2, 2, 240), z.shape
        out = model.apply(params, x)
        assert out["rec_pose"].shape == (2, 32, 330)

    def test_latent_sensitive_to_pose(self):
        cfg = EvalVAEConfig()
        model = VAESKConv(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 330))
        params = model.init(jax.random.PRNGKey(0), x)
        z1 = model.apply(params, x, method="map2latent")
        z2 = model.apply(params, x * 2, method="map2latent")
        assert float(jnp.abs(z1 - z2).max()) > 1e-4


class TestFaceVQVAE:
    def test_shapes_and_quantization(self):
        model = VQVAEConvZero()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 106))
        params = model.init(jax.random.PRNGKey(1), x)
        out = model.apply(params, x)
        assert out["rec_pose"].shape == (2, 16, 106)
        z = model.apply(params, x, method="map2latent")
        assert z.shape == (2, 16, 256)
        idx = model.apply(params, x, method="map2index")
        assert idx.shape == (2, 16)
        assert int(idx.max()) < 256

    def test_legacy_vq_straight_through(self):
        cb = jax.random.normal(jax.random.PRNGKey(0), (8, 4))
        z = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4))

        def f(z):
            loss, z_q, idx, perp = legacy_vq(z, cb)
            return jnp.sum(z_q)

        g = jax.grad(f)(z)
        np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)
