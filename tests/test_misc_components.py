"""MotionCLIP, BVH interchange, AE trainers, trackers, resume."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from syntalker_tpu.data import bvh
from syntalker_tpu.models.eval_vae import EvalVAEConfig, VAESKConv, VQVAEConvZero
from syntalker_tpu.models.motionclip import (
    MotionCLIP,
    MotionCLIPConfig,
    clip_alignment_loss,
)
from syntalker_tpu.ops.smplx import PARENTS
from syntalker_tpu.train.ae_trainer import (
    make_eval_vae_train_step,
    make_face_vqvae_train_step,
)
from syntalker_tpu.train.state import create_train_state
from syntalker_tpu.utils.tracking import AverageMeter, EpochTracker


class TestMotionCLIP:
    def test_embedding_shape_and_loss(self):
        cfg = MotionCLIPConfig(latent_dim=32, ff_size=64, num_layers=1, num_heads=2, clip_dim=16)
        model = MotionCLIP(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 132))
        params = model.init(jax.random.PRNGKey(1), x)["params"]
        emb = model.apply({"params": params}, x)
        assert emb.shape == (2, 16)
        loss = clip_alignment_loss(emb, emb)
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)
        loss2 = clip_alignment_loss(emb, -emb)
        np.testing.assert_allclose(float(loss2), 2.0, atol=1e-5)


class TestBVH:
    def test_write_parse_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        t = 5
        offsets = rng.normal(0, 0.1, (55, 3))
        rots = rng.uniform(-40, 40, (t, 55, 3))
        root_pos = rng.normal(0, 1, (t, 3))
        from syntalker_tpu.data.joints import JOINT_NAMES

        p = bvh.write_bvh(
            tmp_path / "out.bvh", PARENTS, list(JOINT_NAMES), offsets, rots, root_pos
        )
        data = bvh.parse_bvh(p)
        assert len(data.joints) == 55
        assert data.frames.shape == (t, 55 * 3 + 3)
        np.testing.assert_allclose(data.fps, 30.0, rtol=1e-4)
        # parent structure round-trips
        parsed_parents = [j.parent for j in data.joints]
        # the DFS emission order may reorder siblings; root must be first
        assert parsed_parents[0] == -1

    def test_smplx_export(self, tmp_path):
        poses = np.load("/root/reference/demo/examples/2_scott_0_1_1.npz")["poses"][:4]
        trans = np.zeros((4, 3))
        p = bvh.smplx_to_bvh(poses, trans, np.zeros((55, 3)), tmp_path / "m.bvh")
        data = bvh.parse_bvh(p)
        assert data.frames.shape[0] == 4

    def test_positions_simple_chain(self, tmp_path):
        """FK against hand-computed positions on a 3-joint chain: root with
        translation, child rotated 90° about Z, grandchild offset along X.
        Covers the MocapParameterizer('position') surface
        (data_tools.py:1579-1586)."""
        text = """HIERARCHY
ROOT a
{
  OFFSET 0 0 0
  CHANNELS 6 Xposition Yposition Zposition Zrotation Xrotation Yrotation
  JOINT b
  {
    OFFSET 1 0 0
    CHANNELS 3 Zrotation Xrotation Yrotation
    JOINT c
    {
      OFFSET 1 0 0
      CHANNELS 3 Zrotation Xrotation Yrotation
      End Site
      {
        OFFSET 0 0 0
      }
    }
  }
}
MOTION
Frames: 2
Frame Time: 0.033333
0 0 0 0 0 0 0 0 0 0 0 0
1 2 3 0 0 0 90 0 0 0 0 0
"""
        p = tmp_path / "chain.bvh"
        p.write_text(text)
        data = bvh.parse_bvh(p)
        pos = bvh.bvh_to_positions(data)
        assert pos.shape == (2, 3, 3)
        # frame 0: rest pose — joints at x=0,1,2
        np.testing.assert_allclose(pos[0], [[0, 0, 0], [1, 0, 0], [2, 0, 0]], atol=1e-6)
        # frame 1: root moved to (1,2,3); b rotated +90° about Z so c's
        # offset (1,0,0) maps to (0,1,0) in world
        np.testing.assert_allclose(pos[1, 0], [1, 2, 3], atol=1e-6)
        np.testing.assert_allclose(pos[1, 1], [2, 2, 3], atol=1e-6)
        np.testing.assert_allclose(pos[1, 2], [2, 3, 3], atol=1e-5)

    def test_positions_roundtrip_vs_direct_fk(self, tmp_path):
        """write_bvh -> parse_bvh -> bvh_to_positions must equal direct FK
        over the same rotations/offsets (random 8-joint tree)."""
        rng = np.random.default_rng(4)
        parents = np.array([-1, 0, 1, 1, 0, 4, 5, 5])
        offsets = rng.normal(0, 0.5, (8, 3))
        t = 6
        rots = rng.uniform(-60, 60, (t, 8, 3))  # ZXY degrees
        root_pos = rng.normal(0, 1, (t, 3))
        names = [f"j{i}" for i in range(8)]
        p = bvh.write_bvh(tmp_path / "t.bvh", parents, names, offsets, rots, root_pos)
        pos = bvh.bvh_to_positions(bvh.parse_bvh(p))

        from scipy.spatial.transform import Rotation

        # direct FK in the original joint indexing
        world_r = np.zeros((t, 8, 3, 3))
        world_p = np.zeros((t, 8, 3))
        for i in range(8):
            local = Rotation.from_euler("ZXY", rots[:, i], degrees=True).as_matrix()
            if parents[i] < 0:
                world_r[:, i] = local
                world_p[:, i] = offsets[i] + root_pos
            else:
                pa = parents[i]
                world_r[:, i] = world_r[:, pa] @ local
                world_p[:, i] = world_p[:, pa] + np.einsum(
                    "tab,b->ta", world_r[:, pa], offsets[i]
                )
        # parsed joints may be DFS-reordered; match by name
        data = bvh.parse_bvh(p)
        for k, joint in enumerate(data.joints):
            i = names.index(joint.name)
            np.testing.assert_allclose(pos[:, k], world_p[:, i], atol=1e-5)

    def test_euler_consistency(self):
        import jax.numpy as jnp

        from syntalker_tpu.ops import rotations as R

        aa = np.array([[0.3, -0.2, 0.5]])
        m = np.asarray(R.axis_angle_to_matrix(jnp.asarray(aa)))
        eul = bvh.matrix_to_euler_zxy_deg(m)
        from scipy.spatial.transform import Rotation

        m2 = Rotation.from_euler("ZXY", eul[0], degrees=True).as_matrix()
        np.testing.assert_allclose(m2, m[0], atol=1e-6)


class TestAETrainers:
    def test_eval_vae_step_reduces_loss(self):
        model = VAESKConv(EvalVAEConfig())
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 330)) * 0.1
        params = model.init(jax.random.PRNGKey(1), x)["params"]
        opt = optax.adam(1e-3)
        state = create_train_state(params, opt, jax.random.PRNGKey(2))
        step = jax.jit(make_eval_vae_train_step(model, opt))
        losses = []
        for _ in range(5):
            state, m = step(state, x)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]

    def test_face_vqvae_step(self):
        model = VQVAEConvZero(input_dim=20, latent_dim=32, num_layers=1, codebook_size=16)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 20))
        params = model.init(jax.random.PRNGKey(1), x)["params"]
        opt = optax.adam(1e-3)
        state = create_train_state(params, opt, jax.random.PRNGKey(2))
        step = jax.jit(make_face_vqvae_train_step(model, opt))
        state, m = step(state, x)
        assert np.isfinite(float(m["loss"]))
        assert float(m["perplexity"]) >= 1.0


class TestTracking:
    def test_average_meter(self):
        m = AverageMeter()
        m.update(1.0)
        m.update(3.0)
        assert m.avg == 2.0

    def test_epoch_tracker_best(self):
        t = EpochTracker({"fid": False, "bc": True})
        t.update("fid", "test", 5.0)
        t.update("bc", "test", 0.5)
        out1 = t.end_epoch(0)
        assert "test/fid" in out1["_improved"]
        t.update("fid", "test", 6.0)  # worse (lower is better)
        t.update("bc", "test", 0.7)  # better (higher is better)
        out2 = t.end_epoch(1)
        assert "test/fid" not in out2["_improved"]
        assert "test/bc" in out2["_improved"]


class TestOptimizerFactory:
    def test_all_named_optimizers_step(self):
        import jax
        import jax.numpy as jnp
        import optax as _optax

        from syntalker_tpu.train.state import make_optimizer, make_schedule

        params = {"w": jnp.ones((4, 4))}
        grads = {"w": jnp.ones((4, 4)) * 0.1}
        for name in ("adam", "adamw", "sgd", "adabelief", "lamb", "radam",
                     "adagrad", "rmsprop", "lion"):
            tx = make_optimizer(name, 1e-3, grad_clip=1.0, weight_decay=1e-4)
            st = tx.init(params)
            upd, st = tx.update(grads, st, params)
            new = _optax.apply_updates(params, upd)
            assert jnp.isfinite(new["w"]).all(), name

    def test_schedules(self):
        from syntalker_tpu.train.state import make_schedule

        for name in ("cosine", "step", "tanh", "constant"):
            s = make_schedule(name, 1e-3, total_steps=100, warmup_steps=10,
                              decay_steps=50)
            v0, v50 = float(s(0)), float(s(50))
            assert v0 >= 0 and v50 > 0
        s = make_schedule("step", 1.0, decay_steps=10, decay_rate=0.1)
        assert abs(float(s(10)) - 0.1) < 1e-6


class TestMotionCLIPDecoder:
    def test_encode_decode_train_step(self):
        import optax

        from syntalker_tpu.models.motionclip import (
            MotionCLIP,
            MotionCLIPConfig,
            MotionCLIPDecoder,
            make_motionclip_train_step,
        )

        cfg = MotionCLIPConfig(clip_dim=16, latent_dim=16, ff_size=32,
                               num_layers=2, num_heads=2)
        enc = MotionCLIP(cfg)
        dec = MotionCLIPDecoder(cfg, num_frames=12)
        rng = jax.random.PRNGKey(0)
        motion = jax.random.normal(rng, (4, 12, cfg.input_feats))
        params = {
            "enc": enc.init(rng, motion)["params"],
            "dec": dec.init(jax.random.fold_in(rng, 1), jnp.zeros((4, 16)))["params"],
        }
        rec = dec.apply({"params": params["dec"]},
                        enc.apply({"params": params["enc"]}, motion))
        assert rec.shape == motion.shape

        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        step = jax.jit(make_motionclip_train_step(enc, dec, opt))
        batch = {"motion": motion,
                 "clip_emb": jax.random.normal(jax.random.fold_in(rng, 2), (4, 16))}
        first = None
        for _ in range(30):
            params, opt_state, m = step(params, opt_state, batch)
            if first is None:
                first = float(m["loss"])
        assert float(m["loss"]) < first
