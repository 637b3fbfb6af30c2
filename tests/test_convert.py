"""Numerical parity: reference torch RVQVAE (run as an oracle from
/root/reference) vs our JAX implementation with converted weights.

This is the strongest correctness pin available without released
checkpoints: a randomly-initialized reference model and the converted JAX
model must produce matching encoder/decoder/quantizer outputs.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_rvqvae():
    sys.path.insert(0, REF)
    try:
        from models.vq.model import RVQVAE as TorchRVQVAE
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")

    args = types.SimpleNamespace(
        num_quantizers=4,
        shared_codebook=False,
        quantize_dropout_prob=0.2,
        mu=0.99,
    )
    torch.manual_seed(0)
    # reference quantizer registers buffers with .cuda(); stub it out on CPU
    cuda_avail = torch.cuda.is_available()
    if not cuda_avail:
        torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore
    model = TorchRVQVAE(
        args, input_width=30, nb_code=64, code_dim=96, output_emb_width=96,
        down_t=2, stride_t=2, width=48, depth=3, dilation_growth_rate=3,
        activation="relu", norm=None,
    )
    model.eval()
    # give codebooks data-dependent values (lazy-init path needs training)
    with torch.no_grad():
        for layer in model.quantizer.layers:
            layer.codebook.copy_(torch.randn_like(layer.codebook))
            layer.init = True
    return model


@pytest.fixture(scope="module")
def converted(ref_rvqvae):
    from syntalker_tpu.convert import convert_rvqvae
    from syntalker_tpu.models.rvqvae import RVQVAE, RVQVAEConfig
    from syntalker_tpu.ops.quantize import RVQConfig

    params, qstate = convert_rvqvae(
        ref_rvqvae.state_dict(), down_t=2, depth=3, num_quantizers=4
    )
    cfg = RVQVAEConfig(
        input_dim=30, width=48, output_emb_width=96, down_t=2, depth=3,
        quantizer=RVQConfig(num_quantizers=4, nb_code=64, code_dim=96),
    )
    return RVQVAE(cfg), params, qstate


def _x(b=2, t=32, d=30, seed=1):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(b, t, d)).astype(np.float32)


class TestTorchParity:
    def test_encoder_map2latent(self, ref_rvqvae, converted):
        import jax.numpy as jnp

        module, params, _ = converted
        x = _x()
        with torch.no_grad():
            ref = ref_rvqvae.map2latent(torch.from_numpy(x)).numpy()
        ours = np.asarray(module.apply(params, jnp.asarray(x), method="map2latent"))
        assert ref.shape == ours.shape == (2, 8, 96)
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_latent2origin_full_path(self, ref_rvqvae, converted):
        import jax.numpy as jnp

        module, params, qstate = converted
        z = np.random.default_rng(2).normal(size=(2, 8, 96)).astype(np.float32) * 3
        with torch.no_grad():
            # NB: the reference quantizer mutates its input in place
            # (residual_vq.py:148 `residual -= ...`), and from_numpy shares
            # memory — pass a copy so our run sees the original z
            ref = ref_rvqvae.latent2origin(torch.from_numpy(z.copy()))[0].numpy()
        ours = np.asarray(
            module.apply(params, jnp.asarray(z), qstate, method="latent2origin")
        )
        assert ref.shape == ours.shape
        np.testing.assert_allclose(ours, ref, atol=5e-4)

    def test_token_encode_matches(self, ref_rvqvae, converted):
        import jax.numpy as jnp

        module, params, qstate = converted
        x = _x(seed=3)
        with torch.no_grad():
            ref_idx, _ = ref_rvqvae.encode(torch.from_numpy(x.copy()))
        ours_idx = np.asarray(
            module.apply(params, jnp.asarray(x), qstate, method="encode")
        )
        # torch path returns (B, T, Q) after internal reshape
        ref_idx = ref_idx.numpy().reshape(ours_idx.shape)
        mismatch = (ref_idx != ours_idx).mean()
        assert mismatch < 0.01, f"token mismatch rate {mismatch}"


@pytest.fixture(scope="module")
def ref_mdm(tmp_path_factory):
    """Reference MDM built as an oracle (random init, eval mode), with a
    fabricated vocab.pkl matching our tiny vocab size."""
    import pickle
    import types

    sys.path.insert(0, REF)
    # stub the reference module's unavailable deps (lmdb/fasttext/loguru)
    for name in ("lmdb", "fasttext"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")
        loguru.logger = types.SimpleNamespace(
            info=lambda *a, **k: None, warning=lambda *a, **k: None
        )
        sys.modules["loguru"] = loguru
    from dataloaders.build_vocab import Vocab as RefVocab

    data_path = tmp_path_factory.mktemp("refdata")
    (data_path / "weights").mkdir()
    v = RefVocab("test")
    rng = np.random.default_rng(0)
    for i in range(56):
        v.index_word(f"w{i}")
    v.word_embedding_weights = rng.normal(0, 0.1, (v.n_words, 300)).astype(np.float32)
    with open(data_path / "weights" / "vocab.pkl", "wb") as f:
        pickle.dump(v, f)

    args = types.SimpleNamespace(
        vqvae_type="rvqvae",
        audio_rep="onset+amplitude",
        audio_f=256,
        word_f=256,
        t_fix_pre=False,
        use_motionclip=False,
        vqvae_squeeze_scale=4,
        data_path=str(data_path) + "/",
    )
    torch.manual_seed(0)
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore
    from models.denoiser import MDM as RefMDM

    model = RefMDM(args).eval()
    return model, v.n_words


class TestMDMConversion:
    def test_full_forward_parity(self, ref_mdm):
        import jax
        import jax.numpy as jnp

        from syntalker_tpu.convert import convert_mdm
        from syntalker_tpu.models.denoiser import MDM, MDMConfig

        ref, n_words = ref_mdm
        rng = np.random.default_rng(1)
        b, frames = 2, 128
        x = rng.normal(size=(b, 1536, 1, 32)).astype(np.float32)
        t = np.array([10, 500])
        audio = rng.normal(size=(b, 16000 // 30 * frames, 2)).astype(np.float32)
        word = rng.integers(0, n_words, (b, frames))
        seed = rng.normal(size=(b, 4, 1536)).astype(np.float32)

        with torch.no_grad():
            y = {
                "audio": torch.from_numpy(audio.copy()),
                "word": torch.from_numpy(word.copy()).long(),
                "seed": torch.from_numpy(seed.copy()),
                "id": None,
                "mask": None,
            }
            out_ref = ref(
                torch.from_numpy(x.copy()), torch.from_numpy(t.copy()).long(), y
            ).numpy()

        cfg = MDMConfig(vocab_size=n_words, audio_norm="none", dropout=0.0)
        module = MDM(cfg)
        variables = convert_mdm(ref.state_dict())
        out = module.apply(
            variables,
            jnp.asarray(np.transpose(x[:, :, 0, :], (0, 2, 1))),  # (B, T, 1536)
            jnp.asarray(t),
            jnp.asarray(audio),
            jnp.asarray(word),
            jnp.asarray(seed),
        )
        out = np.transpose(np.asarray(out), (0, 2, 1))[:, :, None, :]
        assert out.shape == out_ref.shape
        denom = np.abs(out_ref).max() + 1e-9
        rel = np.abs(out - out_ref).max() / denom
        assert rel < 5e-3, f"relative error {rel}"


def _stub_ref_deps():
    """Stub the reference's unavailable imports (smplx/lmdb/fasttext/loguru)."""
    import types as _t

    for name in ("lmdb", "fasttext", "smplx"):
        sys.modules.setdefault(name, _t.ModuleType(name))
    if "loguru" not in sys.modules:
        loguru = _t.ModuleType("loguru")
        loguru.logger = _t.SimpleNamespace(
            info=lambda *a, **k: None, warning=lambda *a, **k: None
        )
        sys.modules["loguru"] = loguru


@pytest.fixture(scope="module")
def ref_eval_vae():
    """Reference VAESKConv equivalent (LocalEncoder + VQDecoderV3 composed
    directly — motion_representation.py:67-75 only additionally loads the
    SMPL-X kintree from an npz we don't have; the topology is our PARENTS)."""
    sys.path.insert(0, REF)
    _stub_ref_deps()
    from models.motion_encoder import LocalEncoder, VQDecoderV3
    from models.utils.skeleton import build_edge_topology as ref_edges

    from syntalker_tpu.ops.smplx import PARENTS

    args = types.SimpleNamespace(
        vae_layer=4, vae_length=240, vae_test_dim=330, vae_grow=[1, 1, 2, 1],
    )
    torch.manual_seed(0)

    class RefEvalVAE(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = LocalEncoder(args, ref_edges([int(p) for p in PARENTS]))
            self.decoder = VQDecoderV3(args)

    return RefEvalVAE().eval()


class TestEvalVAEConversion:
    """FGD oracle parity: converted VAESKConv must reproduce the reference's
    map2latent embedding (the FGD feature space) and reconstruction."""

    def test_map2latent_and_decode(self, ref_eval_vae):
        import jax.numpy as jnp

        from syntalker_tpu.convert import convert_eval_vae
        from syntalker_tpu.models.eval_vae import VAESKConv

        x = _x(b=2, t=32, d=330, seed=5)
        with torch.no_grad():
            z_ref = ref_eval_vae.encoder(torch.from_numpy(x.copy())).numpy()
            rec_ref = ref_eval_vae.decoder(torch.from_numpy(z_ref.copy())).numpy()

        module = VAESKConv()
        variables = convert_eval_vae(ref_eval_vae.state_dict())
        z = np.asarray(
            module.apply(variables, jnp.asarray(x), method="map2latent")
        )
        assert z.shape == z_ref.shape
        np.testing.assert_allclose(z, z_ref, atol=2e-5)
        rec = np.asarray(module.apply(variables, jnp.asarray(z_ref), method="decode"))
        np.testing.assert_allclose(rec, rec_ref, atol=2e-5)


@pytest.fixture(scope="module")
def ref_face_vqvae():
    """Reference face VQVAE (VQVAEConvZero's parts composed directly —
    motion_representation.py:178-211; avoids the module's smplx import)."""
    sys.path.insert(0, REF)
    _stub_ref_deps()
    from models.motion_encoder import VQDecoderV5, VQEncoderV5
    from models.quantizer import Quantizer

    args = types.SimpleNamespace(
        vae_layer=2, vae_length=256, vae_test_dim=106,
        vae_codebook_size=256, vae_quantizer_lambda=0.25,
    )
    torch.manual_seed(1)

    class RefFaceVQVAE(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = VQEncoderV5(args)
            self.quantizer = Quantizer(
                args.vae_codebook_size, args.vae_length, args.vae_quantizer_lambda
            )
            self.decoder = VQDecoderV5(args)

    return RefFaceVQVAE().eval()


class TestFaceVQVAEConversion:
    def test_map2index_and_decode(self, ref_face_vqvae):
        import jax.numpy as jnp

        from syntalker_tpu.convert import convert_face_vqvae
        from syntalker_tpu.models.eval_vae import VQVAEConvZero

        x = _x(b=2, t=34, d=106, seed=7)
        with torch.no_grad():
            z = ref_face_vqvae.encoder(torch.from_numpy(x.copy()))
            idx_ref = ref_face_vqvae.quantizer.map2index(z).numpy()
            zq = ref_face_vqvae.quantizer.get_codebook_entry(
                torch.from_numpy(idx_ref.copy())
            )
            rec_ref = ref_face_vqvae.decoder(zq).numpy()

        module = VQVAEConvZero()
        variables = convert_face_vqvae(ref_face_vqvae.state_dict())
        idx = np.asarray(
            module.apply(variables, jnp.asarray(x), method="map2index")
        ).reshape(idx_ref.shape)
        mismatch = (idx != idx_ref).mean()
        assert mismatch < 0.01, f"face token mismatch rate {mismatch}"
        rec = np.asarray(
            module.apply(variables, jnp.asarray(idx_ref), method="decode_indices")
        )
        np.testing.assert_allclose(rec, rec_ref, atol=2e-5)
