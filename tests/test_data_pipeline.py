"""Data pipeline tests on the shipped reference clip: preprocessing,
windowing arithmetic, cache round trip, TextGrid/vocab, featurization."""

import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syntalker_tpu.data import joints as J
from syntalker_tpu.data.cache import (
    BatchLoader,
    BeatCache,
    ClipConfig,
    emotion_label,
    plan_clip_windows,
    preprocess_clip,
    trans_velocity,
)
from syntalker_tpu.data.features import pose_to_part_rot6d
from syntalker_tpu.data.textgrid import parse_textgrid, words_tier
from syntalker_tpu.data.vocab import Vocab, build_vocab, words_to_frame_ids

NPZ = "/root/reference/demo/examples/2_scott_0_1_1.npz"
WAV = "/root/reference/demo/examples/2_scott_0_1_1.wav"

TG = textwrap.dedent('''\
    File type = "ooTextFile"
    Object class = "TextGrid"

    xmin = 0
    xmax = 2.0
    tiers? <exists>
    size = 1
    item []:
        item [1]:
            class = "IntervalTier"
            name = "words"
            xmin = 0
            xmax = 2.0
            intervals: size = 3
            intervals [1]:
                xmin = 0.0
                xmax = 0.5
                text = ""
            intervals [2]:
                xmin = 0.5
                xmax = 1.2
                text = "hello"
            intervals [3]:
                xmin = 1.2
                xmax = 2.0
                text = "world"
''')


@pytest.fixture()
def tg_file(tmp_path):
    p = tmp_path / "demo.TextGrid"
    p.write_text(TG)
    return p


class TestTextGrid:
    def test_parse_long_format(self, tg_file):
        tiers = parse_textgrid(tg_file)
        assert len(tiers) == 1
        ivs = tiers[0].intervals
        assert len(ivs) == 3
        assert ivs[1].mark == "hello"
        assert ivs[1].min_time == 0.5

    def test_words_to_frame_ids(self, tg_file):
        v = Vocab()
        v.index_word("hello")
        v.index_word("world")
        ids = words_to_frame_ids(words_tier(tg_file), 60, v, fps=30)
        assert ids.shape == (60,)
        assert (ids[:15] == v.PAD_token).all()  # silence
        assert (ids[16:35] == v.get_word_index("hello")).all()
        assert (ids[37:59] == v.get_word_index("world")).all()

    def test_build_vocab(self, tg_file):
        v = build_vocab([tg_file])
        assert v.n_words == 6  # 4 specials + hello + world
        emb = v.build_embedding(dim=16)
        assert emb.shape == (6, 16)

    def test_vocab_save_load(self, tg_file, tmp_path):
        v = build_vocab([tg_file])
        v.build_embedding(dim=8)
        v.save(tmp_path / "vocab.json")
        v2 = Vocab.load(tmp_path / "vocab.json")
        assert v2.get_word_index("hello") == v.get_word_index("hello")
        assert v2.word_embedding_weights.shape == (6, 8)


class TestClipPreprocess:
    def test_trans_velocity_semantics(self):
        trans = np.array([[1.0, 5.0, 2.0], [2.0, 6.0, 4.0], [4.0, 7.0, 7.0]])
        t, v = trans_velocity(trans)
        assert t[0, 0] == 0 and t[0, 2] == 0  # x/z zeroed at origin
        np.testing.assert_allclose(v[:, 1], [5, 6, 7])  # y passthrough
        np.testing.assert_allclose(v[1:, 0], [1, 2])
        np.testing.assert_allclose(v[0, 0], v[1, 0])  # first = second

    def test_emotion_label(self):
        assert emotion_label("2_scott_0_73_73") == 2
        assert emotion_label("2_scott_0_1_1") == 0
        assert emotion_label("2_scott_0_111_111") == 7
        assert emotion_label("garbage") == 0

    def test_preprocess_reference_clip(self):
        arrays = preprocess_clip(NPZ, WAV, None, None)
        n = arrays["poses"].shape[0]
        assert n == 1906
        assert arrays["trans"].shape == (n, 3)
        assert arrays["facial"].shape == (n, 100)
        assert arrays["betas"].shape == (300,)
        assert arrays["audio"].shape[1] == 2
        # audio should cover ~the same duration: 1906/30 s * 16000
        assert abs(arrays["audio"].shape[0] - n / 30 * 16000) < 16000


class TestWindowing:
    def test_train_windows(self):
        cfg = ClipConfig(pose_length=128, stride=20)
        w = plan_clip_windows(1906, 1906 * 533, "c", cfg, is_test=False)
        # 63 whole seconds common -> 1890 usable frames
        assert w[0].start == 0 and w[0].length == 128
        assert w[1].start == 20
        assert len(w) == (1890 - 128) // 20 + 1
        assert w[0].audio_length == 128 * 16000 // 30

    def test_test_window_is_whole_clip(self):
        cfg = ClipConfig()
        w = plan_clip_windows(1906, 1906 * 533, "c", cfg, is_test=True)
        assert len(w) == 1
        assert w[0].length == 1890

    def test_too_short_clip(self):
        cfg = ClipConfig(pose_length=128, stride=20)
        assert plan_clip_windows(90, 90 * 533, "c", cfg, is_test=False) == []


class TestCacheAndLoader:
    def test_round_trip_and_batching(self, tmp_path):
        arrays = preprocess_clip(NPZ, WAV, None, None)
        cfg = ClipConfig(pose_length=128, stride=200)
        cache = BeatCache(tmp_path / "cache")
        cache.add_clip("2_scott_0_1_1", arrays, cfg, is_test=False)
        cache.save_index()

        re = BeatCache.open(tmp_path / "cache")
        assert len(re) == len(cache)
        s = re.get(0)
        assert s["pose"].shape == (128, 169)  # 165 + 4 contacts
        assert s["audio"].shape == (128 * 16000 // 30, 2)
        assert s["word"].shape == (128,)
        assert s["beta"].shape == (128, 300)

        loader = BatchLoader(re, batch_size=4, seed=0)
        batches = list(loader.epoch(0))
        assert len(batches) == len(re) // 4
        assert batches[0]["pose"].shape == (4, 128, 169)
        # determinism
        b2 = next(iter(loader.epoch(0)))
        np.testing.assert_array_equal(batches[0]["pose"], b2["pose"])


class TestFeaturization:
    def test_part_rot6d_from_reference_poses(self):
        poses = np.load(NPZ)["poses"][:8][None]  # (1, 8, 165)
        parts = pose_to_part_rot6d(jnp.asarray(poses))
        assert parts["upper"].shape == (1, 8, 78)
        assert parts["hands"].shape == (1, 8, 180)
        assert parts["lower"].shape == (1, 8, 54)
        assert parts["jaw"].shape == (1, 8, 6)
        assert parts["full"].shape == (1, 8, 330)
        # part features must equal the full-body features gathered per part
        np.testing.assert_allclose(
            np.asarray(parts["upper"]),
            np.asarray(parts["full"][..., J.UPPER_6D_IDX]),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(parts["lower"]),
            np.asarray(parts["full"][..., J.LOWER_6D_IDX]),
            atol=1e-6,
        )
