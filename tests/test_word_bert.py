"""BERT word-representation path (data/word_bert.py; ref
beat_sep_lower.py:432-513). The transformers encoder needs a local
snapshot (absent in this env), so the frame-mapping semantics — the part
the reference actually defines — are tested through the deterministic
fallback encoder, which shares the exact mapping code."""

import numpy as np

from syntalker_tpu.data.textgrid import Interval
from syntalker_tpu.data.word_bert import (
    HashProjectionEncoder,
    bert_frame_features,
    make_encoder,
)


class TestHashProjectionEncoder:
    def test_deterministic_and_normalized(self):
        e = HashProjectionEncoder()
        h1, m1 = e.encode_words(["hello", "world"])
        h2, m2 = e.encode_words(["hello", "world"])
        np.testing.assert_array_equal(h1, h2)
        assert m1 == m2
        np.testing.assert_allclose(np.linalg.norm(h1, axis=1), 1.0, rtol=1e-5)

    def test_subword_split_multi_token(self):
        e = HashProjectionEncoder()
        _h, m = e.encode_words(["internationalization"])
        assert len(m[0]) > 1  # long word -> several subword tokens

    def test_distinct_words_distinct_vectors(self):
        e = HashProjectionEncoder()
        h, m = e.encode_words(["cat", "dog"])
        assert not np.allclose(h[m[0][0]], h[m[1][0]])


class TestBertFrameFeatures:
    def _intervals(self):
        return [Interval(0.0, 1.0, "hello"), Interval(2.0, 3.0, "goodbyes")]

    def test_frame_mapping_inside_words(self):
        feats = bert_frame_features(self._intervals(), n_frames=90, fps=30)
        assert feats.shape == (90, 768)
        e = HashProjectionEncoder()
        hidden, mapping = e.encode_words(["hello", "goodbyes"])
        # frame 0 (t=0) -> first token of "hello"
        np.testing.assert_allclose(feats[0], hidden[mapping[0][0]])
        # frame 89 (t≈2.97) inside "goodbyes" -> its LAST token (linear
        # token slots over the interval, beat_sep_lower.py:524-531)
        np.testing.assert_allclose(feats[89], hidden[mapping[1][-1]])

    def test_gap_frames_inherit_last_word(self):
        feats = bert_frame_features(self._intervals(), n_frames=90, fps=30)
        e = HashProjectionEncoder()
        hidden, mapping = e.encode_words(["hello", "goodbyes"])
        # t=1.5 (frame 45) is between words -> last token of "hello"
        # (j_last semantics, beat_sep_lower.py:541-543)
        np.testing.assert_allclose(feats[45], hidden[mapping[0][-1]])

    def test_multi_token_word_spreads_linearly(self):
        iv = [Interval(0.0, 3.0, "internationalization")]
        feats = bert_frame_features(iv, n_frames=90, fps=30)
        # different thirds of the interval see different subword vectors
        assert not np.allclose(feats[5], feats[85])

    def test_empty_marks_become_period(self):
        iv = [Interval(0.0, 1.0, "  ")]
        feats = bert_frame_features(iv, n_frames=30, fps=30)
        e = HashProjectionEncoder()
        hidden, mapping = e.encode_words(["."])
        np.testing.assert_allclose(feats[0], hidden[mapping[0][0]])

    def test_no_intervals(self):
        feats = bert_frame_features([], n_frames=10, fps=30)
        assert feats.shape == (10, 768) and (feats == 0).all()


def test_make_encoder_fallback():
    assert isinstance(make_encoder(None), HashProjectionEncoder)
