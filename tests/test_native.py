"""Native C++ host ops vs numpy reference parity + availability."""

import numpy as np
import pytest

from syntalker_tpu import native
from syntalker_tpu.data import audio as A


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("g++ toolchain unavailable")
    return lib


class TestRollingMax:
    def test_matches_numpy(self, lib):
        rng = np.random.default_rng(0)
        y = rng.normal(size=50_000).astype(np.float32)
        fast = native.rolling_max_abs(y, 1024)
        win = np.lib.stride_tricks.sliding_window_view(np.abs(y), 1024)
        ref = np.pad(win.max(axis=1), (0, 1023), mode="edge").astype(np.float32)
        np.testing.assert_allclose(fast, ref, atol=0)

    def test_short_input(self, lib):
        y = np.array([0.5, -2.0, 1.0], np.float32)
        out = native.rolling_max_abs(y, 1024)
        np.testing.assert_allclose(out, 2.0)

    def test_audio_module_uses_native(self, lib):
        y = np.random.default_rng(1).normal(size=10_000).astype(np.float32)
        env = A.amplitude_envelope(y)
        assert env.shape == y.shape


class TestPeakPick:
    def test_matches_numpy(self, lib):
        rng = np.random.default_rng(2)
        env = np.abs(rng.normal(size=2000)).astype(np.float32)
        kw = dict(pre_max=1, post_max=1, pre_avg=3, post_avg=4, delta=0.07, wait=1)
        fast = native.peak_pick(env, **kw)
        ref = A.peak_pick(env, **kw)
        np.testing.assert_array_equal(fast, ref)

    def test_onset_detection_consistent(self, lib):
        y, sr = A.load_wav_mono("/root/reference/demo/examples/2_scott_0_1_1.wav")
        y = y[: sr * 5]
        frames_native = A.onset_detect_frames(y, sr)
        # force the numpy path
        real = native._lib
        try:
            native._lib = None
            frames_np = A.onset_detect_frames(y, sr)
        finally:
            native._lib = real
        np.testing.assert_array_equal(frames_native, frames_np)


class TestWindowGather:
    def test_matches_slicing(self, lib):
        src = np.arange(60, dtype=np.float32).reshape(20, 3)
        starts = np.array([0, 5, 17])  # last one needs zero padding
        out = native.window_gather(src, starts, 4)
        np.testing.assert_array_equal(out[0], src[0:4])
        np.testing.assert_array_equal(out[1], src[5:9])
        np.testing.assert_array_equal(out[2, :3], src[17:20])
        np.testing.assert_array_equal(out[2, 3:], 0)
