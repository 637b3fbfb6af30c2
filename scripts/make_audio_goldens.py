"""Freeze the current data/audio.py outputs as committed golden fixtures.

VERDICT r2 #9: librosa is absent from this environment, so the numpy
re-derivations of its onset/envelope semantics (data/audio.py) cannot be
verified against the real library in-env — but they CAN be pinned so any
drift fails loudly. This script writes tests/fixtures/audio_goldens.npz
from deterministic synthetic inputs; tests/test_audio_metrics.py compares
fresh outputs against it bit-for-bit.

Run it ONLY to intentionally re-freeze after a verified semantic change:

    python scripts/make_audio_goldens.py

When librosa IS available (any machine with it installed), the cross-check
to run is described in data/audio.py's module docstring caveat.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from syntalker_tpu.data import audio as A  # noqa: E402

OUT = Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "audio_goldens.npz"


def golden_inputs() -> dict[str, np.ndarray]:
    """Deterministic 2-second test signals at 16 kHz covering the feature
    paths: a click train (clean onsets), a chirp (spectral sweep), and
    seeded noise-modulated speech-like bursts."""
    sr = 16000
    t = np.arange(2 * sr) / sr
    rng = np.random.default_rng(0)

    clicks = np.zeros(2 * sr, np.float32)
    for k in range(8):  # clicks every 0.25 s
        i = int(k * 0.25 * sr)
        clicks[i : i + 32] = np.hanning(32).astype(np.float32)

    chirp = np.sin(2 * np.pi * (200 * t + 900 * t**2)).astype(np.float32)

    bursts = (
        rng.normal(size=2 * sr).astype(np.float32)
        * np.clip(np.sin(2 * np.pi * 1.5 * t), 0, None).astype(np.float32)
    )

    return {"clicks": clicks, "chirp": chirp, "bursts": bursts}


def compute_goldens() -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for name, y in golden_inputs().items():
        out[f"{name}/amplitude_envelope"] = A.amplitude_envelope(y)
        out[f"{name}/onset_strength"] = A.onset_strength(y)
        out[f"{name}/onset_frames"] = A.onset_detect_frames(y)
        out[f"{name}/melspec"] = A.melspectrogram_features(y)
        out[f"{name}/features"] = A.onset_amplitude_features(y)
    out["mel_fb_16k_2048"] = A.mel_filterbank(16000, 2048)
    return out


if __name__ == "__main__":
    goldens = compute_goldens()
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **goldens)
    total = sum(v.size for v in goldens.values())
    print(f"wrote {OUT} ({len(goldens)} arrays, {total} values)")
