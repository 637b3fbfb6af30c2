"""Forced-alignment quality check for the demo path (VERDICT r2 missing #5).

The gradio demo has no MFA (the reference shells out to an external MFA
install, demo.py:76-78); when the user supplies no TextGrid we fall back to
``align_words_by_energy`` (data/audio.py). Training, by contrast, consumes
real TextGrid alignments (ref beat_sep_lower.py:419-548) — so demo-time
conditioning quality depends on how close the energy aligner's per-frame
word track gets to the TextGrid-derived one.

This measures exactly that, on clips where the TextGrid is ground truth by
construction: the synthetic corpus (data/synthetic.py) emits audio whose
voiced syllable bursts are generated from the known word intervals, so its
TextGrid is a perfect transcript alignment. For each clip we compute the
per-frame word-id track (vocab.words_to_frame_ids, the array the model
actually conditions on) from (a) the GT TextGrid, (b) the current
voiced-time aligner, (c) the round-2 global-energy-share rule, (d) the
reference demo's original uniform spreading.

Reported per aligner: frame accuracy vs the GT track over all frames,
over GT-worded frames only, and mean absolute word-start offset (s).
This experiment drove the round-3 aligner choice — burst-count matching
and silence-gap snapping were also prototyped here and scored worse
(syllable gaps masquerade as word gaps).

Writes docs/alignment_quality_round3.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from syntalker_tpu.data.audio import align_words_by_energy
from syntalker_tpu.data.synthetic import synth_clip
from syntalker_tpu.data.textgrid import Interval
from syntalker_tpu.data.vocab import Vocab, words_to_frame_ids

FPS = 30
SR = 16000


def uniform_intervals(words, duration):
    """The reference demo's pre-round-2 fallback: equal time per word."""
    n = len(words)
    return [
        Interval(duration * i / n, duration * (i + 1) / n, w)
        for i, w in enumerate(words)
    ]


def energy_mass_intervals(words, y, sr, *, frame_length=1024, silence_rel=0.1):
    """The round-2 algorithm (kept as a baseline): each word owns an equal
    share of the clip's GLOBAL cumulative energy, emitted over voiced runs.
    Superseded by contiguous voiced-time shares in data/audio.py."""
    from syntalker_tpu.data.audio import amplitude_envelope

    words = [w for w in words if w.strip()]
    duration = len(y) / sr
    env = amplitude_envelope(np.abs(y).astype(np.float32), frame_length)
    hop_t = 1.0 / sr
    voiced = env > silence_rel * (env.max() + 1e-12)
    energy = np.where(voiced, env, 0.0).astype(np.float64)
    cum = np.cumsum(energy)
    bounds = np.searchsorted(cum, cum[-1] * np.arange(1, len(words)) / len(words))
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(env)]])
    v = np.concatenate([[False], voiced, [False]])
    d = np.diff(v.astype(np.int8))
    runs = list(zip(np.flatnonzero(d == 1), np.flatnonzero(d == -1)))
    out = []
    for w, (s0, e0) in zip(words, zip(starts, ends)):
        for r0, r1 in runs:
            lo, hi = max(s0, r0), min(e0, r1)
            if hi > lo:
                out.append(Interval(lo * hop_t, hi * hop_t, w))
    out.append(Interval(0.0, duration, ""))
    return out


def frame_track(intervals, n_frames, vocab):
    return words_to_frame_ids(intervals, n_frames, vocab)


def boundary_offsets(est_intervals, gt_words):
    """Mean |start offset| per transcript word, matched monotonically.

    A word may be split across several voiced-run intervals sharing its
    mark; each transcript occurrence takes the first not-yet-consumed
    interval with its mark (both sequences are time-ordered)."""
    est = [iv for iv in est_intervals if iv.mark.strip()]
    offs = []
    j = 0
    for (a, _b, w) in gt_words:
        while j < len(est) and est[j].mark != w:
            j += 1
        if j == len(est):
            break
        offs.append(abs(est[j].min_time - a))
        j += 1
    return float(np.mean(offs)) if offs else float("nan")


def evaluate(n_clips=8, seed=7):
    vocab = Vocab()
    rows = []
    for i in range(n_clips):
        speaker = (2, 4, 6, 8)[i % 4]
        clip = synth_clip(speaker, 100 + i, 12.0 + 2.0 * (i % 3), seed=seed)
        duration = len(clip.audio) / SR
        n_frames = clip.poses.shape[0]
        transcript = [w for (_a, _b, w) in clip.words]
        for w in transcript:
            vocab.index_word(w)

        gt_iv = [Interval(a, b, w) for (a, b, w) in clip.words]
        gt = frame_track(gt_iv, n_frames, vocab)

        tracks = {
            "voiced_time": frame_track(
                align_words_by_energy(transcript, clip.audio, SR), n_frames, vocab
            ),
            "energy_mass": frame_track(
                energy_mass_intervals(transcript, clip.audio, SR), n_frames, vocab
            ),
            "uniform": frame_track(
                uniform_intervals(transcript, duration), n_frames, vocab
            ),
        }
        # PAD (silence interval) and UNK (no covering interval) both mean
        # "no word here" — canonicalize before comparing so the aligners'
        # different silence encodings don't register as word errors.
        def canon(track):
            out = track.copy()
            out[out == vocab.PAD_token] = vocab.UNK_token
            return out

        gt = canon(gt)
        worded = gt != vocab.UNK_token  # frames where GT has an actual word
        row = {"clip": clip.clip_id, "frames": int(n_frames),
               "worded_frac": float(worded.mean())}
        for name, tr in tracks.items():
            tr = canon(tr)
            row[f"{name}_acc_all"] = float((tr == gt).mean())
            row[f"{name}_acc_worded"] = float((tr[worded] == gt[worded]).mean())
        row["voiced_time_boundary_s"] = boundary_offsets(
            align_words_by_energy(transcript, clip.audio, SR), clip.words
        )
        row["energy_mass_boundary_s"] = boundary_offsets(
            energy_mass_intervals(transcript, clip.audio, SR), clip.words
        )
        row["uniform_boundary_s"] = boundary_offsets(
            uniform_intervals(transcript, duration), clip.words
        )
        rows.append(row)

    def agg(key):
        v = np.array([r[key] for r in rows])
        return {"mean": float(v.mean()), "min": float(v.min()), "max": float(v.max())}

    summary = {"n_clips": n_clips}
    for name in ("voiced_time", "energy_mass", "uniform"):
        summary[f"{name}_acc_all"] = agg(f"{name}_acc_all")
        summary[f"{name}_acc_worded"] = agg(f"{name}_acc_worded")
        summary[f"{name}_boundary_s"] = agg(f"{name}_boundary_s")
    return summary, rows


def write_doc(summary, rows, path):
    s = summary
    lines = [
        "# Demo-path forced-alignment quality (round 3)",
        "",
        "`align_words_by_energy` (the demo's MFA stand-in) vs the ground-truth",
        "TextGrid frame track, on synthetic clips whose audio is constructed",
        "with voiced bursts exactly at the known word intervals",
        "(`data/synthetic.py`). `uniform` is the reference demo's original",
        "spread-words-evenly fallback that the energy aligner replaced.",
        "",
        "| aligner | frame acc (all) | frame acc (worded) | boundary offset (s) |",
        "|---|---|---|---|",
    ] + [
        (f"| {label} | {s[f'{name}_acc_all']['mean']:.3f} "
         f"| {s[f'{name}_acc_worded']['mean']:.3f} "
         f"| {s[f'{name}_boundary_s']['mean']:.3f} |")
        for name, label in (
            ("voiced_time", "contiguous voiced-time shares (current)"),
            ("energy_mass", "global energy share (round 2)"),
            ("uniform", "uniform spreading (reference demo)"),
        )
    ] + [
        "",
        f"{s['n_clips']} clips, 4 synthetic speakers, 12–16 s each; accuracy",
        "is agreement of the per-frame word-id array the model conditions on",
        "(`vocab.words_to_frame_ids`, ref beat_sep_lower.py:515-548).",
        "",
        "Caveat: synthetic speech has sharper silence boundaries than real",
        "speech, so this measures the aligner's *mechanism* (energy-mass",
        "monotonic assignment) under ideal voicing detection; on real audio",
        "accuracy will be lower but the uniform-spreading baseline degrades",
        "the same way. Per-clip rows in the JSON block below.",
        "",
        "```json",
        json.dumps({"summary": summary, "per_clip": rows}, indent=1),
        "```",
    ]
    Path(path).write_text("\n".join(lines))


if __name__ == "__main__":
    summary, rows = evaluate()
    write_doc(summary, rows, Path(__file__).resolve().parents[1]
              / "docs" / "alignment_quality_round3.md")
    print(json.dumps(summary, indent=1))
