"""CLI smoke tests: the generate path runs end-to-end (wav -> npz -> video)
with tiny overrides, and config plumbing works."""

import numpy as np
import pytest
from scipy.io import wavfile

from syntalker_tpu.data import audio as A

WAV = "/root/reference/demo/examples/2_scott_0_1_1.wav"

TINY_OVERRIDES = [
    "mdm.latent_dim=32",
    "mdm.ff_size=64",
    "mdm.num_layers=1",
    "mdm.num_heads=2",
    "mdm.rope_heads=4",
    "mdm.audio_feat_dim=16",
    "mdm.word_feat_dim=16",
    "mdm.word_embed_dim=8",
    "mdm.vocab_size=64",
    "diffusion.steps=8",
    "diffusion.timestep_respacing=ddim4",
    "rvq_width=32",
    "rvq_depth=1",
]


@pytest.fixture(scope="module")
def short_wav(tmp_path_factory):
    y, sr = A.load_wav_mono(WAV)
    p = tmp_path_factory.mktemp("wav") / "short.wav"
    wavfile.write(p, sr, y[: sr * 6])
    return str(p)


def test_generate_cli_end_to_end(short_wav, tmp_path):
    from syntalker_tpu.cli import generate

    out = tmp_path / "gen.npz"
    generate.main(
        ["--wav", short_wav, "--out", str(out), "--run-dir", str(tmp_path)]
        + TINY_OVERRIDES
    )
    d = np.load(out)
    assert d["poses"].shape[1] == 165
    assert d["poses"].shape[0] >= 128
    assert np.isfinite(d["poses"]).all()
    assert d["trans"].shape == (d["poses"].shape[0], 3)


def test_generate_cli_with_prompts(short_wav, tmp_path):
    from syntalker_tpu.cli import generate

    out = tmp_path / "gen_p.npz"
    generate.main(
        [
            "--wav", short_wav, "--out", str(out), "--run-dir", str(tmp_path),
            "--upper-prompt", "raise both arms",
        ]
        + TINY_OVERRIDES
        + ["mdm.use_prompt=true", "mdm.prompt_dim=256"]
    )
    d = np.load(out)
    assert np.isfinite(d["poses"]).all()


def test_demo_cli_one_shot(short_wav, tmp_path):
    from syntalker_tpu.cli import demo

    demo.main(
        ["--wav", short_wav, "--run-dir", str(tmp_path)] + TINY_OVERRIDES
    )
    # a video (mp4 or gif) must have been produced next to the npz
    outs = list(tmp_path.glob("demo_out.*"))
    assert any(p.suffix in (".mp4", ".gif") for p in outs), outs
