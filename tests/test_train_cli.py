"""Full train-CLI integration: a BEAT2-layout directory built from the
shipped assets drives cache building, vocab, and both training CLIs."""

import shutil
import textwrap
from pathlib import Path

import numpy as np
import pytest
from scipy.io import wavfile

from syntalker_tpu.data import audio as A

NPZ = "/root/reference/demo/examples/2_scott_0_1_1.npz"
WAV = "/root/reference/demo/examples/2_scott_0_1_1.wav"

TG = textwrap.dedent('''\
    File type = "ooTextFile"
    Object class = "TextGrid"

    xmin = 0
    xmax = 16.0
    tiers? <exists>
    size = 1
    item []:
        item [1]:
            class = "IntervalTier"
            name = "words"
            xmin = 0
            xmax = 16.0
            intervals: size = 2
            intervals [1]:
                xmin = 0.0
                xmax = 8.0
                text = "hello"
            intervals [2]:
                xmin = 8.0
                xmax = 16.0
                text = "world"
''')

TINY = [
    "mdm.latent_total_dim=48",
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
    "rvq_width=32",
    "rvq_depth=1",
    "train.batch_size=8",
    "train.epochs=1",
    "train.test_period=1",
    "data.training_speakers=[2]",
    "data.stride=32",
]


@pytest.fixture(scope="module")
def beat_dir(tmp_path_factory):
    """Fake BEAT2 dataset layout with one 16 s clip."""
    root = tmp_path_factory.mktemp("beat2")
    (root / "smplxflame_30").mkdir()
    (root / "wave16k").mkdir()
    (root / "textgrid").mkdir()

    d = np.load(NPZ, allow_pickle=True)
    keep = 16 * 30
    np.savez(
        root / "smplxflame_30" / "2_scott_0_1_1.npz",
        betas=d["betas"],
        poses=d["poses"][:keep],
        expressions=d["expressions"][:keep],
        trans=d["trans"][:keep],
        model="smplx2020",
        gender="neutral",
        mocap_frame_rate=30,
    )
    y, sr = A.load_wav_mono(WAV)
    wavfile.write(root / "wave16k" / "2_scott_0_1_1.wav", sr, y[: sr * 16])
    (root / "textgrid" / "2_scott_0_1_1.TextGrid").write_text(TG)
    (root / "train_test_split.csv").write_text(
        "id,type\n2_scott_0_1_1,train\n2_scott_0_1_1,test\n"
    )
    return root


def test_read_split(beat_dir):
    from syntalker_tpu.data.beat_builder import read_split

    assert read_split(beat_dir, "train", [2]) == ["2_scott_0_1_1"]
    assert read_split(beat_dir, "train", [3]) == []


def test_build_cache_with_vocab(beat_dir, tmp_path):
    from syntalker_tpu.data.beat_builder import build_beat_cache
    from syntalker_tpu.data.cache import ClipConfig

    cache, vocab = build_beat_cache(
        beat_dir, tmp_path / "cache", split="train", speakers=[2],
        cfg=ClipConfig(pose_length=64, stride=64),
    )
    assert len(cache) > 0
    assert vocab.get_word_index("hello") > 3
    s = cache.get(0)
    # word ids follow the textgrid alignment
    assert s["word"][0] == vocab.get_word_index("hello")
    # cache hit on second call
    cache2, _ = build_beat_cache(
        beat_dir, tmp_path / "cache", split="train", speakers=[2],
        cfg=ClipConfig(pose_length=64, stride=64),
    )
    assert len(cache2) == len(cache)


def test_train_rvq_cli(beat_dir, tmp_path):
    from syntalker_tpu.cli import train_rvq

    train_rvq.main(
        [
            "--run-dir", str(tmp_path / "run"),
            f"data.data_path={beat_dir}/",
            f"data.cache_path={tmp_path}/cache",
            f"train.ckpt_dir={tmp_path}/ckpt",
            "rvq_train.body_part=upper",
            "rvq_train.total_iters=2",
            "rvq_train.batch_size=8",
            "rvq_train.window=64",
            "rvq_train.save_every=1000",
        ]
        + TINY
    )
    assert list((tmp_path / "ckpt" / "rvq_upper").glob("step_*"))


def test_train_cli_one_epoch(beat_dir, tmp_path):
    from syntalker_tpu.cli import train

    train.main(
        [
            "--run-dir", str(tmp_path / "run"),
            f"data.data_path={beat_dir}/",
            f"data.cache_path={tmp_path}/cache_diff",
            f"train.ckpt_dir={tmp_path}/ckpt_diff",
            "data.pose_length=128",
        ]
        + TINY
    )
    assert list(Path(tmp_path / "ckpt_diff").glob("step_*"))


def test_eval_cli(beat_dir, tmp_path):
    """cli.test end-to-end: build the test cache, run the evaluator with a
    synthetic SMPL-X stand-in, write metrics.json."""
    import json

    from syntalker_tpu.cli import test as test_cli
    from syntalker_tpu.ops import smplx as S

    # monkeypatch-free injection: load_smplx_if_available returns None here
    # (no model path), so joint metrics are skipped and FGD still runs
    test_cli.main(
        [
            "--run-dir", str(tmp_path / "run"),
            "--max-clips", "1",
            f"data.data_path={beat_dir}/",
            f"data.cache_path={tmp_path}/cache_eval",
            "diffusion.timestep_respacing=ddim4",
            "diffusion.sampler=ddim",
        ]
        + TINY
        + ["mdm.latent_total_dim=1536"]  # full latent width for part slices
    )
    metrics = json.loads((tmp_path / "run" / "metrics.json").read_text())
    assert metrics["clips"] == 1
    assert np.isfinite(metrics["fid"])


def test_h3d_eval_cli(beat_dir, tmp_path):
    """cli.test_h3d end-to-end: h3d cache (synthetic SMPL-X), committed
    co-embedding oracle, 2-replication metric run with deterministic
    captions."""
    import json

    from syntalker_tpu.eval.t2m import T2MEvaluator

    if not Path(T2MEvaluator.DEFAULT_ARTIFACT).exists():
        pytest.skip("oracle artifact not present")
    from syntalker_tpu.cli import test_h3d

    test_h3d.main(
        [
            "--run-dir", str(tmp_path / "run"),
            "--max-clips", "1",
            "--replications", "2",
            f"data.data_path={beat_dir}/",
            f"data.cache_path={tmp_path}/cache_h3d",
            f"train.ckpt_dir={tmp_path}/run",
            "data.smplx_model_path=synthetic",
            "representation=h3d623",
            "diffusion.timestep_respacing=ddim4",
            "diffusion.sampler=ddim",
        ]
        + TINY
        + ["mdm.latent_total_dim=1536"]
    )
    out = json.loads((tmp_path / "run" / "h3d_metrics.json").read_text())
    assert np.isfinite(out["fid"]["mean"])
    assert "r_precision_top1" in out
