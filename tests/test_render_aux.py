"""Renderer (serial + parallel) and aux-CLI smoke tests."""

import numpy as np
import pytest

from syntalker_tpu import render as R


@pytest.fixture(scope="module")
def joints():
    rng = np.random.default_rng(0)
    rest = np.zeros((55, 3), np.float32)
    from syntalker_tpu.ops.smplx import PARENTS

    for j in range(1, 55):
        rest[j] = rest[PARENTS[j]] + rng.normal(0, 0.1, 3)
    t = 6
    out = np.tile(rest, (t, 1, 1))
    out[:, :, 0] += np.linspace(0, 0.5, t)[:, None]
    return out


def test_serial_render(joints, tmp_path):
    p = R.render_stick_figure(joints, tmp_path / "vid", fps=10)
    assert p.exists()
    assert p.suffix in (".mp4", ".gif")


def test_parallel_render_matches_serial_framecount(joints, tmp_path):
    p = R.render_stick_figure_parallel(joints, tmp_path / "vidp", fps=10, workers=2)
    assert p.exists()
    import imageio

    serial = R.render_stick_figure(joints, tmp_path / "vids", fps=10)
    f_par = imageio.mimread(p)
    f_ser = imageio.mimread(serial)
    assert len(f_par) == len(f_ser) == joints.shape[0]
