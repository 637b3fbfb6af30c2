"""Host-side visualization: stick-figure video from generated motion.

Capability parity with ``utils/plot_script.py:86`` (matplotlib 3D skeleton
animation) and the npz→video path of ``utils/other_tools.py:533-623`` /
``utils/fast_render.py``. Mesh rendering (pyrender) is optional — when the
package or the SMPL-X model file is absent we fall back to the stick
figure, which only needs FK joints.

Video encoding uses imageio (ffmpeg plugin when present, GIF otherwise).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import numpy as np

from syntalker_tpu.ops.smplx import PARENTS

log = logging.getLogger("syntalker")


def render_stick_figure(
    joints: np.ndarray,  # (T, 55, 3)
    out_path: str | Path,
    *,
    fps: int = 30,
    parents: np.ndarray = PARENTS,
    figsize: int = 4,
    max_frames: Optional[int] = None,
    title: str = "",
) -> Path:
    """Render a 3D skeleton animation to mp4 (or gif without ffmpeg)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    joints = np.asarray(joints)
    if max_frames:
        joints = joints[:max_frames]
    t_total = joints.shape[0]

    center = joints.mean(axis=(0, 1))
    radius = float(np.abs(joints - center).max()) * 1.2 + 1e-6

    frames = []
    fig = plt.figure(figsize=(figsize, figsize))
    ax = fig.add_subplot(111, projection="3d")
    for t in range(t_total):
        ax.cla()
        ax.set_xlim(center[0] - radius, center[0] + radius)
        ax.set_ylim(center[2] - radius, center[2] + radius)
        ax.set_zlim(center[1] - radius, center[1] + radius)
        ax.set_axis_off()
        if title:
            ax.set_title(f"{title} f{t}")
        j = joints[t]
        for c in range(1, len(parents)):
            p = parents[c]
            ax.plot(
                [j[p, 0], j[c, 0]],
                [j[p, 2], j[c, 2]],
                [j[p, 1], j[c, 1]],
                "b-",
                lw=1.2,
            )
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(buf.copy())
    plt.close(fig)

    return write_video(frames, out_path, fps=fps)


def _render_chunk(args):
    """Worker: render a chunk of frames to RGB arrays (no shared state)."""
    joints_chunk, parents, center, radius, figsize, title, offset = args
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = []
    fig = plt.figure(figsize=(figsize, figsize))
    ax = fig.add_subplot(111, projection="3d")
    for t in range(joints_chunk.shape[0]):
        ax.cla()
        ax.set_xlim(center[0] - radius, center[0] + radius)
        ax.set_ylim(center[2] - radius, center[2] + radius)
        ax.set_zlim(center[1] - radius, center[1] + radius)
        ax.set_axis_off()
        if title:
            ax.set_title(f"{title} f{offset + t}")
        j = joints_chunk[t]
        for c in range(1, len(parents)):
            p = parents[c]
            ax.plot([j[p, 0], j[c, 0]], [j[p, 2], j[c, 2]], [j[p, 1], j[c, 1]],
                    "b-", lw=1.2)
        fig.canvas.draw()
        out.append(np.asarray(fig.canvas.buffer_rgba())[..., :3].copy())
    plt.close(fig)
    return out


def render_stick_figure_parallel(
    joints: np.ndarray,
    out_path: str | Path,
    *,
    fps: int = 30,
    parents: np.ndarray = PARENTS,
    workers: int = 4,
    figsize: int = 4,
    title: str = "",
) -> Path:
    """Multiprocess frame rendering (utils/fast_render.py:129-266 parity):
    frames are rendered in a worker pool, then encoded."""
    import multiprocessing as mp

    joints = np.asarray(joints)
    center = joints.mean(axis=(0, 1))
    radius = float(np.abs(joints - center).max()) * 1.2 + 1e-6
    chunks = np.array_split(np.arange(joints.shape[0]), workers)
    jobs = [
        (joints[c], parents, center, radius, figsize, title, int(c[0]))
        for c in chunks
        if len(c)
    ]
    ctx = mp.get_context("spawn")
    with ctx.Pool(len(jobs)) as pool:
        results = pool.map(_render_chunk, jobs)
    frames = [f for chunk in results for f in chunk]
    return write_video(frames, out_path, fps=fps)


def write_video(frames, out_path: str | Path, *, fps: int = 30) -> Path:
    """Encode frames to mp4 when ffmpeg is available, else GIF."""
    import imageio

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    try:
        imageio.mimwrite(out_path.with_suffix(".mp4"), frames, fps=fps)
        return out_path.with_suffix(".mp4")
    except Exception as e:  # no ffmpeg backend
        log.warning(f"mp4 encode unavailable ({e}); writing GIF")
        imageio.mimwrite(
            out_path.with_suffix(".gif"), frames, duration=1000.0 / min(fps, 25)
        )
        return out_path.with_suffix(".gif")


def render_npz(
    npz_path: str | Path,
    out_path: str | Path,
    *,
    smplx_model=None,
    max_frames: Optional[int] = None,
) -> Path:
    """Motion npz (poses/trans/betas) -> skeleton video via JAX FK."""
    import jax.numpy as jnp

    from syntalker_tpu.ops import smplx as S

    if smplx_model is None:
        smplx_model = S.synthetic_smplx_model()
    d = np.load(npz_path, allow_pickle=True)
    poses = np.asarray(d["poses"], np.float32)
    if max_frames:
        poses = poses[:max_frames]
    n = poses.shape[0]
    betas = np.tile(np.asarray(d["betas"], np.float32).reshape(1, -1)[:, :300], (n, 1))
    trans = np.asarray(d["trans"], np.float32)[:n]
    joints = np.asarray(
        S.forward_joints(
            smplx_model, jnp.asarray(poses), jnp.asarray(betas), jnp.asarray(trans)
        )
    )
    return render_stick_figure(joints, out_path, title=Path(npz_path).stem)
