"""Shared CLI plumbing: config loading, logging, model assembly."""

from __future__ import annotations

import argparse
from pathlib import Path

from syntalker_tpu.config import ExperimentConfig, load_config
from syntalker_tpu.utils.tracking import setup_logging


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("-c", "--config", type=str, default=None, help="YAML config path")
    p.add_argument(
        "overrides",
        nargs="*",
        default=[],
        help="dot-path config overrides, e.g. train.lr=1e-4",
    )
    p.add_argument("--run-dir", type=str, default="./outputs/run")
    return p


def setup(args) -> ExperimentConfig:
    setup_logging(args.run_dir)
    return load_config(args.config, args.overrides)


def load_smplx_if_available(cfg: ExperimentConfig):
    from syntalker_tpu.ops.smplx import load_smplx_npz, synthetic_smplx_model

    p = cfg.data.smplx_model_path
    if p == "synthetic":
        # geometry-plausible stand-in (tests / weightless environments);
        # h3d featurization and joint metrics run, absolute joint positions
        # are not the released SMPL-X body's
        return synthetic_smplx_model()
    if p and Path(p).exists():
        return load_smplx_npz(p)
    return None
