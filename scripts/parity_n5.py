"""Extend the paired two-stack parity to n=5 seeds (VERDICT r4 #4).

Round 4 stopped at n=3 (sign-test floor p=0.25). The round-4 torch arms
for seeds 3-4 were lost with the uncommitted outputs/ tree, so this driver
regenerates them (reference stack, CPU) and trains the matching jax arms
(shipped BN + bf16 fast-training config) via the existing stage-idempotent
harness, then MERGES the fresh per-seed values with the committed
seeds-0-2 values (docs/parity_round4_bf16.json — same config, same
protocol) and recomputes the paired statistics at n=5
(sign-test floor p=0.0625).

Stages (resumable; torch arms are the ~2 h pole and can be pre-run by
scripts/../tmp torch chain):

    python scripts/parity_n5.py            # drive seeds 3-4 + merge
    python scripts/parity_n5.py --merge-only

Writes docs/parity_round5_bf16_n5.json + docs/parity_round5_paired.{json,md}.
Ref anchor: same eval protocol as
/root/reference/diffusion_rvqvae_trainer.py:713-728.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "scripts"))

from parity_multiseed import METRICS, STACKS, _ci, run  # noqa: E402

SRC3 = ROOT / "docs" / "parity_round4_bf16.json"
TORCH_BASE = ROOT / "outputs" / "parity_multiseed"
JAX_BASE = ROOT / "outputs" / "parity_multiseed_bf16"
NEW_SEEDS = (3, 4)

TORCH_ARTIFACTS = [
    "windows.npz", "torch_eval_vae.pt", "torch_gen.npz", "torch_report.json",
    "torch_gen_ddpm.npz", "torch_mdm.pt", "torch_rvq_upper.pt",
    "torch_rvq_hands.pt", "torch_rvq_lower.pt",
]


def drive(seed: int):
    """torch arms (if the background chain hasn't made them) + jax arms."""
    script = ROOT / "scripts" / "parity_experiment.py"
    src = TORCH_BASE / f"seed{seed}"
    src.mkdir(parents=True, exist_ok=True)
    log = src / "run.log"
    common = [sys.executable, str(script), "--out", str(src),
              "--seed", str(seed), "--diff-steps", "600"]
    if not (src / "windows.npz").exists():
        run(common + ["--stage", "data"], log)
    if not (src / "torch_gen.npz").exists():
        run(common + ["--stage", "torch"], log)
    if not (src / "torch_gen_ddpm.npz").exists():
        run(common + ["--stage", "torch", "--sampler", "ddpm",
                      "--skip-train"], log)

    d = JAX_BASE / f"seed{seed}"
    d.mkdir(parents=True, exist_ok=True)
    for name in TORCH_ARTIFACTS:
        if (src / name).exists() and not (d / name).exists():
            shutil.copy(src / name, d / name)
    if (src / "refdata").exists() and not (d / "refdata").exists():
        shutil.copytree(src / "refdata", d / "refdata")
    log = d / "run.log"
    common = [sys.executable, str(script), "--out", str(d),
              "--seed", str(seed), "--diff-steps", "600",
              "--audio-norm", "batch", "--dtype", "bf16"]
    if not (d / "report.json").exists():
        if not (d / "jax_gen.npz").exists():
            run(common + ["--stage", "jax"], log)
        run(common + ["--stage", "metrics"], log)
    if not (d / "report_ddpm.json").exists():
        if not (d / "jax_gen_ddpm.npz").exists():
            run(common + ["--stage", "jax", "--sampler", "ddpm",
                          "--skip-train"], log)
        run(common + ["--stage", "metrics", "--sampler", "ddpm"], log)


def merge():
    base = json.loads(SRC3.read_text())
    arms = base["arms"]
    for arm in list(arms):
        sfx = "" if arm == "ddim" else f"_{arm}"
        for seed in NEW_SEEDS:
            rep_p = JAX_BASE / f"seed{seed}" / f"report{sfx}.json"
            if not rep_p.exists():
                print(f"[n5] seed{seed} {arm}: report missing — skipping arm "
                      f"merge for this seed")
                continue
            rep = json.loads(rep_p.read_text())
            if seed in arms[arm]["seeds"]:
                continue
            arms[arm]["seeds"].append(seed)
            for s in STACKS:
                for m in METRICS:
                    arms[arm][s][m]["values"].append(float(rep[s][m]))
        # recompute mean/ci from merged values
        for s in STACKS:
            for m in METRICS:
                arms[arm][s][m] = _ci(arms[arm][s][m]["values"])
    out = {
        "arms": arms,
        "jax_arm_dtype": "bf16",
        "read_me": ("n=5 merge: seeds 0-2 from the committed "
                    "docs/parity_round4_bf16.json (same BN+bf16 jax config, "
                    "same 600-step protocol), seeds 3-4 regenerated this "
                    "round (torch + jax arms, outputs/parity_multiseed*/)."),
    }
    dst = ROOT / "docs" / "parity_round5_bf16_n5.json"
    dst.write_text(json.dumps(out, indent=1))
    print(f"[n5] wrote {dst}")

    from paired_stats import analyze, write_md

    paired = analyze(dst)
    (ROOT / "docs" / "parity_round5_paired.json").write_text(
        json.dumps(paired, indent=1))
    write_md(paired, ROOT / "docs" / "parity_round5_paired.md")
    # retitle for round 5
    md = ROOT / "docs" / "parity_round5_paired.md"
    md.write_text(md.read_text().replace("(round 4)", "(round 5, n=5)"))
    print(f"[n5] wrote {md}")
    print(json.dumps(paired["arms"], indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--merge-only", action="store_true")
    ap.add_argument("--seeds", type=int, nargs="*", default=list(NEW_SEEDS))
    args = ap.parse_args()
    if not args.merge_only:
        for seed in args.seeds:
            drive(seed)
    merge()


if __name__ == "__main__":
    main()
