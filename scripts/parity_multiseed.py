"""Multi-seed two-stack parity with confidence intervals (VERDICT r2 #1).

Runs scripts/parity_experiment.py end-to-end for N seeds at the 600-step
budget, under BOTH sampling protocols:

- ddim  — the demo path (ddim50), the round-2 comparison,
- ddpm  — the reference's SHIPPED eval protocol (p_sample_loop, 1000 NFE,
          diffusion_rvqvae_trainer.py:361), generated with --skip-train
          over the exact models each seed's ddim arm trained (paired).

Aggregates FGD / BeatAlign / L1Div / rot6d-MSE into mean ± 95% CI
(Student-t, n-1 dof) per stack per protocol and writes
docs/parity_round3_multiseed.{json,md}.

The torch stack runs on this host's ONE cpu core (~30 min train + ~25 min
DDPM-1000 generation per seed) — run this as a long background job:

    python scripts/parity_multiseed.py --seeds 3 --diff-steps 600
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
SCRIPT = ROOT / "scripts" / "parity_experiment.py"

METRICS = ("fgd", "beat_align", "l1div", "rot6d_mse_vs_gt")
STACKS = ("reference_torch", "syntalker_tpu")
# two-sided 95% t quantiles by dof
T95 = {1: 12.706, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571, 9: 2.262}


def run(cmd, log_path):
    print(f"[multiseed] {' '.join(cmd)} -> {log_path.name}", flush=True)
    t0 = time.time()
    with open(log_path, "a") as log:
        rc = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT).returncode
    print(f"[multiseed]   rc={rc} ({time.time() - t0:.0f}s)", flush=True)
    if rc != 0:
        raise RuntimeError(f"{cmd} failed rc={rc}; see {log_path}")


def seed_dir(base: Path, seed: int) -> Path:
    return base / f"seed{seed}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--diff-steps", type=int, default=600)
    ap.add_argument("--out", default="./outputs/parity_multiseed")
    ap.add_argument("--skip-ddpm", action="store_true",
                    help="only the ddim arms (fast bring-up)")
    args = ap.parse_args()
    base = Path(args.out)
    base.mkdir(parents=True, exist_ok=True)

    for seed in range(args.seeds):
        d = seed_dir(base, seed)
        d.mkdir(parents=True, exist_ok=True)
        log = d / "run.log"
        common = [sys.executable, str(SCRIPT), "--out", str(d),
                  "--seed", str(seed), "--diff-steps", str(args.diff_steps)]
        if not (d / "windows.npz").exists():
            run(common + ["--stage", "data"], log)
        # ddim arm: train both stacks + generate + score
        if not (d / "report.json").exists():
            if not (d / "torch_gen.npz").exists():
                run(common + ["--stage", "torch"], log)
            if not (d / "jax_gen.npz").exists():
                run(common + ["--stage", "jax"], log)
            run(common + ["--stage", "metrics"], log)
        # ddpm arm: paired re-generation over the same checkpoints
        if not args.skip_ddpm and not (d / "report_ddpm.json").exists():
            if not (d / "torch_gen_ddpm.npz").exists():
                run(common + ["--stage", "torch", "--sampler", "ddpm",
                              "--skip-train"], log)
            if not (d / "jax_gen_ddpm.npz").exists():
                run(common + ["--stage", "jax", "--sampler", "ddpm",
                              "--skip-train"], log)
            run(common + ["--stage", "metrics", "--sampler", "ddpm"], log)

    aggregate(base, args.seeds, skip_ddpm=args.skip_ddpm)


def aggregate(base: Path, n_seeds: int, *, skip_ddpm=False):
    arms = ["ddim"] + ([] if skip_ddpm else ["ddpm"])
    table = {}
    gt = {}
    for arm in arms:
        sfx = "" if arm == "ddim" else f"_{arm}"
        per_metric = {s: {m: [] for m in METRICS} for s in STACKS}
        for seed in range(n_seeds):
            rep = json.loads((seed_dir(base, seed) / f"report{sfx}.json").read_text())
            for s in STACKS:
                for m in METRICS:
                    per_metric[s][m].append(rep[s][m])
            gt.setdefault("l1div", []).append(rep["ground_truth"]["l1div"])
            gt.setdefault("beat_align", []).append(rep["ground_truth"]["beat_align"])
            gt.setdefault("fgd_floor", []).append(rep["gt_split_floor_fgd"])
        table[arm] = {
            s: {m: _ci(v) for m, v in per_metric[s].items()} for s in STACKS
        }
    out = {
        "seeds": n_seeds,
        "arms": table,
        "gt_anchors": {k: _ci(v) for k, v in gt.items()},
        "read_me": "mean ± 95% CI (Student-t). A metric is 'statistically "
                   "worse' only if the stacks' intervals are disjoint.",
    }
    (ROOT / "docs" / "parity_round3_multiseed.json").write_text(
        json.dumps(out, indent=1)
    )
    _write_md(out)
    print(json.dumps(out, indent=1))


def _ci(vals):
    v = np.asarray(vals, np.float64)
    n = len(v)
    mean = float(v.mean())
    if n < 2:
        return {"mean": mean, "ci95": None, "n": n}
    sem = float(v.std(ddof=1) / np.sqrt(n))
    return {"mean": mean, "ci95": T95.get(n - 1, 1.96) * sem, "n": n,
            "values": [float(x) for x in v]}


def _write_md(out):
    lines = [
        "# Multi-seed two-stack parity (round 3)",
        "",
        f"{out['seeds']} seeds per stack; every RNG (init, batch order, "
        "sampling noise) offset per seed; paired DDPM-1000 arm re-generated "
        "over each seed's DDIM-trained checkpoints. mean ± 95% CI.",
        "",
    ]
    for arm, stacks in out["arms"].items():
        proto = "DDIM-50 (demo path)" if arm == "ddim" else \
                "DDPM-1000 (the reference's shipped eval protocol)"
        lines += [f"## {proto}", "",
                  "| Metric | reference torch | syntalker_tpu | GT anchor |",
                  "|---|---|---|---|"]
        anchors = {"fgd": "fgd_floor", "beat_align": "beat_align",
                   "l1div": "l1div", "rot6d_mse_vs_gt": None}
        for m in METRICS:
            cells = []
            for s in STACKS:
                c = stacks[s][m]
                ci = f" ± {c['ci95']:.3g}" if c["ci95"] is not None else ""
                cells.append(f"{c['mean']:.4g}{ci}")
            a = anchors[m]
            if a:
                g = out["gt_anchors"][a]
                anchor = f"{g['mean']:.4g}"
                if a == "fgd_floor":
                    anchor += " (split floor)"
            else:
                anchor = "0"
            lines.append(f"| {m} | {cells[0]} | {cells[1]} | {anchor} |")
        lines.append("")
    (ROOT / "docs" / "parity_round3_multiseed.md").write_text("\n".join(lines))


if __name__ == "__main__":
    main()
