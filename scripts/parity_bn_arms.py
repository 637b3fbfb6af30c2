"""BN-arm multiseed parity: re-run the jax stack with audio_norm='batch'.

For every completed seed of the main multiseed run (torch artifacts
present), set up a sibling dir under outputs/parity_multiseed_bn/, train
ONLY the jax arm with the reference-exact BatchNorm WavEncoder (the
round-3 root-cause fix, docs/l1div_rootcause_round3.md), re-score against
the SAME torch generations, and aggregate mean ± 95% CI into
docs/parity_round3_multiseed_bn.{json,md}. Idempotent: finished stages are
skipped, so run it repeatedly as the main chain completes seeds.

    python scripts/parity_bn_arms.py --seeds 3 --diff-steps 600

Round 4: also the orchestrator for the bf16 fast-training validation arm
(VERDICT r3 #2) — same protocol, jax arm trained with the bf16 compute
config on top of the shipped BN config, scored against the same torch
generations:

    python scripts/parity_bn_arms.py --seeds 3 --diff-steps 600 \
        --dtype bf16 --out ./outputs/parity_multiseed_bf16 \
        --doc parity_round4_bf16
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "scripts"))

from parity_multiseed import METRICS, STACKS, _ci, run  # noqa: E402

TORCH_ARTIFACTS = [
    "windows.npz", "torch_eval_vae.pt", "torch_gen.npz", "torch_report.json",
    "torch_gen_ddpm.npz", "torch_mdm.pt", "torch_rvq_upper.pt",
    "torch_rvq_hands.pt", "torch_rvq_lower.pt",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--diff-steps", type=int, default=600)
    ap.add_argument("--src", default="./outputs/parity_multiseed")
    ap.add_argument("--out", default="./outputs/parity_multiseed_bn")
    ap.add_argument("--skip-ddpm", action="store_true")
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32",
                    help="jax-arm compute dtype (bf16 = fast-training arm)")
    ap.add_argument("--doc", default="parity_round3_multiseed_bn",
                    help="basename of the docs/ json+md outputs")
    args = ap.parse_args()
    src_base, base = Path(args.src), Path(args.out)
    script = ROOT / "scripts" / "parity_experiment.py"

    done = []
    for seed in range(args.seeds):
        src = src_base / f"seed{seed}"
        if not (src / "torch_gen.npz").exists():
            print(f"[bn-arms] seed{seed}: torch arm not finished yet — skip")
            continue
        d = base / f"seed{seed}"
        d.mkdir(parents=True, exist_ok=True)
        for name in TORCH_ARTIFACTS:
            if (src / name).exists() and not (d / name).exists():
                shutil.copy(src / name, d / name)
        if (src / "refdata").exists() and not (d / "refdata").exists():
            shutil.copytree(src / "refdata", d / "refdata")
        log = d / "run.log"
        common = [sys.executable, str(script), "--out", str(d),
                  "--seed", str(seed), "--diff-steps", str(args.diff_steps),
                  "--audio-norm", "batch", "--dtype", args.dtype]
        if not (d / "report.json").exists():
            if not (d / "jax_gen.npz").exists():
                run(common + ["--stage", "jax"], log)
            run(common + ["--stage", "metrics"], log)
        if not args.skip_ddpm and (d / "torch_gen_ddpm.npz").exists() \
                and not (d / "report_ddpm.json").exists():
            if not (d / "jax_gen_ddpm.npz").exists():
                run(common + ["--stage", "jax", "--sampler", "ddpm",
                              "--skip-train"], log)
            run(common + ["--stage", "metrics", "--sampler", "ddpm"], log)
        done.append(seed)

    if done:
        aggregate(base, done, skip_ddpm=args.skip_ddpm, doc=args.doc,
                  dtype=args.dtype)


def aggregate(base: Path, seeds, *, skip_ddpm=False,
              doc="parity_round3_multiseed_bn", dtype="f32"):
    arms = ["ddim"] + ([] if skip_ddpm else ["ddpm"])
    table = {}
    for arm in arms:
        sfx = "" if arm == "ddim" else f"_{arm}"
        per = {s: {m: [] for m in METRICS} for s in STACKS}
        used = []
        for seed in seeds:
            p = base / f"seed{seed}" / f"report{sfx}.json"
            if not p.exists():
                continue
            rep = json.loads(p.read_text())
            for s in STACKS:
                for m in METRICS:
                    per[s][m].append(rep[s][m])
            used.append(seed)
        if used:
            table[arm] = {
                "seeds": used,
                **{s: {m: _ci(v) for m, v in per[s].items()} for s in STACKS},
            }
    variant = ("audio_norm='batch'" if dtype == "f32"
               else "audio_norm='batch' + bf16 compute (fast-training config)")
    out = {
        "arms": table,
        "jax_arm_dtype": dtype,
        "read_me": f"jax arm retrained with {variant} against the SAME torch "
                   "generations as docs/parity_round3_multiseed.json. "
                   "mean ± 95% CI.",
    }
    (ROOT / "docs" / f"{doc}.json").write_text(
        json.dumps(out, indent=1)
    )
    lines = [f"# Multi-seed parity — jax arm: {variant}", "",
             out["read_me"], ""]
    col = "syntalker_tpu (BN)" if dtype == "f32" else "syntalker_tpu (BN, bf16)"
    for arm, t in table.items():
        lines += [f"## {'DDIM-50' if arm == 'ddim' else 'DDPM-1000'} "
                  f"(seeds {t['seeds']})", "",
                  f"| Metric | reference torch | {col} |",
                  "|---|---|---|"]
        for m in METRICS:
            cells = []
            for s in STACKS:
                c = t[s][m]
                ci = f" ± {c['ci95']:.3g}" if c["ci95"] is not None else ""
                cells.append(f"{c['mean']:.4g}{ci}")
            lines.append(f"| {m} | {cells[0]} | {cells[1]} |")
        lines.append("")
    (ROOT / "docs" / f"{doc}.md").write_text(
        "\n".join(lines))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
