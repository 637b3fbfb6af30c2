"""Paired per-seed statistics for the two-stack parity claim (VERDICT r3 #4).

The round-3 tables report per-arm mean ± 95% CI, which is uninformative
for FGD (±9.7 on means ~6) because seed-to-seed model quality swings both
stacks in lockstep — the seeds are PAIRED (same data, same batch-index
stream, same sampling protocol). The right instrument is the paired
difference d_s = ours_s − torch_s:

  - paired t-CI on mean(d) (Student-t, n−1 dof),
  - sign test (#seeds where ours < torch; exact binomial p),

per metric per sampling protocol. Reads the per-seed values from the
multiseed artifacts (committed in docs/) and writes
docs/parity_round4_paired.{json,md}.

    python scripts/paired_stats.py [--src docs/parity_round3_multiseed_bn.json]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "scripts"))

from parity_multiseed import METRICS, T95  # noqa: E402

# lower is better for fgd / rot6d_mse; closer-to-GT is better for
# beat_align / l1div but both stacks undershoot GT in every run, so
# higher-is-better is the operative direction there
LOWER_BETTER = {"fgd": True, "rot6d_mse_vs_gt": True,
                "beat_align": False, "l1div": False}


def binom_two_sided_p(k: int, n: int) -> float:
    """Exact two-sided sign-test p-value (binomial, p=0.5)."""
    probs = [math.comb(n, i) * 0.5 ** n for i in range(n + 1)]
    p_obs = probs[k]
    return min(1.0, sum(p for p in probs if p <= p_obs + 1e-12))


def analyze(src: Path):
    data = json.loads(src.read_text())
    arms = data["arms"]
    out = {"source": str(src), "arms": {}}
    for arm, t in arms.items():
        ours = t.get("syntalker_tpu")
        torch = t.get("reference_torch")
        if not ours or not torch:
            continue
        rows = {}
        for m in METRICS:
            a = np.asarray(ours[m].get("values", []), np.float64)
            b = np.asarray(torch[m].get("values", []), np.float64)
            if len(a) != len(b) or len(a) < 2:
                continue
            d = a - b
            n = len(d)
            sem = d.std(ddof=1) / math.sqrt(n)
            ci = T95.get(n - 1, 1.96) * sem
            better = (d < 0) if LOWER_BETTER[m] else (d > 0)
            k = int(better.sum())
            rows[m] = {
                "n": n,
                "paired_mean_diff": float(d.mean()),
                "paired_ci95": float(ci),
                "per_seed_diff": [float(x) for x in d],
                "seeds_ours_better": k,
                "sign_test_p": round(binom_two_sided_p(k, n), 4),
                "direction": "lower_better" if LOWER_BETTER[m] else
                             "higher_better",
            }
        out["arms"][arm] = rows
    return out


def write_md(out, dst_md: Path):
    lines = [
        "# Paired per-seed parity statistics (round 4)",
        "",
        "Paired differences (syntalker_tpu − reference torch) per seed: the "
        "seeds share data, batch-index stream and protocol, so the paired "
        "comparison removes the seed-to-seed model-quality variance that "
        "made the per-arm CIs (±9.7 on FGD) uninformative. CI = Student-t "
        "95% on the mean paired difference; sign test = exact two-sided "
        "binomial.",
        f"\nSource: `{out['source']}`.",
        "",
    ]
    for arm, rows in out["arms"].items():
        proto = "DDIM-50" if arm == "ddim" else "DDPM-1000"
        lines += [f"## {proto}", "",
                  "| Metric | paired Δ (ours − torch) | seeds ours better "
                  "| sign p | per-seed Δ |",
                  "|---|---|---|---|---|"]
        for m, r in rows.items():
            arrow = "↓ better" if r["direction"] == "lower_better" else "↑ better"
            diffs = ", ".join(f"{x:+.3g}" for x in r["per_seed_diff"])
            lines.append(
                f"| {m} ({arrow}) | {r['paired_mean_diff']:+.4g} ± "
                f"{r['paired_ci95']:.3g} | {r['seeds_ours_better']}/{r['n']} "
                f"| {r['sign_test_p']} | {diffs} |"
            )
        lines.append("")
    dst_md.write_text("\n".join(lines))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=str(ROOT / "docs" /
                                         "parity_round3_multiseed_bn.json"))
    ap.add_argument("--out", default="parity_round4_paired")
    args = ap.parse_args()
    out = analyze(Path(args.src))
    (ROOT / "docs" / f"{args.out}.json").write_text(json.dumps(out, indent=1))
    write_md(out, ROOT / "docs" / f"{args.out}.md")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
