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


def analyze_pair(src_a: Path, src_b: Path, label_a: str, label_b: str):
    """Paired per-seed diff between the jax arms of TWO multiseed jsons
    (e.g. bf16 fast-training arm vs f32 arm). Both must have been scored
    against the SAME torch artifacts/oracle per seed; seeds are matched by
    position in the 'seeds' list."""
    a_arms = json.loads(src_a.read_text())["arms"]
    b_arms = json.loads(src_b.read_text())["arms"]
    out = {"source_a": str(src_a), "source_b": str(src_b),
           "label_a": label_a, "label_b": label_b, "arms": {}}
    for arm in a_arms:
        if arm not in b_arms:
            continue
        sa, sb = a_arms[arm]["seeds"], b_arms[arm]["seeds"]
        common = [s for s in sa if s in sb]
        if len(common) < 2:
            continue
        ia = [sa.index(s) for s in common]
        ib = [sb.index(s) for s in common]
        rows = {}
        for m in METRICS:
            va = np.asarray(a_arms[arm]["syntalker_tpu"][m]["values"],
                            np.float64)[ia]
            vb = np.asarray(b_arms[arm]["syntalker_tpu"][m]["values"],
                            np.float64)[ib]
            d = va - vb
            n = len(d)
            sem = d.std(ddof=1) / math.sqrt(n)
            ci = T95.get(n - 1, 1.96) * sem
            better = (d < 0) if LOWER_BETTER[m] else (d > 0)
            k = int(better.sum())
            rows[m] = {
                "n": n, "seeds": common,
                "paired_mean_diff": float(d.mean()),
                "paired_ci95": float(ci),
                "per_seed_diff": [float(x) for x in d],
                f"seeds_{label_a}_better": k,
                "sign_test_p": round(binom_two_sided_p(k, n), 4),
                "direction": "lower_better" if LOWER_BETTER[m] else
                             "higher_better",
                # the flip criterion: a is statistically worse than b only
                # if the whole CI sits on the wrong side of zero
                "statistically_worse": bool(
                    (d.mean() - ci > 0) if LOWER_BETTER[m]
                    else (d.mean() + ci < 0)),
            }
        out["arms"][arm] = rows
    return out


def write_pair_md(out, dst_md: Path):
    la, lb = out["label_a"], out["label_b"]
    lines = [
        f"# Paired per-seed: {la} vs {lb} jax arms (round 4)",
        "",
        f"Both arms trained on identical data/batch streams per seed and "
        f"scored against the SAME torch-trained eval-VAE oracle; the only "
        f"variable is the compute dtype. Δ = {la} − {lb}; CI = Student-t "
        "95%. A metric is 'statistically worse' only if its whole CI sits "
        "on the wrong side of zero.",
        f"\nSources: `{out['source_a']}`, `{out['source_b']}`.",
        "",
    ]
    for arm, rows in out["arms"].items():
        proto = "DDIM-50" if arm == "ddim" else "DDPM-1000"
        lines += [f"## {proto}", "",
                  f"| Metric | paired Δ ({la} − {lb}) | {la} better | "
                  "sign p | statistically worse? | per-seed Δ |",
                  "|---|---|---|---|---|---|"]
        for m, r in rows.items():
            arrow = "↓ better" if r["direction"] == "lower_better" else "↑ better"
            diffs = ", ".join(f"{x:+.3g}" for x in r["per_seed_diff"])
            lines.append(
                f"| {m} ({arrow}) | {r['paired_mean_diff']:+.4g} ± "
                f"{r['paired_ci95']:.3g} | {r[f'seeds_{la}_better']}/{r['n']} "
                f"| {r['sign_test_p']} | "
                f"{'**YES**' if r['statistically_worse'] else 'no'} | {diffs} |"
            )
        lines.append("")
    dst_md.write_text("\n".join(lines))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=str(ROOT / "docs" /
                                         "parity_round3_multiseed_bn.json"))
    ap.add_argument("--out", default="parity_round4_paired")
    ap.add_argument("--compare", default=None,
                    help="second multiseed json: paired diff between the "
                         "two jsons' jax arms instead of ours-vs-torch")
    ap.add_argument("--labels", default="bf16,f32",
                    help="labels for --compare mode (a,b)")
    args = ap.parse_args()
    if args.compare:
        la, lb = args.labels.split(",")
        out = analyze_pair(Path(args.src), Path(args.compare), la, lb)
        (ROOT / "docs" / f"{args.out}.json").write_text(
            json.dumps(out, indent=1))
        write_pair_md(out, ROOT / "docs" / f"{args.out}.md")
    else:
        out = analyze(Path(args.src))
        (ROOT / "docs" / f"{args.out}.json").write_text(
            json.dumps(out, indent=1))
        write_md(out, ROOT / "docs" / f"{args.out}.md")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
