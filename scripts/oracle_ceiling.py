"""Duplicate-caption ceiling for the t2m oracle's R-precision protocol.

The oracle eval samples pools of 16 held-out windows and scores text→motion
R@1 (scripts/train_t2m_oracle.py). The captions are deterministic rules
over ~60 distinct strings, so a pool usually contains several windows with
IDENTICAL captions — and a PERFECT matcher can only tie them: its expected
R@1 on a target whose caption appears k times in the pool is 1/k. This
script replays the exact eval pools (same rng seeds / permutation streams
as eval_bigru seed=1 and eval_tmr seed=3) and reports

    ceiling_r1 = E_pools E_targets [1 / dup_count(target)]

so the measured R@1 can be read as a fraction of what is achievable under
this protocol at all. Appends nothing; prints one JSON line.

Run: python scripts/oracle_ceiling.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))


def pool_ceiling(captions, seed, pool=16, replications=20, top=3):
    """E[R@k] of a perfect matcher: the target's dup-group of size g is
    tied at the top, so P(target in top k) = min(k, g) / g."""
    caps = np.asarray(captions)
    n = len(caps)
    rng = np.random.default_rng(seed)
    vals = [[] for _ in range(top)]
    for _ in range(replications):
        idx = rng.permutation(n)[:pool]
        c = caps[idx]
        for t in range(pool):
            g = int((c == c[t]).sum())
            for k in range(1, top + 1):
                vals[k - 1].append(min(k, g) / g)
    return [float(np.mean(v)) for v in vals]


def main():
    from train_t2m_oracle import build_dataset

    _train, test = build_dataset()
    caps = test["captions"]
    cb = pool_ceiling(caps, seed=1)
    ct = pool_ceiling(caps, seed=3)
    out = {
        "held_out_windows": len(caps),
        "distinct_held_out_captions": len(set(caps)),
        "ceiling_r123_bigru_pools": [round(v, 4) for v in cb],
        "ceiling_r123_tmr_pools": [round(v, 4) for v in ct],
        "chance_r1": 1 / 16,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
