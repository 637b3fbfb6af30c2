"""Run the shipped BEAT2 eval CLI end-to-end with real trained artifacts.

The reference's `test.py` path needs three artifacts: a diffusion ckpt,
three RVQ ckpts, and the eval-VAE. This script assembles all of them from
what the round-2 runs produced — the XL demo-clip training checkpoints
(outputs/smoke_xl_r2, scripts/smoke_train.py) and the torch-trained
eval-VAE from the parity experiment (converted via convert_eval_vae) —
builds a BEAT2-layout dataset dir around the demo clip, and invokes
`cli.test` exactly as a user would, producing metrics.json with
FGD/BeatAlign/L1Div computed by real weights end to end.

Usage: python scripts/run_full_eval_demo.py [--xl outputs/smoke_xl_r2]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

REF = "/root/reference"
CLIP = "2_scott_0_1_1"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--xl", default="outputs/smoke_xl_r2")
    ap.add_argument("--parity", default="outputs/parity")
    ap.add_argument("--out", default="outputs/full_eval_demo")
    args = ap.parse_args()
    xl = Path(args.xl)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # ---- 1. BEAT2-layout dataset dir around the demo clip ----
    root = out / "beat2"
    (root / "smplxflame_30").mkdir(parents=True, exist_ok=True)
    (root / "wave16k").mkdir(exist_ok=True)
    for src, dst in [
        (f"{REF}/demo/examples/{CLIP}.npz", root / "smplxflame_30" / f"{CLIP}.npz"),
        (f"{REF}/demo/examples/{CLIP}.wav", root / "wave16k" / f"{CLIP}.wav"),
    ]:
        if not Path(dst).exists():
            shutil.copy(src, dst)
    (root / "train_test_split.csv").write_text(f"id,type\n{CLIP},test\n")

    # ---- 2. torch-trained eval-VAE -> our checkpoint format ----
    ev_ckpt = out / "eval_vae_ckpt"
    if not ev_ckpt.exists():
        import types

        for name in ("lmdb", "fasttext", "smplx"):
            sys.modules.setdefault(name, types.ModuleType(name))
        import jax
        import optax
        import torch

        from syntalker_tpu.convert import convert_eval_vae
        from syntalker_tpu.train import state as ts

        sd = torch.load(Path(args.parity) / "torch_eval_vae.pt", map_location="cpu")
        variables = convert_eval_vae(sd)
        st = ts.create_train_state(
            variables["params"], optax.adam(1e-4), jax.random.PRNGKey(0)
        )
        saved = ts.save_checkpoint(ev_ckpt.parent / "eval_vae_tmp", st, 0)
        shutil.move(str(saved), str(ev_ckpt))
        shutil.rmtree(ev_ckpt.parent / "eval_vae_tmp", ignore_errors=True)

    # ---- 3. invoke the shipped eval CLI ----
    from syntalker_tpu.cli import test as test_cli

    rvq = ",".join(
        str(sorted((xl / "rvq" / f"rvq_{p}").glob("step_*"))[-1])
        for p in ("upper", "hands", "lower")
    )
    scale = json.loads((xl.parent / xl.name / "report.json").read_text())["latent_scale"]
    test_cli.main(
        [
            "--run-dir", str(out / "run"),
            "--eval-vae-ckpt", str(ev_ckpt),
            f"data.data_path={root}/",
            f"data.cache_path={out}/cache",
            "data.smplx_model_path=synthetic",
            f"test_ckpt={sorted((xl / 'diff').glob('step_*'))[-1]}",
            f"rvq_ckpts=[{rvq}]",
            f"latent_scale={scale}",
            "diffusion.timestep_respacing=ddim50",
            "diffusion.sampler=ddim",
        ]
    )
    print((out / "run" / "metrics.json").read_text())


if __name__ == "__main__":
    main()
