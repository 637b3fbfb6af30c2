"""Count collectives in the compiled TP denoise step (ADVICE r2 mesh.py:72).

The MDM_TP_LAYOUT comment promises few per-block collectives, and the
round-2 advisor pointed out the fused-qkv column sharding forces GSPMD to
insert an extra reshard per block (the contiguous 3C split cuts mid-head
at the (3, H, head_dim) reshape). Comments are not evidence — this script
compiles MDM.denoise (the serving hot loop) and one full training step on
a virtual {data, model} CPU mesh and counts the collective ops in the
optimized HLO, attributing them per category. Run before/after any TP
layout change:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/audit_tp_collectives.py

Writes docs/tp_collectives.json and prints the table.
"""

from __future__ import annotations

import json
import os
import re
import sys
from pathlib import Path

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import numpy as np  # noqa: E402

COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)\b"
)


def count_collectives(hlo_text: str) -> dict:
    counts: dict = {}
    for m in COLLECTIVE_RE.finditer(hlo_text):
        # skip the -start/-done duplicates of async pairs (count starts only)
        end = m.end()
        if hlo_text[end : end + 6] == "-done(":
            continue
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    counts["total"] = sum(counts.values())
    return counts


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from syntalker_tpu.diffusion.schedule import make_diffusion
    from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
    from syntalker_tpu.parallel.mesh import (
        make_mesh,
        replicate,
        shard_batch,
        shard_params,
    )
    from syntalker_tpu.train.diffusion_trainer import (
        DiffusionTrainConfig,
        make_diffusion_train_step,
    )
    from syntalker_tpu.train.state import create_train_state, make_diffusion_optimizer

    frames = 128
    cfg = MDMConfig()
    mesh = make_mesh(data=4, model=2)
    rng = jax.random.PRNGKey(0)
    module, params = create_mdm(cfg, rng, frames=frames)

    report = {"mesh": {"data": 4, "model": 2}, "config": "full-size 512d/8-block"}

    b = 8
    with mesh:
        sparams = shard_params(params, mesh)

        # ---- serving hot loop: denoise only (cond precomputed) ----
        lat = shard_batch(
            np.zeros((b, frames // 4, cfg.latent_total_dim), np.float32), mesh
        )
        t = shard_batch(np.zeros((b,), np.int32), mesh)
        from syntalker_tpu.models.denoiser import Conditioning

        cond = Conditioning(
            at_feat=shard_batch(
                np.zeros((b, frames // 4, cfg.audio_feat_dim), np.float32), mesh
            ),
            seed_emb=shard_batch(
                np.zeros((b, cfg.latent_dim), np.float32), mesh
            ),
        )

        def denoise(p, x, tt, c):
            return module.apply({"params": p}, x, tt, c, method="denoise")

        lowered = jax.jit(denoise).lower(sparams, lat, t, cond)
        hlo = lowered.compile().as_text()
        report["denoise"] = count_collectives(hlo)

        # ---- one full training step under the same layout ----
        optimizer = make_diffusion_optimizer()
        state = create_train_state(sparams, optimizer, rng)
        state = state.replace(
            step=replicate(state.step, mesh), rng=replicate(state.rng, mesh)
        )
        batch = {
            "latent_in": shard_batch(
                np.zeros((b, frames // 4, cfg.latent_total_dim), np.float32), mesh
            ),
            "audio": shard_batch(
                np.zeros((b, 16000 // 30 * frames, 2), np.float32), mesh
            ),
            "word": shard_batch(np.zeros((b, frames), np.int32), mesh),
        }
        diffusion = make_diffusion(schedule="cosine", steps=1000)
        step = make_diffusion_train_step(
            module, diffusion, optimizer, DiffusionTrainConfig()
        )
        hlo_train = jax.jit(step).lower(state, batch).compile().as_text()
        report["train_step"] = count_collectives(hlo_train)

    # reference points for reading the table:
    # - ideal Megatron block = 1 all-reduce after attention proj + 1 after
    #   fc2 (forward); backward mirrors them; plus optimizer/grad sync on
    #   the data axis.
    # - the fused-qkv reshape reshard shows up as extra all-gathers or
    #   collective-permutes proportional to the 8 blocks.
    report["blocks"] = cfg.num_layers
    (ROOT / "docs" / "tp_collectives.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
