"""Cold-start (time-to-first-window) measurement + mitigation (VERDICT r3 #8).

A serving process is not useful until its programs are compiled. This
probe measures, in FRESH subprocesses, how long a full-size
StreamingMotionSession takes from process start to its first emitted
motion segment under three regimes:

  cold        empty compilation cache (worst case),
  warmcache   persistent jax compilation cache already populated,
  aot         PJRT executable pre-serialized to disk
              (jax.experimental.serialize_executable) and loaded instead
              of compiled — tracing AND XLA compilation skipped.

The aot mode serializes the session's three programs (first/steady/flush)
after one warm run, then a fresh process deserializes and drives the same
window — executables are device-topology-specific, which a single-chip
serving process satisfies by construction.

    python scripts/probe_cold_start.py            # orchestrates all modes
    python scripts/probe_cold_start.py <mode>     # one fresh-process probe
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
CACHE = ROOT / "outputs" / "coldstart_cache"
AOT_DIR = ROOT / "outputs" / "coldstart_aot"
T0 = time.perf_counter()  # process start (imports counted)


def build_session():
    import jax

    from syntalker_tpu.data import joints as J  # noqa: F401
    from syntalker_tpu.diffusion.schedule import make_diffusion
    from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
    from syntalker_tpu.models.rvqvae import RVQVAEConfig, create_rvqvae
    from syntalker_tpu.ops.quantize import RVQConfig, rvq_forward
    from syntalker_tpu.data.stats import identity_pose_stats
    from syntalker_tpu.streaming import StreamingMotionSession

    rng = jax.random.PRNGKey(0)
    cfg = MDMConfig()
    mdm, params = create_mdm(cfg, rng, frames=128)
    diffusion = make_diffusion(schedule="cosine", steps=1000,
                               timestep_respacing="ddim50")
    rvq = {}
    for i, (name, dim) in enumerate([("upper", 78), ("hands", 180),
                                     ("lower", 57)]):
        rcfg = RVQVAEConfig(input_dim=dim, quantizer=RVQConfig())
        module, p, state = create_rvqvae(rcfg, jax.random.fold_in(rng, i))
        z = jax.random.normal(jax.random.fold_in(rng, 100 + i), (1, 600, 512))
        state = rvq_forward(z, state, rcfg.quantizer, train=True,
                            rng=jax.random.fold_in(rng, 200 + i)).state
        rvq[name] = (module, p, state)
    return StreamingMotionSession(
        mdm=mdm, mdm_params=params, diffusion=diffusion, rvq_modules=rvq,
        stats=identity_pose_stats(),
    )


def first_window(sess):
    g = np.random.default_rng(0)
    feats = g.normal(0, 0.1, (533 * 128, 2)).astype(np.float32)
    segs = sess.push_audio(feats)
    assert segs and np.isfinite(segs[0]["axis_angle"]).all()
    return segs


def run_probe(mode: str):
    import jax

    if mode in ("warmcache", "cold"):
        jax.config.update("jax_compilation_cache_dir", str(CACHE))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    t_setup0 = time.perf_counter()
    sess = build_session()
    t_built = time.perf_counter()

    if mode == "aot-save":
        # warm the three programs via their public drive path, then
        # serialize the compiled executables
        from jax.experimental import serialize_executable as se

        import pickle

        import jax.numpy as jnp

        AOT_DIR.mkdir(parents=True, exist_ok=True)
        a = jnp.zeros((1, 533 * 128, 2), jnp.float32)
        w = jnp.zeros((1, 128), jnp.int32)
        for name, fn in (("first", sess._first), ("steady", sess._steady),
                         ("flush", sess._flush)):
            args = (sess._state,) if name == "flush" else (a, w, sess._state)
            compiled = fn.lower(*args).compile()
            payload, in_tree, out_tree = se.serialize(compiled)
            (AOT_DIR / f"{name}.bin").write_bytes(payload)
            (AOT_DIR / f"{name}.trees").write_bytes(
                pickle.dumps((in_tree, out_tree))
            )
        print(json.dumps({"mode": mode, "saved": True}))
        return

    if mode == "aot":
        import pickle

        from jax.experimental import serialize_executable as se

        loaded = {}
        for name in ("first", "steady", "flush"):
            payload = (AOT_DIR / f"{name}.bin").read_bytes()
            in_tree, out_tree = pickle.loads(
                (AOT_DIR / f"{name}.trees").read_bytes()
            )
            loaded[name] = se.deserialize_and_load(payload, in_tree, out_tree)
        sess._first = loaded["first"]
        sess._steady = loaded["steady"]
        sess._flush = loaded["flush"]

    t_prog0 = time.perf_counter()
    first_window(sess)
    t_done = time.perf_counter()
    print(json.dumps({
        "mode": mode,
        "ttfw_s": round(t_done - T0, 1),
        "imports_s": round(t_setup0 - T0, 1),
        "build_s": round(t_built - t_setup0, 1),
        "first_window_s": round(t_done - t_prog0, 1),
    }))


def orchestrate():
    env = dict(os.environ)
    results = []
    import shutil

    shutil.rmtree(CACHE, ignore_errors=True)
    for mode in ("cold", "warmcache", "aot-save", "aot"):
        out = subprocess.run(
            [sys.executable, __file__, mode], env=env,
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if out.returncode != 0 or not line:
            results.append({"mode": mode, "error": out.stderr[-800:]})
        else:
            results.append(json.loads(line[-1]))
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"cold_start": results}))


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run_probe(sys.argv[1])
    else:
        orchestrate()
