"""Two-stack quality-parity experiment (VERDICT round-1, Missing #2).

The BEAT2 dataset and the reference's released checkpoints are not in this
environment, so absolute paper numbers can't be reproduced. What CAN be
measured is whether the two *pipelines* — the reference torch stack run as
an oracle from /root/reference, and this framework — reach the same quality
when trained identically on the same data and scored by the same oracle:

- same data: the shipped demo clip (2_scott_0_1_1, 63.5 s), identical
  precomputed feature windows fed to both stacks from one npz,
- same configs: RVQ (width 128 / depth 2 / 6x256x512 codebooks — reduced
  width because the torch stack runs on ONE CPU core; everything else is the
  reference's rvq_beatx_train.py config), full-size MDM (512-d, 8 blocks,
  audio_f=word_f=256 — the reference hardcodes these), same optimizers,
  same step budgets, same batch sizes,
- same sampler protocol: windowed autoregressive DDIM-50 over the whole
  clip, GT latent seed for window 0 (trainer:429-433, demo.py use_ddim),
- same oracle: ONE eval-VAE (reference LocalEncoder+VQDecoderV3 composition,
  motion_representation.py:31-95) trained in torch on the GT windows, then
  ported with convert_eval_vae — both stacks' FGD is computed through the
  SAME converted network,
- same decode: the torch stack's decoded part features go through
  generation.decode_parts, the exact function our sampler output uses.

Stages (each resumable, artifacts under --out):
  data    -> windows.npz                (shared inputs + GT features)
  torch   -> torch_*.pt, torch_gen.npz  (reference stack: train + generate)
  jax     -> jax_gen.npz                (our stack: train + generate)
  metrics -> report.json                (shared-oracle FGD/L1Div/BeatAlign)

Reference files mirrored: rvq_beatx_train.py:328-352 (RVQ loss/optim),
diffusion_rvqvae_trainer.py:196-206,341-356 (_g_training), :359-541
(_g_test windowing), :607-619 (FGD latents), demo.py:52,425-427 (ddim50).
"""

from __future__ import annotations

import argparse
import json
import pickle
import sys
import time
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

REF = "/root/reference"
WAV = f"{REF}/demo/examples/2_scott_0_1_1.wav"
NPZ = f"{REF}/demo/examples/2_scott_0_1_1.npz"
MEAN_STD = f"{REF}/mean_std"

# matched configs (see module docstring)
RVQ_KW = dict(nb_code=256, code_dim=512, output_emb_width=512, down_t=2,
              stride_t=2, width=128, depth=2, dilation_growth_rate=3)
NUM_Q = 6
RVQ_ITERS = 600
RVQ_BATCH = 16
RVQ_LR = 2e-4
COMMIT_W = 0.02
DIFF_STEPS = 200  # overridable via --diff-steps
DIFF_BATCH = 8
DIFF_LR = 5e-5
AE_STEPS = 400
AE_BATCH = 32
AE_LR = 1e-4
VOCAB = 16
PARTS = ("upper", "hands", "lower")


def _out(args) -> Path:
    p = Path(args.out)
    p.mkdir(parents=True, exist_ok=True)
    return p


# --------------------------------------------------------------------------
# stage: data (JAX/numpy, shared by both stacks)
# --------------------------------------------------------------------------

def stage_data(args):
    import jax
    import jax.numpy as jnp

    from syntalker_tpu.data.cache import preprocess_clip
    from syntalker_tpu.data.features import pose_to_part_rot6d
    from syntalker_tpu.data.stats import load_pose_stats

    out = _out(args)
    arrays = preprocess_clip(NPZ, WAV, None, None)
    stats = load_pose_stats(MEAN_STD)

    pose = jnp.asarray(arrays["poses"][None])  # (1, N, 165) axis-angle
    trans_v = jnp.asarray(arrays["trans_v"][None])
    parts = pose_to_part_rot6d(pose)
    feats = {
        "upper": np.asarray(stats.normalize_part(parts["upper"], "upper"))[0],
        "hands": np.asarray(stats.normalize_part(parts["hands"], "hands"))[0],
        "lower": np.concatenate(
            [
                np.asarray(stats.normalize_part(parts["lower"], "lower"))[0],
                (np.asarray(trans_v)[0] - stats.trans_mean) / stats.trans_std,
            ],
            axis=-1,
        ),
        "full_rot6d": np.asarray(parts["full"])[0],  # (N, 330) unnormalized
    }

    n = feats["upper"].shape[0]

    def windows(x, length, stride):
        idx = np.arange(0, n - length + 1, stride)
        return np.stack([x[i : i + length] for i in idx])

    data = {"audio": arrays["audio"], "poses": arrays["poses"],
            "trans": arrays["trans"], "trans_v": arrays["trans_v"],
            "betas": arrays["betas"], "facial": arrays["facial"],
            "n_frames": np.array(n)}
    for p in PARTS:
        data[f"rvq_{p}"] = windows(feats[p], 64, 4)
        data[f"diff_{p}"] = windows(feats[p], 128, 16)
    data["ae_full"] = windows(feats["full_rot6d"], 64, 4)
    data["full_rot6d"] = feats["full_rot6d"]
    spf = 16000 // 30
    aud = arrays["audio"]
    data["diff_audio"] = np.stack(
        [aud[i * spf : (i + 128) * spf] for i in range(0, n - 128 + 1, 16)]
    )
    np.savez(out / "windows.npz", **data)
    print(f"data: {n} frames, rvq {data['rvq_upper'].shape[0]}w, "
          f"diff {data['diff_upper'].shape[0]}w -> {out/'windows.npz'}")


# --------------------------------------------------------------------------
# stage: torch (reference stack as the oracle, 1 CPU core)
# --------------------------------------------------------------------------

def _ref_setup():
    sys.path.insert(0, REF)
    for name in ("lmdb", "fasttext", "smplx"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")
        loguru.logger = types.SimpleNamespace(
            info=lambda *a, **k: None, warning=lambda *a, **k: None
        )
        sys.modules["loguru"] = loguru
    import torch

    torch.set_num_threads(1)
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore
    return torch


def _fabricate_vocab(out: Path) -> str:
    """vocab.pkl in the reference's format (build_vocab.py Vocab pickle)."""
    from dataloaders.build_vocab import Vocab

    d = out / "refdata" / "weights"
    d.mkdir(parents=True, exist_ok=True)
    v = Vocab("parity")
    for i in range(VOCAB - 4):
        v.index_word(f"w{i}")
    v.word_embedding_weights = (
        np.random.default_rng(0).normal(0, 0.1, (v.n_words, 300)).astype(np.float32)
    )
    with open(d / "vocab.pkl", "wb") as f:
        pickle.dump(v, f)
    return str(out / "refdata") + "/"


def stage_torch(args):
    torch = _ref_setup()
    diff_steps = getattr(args, "diff_steps", DIFF_STEPS)
    out = _out(args)
    data = np.load(out / "windows.npz")
    report = {}
    sd_off = getattr(args, "seed", 0)
    rng = np.random.default_rng(7 + sd_off)

    if getattr(args, "skip_train", False):
        return _torch_generate_only(args, torch, out, data, sd_off)

    # ---- 1. RVQ-VAEs (rvq_beatx_train.py:328-352) ----
    from models.vq.model import RVQVAE

    qargs = types.SimpleNamespace(
        num_quantizers=NUM_Q, shared_codebook=False,
        quantize_dropout_prob=0.2, mu=0.99,
    )
    rvqs = {}
    t_rvq = time.time()
    for part in PARTS:
        w = torch.from_numpy(data[f"rvq_{part}"]).float()
        torch.manual_seed(11 + sd_off)
        net = RVQVAE(qargs, input_width=w.shape[-1], activation="relu",
                     norm=None, **RVQ_KW)
        opt = torch.optim.AdamW(net.parameters(), lr=RVQ_LR, betas=(0.9, 0.99),
                                weight_decay=0.0)
        sched = torch.optim.lr_scheduler.LambdaLR(
            opt, lambda s: min(s / 10, 1.0)  # same 10-step warmup as ours
        )
        first = last = None
        for it in range(RVQ_ITERS):
            idx = rng.integers(0, w.shape[0], RVQ_BATCH)
            gt = w[idx]
            pred, commit, perp = net(gt).values()
            recon = torch.nn.functional.mse_loss(pred, gt)
            loss = recon + COMMIT_W * commit
            opt.zero_grad(); loss.backward(); opt.step(); sched.step()
            if first is None:
                first = float(loss)
            last = float(loss)
            if (it + 1) % 200 == 0:
                print(f"[torch rvq {part}] {it+1}: loss {last:.4f} "
                      f"recon {float(recon):.4f} perp {float(perp):.0f}")
        net.eval()
        rvqs[part] = net
        torch.save(net.state_dict(), out / f"torch_rvq_{part}.pt")
        report[f"rvq_{part}"] = {"first_loss": first, "last_loss": last}
    report["rvq_seconds"] = time.time() - t_rvq

    # ---- 2. latent encoding + per-stack calibrated scale ----
    with torch.no_grad():
        lat = [rvqs[p].map2latent(torch.from_numpy(data[f"diff_{p}"]).float())
               for p in PARTS]
        latent_in = torch.cat(lat, dim=2)
    scale = float(latent_in.std())
    latent_in = latent_in / scale
    report["latent_scale"] = scale
    np.save(out / "torch_latents.npy", latent_in.numpy())  # for --stage jaxswap
    print(f"[torch] latent scale {scale:.3f}, latent_in {tuple(latent_in.shape)}")

    # ---- 3. MDM diffusion training (_g_training :341-356) ----
    from diffusion.model_util import create_gaussian_diffusion
    from diffusion.resample import create_named_schedule_sampler
    from models.denoiser import MDM

    margs = types.SimpleNamespace(
        vqvae_type="rvqvae", audio_rep="onset+amplitude", audio_f=256,
        word_f=256, t_fix_pre=False, use_motionclip=False,
        vqvae_squeeze_scale=4, data_path=_fabricate_vocab(out),
    )
    torch.manual_seed(13 + sd_off)
    model = MDM(margs)
    diffusion = create_gaussian_diffusion()
    sampler = create_named_schedule_sampler("uniform", diffusion)
    opt = torch.optim.Adam(model.parameters(), lr=DIFF_LR)
    audio_w = torch.from_numpy(data["diff_audio"]).float()
    word_w = torch.zeros(audio_w.shape[0], 128, dtype=torch.long)
    losses = []
    t_diff = time.time()
    for it in range(diff_steps):
        idx = rng.integers(0, latent_in.shape[0], DIFF_BATCH)
        x0 = latent_in[idx].permute(0, 2, 1).unsqueeze(2)  # (B, 1536, 1, 32)
        cond = {"y": {
            "audio": audio_w[idx], "word": word_w[idx], "id": None,
            "seed": latent_in[idx][:, :4], "style_feature": None,
            "mask": (torch.zeros([DIFF_BATCH, 1, 1, 32]) < 1),
        }}
        t, _ = sampler.sample(DIFF_BATCH, x0.device)
        loss = diffusion.training_losses(model, x0, t, model_kwargs=cond)["loss"].mean()
        opt.zero_grad(); loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 0.99)
        opt.step()
        losses.append(float(loss))
        if (it + 1) % 25 == 0:
            print(f"[torch mdm] {it+1}: loss {np.mean(losses[-25:]):.4f} "
                  f"({(time.time()-t_diff)/(it+1):.1f}s/it)")
    torch.save(model.state_dict(), out / "torch_mdm.pt")
    report["diffusion"] = {"first_loss": float(np.mean(losses[:10])),
                           "last_loss": float(np.mean(losses[-10:])),
                           "seconds": time.time() - t_diff,
                           "sec_per_step": (time.time() - t_diff) / diff_steps}

    # ---- 4. eval-VAE oracle (motion_representation.py:31-95 composition,
    #          trained like our ae_trainer: MSE recon) ----
    from models.motion_encoder import LocalEncoder, VQDecoderV3
    from models.utils.skeleton import build_edge_topology as ref_edges

    from syntalker_tpu.ops.smplx import PARENTS

    aargs = types.SimpleNamespace(vae_layer=4, vae_length=240,
                                  vae_test_dim=330, vae_grow=[1, 1, 2, 1])
    torch.manual_seed(17 + sd_off)

    class RefEvalVAE(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = LocalEncoder(aargs, ref_edges([int(p) for p in PARENTS]))
            self.decoder = VQDecoderV3(aargs)

        def forward(self, x):
            return self.decoder(self.encoder(x))

    ae = RefEvalVAE()
    aopt = torch.optim.Adam(ae.parameters(), lr=AE_LR)
    full_w = torch.from_numpy(data["ae_full"]).float()
    first = last = None
    for it in range(AE_STEPS):
        idx = rng.integers(0, full_w.shape[0], AE_BATCH)
        gt = full_w[idx]
        loss = torch.nn.functional.mse_loss(ae(gt), gt)
        aopt.zero_grad(); loss.backward(); aopt.step()
        if first is None:
            first = float(loss)
        last = float(loss)
        if (it + 1) % 100 == 0:
            print(f"[torch eval-vae] {it+1}: recon {last:.5f}")
    ae.eval()
    torch.save(ae.state_dict(), out / "torch_eval_vae.pt")
    report["eval_vae"] = {"first_recon": first, "last_recon": last}

    # ---- 5. windowed generation (_g_test :359-541; demo ddim or the
    #         shipped DDPM-1000 eval protocol) ----
    sampler = getattr(args, "sampler", "ddim")
    gen_parts, gen_secs = _torch_generate(
        torch, model, diffusion, rvqs, scale, data, margs,
        sampler=sampler, seed=sd_off,
    )
    sfx = "" if sampler == "ddim" else f"_{sampler}"
    np.savez(out / f"torch_gen{sfx}.npz", **gen_parts)
    report["generation_seconds"] = gen_secs
    (out / f"torch_report{sfx}.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


def _torch_generate_only(args, torch, out, data, sd_off):
    """Reload the saved torch checkpoints from --out and only re-generate —
    e.g. a DDPM-1000 arm (--sampler ddpm --skip-train) over the models the
    DDIM run trained, a paired comparison with zero re-training."""
    import types as _types

    from models.vq.model import RVQVAE
    from models.denoiser import MDM

    qargs = _types.SimpleNamespace(
        num_quantizers=NUM_Q, shared_codebook=False,
        quantize_dropout_prob=0.2, mu=0.99,
    )
    rvqs = {}
    for part in PARTS:
        w = data[f"rvq_{part}"]
        net = RVQVAE(qargs, input_width=w.shape[-1], activation="relu",
                     norm=None, **RVQ_KW)
        net.load_state_dict(torch.load(out / f"torch_rvq_{part}.pt",
                                       map_location="cpu"))
        net.eval()
        rvqs[part] = net
    margs = _types.SimpleNamespace(
        vqvae_type="rvqvae", audio_rep="onset+amplitude", audio_f=256,
        word_f=256, t_fix_pre=False, use_motionclip=False,
        vqvae_squeeze_scale=4, data_path=_fabricate_vocab(out),
    )
    model = MDM(margs)
    model.load_state_dict(torch.load(out / "torch_mdm.pt", map_location="cpu"))
    scale = json.loads((out / "torch_report.json").read_text())["latent_scale"]
    sampler = getattr(args, "sampler", "ddim")
    gen_parts, gen_secs = _torch_generate(
        torch, model, None, rvqs, scale, data, margs,
        sampler=sampler, seed=sd_off,
    )
    sfx = "" if sampler == "ddim" else f"_{sampler}"
    np.savez(out / f"torch_gen{sfx}.npz", **gen_parts)
    print(json.dumps({"generation_seconds": gen_secs, "sampler": sampler}))


def _torch_generate(torch, model, diffusion, rvqs, scale, data, margs,
                    sampler="ddim", seed=0):
    """Reference windowed autoregressive sampling (demo ddim50 protocol, or
    the trainer's shipped DDPM-1000 eval, diffusion_rvqvae_trainer.py:361).

    Mirrors _g_test (:419-474): GT-latent seed for window 0, previous
    window's last 4 latent frames after; returns decoded NORMALIZED part
    features so the shared generation.decode_parts handles the rest.
    """
    from diffusion.model_util import create_gaussian_diffusion

    model.eval()
    torch.manual_seed(31 + seed)  # the sampling-noise stream
    ddim = create_gaussian_diffusion(use_ddim=(sampler == "ddim"))
    n = int(data["n_frames"]) - int(data["n_frames"]) % 8
    pre, squeeze, pose_len = 4, 4, 128
    round_l = pose_len - pre * squeeze
    roundt = (n - pre * squeeze) // round_l
    spf = 16000 // 30

    audio = torch.from_numpy(data["audio"][None]).float()
    # GT latents over the leading window for the seed (trainer :429-433)
    with torch.no_grad():
        first_win = {p: torch.from_numpy(
            _full_feature(data, p)[None, :pose_len]).float() for p in PARTS}
        seed_lat = torch.cat(
            [rvqs[p].map2latent(first_win[p]) for p in PARTS], dim=2
        ) / scale

    rec = []
    t0 = time.time()
    last_sample = None
    with torch.no_grad():
        for i in range(roundt):
            a0 = i * spf * round_l
            in_audio = audio[:, a0 : a0 + spf * pose_len]
            if in_audio.shape[1] < spf * pose_len:
                in_audio = torch.nn.functional.pad(
                    in_audio, (0, 0, 0, spf * pose_len - in_audio.shape[1])
                )
            seed = seed_lat[:, :pre] if i == 0 else last_sample[:, -pre:]
            cond = {"y": {
                "audio": in_audio,
                "word": torch.zeros(1, pose_len, dtype=torch.long),
                "id": None, "style_feature": None, "seed": seed,
                "mask": (torch.zeros([1, 1, 1, 32]) < 1),
            }}
            loop = (ddim.ddim_sample_loop if sampler == "ddim"
                    else ddim.p_sample_loop)
            sample = loop(
                model, (1, 1536, 1, 32), clip_denoised=False,
                model_kwargs=cond, skip_timesteps=0, init_image=None,
                progress=False, dump_steps=None, noise=None, const_noise=False,
            )
            sample = sample.squeeze(2).permute(0, 2, 1)  # (1, 32, 1536)
            last_sample = sample.clone()
            rec.append(sample if i == 0 else sample[:, pre:])
        latents = torch.cat(rec, dim=1) * scale
        parts = {}
        for j, p in enumerate(PARTS):
            # .clone(): the reference quantizer mutates its input in place
            z = latents[..., j * 512 : (j + 1) * 512].clone()
            parts[p] = rvqs[p].latent2origin(z)[0].numpy()[0]
    return parts, time.time() - t0


def _full_feature(data, part):
    """Whole-clip normalized feature track for a part, from the stride-16
    diffusion windows' originals (reconstruct from window 0 + tails)."""
    w = data[f"diff_{part}"]
    n = int(data["n_frames"])
    track = np.zeros((n, w.shape[-1]), w.dtype)
    for i in range(w.shape[0]):
        track[i * 16 : i * 16 + 128] = w[i]
    return track


# --------------------------------------------------------------------------
# stage: jax (our stack, same budgets)
# --------------------------------------------------------------------------

def _dtype_kw(args):
    """MDMConfig dtype kwargs for the jax arm (--dtype bf16 = the
    fast-training config: block + WavEncoder-conv compute in bf16, params
    and norm statistics f32 — BASELINE.md 'diffusion train step, bf16')."""
    import jax.numpy as jnp

    if getattr(args, "dtype", "f32") == "bf16":
        return {"dtype": jnp.bfloat16, "audio_dtype": jnp.bfloat16}
    return {}


def stage_jax(args):
    diff_steps = getattr(args, "diff_steps", DIFF_STEPS)
    import jax
    import jax.numpy as jnp

    from syntalker_tpu import generation as G
    from syntalker_tpu.data.stats import load_pose_stats
    from syntalker_tpu.diffusion.schedule import make_diffusion
    from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
    from syntalker_tpu.models.rvqvae import RVQVAEConfig, create_rvqvae
    from syntalker_tpu.ops.quantize import RVQConfig
    from syntalker_tpu.train.diffusion_trainer import (
        DiffusionTrainConfig,
        make_diffusion_train_step,
    )
    from syntalker_tpu.train.rvq_trainer import make_rvq_train_step
    from syntalker_tpu.train.state import (
        create_train_state,
        make_diffusion_optimizer,
        make_rvq_optimizer,
    )

    out = _out(args)
    data = np.load(out / "windows.npz")
    stats = load_pose_stats(MEAN_STD)
    report = {}
    sd_off = getattr(args, "seed", 0)
    rng = np.random.default_rng(7 + sd_off)  # same batch-index stream as torch

    if getattr(args, "skip_train", False):
        # reload the trained stack and only re-generate (paired DDPM arm)
        with open(out / "jax_ckpt.pkl", "rb") as f:
            ck = pickle.load(f)
        rvq_modules = {}
        for part in PARTS:
            w = data[f"rvq_{part}"]
            cfg = RVQVAEConfig(
                input_dim=w.shape[-1], width=RVQ_KW["width"],
                output_emb_width=RVQ_KW["output_emb_width"],
                down_t=RVQ_KW["down_t"], stride_t=RVQ_KW["stride_t"],
                depth=RVQ_KW["depth"],
                dilation_growth_rate=RVQ_KW["dilation_growth_rate"],
                quantizer=RVQConfig(
                    num_quantizers=NUM_Q, nb_code=RVQ_KW["nb_code"],
                    code_dim=RVQ_KW["code_dim"],
                ),
            )
            module, _, _ = create_rvqvae(cfg, jax.random.PRNGKey(0), example_len=64)
            rvq_modules[part] = (
                module,
                jax.tree.map(jnp.asarray, ck["rvq_params"][part]),
                jax.tree.map(jnp.asarray, ck["rvq_qstate"][part]),
            )
        mcfg = MDMConfig(vocab_size=VOCAB,
                         audio_norm=getattr(args, "audio_norm", "group"),
                         **_dtype_kw(args))
        module, _ = create_mdm(mcfg, jax.random.PRNGKey(0), frames=128)
        mdm_params = jax.tree.map(jnp.asarray, ck["mdm_params"])
        if ck.get("mdm_model_state"):
            mdm_params = {"params": mdm_params,
                          **jax.tree.map(jnp.asarray, ck["mdm_model_state"])}
        scale = ck["latent_scale"]
        _jax_generate(args, out, data, module, mdm_params, rvq_modules,
                      scale, sd_off, report)
        return

    # ---- 1. RVQ-VAEs ----
    rvq_modules = {}
    t_rvq = time.time()
    for part in PARTS:
        w = data[f"rvq_{part}"]
        cfg = RVQVAEConfig(
            input_dim=w.shape[-1], width=RVQ_KW["width"],
            output_emb_width=RVQ_KW["output_emb_width"],
            down_t=RVQ_KW["down_t"], stride_t=RVQ_KW["stride_t"],
            depth=RVQ_KW["depth"],
            dilation_growth_rate=RVQ_KW["dilation_growth_rate"],
            quantizer=RVQConfig(
                num_quantizers=NUM_Q, nb_code=RVQ_KW["nb_code"],
                code_dim=RVQ_KW["code_dim"],
            ),
        )
        module, params, qstate = create_rvqvae(cfg, jax.random.PRNGKey(11 + sd_off), example_len=64)
        opt = make_rvq_optimizer(
            lr=RVQ_LR, warmup_iters=10, milestones=(RVQ_ITERS + 1,)
        )
        state = create_train_state(params, opt, jax.random.PRNGKey(11 + sd_off),
                                   quantizer_state=qstate)
        step = jax.jit(make_rvq_train_step(module, opt))
        first = last = None
        for it in range(RVQ_ITERS):
            idx = rng.integers(0, w.shape[0], RVQ_BATCH)
            state, m = step(state, jnp.asarray(w[idx]))
            if first is None:
                first = float(m["loss"])
            last = float(m["loss"])
            if (it + 1) % 200 == 0:
                print(f"[jax rvq {part}] {it+1}: loss {last:.4f} "
                      f"recon {float(m['recon']):.4f} perp {float(m['perplexity']):.0f}")
        rvq_modules[part] = (module, state.params, state.quantizer_state)
        report[f"rvq_{part}"] = {"first_loss": first, "last_loss": last}
    report["rvq_seconds"] = time.time() - t_rvq

    # ---- 2. latents + calibrated scale ----
    lat = [m.apply({"params": p}, jnp.asarray(data[f"diff_{n_}"]), method="map2latent")
           for n_, (m, p, _q) in rvq_modules.items()]
    latent_in = jnp.concatenate(lat, axis=2)
    scale = float(jnp.std(latent_in))
    latent_in = latent_in / scale
    report["latent_scale"] = scale
    print(f"[jax] latent scale {scale:.3f}, latent_in {latent_in.shape}")

    # ---- 3. MDM diffusion ----
    mcfg = MDMConfig(vocab_size=VOCAB,
                     audio_norm=getattr(args, "audio_norm", "group"),
                     **_dtype_kw(args))
    module, params = create_mdm(mcfg, jax.random.PRNGKey(13 + sd_off), frames=128)
    diffusion = make_diffusion(steps=1000)
    opt = make_diffusion_optimizer(lr=DIFF_LR)
    state = create_train_state(params, opt, jax.random.PRNGKey(13 + sd_off))
    step = jax.jit(make_diffusion_train_step(module, diffusion, opt, DiffusionTrainConfig()))
    audio_w = data["diff_audio"]
    losses = []
    t_diff = time.time()
    for it in range(diff_steps):
        idx = rng.integers(0, latent_in.shape[0], DIFF_BATCH)
        batch = {
            "latent_in": latent_in[jnp.asarray(idx)],
            "audio": jnp.asarray(audio_w[idx]),
            "word": jnp.zeros((DIFF_BATCH, 128), jnp.int32),
        }
        state, m = step(state, batch)
        losses.append(float(m["predict_x0_loss"]))
        if (it + 1) % 25 == 0:
            print(f"[jax mdm] {it+1}: loss {np.mean(losses[-25:]):.4f} "
                  f"({(time.time()-t_diff)/(it+1):.2f}s/it)")
    report["diffusion"] = {"first_loss": float(np.mean(losses[:10])),
                           "last_loss": float(np.mean(losses[-10:])),
                           "seconds": time.time() - t_diff,
                           "sec_per_step": (time.time() - t_diff) / diff_steps}

    # ---- 4. persist the trained stack (enables paired --skip-train arms) --
    with open(out / "jax_ckpt.pkl", "wb") as f:
        pickle.dump({
            "mdm_params": jax.device_get(state.params),
            "mdm_model_state": jax.device_get(state.model_state or {}),
            "rvq_params": {k: jax.device_get(v[1]) for k, v in rvq_modules.items()},
            "rvq_qstate": {k: jax.device_get(v[2]) for k, v in rvq_modules.items()},
            "latent_scale": scale,
        }, f)

    # ---- 5. windowed generation over the whole clip ----
    mdm_vars = (
        {"params": state.params, **state.model_state}
        if state.model_state else state.params
    )
    _jax_generate(args, out, data, module, mdm_vars, rvq_modules, scale,
                  sd_off, report)


def _jax_generate(args, out, data, module, mdm_params, rvq_modules, scale,
                  sd_off, report):
    import jax
    import jax.numpy as jnp

    from syntalker_tpu import generation as G
    from syntalker_tpu.diffusion.schedule import make_diffusion

    n = int(data["n_frames"])
    plan = G.plan_windows(n)
    audio = data["audio"][None]
    aw = jnp.asarray(G.window_audio(audio, plan))
    ww = jnp.zeros((plan.num_windows, 1, 128), jnp.int32)
    first_win = {p: jnp.asarray(_full_feature(data, p)[None, :128]) for p in PARTS}
    seed_lat = jnp.concatenate(
        [m.apply({"params": pp}, first_win[n_], method="map2latent")
         for n_, (m, pp, _q) in rvq_modules.items()], axis=2
    ) / scale
    sampler = getattr(args, "sampler", "ddim")
    ddim = make_diffusion(
        steps=1000, timestep_respacing="ddim50" if sampler == "ddim" else None
    )
    t_gen = time.time()
    latents = G.sample_windows(
        module, mdm_params, ddim, plan, aw, ww,
        seed_lat[:, : plan.pre_frames], jax.random.PRNGKey(3 + sd_off),
        sampler=sampler,
    )
    dec_parts = {}
    for j, (n_, (m, pp, qs)) in enumerate(rvq_modules.items()):
        z = latents[..., j * 512 : (j + 1) * 512] * scale
        dec_parts[n_] = np.asarray(
            m.apply({"params": pp}, z, qs, method="latent2origin")
        )[0]
    report["generation_seconds"] = time.time() - t_gen
    sfx = "" if sampler == "ddim" else f"_{sampler}"
    np.savez(out / f"jax_gen{sfx}.npz", **dec_parts)
    (out / f"jax_report{sfx}.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


def stage_jaxswap(args):
    """L1Div-deficit diagnosis (VERDICT r2 #1c): train OUR MDM on the TORCH
    stack's latents (same budget/seeds), generate with our windowed sampler,
    decode through the TORCH RVQs — isolating the denoiser+sampler from the
    latent distribution. If this arm's L1Div matches torch's, the measured
    diversity gap is a property of the harder latents our better-reconstructing
    RVQ produces (the documented target-entropy effect), not of our
    denoiser/sampler."""
    diff_steps = getattr(args, "diff_steps", DIFF_STEPS)
    import jax
    import jax.numpy as jnp

    from syntalker_tpu import generation as G
    from syntalker_tpu.diffusion.schedule import make_diffusion
    from syntalker_tpu.models.denoiser import MDMConfig, create_mdm
    from syntalker_tpu.train.diffusion_trainer import (
        DiffusionTrainConfig,
        make_diffusion_train_step,
    )
    from syntalker_tpu.train.state import (
        create_train_state,
        make_diffusion_optimizer,
    )

    out = _out(args)
    data = np.load(out / "windows.npz")
    sd_off = getattr(args, "seed", 0)
    rng = np.random.default_rng(7 + sd_off)
    latent_in = jnp.asarray(np.load(out / "torch_latents.npy"))
    scale = json.loads((out / "torch_report.json").read_text())["latent_scale"]

    mcfg = MDMConfig(vocab_size=VOCAB)
    module, params = create_mdm(mcfg, jax.random.PRNGKey(13 + sd_off), frames=128)
    diffusion = make_diffusion(steps=1000)
    opt = make_diffusion_optimizer(lr=DIFF_LR)
    state = create_train_state(params, opt, jax.random.PRNGKey(13 + sd_off))
    step = jax.jit(make_diffusion_train_step(module, diffusion, opt,
                                             DiffusionTrainConfig()))
    audio_w = data["diff_audio"]
    losses = []
    for it in range(diff_steps):
        idx = rng.integers(0, latent_in.shape[0], DIFF_BATCH)
        batch = {
            "latent_in": latent_in[jnp.asarray(idx)],
            "audio": jnp.asarray(audio_w[idx]),
            "word": jnp.zeros((DIFF_BATCH, 128), jnp.int32),
        }
        state, m = step(state, batch)
        losses.append(float(m["predict_x0_loss"]))
        if (it + 1) % 100 == 0:
            print(f"[jaxswap mdm] {it+1}: loss {np.mean(losses[-25:]):.4f}")

    # generate with OUR sampler; seed latents from the torch latent track
    torch = _ref_setup()
    import torch as _t  # noqa: F401 (via _ref_setup sys.path)
    from models.vq.model import RVQVAE
    import types as _types

    qargs = _types.SimpleNamespace(
        num_quantizers=NUM_Q, shared_codebook=False,
        quantize_dropout_prob=0.2, mu=0.99,
    )
    rvqs = {}
    for part in PARTS:
        w = data[f"rvq_{part}"]
        net = RVQVAE(qargs, input_width=w.shape[-1], activation="relu",
                     norm=None, **RVQ_KW)
        net.load_state_dict(torch.load(out / f"torch_rvq_{part}.pt",
                                       map_location="cpu"))
        net.eval()
        rvqs[part] = net

    n = int(data["n_frames"])
    plan = G.plan_windows(n)
    audio = data["audio"][None]
    aw = jnp.asarray(G.window_audio(audio, plan))
    ww = jnp.zeros((plan.num_windows, 1, 128), jnp.int32)
    with torch.no_grad():
        first_win = {p_: torch.from_numpy(
            _full_feature(data, p_)[None, :128]).float() for p_ in PARTS}
        seed_lat = torch.cat(
            [rvqs[p_].map2latent(first_win[p_]) for p_ in PARTS], dim=2
        ).numpy() / scale
    ddim = make_diffusion(steps=1000, timestep_respacing="ddim50")
    latents = G.sample_windows(
        module, state.params, ddim, plan, aw, ww,
        jnp.asarray(seed_lat[:, : plan.pre_frames]),
        jax.random.PRNGKey(3 + sd_off), sampler="ddim",
    )
    lat_t = torch.from_numpy(np.asarray(latents)).float() * scale
    parts = {}
    with torch.no_grad():
        for j, p_ in enumerate(PARTS):
            z = lat_t[..., j * 512 : (j + 1) * 512].clone()
            parts[p_] = rvqs[p_].latent2origin(z)[0].numpy()[0]
    np.savez(out / "jax_gen_swap.npz", **parts)
    (out / "jax_report_swap.json").write_text(json.dumps(
        {"last_loss": float(np.mean(losses[-10:]))}, indent=1))
    print("[jaxswap] done; loss", np.mean(losses[-10:]))


def stage_samplerswap(args):
    """Sampler-vs-training bisect for the L1Div/BeatAlign deficit.

    The jaxswap arm showed the deficit does NOT follow the latent space
    (our MDM on torch's latents still under-shoots diversity). This arm
    isolates the other two suspects: convert the TORCH-TRAINED MDM into our
    framework exactly (convert_mdm, oracle-tested; BN folded) and sample it
    with OUR windowed DDIM-50 sampler, decoding through the torch RVQs.

    - matches torch's arm  -> our sampler is exonerated; the gap is in our
      TRAINING loop (optimizer/batch order/t-sampling dynamics);
    - shows the deficit    -> our windowed sampler itself damps diversity.
    """
    import jax
    import jax.numpy as jnp

    from syntalker_tpu import generation as G
    from syntalker_tpu.convert import convert_mdm
    from syntalker_tpu.diffusion.schedule import make_diffusion
    from syntalker_tpu.models.denoiser import MDM as JaxMDM, MDMConfig

    torch = _ref_setup()
    out = _out(args)
    data = np.load(out / "windows.npz")
    sd_off = getattr(args, "seed", 0)
    scale = json.loads((out / "torch_report.json").read_text())["latent_scale"]

    sd = torch.load(out / "torch_mdm.pt", map_location="cpu")
    # jax arrays, not numpy: a numpy word_embedding table indexed by a
    # traced id array inside the sampler raises TracerArrayConversionError
    variables = jax.tree.map(jnp.asarray, convert_mdm(sd))
    mcfg = MDMConfig(vocab_size=VOCAB, audio_norm="none")
    module = JaxMDM(mcfg)

    import types as _types

    from models.vq.model import RVQVAE

    qargs = _types.SimpleNamespace(
        num_quantizers=NUM_Q, shared_codebook=False,
        quantize_dropout_prob=0.2, mu=0.99,
    )
    rvqs = {}
    for part in PARTS:
        w = data[f"rvq_{part}"]
        net = RVQVAE(qargs, input_width=w.shape[-1], activation="relu",
                     norm=None, **RVQ_KW)
        net.load_state_dict(torch.load(out / f"torch_rvq_{part}.pt",
                                       map_location="cpu"))
        net.eval()
        rvqs[part] = net

    n = int(data["n_frames"])
    plan = G.plan_windows(n)
    aw = jnp.asarray(G.window_audio(data["audio"][None], plan))
    ww = jnp.zeros((plan.num_windows, 1, 128), jnp.int32)
    with torch.no_grad():
        first_win = {p_: torch.from_numpy(
            _full_feature(data, p_)[None, :128]).float() for p_ in PARTS}
        seed_lat = torch.cat(
            [rvqs[p_].map2latent(first_win[p_]) for p_ in PARTS], dim=2
        ).numpy() / scale
    ddim = make_diffusion(steps=1000, timestep_respacing="ddim50")
    latents = G.sample_windows(
        module, variables, ddim, plan, aw, ww,
        jnp.asarray(seed_lat[:, : plan.pre_frames]),
        jax.random.PRNGKey(3 + sd_off), sampler="ddim",
    )
    lat_t = torch.from_numpy(np.asarray(latents)).float() * scale
    parts = {}
    with torch.no_grad():
        for j, p_ in enumerate(PARTS):
            z = lat_t[..., j * 512 : (j + 1) * 512].clone()
            parts[p_] = rvqs[p_].latent2origin(z)[0].numpy()[0]
    np.savez(out / "jax_gen_samplerswap.npz", **parts)
    print("[samplerswap] done")


# --------------------------------------------------------------------------
# stage: metrics (shared converted oracle)
# --------------------------------------------------------------------------

def stage_metrics(args):
    import jax
    import jax.numpy as jnp

    from syntalker_tpu import generation as G
    from syntalker_tpu.convert import convert_eval_vae
    from syntalker_tpu.data.stats import load_pose_stats
    from syntalker_tpu.eval.metrics import BeatAligner, L1Div, frechet_distance
    from syntalker_tpu.models.eval_vae import VAESKConv
    from syntalker_tpu.ops.smplx import forward_joints, synthetic_smplx_model

    torch = _ref_setup()
    out = _out(args)
    data = np.load(out / "windows.npz")
    stats = load_pose_stats(MEAN_STD)

    sd = torch.load(out / "torch_eval_vae.pt", map_location="cpu")
    vae = VAESKConv()
    vae_vars = convert_eval_vae(sd)

    def fgd_embed(rot6d_330: np.ndarray) -> np.ndarray:
        x = jnp.asarray(rot6d_330[None])
        nn = x.shape[1] - x.shape[1] % 32
        z = vae.apply(vae_vars, x[:, :nn], method="map2latent")
        return np.asarray(z.reshape(-1, z.shape[-1]))

    smplx_model = synthetic_smplx_model()
    # dataset mean-velocity stat from the GT clip with the SAME synthetic
    # skeleton both stacks' joints use (data/stats.py, beat_sep_lower.py
    # :117-197 equivalent) — shared BeatAlign normalization
    from syntalker_tpu.data.stats import compute_mean_velocity_from_clips

    mv = compute_mean_velocity_from_clips(
        [{"poses": data["poses"], "betas": data["betas"],
          "trans": data["trans"], "facial": data["facial"]}],
        smplx_model,
    )
    aligner = BeatAligner(mean_velocity=mv)

    def stack_metrics(parts_npz, gt_rot6d, audio):
        parts = {p: jnp.asarray(parts_npz[p][None]) for p in PARTS}
        dec = G.decode_parts(parts, stats=stats, use_trans=True)
        n = dec["rot6d"].shape[1]
        rec_rot6d = np.asarray(dec["rot6d"])[0]
        gt = gt_rot6d[:n]
        aa = np.asarray(dec["axis_angle"])[0]
        joints = np.asarray(
            forward_joints(
                smplx_model, jnp.asarray(aa),
                jnp.asarray(np.tile(data["betas"][None], (n, 1))),
            )
        ).reshape(n, -1)
        l1 = L1Div(); l1.update(joints.copy())
        onset = audio[:, 1]
        t_on = np.nonzero(onset)[0] / 16000.0
        mask = 60
        t_on = t_on[(t_on >= mask / 30.0) & (t_on <= (n - mask) / 30.0)] - mask / 30.0
        beats = aligner.motion_beats(joints, mask, n - mask)
        bc = aligner.score(t_on, beats)
        return {
            "fgd": float(frechet_distance(fgd_embed(rec_rot6d), fgd_embed(gt))),
            "l1div": float(l1.result()),
            "beat_align": float(bc),
            "rot6d_mse_vs_gt": float(np.mean((rec_rot6d - gt) ** 2)),
            "frames": int(n),
        }

    gt_rot6d = data["full_rot6d"]
    audio = data["audio"]
    sampler = getattr(args, "sampler", "ddim")
    sfx = "" if sampler == "ddim" else f"_{sampler}"
    res = {
        "sampler": sampler,
        "reference_torch": stack_metrics(
            np.load(out / f"torch_gen{sfx}.npz"), gt_rot6d, audio),
        "syntalker_tpu": stack_metrics(
            np.load(out / f"jax_gen{sfx}.npz"), gt_rot6d, audio),
    }
    if (out / "jax_gen_swap.npz").exists() and sampler == "ddim":
        # latent-swap diagnosis arm: our MDM on torch latents, torch decode
        res["syntalker_mdm_on_torch_latents"] = stack_metrics(
            np.load(out / "jax_gen_swap.npz"), gt_rot6d, audio)
    if (out / "jax_gen_samplerswap.npz").exists() and sampler == "ddim":
        # sampler bisect: the TORCH-trained MDM (converted) via OUR sampler
        res["torch_mdm_via_our_sampler"] = stack_metrics(
            np.load(out / "jax_gen_samplerswap.npz"), gt_rot6d, audio)
    # GT anchor for the diversity/alignment scales (FGD's anchor is the
    # split-floor below)
    n = res["syntalker_tpu"]["frames"]
    gt_joints = np.asarray(
        forward_joints(
            smplx_model, jnp.asarray(data["poses"][:n]),
            jnp.asarray(np.tile(data["betas"][None], (n, 1))),
        )
    ).reshape(n, -1)
    gt_l1 = L1Div(); gt_l1.update(gt_joints.copy())
    onset = audio[:, 1]
    t_on = np.nonzero(onset)[0] / 16000.0
    t_on = t_on[(t_on >= 2.0) & (t_on <= (n - 60) / 30.0)] - 2.0
    gt_beats = aligner.motion_beats(gt_joints, 60, n - 60)
    res["ground_truth"] = {
        "l1div": float(gt_l1.result()),
        "beat_align": float(aligner.score(t_on, gt_beats)),
        "frames": int(n),
    }
    # GT-vs-GT sanity floor for the shared oracle
    half = gt_rot6d.shape[0] // 2
    res["gt_split_floor_fgd"] = float(
        frechet_distance(fgd_embed(gt_rot6d[:half]), fgd_embed(gt_rot6d[half:]))
    )
    for k in ("torch_report", "jax_report"):
        f = out / f"{k}.json"
        if f.exists():
            res[k] = json.loads(f.read_text())
    (out / f"report{sfx}.json").write_text(json.dumps(res, indent=1))
    print(json.dumps(res, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="./outputs/parity")
    ap.add_argument("--stage",
                    choices=["data", "torch", "jax", "jaxswap", "samplerswap",
                             "metrics", "all"],
                    default="all")
    ap.add_argument("--diff-steps", type=int, default=DIFF_STEPS)
    ap.add_argument("--seed", type=int, default=0,
                    help="offsets every train/sample RNG in both stacks "
                         "(multi-seed CI runs, VERDICT r2 #1)")
    ap.add_argument("--sampler", choices=["ddim", "ddpm"], default="ddim",
                    help="generation protocol: ddim=demo ddim50, ddpm=the "
                         "reference's shipped eval (p_sample_loop, 1000 NFE; "
                         "diffusion_rvqvae_trainer.py:361)")
    ap.add_argument("--audio-norm", choices=["group", "batch", "none"],
                    default="group",
                    help="WavEncoder normalization for the jax arm; 'batch' "
                         "is the reference-exact BatchNorm path (the torch "
                         "arm always uses BN) - the L1Div/BeatAlign bisect")
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32",
                    help="jax-arm MDM compute dtype (blocks + WavEncoder "
                         "convs; params and norm statistics stay f32). "
                         "'bf16' is the fast-training configuration "
                         "(BASELINE.md: +41%% step throughput) — this arm "
                         "validates its sample quality (VERDICT r3 #2)")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse saved torch/jax checkpoints in --out and only "
                         "re-generate + re-score (e.g. a DDPM arm over the "
                         "DDIM run's models)")
    args = ap.parse_args()
    stages = {"data": stage_data, "torch": stage_torch, "jax": stage_jax,
              "jaxswap": stage_jaxswap, "samplerswap": stage_samplerswap,
              "metrics": stage_metrics}
    if args.stage == "all":
        for s in ("data", "torch", "jax", "metrics"):
            stages[s](args)
    else:
        stages[args.stage](args)


if __name__ == "__main__":
    main()
