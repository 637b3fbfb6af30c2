"""Batched motion-generation service.

Production serving layer over the generation pipeline: requests (audio +
words + optional prompts) are queued, grouped into fixed batch shapes, and
executed together — one compiled program per (batch, windows) bucket. At
batch 256 one v5e chip sustains ~4,800 motion-seconds/second (see
BASELINE.md), ~20× the single-request rate, because the per-NFE launch
overhead amortizes across the batch.

The reference has no serving story (its demo handles one request at a time
through Gradio, demo.py:700-761); this is new surface enabled by the
batch-parallel sampler design.

Prompted requests (per-part text-prompt CFG + MotionCLIP style — the
paper's headline control, cfg_sampler.py:57-117) are served too: the queue
is bucketed by prompt *configuration* (which parts are prompted, guidance
scales, style presence) and each bucket runs the batched-branch CFG sampler
(`generation.sample_windows`) as one device dispatch, with the per-request
prompt/style vectors riding as jit arguments. Unprompted requests keep the
lean/fused fast path.
"""

from __future__ import annotations

import dataclasses
import logging
import threading
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from syntalker_tpu import generation as G
from syntalker_tpu.data import audio as A
from syntalker_tpu.data import joints as J

log = logging.getLogger("syntalker")


@dataclasses.dataclass
class MotionRequest:
    audio: np.ndarray  # (S,) 16 kHz waveform
    words: Optional[np.ndarray] = None  # (F,) frame word ids
    request_id: str = ""
    # the paper's control surface (reference diffusion/cfg_sampler.py:57-117
    # x test_h3d.py:196-246): per-body-part text-prompt embeddings, guidance
    # scales, MotionCLIP style. Prompt VECTORS may differ per request; the
    # service buckets requests by prompt *configuration* (which parts are
    # prompted + the scales + style presence) so each bucket reuses one
    # compiled executable.
    prompts: Optional[Dict[str, np.ndarray]] = None  # part -> (P,)
    guidance: Optional[dict] = None  # audio_scale / prompt_scale
    style: Optional[np.ndarray] = None  # (style_dim,)


@dataclasses.dataclass
class MotionResult:
    request_id: str
    axis_angle: np.ndarray  # (T, 165)
    trans: np.ndarray  # (T, 3)
    latency_s: float


class MotionGenerationService:
    """Fixed-bucket batching server.

    Requests are padded/truncated to `max_seconds` so every batch reuses one
    compiled executable. `flush()` runs the queued requests; a background
    thread with `max_wait_s` drives it when `start()` is used.
    """

    def __init__(
        self,
        *,
        mdm,
        mdm_params,
        diffusion,
        rvq_modules: dict,
        stats,
        max_batch: int = 16,
        max_seconds: float = 16.0,
        pose_length: int = 128,
        pre_frames: int = 4,
        latent_scale: float = 5.0,
        sr: int = 16000,
        fps: int = 30,
        max_wait_s: float = 0.05,
        use_fused: bool = False,
        fused_loop: bool = True,
        tile_samples: int = 32,
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        self.mdm = mdm
        self.mdm_params = mdm_params
        self.diffusion = diffusion
        self.rvq_modules = rvq_modules
        self.stats = stats
        self.max_batch = max_batch
        self.sr = sr
        self.fps = fps
        self.latent_scale = latent_scale
        n_frames = int(max_seconds * fps)
        self.plan = G.plan_windows(
            n_frames, pose_length=pose_length, pre_frames=pre_frames
        )
        self.samples = sr // fps * self.plan.n_frames
        self._queue: List[tuple] = []
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._rng = jax.random.PRNGKey(0)
        # one compiled executable per prompt configuration (which parts are
        # prompted, guidance scales, style presence) — see _bucket_key
        self._prompted_jits: Dict[tuple, callable] = {}
        # donate the window inputs: the audio-feature stack is the largest
        # HBM buffer in the serving path (W x B x S x 2 f32 ≈ 0.5 GB at
        # batch 64) and is consumed once by encode_cond — donation lets XLA
        # reuse it for sampler intermediates instead of holding both live.
        # the fused Pallas sampler dispatches its NFE loop from the host
        # (a scan-embedded pallas_call stalls the remote compiler), so the
        # outer generate cannot be one jitted program in that mode — only
        # the decode tail is jitted there.
        self.use_fused = use_fused
        self.tile_samples = tile_samples
        self.mesh = mesh
        if mesh is not None:
            # data-parallel serving: shard the request batch over the mesh's
            # 'data' axis. Per-sample independence of the windowed sampler
            # means GSPMD partitions every op on the batch dim with ZERO
            # collectives — throughput scales linearly with chips (the
            # per-chip operating point stays the BASELINE.md batch knee, so
            # size max_batch = knee x n_chips). The fused Pallas kernel
            # composes via shard_map over the data axis (each device runs
            # the same kernel on its batch shard — make_fused_ddim_window
            # mesh=...), so use_fused works under the mesh too (r4).
            if "data" not in mesh.shape:
                raise ValueError(f"mesh needs a 'data' axis, got {mesh.shape}")
            if max_batch % mesh.shape["data"]:
                raise ValueError(
                    f"max_batch {max_batch} not divisible by data axis "
                    f"{mesh.shape['data']}"
                )
            from jax.sharding import NamedSharding, PartitionSpec

            def ns(*spec):
                return NamedSharding(mesh, PartitionSpec(*spec))

            if use_fused:
                per_chip = max_batch // mesh.shape["data"]
                tile = max(
                    t for t in range(1, tile_samples + 1) if per_chip % t == 0
                )
                self._fused_sampler = G.make_fused_loop_sampler(
                    mdm, mdm_params, diffusion, self.plan,
                    tile_samples=tile, mesh=mesh,
                )
                self._jitted = self._generate_batch_fused_loop
                self._jitted_decode = jax.jit(
                    self._decode, out_shardings=(ns("data"), ns("data"))
                )
                return
            donate = (0, 2) if jax.default_backend() != "cpu" else ()
            self._jitted = jax.jit(
                self._generate_batch,
                # (W, B, S, 2) audio / (W, B, L) words / (B, pre, 1536) seed
                in_shardings=(ns(None, "data"), ns(None, "data"), ns("data"),
                              ns()),
                out_shardings=(ns("data"), ns("data")),
                donate_argnums=donate,
            )
            return
        if use_fused:
            tile = max(
                t for t in range(1, tile_samples + 1) if max_batch % t == 0
            )
            if fused_loop:
                # whole-NFE-loop kernel: ONE pallas_call per window (in/out
                # projections, RoPE and the DDIM update in-kernel — the
                # (B, T, 1536) state never round-trips HBM between steps).
                # Measured at the batch-256 knee: 0.478 ms/window, MFU 0.655
                # vs 0.56 for the per-step fused path (tile sweep in
                # BASELINE.md; tile 32 is the knee, 64 regresses on VMEM
                # pressure).
                self._fused_sampler = G.make_fused_loop_sampler(
                    mdm, mdm_params, diffusion, self.plan, tile_samples=tile
                )
                self._jitted = self._generate_batch_fused_loop
            else:
                from syntalker_tpu.ops.mdm_pallas import make_fused_denoise

                self._fused = make_fused_denoise(
                    mdm.cfg, mdm_params, tile_samples=tile
                )
                self._jitted = self._generate_batch_fused
            self._jitted_decode = jax.jit(self._decode)
        else:
            # (On the CPU backend donation is a no-op that only warns — skip.)
            donate = (0, 2) if jax.default_backend() != "cpu" else ()
            self._jitted = jax.jit(self._generate_batch, donate_argnums=donate)

    # ------------------------------------------------------------------

    def _decode(self, latents):
        dec = G.decode_latents(
            latents,
            rvq_modules=self.rvq_modules,
            stats=self.stats,
            latent_scale=self.latent_scale,
        )
        return dec["axis_angle"], dec["trans"]

    def _generate_batch(self, aw, ww, seed, key):
        # lean = sample_windows(ddim) with the conditioning projections
        # algebraically folded out of the NFE scan (parity-pinned); the
        # serving scope is DDIM/no-CFG, exactly lean's scope. Pure XLA, so
        # it shards transparently under the data-parallel mesh option.
        latents = G.sample_windows_lean(
            self.mdm, self.mdm_params, self.diffusion, self.plan,
            aw, ww, seed, key,
        )
        return self._decode(latents)

    def _generate_batch_fused(self, aw, ww, seed, key):
        latents = G.sample_windows_fused(
            self.mdm, self.mdm_params, self.diffusion, self.plan,
            aw, ww, seed, key, fused=self._fused,
        )
        return self._jitted_decode(latents)

    def _generate_batch_fused_loop(self, aw, ww, seed, key):
        latents = self._fused_sampler(aw, ww, seed, key)
        return self._jitted_decode(latents)

    # ------------------------------------------------------------------
    # prompted path (per-part CFG / style — the paper's control surface)

    @staticmethod
    def _bucket_key(req: MotionRequest):
        """None for the plain audio path (lean/fused sampler); otherwise the
        static configuration a compiled prompted program depends on."""
        if req.prompts is None and req.style is None:
            return None
        g = req.guidance or {}
        parts = tuple(sorted(
            k for k, v in (req.prompts or {}).items() if v is not None
        ))
        return (
            parts,
            float(g.get("audio_scale", 1.0)),
            float(g.get("prompt_scale", 4.0)),
            req.style is not None,
        )

    def _prompted_jit(self, key_cfg):
        """Build (once) the jitted prompted program for one bucket. Prompt
        and style values ride as jit ARGUMENTS (per-request data — and
        closure-captured arrays poison dispatch cost, CLAUDE.md r4)."""
        if key_cfg in self._prompted_jits:
            return self._prompted_jits[key_cfg]
        parts, audio_scale, prompt_scale, has_style = key_cfg
        if parts and not self.mdm.cfg.use_prompt:
            raise ValueError(
                "prompted requests need an MDM with use_prompt=True"
            )

        def gen(aw, ww, seed, key, prompts, style):
            latents = G.sample_windows(
                self.mdm, self.mdm_params, self.diffusion, self.plan,
                aw, ww, seed, key, sampler="ddim",
                prompts=prompts if parts else None,
                guidance={"audio_scale": audio_scale,
                          "prompt_scale": prompt_scale},
                style=style,
            )
            return self._decode(latents)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            def ns(*spec):
                return NamedSharding(self.mesh, PartitionSpec(*spec))

            jitted = jax.jit(
                gen,
                in_shardings=(
                    ns(None, "data"), ns(None, "data"), ns("data"), ns(),
                    {p: ns("data") for p in parts},
                    ns("data") if has_style else None,
                ),
                out_shardings=(ns("data"), ns("data")),
            )
        else:
            jitted = jax.jit(gen)
        self._prompted_jits[key_cfg] = jitted
        return jitted

    def _prepare(self, req: MotionRequest):
        y = np.zeros(self.samples, np.float32)
        n = min(len(req.audio), self.samples)
        y[:n] = req.audio[:n]
        feats = A.onset_amplitude_features(y, self.sr)
        words = np.zeros(self.plan.n_frames, np.int32)
        if req.words is not None:
            m = min(len(req.words), self.plan.n_frames)
            words[:m] = req.words[:m]
        return feats, words

    def submit(self, req: MotionRequest) -> "threading.Event":
        """Queue a request; returns an event set when its result is ready
        (read from `results[request_id]`)."""
        done = threading.Event()
        with self._lock:
            self._queue.append((req, done, time.perf_counter()))
        return done

    def flush(self) -> List[MotionResult]:
        """Run up to max_batch queued requests. Plain audio requests go as
        one device batch through the lean/fused sampler; prompted/styled
        requests are grouped by prompt configuration and each group runs as
        its own batch through the CFG sampler (one dispatch per distinct
        configuration present — prompt vectors within a group differ freely)."""
        with self._lock:
            batch = self._queue[: self.max_batch]
            self._queue = self._queue[self.max_batch :]
        if not batch:
            return []
        groups: Dict[Optional[tuple], list] = {}
        for item in batch:
            groups.setdefault(self._bucket_key(item[0]), []).append(item)
        out = []
        for key_cfg, items in groups.items():
            out.extend(self._run_group(key_cfg, items))
        return out

    def _run_group(self, key_cfg, batch) -> List[MotionResult]:
        b = len(batch)
        feats, words = zip(*(self._prepare(r) for r, _, _ in batch))
        audio = np.stack(feats)  # (b, S, 2)
        word = np.stack(words)
        # pad the device batch to the fixed bucket so one executable serves
        # every queue depth
        pad = self.max_batch - b
        if pad:
            audio = np.concatenate(
                [audio, np.zeros((pad,) + audio.shape[1:], audio.dtype)]
            )
            word = np.concatenate(
                [word, np.zeros((pad,) + word.shape[1:], word.dtype)]
            )

        aw = jnp.asarray(G.window_audio(audio, self.plan, sr=self.sr, fps=self.fps))
        ww = jnp.asarray(G.window_words(word, self.plan))
        seed = jnp.zeros((self.max_batch, self.plan.pre_frames, J.LATENT_DIM))
        self._rng, key = jax.random.split(self._rng)
        if key_cfg is None:
            aa, trans = jax.device_get(self._jitted(aw, ww, seed, key))
        else:
            parts, _, _, has_style = key_cfg
            prompts = {
                p: np.stack(
                    [np.asarray(r.prompts[p], np.float32) for r, _, _ in batch]
                    + [np.zeros_like(np.asarray(batch[0][0].prompts[p],
                                                np.float32))] * pad
                )
                for p in parts
            }
            style = None
            if has_style:
                style = np.stack(
                    [np.asarray(r.style, np.float32) for r, _, _ in batch]
                    + [np.zeros_like(np.asarray(batch[0][0].style,
                                                np.float32))] * pad
                )
            aa, trans = jax.device_get(
                self._prompted_jit(key_cfg)(aw, ww, seed, key, prompts, style)
            )

        out = []
        now = time.perf_counter()
        self.results: Dict[str, MotionResult] = getattr(self, "results", {})
        for i, (req, done, t0) in enumerate(batch):
            res = MotionResult(
                request_id=req.request_id,
                axis_angle=aa[i],
                trans=trans[i],
                latency_s=now - t0,
            )
            self.results[req.request_id] = res
            out.append(res)
            done.set()
        return out

    # ------------------------------------------------------------------

    def start(self, max_wait_s: float = 0.05):
        """Background batching loop: flush when the bucket fills or the
        oldest request has waited max_wait_s."""

        def loop():
            while not self._stop.is_set():
                with self._lock:
                    n = len(self._queue)
                    oldest = self._queue[0][2] if n else None
                if n >= self.max_batch or (
                    n and time.perf_counter() - oldest > max_wait_s
                ):
                    self.flush()
                else:
                    time.sleep(max_wait_s / 5)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)
