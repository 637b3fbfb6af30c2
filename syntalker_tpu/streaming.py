"""Streaming audio→motion generation: push audio chunks, receive motion.

A capability the reference does not have (its demo generates only whole
clips, demo.py:700-761), but one the windowed autoregressive design makes
natural: each 128-frame window depends on the past only through the
4-latent-frame seed, so motion can be emitted while audio is still
arriving. A live avatar session is:

    sess = StreamingMotionSession(mdm=..., mdm_params=..., diffusion=...,
                                  rvq_modules=..., stats=...)
    for chunk in microphone():            # arbitrary chunk sizes
        for seg in sess.push_audio(chunk):
            play(seg["axis_angle"], seg["trans"])
    tail = sess.finish()

Design notes (why the emission lags the audio):

- **Window cadence.** A window covers ``pose_length`` (128) frames of
  audio and yields ``round_l`` (112) fresh frames; window *w* can run only
  once audio through frame ``w*112 + 128`` has arrived.
- **Decoder lookahead.** The RVQ ConvDecoder is non-causal (dilated convs,
  SAME-style padding): a motion frame is influenced by latents up to ~23
  latent frames away, with the influence decaying fast (measured: ≤7e-3
  of output scale beyond 8, ≤5e-4 beyond 16, exactly 0 beyond 23 —
  tests/test_streaming.py pins the chosen margins). Emitted frames are
  therefore held back ``lookahead`` latent frames so their right context
  exists, and each chunk is decoded with ``lookback`` latent frames of
  history; both knobs trade latency for fidelity to offline decode.
- **Translation carry.** Offline decode integrates the lower-body
  translation velocity over the whole clip (generation.decode_parts); the
  session carries the running x/z integral across windows so streamed
  translation equals the offline cumsum up to float re-association.

The sampler math is exactly :func:`generation.sample_windows_lean` (DDIM
η=0) run one window at a time with the identical RNG split chain, so the
streamed latents match the offline batch sampler and the parity/quality
results carry over. Text-prompt body-part CFG and MotionCLIP style — the
paper's control surface (reference diffusion/cfg_sampler.py:57-117) —
stream too (round 4): pass ``prompts=/guidance=/style=`` and each window
runs the SAME batched-branch CFG program as
:func:`generation.sample_windows`, still one dispatch per window; the
streamed output is pinned against the offline prompted sampler in
tests/test_streaming.py.

**One program per window.** On a remote-attached chip every eager op and
every array fetch pays the relay round trip (~30 ms; CLAUDE.md), so the
session keeps ALL device state — the seed, the RNG key, a fixed
``lookback+lookahead`` latent tail ring, and the translation carry — as a
pytree threaded through exactly three fixed-shape jitted programs (first
window / steady window / flush). A steady window is one dispatch + one
audio upload + one segment download (~220 KB); the naive eager-buffer
version of this class measured ~1 s per window through the tunnel, this
one ~10× less.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from syntalker_tpu import generation as G
from syntalker_tpu.data import joints as J
from syntalker_tpu.diffusion.core import _rng_normal, _rng_split
from syntalker_tpu.models.denoiser import mdm_variables


@dataclasses.dataclass
class StreamStats:
    windows_run: int = 0
    frames_emitted: int = 0


def _value_fingerprint(*objs) -> str:
    """16-byte blake2b digest over the *contents* of nested array trees.

    AOT-serialized executables bake every closure-captured array (model
    weights, RVQ decoder params, prompt/style vectors, stats, scales) in as
    compiled constants — so the load-time compatibility check must compare
    values, not just shapes, or a session built from a different checkpoint
    would silently generate from the saver's stale weights."""
    import hashlib
    from collections.abc import Mapping

    h = hashlib.blake2b(digest_size=16)

    def upd(o):
        if o is None:
            h.update(b"\x00none")
        elif isinstance(o, Mapping):
            h.update(b"\x00map")
            for k in sorted(o):
                h.update(str(k).encode())
                upd(o[k])
        elif isinstance(o, (list, tuple)):
            h.update(b"\x00seq")
            for v in o:
                upd(v)
        elif dataclasses.is_dataclass(o) and not isinstance(o, type):
            h.update(b"\x00dc")
            for f in dataclasses.fields(o):
                h.update(f.name.encode())
                upd(getattr(o, f.name))
        elif hasattr(o, "shape") or isinstance(o, (float, int, bool, np.number)):
            arr = np.asarray(jax.device_get(o))
            h.update(str((arr.shape, str(arr.dtype))).encode())
            h.update(arr.tobytes())
        else:
            # registered pytrees (e.g. RVQState) flatten to array leaves;
            # anything left is config-like and repr-hashable
            leaves = jax.tree_util.tree_leaves(o)
            if leaves and leaves[0] is not o:
                h.update(b"\x00tree")
                upd(leaves)
            else:
                h.update(repr(o).encode())

    for o in objs:
        upd(o)
    return h.hexdigest()


class StreamingMotionSession:
    """Incremental windowed generation with bounded, documented latency.

    Algorithmic latency = one window (``pose_length`` frames of audio must
    arrive before the window runs) + ``lookahead * squeeze`` frames of
    decoder hold-back; at the defaults that is 128 + 32 frames ≈ 5.3 s of
    audio-to-motion lag, dominated by the window size the reference's
    training scheme fixes. Per-window compute is a few ms on one v5e chip
    (~3.7 s of audio per window — one chip sustains hundreds of concurrent
    sessions; see ``MotionGenerationService`` for the batched form).
    """

    def __init__(
        self,
        *,
        mdm,
        mdm_params,
        diffusion,
        rvq_modules: dict,
        stats,
        latent_scale: float = 5.0,
        sr: int = 16000,
        fps: int = 30,
        pose_length: int = 128,
        pre_frames: int = 4,
        squeeze: int = 4,
        lookback: int = 16,
        lookahead: int = 8,
        rng: Optional[jax.Array] = None,
        prompts: Optional[Dict[str, jax.Array]] = None,  # part -> (1, P)
        guidance: Optional[dict] = None,  # audio_scale / prompt_scale
        style: Optional[jax.Array] = None,  # (1, style_dim) MotionCLIP
    ):
        self.mdm, self.mdm_params = mdm, mdm_params
        self.diffusion = diffusion
        self.rvq_modules = rvq_modules
        self.stats = stats
        self.latent_scale = latent_scale
        self.sr, self.fps = sr, fps
        self.spf = sr // fps
        self.pose_length = pose_length
        self.pre_frames = pre_frames
        self.squeeze = squeeze
        self.lw = pose_length // squeeze
        self.round_l = pose_length - pre_frames * squeeze
        self.fresh_lat = self.lw - pre_frames
        self.lookback = lookback
        self.lookahead = lookahead
        if lookback + lookahead > self.lw:
            raise ValueError("lookback+lookahead must fit in one window")
        self.prompts = prompts
        self.guidance = guidance or {}
        self.style = style
        # lean fold only covers the plain audio path; prompts/style run the
        # general batched-branch program (still one dispatch per window)
        self._use_cfg = prompts is not None or style is not None

        self._audio = np.zeros((0, 2), np.float32)
        self._words = np.zeros((0,), np.int32)
        self._w = 0
        self._frame_start = 0
        # device-resident session state, threaded through the jitted steps
        self._state = {
            "seed": jnp.zeros((1, pre_frames, J.LATENT_DIM)),
            "tail": jnp.zeros((1, lookback + lookahead, J.LATENT_DIM)),
            "key": rng if rng is not None else jax.random.PRNGKey(0),
            "carry": jnp.zeros((3,), jnp.float32),  # x/z integral; y unused
        }
        self.stream_stats = StreamStats()

        self._first = jax.jit(self._first_impl)
        self._steady = jax.jit(self._steady_impl)
        self._flush = jax.jit(self._flush_impl)

    # ------------------------------------------------------------------
    # device programs

    def _sample_one_window(self, audio, word, seed, k_samp):
        """One window of the lean DDIM sampler: identical math and RNG
        consumption to one iteration of sample_windows_lean's window scan."""
        from syntalker_tpu.models.denoiser import apply_rope, rope_angles

        mdm, cfg = self.mdm, self.mdm.cfg
        d = cfg.latent_dim
        lw = self.lw
        variables = mdm_variables(self.mdm_params)
        p = variables["params"]

        tmap = jnp.asarray(self.diffusion.timestep_map)
        t_emb_all = mdm.apply(variables, tmap, method="embed_timesteps")
        w2 = p["input_process2"]["kernel"]
        w_x = p["input_process"]["kernel"] @ w2[d : 2 * d]
        bias_c = (
            p["input_process"]["bias"] @ w2[d : 2 * d]
            + p["input_process2"]["bias"]
        )
        w_out = p["output_process"]["kernel"]
        b_out = p["output_process"]["bias"]

        s_steps = self.diffusion.num_steps
        idx = np.arange(s_steps - 1, -1, -1)
        abar_prev = np.asarray(self.diffusion.alphas_cumprod_prev, np.float64)[idx]
        r = np.asarray(self.diffusion.sqrt_recip_alphas_cumprod, np.float64)[idx]
        rm1 = np.asarray(self.diffusion.sqrt_recipm1_alphas_cumprod, np.float64)[idx]
        s1m = np.sqrt(np.maximum(1.0 - abar_prev, 0.0))
        coef_a = jnp.asarray(s1m * r / rm1, jnp.float32)
        coef_b = jnp.asarray(np.sqrt(abar_prev) - s1m / rm1, jnp.float32)
        t_rows = (t_emb_all @ w2[:d])[::-1]

        hd = d // cfg.rope_heads
        angles = rope_angles(lw, hd)[:, None, :]

        cond = mdm.apply(variables, audio, word, seed, method="encode_cond")
        at_c = cond.at_feat[:, :lw] @ w2[2 * d :] + bias_c
        seed_row = cond.seed_emb @ w2[:d]
        k_samp, k0 = _rng_split(k_samp)
        x = _rng_normal(k0, (1, lw, J.LATENT_DIM))

        def step(x, it):
            h = x @ w_x + at_c + (seed_row + t_rows[it])[:, None, :]
            xh = h.reshape(1, lw, cfg.rope_heads, hd)
            h = apply_rope(xh, angles).reshape(1, lw, d)
            h = mdm.apply(variables, h, method="run_blocks")
            x0 = h @ w_out + b_out
            return coef_a[it] * x + coef_b[it] * x0, None

        x, _ = jax.lax.scan(step, x, jnp.arange(s_steps))
        return x

    def _sample_one_window_cfg(self, audio, word, seed, k_samp):
        """One window of the general prompted sampler: identical math and
        RNG consumption to one iteration of sample_windows' window scan
        (encode branches once per window, body-part CFG batched into one
        denoise forward per step — diffusion/cfg.py)."""
        from syntalker_tpu.diffusion.cfg import make_bodypart_cfg_model_fn
        from syntalker_tpu.diffusion.core import ddim_sample

        mdm = self.mdm
        variables = mdm_variables(self.mdm_params)
        tmap = jnp.asarray(self.diffusion.timestep_map)
        t_emb_all = mdm.apply(variables, tmap, method="embed_timesteps")

        def denoise_fn(x, t, cond):
            idx = jnp.searchsorted(tmap, t)
            return mdm.apply(
                variables, x, t, cond, method="denoise", t_emb=t_emb_all[idx]
            )

        def encode(**kw):
            return mdm.apply(
                variables, audio, word, seed, style=self.style,
                method="encode_cond", **kw,
            )

        if self.prompts is None:
            cond = encode()
            model_fn = lambda x, t: denoise_fn(x, t, cond)  # noqa: E731
        else:
            cond_audio = encode(uncond_prompt=True)
            uncond = encode(uncond_audio=True, uncond_prompt=True)
            part_conds = {
                name: (
                    None if self.prompts.get(name) is None
                    else encode(uncond_audio=True, prompt=self.prompts[name])
                )
                for name in J.LATENT_SLICES
            }
            model_fn = make_bodypart_cfg_model_fn(
                denoise_fn, cond_audio, uncond, part_conds,
                audio_scale=self.guidance.get("audio_scale", 1.0),
                prompt_scale=self.guidance.get("prompt_scale", 4.0),
            )
        return ddim_sample(
            self.diffusion, model_fn, (1, self.lw, J.LATENT_DIM), k_samp
        )

    def _decode(self, latents):
        return G.decode_latents(
            latents,
            rvq_modules=self.rvq_modules,
            stats=self.stats,
            latent_scale=self.latent_scale,
        )

    def _emit_from(self, dec, s_lat, e_lat, carry):
        """Slice decoded frames [s_lat*4, e_lat*4) out of a chunk decode and
        rebase the translation cumsum onto the global carry."""
        sq = self.squeeze
        s, e = s_lat * sq, e_lat * sq
        tr = dec["trans"][0]
        base = tr[s - 1] if s > 0 else jnp.zeros(3)  # s is static
        seg_tr = tr[s:e]
        adj = (carry - base) * jnp.asarray([1.0, 0.0, 1.0])  # y not integrated
        seg = {
            "rot6d": dec["rot6d"][0, s:e],
            "axis_angle": dec["axis_angle"][0, s:e],
            "trans": seg_tr + adj[None, :],
        }
        new_carry = carry + (tr[e - 1] - base) * jnp.asarray([1.0, 0.0, 1.0])
        return seg, new_carry

    def _sample_window(self, audio, word, seed, k_samp):
        if self._use_cfg:
            return self._sample_one_window_cfg(audio, word, seed, k_samp)
        return self._sample_one_window(audio, word, seed, k_samp)

    def _first_impl(self, audio, word, state):
        key, k_samp = _rng_split(state["key"])
        x = self._sample_window(audio, word, state["seed"], k_samp)
        emit = self.lw - self.lookahead
        dec = self._decode(x)
        seg, carry = self._emit_from(dec, 0, emit, state["carry"])
        new = {
            "seed": x[:, -self.pre_frames :, :],
            "tail": x[:, emit - self.lookback :, :],
            "key": key,
            "carry": carry,
        }
        return seg, new

    def _steady_impl(self, audio, word, state):
        key, k_samp = _rng_split(state["key"])
        x = self._sample_window(audio, word, state["seed"], k_samp)
        fresh = x[:, self.pre_frames :, :]  # 28 latents
        buf = jnp.concatenate([state["tail"], fresh], axis=1)
        # tail spans [E-lookback, E+lookahead); emit [E, E+fresh)
        dec = self._decode(buf)
        s = self.lookback
        e = s + self.fresh_lat
        seg, carry = self._emit_from(dec, s, e, state["carry"])
        new = {
            "seed": x[:, -self.pre_frames :, :],
            "tail": buf[:, self.fresh_lat :, :],
            "key": key,
            "carry": carry,
        }
        return seg, new

    def _flush_impl(self, state):
        dec = self._decode(state["tail"])
        s = self.lookback
        e = s + self.lookahead
        seg, carry = self._emit_from(dec, s, e, state["carry"])
        return seg, {**state, "carry": carry}

    # ------------------------------------------------------------------

    def push_audio(
        self, chunk: np.ndarray, words: Optional[np.ndarray] = None
    ) -> List[Dict[str, np.ndarray]]:
        """Append a 16 kHz feature chunk ((S, 2) onset+amplitude channels,
        see data.audio.onset_amplitude_features) and run every window whose
        audio is now complete. Returns the newly emitted motion segments."""
        chunk = np.asarray(chunk, np.float32)
        if chunk.ndim != 2 or chunk.shape[1] != 2:
            raise ValueError(f"expected (S, 2) feature chunk, got {chunk.shape}")
        self._audio = np.concatenate([self._audio, chunk])
        if words is not None:
            self._words = np.concatenate(
                [self._words, np.asarray(words, np.int32)]
            )
        out = []
        while self._window_ready():
            out.append(self._run_window())
        return out

    def _window_ready(self) -> bool:
        need = (self._w * self.round_l + self.pose_length) * self.spf
        return self._audio.shape[0] >= need

    def _window_inputs(self):
        start_f = self._w * self.round_l
        s0 = start_f * self.spf
        s1 = s0 + self.pose_length * self.spf
        a = self._audio[s0:s1]
        if a.shape[0] < self.pose_length * self.spf:
            a = np.pad(a, ((0, self.pose_length * self.spf - a.shape[0]), (0, 0)))
        w = self._words[start_f : start_f + self.pose_length]
        if w.shape[0] < self.pose_length:
            w = np.pad(w, (0, self.pose_length - w.shape[0]))
        return jnp.asarray(a[None]), jnp.asarray(w[None])

    def _run_window(self) -> Dict[str, np.ndarray]:
        audio, word = self._window_inputs()
        stepf = self._first if self._w == 0 else self._steady
        seg_dev, self._state = stepf(audio, word, self._state)
        seg = jax.device_get(seg_dev)  # ONE fetch per window
        seg["frame_start"] = self._frame_start
        self._frame_start += len(seg["axis_angle"])
        self._w += 1
        self.stream_stats.windows_run += 1
        self.stream_stats.frames_emitted += len(seg["axis_angle"])
        return seg

    # ------------------------------------------------------------------
    # cold-start mitigation: ahead-of-time compiled executables

    def _aot_signature(self) -> dict:
        """Everything the compiled programs depend on: the shape/branch
        config, plus a content fingerprint of every closure-captured value
        the executables baked in as constants (weights, stats, prompts,
        style, guidance scales, latent_scale)."""
        return {
            "weights_fp": _value_fingerprint(
                self.mdm_params,
                {n: t[1:] for n, t in sorted(self.rvq_modules.items())},
                self.stats,
                self.latent_scale,
                self.guidance,
                self.prompts,
                self.style,
            ),
            "pose_length": self.pose_length,
            "pre_frames": self.pre_frames,
            "squeeze": self.squeeze,
            "lookback": self.lookback,
            "lookahead": self.lookahead,
            "sr": self.sr,
            "fps": self.fps,
            "use_cfg": self._use_cfg,
            "prompt_parts": sorted(self.prompts) if self.prompts else [],
            "num_steps": int(self.diffusion.num_steps),
            "latent_dim": int(self.mdm.cfg.latent_dim),
            "backend": jax.default_backend(),
            "n_devices": jax.device_count(),
        }

    def _aot_args(self, name: str):
        a = jnp.zeros((1, self.pose_length * self.spf, 2), jnp.float32)
        w = jnp.zeros((1, self.pose_length), jnp.int32)
        return (self._state,) if name == "flush" else (a, w, self._state)

    def save_compiled(self, directory) -> None:
        """Compile the three window programs and serialize the PJRT
        executables to ``directory``. A later process on the same device
        topology can :meth:`load_compiled` them and skip tracing AND XLA
        compilation entirely — measured on the tunneled v5e, this cuts
        time-to-first-window from minutes (remote compile) to seconds
        (scripts/probe_cold_start.py; BASELINE.md cold-start row)."""
        import pickle
        from pathlib import Path

        from jax.experimental import serialize_executable as se

        d = Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        for name in ("first", "steady", "flush"):
            fn = getattr(self, f"_{name}")
            compiled = fn.lower(*self._aot_args(name)).compile()
            payload, in_tree, out_tree = se.serialize(compiled)
            (d / f"{name}.bin").write_bytes(payload)
            (d / f"{name}.trees").write_bytes(pickle.dumps((in_tree, out_tree)))
        (d / "signature.json").write_text(
            __import__("json").dumps(self._aot_signature())
        )

    def load_compiled(self, directory) -> None:
        """Replace the jitted window programs with executables serialized by
        :meth:`save_compiled`. Raises if the session configuration, the
        captured weight/prompt/stats values (content-fingerprinted), or the
        device topology differ from the session that saved them.

        Security note: the ``.trees`` sidecar files are unpickled —
        unpickling executes arbitrary code, so AOT directories must come
        from a trusted source (treat them like the checkpoint files they
        accompany)."""
        import json as _json
        import pickle
        from pathlib import Path

        from jax.experimental import serialize_executable as se

        d = Path(directory)
        saved = _json.loads((d / "signature.json").read_text())
        mine = self._aot_signature()
        if saved != mine:
            diff = {k: (saved.get(k), mine.get(k))
                    for k in set(saved) | set(mine)
                    if saved.get(k) != mine.get(k)}
            raise ValueError(f"AOT executables don't match this session: {diff}")
        for name in ("first", "steady", "flush"):
            payload = (d / f"{name}.bin").read_bytes()
            in_tree, out_tree = pickle.loads((d / f"{name}.trees").read_bytes())
            # the session programs are single-device (no mesh); without an
            # explicit assignment deserialize_and_load spreads the executable
            # over every addressable device and execution fails on hosts
            # exposing more than one (e.g. the 8-virtual-CPU test backend)
            setattr(self, f"_{name}",
                    se.deserialize_and_load(payload, in_tree, out_tree,
                                            execution_devices=jax.devices()[:1]))

    def finish(self, *, pad_final: bool = False) -> List[Dict[str, np.ndarray]]:
        """Flush the lookahead hold-back. By default trailing audio short
        of a full window is dropped — exactly the offline plan's
        ``(n - 16) // 112`` window count, so a streamed clip matches
        :func:`generation.sample_windows_lean` + decode of the same audio.
        ``pad_final=True`` instead zero-pads one extra window to cover the
        tail (emits frames past the real audio; the caller trims)."""
        out = []
        if self._w == 0:
            return out
        remaining_f = self._audio.shape[0] // self.spf - self._w * self.round_l
        if pad_final and remaining_f > self.pre_frames * self.squeeze:
            out.append(self._run_window())
        seg_dev, self._state = self._flush(self._state)
        seg = jax.device_get(seg_dev)
        seg["frame_start"] = self._frame_start
        self._frame_start += len(seg["axis_angle"])
        self.stream_stats.frames_emitted += len(seg["axis_angle"])
        out.append(seg)
        return out
