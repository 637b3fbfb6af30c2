"""TMR text/motion encoders: the shared align space for prompt control.

Capability parity with ``models/temos/``:

- :class:`ActorAgnosticEncoder` — ACTOR-style transformer encoder with
  learned distribution (mu, logvar) tokens prepended to the sequence
  (models/temos/motionencoder/actor.py:15-90; nfeats=623, 4 layers for the
  motion side),
- :class:`DistilbertTextEncoder` — frozen DistilBERT backbone + the same
  transformer head (models/temos/textencoder/distillbert*.py; the backbone
  weights come from a local HF snapshot — they are a training artifact,
  like every other checkpoint in this stack),
- :func:`embed_prompts` — per-body-part prompt embedding used by the
  body-part CFG sampler (h3d_diffusion_new_trainer.py:489-511),
- :func:`make_tmr_train_step` — InfoNCE contrastive + KL alignment
  training (the reference delegates this to the external OpenTMA repo,
  README.md:195-221; here it is a first-class trainer).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

log = logging.getLogger("syntalker")


@dataclasses.dataclass(frozen=True)
class TMRConfig:
    latent_dim: int = 256
    ff_size: int = 1024
    num_layers: int = 4
    num_heads: int = 4
    motion_feats: int = 623
    text_feats: int = 768  # DistilBERT hidden size


class _Block(nn.Module):
    dim: int
    heads: int
    ff: int

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(num_heads=self.heads)(h, h, mask=mask)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.ff)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim)(h)
        return x + h


class ActorAgnosticEncoder(nn.Module):
    """Sequence -> Normal(mu, sigma) via learned distribution tokens."""

    cfg: TMRConfig
    input_dim: int

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None):
        """x: (B, T, input_dim); mask: (B, T) validity. Returns (mu, logvar)
        each (B, latent_dim)."""
        c = self.cfg
        b, t, _ = x.shape
        h = nn.Dense(c.latent_dim, name="skel_embedding")(x)

        dist_tokens = self.param(
            "dist_tokens", nn.initializers.normal(0.02), (2, c.latent_dim)
        )
        h = jnp.concatenate([jnp.tile(dist_tokens[None], (b, 1, 1)), h], axis=1)

        # sinusoidal positions
        pos = np.zeros((t + 2, c.latent_dim), np.float32)
        p = np.arange(t + 2)[:, None]
        div = np.exp(np.arange(0, c.latent_dim, 2) * (-np.log(10000.0) / c.latent_dim))
        pos[:, 0::2] = np.sin(p * div)
        pos[:, 1::2] = np.cos(p * div)
        h = h + jnp.asarray(pos)[None]

        attn_mask = None
        if mask is not None:
            full = jnp.concatenate([jnp.ones((b, 2), mask.dtype), mask], axis=1)
            attn_mask = full[:, None, None, :].astype(bool)
        for i in range(c.num_layers):
            h = _Block(c.latent_dim, c.num_heads, c.ff_size, name=f"block_{i}")(
                h, attn_mask
            )
        mu, logvar = h[:, 0], h[:, 1]
        return mu, logvar


class DistilbertTextEncoder(nn.Module):
    """Token-embedding sequence -> align-space distribution. The DistilBERT
    backbone runs outside this module (frozen; see TextPipeline)."""

    cfg: TMRConfig

    @nn.compact
    def __call__(self, hidden: jax.Array, mask: Optional[jax.Array] = None):
        proj = nn.Dense(self.cfg.latent_dim, name="projection")(hidden)
        return ActorAgnosticEncoder(self.cfg, self.cfg.latent_dim, name="head")(
            proj, mask
        )


class TextPipeline:
    """Prompt strings -> align-space embeddings.

    Uses a local HF DistilBERT snapshot (tokenizer + flax weights) when
    `backbone_path` is given; otherwise falls back to a deterministic
    hash-token embedding so the pipeline stays runnable end-to-end in
    weightless environments (documented degradation: untrained text space).
    """

    def __init__(self, cfg: TMRConfig = TMRConfig(), backbone_path: str = "",
                 head_params=None, rng: Optional[jax.Array] = None):
        self.cfg = cfg
        self.head = DistilbertTextEncoder(cfg)
        self.backbone = None
        self.tokenizer = None
        if backbone_path:
            from transformers import AutoTokenizer, FlaxDistilBertModel

            self.tokenizer = AutoTokenizer.from_pretrained(
                backbone_path, local_files_only=True
            )
            self.backbone = FlaxDistilBertModel.from_pretrained(
                backbone_path, local_files_only=True
            )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if head_params is None:
            head_params = self.head.init(
                rng, jnp.zeros((1, 8, cfg.text_feats)), jnp.ones((1, 8))
            )["params"]
        self.head_params = head_params

    def _hash_hidden(self, text: str, max_len: int = 16) -> np.ndarray:
        """Deterministic pseudo-embedding per word (weightless fallback);
        the per-word scheme is data.captions.hash_word_vector, so captioner
        word vectors and TMR text embeddings share one hash space."""
        from syntalker_tpu.data.captions import hash_word_vector

        words = text.lower().split()[:max_len] or ["<empty>"]
        out = np.zeros((len(words), self.cfg.text_feats), np.float32)
        for i, w in enumerate(words):
            out[i] = hash_word_vector(w, self.cfg.text_feats)
        return out

    def hidden_states(self, texts: list[str], max_len: int = 16):
        """(N,) strings -> padded (N, L, text_feats) hidden states + (N, L)
        mask, through the DistilBERT backbone when configured, else the
        hash fallback. L is fixed at ``max_len`` so jitted consumers keep
        static shapes across batches."""
        if self.backbone is not None:
            toks = self.tokenizer(
                texts, return_tensors="np", padding="max_length",
                truncation=True, max_length=max_len,
            )
            return (
                np.asarray(self.backbone(**toks).last_hidden_state),
                np.asarray(toks["attention_mask"], np.float32),
            )
        hidden = np.zeros((len(texts), max_len, self.cfg.text_feats), np.float32)
        mask = np.zeros((len(texts), max_len), np.float32)
        for i, t in enumerate(texts):
            s = self._hash_hidden(t, max_len)
            hidden[i, : s.shape[0]] = s
            mask[i, : s.shape[0]] = 1
        return hidden, mask

    def embed(self, texts: list[str]) -> jax.Array:
        """(N,) strings -> (N, latent_dim) align-space means (`.loc` usage,
        h3d_diffusion_new_trainer.py:489-511)."""
        if self.backbone is not None:
            toks = self.tokenizer(
                texts, return_tensors="np", padding=True, truncation=True
            )
            hidden = self.backbone(**toks).last_hidden_state
            mask = toks["attention_mask"]
        else:
            seqs = [self._hash_hidden(t) for t in texts]
            tmax = max(s.shape[0] for s in seqs)
            hidden = np.zeros((len(seqs), tmax, self.cfg.text_feats), np.float32)
            mask = np.zeros((len(seqs), tmax), np.float32)
            for i, s in enumerate(seqs):
                hidden[i, : s.shape[0]] = s
                mask[i, : s.shape[0]] = 1
        mu, _ = self.head.apply(
            {"params": self.head_params}, jnp.asarray(hidden), jnp.asarray(mask)
        )
        return mu


def embed_prompts(cfg, prompts: Dict[str, Optional[str]], pipeline: Optional[TextPipeline] = None):
    """Per-body-part prompt dict -> per-part (1, latent) embeddings (None
    entries stay None so the CFG sampler leaves those parts audio-driven)."""
    pipeline = pipeline or TextPipeline()
    out: Dict[str, Optional[jax.Array]] = {}
    for part, text in prompts.items():
        out[part] = None if not text else pipeline.embed([text])
    return out


# ---------------------------------------------------------------------------
# contrastive alignment training (OpenTMA-equivalent)
# ---------------------------------------------------------------------------


def info_nce(text_emb: jax.Array, motion_emb: jax.Array, temperature: float = 0.07):
    """Symmetric InfoNCE over a batch of (text, motion) pairs."""
    t = text_emb / jnp.linalg.norm(text_emb, axis=-1, keepdims=True)
    m = motion_emb / jnp.linalg.norm(motion_emb, axis=-1, keepdims=True)
    logits = t @ m.T / temperature
    labels = jnp.arange(t.shape[0])
    loss_t = -jnp.mean(jax.nn.log_softmax(logits, axis=1)[labels, labels])
    loss_m = -jnp.mean(jax.nn.log_softmax(logits, axis=0)[labels, labels])
    return 0.5 * (loss_t + loss_m)


def make_tmr_train_step(text_head: DistilbertTextEncoder, motion_enc: ActorAgnosticEncoder, optimizer):
    """Joint contrastive step over (text hidden states, motion features)."""

    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            t_mu, t_lv = text_head.apply(
                {"params": p["text"]}, batch["text_hidden"], batch["text_mask"]
            )
            m_mu, m_lv = motion_enc.apply(
                {"params": p["motion"]}, batch["motion"], batch.get("motion_mask")
            )
            nce = info_nce(t_mu, m_mu)
            kl = 0.5 * jnp.mean(
                jnp.exp(t_lv) + t_mu**2 - 1 - t_lv
            ) + 0.5 * jnp.mean(jnp.exp(m_lv) + m_mu**2 - 1 - m_lv)
            return nce + 1e-5 * kl, {"nce": nce, "kl": kl}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        import optax

        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["loss"] = loss
        return params, opt_state, metrics

    return step


def load_tmr_artifact(path, *, window: int = 96):
    """Load a committed TMR artifact (scripts/train_t2m_oracle.py:
    ``tmr.npz`` + ``tmr.json`` sidecar) into (cfg, {'text','motion'} params).

    The artifact is the self-hosted stand-in for the reference's pretrained
    TMR checkpoint (models/temos/, h3d_diffusion_new_trainer.py:351-392):
    its motion side feeds the training-time prompt channel, its text side
    embeds eval prompts — both must come from the SAME artifact or the
    align space is meaningless."""
    import json as _json
    from pathlib import Path as _P

    from syntalker_tpu.eval.t2m import load_oracle_params

    p = _P(path)
    meta = _json.loads(p.with_suffix(".json").read_text())
    cfg = TMRConfig(**meta.get("config", {}))
    text = DistilbertTextEncoder(cfg)
    motion = ActorAgnosticEncoder(cfg, input_dim=cfg.motion_feats)
    rng = jax.random.PRNGKey(0)
    template = {
        "text": text.init(rng, jnp.zeros((1, 12, cfg.text_feats)),
                          jnp.ones((1, 12)))["params"],
        "motion": motion.init(rng, jnp.zeros((1, window, cfg.motion_feats)))[
            "params"],
    }
    return cfg, load_oracle_params(p, template)


def load_text_pipeline(path, *, backbone_path: str = "") -> "TextPipeline":
    """TextPipeline with the trained head from a TMR artifact."""
    cfg, params = load_tmr_artifact(path)
    return TextPipeline(cfg, backbone_path=backbone_path,
                        head_params=params["text"])
