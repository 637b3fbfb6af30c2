"""Train state containers + checkpoint I/O (orbax).

Improves on the reference's checkpointing (utils/other_tools.py:757-791):
the torch trainer only ever persisted model weights — optimizer state was
dropped, so "resume" silently re-finetuned (SURVEY.md §5). Here the full
train state (params, optimizer state, quantizer EMA codebooks, PRNG key,
step counter) round-trips through orbax.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array
    # quantizer EMA codebooks (RVQ training) or None (diffusion training)
    quantizer_state: Any = None
    # non-param module collections (e.g. WavEncoder batch_stats when
    # audio_norm='batch'); None for stateless configs
    model_state: Any = None

    def next_rngs(self, n: int = 2):
        keys = jax.random.split(self.rng, n + 1)
        return keys[0], keys[1:]

    def model_variables(self) -> dict:
        """Full variables dict for inference applies: params plus any extra
        collections (batch_stats) carried in ``model_state``."""
        return {"params": self.params, **(self.model_state or {})}


def create_train_state(
    params: Any,
    optimizer: optax.GradientTransformation,
    rng: jax.Array,
    quantizer_state: Any = None,
    model_state: Any = None,
) -> TrainState:
    # accept a full variables dict (params + extra collections) transparently
    if isinstance(params, dict) and "params" in params:
        extra = {k: v for k, v in params.items() if k != "params"}
        model_state = model_state if model_state is not None else (extra or None)
        params = params["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        rng=rng,
        quantizer_state=quantizer_state,
        model_state=model_state,
    )


# ---------------------------------------------------------------------------
# checkpoint I/O
# ---------------------------------------------------------------------------


def save_checkpoint(ckpt_dir: str | Path, state: TrainState, step: Optional[int] = None):
    import orbax.checkpoint as ocp

    path = Path(ckpt_dir).absolute()
    step = int(state.step) if step is None else step
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / f"step_{step}", jax.device_get(state), force=True)
    return path / f"step_{step}"


def load_checkpoint(ckpt_path: str | Path, target: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(ckpt_path).absolute(), target)


def load_checkpoint_raw(ckpt_path: str | Path) -> dict:
    """Restore without a target pytree (nested dicts of device arrays).

    For consumers that need only a subset of the saved train state — e.g.
    loading frozen RVQ params+codebooks into an inference stack without
    reconstructing the optimizer tree. Leaves are converted to jax arrays:
    orbax restores host numpy, and a numpy param table indexed by a traced
    array inside jit (e.g. ``word_embedding[word]``) raises
    TracerArrayConversionError."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        raw = ckptr.restore(Path(ckpt_path).absolute())
    import jax.numpy as jnp
    import numpy as np

    return jax.tree.map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, raw
    )


def load_model_variables(ckpt_path: str | Path) -> dict:
    """Restore a checkpoint as a full flax variables dict for inference.

    Returns ``{"params": ..., **model_state}`` so extra collections saved in
    the train state (e.g. WavEncoder ``batch_stats`` when
    ``audio_norm='batch'``) survive into eval/generation applies. Loading
    only ``["params"]`` would make ``use_running_average=True`` applies fail
    with a missing-collection error for BN-trained checkpoints."""
    raw = load_checkpoint_raw(ckpt_path)
    if "params" not in raw:
        # bare params tree (converted reference checkpoints)
        return {"params": raw}
    return {"params": raw["params"], **(raw.get("model_state") or {})}


def latest_checkpoint(ckpt_dir: str | Path) -> Optional[Path]:
    """Newest complete ``step_<N>`` checkpoint dir, or None.

    Skips names whose step doesn't parse as an int — in particular orbax's
    in-progress ``step_<N>.orbax-checkpoint-tmp-*`` dirs, which exist while a
    save is being written and must never be offered for resume (a poller that
    races a save would otherwise crash or restore a half-written state).
    """
    d = Path(ckpt_dir)
    if not d.exists():
        return None
    steps = []
    for p in d.glob("step_*"):
        if not p.is_dir():
            continue
        try:
            steps.append((int(p.name.split("_")[1]), p))
        except ValueError:
            continue  # in-flight orbax tmp dir or foreign name
    steps.sort()
    return steps[-1][1] if steps else None


# ---------------------------------------------------------------------------
# optimizers (optimizers/optim_factory.py + scheduler_factory.py equivalents)
# ---------------------------------------------------------------------------


def make_schedule(
    name: str,
    lr: float,
    *,
    total_steps: int = 100_000,
    warmup_steps: int = 0,
    decay_steps: int = 0,
    decay_rate: float = 0.1,
    min_lr: float = 1e-6,
):
    """Named LR schedules (optimizers/scheduler_factory.py:10: cosine /
    tanh / step / constant)."""
    if name == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            0.0 if warmup_steps else lr, lr, warmup_steps, total_steps, min_lr
        )
    elif name == "step":
        sched = optax.exponential_decay(
            lr, max(decay_steps, 1), decay_rate, staircase=True
        )
    elif name == "tanh":
        cos = optax.cosine_decay_schedule(lr, total_steps, alpha=min_lr / lr)
        sched = cos  # tanh ≈ cosine shape; kept as alias
    elif name == "constant":
        sched = optax.constant_schedule(lr)
    else:
        raise ValueError(f"unknown schedule '{name}'")
    if warmup_steps and name != "cosine":
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup_steps), sched], [warmup_steps]
        )
    return sched


def make_optimizer(
    name: str,
    lr,
    *,
    weight_decay: float = 0.0,
    grad_clip: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    """Named optimizers (optimizers/optim_factory.py:73-176)."""
    opts = {
        "adam": lambda: optax.adam(lr, b1=b1, b2=b2),
        "adamw": lambda: optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay),
        "sgd": lambda: optax.sgd(lr, momentum=momentum, nesterov=True),
        "adabelief": lambda: optax.adabelief(lr, b1=b1, b2=b2),
        "lamb": lambda: optax.lamb(lr, b1=b1, b2=b2, weight_decay=weight_decay),
        "radam": lambda: optax.radam(lr, b1=b1, b2=b2),
        "adagrad": lambda: optax.adagrad(lr),
        "rmsprop": lambda: optax.rmsprop(lr, momentum=momentum),
        "lion": lambda: optax.lion(lr, weight_decay=weight_decay),
    }
    if name not in opts:
        raise ValueError(f"unknown optimizer '{name}'; available: {sorted(opts)}")
    tx = opts[name]()
    if grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def make_rvq_optimizer(
    lr: float = 2e-4,
    warmup_iters: int = 1000,
    milestones: tuple = (150_000, 250_000),
    gamma: float = 0.1,
    grad_clip: float = 0.0,
) -> optax.GradientTransformation:
    """AdamW(β=0.9, 0.99) + linear warmup + MultiStepLR
    (rvq_beatx_train.py:324-361)."""

    def schedule(step):
        warm = jnp.minimum(step / jnp.maximum(warmup_iters, 1), 1.0)
        decay = jnp.ones(())
        for m in milestones:
            decay = decay * jnp.where(step >= m, gamma, 1.0)
        return lr * warm * decay

    tx = optax.adamw(schedule, b1=0.9, b2=0.99, weight_decay=0.0)
    if grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def make_diffusion_optimizer(
    lr: float = 5e-5,
    grad_clip: float = 0.99,
    decay_steps: int = 0,
    decay_rate: float = 0.1,
) -> optax.GradientTransformation:
    """Adam + global-norm clip 0.99 (configs/diffusion_rvqvae_128.yaml:100,
    diffusion_rvqvae_trainer.py:557-560), optional step decay."""
    if decay_steps > 0:
        schedule = optax.exponential_decay(
            lr, transition_steps=decay_steps, decay_rate=decay_rate, staircase=True
        )
    else:
        schedule = lr
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adam(schedule),
    )
