"""Fused residual-VQ encode kernel (Pallas/TPU).

The inference hot path of the RVQ quantizer (latent2origin / encode,
models/vq/residual_vq.py:171-193) runs 6 sequential quantizer layers, each
a distance matmul + argmin + codebook gather + residual update. Done naively
that is 6 HBM round-trips of the (N, 512) activations plus 6 codebook
reloads. This kernel keeps the residual in VMEM across all layers and the
stacked codebooks resident (6×512×512 f32 = 6 MB, fits VMEM), so the entire
residual cascade is one kernel launch:

    for q in 0..Q:  dist = ‖r‖² − 2 r·Cqᵀ + ‖Cq‖²   (MXU)
                    idx  = argmin dist                  (VPU)
                    code = onehot(idx) · Cq             (MXU gather)
                    out += code; r -= code

Outputs both the summed quantization (what latent2origin decodes) and the
per-layer token indices. Falls back to the XLA path off-TPU (tests run the
kernel in interpreter mode for bit-parity with the reference semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from syntalker_tpu.ops.quantize import RVQConfig, RVQState


def _rvq_encode_kernel(x_ref, cb_ref, out_ref, idx_ref, *, num_quantizers: int):
    x = x_ref[:]  # (TILE_N, D)
    tile_n = x.shape[0]
    nb_code = cb_ref.shape[1]

    residual = x
    quantized = jnp.zeros_like(x)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_n, nb_code), 1)

    for q in range(num_quantizers):
        cb = cb_ref[q]  # (K, D)
        c2 = jnp.sum(cb * cb, axis=-1)  # (K,)
        r2 = jnp.sum(residual * residual, axis=-1, keepdims=True)  # (TILE_N, 1)
        cross = jax.lax.dot(
            residual, cb.T,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        dist = r2 - 2.0 * cross + c2[None, :]
        idx = jnp.argmin(dist, axis=-1).astype(jnp.int32)  # (TILE_N,)
        onehot = (col_ids == idx[:, None]).astype(jnp.float32)
        code = jax.lax.dot(
            onehot, cb,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        quantized = quantized + code
        residual = residual - code
        idx_ref[:, q] = idx

    out_ref[:] = quantized


@functools.partial(jax.jit, static_argnames=("num_quantizers", "tile_n", "interpret"))
def rvq_encode_fused(
    x: jax.Array,  # (N, D) float32 rows to quantize
    codebooks: jax.Array,  # (Q, K, D) float32
    *,
    num_quantizers: int,
    tile_n: int = 512,
    interpret: bool = False,
):
    """Returns (quantized (N, D), indices (N, Q))."""
    n, d = x.shape
    q = num_quantizers
    pad = (-n) % tile_n
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, d), x.dtype)], axis=0)
    np_ = x.shape[0]

    grid = (np_ // tile_n,)
    out, idx = pl.pallas_call(
        functools.partial(_rvq_encode_kernel, num_quantizers=q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (q, codebooks.shape[1], d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, q), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, d), jnp.float32),
            jax.ShapeDtypeStruct((np_, q), jnp.int32),
        ],
        interpret=interpret,
    )(x.astype(jnp.float32), codebooks.astype(jnp.float32))
    return out[:n], idx[:n]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def rvq_quantize_eval_fused(
    z: jax.Array, state: RVQState, cfg: RVQConfig, *, interpret: bool | None = None
):
    """(B, T, D) -> (quantized, indices) through the fused kernel.

    Drop-in accelerated replacement for
    :func:`syntalker_tpu.ops.quantize.rvq_quantize_eval` (requires
    non-shared codebooks, the shipped configuration).
    """
    assert not cfg.shared_codebook, "fused path assumes per-layer codebooks"
    b, t, d = z.shape
    if interpret is None:
        interpret = not _on_tpu()
    flat = z.reshape(b * t, d)
    quant, idx = rvq_encode_fused(
        flat,
        state.codebook,
        num_quantizers=cfg.num_quantizers,
        tile_n=min(512, max(8, b * t)),
        interpret=interpret,
    )
    return quant.reshape(b, t, d), idx.reshape(b, t, cfg.num_quantizers)
