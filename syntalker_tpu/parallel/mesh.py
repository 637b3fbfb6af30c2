"""Device-mesh parallelism: data + tensor sharding via NamedSharding.

Replaces the reference's process-per-GPU NCCL stack (mp.spawn + DDP +
SyncBatchNorm + DistributedSampler, train.py:54-94,255-317) with the
single-program JAX model (SURVEY.md §2.8):

- one ``jax.sharding.Mesh`` with a ``data`` axis (and an optional ``model``
  axis for tensor parallelism of the larger dense layers),
- batches sharded by NamedSharding on their leading axis; gradients are
  reduced by the collectives XLA inserts — no rendezvous, ports, or
  process groups,
- parameters replicated by default; tensor-parallel layouts shard the
  largest kernels' output features over ``model`` so the matmul collectives
  ride ICI.

The models here are tens of M params, so data parallel is the performance
path; the ``model`` axis exists to prove out and test the TP plumbing (and
for future larger denoisers).
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1,
    model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, model) mesh. data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard every leaf's leading axis over the data axis."""
    sharding = NamedSharding(mesh, P("data"))
    n_data = mesh.shape["data"]

    def put(x):
        if x.shape[0] % n_data:
            raise ValueError(
                f"batch size {x.shape[0]} not divisible by the data axis "
                f"({n_data} devices); pick train.batch_size as a multiple, "
                f"or shrink the mesh with train.data_parallel"
            )
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


# Explicit tensor-parallel layout for the MDM transformer stack
# (Megatron-style: the attention and MLP each are a column-parallel matmul
# followed by a row-parallel one; the dominant collective per block is the
# psum XLA inserts after proj/fc2 — one all-reduce per block over ICI.
# The fused qkv kernel is stored head-aligned, (C, 3, H, head_dim), so
# sharding its H axis gives every device whole heads: q/k/v slicing,
# attention, and the head-major reshape back to C all stay local, and the
# round-2 per-block all-gather of the (B, T, 3C) qkv activation (the flat
# part-major kernel's shard cut fell mid-k — measured by
# scripts/audit_tp_collectives.py) is gone.
#
# Keys are path *suffixes* matched against the flattened param path; the
# leading ``blocks/block`` scan axis (layer dim L) is position 0 of every
# stacked kernel, hence the 3-d specs. With ``scan_blocks=False`` the
# params appear unrolled (``blocks_0/qkv/kernel``, one rank lower); the
# matcher below normalizes those paths onto the same table and drops the
# layer dim from the spec. Everything not listed — embeddings
# (``word_embedding`` is a bare (V, D) table), LayerNorms, the WavEncoder
# convs, input/output projections, the timestep MLP — is explicitly
# replicated: those are either tiny or bandwidth-bound gathers that TP
# would only slow down. This replaces the round-1 "any large kernel"
# name heuristic (VERDICT Weak #6): the layout is now a reviewable table,
# and new parameters default to replicated instead of silently sharded.
MDM_TP_LAYOUT: dict[str, P] = {
    # attention: qkv column-parallel (the H axis of the head-aligned
    # (L, C, 3, H, hd) kernel splits over 'model'), proj row-parallel
    # (contracting dim sharded -> psum into replicated out)
    "blocks/block/qkv/kernel": P(None, None, None, "model", None),
    "blocks/block/proj/kernel": P(None, "model", None),
    # MLP: fc1 column-parallel, fc2 row-parallel
    "blocks/block/fc1/kernel": P(None, None, "model"),
    "blocks/block/fc1/bias": P(None, "model"),
    "blocks/block/fc2/kernel": P(None, "model", None),
}


def _path_str(path: tuple) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


_UNROLLED_BLOCK = re.compile(r"(^|/)blocks?_\d+/")


def param_specs(params: Any, layout: Optional[dict] = None) -> Any:
    """Pytree of PartitionSpecs for ``params`` from an explicit layout table.

    ``layout`` maps path suffixes to specs; unmatched parameters are
    replicated (P()). Unrolled block paths (``blocks_3/qkv/kernel`` from
    ``scan_blocks=False``) are normalized onto the scan-stacked table keys
    with the leading layer dim dropped from the spec, so TP is never
    silently disabled by the unrolled layout. A matched spec whose sharded
    dims don't divide the parameter's shape is a layout bug — surfaced by
    ``shard_params``.
    """
    table = MDM_TP_LAYOUT if layout is None else layout

    def lookup(name):
        for suffix, spec in table.items():
            if name == suffix or name.endswith("/" + suffix):
                return spec
        return None

    def spec_for(path, x):
        name = _path_str(path)
        spec = lookup(name)
        if spec is not None:
            return spec
        if _UNROLLED_BLOCK.search(name):
            spec = lookup(_UNROLLED_BLOCK.sub(r"\1blocks/block/", name))
            if spec is not None:
                return P(*spec[1:])  # drop the scan layer dim
        return P()

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, [spec_for(p, x) for p, x in flat])


def shard_params(
    params: Any, mesh: Mesh, *, layout: Optional[dict] = None
) -> Any:
    """Place params on the mesh per the explicit TP layout table.

    No-op (full replication) when the model axis has size 1. Raises if a
    matched spec doesn't divide the parameter shape — a mis-specified
    layout should fail loudly, not silently fall back to replication.
    """
    if mesh.shape["model"] == 1:
        return replicate(params, mesh)

    specs = param_specs(params, layout)
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_s = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda s: isinstance(s, P)
    )
    treedef = jax.tree_util.tree_structure(params)
    leaves = []
    any_model_sharded = False
    for (path, x), spec in zip(flat_p, flat_s):
        if len(spec) > x.ndim:
            raise ValueError(
                f"TP layout error: {_path_str(path)} has rank {x.ndim} but "
                f"its layout spec {spec} has {len(spec)} dims (scan-stacked "
                f"spec matched against an unrolled param?)"
            )
        for i, s in enumerate(spec):
            if s is not None and x.shape[i] % mesh.shape[s]:
                raise ValueError(
                    f"TP layout error: {_path_str(path)} shape {x.shape} dim "
                    f"{i} not divisible by mesh axis '{s}'={mesh.shape[s]}"
                )
        any_model_sharded = any_model_sharded or "model" in spec
        leaves.append(jax.device_put(x, NamedSharding(mesh, spec)))
    if not any_model_sharded:
        raise ValueError(
            "TP layout error: mesh has model="
            f"{mesh.shape['model']} but no parameter matched a model-sharded "
            "layout entry — tensor parallelism would be silently disabled. "
            "Check the layout table against the param paths."
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
