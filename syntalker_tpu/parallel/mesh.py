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


def _param_spec(path: tuple, x: jax.Array, min_size: int) -> P:
    """Tensor-parallel rule: shard large dense kernels' output features over
    'model'; replicate everything else."""
    if x.ndim >= 2 and x.size >= min_size and x.shape[-1] % 2 == 0:
        name = "/".join(str(p) for p in path)
        if any(k in name for k in ("qkv", "fc1", "Dense", "kernel")):
            return P(*([None] * (x.ndim - 1) + ["model"]))
    return P()


def shard_params(params: Any, mesh: Mesh, *, min_size: int = 1 << 16) -> Any:
    """Apply the TP layout (no-op when the model axis has size 1)."""
    if mesh.shape["model"] == 1:
        return replicate(params, mesh)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = []
    for path, x in flat:
        spec = _param_spec(tuple(getattr(p, "key", getattr(p, "name", p)) for p in path), x, min_size)
        ok = all(
            s is None or x.shape[i] % mesh.shape[s] == 0
            for i, s in enumerate(spec + (None,) * (x.ndim - len(spec)))
        )
        sharding = NamedSharding(mesh, spec if ok else P())
        leaves.append(jax.device_put(x, sharding))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
