"""Skeleton-topology-aware convolutions (Aberman et al. style) in JAX.

Capability parity with ``models/utils/skeleton.py``: edge topology
construction (:316), edge-distance neighborhoods (:373-417), masked
skeleton convolution (:9-120), chain mean-pooling (:162-238), and the
residual skeleton block (:547-585).

TPU-first differences:
- all topology computation (edge graph, neighborhoods, pooling chains) is
  host-side numpy at module construction; the device only ever sees a
  masked dense conv (one MXU-friendly conv1d with a static 0/1 weight
  mask) and a static pooling matmul,
- feature-last (B, T, C) layout.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# topology (host-side numpy)
# ---------------------------------------------------------------------------


def build_edge_topology(parents: Sequence[int]) -> List[Tuple[int, int]]:
    """Edges (parent, child) with a virtual root edge (skeleton.py:316-323)."""
    joint_num = len(parents)
    edges = [(0, joint_num)]
    for i in range(1, joint_num):
        edges.append((int(parents[i]), i))
    return edges


def calc_edge_mat(edges: List[Tuple[int, int]]) -> np.ndarray:
    """All-pairs distances in the edge adjacency graph (skeleton.py:373-396)."""
    n = len(edges)
    mat = np.full((n, n), 100000, dtype=np.int64)
    np.fill_diagonal(mat, 0)
    for i, a in enumerate(edges):
        for j, b in enumerate(edges):
            if a[0] in b or a[1] in b:
                mat[i, j] = 1
    np.fill_diagonal(mat, 0)
    for k in range(n):
        mat = np.minimum(mat, mat[:, k : k + 1] + mat[k : k + 1, :])
    return mat


def find_neighbor(edges: List[Tuple[int, int]], d: int) -> List[List[int]]:
    """Per-edge list of edge indices within graph distance d (skeleton.py:399)."""
    mat = calc_edge_mat(edges)
    return [list(np.nonzero(mat[i] <= d)[0]) for i in range(len(edges))]


@dataclasses.dataclass
class PoolingPlan:
    pooling_list: List[List[int]]
    new_edges: List[Tuple[int, int]]


def skeleton_pooling_plan(edges: List[Tuple[int, int]], last_pool: bool = False) -> PoolingPlan:
    """Chain-merging plan (SkeletonPool.__init__, skeleton.py:162-219):
    degree-2 chains are merged pairwise; `last_pool` collapses each chain
    entirely."""
    degree = [0] * (max(max(e) for e in edges) + 2)
    for a, b in edges:
        degree[a] += 1
        degree[b] += 1

    seq_list: List[List[int]] = []

    def find_seq(j: int, seq: List[int]):
        if degree[j] > 2 and j != 0:
            seq_list.append(seq)
            seq = []
        if degree[j] == 1:
            seq_list.append(seq)
            return
        for idx, e in enumerate(edges):
            if e[0] == j:
                find_seq(e[1], seq + [idx])

    find_seq(0, [])

    pooling_list: List[List[int]] = []
    new_edges: List[Tuple[int, int]] = []
    for seq in seq_list:
        if last_pool:
            pooling_list.append(seq)
            continue
        if len(seq) % 2 == 1:
            pooling_list.append([seq[0]])
            new_edges.append(edges[seq[0]])
            seq = seq[1:]
        for i in range(0, len(seq), 2):
            pooling_list.append([seq[i], seq[i + 1]])
            new_edges.append((edges[seq[i]][0], edges[seq[i + 1]][1]))
    return PoolingPlan(pooling_list, new_edges)


def pooling_matrix(plan: PoolingPlan, channels_per_edge: int, n_edges: int) -> np.ndarray:
    """(new_edges*c, old_edges*c) mean-pool matrix (skeleton.py:221-229)."""
    w = np.zeros((len(plan.pooling_list) * channels_per_edge, n_edges * channels_per_edge), np.float32)
    for i, group in enumerate(plan.pooling_list):
        for j in group:
            for c in range(channels_per_edge):
                w[i * channels_per_edge + c, j * channels_per_edge + c] = 1.0 / len(group)
    return w


def unpooling_matrix(plan: PoolingPlan, channels_per_edge: int) -> np.ndarray:
    """(old_edges*c, new_edges*c) copy-unpool matrix (skeleton.py:241-262)."""
    out_edges = sum(len(g) for g in plan.pooling_list)
    w = np.zeros((out_edges * channels_per_edge, len(plan.pooling_list) * channels_per_edge), np.float32)
    for i, group in enumerate(plan.pooling_list):
        for j in group:
            for c in range(channels_per_edge):
                w[j * channels_per_edge + c, i * channels_per_edge + c] = 1.0
    return w


def skeleton_conv_mask(
    neighbour_list: List[List[int]], in_per_joint: int, out_per_joint: int, kernel_size: int
) -> np.ndarray:
    """Static 0/1 mask (k, in_ch, out_ch) restricting each edge's output
    channels to its neighborhood's input channels (skeleton.py:60-64),
    in flax HWIO conv layout."""
    n = len(neighbour_list)
    mask = np.zeros((kernel_size, n * in_per_joint, n * out_per_joint), np.float32)
    for i, neigh in enumerate(neighbour_list):
        cols = slice(i * out_per_joint, (i + 1) * out_per_joint)
        for k in neigh:
            rows = slice(k * in_per_joint, (k + 1) * in_per_joint)
            mask[:, rows, cols] = 1.0
    return mask


# ---------------------------------------------------------------------------
# flax modules
# ---------------------------------------------------------------------------


class SkeletonConv(nn.Module):
    """Topology-masked conv1d over (B, T, edges*channels)."""

    neighbour_list: tuple  # tuple of tuples (hashable for flax)
    in_per_joint: int
    out_per_joint: int
    kernel_size: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = len(self.neighbour_list)
        in_ch, out_ch = n * self.in_per_joint, n * self.out_per_joint
        mask = jnp.asarray(
            skeleton_conv_mask(
                [list(t) for t in self.neighbour_list],
                self.in_per_joint,
                self.out_per_joint,
                self.kernel_size,
            )
        )
        kernel = self.param(
            "kernel",
            nn.initializers.he_uniform(),
            (self.kernel_size, in_ch, out_ch),
        )
        bias = self.param("bias", nn.initializers.zeros, (out_ch,))
        y = jax.lax.conv_general_dilated(
            x,
            kernel * mask,
            window_strides=(self.stride,),
            padding=((self.padding, self.padding),),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias


class SkeletonPool(nn.Module):
    """Static mean-pool over merged edge chains: (B, T, E*c) -> (B, T, E'*c)."""

    weight: tuple  # nested tuple of the pooling matrix

    def __call__(self, x: jax.Array) -> jax.Array:
        w = jnp.asarray(np.array(self.weight, np.float32))
        return x @ w.T


class SkeletonResidual(nn.Module):
    """Strided skeleton conv + GroupNorm residual block, followed by chain
    pooling and Tanh (skeleton.py:547-585)."""

    neighbour_list: tuple
    in_per_joint: int
    out_per_joint: int
    kernel_size: int
    pool_weight: tuple

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = (self.kernel_size - 1) // 2
        res = SkeletonConv(
            self.neighbour_list,
            self.in_per_joint,
            self.out_per_joint,
            self.kernel_size,
            stride=2,
            padding=pad,
            name="conv",
        )(x)
        # epsilon matches torch.nn.GroupNorm (1e-5) so converted reference
        # checkpoints are numerically exact (flax default is 1e-6)
        res = nn.GroupNorm(num_groups=10, epsilon=1e-5, name="norm")(res)
        short = SkeletonConv(
            self.neighbour_list,
            self.in_per_joint,
            self.out_per_joint,
            kernel_size=1,
            stride=2,
            padding=0,
            name="shortcut",
        )(x)
        out = res + short
        out = SkeletonPool(self.pool_weight, name="pool")(out)
        return jnp.tanh(out)
