"""Device-mesh sharding for block-sparse tensor networks.

The reference has no distributed execution at all (SURVEY.md section 2C);
its parallelism is vendor-BLAS threads within a block GEMM.  The TPU-native
analog: every SymTensor is a pytree of per-sector blocks, so we hand XLA a
*per-leaf* sharding — large blocks are split along their longest bond axis
(tensor-parallel GEMMs riding ICI collectives), small blocks are replicated.
XLA's SPMD partitioner then inserts the all-gathers/reduce-scatters; no
hand-written collectives are needed for the matvec path.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "tp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def block_sharding(mesh: Mesh, shape, axis_name: str = "tp",
                   min_dim: int = 2):
    """NamedSharding for one block: shard the largest eligible axis.

    Shards the largest axis whose dim is divisible by the mesh size
    (``device_put`` rejects ragged shards); blocks with no such axis are
    replicated."""
    n = mesh.devices.size
    best = None
    for i, d in enumerate(shape):
        if d % n == 0 and d >= max(min_dim, n):
            if best is None or d > shape[best]:
                best = i
    spec = [None] * len(shape)
    if best is not None:
        spec[best] = axis_name
    return NamedSharding(mesh, P(*spec))


def tree_shardings(mesh: Mesh, tree, axis_name: str = "tp"):
    """Per-leaf shardings for an arbitrary pytree of block arrays."""
    return jax.tree_util.tree_map(
        lambda leaf: block_sharding(mesh, leaf.shape, axis_name), tree)


def shard_tree(mesh: Mesh, tree, axis_name: str = "tp"):
    """Place every leaf of a pytree according to its block sharding."""
    shardings = tree_shardings(mesh, tree, axis_name)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


def stack_sharding(mesh: Mesh, shape, axis_name: str = "tp"):
    """Sharding for a bucketed stack (batch, *bucketed dims): prefer the
    batch axis (embarrassingly parallel over stacked blocks), fall back to
    the largest divisible bucket axis (pow2 buckets start at 8, so any
    bucketed axis divides a <=8-device mesh axis)."""
    n = mesh.devices.size
    if shape and shape[0] % n == 0 and shape[0] >= n:
        return NamedSharding(mesh, P(axis_name, *([None] * (len(shape) - 1))))
    return block_sharding(mesh, shape, axis_name)


def shard_stacks(mesh: Mesh, stacks, axis_name: str = "tp"):
    """Place the per-class stacked arrays of a PaddedHAC/PaddedHC operand
    (dict class-key -> (n, ...) array) across the mesh."""
    return {ck: jax.device_put(arr, stack_sharding(mesh, arr.shape, axis_name))
            for ck, arr in stacks.items()}


def shard_lanes(mesh: Mesh, arr, axis_name: str = "tp"):
    """Place a momentum-batched operand (``[K, ...]``) with its lane axis
    split across the mesh.  Dispersion-scan lanes are independent
    eigenproblems, so splitting the batch axis of the vmapped H_eff
    pipeline is pure data parallelism — XLA lowers it without collectives
    and a K-point scan scales linearly over chips.  Lane counts not
    divisible by the mesh are replicated (device_put rejects ragged
    shards)."""
    n = mesh.devices.size
    if arr.ndim and arr.shape[0] % n == 0 and arr.shape[0] >= n:
        spec = P(axis_name, *([None] * (arr.ndim - 1)))
    else:
        spec = P(*([None] * arr.ndim))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def n_sharded_leaves(tree) -> tuple:
    """(sharded, total) leaf counts — a leaf counts as sharded when its
    placement is not fully replicated."""
    split = total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        total += 1
        sh = getattr(leaf, "sharding", None)
        if sh is not None and not sh.is_fully_replicated:
            split += 1
    return split, total
