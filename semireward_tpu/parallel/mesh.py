"""Device mesh + sharding helpers.

The reference's distributed substrate is one process per GPU + NCCL DDP
(train.py:339-379, core/utils/misc.py:39-70). The TPU-native equivalent is
declarative: build a Mesh over all devices, shard every batch leaf on the
'data' axis, replicate the TrainState, and jit — XLA inserts the gradient
all-reduce (and global BN/statistics reductions) over ICI. A second 'fsdp'
axis is available for parameter sharding on the large-backbone configs.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(mesh_shape: Sequence[int] = (-1,),
               axis_names: Sequence[str] = ("data",),
               devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    shape = list(mesh_shape)
    n = len(devices)
    if shape.count(-1) == 1:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = n // known
    assert int(np.prod(shape)) == n, (
        f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, axis: str = "data") -> dict:
    sh = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def fsdp_param_sharding(mesh: Mesh, params, axis: str = "fsdp",
                        min_size: int = 2 ** 16):
    """Shard large parameter leaves along their biggest dim over `axis`
    (simple FSDP layout for the ViT-B/pod-scale stretch configs)."""
    n_shard = mesh.shape[axis]

    def spec(leaf):
        if leaf.size < min_size:
            return NamedSharding(mesh, P())
        dims = list(leaf.shape)
        best = int(np.argmax(dims))
        if dims[best] % n_shard != 0:
            return NamedSharding(mesh, P())
        parts = [None] * len(dims)
        parts[best] = axis
        return NamedSharding(mesh, P(*parts))

    return jax.tree_util.tree_map(spec, params)
