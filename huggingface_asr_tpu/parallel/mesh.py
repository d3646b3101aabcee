"""Device mesh + sharding rules.

The reference's only parallelism dimension is data parallelism via
torchrun/NCCL DDP (SURVEY.md §2.15). The TPU-native equivalent is a
`jax.sharding.Mesh` with a ``data`` axis spanning ICI (+DCN across slices):
batches are sharded over ``data``, parameters are replicated (pure DP) or
sharded over ``data`` on their largest axis (FSDP superset, zero config).
A ``model`` axis is provisioned for tensor-parallel layouts of the larger
decoder models; all collectives are inserted by XLA from these annotations.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1: all remaining devices
    model: int = 1
    fsdp: bool = False  # shard params over `data` (largest-axis rule)
    fsdp_min_size: int = 2**16  # don't shard tiny params


def make_mesh(config: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(1, config.model)
    data = config.data if config.data > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dimension over `data`."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def fsdp_spec(shape, mesh_size: int, min_size: int) -> P:
    if not shape or int(np.prod(shape)) < min_size:
        return P()
    # Shard the largest axis divisible by the data-axis size.
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for ax in order:
        if shape[ax] % mesh_size == 0:
            spec = [None] * len(shape)
            spec[ax] = "data"
            return P(*spec)
    return P()


def param_sharding(mesh: Mesh, params: Any, config: MeshConfig = MeshConfig()) -> Any:
    """A sharding pytree for params: replicated, or FSDP over `data`."""
    if not config.fsdp:
        return jax.tree.map(lambda _: replicate(mesh), params)
    size = mesh.shape["data"]
    return jax.tree.map(
        lambda p: NamedSharding(mesh, fsdp_spec(p.shape, size, config.fsdp_min_size)),
        params,
    )
