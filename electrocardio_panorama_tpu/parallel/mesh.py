"""Device mesh construction and sharding helpers.

The reference's only multi-device mechanism is single-host
torch.nn.DataParallel (solver.py:32-34). The TPU-native replacement: a
`jax.sharding.Mesh` over ICI with named axes —

    data : batch (dp) — gradients pmean over this axis
    view : query-viewpoint axis of panorama rendering (the sp analog: each
           shard decodes a slice of the viewpoint sweep)

Multi-host extends the same mesh over DCN via jax.distributed.initialize; no
framework change needed (axes just span more devices).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: tuple[int, ...], axes: tuple[str, ...] = ("data",), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(shape), axes[: len(shape)])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def put_replicated(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def put_batch(arrays: tuple, mesh: Mesh, axis: str = "data"):
    sh = batch_sharded(mesh, axis)
    return tuple(jax.device_put(a, sh) for a in arrays)
