"""Device-mesh construction and ray-axis sharding helpers.

TPU-native replacement for the reference's NCCL/DDP distribution layer
(SURVEY.md §2.6): a 1-D `ray` mesh axis carries the pixel/ray batch; model
params are replicated (all networks are <=8x512 MLPs — no TP/PP needed,
idr_train.py:309). Gradients are exact global masked means via psum inside
the shard-mapped loss, replacing DDP's all-reduce; render-time ray shards
replace the pickled gather_object with fixed-shape all_gathers.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "ray"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = RAY_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ray_sharded(mesh: Mesh, axis_name: str = RAY_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, batch, axis_name: str = RAY_AXIS):
    """Place a host batch on the mesh: leading axis sharded over `axis_name`.

    Arrays whose leading dimension is not divisible by the mesh size are
    replicated instead (e.g. [B,4,4] camera matrices with B=1).
    """
    n = mesh.devices.size

    def place(x):
        import jax.numpy as jnp

        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0:
            return jax.device_put(x, NamedSharding(mesh, P(axis_name)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, batch)


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))
