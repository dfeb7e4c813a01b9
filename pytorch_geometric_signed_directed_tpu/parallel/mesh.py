"""Mesh construction helpers."""
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("graph",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Device mesh over the first ``n_devices`` devices.

    With the default 1-D shape, the single axis ("graph") shards the
    node/edge dimension of the graph.  Pass ``shape`` (matching
    ``axis_names``) for a multi-axis mesh — e.g. ``shape=(2, 4),
    axis_names=("data", "graph")`` trains 2 independent splits/seeds in
    parallel (vmapped leading axis sharded over "data") while each
    training's graph operators shard over 4 chips on "graph".
    """
    devices = jax.devices()
    if shape is not None:
        n = int(np.prod(shape))
        if n > len(devices):
            raise ValueError(f"requested {n} devices, have {len(devices)}")
        assert len(shape) == len(axis_names)
        return Mesh(np.asarray(devices[:n]).reshape(shape), axis_names)
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices[:n_devices]).reshape(shape), axis_names)


def local_mesh() -> Mesh:
    """Trivial 1-device mesh: the same sharded code paths on one chip."""
    return make_mesh(1)
