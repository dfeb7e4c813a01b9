"""Mesh construction helpers."""
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("graph",)) -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices.

    The single axis ("graph") shards the node/edge dimension of the graph;
    data parallelism over multiple graphs can stack a second axis.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices[:n_devices]).reshape(shape), axis_names)


def local_mesh() -> Mesh:
    """Trivial 1-device mesh: the same sharded code paths on one chip."""
    return make_mesh(1)
