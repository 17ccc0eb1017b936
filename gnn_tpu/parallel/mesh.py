"""Device mesh helpers.

The reference is single-process single-device (SURVEY.md §2.3); all
parallelism here is new, built on jax.sharding.Mesh + shard_map with XLA
collectives riding ICI. Two named axes:

  'data'  — data parallelism: one merged-graph batch per replica, gradient
            psum (the TPU analogue of the reference's sequential batch loop,
            GNN_BaseClass.py:285-287).
  'graph' — graph/edge partitioning within a replica: edges sharded, partial
            neighborhood aggregations psum-ed every propagation iteration
            (the sequence-parallel analogue for large graphs).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_sizes: Optional[dict] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh with named axes ('data', 'graph').

    :param axis_sizes: e.g. {'data': 2, 'graph': 4}. Defaults to all devices
        on 'data'. Sizes must multiply to len(devices).
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = {"data": len(devices)}
    names = tuple(axis_sizes)
    sizes = tuple(int(axis_sizes[n]) for n in names)
    need = int(np.prod(sizes))
    if need > len(devices):
        raise ValueError(f"axis sizes {axis_sizes} need {need} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:need]).reshape(sizes)
    return Mesh(dev_array, names)
