"""Device-mesh construction for multi-chip AMS serving.

The reference has no multi-device story: one TF graph pinned to one GPU per
process (SemanticNetwork.py:74, run.py:28-29), concurrency by launching
processes.  The TPU-native equivalent is a jax.sharding.Mesh with two axes:

- ``data``: independent video streams (the server fine-tunes many edge
  clients concurrently) and/or minibatch sharding;
- ``model``: spatial partitioning of the activation width within one
  student (GSPMD inserts conv halo exchanges) — useful for large frames.

Collectives ride ICI; XLA chooses them from the sharding annotations.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, str] = ("data", "model"),
              model_parallelism: Optional[int] = None) -> Mesh:
    """Build a (data, model) mesh over the first n devices.

    model_parallelism defaults to 1 (pure data parallel) unless the device
    count has a factor of 2 and the caller asks for spatial partitioning.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if model_parallelism is None:
        model_parallelism = 1
    assert n % model_parallelism == 0, (n, model_parallelism)
    grid = np.array(devices).reshape(n // model_parallelism,
                                     model_parallelism)
    return Mesh(grid, axis_names)
