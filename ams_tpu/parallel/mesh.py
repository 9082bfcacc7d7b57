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


def init_multi_host(coordinator_address: Optional[str] = None,
                    num_processes: Optional[int] = None,
                    process_id: Optional[int] = None,
                    auto: bool = False) -> int:
    """Join a multi-host JAX runtime (one process per host, TPU pod slices).

    Wraps ``jax.distributed.initialize``: afterwards ``jax.devices()``
    returns the GLOBAL device list and ``make_mesh`` builds a pod-wide mesh
    whose 'data' axis spans hosts (collectives ride ICI within a slice, DCN
    across slices — keep the 'model' axis intra-host).  Returns the process
    count.  The reference's only multi-machine story is launching
    independent run.py processes (SemanticNetwork.py:74, run.py:28-29).

    Cloud TPU pod slices publish cluster info via instance metadata, not
    env vars, so pass ``auto=True`` there to let argument-less
    ``jax.distributed.initialize()`` auto-detect the slice.  Without
    ``auto``, a process with no coordinator configured (no args, no
    JAX_COORDINATOR_ADDRESS) stays single-host — auto-detection is opt-in
    because it can block while probing for a coordinator on dev boxes.
    """
    import jax.distributed

    explicit = coordinator_address is not None or num_processes is not None \
        or process_id is not None \
        or "JAX_COORDINATOR_ADDRESS" in __import__("os").environ
    if not explicit and not auto:
        return 1  # single-host: nothing to join
    if explicit:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    else:
        jax.distributed.initialize()  # cloud auto-detection
    return jax.process_count()


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, str] = ("data", "model"),
              model_parallelism: Optional[int] = None) -> Mesh:
    """Build a (data, model) mesh over the first n devices.

    model_parallelism defaults to 1 (pure data parallel) unless the device
    count has a factor of 2 and the caller asks for spatial partitioning.
    """
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            # truncating silently would hand back a smaller mesh than the
            # caller sized its work for (e.g. V videos over n_devices)
            raise ValueError("requested a %d-device mesh but only %d "
                             "devices exist" % (n_devices, len(devices)))
        devices = devices[:n_devices]
    n = len(devices)
    if model_parallelism is None:
        model_parallelism = 1
    assert n % model_parallelism == 0, (n, model_parallelism)
    grid = np.array(devices).reshape(n // model_parallelism,
                                     model_parallelism)
    return Mesh(grid, axis_names)
