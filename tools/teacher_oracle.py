"""Deterministic parameter values for the teacher parity oracle.

The Xception-65 teacher has ~41M params, too large to commit inside a test
fixture.  Instead both sides of the parity gate (the TF graph in
``make_teacher_fixture.py`` and the JAX model in ``test_parity_teacher.py``)
derive every variable's value from its NAME via a per-name seeded RNG, so
the fixture only needs to store the input frames, the TF logits, and the
name->shape inventory.  Any architecture drift shows up as either an
inventory mismatch or a numeric mismatch.

Value ranges are chosen so a random-init 65-layer net keeps O(1)
activations: He-scaled conv weights, BatchNorm scale/variance near 1,
offsets/means near 0.
"""

from __future__ import annotations

import zlib

import numpy as np


def param_value(name: str, shape, seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(
        (zlib.crc32(name.encode("utf-8")) + 1000003 * seed) % (2 ** 31 - 1))
    shape = tuple(int(s) for s in shape)
    if name.endswith("/gamma"):
        # sub-unity scales damp the variance growth of 20 random-init
        # residual sums (16 middle-flow units + 4 conv shortcuts) so the
        # logits stay O(1) and the parity tolerance is meaningful
        return rng.uniform(0.55, 0.75, shape).astype(np.float32)
    if name.endswith("/moving_variance"):
        return rng.uniform(0.9, 1.15, shape).astype(np.float32)
    if name.endswith("/beta") or name.endswith("/moving_mean"):
        return rng.normal(0.0, 0.1, shape).astype(np.float32)
    if name.endswith("/biases"):
        return rng.normal(0.0, 0.1, shape).astype(np.float32)
    if name.endswith("depthwise_weights"):
        fan = shape[0] * shape[1]
        return rng.normal(0.0, np.sqrt(2.0 / fan), shape).astype(np.float32)
    if name.endswith("/weights"):
        fan = shape[0] * shape[1] * shape[2]
        return rng.normal(0.0, np.sqrt(2.0 / fan), shape).astype(np.float32)
    raise ValueError("unknown parameter kind: %s" % name)


def params_for(shapes: dict, seed: int = 0) -> dict:
    return {k: param_value(k, v, seed) for k, v in shapes.items()}
