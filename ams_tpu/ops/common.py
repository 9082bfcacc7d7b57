"""Shared helpers for the Pallas kernels in this package.

Kernel bodies compute in f32 regardless of the tensor dtype (MXU
accumulation), so ``relu6`` here clamps with float constants and does NOT
re-cast — unlike ``models.layers.relu6``, which preserves the input dtype
for the XLA (bf16) path.  Keeping one definition per context stops the
fused and unfused activation semantics drifting independently.
"""

from __future__ import annotations

import jax.numpy as jnp


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def relu6(x):
    """f32 kernel-body clamp (see module docstring vs layers.relu6)."""
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)
