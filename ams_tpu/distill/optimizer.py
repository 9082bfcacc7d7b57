"""TF1-semantics Adam with masked application.

The reference trains with ``tf.train.AdamOptimizer`` (graph_utils.py:459,490)
whose update differs slightly from optax's adam in where epsilon sits:

    lr_t  = lr * sqrt(1 - b2^t) / (1 - b1^t)
    m_t   = b1*m + (1-b1)*g ;  v_t = b2*v + (1-b2)*g^2
    p_t   = p - lr_t * m_t / (sqrt(v_t) + eps)        # eps OUTSIDE the bias fix

We implement that formula exactly so per-round parameter deltas (and hence
the coord-descent selections and downlink payloads) match the reference.

The masked-gradient trick (graph_utils.py:482-493: backup -> full Adam step
-> tf.where(mask, new, backup)) becomes ``jnp.where`` on the updated params:
optimizer slots always advance for ALL parameters, matching ``train_all``.
Slots persist across rounds (the reference's restore filter never touches
Adam variables, SemanticNetwork.py:25).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

ADAM_BETA1 = 0.9
ADAM_BETA2 = 0.999
ADAM_EPS = 1e-8


class AdamState(NamedTuple):
    step: jax.Array            # scalar int32
    m: dict                    # first-moment pytree over trainable params
    v: dict                    # second-moment pytree


def adam_init(trainable_params: dict) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, dict(trainable_params))
    return AdamState(step=jnp.zeros((), jnp.int32),
                     m=zeros,
                     v=jax.tree.map(jnp.zeros_like, dict(trainable_params)))


def adam_apply(params: dict, grads: dict, state: AdamState, lr):
    """One Adam step over the keys of ``grads``.

    Returns (new_params, new_state).  Always unmasked: the reference's
    train_coord semantics (movement suppressed where the mask is False
    while slots still advance) live in ONE place — train_step.py's scan
    body applies the mask via jnp.where over the stepped params, because
    the peeled selection iteration needs the unmasked step too.
    """
    t = state.step + 1
    tf_ = t.astype(jnp.float32)
    lr_t = lr * jnp.sqrt(1.0 - ADAM_BETA2 ** tf_) / (1.0 - ADAM_BETA1 ** tf_)

    new_params = dict(params)
    new_m = dict(state.m)
    new_v = dict(state.v)
    for k, g in grads.items():
        g = g.astype(jnp.float32)
        m = ADAM_BETA1 * state.m[k] + (1.0 - ADAM_BETA1) * g
        v = ADAM_BETA2 * state.v[k] + (1.0 - ADAM_BETA2) * jnp.square(g)
        new_params[k] = params[k] - lr_t * m / (jnp.sqrt(v) + ADAM_EPS)
        new_m[k] = m
        new_v[k] = v
    return new_params, AdamState(step=t, m=new_m, v=new_v)
