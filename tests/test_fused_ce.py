"""Fused resize+CE kernel: loss and gradient parity vs the XLA reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ams_tpu.ops.fused_resize_ce import fused_resize_ce, resize_ce_reference


@pytest.fixture()
def case():
    rng = np.random.RandomState(0)
    b, gh, gw, nc = 2, 5, 9, 6
    h, w = 64, 128
    grid = jnp.asarray(rng.randn(b, gh, gw, nc).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, nc, (b, h, w)), jnp.int32)
    weights = jnp.asarray((rng.rand(b, h, w) > 0.3).astype(np.float32))
    return grid, labels, weights, (h, w)


def test_loss_matches_reference(case):
    grid, labels, weights, hw = case
    got = fused_resize_ce(grid, labels, weights, hw, True)
    want = resize_ce_reference(grid, labels, weights, hw)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_grad_matches_reference(case):
    grid, labels, weights, hw = case
    g_fused = jax.grad(
        lambda g: fused_resize_ce(g, labels, weights, hw, True))(grid)
    g_ref = jax.grad(
        lambda g: resize_ce_reference(g, labels, weights, hw))(grid)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_all_invalid_pixels(case):
    grid, labels, _, hw = case
    zero_w = jnp.zeros(labels.shape, jnp.float32)
    loss = fused_resize_ce(grid, labels, zero_w, hw, True)
    assert float(loss) == 0.0
    g = jax.grad(
        lambda gg: fused_resize_ce(gg, labels, zero_w, hw, True))(grid)
    assert float(jnp.abs(g).max()) == 0.0


def test_odd_output_height(case):
    grid, _, _, _ = case
    rng = np.random.RandomState(1)
    labels = jnp.asarray(rng.randint(0, 6, (2, 65, 128)), jnp.int32)
    weights = jnp.ones((2, 65, 128), jnp.float32)
    got = fused_resize_ce(grid, labels, weights, (65, 128), True)
    want = resize_ce_reference(grid, labels, weights, (65, 128))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
