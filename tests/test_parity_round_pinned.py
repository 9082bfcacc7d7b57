"""LONG-HORIZON per-coordinate round parity on the chaos-free pinned-BN round.

The standard round fixture's per-coordinate gates stop at a 1-iteration
horizon because cross-implementation f32 trajectories decorrelate within
3-4 Adam iterations — BN batch-stat coupling amplifies knife-edge sign
flips into the bulk (measured, tools/make_round_fixture.py docstring).
This fixture removes the amplifier: every FusedBatchNormV3 in the
reference graph is pinned to its (frozen) moving statistics via .meta
surgery (``--bn_pin``), and the JAX round runs with
``DistillSpec(bn_train=False)``.  With normalization deterministic, the
masked-Adam machinery — slots-under-mask, where-revert, bias correction,
the coord-desc percentile selection — is gateable per-coordinate over the
FULL recorded horizon (12 iterations), parameters AND Adam slots
(VERDICT r3 weak #1 / next #2).

Reference analogs: train/train_coord construction graph_utils.py:482-496,
the selection epilogue SemanticNetwork.py:263-288, restore filter
SemanticNetwork.py:154-156.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ams_tpu.distill.optimizer import adam_init
from ams_tpu.distill.train_step import (
    DistillSpec,
    all_true_mask,
    make_distill_round,
    split_params,
)

pytestmark = pytest.mark.slow

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "round_parity_pinned_h64.npz")

# Bulk per-coordinate bound over the full horizon.  The tail fraction
# covers coordinates whose warm-slot update ratio m/sqrt(v) sits at the
# float noise floor (see the diag print) — they take bounded ±lr-scale
# steps but no longer contaminate the bulk without BN coupling.
COORD_ATOL = 1e-5
TAIL_FRAC = 1e-4
HARD_CAP_LR = 2.05  # no coordinate may drift beyond ~2 lr per iteration


@pytest.fixture(scope="module")
def fx():
    if not os.path.exists(FIXTURE):
        pytest.skip("pinned round fixture missing "
                    "(run tools/make_round_fixture.py --bn_pin)")
    with np.load(FIXTURE) as z:
        out = {k: z[k] for k in z.files}
    assert bool(out["bn_pin"]), "fixture was not generated with --bn_pin"
    return out


def _group(fx, prefix):
    n = len(prefix)
    return {k[n:]: v for k, v in fx.items() if k.startswith(prefix)}


@pytest.fixture(scope="module")
def setup(fx):
    init = _group(fx, "init:")
    params = {k: jnp.asarray(v) for k, v in init.items()}
    return dict(params=params, init=init,
                frames_buf=jnp.asarray(fx["pool_frames"]),
                labels_buf=jnp.asarray(fx["pool_labels"]),
                n_valid=jnp.asarray(fx["pool_frames"].shape[0], jnp.int32),
                lr=jnp.asarray(float(fx["lr"])),
                iters=int(fx["iters"]), coord_frac=float(fx["coord_frac"]),
                rng=jnp.zeros((2,), jnp.uint32))


def _spec(setup, strategy, iters=None):
    return DistillSpec(iters=setup["iters"] if iters is None else iters,
                       batch_size=6, strategy=strategy,
                       coord_frac=setup["coord_frac"],
                       compute_dtype="float32", bn_train=False)


def _run(setup, spec, *, opt_state=None, mask=None, idx, reselect=True):
    round_fn = make_distill_round(spec)
    params = setup["params"]
    if opt_state is None:
        train, _ = split_params(params)
        opt_state = adam_init(train)
    if mask is None:
        mask = all_true_mask(params)
    return round_fn(params, opt_state, setup["frames_buf"],
                    setup["labels_buf"], setup["n_valid"], setup["rng"],
                    setup["lr"], mask, reselect=reselect,
                    idx_seq=jnp.asarray(idx))


@pytest.fixture(scope="module")
def warm(fx, setup):
    """Frozen-params slot warmup: params AND BN stats bitwise frozen
    (pinned mode never advances the moving averages), slots advance."""
    zero = {k: jnp.zeros_like(v) for k, v in
            all_true_mask(setup["params"]).items()}
    out, opt_state, _m, losses = _run(setup, _spec(setup, "full_model"),
                                      mask=zero, idx=fx["idx_seq"])
    for k, v in setup["init"].items():
        assert np.array_equal(np.asarray(out[k]), v), k  # incl. moving_*
    np.testing.assert_allclose(np.asarray(losses), fx["warm_losses"],
                               rtol=0, atol=1e-5)
    return dict(opt_state=opt_state)


def _gate_coords(out, ref, *, lr, label, atol=COORD_ATOL,
                 tail_frac=TAIL_FRAC, sel=None):
    """Full-horizon per-coordinate gate: bulk within ``atol``, a bounded
    noise-floor tail, every coordinate hard-capped at ~2 lr."""
    tot = bad = 0
    worst = 0.0
    for k, rv in ref.items():
        d = np.abs(np.asarray(out[k], np.float64) - rv)
        if "moving_" in k:
            assert d.max() == 0.0, (label, k, d.max())  # frozen bitwise
            continue
        if sel is not None and k in sel:
            d = d[sel[k]]
        tot += d.size
        bad += int((d > atol).sum())
        worst = max(worst, float(d.max()) if d.size else 0.0)
        assert d.size == 0 or d.max() <= HARD_CAP_LR * lr, (label, k, d.max())
    frac = bad / max(tot, 1)
    print("%s: %d/%d coords beyond %g (%.6f%%), worst %.3e"
          % (label, bad, tot, atol, 100 * frac, worst))
    assert frac <= tail_frac, (label, frac)


def _gate_losses(ours, ref, label, atol=2e-5):
    ours = np.asarray(ours, np.float64)
    ref = np.asarray(ref, np.float64)
    d = np.abs(ours - ref)
    print("%s losses: max diff %.3e" % (label, d.max()))
    assert d.max() < atol, (label, ours, ref)


def test_full_model_long_horizon(fx, setup, warm):
    """train_coord(all-ones) ≡ train over the full 12-iteration horizon:
    per-coordinate params at it1 / mid / final, Adam slots at final,
    per-iteration losses at a flat (non-chaos-widened) tolerance."""
    lr = float(fx["lr"])
    iters = setup["iters"]
    mid = iters // 2

    for h, key in ((1, "full_it1:"), (mid, "full_it%d:" % mid),
                   (iters, "full_final:")):
        out, opt, _m, losses = _run(setup, _spec(setup, "full_model",
                                                 iters=h),
                                    opt_state=warm["opt_state"],
                                    idx=fx["idx_seq2"][:h])
        _gate_coords(out, _group(fx, key), lr=lr, label="full_it%d" % h)
        _gate_losses(losses, fx["full_losses"][:h], "full[:%d]" % h)

    # Adam slots at the final horizon: opt.m / opt.v vs the recorded
    # <var>/Adam(_1) slot variables; beta powers derive from opt.step
    # (TF keeps beta1_power = beta1^t as explicit variables)
    slots = _group(fx, "full_slot:")
    step = int(np.asarray(opt.step))
    tot = bad = 0
    for name, rv in slots.items():
        if name.endswith("/Adam"):
            ours = np.asarray(opt.m[name[:-5]], np.float64)
        elif name.endswith("/Adam_1"):
            ours = np.asarray(opt.v[name[:-7]], np.float64)
        else:  # beta1_power / beta2_power scalars
            beta = 0.9 if "beta1" in name else 0.999
            assert abs(beta ** step - float(rv)) < 1e-7, (name, step, rv)
            continue
        d = np.abs(ours - rv)
        tot += d.size
        bad += int((d > COORD_ATOL).sum())
    assert tot > 0
    frac = bad / tot
    print("full slots: %d/%d beyond %g (%.6f%%)"
          % (bad, tot, COORD_ATOL, 100 * frac))
    assert frac <= 10 * TAIL_FRAC, frac


def test_fixed_mask_long_horizon(fx, setup, warm):
    """Fixed Bernoulli mask over 12 iterations: masked-out coordinates
    bitwise-frozen, selected coordinates tracked per-coordinate."""
    mask_np = _group(fx, "fixed_mask:")
    mask = {k: jnp.asarray(v) for k, v in mask_np.items()}
    out, _o, _m, losses = _run(setup, _spec(setup, "full_model"),
                               opt_state=warm["opt_state"], mask=mask,
                               idx=fx["idx_seq2"])
    _gate_losses(losses, fx["fixed_losses"], "fixed")
    init = setup["init"]
    for k, m in mask_np.items():
        assert np.array_equal(np.asarray(out[k])[~m], init[k][~m]), k
    _gate_coords(out, _group(fx, "fixed_final:"), lr=float(fx["lr"]),
                 label="fixed_final", sel=mask_np)


def test_coord_desc_auto_long_horizon(fx, setup, warm):
    """coord_desc_auto: selection mask near-exact (ties only), then the
    masked trajectory per-coordinate through the final iteration."""
    cut = float(fx["auto_cut"])
    out1, _o, mask, _l = _run(setup, _spec(setup, "coord_desc_auto",
                                           iters=1),
                              opt_state=warm["opt_state"],
                              idx=fx["idx_seq2"][:1], reselect=True)
    ref_mask = _group(fx, "auto_mask:")
    margin = _group(fx, "auto_margin:")
    total = agreed = 0
    agree = {}
    for k, rm in ref_mask.items():
        om = np.asarray(mask[k])
        eq = om == rm
        agree[k] = eq
        total += rm.size
        agreed += int(eq.sum())
        flips = ~eq
        bad = flips & (np.abs(margin[k]) > 0.05 * cut)
        assert not bad.any(), (
            f"{k}: {int(bad.sum())} mask flips with margin up to "
            f"{np.abs(margin[k][flips]).max():.2e} (cut {cut:.2e})")
    assert agreed / total > 0.9995, (total - agreed, total)
    print(f"auto mask (pinned): {agreed}/{total} agree "
          f"({100 * (total - agreed) / total:.5f}% tie flips)")

    _gate_coords(out1, _group(fx, "auto_postsel:"), lr=float(fx["lr"]),
                 label="auto_postsel", sel=agree)

    out, _o, _m, losses = _run(setup, _spec(setup, "coord_desc_auto"),
                               opt_state=warm["opt_state"],
                               idx=fx["idx_seq2"], reselect=True)
    _gate_losses(losses, fx["auto_losses"], "auto")
    _gate_coords(out, _group(fx, "auto_final:"), lr=float(fx["lr"]),
                 label="auto_final", sel=agree)
