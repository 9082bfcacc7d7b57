"""SemanticNetwork facade: API parity behaviours + thread safety."""

import threading

import numpy as np
import pytest

from ams_tpu.runtime.network import SemanticNetwork


def _cw(idx, n=19):
    w = np.zeros((n, 1), np.float32)
    w[list(idx)] = 1
    return w


@pytest.fixture(scope="module")
def net():
    return SemanticNetwork(meta_dir="synthetic",
                           class_weights_exp=_cw([0, 2, 10, 13]), height=32,
                           scale=[1], mini_batch_size=2, lr=1e-3)


def test_predict_and_metric(net):
    frames = np.random.RandomState(0).randint(
        0, 256, (1, 32, 64, 3)).astype(np.float32)
    labels = np.random.RandomState(1).randint(0, 19, (1, 32, 64))
    preds = net.predict_input(frames)
    assert preds.shape == (1, 32, 64) and preds.max() <= 3
    out_preds, cm, iou, miou, loss = net.predict_with_metric(frames, labels)
    assert cm.shape == (4, 4)
    assert np.isfinite(loss)


def test_stats_vars_is_exactly_the_moving_stats(net):
    """stats_vars() — the per-round stats-annex gather — must equal the
    moving-stat subset of get_vars(): same keys, same values, no trainables
    (it exists to avoid get_vars()' full ~2M-parameter D2H per round)."""
    full = net.get_vars()
    stats = net.stats_vars()
    assert stats and all("moving_" in k for k in stats)
    assert set(stats) == {k for k in full if "moving_" in k}
    for k, v in stats.items():
        np.testing.assert_array_equal(v, full[k])


@pytest.mark.slow
def test_train_round_and_delta_outputs(net):
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 256, (32, 64, 3)).astype(np.uint8)
              for _ in range(3)]
    labels = [rng.randint(0, 19, (32, 64)).astype(np.uint8) for _ in range(3)]
    losses = net.train_with_deque(frames, labels, 2, "coord_desc_auto")
    assert losses.shape == (2,)
    assert len(net.curr_mask) == len(net.train_params) == 164
    # masks cover ~coord_frac of the trainable params
    total = sum(m.size for m in net.curr_mask)
    sel = sum(int(m.sum()) for m in net.curr_mask)
    assert 0.05 < sel / total < 0.15
    # full_model round ships every saveable var with all-ones masks
    net.train_with_deque(frames, labels, 1, "full_model")
    assert len(net.curr_mask) == 272
    assert all(m.all() for m in net.curr_mask)


def test_restore_initial_resets(net):
    before = net.get_vars()
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 256, (32, 64, 3)).astype(np.uint8)
              for _ in range(2)]
    labels = [rng.randint(0, 19, (32, 64)).astype(np.uint8)
              for _ in range(2)]
    net.train_with_deque(frames, labels, 1, "full_model")
    changed = net.get_vars()
    assert any((changed[k] != before[k]).any() for k in before)
    net.restore_initial()
    restored = net.get_vars()
    # restore resets to construction-time weights
    init = net._initial_params
    for k in init:
        np.testing.assert_array_equal(restored[k], np.asarray(init[k]))


def test_cross_miou(net):
    labels = np.random.RandomState(0).randint(0, 19, (2, 32, 64))
    cm, iou, miou = net.calc_cross_miou(labels)
    assert cm.shape == (4, 4)
    ident = np.stack([labels[0], labels[0]])
    _, _, miou_same = net.calc_cross_miou(ident)
    assert miou_same == pytest.approx(1.0)


def test_concurrent_predict_threads(net):
    """The facade lock serializes concurrent callers (the reference guards
    every session entry with process_lock, SemanticNetwork.py:70)."""
    frames = np.random.RandomState(0).randint(
        0, 256, (1, 32, 64, 3)).astype(np.float32)
    results, errors = [], []

    def worker():
        try:
            results.append(net.predict_input(frames))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(results) == 8
    for r in results[1:]:
        np.testing.assert_array_equal(r, results[0])


def test_frozen_roundtrip(net, tmp_path):
    path = str(tmp_path / "deployed")
    net.save_to_frozen_graph(path)
    client = SemanticNetwork(meta_dir=path,
                             class_weights_exp=_cw([0, 2, 10, 13]),
                             height=32, frozen=True)
    frames = np.random.RandomState(0).randint(
        0, 256, (1, 32, 64, 3)).astype(np.float32)
    preds = client.predict_input(frames)
    assert preds.shape == (1, 32, 64)
    with pytest.raises(AssertionError):
        client.train_with_deque([], [], 1)


def test_missing_checkpoint_path_raises(tmp_path):
    """A mistyped checkpoint path must raise, never silently hand back a
    fresh synthetic init (that once scored a nonexistent "deployed"
    artifact at random-init accuracy in the learning gate).  Synthetic
    init is opt-in by the exact name "synthetic"."""
    with pytest.raises(FileNotFoundError):
        SemanticNetwork(meta_dir=str(tmp_path / "no_such_artifact"),
                        class_weights_exp=_cw([0]), height=32, frozen=True)


def test_predict_seq_matches_per_frame(net, tmp_path):
    """Batched client scoring (predict_with_metric_seq) returns the SAME
    per-frame numbers as frame-by-frame predict_with_metric — it exists
    purely to amortize dispatch latency (client.py batches one second of
    frames per call).  Frozen clients only (training-mode BN would couple
    frames through batch statistics — asserted).  Covers the pow2 padding
    path (n=3 -> cap 4)."""
    path = str(tmp_path / "seq_deployed")
    net.save_to_frozen_graph(path)
    client = SemanticNetwork(meta_dir=path,
                             class_weights_exp=_cw([0, 2, 10, 13]),
                             height=32, frozen=True)
    rng = np.random.RandomState(4)
    frames = rng.randint(0, 256, (3, 32, 64, 3)).astype(np.float32)
    gts = rng.randint(0, 19, (3, 32, 64)).astype(np.int32)
    labels_b, cms_b, mious_b, losses_b = client.predict_with_metric_seq(
        frames, gts)
    assert labels_b.shape == (3, 32, 64) and cms_b.shape[0] == 3
    for j in range(3):
        labels_1, cm_1, _iou, miou_1, loss_1 = client.predict_with_metric(
            frames[j:j + 1], gts[j:j + 1])
        np.testing.assert_array_equal(labels_b[j], labels_1[0])
        np.testing.assert_array_equal(cms_b[j], cm_1)
        np.testing.assert_allclose(losses_b[j], loss_1, rtol=1e-6)
        if np.isnan(miou_1):
            assert np.isnan(mious_b[j])
        else:
            np.testing.assert_allclose(mious_b[j], miou_1, rtol=1e-6)

    # training-mode graphs must refuse the batched path
    with pytest.raises(AssertionError, match="frozen"):
        net.predict_with_metric_seq(frames, gts)
