"""Multi-video server: concurrent rounds over the virtual device mesh."""

import numpy as np
import pytest

import jax

from ams_tpu.runtime.multi_server import MultiVideoServer
from ams_tpu.stream.codec import decode_delta


pytestmark = pytest.mark.slow  # e2e: run with -m slow


@pytest.fixture(scope="module")

def server():
    n = min(4, len(jax.devices()))
    from ams_tpu.parallel.mesh import make_mesh
    srv = MultiVideoServer(video_ids=[25, 22, 12, 17][:n], height=32,
                           batch_size=2, lr=1e-3,
                           strategy="coord_desc_auto", coord_frac=0.1,
                           memory_capacity=4, mesh=make_mesh(n))
    rng = np.random.RandomState(0)
    for v in range(srv.V):
        frames = [rng.randint(0, 256, (32, 64, 3)).astype(np.uint8)
                  for _ in range(3)]
        labels = [rng.randint(0, 19, (32, 64)).astype(np.uint8)
                  for _ in range(3)]
        srv.ingest(v, frames, labels)
    return srv


def test_concurrent_round(server):
    losses = server.train_round(iters=2)
    assert losses.shape == (server.V, 2)
    assert np.isfinite(losses).all()
    # videos trained independently: params diverge across the V axis
    w = np.asarray(server.params_V["logits/semantic/weights"])
    assert not np.allclose(w[0], w[1])


def test_per_video_delta(server):
    blob = server.encode_delta(0)
    assert len(blob) > 100
    shapes = {k: v.shape for k, v in server.video_params(0).items()}
    masks, values = decode_delta(blob, shapes, strategy="coord_desc_auto")
    total = sum(m.size for m in masks.values())
    sel = sum(int(m.sum()) for m in masks.values())
    assert 0.05 < sel / total < 0.15


def test_restore_initial_single_video(server):
    server.train_round(iters=1)
    before = server.video_params(1)
    server.restore_initial(video_idx=0)
    after0 = server.video_params(0)
    init = {k: np.asarray(v[0]) for k, v in server._initial_V.items()}
    for k in ("logits/semantic/weights", "aspp0/weights"):
        np.testing.assert_array_equal(after0[k], init[k])
    # video 1 untouched
    np.testing.assert_array_equal(server.video_params(1)[
        "logits/semantic/weights"], before["logits/semantic/weights"])


def test_deploy(server, tmp_path):
    path = str(tmp_path / "client0")
    server.deploy(0, path)
    import os
    assert os.path.exists(path + ".npz")


def test_more_videos_than_devices():
    """Local shards > 1 video: every video trains (none silently dropped)."""
    from ams_tpu.parallel.mesh import make_mesh
    n_dev = 2
    srv = MultiVideoServer(video_ids=[25, 22, 12, 17], height=32,
                           batch_size=2, lr=1e-2, strategy="full_model",
                           memory_capacity=4, mesh=make_mesh(n_dev))
    assert srv.videos_per_device == 2
    rng = np.random.RandomState(0)
    for v in range(4):
        srv.ingest(v, [rng.randint(0, 256, (32, 64, 3)).astype(np.uint8)
                       for _ in range(2)],
                   [rng.randint(0, 19, (32, 64)).astype(np.uint8)
                    for _ in range(2)])
    before = [srv.video_params(v)["logits/semantic/weights"]
              for v in range(4)]
    losses = srv.train_round(iters=1)
    assert losses.shape == (4, 1)
    for v in range(4):
        after = srv.video_params(v)["logits/semantic/weights"]
        assert not np.array_equal(after, before[v]), f"video {v} not trained"


def test_keep_mask_reuses_selection(server):
    server.train_round(iters=2)             # reselect at iter 0
    mask_before = {k: np.asarray(v) for k, v in server.mask_V.items()}
    server.train_round(iters=1, keep_mask=True)
    for k, v in server.mask_V.items():
        np.testing.assert_array_equal(np.asarray(v), mask_before[k])


def test_video_count_must_divide_mesh():
    from ams_tpu.parallel.mesh import make_mesh
    with pytest.raises(AssertionError):
        MultiVideoServer(video_ids=[25, 22, 12], height=32, batch_size=2,
                         lr=1e-3, memory_capacity=4, mesh=make_mesh(2))


def test_different_class_subsets_per_video():
    """Videos with DIFFERENT class subsets train with their own loss
    support (per-video class masks over the union) and their delta
    payloads decode correctly."""
    from ams_tpu.parallel.mesh import make_mesh
    from ams_tpu import configs

    srv = MultiVideoServer(video_ids=[25, 17], height=32, batch_size=2,
                           lr=1e-2, strategy="coord_desc_auto",
                           coord_frac=0.1, memory_capacity=4,
                           mesh=make_mesh(2))
    # 25 -> {0,1,2,10,11,13}, 17 -> {0,2,8,10,11,13}: union has 7 classes
    assert len(srv.class_indices) == 7
    cm = np.asarray(srv.class_mask_V)
    assert cm.shape == (2, 7)
    assert not np.array_equal(cm[0], cm[1])
    for v, vid in enumerate(srv.video_ids):
        sub = set(configs.class_indices(vid).tolist())
        got = {c for c, m in zip(srv.class_indices, cm[v]) if m > 0}
        assert got == sub

    rng = np.random.RandomState(0)
    for v in range(2):
        srv.ingest(v, [rng.randint(0, 256, (32, 64, 3)).astype(np.uint8)
                       for _ in range(3)],
                   [rng.randint(0, 19, (32, 64)).astype(np.uint8)
                    for _ in range(3)])
    losses = srv.train_round(iters=2, no_restore=False)
    assert losses.shape == (2, 2)
    assert np.isfinite(losses).all()

    for v in range(2):
        blob = srv.encode_delta(v)
        shapes = {k: val.shape for k, val in srv.video_params(v).items()}
        masks, values = decode_delta(blob, shapes,
                                     strategy="coord_desc_auto")
        total = sum(m.size for m in masks.values())
        sel = sum(int(m.sum()) for m in masks.values())
        assert 0.05 < sel / total < 0.15


def test_multi_video_resume_roundtrip(tmp_path):
    """save_state/load_state restores params, slots, masks and memories so
    a fresh server continues identically."""
    from ams_tpu.parallel.mesh import make_mesh

    def mk():
        return MultiVideoServer(video_ids=[25, 17], height=32, batch_size=2,
                                lr=1e-2, strategy="coord_desc_auto",
                                coord_frac=0.1, memory_capacity=4,
                                mesh=make_mesh(2))

    rng = np.random.RandomState(0)
    srv = mk()
    for v in range(2):
        srv.ingest(v, [rng.randint(0, 256, (32, 64, 3)).astype(np.uint8)
                       for _ in range(2)],
                   [rng.randint(0, 19, (32, 64)).astype(np.uint8)
                    for _ in range(2)])
    srv.train_round(iters=1)
    prefix = str(tmp_path / "mv")
    srv.save_state(prefix)
    l1 = srv.train_round(iters=1, keep_mask=True)

    srv2 = mk()
    assert srv2.load_state(prefix)
    for k in srv.mask_V:
        np.testing.assert_array_equal(np.asarray(srv2.mask_V[k]),
                                      np.asarray(srv.mask_V[k]))
    l2 = srv2.train_round(iters=1, keep_mask=True)
    np.testing.assert_allclose(l1, l2, rtol=1e-5)


def test_empty_memory_refuses_round():
    """The joint round cannot skip one video, so an empty frame memory
    must refuse loudly — sampling it would train every iteration on
    zero-padded frames with label 0 and ship the drifted model."""
    from ams_tpu.parallel.mesh import make_mesh

    srv = MultiVideoServer(video_ids=[25, 17], height=32, batch_size=2,
                           lr=1e-2, strategy="full_model",
                           memory_capacity=4, mesh=make_mesh(2))
    rng = np.random.RandomState(0)
    srv.ingest(0, [rng.randint(0, 256, (32, 64, 3)).astype(np.uint8)],
               [rng.randint(0, 19, (32, 64)).astype(np.uint8)])
    with pytest.raises(ValueError, match=r"\[1\]"):
        srv.train_round(iters=1)


def test_fixed_coord_strategy_builds_masks():
    """Non-auto coord strategies must train their recipe's subset, not the
    full model: the masks are built at construction (like the single-video
    loop) and unmasked trainables stay bitwise unchanged by a round."""
    from ams_tpu.parallel.mesh import make_mesh

    srv = MultiVideoServer(video_ids=[25, 17], height=32, batch_size=2,
                           lr=1e-2, strategy="coord_desc_last",
                           coord_frac=0.1, memory_capacity=4,
                           mesh=make_mesh(2))
    total = sum(int(np.asarray(v[0]).size) for v in srv.mask_V.values())
    sel = sum(int(np.asarray(v[0]).sum()) for v in srv.mask_V.values())
    assert 0.05 < sel / total < 0.15, "mask does not match the 10% recipe"

    rng = np.random.RandomState(0)
    for v in range(2):
        srv.ingest(v, [rng.randint(0, 256, (32, 64, 3)).astype(np.uint8)
                       for _ in range(2)],
                   [rng.randint(0, 19, (32, 64)).astype(np.uint8)
                    for _ in range(2)])
    before = {k: np.asarray(v) for k, v in srv.params_V.items()}
    srv.train_round(iters=2)
    changed_unmasked = 0
    for k, m in srv.mask_V.items():
        after = np.asarray(srv.params_V[k])
        um = ~np.asarray(m, bool)
        changed_unmasked += int(
            (before[k][um] != after[um]).sum())
    assert changed_unmasked == 0, "unmasked coords moved"


def test_coord_delta_ships_stats_annex(server):
    """Coord deltas append the BN moving-stats annex like the other delta
    producers: without it a consumer runs new weights against stale
    normalizers (stream/codec.py STATS_MAGIC)."""
    server.train_round(iters=1)
    blob = server.encode_delta(0)
    params0 = server.video_params(0)
    shapes = {k: v.shape for k, v in params0.items()}
    masks, values = decode_delta(blob, shapes, strategy="coord_desc_auto")
    stat = "MobilenetV2/Conv/BatchNorm/moving_mean"
    assert stat in masks and masks[stat].all(), "stats annex missing"
    np.testing.assert_array_equal(
        values[stat], params0[stat].astype(np.float16).astype(np.float32))
    # and opting out restores the reference wire (no annex)
    masks2, _ = decode_delta(server.encode_delta(0, stats_annex=False),
                             shapes, strategy="coord_desc_auto")
    assert stat not in masks2
