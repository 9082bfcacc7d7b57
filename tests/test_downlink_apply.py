"""Server->client delta streaming round trip: train, encode, apply on a
frozen client, predictions converge to the server's."""

import numpy as np
import pytest

from ams_tpu.runtime.network import SemanticNetwork
from ams_tpu.stream.codec import encode_delta
from ams_tpu.models.var_order import TRAINABLE_ORDER



pytestmark = pytest.mark.slow  # e2e: run with -m slow

def _cw(idx, n=19):
    w = np.zeros((n, 1), np.float32)
    w[list(idx)] = 1
    return w


def test_delta_stream_roundtrip(tmp_path):
    cw = _cw([0, 2, 13])
    server = SemanticNetwork(meta_dir="synthetic", class_weights_exp=cw,
                             height=32, scale=[1], mini_batch_size=2,
                             lr=1e-2, coord_frac=0.1, seed=3)
    # client starts from the same pretrained deployment
    # the delta-consuming client keeps RAW weights (deltas are keyed on raw
    # variable names); folded artifacts are for the whole-model deploy path
    server.save_to_frozen_graph(str(tmp_path / "initial"), fold=False)
    client = SemanticNetwork(meta_dir=str(tmp_path / "initial"),
                             class_weights_exp=cw, height=32, frozen=True,
                             seed=3)

    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 256, (32, 64, 3)).astype(np.uint8)
              for _ in range(3)]
    labels = [rng.randint(0, 19, (32, 64)).astype(np.uint8) for _ in range(3)]
    server.train_with_deque(frames, labels, 3, "coord_desc_auto")

    blob = encode_delta(dict(zip(TRAINABLE_ORDER, server.train_params)),
                        dict(zip(TRAINABLE_ORDER, server.curr_mask)),
                        strategy="coord_desc_auto")
    client.apply_downlink(blob, strategy="coord_desc_auto")

    srv, cli = server.get_vars(), client.get_vars()
    for k in ("logits/semantic/weights", "concat_projection/weights"):
        mask_pos = srv[k] != np.asarray(server._initial_params[k])
        if mask_pos.any():
            # updated entries match to fp16 precision
            np.testing.assert_allclose(cli[k][mask_pos], srv[k][mask_pos],
                                       rtol=2e-3, atol=2e-3)
    # moving stats were NOT in the coord payload: client keeps its own
    k = "MobilenetV2/Conv/BatchNorm/moving_mean"
    np.testing.assert_array_equal(cli[k],
                                  np.asarray(server._initial_params[k]))
