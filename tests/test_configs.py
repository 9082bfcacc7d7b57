"""Experiment registry parity with reference exp_configs.py."""

import numpy as np
import pytest

from ams_tpu import configs


def test_num_classes():
    assert configs.num_classes(25) == 19
    assert configs.num_classes(26) == 21
    with pytest.raises(ValueError):
        configs.num_classes(99)


def test_class_weights_shapes_and_values():
    w = configs.class_weights(25)  # Cityscapes-Frankfurt
    assert w.shape == (19, 1)
    np.testing.assert_array_equal(np.where(w.reshape(-1) == 1)[0],
                                  [0, 1, 2, 10, 11, 13])
    w = configs.class_weights(40)
    assert w.shape == (21, 1)
    np.testing.assert_array_equal(np.where(w.reshape(-1) == 1)[0],
                                  [0, 7, 12, 15])


def test_test_lengths():
    assert configs.test_length(25) == 2790
    assert configs.test_length(12) == 900
    assert configs.test_length(47) == 1780
    assert configs.test_length(45) == 500


def test_is_coco():
    assert configs.is_coco(26)
    assert not configs.is_coco(25)


def test_coco_class_converter():
    lut = configs.coco_class_converter()
    assert lut.shape == (81,)
    # reference exp_configs.py:325-334
    assert lut[1] == 15 and lut[2] == 2 and lut[3] == 7
    assert lut[15] == 3 and lut[17] == 12 and lut[18] == 13
    assert lut[0] == 0 and lut[80] == 0


def test_video_exp_num():
    assert configs.video_exp_num("/data/videos/25-frankfurt.mp4") == 25
