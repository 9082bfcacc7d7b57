"""LVS-style pipeline: 21-class VOC space with COCO-labelled ground truth
(Mask R-CNN teacher labels are precomputed files, README.md:48)."""

import numpy as np
import pytest

from ams_tpu import configs
from ams_tpu.data.video import load_gt_label, write_synthetic_clip
from ams_tpu.runtime.config import RunConfig, get_save_dir
from ams_tpu.runtime.modes import run_experiment


def test_coco_remap_in_label_loading(tmp_path):
    gt = str(tmp_path / "gt")
    vid = str(tmp_path / "92-lvs.mp4")
    # COCO ids: 1=person->15, 3=car->7, 0=bg->0
    write_synthetic_clip(vid, seconds=1, fps=2, size_hw=(32, 64), gt_dir=gt,
                         label_values=[0, 1, 3])
    lut = configs.coco_class_converter()
    label = load_gt_label(gt + "/", 0, coco_map=lut)
    assert set(np.unique(label)) <= {0, 7, 15}


@pytest.mark.slow
def test_lvs_end_to_end(tmp_path):
    vid = str(tmp_path / "92-lvs.mp4")
    gt = str(tmp_path / "gt") + "/"
    write_synthetic_clip(vid, seconds=8, fps=5, size_hw=(64, 128),
                         gt_dir=gt.rstrip("/"), label_values=[0, 1, 3])
    out = str(tmp_path / "out") + "/"
    cfg = RunConfig(input_video=vid, gt_video=gt, student_checkpoint="synthetic",
                    output_dir=out, memory_len=6, batch_size=2, iter=2,
                    height=64, lr=1e-3, send_period=5, train_period=2,
                    mode="early", early_cutoff_time=4)
    run_experiment(cfg)
    results = get_save_dir(cfg, "early4_f5_results")
    mious = np.load(results + "_mious.npy")
    assert mious.shape == (40,)
    # the 21-class student with subset {0,7,15} produced 3-class confusions
    cms = np.load(results + "_mioucats.npy")
    assert cms.shape[1:] == (3, 3)
