"""Flag -> RunConfig plumbing of the experiment CLI (cli/run.py).

The reference's flags live in run.py:18-75; ours must map them — plus the
extensions (resume, conv_precision, stats_annex) — onto RunConfig without
running an experiment.  Parser-level only: the modes themselves are
exercised by test_end_to_end.py.
"""

from cli.run import build_parser, config_from_args

BASE = ["--input_video", "v.mp4", "--gt_video", "gt", "--student_checkpoint",
        "ckpt", "--output_dir", "out", "--mode", "simple"]


def _cfg(extra=()):
    return config_from_args(build_parser().parse_args(BASE + list(extra)))


def test_defaults_match_reference():
    cfg = _cfg()
    assert cfg.memory_len == 250 and cfg.batch_size == 10
    assert cfg.iter == 200 and cfg.height == 256
    assert cfg.send_period == 30 and cfg.train_period == 10
    assert cfg.train_strategy == "full_model"  # reference run.py:49
    assert cfg.coord_fraction == 0.1
    assert not cfg.compress_uplink and not cfg.no_restore
    # extensions' defaults: annex on (real delta consumers need the BN
    # stats), per-event resume bundles on
    assert cfg.stats_annex is True
    assert cfg.resume_every_event is True


def test_stats_annex_flag_restores_reference_wire():
    assert _cfg(["--no_stats_annex"]).stats_annex is False


def test_resume_and_precision_flags():
    cfg = _cfg(["--resume", "--no_resume_state",
                "--conv_precision", "highest",
                "--compute_dtype", "bfloat16"])
    assert cfg.resume is True
    assert cfg.resume_every_event is False
    assert cfg.conv_precision == "highest"
    assert cfg.compute_dtype == "bfloat16"


def test_coord_fraction_choices_parse_to_float():
    assert _cfg(["--coord_fraction", "0.05"]).coord_fraction == 0.05


def test_wire_dtype_flag():
    assert _cfg().wire_dtype == "float16"  # reference wire by default
    assert _cfg(["--wire_dtype", "int8"]).wire_dtype == "int8"
