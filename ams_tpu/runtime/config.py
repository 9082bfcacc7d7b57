"""Experiment configuration (the reference's tf.app.flags surface,
run.py:18-69, as a dataclass)."""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class RunConfig:
    input_video: str = ""
    gt_video: str = ""                 # directory of gt_%06d.png labels
    student_checkpoint: str = ""
    output_dir: str = ""

    initial_fill: bool = False         # don't train until memory is full
    memory_len: int = 250              # seconds of frame memory
    batch_size: int = 10
    iter: int = 200
    height: int = 256
    lr: float = 1e-3

    send_period: int = 30              # seconds between sample arrivals
    train_period: int = 10             # training cadence grid (seconds)

    only_results: bool = False
    compress_uplink: bool = False
    uplink_bw: float = 1000.0          # kbps budget for the H.264 uplink
    no_restore: bool = False
    save_pic: bool = False

    enable_ASR: bool = False
    enable_ATR: bool = False

    train_strategy: str = "full_model"
    coord_fraction: float = 0.1

    mode: str = "simple"               # simple | pretrained | horizon | early
    early_cutoff_time: int = 60
    # Horizon-study grid (reference hardcodes these, run.py:612-615);
    # configurable here so short clips can be profiled too.
    horizon_k1s: tuple = (16, 32, 64, 128, 256, 512)
    horizon_k2s: tuple = (16, 32, 64, 128, 256)
    horizon_points: int = 3

    compute_dtype: str = "float32"     # "bfloat16" = fast TPU path
    conv_precision: str = "auto"       # auto|default|highest (see DistillSpec)
    fold_deploy: bool = True           # BN-fold the deployed client artifact
    # (trim_graph_frozen analog); False keeps the raw bit-parity form
    resume: bool = False               # continue from the last saved event
    resume_every_event: bool = True    # persist a resume bundle per event
    stats_annex: bool = True           # append BN moving stats to coord
    # deltas (wire extension; see stream/codec.py STATS_MAGIC).  The
    # reference's coord payload omits them, so its wire cannot reconstruct
    # the deployed model.  False restores byte-identical reference
    # payloads (and the reference's bug).
    wire_dtype: str = "float16"        # delta values section: "float16"
    # (reference wire, run.py:330), "int8" (opt-in extension: per-var
    # symmetric quantization, ~2x smaller payloads — downlink bandwidth is
    # AMS's headline cost) or "int8d" (int8 over value-minus-INITIAL:
    # ~15% smaller again and ~7x finer reconstruction on a measured round,
    # tools/probe_int8_delta.py; restore-mode sessions only — both ends
    # hold the initial snapshot as the quantization base).  Affects the accounted *_bw_downlink bits and
    # the *_mask.dat.gz artifacts; like the reference's fp16 accounting,
    # the emulation's deployed client keeps exact params (a real consumer
    # sees the quantization — exercised in runtime/live.py, which
    # negotiates this dtype in the hello).
    trace_dir: str = ""                # JAX profiler trace output (xprof)

    def validate(self):
        assert self.wire_dtype in ("float16", "int8", "int8d"), \
            self.wire_dtype
        assert not (self.wire_dtype == "int8d" and self.no_restore), \
            "wire_dtype 'int8d' quantizes value-minus-initial: it " \
            "requires restore-mode training (drop --no_restore)"
        assert not self.enable_ATR or self.enable_ASR, \
            "ASR must be enabled for ATR to work"
        assert not self.enable_ASR or self.mode == "simple", \
            "ASR can only be used in simple mode"
        assert not self.enable_ATR or self.mode == "simple", \
            "ATR can only be used in simple mode"
        return self

    @property
    def size(self):
        return [self.height, self.height * 2]


def get_save_dir(cfg: RunConfig, prepend: str) -> str:
    """Experiment-unique artifact prefix (reference run.py:563-573)."""
    video = cfg.input_video.split("/")[-1]
    ckpt_tag = (cfg.student_checkpoint.split("/")[-2]
                if "/" in cfg.student_checkpoint else cfg.student_checkpoint)
    return cfg.output_dir + "%s_%s_%s_%d" % (prepend, video, ckpt_tag,
                                             cfg.height)


def print_process(msg: str, curr_time) -> None:
    try:
        from termcolor import colored
        prefix = colored("Process [current time: %d]: " % curr_time, "cyan")
    except Exception:
        prefix = "Process [current time: %d]: " % curr_time
    print(prefix, msg)
