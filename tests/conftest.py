"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests never require real TPU hardware; multi-chip sharding is validated on
CPU devices forced via XLA flags (must be set before jax import).
"""

import os

# HARD override: the environment pre-sets JAX_PLATFORMS=axon (the tunneled
# TPU) and a sitecustomize module imports+configures jax at interpreter
# startup, so env-var edits alone are ignored — jax.config must be updated
# too.  Tests always run on 8 virtual CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent compile cache: the student/teacher graphs take minutes to build
# on CPU; cached executables make test re-runs near-instant.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/ams_tpu_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The cache env vars above are ALSO latched by the sitecustomize import
# (same gotcha as JAX_PLATFORMS): without these config updates the cache
# dir is never created on a fresh host and every lane run recompiles every
# program (found round 5 — ~/.cache/ams_tpu_jax_cache missing after full
# lane runs on the new host).
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="session")
def student_parity_fixture():
    path = os.path.join(FIXTURE_DIR, "student_parity_h64.npz")
    if not os.path.exists(path):
        pytest.skip("parity fixture missing (run tools/make_parity_fixture.py)")
    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    params = {k[len("param:"):]: v for k, v in data.items()
              if k.startswith("param:")}
    return {
        "params": params,
        "frames": data["frames"],
        "labels": data["labels"],
        "logits_train_bn": data["logits_train_bn"],
    }


class TrainedRuns:
    """Session-shared expensive e2e fixtures (VERDICT r4 next #5).

    test_learning_gate.py, test_end_to_end.py (slow lane) and the delta/
    artifact probes all need "a bands clip + a trained early-mode run" —
    previously each module built its own (near-identical) clips and ran its
    own experiments, and on a 1-core host every extra run_experiment pays
    program compiles plus a 100-iteration round per train event.  This
    object builds each (clip, experiment) ON DEMAND and caches it for the
    whole session; the learning-gate margins and the artifact assertions
    consume the same runs.
    """

    CUTOFF = 6   # train events at [0 (empty -> skipped), 2, 4, 6]
    FPS = 5
    SECONDS = 16

    def __init__(self, root):
        self.root = root
        self._clip = None
        self._runs = {}

    @property
    def clip(self):
        """(video_path, gt_dir) — bands style: appearance<->class is a
        bijection, so online distillation genuinely learns it."""
        if self._clip is None:
            from ams_tpu.data.video import write_synthetic_clip
            vid = str(self.root / "90-drift.mp4")
            gt = str(self.root / "gt") + "/"
            write_synthetic_clip(vid, seconds=self.SECONDS, fps=self.FPS,
                                 size_hw=(64, 128), gt_dir=gt.rstrip("/"),
                                 style="bands")
            self._clip = (vid, gt)
        return self._clip

    def _cfg(self, out, mode, strategy, **kw):
        from ams_tpu.runtime.config import RunConfig
        vid, gt = self.clip
        os.makedirs(out, exist_ok=True)
        return RunConfig(input_video=vid, gt_video=gt,
                         student_checkpoint="synthetic", output_dir=out,
                         memory_len=10, batch_size=4, iter=100, height=64,
                         lr=1e-3, send_period=2, train_period=2, mode=mode,
                         early_cutoff_time=self.CUTOFF,
                         train_strategy=strategy, coord_fraction=0.1, **kw)

    def run(self, key):
        """-> (RunConfig, output_dir) for a named experiment, running it
        the first time it is asked for."""
        if key not in self._runs:
            from ams_tpu.runtime.modes import run_experiment
            mode, strategy, kw = {
                "pretrained": ("pretrained", "full_model", {}),
                "full_model": ("early", "full_model", {}),
                "coord_desc_auto": ("early", "coord_desc_auto",
                                    {"fold_deploy": False}),
                "coord_int8": ("early", "coord_desc_auto",
                               {"fold_deploy": False, "wire_dtype": "int8"}),
            }[key]
            out = str(self.root / ("run_" + key)) + "/"
            cfg = self._cfg(out, mode, strategy, **kw)
            run_experiment(cfg)
            self._runs[key] = (cfg, out)
        return self._runs[key]


@pytest.fixture(scope="session")
def trained_runs_session(tmp_path_factory):
    return TrainedRuns(tmp_path_factory.mktemp("ams_e2e_shared"))
