"""AMS-TPU: a TPU-native rebuild of Adaptive Model Streaming (AMS).

AMS (Khani et al., ICCV 2021) performs real-time video semantic segmentation on
edge devices via online knowledge distillation: a lightweight student
(DeeplabV3 + MobileNetV2) runs on the edge while a server continuously
fine-tunes a copy against a heavyweight teacher on sampled video frames and
streams back a small delta of the parameters.

This package re-implements the complete system TPU-first on JAX/XLA/Pallas:

- ``ams_tpu.models``   — functional student/teacher networks (replaces the TF1
  ``.meta`` graphs the reference loads via ``import_meta_graph``).
- ``ams_tpu.distill``  — the online-distillation train step: a single jitted
  ``lax.scan`` over a whole round (replaces the reference's session + FIFO
  queue + 3-thread pipeline, reference ``SemanticNetwork.py:215-300``).
- ``ams_tpu.stream``   — model-delta wire codec, uplink emulation, and the
  ASR/ATR adaptive controllers (reference ``run.py:195-336``).
- ``ams_tpu.data``     — video IO, frame/label memory, samplers.
- ``ams_tpu.runtime``  — the server/client emulation loops and the
  ``SemanticNetwork``-compatible facade (reference ``run.py``,
  ``SemanticNetwork.py``).
- ``ams_tpu.parallel`` — device-mesh sharding for multi-video server
  fine-tuning and batched teacher labeling (the reference has no multi-device
  story; this is the TPU-native equivalent).
- ``ams_tpu.utils``    — metrics, colormaps, checkpoint IO, config registry.
"""

__version__ = "0.1.0"
