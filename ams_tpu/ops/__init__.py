from ams_tpu.ops.fused_resize_argmax import fused_resize_argmax  # noqa: F401
