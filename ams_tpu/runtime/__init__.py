from ams_tpu.runtime.network import SemanticNetwork  # noqa: F401
