from ams_tpu.utils.metrics import (  # noqa: F401
    calculate_miou,
    confusion_matrix,
    string_class_iou,
)
from ams_tpu.utils.colormap import colormap  # noqa: F401
