from ams_tpu.models.mobilenetv2_deeplab import (  # noqa: F401
    StudentConfig,
    init_student_params,
    preprocess,
    student_forward,
    student_logits,
)
