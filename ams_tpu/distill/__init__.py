from ams_tpu.distill.loss import distill_loss  # noqa: F401
from ams_tpu.distill.optimizer import adam_init, adam_apply  # noqa: F401
from ams_tpu.distill.train_step import (  # noqa: F401
    DistillSpec,
    make_distill_round,
    make_predict_fn,
)
from ams_tpu.distill.strategies import build_mask  # noqa: F401
