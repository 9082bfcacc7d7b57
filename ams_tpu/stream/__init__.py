from ams_tpu.stream.codec import (  # noqa: F401
    decode_delta,
    encode_delta,
    apply_delta,
)
from ams_tpu.stream.controllers import ASRController, ATRController  # noqa: F401
