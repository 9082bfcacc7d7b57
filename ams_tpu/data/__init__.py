from ams_tpu.data.buffers import FrameMemory, choose_frames, mini_batch  # noqa: F401
from ams_tpu.data.video import VideoReader, open_video  # noqa: F401
