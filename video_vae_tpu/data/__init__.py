from video_vae_tpu.data.video_io import load_video, write_video  # noqa: F401
from video_vae_tpu.data.source import (  # noqa: F401
    SyntheticVideoSource,
    VideoFileSource,
    list_video_files,
)
from video_vae_tpu.data.pipeline import create_dataloader  # noqa: F401
