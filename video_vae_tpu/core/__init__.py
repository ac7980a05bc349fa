from video_vae_tpu.core.config import (  # noqa: F401
    DataConfig,
    LossConfig,
    MeshConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
    VAEConfig,
    DynamicHParams,
)
