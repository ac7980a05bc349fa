from video_vae_tpu.models.layers import (  # noqa: F401
    Attention,
    FactoredAttention,
    MLP,
    PatchEmbedding,
    PatchUnEmbedding,
)
from video_vae_tpu.models.unet import UNet3D  # noqa: F401
from video_vae_tpu.models.vae import Decoder, Encoder, VAEOutput, VideoVAE  # noqa: F401
