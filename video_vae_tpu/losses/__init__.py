from video_vae_tpu.losses.losses import (  # noqa: F401
    LossMetrics,
    discriminator_loss,
    generator_adversarial_loss,
    vae_loss,
)
from video_vae_tpu.losses.perceptual import make_perceptual_loss_fn  # noqa: F401
