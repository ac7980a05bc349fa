"""video_vae_tpu — a TPU-native JAX framework for adaptive-temporal-compression video VAEs.

A from-scratch rebuild of the capabilities of floatingtrees/video-VAE (see SURVEY.md)
as a single layered framework:

- ``core``     — config dataclasses, dtype policy, dynamic (traced) hyperparameters.
- ``parallel`` — device mesh construction, param/batch sharding rules, logical axis
                 constraints (DP / FSDP / TP / sequence-parallel over one API).
- ``ops``      — functional compute primitives (RoPE, STE gates, masked attention,
                 Pallas TPU kernels with XLA fallbacks).
- ``models``   — nnx modules: factored space/time transformer encoder/decoder,
                 3D-conv UNet, discriminator, VGG16 feature extractor.
- ``losses``   — masked reconstruction, KL, selection-density, REINFORCE, GAN,
                 perceptual losses; composable into a single training objective.
- ``data``     — streaming video→tensor pipeline (grain or threaded), mp4 writer,
                 synthetic sources for tests/benchmarks.
- ``train``    — jitted step functions, Trainer (curriculum, metrics, SIGTERM-safe
                 Orbax checkpointing), schedules.
"""

__version__ = "0.1.0"

from video_vae_tpu.core.config import (  # noqa: F401
    DataConfig,
    LossConfig,
    MeshConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
    VAEConfig,
)
