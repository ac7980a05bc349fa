"""Configuration system.

The reference repo configures runs through module-level ALL_CAPS constants and a
mutable ``hparams`` dict that is mutated mid-training — which silently retriggers
XLA compilation because the dict is traced by value
(/root/reference/train/rl_nonadversarial.py:36-57,325-326).

Here configuration splits into two kinds:

* **Static** dataclasses (hashable, frozen) — anything that legitimately changes
  the compiled program: model architecture, mesh shape, loss *variant* selection.
* **Dynamic** hyperparameters (:class:`DynamicHParams`) — a pytree of scalars that
  is an ordinary jit *input*, so schedules (compression-rate ramp, loss weights)
  change per-step with zero recompilation.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import struct


# ---------------------------------------------------------------------------
# Static configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ModelConfig:
    """Architecture of the VideoVAE.

    Defaults mirror the reference production config
    (/root/reference/train/rl_nonadversarial.py:234-236).
    """

    height: int = 256
    width: int = 256
    channels: int = 3
    patch_size: int = 16
    encoder_depth: int = 9
    decoder_depth: int = 12
    mlp_dim: int = 1536
    num_heads: int = 8
    qkv_features: int = 512
    max_temporal_len: int = 64
    spatial_compression_rate: int = 8
    unembedding_upsample_rate: int = 4

    # Frame-selection gate. "rl": Bernoulli policy with paired rollouts
    # (/root/reference/train/rl_model.py:136-142); "ste": Gumbel-sigmoid
    # straight-through gate (/root/reference/train/model.py:58,133);
    # "none": keep every frame (plain VAE).
    selection_mode: str = "rl"
    selection_logit_bias: float = 1.0
    gumbel_temperature: float = 1.0

    # UNet decoder head (/root/reference/train/model.py:87-88, unet.py:93-153).
    unet_base_features: int = 16
    unet_levels: int = 3
    temporal_kernel: int = 3
    # Activation layout inside the UNet: "cf" (channels-first end-to-end — no
    # per-conv layout transposes around the Pallas direct kernel) or "nhwc".
    # Parameters/checkpoints are identical either way.
    unet_layout: str = "cf"
    # Run the top (full-resolution) UpBlock phase-packed (space-to-depth):
    # the transpose-conv emits packed phases (no depth-to-space transpose)
    # and its two convs run at half spatial size with 4× channels. Identical
    # math (tested); cf-only. A/B on v5e: 37.3 vs 38.1 clips/s — the packed
    # 128-channel convs don't beat the unpacked 256² path, so default OFF.
    # See models/unet.py UpBlock3D._forward_s2d.
    unet_s2d_last: bool = False
    # Stay in phase-packed (space-to-depth) space through the WHOLE
    # full-resolution UNet level: the unpatchify emits packed features
    # directly (no 256² depth-to-space), the 7×7 patch-mixer and the level-0
    # DownBlock convs run at half spatial size with 4× channels (MXU-friendly
    # widths), the level-0 max-pool becomes a 4-way phase max (no 256²
    # reduce-window), the top UpBlock consumes the already-packed skip, and
    # the decoder exit fuses unpack+channels-last into ONE permutation of the
    # small 3-channel result. Identical math (tested); cf-only. Supersedes
    # unet_s2d_last (which packs only the top UpBlock and pays a skip pack).
    # A/B on v5e flagship forward (bf16 norm subtract in both arms):
    # 50.4 ms vs 52.9 ms — default ON.
    unet_s2d_full: bool = True

    # RoPE (/root/reference/train/layers.py:85-102).
    rope_max_len: int = 8192
    rope_base: float = 10000.0
    rope_alpha: float = 1.0

    # TPU policy.
    dtype: str = "bfloat16"
    param_dtype: str = "float32"
    remat: bool = True
    # Single-chip memory lever for "rl" training: run the decoder as a
    # checkpointed lax.scan over the rollout axis instead of one batched
    # (b·rollouts) pass. Decoder backward temps (the dominant 64-frame
    # allocations — PERF.md) halve from [2b,…] to [b,…] at the cost of
    # sequentializing the two rollouts. Identical math (decode is
    # deterministic per rollout; tested). Default off: on multi-chip meshes
    # data/fsdp sharding already splits the rollout batch, and single-chip
    # 16/32-frame buckets fit without it.
    scan_rollout_decode: bool = False
    # Attention backend: "xla" (jax.nn.dot_product_attention), "pallas"
    # (fused attention kernel), or "fused" (qk-norm + RoPE + attention in ONE
    # Pallas kernel straight off the QKV projection — ops/flash_attention.py).
    # "fused" measured fastest end-to-end on v5e (33.6 vs 33.2 clips/s,
    # VVT_ATTN_IMPL A/B via bench.py); it falls back to the identical-math
    # XLA chain off-TPU.
    attention_impl: str = "fused"

    def __post_init__(self):
        assert self.height % self.patch_size == 0 and self.width % self.patch_size == 0
        assert self.qkv_features % self.num_heads == 0
        assert self.selection_mode in ("rl", "ste", "none")
        assert self.attention_impl in ("xla", "pallas", "fused")
        assert self.unet_layout in ("nhwc", "cf")

    @property
    def grid_h(self) -> int:
        return self.height // self.patch_size

    @property
    def grid_w(self) -> int:
        return self.width // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_h * self.grid_w

    @property
    def embed_dim(self) -> int:
        """Token embedding width = p*p*c (patch pixels are the embedding)."""
        return self.channels * self.patch_size * self.patch_size

    @property
    def latent_dim(self) -> int:
        return self.embed_dim // self.spatial_compression_rate

    @property
    def head_dim(self) -> int:
        return self.qkv_features // self.num_heads

    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def params_dtype(self):
        return jnp.dtype(self.param_dtype)

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class LossConfig:
    """Loss *variant* selection (static); weights live in DynamicHParams.

    The reference ships two generations of the loss; both are supported:
    - selection_penalty: "square" (/root/reference/train/rl_nonadversarial.py:141)
      vs "abs" (/root/reference/claude_distributed/distributed_train.py:225-226).
    - rl_objective: "normalized_prod" — self-normalized product-of-probs trick
      (/root/reference/train/rl_nonadversarial.py:163-173) vs "log_prob" — sum of
      centered log-probs (/root/reference/claude_distributed/distributed_train.py:267-271).
    - kl_normalizer: "seq_len" divides by true sequence length
      (/root/reference/train/rl_nonadversarial.py:146) vs "kept_frames" which also
      masks by the selection mask (/root/reference/claude_distributed/distributed_train.py:228-230).
    Defaults follow the newest (distributed) generation per SURVEY.md §7.
    """

    selection_penalty: str = "abs"
    rl_objective: str = "log_prob"
    kl_normalizer: str = "kept_frames"
    use_perceptual: bool = True
    use_adversarial: bool = False
    # VGG feature-extractor layout: "cf" runs the perceptual convs
    # CHANNELS-FIRST through the Pallas direct-conv dispatch (one cheap
    # 3-channel transpose at entry, zero per-conv transposes — the round-2
    # nhwc-wrapper routing that transposed the 64-channel activations around
    # every call lost by 180 ms/step; this is the channels-first-native
    # variant models/vgg.py:71-75 scoped). "nhwc" = plain XLA convs.
    vgg_layout: str = "nhwc"
    # Max frames per VGG pass: larger batches lax.scan over chunks, bounding
    # the ~2 GB/64-frames of relu1_1/1_2 activations (the 64-frame curriculum
    # bucket OOM'd v5e HBM single-pass). 32 keeps the b1x16f train-step
    # workload (n = 2 rollouts x 16f) single-pass; larger buckets ceil-split,
    # padding the last chunk. 0 = never chunk.
    perceptual_chunk_frames: int = 32

    def __post_init__(self):
        assert self.selection_penalty in ("square", "abs")
        assert self.rl_objective in ("normalized_prod", "log_prob")
        assert self.kl_normalizer in ("seq_len", "kept_frames")
        assert self.vgg_layout in ("nhwc", "cf")

    def replace(self, **kw) -> "LossConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class OptimConfig:
    """Optimizer + LR schedule (/root/reference/train/rl_nonadversarial.py:241-251)."""

    learning_rate: float = 2e-5
    warmup_steps: int = 14142  # 20000 / sqrt(batch=2), reference default
    decay_steps: int = 1_000_000
    end_value_factor: float = 0.1
    clip_global_norm: float = 1.0
    b1: float = 0.9
    b2: float = 0.999

    def replace(self, **kw) -> "OptimConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh. axes: data (DP over batch), fsdp (param sharding), tensor (TP).

    The reference only ever builds a 1-D ('data',) mesh with fully replicated
    params (/root/reference/claude_distributed/distributed_train.py:107-109);
    fsdp/tensor generalize that without changing single-axis behavior
    (size-1 axes are no-ops under GSPMD).
    """

    data: int = -1  # -1: use all remaining devices
    fsdp: int = 1
    tensor: int = 1

    axis_names: Tuple[str, str, str] = ("data", "fsdp", "tensor")

    def replace(self, **kw) -> "MeshConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class DataConfig:
    """Video data pipeline (/root/reference/train/dataloader.py:359-419)."""

    base_dir: str = "/mnt/t9/videos"
    eval_dir: Optional[str] = None
    batch_size: int = 2
    max_frames: int = 32
    resize: Tuple[int, int] = (256, 256)
    crop_size: int = 512
    shuffle: bool = True
    num_workers: int = 4
    prefetch_size: int = 16
    drop_remainder: bool = True
    seed: int = 0
    # Reference behavior: a decode failure yields a zero video with an
    # all-ones mask (/root/reference/train/dataloader.py:235-239). Here that
    # poison-pill tolerance is an explicit choice.
    on_error: str = "zeros"  # "zeros" (reference parity) | "raise" | "skip" (resample)
    # Multi-host sampling: False (default) partitions every global batch across
    # processes exactly (grain ShardOptions semantics). True reproduces the
    # reference's scheme — each process samples *independently* from its full
    # dataset with a per-process seed
    # (/root/reference/claude_distributed/dataloader.py:363).
    independent_shards: bool = False
    # Use synthetic random clips instead of files (tests / benchmarks).
    synthetic: bool = False
    synthetic_num_clips: int = 64
    backend: str = "auto"  # "grain" | "threaded" | "native" | "auto"

    def replace(self, **kw) -> "DataConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class TrainConfig:
    """Training driver (/root/reference/train/rl_nonadversarial.py:36-57,283-295)."""

    num_epochs: int = 100
    seed: int = 3
    model_seed: int = 2
    # Curriculum: each epoch halves batch and doubles frames up to caps
    # (/root/reference/train/rl_nonadversarial.py:287-295).
    curriculum: bool = True
    curriculum_max_frames: int = 64
    curriculum_min_batch: int = 1
    # Density-penalty schedule: max_compression_rate 2 → 10000 after N steps
    # (/root/reference/train/rl_nonadversarial.py:55,325-326) — applied here as a
    # traced schedule, not a recompile.
    negative_penalty_training_steps: int = 2000
    initial_max_compression_rate: float = 2.0
    relaxed_max_compression_rate: float = 10000.0
    resume_max_compression_rate: float = 100000.0

    log_every: int = 50
    video_every: int = 500
    checkpoint_every_steps: int = 10_000
    checkpoint_dir: str = "checkpoints"
    video_save_dir: str = "outputs"
    # Donate model/optimizer state buffers to the jitted train step (in-place
    # param/moment updates — halves peak optimizer-state memory).
    donate_state: bool = True
    # jax.profiler xplane capture: trace steps [profile_start_step,
    # profile_start_step + profile_num_steps) into profile_dir.
    profile_dir: Optional[str] = None
    profile_start_step: int = 10
    profile_num_steps: int = 5
    # When set (gs://bucket/run), proc 0 mirrors video dumps and checkpoints
    # there via `gcloud storage cp` (parity:
    # /root/reference/claude_distributed/distributed_train.py:425-430,44-47).
    gcs_upload_prefix: Optional[str] = None

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class VAEConfig:
    """Top-level bundle."""

    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def replace(self, **kw) -> "VAEConfig":
        return dataclasses.replace(self, **kw)


def tiny_config(**model_overrides) -> VAEConfig:
    """A CPU-runnable config (BASELINE.json config 1 scale) used by tests.

    ``model_overrides`` replace the tiny defaults (e.g. the multichip dryrun
    bumps num_heads so the Megatron head split divides a tensor-only mesh).
    """
    kwargs = dict(
        height=32,
        width=32,
        channels=3,
        patch_size=8,
        encoder_depth=1,
        decoder_depth=1,
        mlp_dim=64,
        num_heads=2,
        qkv_features=32,
        max_temporal_len=8,
        spatial_compression_rate=4,
        unembedding_upsample_rate=2,
        unet_base_features=4,
        unet_levels=1,
        remat=False,
    )
    kwargs.update(model_overrides)
    model = ModelConfig(**kwargs)
    return VAEConfig(
        model=model,
        data=DataConfig(batch_size=2, max_frames=8, resize=(32, 32), synthetic=True),
        optim=OptimConfig(learning_rate=1e-3, warmup_steps=10, decay_steps=1000),
        loss=LossConfig(use_perceptual=False),
    )


# ---------------------------------------------------------------------------
# Dynamic (traced) hyperparameters
# ---------------------------------------------------------------------------


@struct.dataclass
class DynamicHParams:
    """Per-step scalars passed *into* the jitted step — never a recompile.

    Mirrors the reference ``hparams`` dict
    (/root/reference/train/rl_nonadversarial.py:255-263).
    """

    gamma_selection: jnp.ndarray  # GAMMA1 = 0.2
    gamma_kl: jnp.ndarray  # GAMMA2 = 1e-3
    gamma_perceptual: jnp.ndarray  # GAMMA3 = 0.1
    gamma_mae: jnp.ndarray  # GAMMA4 = 0.05
    rl_loss_weight: jnp.ndarray  # 0.01
    max_compression_rate: jnp.ndarray  # 2 → 10000 schedule
    magnify_negatives_rate: jnp.ndarray  # 100

    @classmethod
    def default(
        cls,
        gamma_selection: float = 0.2,
        gamma_kl: float = 1e-3,
        gamma_perceptual: float = 0.1,
        gamma_mae: float = 0.05,
        rl_loss_weight: float = 0.01,
        max_compression_rate: float = 2.0,
        magnify_negatives_rate: float = 100.0,
    ) -> "DynamicHParams":
        f32 = lambda v: jnp.asarray(v, jnp.float32)  # noqa: E731
        return cls(
            gamma_selection=f32(gamma_selection),
            gamma_kl=f32(gamma_kl),
            gamma_perceptual=f32(gamma_perceptual),
            gamma_mae=f32(gamma_mae),
            rl_loss_weight=f32(rl_loss_weight),
            max_compression_rate=f32(max_compression_rate),
            magnify_negatives_rate=f32(magnify_negatives_rate),
        )

    def with_compression_rate(self, rate) -> "DynamicHParams":
        return self.replace(max_compression_rate=jnp.asarray(rate, jnp.float32))
