from video_vae_tpu.ops.rope import apply_rope, rope_tables  # noqa: F401
from video_vae_tpu.ops.ste import gumbel_sigmoid_sample, round_ste  # noqa: F401
from video_vae_tpu.ops.attention import masked_attention  # noqa: F401
