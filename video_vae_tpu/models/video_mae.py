"""VideoMAE-style masked-autoencoding pretraining family.

The reference only *probes* a pretrained KerasCV VideoMAE backbone
(/root/reference/train/video_mae.py:3-32 — load, one forward, never integrated).
BASELINE.json lists "video-MAE masked-pretraining variant at 224×224×16" as a
target config, so this framework provides a real, trainable implementation
built from the same factored space/time blocks as the VAE:

* tube masking: a per-clip random subset of (time, patch) token positions is
  dropped; kept tokens keep their positions via RoPE inside the factored
  blocks, dropped ones are replaced by a learned [MASK] token at the decoder.
* encoder runs on the full token grid with mask tokens substituted (factored
  attention needs the rectangular (t, hw) grid — the classic "encoder sees
  only visible tokens" trick would break the axial factorization; substituting
  mask tokens keeps the MXU-friendly dense layout and is how axial MAE variants
  handle it).
* loss: MSE on the *masked* positions only, normalized per-patch.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import nnx, struct

from video_vae_tpu.core.config import ModelConfig
from video_vae_tpu.models.layers import PatchEmbedding
from video_vae_tpu.models.vae import _block_stack, frame_mask_to_attention


@struct.dataclass
class MAEOutput:
    prediction: jnp.ndarray  # (b, t, hw, p²c) predicted patch pixels
    target: jnp.ndarray  # (b, t, hw, p²c) true patch pixels
    token_mask: jnp.ndarray  # (b, t, hw) 1 = masked (to be reconstructed)


class VideoMAE(nnx.Module):
    """Masked video autoencoder over the factored space/time backbone."""

    def __init__(
        self,
        cfg: ModelConfig,
        rngs: nnx.Rngs,
        *,
        mask_ratio: float = 0.9,
        decoder_depth: Optional[int] = None,
    ):
        dtype, pdtype = cfg.compute_dtype(), cfg.params_dtype()
        self.cfg = cfg
        self.mask_ratio = mask_ratio
        self.patch_embedding = PatchEmbedding(
            cfg.channels, cfg.patch_size, rngs, dtype=dtype, param_dtype=pdtype
        )
        self.encoder_layers = _block_stack(cfg, cfg.encoder_depth, rngs)
        self.decoder_layers = _block_stack(
            cfg, decoder_depth if decoder_depth is not None else max(1, cfg.decoder_depth // 3), rngs
        )
        key = rngs.sampling()
        self.mask_token = nnx.Param(jax.random.normal(key, (1, 1, 1, cfg.embed_dim)) * 0.02)
        self.prediction_head = nnx.Linear(
            cfg.embed_dim, cfg.embed_dim, dtype=dtype, param_dtype=pdtype, rngs=rngs
        )

    def _patch_targets(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.cfg.patch_size
        return rearrange(x, "b t (h p1) (w p2) c -> b t (h w) (p1 p2 c)", p1=p, p2=p)

    def __call__(
        self,
        x: jnp.ndarray,
        frame_mask: Optional[jnp.ndarray],
        rngs: nnx.Rngs,
        train: bool = True,
    ) -> MAEOutput:
        b, t = x.shape[0], x.shape[1]
        hw = self.cfg.num_patches
        attn_mask = frame_mask_to_attention(frame_mask) if frame_mask is not None else None

        target = self._patch_targets(x).astype(jnp.float32)
        tokens = self.patch_embedding(x)

        if train:
            token_mask = jax.random.bernoulli(
                rngs.sampling(), self.mask_ratio, (b, t, hw)
            ).astype(tokens.dtype)
        else:
            token_mask = jnp.zeros((b, t, hw), tokens.dtype)
        mt = self.mask_token.value.astype(tokens.dtype)
        tokens = tokens * (1.0 - token_mask[..., None]) + mt * token_mask[..., None]

        for layer in self.encoder_layers:
            tokens = layer(tokens, attn_mask)
        for layer in self.decoder_layers:
            tokens = layer(tokens, attn_mask)
        prediction = self.prediction_head(tokens).astype(jnp.float32)
        return MAEOutput(prediction=prediction, target=target, token_mask=token_mask)


def mae_loss(
    out: MAEOutput, frame_mask: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, dict]:
    """MSE over masked tokens only (per-patch mean, masked-count normalized)."""
    err = jnp.square(out.prediction - out.target)  # (b, t, hw, p²c)
    weight = out.token_mask.astype(jnp.float32)
    if frame_mask is not None:
        weight = weight * frame_mask.astype(jnp.float32)[:, :, None]
    weighted = err * weight[..., None]
    denom = jnp.maximum(jnp.sum(weight) * err.shape[-1], 1.0)
    loss = jnp.sum(weighted) / denom
    full_mse = jnp.mean(err)
    return loss, {"loss": loss, "masked_mse": loss, "full_mse": full_mse}
