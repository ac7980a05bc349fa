"""VideoVAE: factored space/time transformer VAE with learned frame selection.

Single-source model covering both reference variants through
``ModelConfig.selection_mode``:

* ``"rl"``  — Bernoulli frame-selection policy with paired rollouts (the batch is
  duplicated 2× and two independent selection masks are sampled), parity with
  /root/reference/train/rl_model.py:101-147.
* ``"ste"`` — Gumbel-sigmoid straight-through gate, parity with
  /root/reference/train/model.py:101-136.
* ``"none"`` — keep every frame (plain VAE ablation).

API differences from the reference (deliberate):
- Callers pass a single (b, t) frame mask; all internal mask shapes
  ((b,1,1,t) attention masks, (b·hw,1,1,t) expansions) are derived inside the
  model. The reference requires three different caller-built mask layouts
  (/root/reference/train/rl_nonadversarial.py:190-192 vs
  /root/reference/claude_distributed/distributed_train.py:292).
- ``encode``/``decode`` are public for the latent-cache and eval paths; the
  reference only exposes the fused training ``__call__`` (SURVEY.md §3.3).
- Outputs are a named struct, not a positionally-overloaded 5/6-tuple.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from einops import rearrange, repeat
from flax import nnx, struct

from video_vae_tpu.core.config import ModelConfig
from video_vae_tpu.models.layers import FactoredAttention, PatchEmbedding, PatchUnEmbedding
from video_vae_tpu.models.unet import UNet3D
from video_vae_tpu.ops.ste import gumbel_sigmoid_sample
from video_vae_tpu.parallel.sharding import constrain

NUM_ROLLOUTS = 2  # paired rollouts for the RL advantage (rl_model.py:136-142)


@struct.dataclass
class VAEOutput:
    """All tensors are at batch size b·rollouts (rollouts=2 in "rl" mode)."""

    reconstruction: jnp.ndarray  # (B, t, H, W, C)
    latent: jnp.ndarray  # (B, t, hw, latent_dim) — fill-blended compressed repr
    selection_prob: jnp.ndarray  # (B, t, 1, 1) gate probability (continuous)
    selection_mask: jnp.ndarray  # (B, t, 1, 1) hard {0,1} keep/drop decision
    log_variance: jnp.ndarray  # (B, t, hw, latent_dim)
    mean: jnp.ndarray  # (B, t, hw, latent_dim)
    rollouts: int = struct.field(pytree_node=False, default=1)


def frame_mask_to_attention(frame_mask: jnp.ndarray) -> jnp.ndarray:
    """(b, t) {0,1} → (b, 1, 1, t) bool key mask."""
    return rearrange(frame_mask.astype(bool), "b t -> b 1 1 t")


def _block_stack(cfg: ModelConfig, depth: int, rngs: nnx.Rngs):
    return nnx.List([
        FactoredAttention(
            in_features=cfg.embed_dim,
            mlp_dim=cfg.mlp_dim,
            num_heads=cfg.num_heads,
            qkv_features=cfg.qkv_features,
            rngs=rngs,
            rope_base=cfg.rope_base,
            rope_alpha=cfg.rope_alpha,
            attention_impl=cfg.attention_impl,
            remat=cfg.remat,
            dtype=cfg.compute_dtype(),
            param_dtype=cfg.params_dtype(),
        )
        for _ in range(depth)
    ])


class Encoder(nnx.Module):
    """Patches → depth × FactoredAttention → (mean, log_variance, selection logits).

    Parity: /root/reference/train/model.py:14-60 and rl_model.py:15-60. The
    variance head predicts softplus⁻¹(variance); log-variance is
    log(softplus(·)) (model.py:54-55). The selection head reduces channels then
    patches to one logit per frame, plus a +1 bias (model.py:56-58).
    """

    def __init__(self, cfg: ModelConfig, rngs: nnx.Rngs):
        dtype, pdtype = cfg.compute_dtype(), cfg.params_dtype()
        self.cfg_bias = cfg.selection_logit_bias
        self.patch_embedding = PatchEmbedding(
            cfg.channels, cfg.patch_size, rngs, dtype=dtype, param_dtype=pdtype
        )
        self.layers = _block_stack(cfg, cfg.encoder_depth, rngs)
        self.spatial_compression = nnx.Linear(
            cfg.embed_dim, cfg.latent_dim, dtype=dtype, param_dtype=pdtype, rngs=rngs
        )
        self.variance_estimator = nnx.Linear(
            cfg.embed_dim, cfg.latent_dim, dtype=dtype, param_dtype=pdtype, rngs=rngs
        )
        self.selection_layer1 = nnx.Linear(
            cfg.latent_dim, 1, dtype=dtype, param_dtype=pdtype, rngs=rngs
        )
        self.selection_layer2 = nnx.Linear(
            cfg.num_patches, 1, dtype=dtype, param_dtype=pdtype, rngs=rngs
        )

    def __call__(self, x: jnp.ndarray, attn_mask: Optional[jnp.ndarray]):
        x = self.patch_embedding(x)
        x = constrain(x, ("data", "fsdp"))
        for layer in self.layers:
            x = layer(x, attn_mask)
        mean = self.spatial_compression(x)
        variance = jax.nn.softplus(self.variance_estimator(x))
        log_variance = jnp.log(variance)
        sel = self.selection_layer1(mean)  # (b, t, hw, 1)
        sel = rearrange(sel, "b t hw 1 -> b t hw")
        logits = self.selection_layer2(sel) + self.cfg_bias  # (b, t, 1)
        return mean, log_variance, logits


class Decoder(nnx.Module):
    """Latents → depth × FactoredAttention → patch unembed → UNet residual.

    Parity: /root/reference/train/model.py:62-97.
    """

    def __init__(self, cfg: ModelConfig, rngs: nnx.Rngs):
        dtype, pdtype = cfg.compute_dtype(), cfg.params_dtype()
        self.spatial_decompression = nnx.Linear(
            cfg.latent_dim, cfg.embed_dim, dtype=dtype, param_dtype=pdtype, rngs=rngs
        )
        self.layers = _block_stack(cfg, cfg.decoder_depth, rngs)
        self.patch_unembedding = PatchUnEmbedding(
            cfg.height,
            cfg.width,
            cfg.channels,
            cfg.patch_size,
            cfg.unembedding_upsample_rate,
            rngs,
            conv_layout=cfg.unet_layout,
            pack_s2d=cfg.unet_s2d_full,
            dtype=dtype,
            param_dtype=pdtype,
        )
        self.unet = UNet3D(
            channels=cfg.channels * cfg.unembedding_upsample_rate,
            base_features=cfg.unet_base_features,
            num_levels=cfg.unet_levels,
            out_features=cfg.channels,
            rngs=rngs,
            temporal_kernel=cfg.temporal_kernel,
            remat=cfg.remat,
            layout=cfg.unet_layout,
            s2d_last=cfg.unet_s2d_last,
            s2d_full=self.patch_unembedding.pack_s2d,
            dtype=dtype,
            param_dtype=pdtype,
        )

    def __call__(self, z: jnp.ndarray, attn_mask: Optional[jnp.ndarray]):
        x = self.spatial_decompression(z)
        for layer in self.layers:
            x = layer(x, attn_mask)
        conv_features, direct = self.patch_unembedding(x)
        if self.unet.s2d_full:
            # both paths are PHASE-PACKED (b,t,4·3,H/2,W/2); unpack and
            # channels-last fuse into ONE permutation of the 3-channel sum
            # (replacing the separate depth-to-space + exit transpose)
            out = direct + self.unet(conv_features)
            return rearrange(
                out, "b t (c pa pb) h w -> b t (h pa) (w pb) c", pa=2, pb=2
            )
        if self.unet.layout == "cf":
            # features flow channels-first end-to-end; both the direct path
            # and the UNet emit (b,t,3,h,w), and only this small 3-channel
            # sum transposes to pixel layout (emitting pixels-last from the
            # 12-channel contractions stored into 3-lane-minor tiles, ~2.7 ms)
            out = direct + self.unet(conv_features)
            return jnp.transpose(out, (0, 1, 3, 4, 2))
        return direct + self.unet(conv_features)


class VideoVAE(nnx.Module):
    """End-to-end video VAE with adaptive temporal compression."""

    def __init__(self, cfg: ModelConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        key = rngs.sampling()
        self.encoder = Encoder(cfg, rngs)
        self.decoder = Decoder(cfg, rngs)
        # Learned replacement latent for dropped frames (model.py:115).
        self.fill_token = nnx.Param(
            jax.random.normal(key, (1, 1, 1, cfg.latent_dim)) * 0.02
        )

    # -- public sub-paths -------------------------------------------------

    def encode(self, x: jnp.ndarray, frame_mask: Optional[jnp.ndarray] = None):
        """Deterministic encode: (mean, log_variance, selection_prob)."""
        attn_mask = frame_mask_to_attention(frame_mask) if frame_mask is not None else None
        mean, log_variance, logits = self.encoder(x, attn_mask)
        return mean, log_variance, jax.nn.sigmoid(logits)

    def decode(self, z: jnp.ndarray, frame_mask: Optional[jnp.ndarray] = None):
        attn_mask = frame_mask_to_attention(frame_mask) if frame_mask is not None else None
        return self.decoder(z, attn_mask)

    def blend_fill(self, latent: jnp.ndarray, selection_mask: jnp.ndarray) -> jnp.ndarray:
        """Replace dropped frames with the learned fill token (model.py:133)."""
        sel = selection_mask.astype(latent.dtype)
        return self.fill_token.value.astype(latent.dtype) * (1.0 - sel) + latent * sel

    def _decode_scan_rollouts(
        self, blended: jnp.ndarray, attn_mask: jnp.ndarray, rollouts: int
    ) -> jnp.ndarray:
        """Decode one rollout at a time via a checkpointed ``lax.scan``.

        The paired rollouts are independent decodes of the same weights, so
        scanning over the rollout axis is mathematically identical to the
        batched (b·rollouts) pass while forcing XLA to schedule them
        sequentially — peak decoder backward temps drop from [2b,…] to [b,…]
        (the 512 MB conv-backward copies that push the 64-frame bucket past
        16G single-chip HBM, PERF.md). ``jax.checkpoint`` on the body keeps
        the backward per-rollout too. Same split/merge-as-scan-constant
        pattern as losses/perceptual.py:38-45.
        """
        graphdef, dec_state = nnx.split(self.decoder)
        # (b r) batch order is b-major/r-minor (the repeat above), so peel the
        # rollout axis to the front for the scan and restore it after.
        z_r = rearrange(blended, "(b r) ... -> r b ...", r=rollouts)
        m_r = rearrange(attn_mask, "(b r) ... -> r b ...", r=rollouts)

        @jax.checkpoint
        def body(state, z_m):
            z_i, m_i = z_m
            decoder = nnx.merge(graphdef, state)
            return state, decoder(z_i, m_i)

        _, recon_r = jax.lax.scan(body, dec_state, (z_r, m_r))
        return rearrange(recon_r, "r b ... -> (b r) ...")

    # -- training forward --------------------------------------------------

    def __call__(
        self,
        x: jnp.ndarray,
        frame_mask: jnp.ndarray,
        rngs: nnx.Rngs,
        train: bool = True,
    ) -> VAEOutput:
        cfg = self.cfg
        attn_mask = frame_mask_to_attention(frame_mask)
        mean, log_variance, logits = self.encoder(x, attn_mask)

        if train:
            noise = jax.random.normal(rngs.sampling(), log_variance.shape, dtype=mean.dtype)
            latent = mean + noise * jnp.exp(log_variance.astype(jnp.float32) / 2).astype(mean.dtype)
        else:
            latent = mean

        prob = jax.nn.sigmoid(logits)  # (b, t, 1)

        if cfg.selection_mode == "rl":
            # Paired rollouts: duplicate everything 2× and sample two
            # independent Bernoulli masks per clip (rl_model.py:136-142).
            prob = repeat(prob, "b t 1 -> (b r) t 1 1", r=NUM_ROLLOUTS)
            latent = repeat(latent, "b ... -> (b r) ...", r=NUM_ROLLOUTS)
            mean = repeat(mean, "b ... -> (b r) ...", r=NUM_ROLLOUTS)
            log_variance = repeat(log_variance, "b ... -> (b r) ...", r=NUM_ROLLOUTS)
            attn_mask = repeat(attn_mask, "b ... -> (b r) ...", r=NUM_ROLLOUTS)
            selection_mask = jax.random.bernoulli(
                rngs.sampling(), p=prob.astype(jnp.float32)
            ).astype(latent.dtype)
            rollouts = NUM_ROLLOUTS
        elif cfg.selection_mode == "ste":
            gate = gumbel_sigmoid_sample(
                logits,
                rngs.sampling() if train else None,
                temperature=cfg.gumbel_temperature,
                train=train,
            )
            selection_mask = rearrange(gate, "b t 1 -> b t 1 1")
            prob = rearrange(prob, "b t 1 -> b t 1 1")
            rollouts = 1
        else:  # "none"
            prob = rearrange(prob, "b t 1 -> b t 1 1")
            selection_mask = jnp.ones_like(prob)
            rollouts = 1

        blended = self.blend_fill(latent, selection_mask)
        if cfg.scan_rollout_decode and rollouts > 1:
            reconstruction = self._decode_scan_rollouts(blended, attn_mask, rollouts)
        else:
            reconstruction = self.decoder(blended, attn_mask)
        return VAEOutput(
            reconstruction=reconstruction,
            latent=blended,
            selection_prob=prob,
            selection_mask=selection_mask,
            log_variance=log_variance,
            mean=mean,
            rollouts=rollouts,
        )
