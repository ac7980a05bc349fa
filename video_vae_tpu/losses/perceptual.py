"""Per-sample VGG perceptual loss.

Parity: get_adversarial_perceptual_loss_fn (/root/reference/train/vgg_tests.py:38-68)
— flatten (b,t)→batch, run the (checkpointed) feature extractor on prediction and
target, sum per-sample MSEs over relu1_1/relu1_2/relu2_1, then mean over frames.

TPU-first deltas: the extractor is truncated after relu2_1 (identical loss, far
fewer FLOPs — see models/vgg.py) and the two feature passes are batched into ONE
VGG forward by concatenating prediction and target along the batch axis, halving
kernel launches and letting XLA share the im2col/matmul tiling.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from einops import rearrange, repeat
from flax import nnx

from video_vae_tpu.models.vgg import PERCEPTUAL_LAYERS, VGG16Features


def make_perceptual_loss_fn(
    vgg: VGG16Features, *, remat: bool = True
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Returns fn(x, target) -> (B,) per-sample loss for (B,t,h,w,c) videos."""

    graphdef, state = nnx.split(vgg)

    def features(state, imgs):
        model = nnx.merge(graphdef, state)
        return model(imgs)

    if remat:
        features = jax.checkpoint(features)

    def perceptual_loss(
        x: jnp.ndarray, target: jnp.ndarray, rollouts: int = 1
    ) -> jnp.ndarray:
        """x: (b·rollouts, t, h, w, c) reconstructions in (b r) batch order;
        target: the UN-duplicated (b, t, h, w, c) clip.

        The target IS re-featurized per rollout: a dedup variant (features
        once, tiled) was A/B'd ~60 ms/step SLOWER — the uneven 3b·t VGG batch
        plus the feature-tiling copies cost more than the redundant convs.
        """
        br, t = x.shape[0], x.shape[1]
        if rollouts > 1:
            target = repeat(target, "b ... -> (b r) ...", r=rollouts)
        x_flat = rearrange(x, "b t h w c -> (b t) h w c").astype(jnp.bfloat16)
        tgt_flat = rearrange(target, "b t h w c -> (b t) h w c").astype(jnp.bfloat16)
        both = jnp.concatenate([x_flat, tgt_flat], axis=0)
        acts = features(state, both)
        loss = 0.0
        for layer in PERCEPTUAL_LAYERS:
            feat = acts[layer].astype(jnp.float32)
            if feat.ndim == 5:  # cf layout: (1, 2N, C, H, W) → (2N, C, H, W)
                feat = feat[0]
            fx, ft = jnp.split(feat, 2, axis=0)
            loss = loss + jnp.mean(
                jnp.square(fx - ft), axis=tuple(range(1, fx.ndim))
            )
        per_frame = rearrange(loss, "(b t) -> b t", b=br, t=t)
        return jnp.mean(per_frame, axis=-1)

    return perceptual_loss
