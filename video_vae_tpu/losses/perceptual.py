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
    vgg: VGG16Features, *, remat: bool = True, chunk_frames: int = 32
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Returns fn(x, target) -> (B,) per-sample loss for (B,t,h,w,c) videos.

    ``chunk_frames`` bounds peak memory: when the flattened batch exceeds it,
    the VGG passes run as a ``lax.scan`` over frame chunks (identical math —
    every frame's features are independent). At the flagship 64-frame
    curriculum bucket the single-pass variant holds ~2 GB of relu1_1/1_2
    activations per pass and OOM'd v5e HBM by ~0.3 GB (soak probe r3);
    chunking divides that by the chunk count. 0 disables chunking.
    """

    graphdef, state = nnx.split(vgg)

    def features(state, imgs):
        model = nnx.merge(graphdef, state)
        return model(imgs)

    def _per_frame_loss(x_flat: jnp.ndarray, tgt_flat: jnp.ndarray) -> jnp.ndarray:
        """(N,h,w,c)×2 → (N,) per-frame perceptual loss.

        Pred and target run as SEPARATE VGG passes with the target pass under
        stop_gradient: the earlier single concatenated pass made the backward
        dgrad chain run at 2N batch and throw the target half away — at
        b1×16f that was ~240 GFLOP/step of dead convolutions. Two N-sized
        passes keep shapes even (the uneven-batch dedup variant that was
        A/B'd slower tiled FEATURES; this tiles nothing).
        """
        acts_x = features(state, x_flat)
        acts_t = jax.lax.stop_gradient(features(state, tgt_flat))
        loss = 0.0
        for layer in PERCEPTUAL_LAYERS:
            fx = acts_x[layer].astype(jnp.float32)
            ft = acts_t[layer].astype(jnp.float32)
            if fx.ndim == 5:  # cf layout: (1, N, C, H, W) → (N, C, H, W)
                fx, ft = fx[0], ft[0]
            loss = loss + jnp.mean(
                jnp.square(fx - ft), axis=tuple(range(1, fx.ndim))
            )
        return loss

    if remat:
        # Checkpoint the WHOLE per-frame loss, not just the VGG trunk: under
        # the chunked lax.scan, a features-only checkpoint leaves the f32
        # feature diff as a per-chunk scan residual — a stacked
        # f32[chunks, chunk, 256, 256, 64] buffer (4.0 GB with lane padding at
        # the 64-frame bucket; the #1 allocation in the r3 OOM breakdown).
        # Checkpointing the full body keeps only the bf16 pixel inputs live.
        # Applied ONLY on the chunked path below: the single-pass path has no
        # stacked residuals (its live set is one chunk's worth by
        # construction), so checkpointing it just re-ran the whole VGG
        # forward in the backward for nothing (~480 GFLOP/step at b1×16f).
        _per_frame_loss_ckpt = jax.checkpoint(_per_frame_loss)
    else:
        _per_frame_loss_ckpt = _per_frame_loss

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
        n = x_flat.shape[0]
        if chunk_frames and n > chunk_frames:
            # ceil-split: pad to a chunk multiple so the memory bound holds
            # for EVERY n (an exact-divisor gate silently fell back to the
            # single pass — the OOM case this chunking exists for)
            pad = (-n) % chunk_frames
            if pad:
                x_flat = jnp.concatenate(
                    [x_flat, jnp.zeros((pad, *x_flat.shape[1:]), x_flat.dtype)]
                )
                tgt_flat = jnp.concatenate(
                    [tgt_flat, jnp.zeros((pad, *tgt_flat.shape[1:]), tgt_flat.dtype)]
                )
            n_chunks = (n + pad) // chunk_frames
            xc = x_flat.reshape(n_chunks, chunk_frames, *x_flat.shape[1:])
            tc = tgt_flat.reshape(n_chunks, chunk_frames, *tgt_flat.shape[1:])

            def body(carry, xt):
                return carry, _per_frame_loss_ckpt(*xt)

            _, losses = jax.lax.scan(body, 0.0, (xc, tc))
            loss = losses.reshape(n + pad)[:n]
        else:
            loss = _per_frame_loss(x_flat, tgt_flat)
        per_frame = rearrange(loss, "(b t) -> b t", b=br, t=t)
        return jnp.mean(per_frame, axis=-1)

    return perceptual_loss
