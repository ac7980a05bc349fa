"""Adversarial training: generator + spectral-normed discriminator steps.

Parity: the GAN machinery of /root/reference/train/legacy/training_loop_continued.py:126-165
and its RL combination /root/reference/train/legacy/rl_training.py — non-saturating
generator loss softplus(−D(fake)) added to the VAE objective after
``adversarial_start_step``, and a discriminator step on (real, reconstruction)
with softplus(−D(real)) + softplus(D(fake)) plus an accuracy metric.

TPU-first deltas: one fused jit program per step (generator and discriminator
updates in a single traced function — one launch, shared forward), the
start-step gate is a traced ``jnp.where`` on the loss weight rather than Python
control flow, and both models' params/optimizers follow the same declarative
sharding rules as the main path.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from video_vae_tpu.core.config import DynamicHParams, LossConfig
from video_vae_tpu.losses.losses import discriminator_loss, generator_adversarial_loss, vae_loss


def make_adversarial_train_step(
    loss_cfg: LossConfig,
    perceptual_fn: Optional[Callable] = None,
    *,
    adversarial_weight: float = 0.1,
    adversarial_start_step: int = 0,
    compute_dtype=jnp.bfloat16,
) -> Callable:
    """Returns jitted (model, opt, disc, disc_opt, video, mask, rngs, hp, step) -> metrics."""

    @nnx.jit
    def train_step(
        model: nnx.Module,
        optimizer: nnx.Optimizer,
        discriminator: nnx.Module,
        disc_optimizer: nnx.Optimizer,
        video: jnp.ndarray,
        frame_mask: jnp.ndarray,
        rngs: nnx.Rngs,
        hp: DynamicHParams,
        step: jnp.ndarray,
    ):
        video = video.astype(compute_dtype)
        adv_on = (step >= adversarial_start_step).astype(jnp.float32)

        # ---- generator (VAE) update ----
        # discriminator must be an explicit argument (its spectral-norm power
        # iteration mutates a BatchStat; closure capture would mutate across
        # trace levels). Only argnum 0 (the model) is differentiated.
        def gen_loss(model, rngs, discriminator):
            out = model(video, frame_mask, rngs, train=True)
            loss, metrics = vae_loss(out, video, frame_mask, hp, loss_cfg, perceptual_fn)
            fake_logits = discriminator(out.reconstruction)
            g_adv = generator_adversarial_loss(fake_logits)
            metrics["generator_adv_loss"] = g_adv
            total = loss + adversarial_weight * adv_on * g_adv
            metrics["loss"] = total
            return total, (metrics, out.reconstruction)

        grad_fn = nnx.value_and_grad(gen_loss, has_aux=True)
        (_, (metrics, reconstruction)), grads = grad_fn(model, rngs, discriminator)
        optimizer.update(model, grads)

        # ---- discriminator update on (real, first-rollout recon) ----
        # (legacy/rl_training.py trains D on the first rollout's reconstruction)
        fake = jax.lax.stop_gradient(reconstruction[: video.shape[0]])

        def disc_loss(discriminator):
            real_logits = discriminator(video)
            fake_logits = discriminator(fake)
            d_loss, acc = discriminator_loss(real_logits, fake_logits)
            return d_loss * adv_on, acc

        d_grad_fn = nnx.value_and_grad(disc_loss, has_aux=True)
        (d_loss, d_acc), d_grads = d_grad_fn(discriminator)
        disc_optimizer.update(discriminator, d_grads)

        metrics["discriminator_loss"] = d_loss
        metrics["discriminator_accuracy"] = d_acc
        return metrics

    return train_step
