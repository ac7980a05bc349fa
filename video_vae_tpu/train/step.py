"""Jitted train/eval step builders.

Parity: train_step/eval_step (/root/reference/train/rl_nonadversarial.py:188-208),
re-architected:

* Callers pass the raw (b, t) frame mask — no caller-side hw expansion (the
  reference's two drivers disagree about who expands the mask; here the model
  owns it).
* Dynamic hyperparameters arrive as a :class:`DynamicHParams` pytree — schedule
  changes (e.g. the compression-rate ramp at rl_nonadversarial.py:325-326) never
  recompile.
* The returned step is a single nnx.jit program; under an active mesh the batch
  is constrained to the data axes and XLA inserts the gradient all-reduce over
  ICI exactly as in the reference's distributed driver
  (/root/reference/claude_distributed/distributed_train.py:508).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax.numpy as jnp
from flax import nnx

from video_vae_tpu.core.config import DynamicHParams, LossConfig
from video_vae_tpu.losses.losses import vae_loss
from video_vae_tpu.losses.perceptual import make_perceptual_loss_fn


def _loss_fn(model, video, frame_mask, rngs, hp, loss_cfg, perceptual_fn, train=True):
    out = model(video, frame_mask, rngs, train=train)
    return vae_loss(out, video, frame_mask, hp, loss_cfg, perceptual_fn)


def make_train_step(
    loss_cfg: LossConfig,
    perceptual_fn: Optional[Callable] = None,
    *,
    compute_dtype=jnp.bfloat16,
    donate: bool = False,
) -> Callable:
    """Returns jitted (model, optimizer, video, frame_mask, rngs, hp) -> metrics.

    ``donate=True`` (TrainConfig.donate_state) donates the model + optimizer
    state buffers to XLA — the updated params/moments are written in place
    instead of double-buffered, roughly halving peak optimizer-state memory at
    flagship scale. Callers must not hold stale references to the old state
    (nnx.jit re-binds the module to the returned state, so the Trainer pattern
    is safe).
    """

    @functools.partial(nnx.jit, donate_argnums=(0, 1) if donate else ())
    def train_step(
        model: nnx.Module,
        optimizer: nnx.Optimizer,
        video: jnp.ndarray,
        frame_mask: jnp.ndarray,
        rngs: nnx.Rngs,
        hp: DynamicHParams,
    ):
        video = video.astype(compute_dtype)

        # rngs must be an explicit argument (not a closure) so nnx threads its
        # mutable counts through the grad trace.
        def loss_for_grad(model, rngs):
            return _loss_fn(
                model, video, frame_mask, rngs, hp, loss_cfg, perceptual_fn, train=True
            )

        grad_fn = nnx.value_and_grad(loss_for_grad, has_aux=True)
        (loss, metrics), grads = grad_fn(model, rngs)
        # gradient-health telemetry (parity: print_max_grad / param_norm probes,
        # rl_nonadversarial.py:74-92, distributed_train.py:482-486) — scalars in
        # the metrics dict, no in-graph prints
        from video_vae_tpu.utils.debug import global_max_abs, global_norm

        metrics["grad_norm"] = global_norm(grads)
        metrics["max_grad"] = global_max_abs(grads)
        optimizer.update(model, grads)
        return metrics

    return train_step


def make_eval_step(
    loss_cfg: LossConfig,
    perceptual_fn: Optional[Callable] = None,
    *,
    compute_dtype=jnp.bfloat16,
    sample_latent: bool = True,
) -> Callable:
    """Eval step. ``sample_latent=True`` matches the reference eval, which keeps
    train-mode latent sampling deliberately ("Train=False samples from the modal
    distribution, which is not ideal", rl_nonadversarial.py:205); set False for
    fully deterministic eval (exposed here, unused by the reference driver)."""

    @nnx.jit
    def eval_step(
        model: nnx.Module,
        video: jnp.ndarray,
        frame_mask: jnp.ndarray,
        rngs: nnx.Rngs,
        hp: DynamicHParams,
    ):
        video = video.astype(compute_dtype)
        out = model(video, frame_mask, rngs, train=sample_latent)
        loss, metrics = vae_loss(out, video, frame_mask, hp, loss_cfg, perceptual_fn)
        # Scalars only: the reconstruction tensor used to ride in metrics here
        # — a dead (2b,t,H,W,3) device->host buffer per eval batch (run_eval
        # consumes only 0-d values; dumps use make_reconstruct_fn). Quality is
        # reported as masked PSNR instead (BASELINE.md acceptance metric).
        # Named *_sampled: this path repeats the target across the STOCHASTIC
        # rollouts, so its floor differs from the deterministic `dump_psnr_det`
        # (trainer._dump_videos); the BASELINE.md 0.1-dB criterion refers to
        # the deterministic meter (/root/reference/train/model.py:129-131).
        from video_vae_tpu.utils.metrics import masked_psnr

        r = out.rollouts
        video_r = jnp.repeat(video, r, axis=0) if r > 1 else video
        mask_r = jnp.repeat(frame_mask, r, axis=0) if r > 1 else frame_mask
        metrics["psnr_sampled"] = masked_psnr(out.reconstruction, video_r, mask_r)
        return metrics

    return eval_step


def make_reconstruct_fn(compute_dtype=jnp.bfloat16) -> Callable:
    """Deterministic encode→decode pass (inference), jitted once per shape."""

    @nnx.jit
    def reconstruct(model: nnx.Module, video: jnp.ndarray, frame_mask: jnp.ndarray):
        video = video.astype(compute_dtype)
        mean, _, prob = model.encode(video, frame_mask)
        keep = (prob >= 0.5).astype(mean.dtype)[..., None]  # (b, t, 1, 1)
        blended = model.blend_fill(mean, keep)
        return model.decode(blended, frame_mask)

    return reconstruct


def build_perceptual(loss_cfg: LossConfig, weights_path: Optional[str] = None):
    """Construct the perceptual fn demanded by the loss config (or None)."""
    if not loss_cfg.use_perceptual:
        return None
    from video_vae_tpu.models.vgg import load_vgg

    return make_perceptual_loss_fn(
        load_vgg(weights_path, layout=loss_cfg.vgg_layout),
        chunk_frames=loss_cfg.perceptual_chunk_frames,
    )
