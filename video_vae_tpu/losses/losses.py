"""Training objective: masked reconstruction + KL + selection density + REINFORCE.

Parity: the loss in /root/reference/train/rl_nonadversarial.py:100-186 and its
newer variant /root/reference/claude_distributed/distributed_train.py:201-285.
Both published generations are supported through :class:`LossConfig`:

* selection_penalty: "square" (:141) vs "abs" (distributed :225-226)
* rl_objective: "normalized_prod" — self-normalized product-of-probs
  (:163-173) vs "log_prob" — sum of centered log-probs (distributed :267-271)
* kl_normalizer: "seq_len" (:146) vs "kept_frames" (distributed :228-230)

All weights and the compression-rate schedule arrive as traced scalars
(:class:`DynamicHParams`), so mid-training schedule changes never recompile —
unlike the reference's dict mutation (rl_nonadversarial.py:325-326).

Everything is masked by the (b, t) frame-validity mask so padded frames
contribute nothing; normalizers divide by true sequence length, making loss
magnitudes invariant to padding (validated by tests/test_masking.py, mirroring
/root/reference/train/llm_tests.py).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange, reduce, repeat

from video_vae_tpu.core.config import DynamicHParams, LossConfig
from video_vae_tpu.models.vae import VAEOutput

LossMetrics = Dict[str, jnp.ndarray]

# (reconstruction at B=b·r, un-duplicated target at b, rollouts) -> (B,)
PerceptualFn = Callable[[jnp.ndarray, jnp.ndarray, int], jnp.ndarray]


def per_sample_mean(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def magnify_negatives(x: jnp.ndarray, rate: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x < 0, x * rate, x)


def _masked_recon_terms(video, reconstruction, output_mask, seq_len):
    """Per-sample masked MSE and MAE, normalized by true frame count.

    Parity: rl_nonadversarial.py:109-121 — sum |err| over time / seq_len, then
    mean over the remaining dims.
    """
    video_mask = rearrange(output_mask, "b t -> b t 1 1 1")
    sl = rearrange(seq_len, "b 1 -> b 1 1 1 1")
    err = (video - reconstruction) * video_mask
    err = err.astype(jnp.float32)
    mae = per_sample_mean(reduce(jnp.abs(err), "b t h w c -> b 1 h w c", "sum") / sl)
    mse = per_sample_mean(reduce(jnp.square(err), "b t h w c -> b 1 h w c", "sum") / sl)
    return mse, mae


def vae_loss(
    out: VAEOutput,
    video: jnp.ndarray,
    frame_mask: jnp.ndarray,
    hp: DynamicHParams,
    cfg: LossConfig,
    perceptual_fn: Optional[PerceptualFn] = None,
) -> Tuple[jnp.ndarray, LossMetrics]:
    """Full training objective.

    Args:
        out: model outputs at batch B = b·rollouts.
        video: (b, t, H, W, C) original clip (pre-rollout-duplication).
        frame_mask: (b, t) validity mask, 1 = real frame.
    """
    r = out.rollouts
    frame_mask = frame_mask.astype(jnp.float32)
    output_mask = repeat(frame_mask, "b t -> (b r) t", r=r) if r > 1 else frame_mask
    video_r = repeat(video, "b ... -> (b r) ...", r=r) if r > 1 else video

    seq_len = jnp.clip(reduce(output_mask, "b t -> b 1", "sum"), 1.0, None)

    mse, mae = _masked_recon_terms(video_r, out.reconstruction, output_mask, seq_len)

    if perceptual_fn is not None:
        # pass the UN-duplicated clip; perceptual_loss tiles it across rollouts
        # and re-featurizes the tiled target (the extract-once dedup variant was
        # A/B'd slower on-chip and reverted — see losses/perceptual.py)
        perceptual = perceptual_fn(out.reconstruction, video, r).astype(jnp.float32)
    else:
        perceptual = jnp.zeros_like(mse)

    # --- selection density penalty (rl_nonadversarial.py:127-141) ---
    ksm = rearrange(output_mask, "b t -> b t 1 1")  # kl-and-selection mask
    sel_mask_f = out.selection_mask.astype(jnp.float32)
    sel_sum = reduce(sel_mask_f * ksm, "b t 1 1 -> b 1", "sum")
    kept_frame_density = sel_sum / seq_len
    density_diff = kept_frame_density - (1.0 / hp.max_compression_rate)
    magnified = magnify_negatives(density_diff, hp.magnify_negatives_rate)
    if cfg.selection_penalty == "square":
        selection_loss = per_sample_mean(jnp.square(magnified))
    else:
        selection_loss = per_sample_mean(jnp.abs(magnified))

    # --- KL (rl_nonadversarial.py:146-147 / distributed_train.py:228-230) ---
    logvar = out.log_variance.astype(jnp.float32)
    mean = out.mean.astype(jnp.float32)
    kl_map = 0.5 * (jnp.exp(logvar) - 1.0 - logvar + jnp.square(mean)) * ksm
    if cfg.kl_normalizer == "kept_frames":
        kl_map = kl_map * sel_mask_f
        kl_norm = rearrange(jnp.clip(sel_sum, 1.0, None), "b 1 -> b 1 1 1")
    else:
        kl_norm = rearrange(seq_len, "b 1 -> b 1 1 1")
    kl_loss = per_sample_mean(kl_map / kl_norm)

    per_sample_loss = (
        mse
        + hp.gamma_perceptual * perceptual
        + hp.gamma_selection * selection_loss
        + hp.gamma_kl * kl_loss
        + hp.gamma_mae * mae
    )

    # NOTE: the reconstruction tensor deliberately does NOT ride in metrics —
    # the reference returns it from every jit_train_step (rl_nonadversarial.py
    # :177), which at pod scale is a (2b,t,H,W,3) output buffer + donation
    # back-pressure per step for a tensor used once per video_every steps.
    # Dump paths recompute it on demand (Trainer._dump_videos) and eval_step
    # attaches it explicitly.
    metrics: LossMetrics = {
        "MSE": jnp.mean(mse),
        "per_sample_MAE": jnp.mean(mae),
        "perceptual_loss": jnp.mean(perceptual),
        "selection_loss": jnp.mean(selection_loss),
        "kl_loss": jnp.mean(kl_loss),
        "kept_frame_density": jnp.mean(kept_frame_density),
    }

    if r > 1:
        rl_loss, traj_prob = _reinforce_loss(out, per_sample_loss, output_mask, cfg)
        loss = jnp.mean(per_sample_loss) + jnp.mean(rl_loss) * hp.rl_loss_weight
        metrics["rl_loss"] = jnp.mean(rl_loss)
        metrics["mean_trajectory_prob"] = traj_prob
    else:
        loss = jnp.mean(per_sample_loss)
        metrics["rl_loss"] = jnp.zeros(())
        metrics["mean_trajectory_prob"] = jnp.zeros(())

    metrics["loss"] = loss
    return loss, metrics


def _reinforce_loss(
    out: VAEOutput,
    per_sample_loss: jnp.ndarray,
    output_mask: jnp.ndarray,
    cfg: LossConfig,
):
    """REINFORCE over paired rollouts with standardized disadvantages.

    Gradient flows only through the selection probability; the disadvantage
    (standardized per-pair loss) is stop-gradiented. P(X=a) = |p + a − 1| for a
    Bernoulli sample a ∈ {0,1} (rl_nonadversarial.py:150-173).
    """
    p = out.rollouts
    pairs = rearrange(per_sample_loss, "(b p) -> b p", p=p)
    pair_mean = rearrange(per_sample_mean(pairs), "b -> b 1")
    pair_std = rearrange(jnp.std(pairs, axis=1) + 1e-6, "b -> b 1")
    disadvantages = jax.lax.stop_gradient(
        rearrange((pairs - pair_mean) / pair_std, "b p -> b p 1")
    )

    actions = rearrange(out.selection_mask.astype(jnp.float32), "(b p) t 1 1 -> b p t", p=p)
    probs = rearrange(out.selection_prob.astype(jnp.float32), "(b p) t 1 1 -> b p t", p=p)
    raw_probs = jnp.clip(jnp.abs(probs + actions - 1.0), 1e-6, 1.0 - 1e-6)
    rl_mask = rearrange(output_mask, "(b p) t -> b p t", p=p).astype(bool)

    raw_masked = jnp.where(rl_mask, raw_probs, 1.0)
    traj_prob = jnp.mean(reduce(raw_masked, "b p t -> b p 1", "prod"))

    if cfg.rl_objective == "normalized_prod":
        norm_probs = raw_probs / jax.lax.stop_gradient(raw_probs)
        norm_probs = jnp.where(rl_mask, norm_probs, 1.0)
        trajectory = reduce(norm_probs, "b p t -> b p 1", "prod")
    else:  # "log_prob"
        log_probs = jnp.log(raw_probs) - jax.lax.stop_gradient(jnp.log(raw_probs))
        log_probs = jnp.where(rl_mask, log_probs, 0.0)
        trajectory = reduce(log_probs, "b p t -> b p 1", "sum")

    return trajectory * disadvantages, traj_prob


# ---------------------------------------------------------------------------
# GAN losses (legacy parity: /root/reference/train/legacy/training_loop_continued.py:130-165)
# ---------------------------------------------------------------------------


def generator_adversarial_loss(fake_logits: jnp.ndarray) -> jnp.ndarray:
    """Non-saturating generator loss: softplus(−D(fake))."""
    return jnp.mean(jax.nn.softplus(-fake_logits.astype(jnp.float32)))


def discriminator_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray):
    """softplus(−D(real)) + softplus(D(fake)); returns (loss, accuracy)."""
    real_logits = real_logits.astype(jnp.float32)
    fake_logits = fake_logits.astype(jnp.float32)
    loss = jnp.mean(jax.nn.softplus(-real_logits)) + jnp.mean(jax.nn.softplus(fake_logits))
    accuracy = 0.5 * (jnp.mean(real_logits > 0) + jnp.mean(fake_logits < 0))
    return loss, accuracy
