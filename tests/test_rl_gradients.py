"""REINFORCE gradient semantics: pin gradients, not just loss values.

SURVEY.md §7 hard part (c): the two published RL objectives — the
self-normalized product trick (/root/reference/train/rl_nonadversarial.py:163-173)
and the centered log-prob sum (/root/reference/claude_distributed/
distributed_train.py:267-271) — are both zero-valued in the forward pass but
must produce the textbook REINFORCE gradient

    ∂L/∂p_i = disadvantage · ∂ log P(a_i | p_i) / ∂p_i · (mask_i)

with P(a|p) = |p + a − 1| (p for a=1, 1−p for a=0). These tests verify the
autodiff gradient of each variant against that closed form.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_vae_tpu.core.config import DynamicHParams, LossConfig
from video_vae_tpu.losses.losses import _reinforce_loss
from video_vae_tpu.models.vae import VAEOutput


def _setup(key=0, b=3, t=5):
    ks = jax.random.split(jax.random.key(key), 3)
    B = b * 2
    prob = jax.nn.sigmoid(jax.random.normal(ks[0], (B, t, 1, 1)))
    actions = jax.random.bernoulli(ks[1], 0.5, (B, t, 1, 1)).astype(jnp.float32)
    per_sample_loss = jax.random.uniform(ks[2], (B,)) * 3.0
    mask = jnp.ones((B, t)).at[1, 3:].set(0).at[4, 4:].set(0)
    return prob, actions, per_sample_loss, mask


def _expected_grad(prob, actions, per_sample_loss, mask, b, t):
    """Closed-form ∂mean(rl)/∂p for both objectives (they share it)."""
    p = np.asarray(prob)[..., 0, 0].reshape(b, 2, t)
    a = np.asarray(actions)[..., 0, 0].reshape(b, 2, t)
    m = np.asarray(mask).reshape(b, 2, t)
    losses = np.asarray(per_sample_loss).reshape(b, 2)
    mean = losses.mean(axis=1, keepdims=True)
    std = losses.std(axis=1) + 1e-6
    disadv = (losses - mean) / std[:, None]  # (b, 2)
    raw = np.clip(np.abs(p + a - 1.0), 1e-6, 1.0 - 1e-6)
    # d log P / dp = (2a − 1) / P(a|p)
    dlogp = (2.0 * a - 1.0) / raw
    grad = disadv[:, :, None] * dlogp * m
    return grad.reshape(b * 2, t, 1, 1) / (b * 2)  # jnp.mean over (b, p) rollouts


@pytest.mark.parametrize("objective", ["normalized_prod", "log_prob"])
def test_reinforce_gradient_matches_closed_form(objective):
    b, t = 3, 5
    prob, actions, per_sample_loss, mask = _setup(b=b, t=t)
    cfg = LossConfig(rl_objective=objective, use_perceptual=False)

    def rl_mean(prob):
        out = VAEOutput(
            reconstruction=jnp.zeros(()),
            latent=jnp.zeros(()),
            selection_prob=prob,
            selection_mask=actions,
            log_variance=jnp.zeros(()),
            mean=jnp.zeros(()),
            rollouts=2,
        )
        rl, _ = _reinforce_loss(out, per_sample_loss, mask, cfg)
        return jnp.mean(rl)

    value = rl_mean(prob)
    assert float(value) == 0.0  # self-normalized: forward value is identically 0

    grad = jax.grad(rl_mean)(prob)
    expected = _expected_grad(prob, actions, per_sample_loss, mask, b, t)
    np.testing.assert_allclose(np.asarray(grad), expected, rtol=2e-4, atol=2e-5)


def test_gradient_zero_on_padded_frames():
    b, t = 2, 4
    prob, actions, per_sample_loss, _ = _setup(b=b, t=t)
    mask = jnp.zeros((b * 2, t)).at[:, :2].set(1)
    cfg = LossConfig(rl_objective="log_prob", use_perceptual=False)

    def rl_mean(prob):
        out = VAEOutput(
            reconstruction=jnp.zeros(()), latent=jnp.zeros(()),
            selection_prob=prob, selection_mask=actions,
            log_variance=jnp.zeros(()), mean=jnp.zeros(()), rollouts=2,
        )
        return jnp.mean(_reinforce_loss(out, per_sample_loss, mask, cfg)[0])

    grad = np.asarray(jax.grad(rl_mean)(prob))
    assert np.all(grad[:, 2:] == 0.0)  # no gradient through padded frames
    assert np.any(grad[:, :2] != 0.0)
