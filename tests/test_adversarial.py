"""Adversarial (GAN) training path: discriminator, spectral norm, fused step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from video_vae_tpu.core.config import DynamicHParams, tiny_config
from video_vae_tpu.models.classifier import Discriminator, SpectralNorm
from video_vae_tpu.models.vae import VideoVAE
from video_vae_tpu.train.adversarial import make_adversarial_train_step
from video_vae_tpu.train.setup import create_optimizer, create_sharded_model


def test_spectral_norm_bounds_linear():
    """After a few power iterations σ-normalized layer has unit spectral norm."""
    rngs = nnx.Rngs(0)
    layer = nnx.Linear(16, 8, use_bias=False, rngs=rngs)
    layer.kernel.value = layer.kernel.value * 10.0  # blow up the norm
    sn = SpectralNorm(layer, rngs=rngs, n_steps=3)

    @nnx.jit
    def apply(sn, x):
        return sn(x)

    x = jnp.eye(16)
    for _ in range(5):  # power iteration converges across calls
        y = apply(sn, x)
    # spectral norm of effective operator ≈ 1
    sigma_effective = float(jnp.linalg.svd(np.asarray(y), compute_uv=False)[0])
    assert 0.8 < sigma_effective < 1.2, sigma_effective


def test_discriminator_output_shape():
    disc = nnx.jit(
        lambda: Discriminator(channels=3, base_features=4, num_levels=2,
                              rngs=nnx.Rngs(0), remat=False)
    )()
    x = jax.random.uniform(jax.random.key(0), (2, 4, 32, 32, 3))
    logits = nnx.jit(lambda d, x: d(x))(disc, x)
    assert logits.shape == (2, 1)
    assert jnp.all(jnp.isfinite(logits.astype(jnp.float32)))


@pytest.mark.slow
def test_adversarial_train_step_runs():
    cfg = tiny_config()
    model = create_sharded_model(lambda: VideoVAE(cfg.model, nnx.Rngs(0, sampling=1)))
    opt = create_optimizer(model, cfg.optim)
    disc = nnx.jit(
        lambda: Discriminator(channels=3, base_features=4, num_levels=1,
                              rngs=nnx.Rngs(5), remat=False)
    )()
    disc_opt = create_optimizer(disc, cfg.optim)
    step = make_adversarial_train_step(cfg.loss, None, adversarial_start_step=0)

    video = jax.random.uniform(jax.random.key(0), (2, 8, 32, 32, 3))
    mask = jnp.ones((2, 8))
    metrics = step(
        model, opt, disc, disc_opt, video, mask, nnx.Rngs(sampling=0),
        DynamicHParams.default(), jnp.asarray(0),
    )
    for key in ("loss", "generator_adv_loss", "discriminator_loss", "discriminator_accuracy"):
        assert np.isfinite(float(metrics[key])), key
