"""Loss-function unit tests: both published variants, masking, GAN, PSNR."""

import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from video_vae_tpu.core.config import DynamicHParams, LossConfig
from video_vae_tpu.losses.losses import (
    discriminator_loss,
    generator_adversarial_loss,
    magnify_negatives,
    vae_loss,
)
from video_vae_tpu.models.vae import VAEOutput
from video_vae_tpu.utils.metrics import masked_psnr


def _fake_output(b=2, t=4, hw=4, c=8, h=8, w=8, rollouts=2, key=0):
    B = b * rollouts
    ks = jax.random.split(jax.random.key(key), 6)
    return VAEOutput(
        reconstruction=jax.random.uniform(ks[0], (B, t, h, w, 3)),
        latent=jax.random.normal(ks[1], (B, t, hw, c)),
        selection_prob=jax.nn.sigmoid(jax.random.normal(ks[2], (B, t, 1, 1))),
        selection_mask=jax.random.bernoulli(ks[3], 0.5, (B, t, 1, 1)).astype(jnp.float32),
        log_variance=jax.random.normal(ks[4], (B, t, hw, c)) * 0.1,
        mean=jax.random.normal(ks[5], (B, t, hw, c)) * 0.1,
        rollouts=rollouts,
    )


@pytest.fixture
def video_mask():
    video = jax.random.uniform(jax.random.key(9), (2, 4, 8, 8, 3))
    mask = jnp.ones((2, 4)).at[1, 3:].set(0)
    return video, mask


@pytest.mark.parametrize("sel", ["square", "abs"])
@pytest.mark.parametrize("rl", ["normalized_prod", "log_prob"])
@pytest.mark.parametrize("kl", ["seq_len", "kept_frames"])
def test_all_variants_finite(video_mask, sel, rl, kl):
    video, mask = video_mask
    cfg = LossConfig(selection_penalty=sel, rl_objective=rl, kl_normalizer=kl,
                     use_perceptual=False)
    out = _fake_output()
    loss, metrics = vae_loss(out, video, mask, DynamicHParams.default(), cfg)
    assert loss.shape == ()
    assert jnp.isfinite(loss)
    for k in ("MSE", "per_sample_MAE", "selection_loss", "kl_loss", "kept_frame_density"):
        assert jnp.isfinite(metrics[k]), k


def test_rl_loss_value_zero_gradient_nonzero(video_mask):
    """Self-normalized REINFORCE: value ≡ 0 in forward, gradient ≠ 0."""
    video, mask = video_mask
    cfg = LossConfig(use_perceptual=False)
    out = _fake_output()

    assert float(vae_loss(out, video, mask, DynamicHParams.default(), cfg)[1]["rl_loss"]) == 0.0

    def loss_wrt_prob(prob):
        o = out.replace(selection_prob=prob)
        return vae_loss(o, video, mask, DynamicHParams.default(), cfg)[0]

    g = jax.grad(loss_wrt_prob)(out.selection_prob)
    assert jnp.any(g != 0)
    assert jnp.all(jnp.isfinite(g))


def test_perfect_reconstruction_mse_zero(video_mask):
    video, mask = video_mask
    out = _fake_output()
    from einops import repeat

    out = out.replace(reconstruction=repeat(video, "b ... -> (b r) ...", r=2))
    _, metrics = vae_loss(
        out, video, mask, DynamicHParams.default(), LossConfig(use_perceptual=False)
    )
    assert float(metrics["MSE"]) == 0.0
    assert float(metrics["per_sample_MAE"]) == 0.0


def test_padded_frames_do_not_contribute(video_mask):
    """Corrupting reconstruction in masked frames must not change the loss."""
    video, mask = video_mask
    out = _fake_output()
    cfg = LossConfig(use_perceptual=False)
    hp = DynamicHParams.default()
    base, _ = vae_loss(out, video, mask, hp, cfg)
    recon_dirty = out.reconstruction.at[3, 3:].set(100.0)  # sample 1 rollouts, padded frames
    dirty, _ = vae_loss(out.replace(reconstruction=recon_dirty), video, mask, hp, cfg)
    assert jnp.allclose(base, dirty, atol=1e-5)


def test_magnify_negatives():
    x = jnp.array([-0.1, 0.1])
    y = magnify_negatives(x, 100.0)
    assert jnp.allclose(y, jnp.array([-10.0, 0.1]))


def test_density_schedule_changes_loss_not_program(video_mask):
    """max_compression_rate is traced — one compile serves every value."""
    video, mask = video_mask
    out = _fake_output()
    cfg = LossConfig(use_perceptual=False)
    fn = jax.jit(lambda hp: vae_loss(out, video, mask, hp, cfg)[1]["selection_loss"])
    l_tight = fn(DynamicHParams.default(max_compression_rate=2.0))
    l_relaxed = fn(DynamicHParams.default(max_compression_rate=10000.0))
    assert fn._cache_size() == 1
    assert not jnp.allclose(l_tight, l_relaxed)


def test_gan_losses():
    real = jnp.array([2.0, 3.0])
    fake = jnp.array([-2.0, -3.0])
    d_loss, acc = discriminator_loss(real, fake)
    assert float(acc) == 1.0
    assert float(d_loss) < 0.3
    g_loss_bad = generator_adversarial_loss(fake)
    g_loss_good = generator_adversarial_loss(real)
    assert float(g_loss_bad) > float(g_loss_good)


def test_masked_psnr():
    x = jnp.zeros((1, 4, 8, 8, 3))
    y = jnp.zeros((1, 4, 8, 8, 3)).at[:, 2:].set(1.0)  # error only in frames 2+
    mask = jnp.ones((1, 4)).at[:, 2:].set(0)
    assert float(masked_psnr(x, y, mask)) > 100  # errors fully masked out
    assert float(masked_psnr(x, y)) < 10
