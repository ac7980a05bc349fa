"""VideoMAE masked-pretraining family tests."""

import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from video_vae_tpu.core.config import tiny_config
from video_vae_tpu.models.video_mae import VideoMAE, mae_loss


@pytest.fixture(scope="module")
def mae():
    cfg = tiny_config().model
    return nnx.jit(lambda: VideoMAE(cfg, nnx.Rngs(0, sampling=1), mask_ratio=0.75))()


def test_mae_shapes_and_loss(mae):
    video = jax.random.uniform(jax.random.key(0), (2, 8, 32, 32, 3))
    mask = jnp.ones((2, 8)).at[1, 5:].set(0)

    @nnx.jit
    def run(mae, video, mask, rngs):
        out = mae(video, mask, rngs, train=True)
        loss, metrics = mae_loss(out, mask)
        return out, loss, metrics

    out, loss, metrics = run(mae, video, mask, nnx.Rngs(sampling=0))
    assert out.prediction.shape == out.target.shape == (2, 8, 16, 192)
    assert out.token_mask.shape == (2, 8, 16)
    ratio = float(jnp.mean(out.token_mask))
    assert 0.5 < ratio < 0.95  # ~mask_ratio
    assert jnp.isfinite(loss) and float(loss) > 0


def test_mae_eval_unmasked(mae):
    video = jax.random.uniform(jax.random.key(0), (1, 8, 32, 32, 3))
    mask = jnp.ones((1, 8))

    @nnx.jit
    def run(mae, video, mask, rngs):
        return mae(video, mask, rngs, train=False)

    out = run(mae, video, mask, nnx.Rngs(sampling=0))
    assert float(jnp.sum(out.token_mask)) == 0.0


def test_mae_loss_only_counts_masked():
    from video_vae_tpu.models.video_mae import MAEOutput

    pred = jnp.zeros((1, 2, 4, 8))
    target = jnp.zeros((1, 2, 4, 8)).at[0, 0].set(1.0)  # error only in frame 0
    token_mask = jnp.zeros((1, 2, 4)).at[0, 1].set(1.0)  # but only frame 1 masked
    loss, _ = mae_loss(MAEOutput(prediction=pred, target=target, token_mask=token_mask))
    assert float(loss) == 0.0
