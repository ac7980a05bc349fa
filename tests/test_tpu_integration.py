"""On-TPU integration tests (tier 3; parity with the reference's
claude_distributed/test_distributed.py run on real chips).

These run only when a real TPU is visible WITHOUT the CPU-simulation env that
conftest.py sets — i.e. invoke directly:

    JAX_PLATFORMS='' python -m pytest tests/test_tpu_integration.py -q --override-ini addopts=''

Under the default suite (JAX_PLATFORMS=cpu) they are skipped.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

tpu_only = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs a real TPU chip"
)


@tpu_only
def test_flash_attention_on_chip():
    from video_vae_tpu.ops.flash_attention import flash_attention

    B, S, H, D = 4, 64, 2, 64
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
    mask = jnp.zeros((B, 1, 1, S), bool).at[..., :48].set(True)
    ref = jax.jit(lambda *a: jax.nn.dot_product_attention(a[0], a[1], a[2], mask=a[3]))(
        q, k, v, mask
    )
    out = jax.jit(lambda *a: flash_attention(*a))(q, k, v, mask)
    diff = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    assert diff < 5e-3, diff


@tpu_only
def test_train_step_on_chip():
    from video_vae_tpu.core.config import DynamicHParams, tiny_config
    from video_vae_tpu.models.vae import VideoVAE
    from video_vae_tpu.train.setup import create_optimizer, create_sharded_model
    from video_vae_tpu.train.step import make_train_step

    cfg = tiny_config()
    model = create_sharded_model(lambda: VideoVAE(cfg.model, nnx.Rngs(0, sampling=1)))
    opt = create_optimizer(model, cfg.optim)
    step = make_train_step(cfg.loss, None)
    video = jax.random.uniform(jax.random.key(0), (2, 8, 32, 32, 3))
    mask = jnp.ones((2, 8))
    losses = [
        float(step(model, opt, video, mask, nnx.Rngs(sampling=1), DynamicHParams.default())["loss"])
        for _ in range(5)
    ]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
