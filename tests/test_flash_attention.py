"""Pallas fused-attention kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import pytest

from video_vae_tpu.ops.flash_attention import flash_attention


def _inputs(B=2, S=16, H=2, D=32, masked=True):
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.float32)
    mask = None
    if masked:
        mask = jnp.zeros((B, 1, 1, S), bool).at[..., : S * 3 // 4].set(True)
    return q, k, v, mask


@pytest.mark.parametrize("masked", [True, False])
def test_flash_forward_matches_xla(masked):
    q, k, v, mask = _inputs(masked=masked)
    ref = jax.nn.dot_product_attention(q, k, v, mask=mask)
    out = jax.jit(lambda q, k, v, m: flash_attention(q, k, v, m, interpret=True))(
        q, k, v, mask
    )
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-3


def test_flash_backward_matches_xla():
    q, k, v, mask = _inputs()

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v, mask=mask) ** 2)

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(gf, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        assert float(jnp.max(jnp.abs(a - b))) / scale < 5e-3


def test_flash_batch_padding():
    """Batch not divisible by the kernel's block size still works."""
    q, k, v, mask = _inputs(B=3)
    ref = jax.nn.dot_product_attention(q, k, v, mask=mask)
    out = jax.jit(lambda q, k, v, m: flash_attention(q, k, v, m, interpret=True))(
        q, k, v, mask
    )
    assert out.shape == ref.shape
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-3
