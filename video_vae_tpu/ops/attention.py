"""Masked scaled-dot-product attention dispatch.

One entry point for every attention in the framework. ``impl="xla"`` lowers to
``jax.nn.dot_product_attention`` (XLA fuses the softmax chain and tiles the
matmuls onto the MXU). ``impl="pallas"`` uses the fused flash-attention TPU
kernel in :mod:`video_vae_tpu.ops.flash_attention`, falling back to XLA on
non-TPU backends so the same model code runs in CPU-simulated tests.

Parity: jax.nn.dot_product_attention(q, k, v, mask) at
/root/reference/train/layers.py:168.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def masked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    impl: str = "xla",
) -> jnp.ndarray:
    """Attention over (batch, seq, heads, head_dim) with optional key mask.

    mask: bool, broadcastable to (batch, heads, q_seq, kv_seq); True = attend.
    """
    if impl == "pallas" and _on_tpu():
        from video_vae_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, mask)
    return jax.nn.dot_product_attention(q, k, v, mask=mask)
