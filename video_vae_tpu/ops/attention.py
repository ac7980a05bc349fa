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
        from video_vae_tpu.parallel.sharding import (
            log_dispatch as _log_dispatch,
            mesh_info as _mesh_info,
            shard_map_unchecked as _shard_map,
        )
        from video_vae_tpu.ops.flash_attention import flash_attention

        mesh, axes = _mesh_info(q.shape[0], tensor_safe=False)
        if mesh is not None and axes is None:
            # sharded mesh the kernel can't be batch-mapped onto — XLA's
            # attention is GSPMD-native, so it is the safe path
            pass
        elif mesh is None:
            return flash_attention(q, k, v, mask)
        else:
            # every differentiable operand is batch-sharded, so AD through the
            # shard_map keeps cotangents sharded — no replicated-grad psum risk
            from jax.sharding import PartitionSpec as P

            _log_dispatch("flash_attention", "pallas", axes)
            if mask is None:
                return _shard_map(
                    lambda q, k, v: flash_attention(q, k, v, None),
                    mesh, (P(axes),) * 3, P(axes),
                )(q, k, v)
            return _shard_map(
                flash_attention, mesh, (P(axes),) * 4, P(axes)
            )(q, k, v, mask)
    return jax.nn.dot_product_attention(q, k, v, mask=mask)
