"""Positional embedding utilities.

create_sinusoidal_embeddings: classic sin/cos table, provided for completeness
and ablations (parity: /root/reference/train/layers.py:57-77, which defines it
but never calls it — the models use RoPE). Interleaved (sin, cos) layout per
frequency, matching the reference's stack-then-reshape construction.
"""

from __future__ import annotations

import jax.numpy as jnp


def create_sinusoidal_embeddings(
    seq_len: int, embed_dim: int, max_timescale: float = 10000.0
) -> jnp.ndarray:
    """(1, seq_len, embed_dim) sinusoidal position table."""
    position = jnp.arange(seq_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, embed_dim, 2, dtype=jnp.float32) * -(jnp.log(max_timescale) / embed_dim)
    )
    scaled = position * div_term[None, :]
    pe = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)], axis=-1).reshape(seq_len, embed_dim)
    return pe[None]
