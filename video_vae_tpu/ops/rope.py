"""NTK-scaled rotary position embeddings, stateless.

Semantics match /root/reference/train/layers.py:80-129 (ntk_base = base *
alpha^(d/(d-2)); freqs concatenated, rotate-half application), but instead of
caching an 8192-entry table in module state and dynamic-slicing it per call, the
table is computed at trace time for the static sequence length — XLA
constant-folds it, so it costs nothing at runtime and nothing in HBM beyond the
(seq, head_dim) constants actually used.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def rope_tables(
    seq_len: int,
    head_dim: int,
    base: float = 10000.0,
    alpha: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables of shape (seq_len, head_dim), float32."""
    ntk_base = base * (alpha ** (head_dim / (head_dim - 2)))
    inv_freq = 1.0 / (ntk_base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    emb = jnp.concatenate((freqs, freqs), axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate((-x2, x1), axis=-1)


def apply_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    *,
    base: float = 10000.0,
    alpha: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate q, k of shape (batch, seq, heads, head_dim)."""
    seq_len, head_dim = q.shape[1], q.shape[-1]
    cos, sin = rope_tables(seq_len, head_dim, base, alpha)
    cos = cos[None, :, None, :].astype(q.dtype)
    sin = sin[None, :, None, :].astype(q.dtype)
    q_rot = q * cos + _rotate_half(q) * sin
    k_rot = k * cos + _rotate_half(k) * sin
    return q_rot, k_rot
