"""Straight-through estimators and stochastic gates (functional).

Parity targets: round_ste (/root/reference/train/layers.py:226-236) and
GumbelSigmoidSTE (/root/reference/train/layers.py:238-252). These are pure
functions of (logits, key) rather than modules — the PRNG key is explicit, which
keeps the jitted step fully functional and replay-exact across restores.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def round_ste(logits: jnp.ndarray) -> jnp.ndarray:
    """Forward: round to {0,1}; backward: identity (straight-through)."""
    return jnp.round(logits)


def _round_ste_fwd(logits):
    return jnp.round(logits), ()


def _round_ste_bwd(_, g):
    return (g,)


round_ste.defvjp(_round_ste_fwd, _round_ste_bwd)


def gumbel_sigmoid_sample(
    logits: jnp.ndarray,
    key: jax.Array | None,
    *,
    temperature: float = 1.0,
    train: bool = True,
) -> jnp.ndarray:
    """Hard {0,1} sample with straight-through gradients.

    Train: add logistic noise, temperature-sigmoid, STE round. Eval: threshold
    the plain sigmoid at 0.5 (deterministic).
    """
    if train:
        if key is None:
            raise ValueError("gumbel_sigmoid_sample(train=True) requires a PRNG key")
        eps = 1e-20
        u = jax.random.uniform(key, logits.shape, dtype=jnp.float32)
        u = jnp.clip(u, eps, 1.0 - eps)
        logistic_noise = jnp.log(u / (1.0 - u)).astype(logits.dtype)
        return round_ste(jax.nn.sigmoid((logits + logistic_noise) / temperature))
    return jnp.round(jax.nn.sigmoid(logits / temperature))
