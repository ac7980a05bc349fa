"""Debug/observability helpers.

Parity: print_max_grad (/root/reference/train/rl_nonadversarial.py:74-92) and
the param_norm probe (/root/reference/claude_distributed/distributed_train.py:482-486),
as jit-safe pure functions instead of in-graph debug prints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx


def global_max_abs(tree) -> jnp.ndarray:
    """max |x| over every leaf of a pytree (gradient explosion probe)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.zeros(())
    return jnp.max(jnp.stack([jnp.max(jnp.abs(l)).astype(jnp.float32) for l in leaves]))


def global_norm(tree) -> jnp.ndarray:
    """Global L2 norm over a pytree (parameter / gradient norm telemetry)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.zeros(())
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)
    )


def param_norm(module: nnx.Module) -> jnp.ndarray:
    return global_norm(nnx.state(module, nnx.Param))
