"""Small numeric utilities: PSNR, parameter counting, profiling helpers."""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx


def masked_psnr(
    prediction: jnp.ndarray,
    target: jnp.ndarray,
    frame_mask: Optional[jnp.ndarray] = None,
    max_val: float = 1.0,
) -> jnp.ndarray:
    """PSNR in dB over valid frames of (b,t,h,w,c) videos in [0, max_val]."""
    err = jnp.square((prediction - target).astype(jnp.float32))
    if frame_mask is not None:
        m = frame_mask.astype(jnp.float32).reshape(*frame_mask.shape, 1, 1, 1)
        mse = jnp.sum(err * m) / jnp.maximum(jnp.sum(m) * err.shape[2] * err.shape[3] * err.shape[4], 1.0)
    else:
        mse = jnp.mean(err)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def count_params(module: nnx.Module) -> int:
    params = nnx.state(module, nnx.Param)
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


@contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context (xplane dump) when log_dir is set; else no-op.

    The reference has no profiling hooks (SURVEY.md §5); this is the rebuild's.
    """
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
