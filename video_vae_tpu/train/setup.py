"""Model/optimizer construction with sharded-at-init parameters.

The reference initializes the full model on one device and then device_puts a
replicated copy (/root/reference/claude_distributed/distributed_train.py:375-382)
— fine for replication, but it would OOM for genuinely sharded params. Here
initialization itself is jitted with ``out_shardings`` derived from the param
rules, so every parameter materializes directly on its own shard (GSPMD-style
init) and the same code path covers replicated, FSDP, and TP layouts.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax
from flax import nnx
from jax.sharding import Mesh

from video_vae_tpu.core.config import OptimConfig
from video_vae_tpu.parallel.sharding import param_shardings


def create_sharded_model(model_fn: Callable[[], nnx.Module], mesh: Optional[Mesh] = None):
    """Initialize a model directly onto mesh shards (or plainly, if mesh=None)."""
    if mesh is None:
        return nnx.jit(model_fn)()
    abs_model = nnx.eval_shape(model_fn)
    graphdef, abs_state = nnx.split(abs_model)
    shardings = param_shardings(abs_state, mesh)

    def pure_init():
        _, state = nnx.split(model_fn())
        return state

    state = jax.jit(pure_init, out_shardings=shardings)()
    return nnx.merge(graphdef, state)


def make_lr_schedule(cfg: OptimConfig) -> optax.Schedule:
    """Warmup-cosine (/root/reference/train/rl_nonadversarial.py:241-247)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=max(1, int(cfg.warmup_steps)),
        decay_steps=cfg.decay_steps,
        end_value=cfg.learning_rate * cfg.end_value_factor,
    )


def make_tx(cfg: OptimConfig) -> optax.GradientTransformation:
    """Global-norm clip + Adam (/root/reference/train/rl_nonadversarial.py:248-251)."""
    return optax.chain(
        optax.clip_by_global_norm(cfg.clip_global_norm),
        optax.adam(learning_rate=make_lr_schedule(cfg), b1=cfg.b1, b2=cfg.b2),
    )


def create_optimizer(
    model: nnx.Module, cfg: OptimConfig, mesh: Optional[Mesh] = None
) -> nnx.Optimizer:
    """nnx.Optimizer with optimizer state sharded like its parameters."""
    tx = make_tx(cfg)

    @nnx.jit
    def make(model):
        return nnx.Optimizer(model, tx, wrt=nnx.Param)

    optimizer = make(model)
    if mesh is not None:
        graphdef, state = nnx.split(optimizer)
        shardings = param_shardings(state, mesh)
        state = jax.device_put(state, shardings)
        optimizer = nnx.merge(graphdef, state)
    return optimizer
