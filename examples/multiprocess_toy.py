"""Minimal multi-process SPMD example: sharded global sum + one VAE train step.

Parity: the reference's localhost multi-process harness
(/root/reference/claude_distributed/toy.py, distributed_rl_model.py) — each OS
process owns a slice of a global array, jit inserts the cross-process
collectives. Launch with scripts/launch_local_multiprocess.sh.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main() -> None:
    # env var alone is overridden in some environments (see CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
    coord = os.environ["JAX_COORDINATOR_ADDRESS"]
    nprocs = int(os.environ["JAX_NUM_PROCESSES"])
    pid = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(coord, nprocs, pid)

    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    from video_vae_tpu.core.config import DynamicHParams, tiny_config
    from video_vae_tpu.models.vae import VideoVAE
    from video_vae_tpu.parallel.mesh import build_mesh
    from video_vae_tpu.parallel.sharding import shard_process_local_batch
    from video_vae_tpu.train.setup import create_optimizer, create_sharded_model
    from video_vae_tpu.train.step import make_train_step

    mesh = build_mesh(data=-1, fsdp=1, tensor=1)
    print(f"[proc {pid}] {jax.process_count()} processes, {len(jax.devices())} devices")

    # 1. sharded global sum
    local = np.full((2, 4), pid + 1, np.float32)
    batch = shard_process_local_batch({"x": local}, mesh)
    total = float(jax.jit(jnp.sum)(batch["x"]))
    expected = sum(8 * (i + 1) for i in range(nprocs))
    assert total == expected, (total, expected)
    print(f"[proc {pid}] global sum OK: {total}")

    # 2. one data-parallel VAE train step
    cfg = tiny_config()
    model = create_sharded_model(lambda: VideoVAE(cfg.model, nnx.Rngs(0, sampling=1)), mesh)
    opt = create_optimizer(model, cfg.optim, mesh)
    step = make_train_step(cfg.loss, None)
    host = {
        "video": np.random.default_rng(pid).random((2, 8, 32, 32, 3), np.float32).astype(np.float32),
        "mask": np.ones((2, 8), np.float32),
    }
    sharded = shard_process_local_batch(host, mesh)
    metrics = step(model, opt, sharded["video"], sharded["mask"], nnx.Rngs(sampling=0),
                   DynamicHParams.default())
    print(f"[proc {pid}] train step OK, loss={float(metrics['loss']):.4f}")


if __name__ == "__main__":
    main()
