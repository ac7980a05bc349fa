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

    # 3. multi-host checkpoint: orbax-native distributed save + restore +
    # resume exactness (replaces the reference's numpy-materialize + proc-0
    # restore + broadcast workaround, distributed_train.py:314-341).
    import shutil

    from jax.experimental import multihost_utils

    from video_vae_tpu.train.checkpoint import CheckpointManager

    ckpt_dir = os.environ.get("TOY_CKPT_DIR", f"/tmp/vvt_toy_ckpt_{coord.split(':')[-1]}")
    if pid == 0 and os.path.exists(ckpt_dir):
        shutil.rmtree(ckpt_dir)
    multihost_utils.sync_global_devices("ckpt_dir_clean")

    mngr = CheckpointManager(ckpt_dir, max_to_keep=1)
    mngr.save(1, model, opt)
    mngr.wait()

    # advance the ORIGINAL state one more step → the post-restore target
    after = step(model, opt, sharded["video"], sharded["mask"], nnx.Rngs(sampling=7),
                 DynamicHParams.default())
    loss_resumed_truth = float(after["loss"])

    # restore into a FRESH model/optimizer (different init), resume, compare
    model2 = create_sharded_model(
        lambda: VideoVAE(cfg.model, nnx.Rngs(123, sampling=124)), mesh
    )
    opt2 = create_optimizer(model2, cfg.optim, mesh)
    restored_step = CheckpointManager(ckpt_dir, max_to_keep=1).restore_latest(model2, opt2)
    assert restored_step == 1, restored_step
    after2 = step(model2, opt2, sharded["video"], sharded["mask"], nnx.Rngs(sampling=7),
                  DynamicHParams.default())
    np.testing.assert_allclose(
        float(after2["loss"]), loss_resumed_truth, rtol=1e-6,
        err_msg="post-restore step diverged from the original trajectory",
    )
    print(f"[proc {pid}] multi-host checkpoint save/restore/resume-exactness OK")
    multihost_utils.sync_global_devices("ckpt_done")
    if pid == 0:
        shutil.rmtree(ckpt_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
