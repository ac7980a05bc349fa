"""Training driver: curriculum, schedules, checkpoints, logging — one loop.

Replaces the reference's four copy-pasted driver scripts
(/root/reference/train/rl_nonadversarial.py:216-390,
/root/reference/claude_distributed/distributed_train.py:70-587, plus legacy/)
with a single Trainer that covers single-chip and multi-host SPMD:

* mesh + shardings are declared once (parallel/); the same loop runs on one
  chip, a CPU-simulated mesh, or a pod.
* curriculum (halve batch / double frames per epoch,
  rl_nonadversarial.py:287-295) reshapes only the *host* batches; each shape
  bucket compiles once and is reused across epochs.
* the compression-rate penalty schedule is a traced scalar
  (DynamicHParams), not a recompiling dict mutation (rl_nonadversarial.py:325-326).
* SIGTERM/SIGINT → save checkpoint and exit (distributed_train.py:58-67).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from video_vae_tpu.core.config import DynamicHParams, VAEConfig
from video_vae_tpu.data.pipeline import create_dataloader
from video_vae_tpu.data.video_io import write_video
from video_vae_tpu.models.vae import VideoVAE
from video_vae_tpu.parallel.mesh import mesh_from_config
from video_vae_tpu.parallel.sharding import activate_mesh, shard_process_local_batch
from video_vae_tpu.train.checkpoint import CheckpointManager, GracefulShutdown
from video_vae_tpu.train.metrics import MetricLogger
from video_vae_tpu.train.setup import create_optimizer, create_sharded_model
from video_vae_tpu.train.step import (
    build_perceptual,
    make_eval_step,
    make_reconstruct_fn,
    make_train_step,
)


def maybe_init_distributed() -> None:
    """Env-driven jax.distributed.initialize (TPU pod auto / explicit / none).

    Parity: /root/reference/claude_distributed/claude_changes/claude_rl_nonadversarial.py
    coordinator-env scheme and distributed_train.py:79 TPU auto-discovery.
    """
    if jax.process_count() > 1:
        return  # already initialized
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nprocs = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    try:
        if coord and nprocs and pid:
            jax.distributed.initialize(coord, int(nprocs), int(pid))
        elif len(hostnames.split(",")) > 1:
            # Multi-host TPU pod: auto-discovery (distributed_train.py:79).
            jax.distributed.initialize()
    except RuntimeError as e:
        # Backend already initialized (single-process dev loop) — run single.
        print(f"[trainer] distributed init skipped: {e}")


@dataclass
class EpochPlan:
    batch_size: int
    max_frames: int


def curriculum_plan(cfg: VAEConfig, epoch: int) -> EpochPlan:
    """Halve batch / double frames each epoch up to caps (rl_nonadversarial.py:287-295)."""
    t = cfg.train
    d = cfg.data
    if not t.curriculum:
        return EpochPlan(d.batch_size, d.max_frames)
    max_mult = min(
        int(math.log2(max(1, d.batch_size // t.curriculum_min_batch))),
        max(0, int(math.log2(max(1, t.curriculum_max_frames // d.max_frames))) - 1),
    )
    mult = min(epoch, max(0, max_mult))
    return EpochPlan(
        batch_size=max(t.curriculum_min_batch, d.batch_size // (2**mult)),
        max_frames=min(t.curriculum_max_frames, d.max_frames * (2**mult)),
    )


class Trainer:
    def __init__(
        self,
        cfg: VAEConfig,
        *,
        vgg_weights: Optional[str] = None,
        use_wandb: bool = False,
        restore_from: Optional[str] = None,
        install_signal_handlers: bool = True,
    ):
        self.cfg = cfg
        maybe_init_distributed()
        self.mesh = mesh_from_config(cfg.mesh)
        model_cfg = cfg.model

        with activate_mesh(self.mesh):
            self.model = create_sharded_model(
                lambda: VideoVAE(model_cfg, nnx.Rngs(cfg.train.model_seed, sampling=cfg.train.model_seed + 1)),
                self.mesh,
            )
        self.optimizer = create_optimizer(self.model, cfg.optim, self.mesh)

        self.perceptual_fn = build_perceptual(cfg.loss, vgg_weights)
        self.train_step = make_train_step(
            cfg.loss,
            self.perceptual_fn,
            compute_dtype=model_cfg.compute_dtype(),
            donate=cfg.train.donate_state,
        )
        self.eval_step = make_eval_step(
            cfg.loss, self.perceptual_fn, compute_dtype=model_cfg.compute_dtype()
        )
        self.reconstruct = make_reconstruct_fn(compute_dtype=model_cfg.compute_dtype())
        self.rngs = nnx.Rngs(sampling=cfg.train.seed)
        self.global_step = 0
        self.ckpt = CheckpointManager(cfg.train.checkpoint_dir)
        self.shutdown = GracefulShutdown(install=install_signal_handlers)
        # Full run config goes to wandb/JSONL (parity:
        # /root/reference/claude_distributed/distributed_train.py:144-168).
        import dataclasses as _dc

        self.logger = MetricLogger(
            log_dir=cfg.train.checkpoint_dir,
            use_wandb=use_wandb,
            config=_dc.asdict(cfg),
        )

        self._resumed = False
        if restore_from:
            from video_vae_tpu.train.checkpoint import load_checkpoint

            load_checkpoint(self.model, self.optimizer, restore_from)
            self._resumed = True
        else:
            step = self.ckpt.restore_latest(self.model, self.optimizer)
            if step is not None:
                self.global_step = step
                self._resumed = True

    # ------------------------------------------------------------------

    def _maybe_profile(self) -> None:
        """Capture a jax.profiler xplane trace over the configured step window."""
        t = self.cfg.train
        if not t.profile_dir or jax.process_index() != 0:
            return
        if not getattr(self, "_profiling", False) and self.global_step == t.profile_start_step:
            os.makedirs(t.profile_dir, exist_ok=True)
            jax.profiler.start_trace(t.profile_dir)
            self._profiling = True
        elif (
            getattr(self, "_profiling", False)
            and self.global_step >= t.profile_start_step + t.profile_num_steps
        ):
            jax.profiler.stop_trace()
            self._profiling = False
            print(f"[trainer] profile trace written to {t.profile_dir}")

    def _upload_artifact(self, path: str) -> None:
        """Mirror an artifact to GCS (best-effort, proc 0, non-blocking).

        Failures are logged from a watcher thread rather than swallowed, so a
        misconfigured bucket shows up in the training log instead of as a
        silently-missing upload.
        """
        prefix = self.cfg.train.gcs_upload_prefix
        if not prefix or jax.process_index() != 0:
            return
        import shutil as _shutil
        import subprocess as _subprocess
        import threading as _threading

        if not _shutil.which("gcloud"):
            return
        try:
            proc = _subprocess.Popen(
                ["gcloud", "storage", "cp", "-r", path, prefix.rstrip("/") + "/"],
                stdout=_subprocess.DEVNULL,
                stderr=_subprocess.PIPE,
            )

            def _watch(p=proc, src=path):
                _, err = p.communicate()
                if p.returncode != 0:
                    msg = (err or b"").decode(errors="replace").strip()[-500:]
                    print(f"[trainer] GCS upload of {src} failed (rc={p.returncode}): {msg}")

            _threading.Thread(target=_watch, daemon=True).start()
        except Exception as e:  # uploads must never kill training
            print(f"[trainer] GCS upload failed: {e}")

    def hparams_for_step(self, step: int) -> DynamicHParams:
        t = self.cfg.train
        if self._resumed:
            rate = t.resume_max_compression_rate  # fine-tune relaxation (:265-267)
        elif step > t.negative_penalty_training_steps:
            rate = t.relaxed_max_compression_rate
        else:
            rate = t.initial_max_compression_rate
        return DynamicHParams.default(max_compression_rate=rate)

    def _dump_videos(self, batch, sharded, tag: str, step: int) -> None:
        """Periodic qualitative dump. Recomputes the reconstruction with the
        deterministic inference path on the current batch — the train step no
        longer returns the (2b,t,H,W,3) tensor every step (it was per-step HBM
        + donation back-pressure for a 1-in-video_every consumer)."""
        t = self.cfg.train
        with activate_mesh(self.mesh):
            recon = self.reconstruct(self.model, sharded["video"], sharded["mask"])
            # Deterministic-path reconstruction quality (BASELINE.md acceptance
            # metric) rides with every dump, so quality is tracked per round —
            # not just inside the parity unit test.
            from video_vae_tpu.utils.metrics import masked_psnr

            psnr = masked_psnr(
                recon.astype(jnp.float32),
                sharded["video"].astype(jnp.float32),
                sharded["mask"],
            )
        # *_det: deterministic reconstruct path — THE BASELINE.md 0.1-dB meter
        # (unlike eval_psnr_sampled, which rides the stochastic rollouts).
        self.logger.log({"dump_psnr_det": float(psnr)}, step)
        # All processes materialize (keeps collectives aligned,
        # distributed_train.py:551-557); only proc 0 writes.
        recon_np = np.asarray(jax.device_get(recon), dtype=np.float32)
        if jax.process_index() != 0:
            return
        out_dir = os.path.join(t.video_save_dir, tag)
        os.makedirs(out_dir, exist_ok=True)
        try:
            write_video(
                {"video": recon_np, "mask": batch["mask"]},
                os.path.join(out_dir, f"step{step}_recon.mp4"),
            )
            write_video(
                {"video": batch["video"], "mask": batch["mask"]},
                os.path.join(out_dir, f"step{step}_original.mp4"),
            )
        except Exception as e:  # video IO must never kill training
            print(f"[trainer] video dump failed: {e}")
            return
        self._upload_artifact(out_dir)

    # ------------------------------------------------------------------

    def run_epoch(self, epoch: int) -> bool:
        """One training epoch. Returns False if a shutdown was requested."""
        cfg = self.cfg
        plan = curriculum_plan(cfg, epoch)
        data_cfg = cfg.data.replace(batch_size=plan.batch_size, max_frames=plan.max_frames)
        loader = create_dataloader(
            data_cfg,
            seed=cfg.data.seed + epoch,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
        # Input/compute overlap: the H2D transfer of batch k+1 is issued right
        # after step k is *enqueued* (jax dispatch is asynchronous), so the
        # device never idles waiting on the tunnel/PCIe put. The reference gets
        # the host side of this from grain's 16-deep prefetch
        # (/root/reference/train/dataloader.py:393-418) but still serializes
        # its device_put with the step; here both are overlapped.
        # VVT_H2D_OVERLAP=0 restores the serialized put (A/B + debugging knob:
        # on hosts where the put blocks — e.g. tunneled devices — overlapping
        # holds two device batches live but cannot overlap anything).
        overlap = os.environ.get("VVT_H2D_OVERLAP", "1") != "0"
        batches = iter(loader)

        def fetch_next(to_device: bool = True):
            host_batch = next(batches, None)
            if host_batch is None:
                return None
            if not to_device:
                return host_batch, None
            return host_batch, shard_process_local_batch(host_batch, self.mesh)

        pending = fetch_next(to_device=overlap)
        while pending is not None:
            host_batch, batch = pending
            if batch is None:  # serialized mode: put right before the step
                batch = shard_process_local_batch(host_batch, self.mesh)
            hp = self.hparams_for_step(self.global_step)
            with activate_mesh(self.mesh):
                metrics = self.train_step(
                    self.model, self.optimizer, batch["video"], batch["mask"], self.rngs, hp
                )
            # Step is enqueued; decode + transfer the next batch while it runs.
            pending = fetch_next(to_device=overlap)
            self.global_step += 1
            self._maybe_profile()
            if self.global_step % cfg.train.log_every == 0:
                self.logger.log(metrics, self.global_step)
            if cfg.train.video_every and self.global_step % cfg.train.video_every == 0:
                self._dump_videos(host_batch, batch, f"train/epoch{epoch}", self.global_step)
            if (
                cfg.train.checkpoint_every_steps
                and self.global_step % cfg.train.checkpoint_every_steps == 0
            ):
                self.ckpt.save(self.global_step, self.model, self.optimizer)
                # The manager saves asynchronously: block until the step dir is
                # finalized before mirroring it, or gcloud copies a tmp dir.
                self.ckpt.wait()
                self._upload_artifact(self.ckpt.step_dir(self.global_step))
            if self.shutdown.should_stop:
                self.ckpt.save(self.global_step, self.model, self.optimizer)
                self.ckpt.wait()
                return False
        self.ckpt.save(self.global_step, self.model, self.optimizer)
        # Block until the async save is finalized: run_epoch is a public unit
        # (tools call it directly), and an in-flight save at interpreter exit
        # dies inside orbax's background thread ("cannot schedule new futures
        # after interpreter shutdown") leaving a corrupt step dir (seen in the
        # r3 soak). Seconds per epoch; epochs are hours.
        self.ckpt.wait()
        return True

    def run_eval(self, epoch: int) -> Optional[dict]:
        cfg = self.cfg
        if not cfg.data.eval_dir and not cfg.data.synthetic:
            return None
        plan = curriculum_plan(cfg, epoch)
        data_cfg = cfg.data.replace(batch_size=plan.batch_size, max_frames=plan.max_frames)
        loader = create_dataloader(
            data_cfg,
            seed=cfg.data.seed + 10_000 + epoch,
            base_dir=cfg.data.eval_dir,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
        totals, count = {}, 0
        for i, host_batch in enumerate(loader):
            batch = shard_process_local_batch(host_batch, self.mesh)
            hp = self.hparams_for_step(self.global_step)
            with activate_mesh(self.mesh):
                metrics = self.eval_step(
                    self.model, batch["video"], batch["mask"], self.rngs, hp
                )
            for key, val in metrics.items():
                if getattr(val, "ndim", 1) == 0:
                    totals[key] = totals.get(key, 0.0) + float(val)
            count += 1
        if count == 0:
            return None
        avg = {key: val / count for key, val in totals.items()}
        self.logger.log(avg, self.global_step, prefix="eval_")
        return avg

    def fit(self) -> None:
        try:
            for epoch in range(self.cfg.train.num_epochs):
                if not self.run_epoch(epoch):
                    print("[trainer] graceful shutdown complete")
                    return
                self.run_eval(epoch)
        finally:
            # Drain any in-flight async save even on the exception path — an
            # orphaned save thread dies at interpreter shutdown.
            self.ckpt.wait()
            if getattr(self, "_profiling", False):  # window crossed end-of-run
                jax.profiler.stop_trace()
                self._profiling = False
