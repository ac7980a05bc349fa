"""Sustained Trainer soak + remat compile probe on the real chip.

Two jobs (VERDICT r2 next-items #4 and #9):

* ``--soak`` (default): run the PRODUCTION loop — ``Trainer.run_epoch`` with
  synthetic data, curriculum on, remat per config — across two curriculum
  buckets (b2x16f, b1x32f), recording per-bucket first-step wall time
  (compile) and steady steps/s, compile count, and device peak memory.
  Optionally ``--profile DIR`` captures an xplane trace via the Trainer's own
  profile hooks.
* ``--compile-only``: walk the 16/32/64-frame buckets and wall-time ONE
  train_step call each through the Trainer's step (compile + first step),
  answering whether the remat graph compiles at flagship shapes at all
  (the scan-chained bench diverged; the Trainer path is the production one).

Timing notes (CLAUDE.md): host fetches through the tunnel cost seconds and
block_until_ready does not block, so steady-state steps/s is measured as a
SLOPE — wall time for the first K1 steps vs all K2 steps of an epoch, one
scalar fetch at each boundary — which cancels the constant fetch overhead.

Reference workload being modeled: the curriculum loop at
/root/reference/train/rl_nonadversarial.py:283-326 (remat-free torch-equiv).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")


def device_peak_mb():
    """Peak HBM in MB, or None when the backend exposes no memory_stats()
    (the tunneled axon device returns an empty dict — recording 0.0 would
    assert a measurement that never happened, VERDICT r4 weak #3)."""
    import jax

    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    return None if peak is None else peak / 1e6


def measure_host_ingest(trainer, plan, seed: int) -> float:
    """Wall ms/batch of the DATA PATH alone (decode + collate, no device work).

    The soak's steady ms/step on this 1-core sandbox is dominated by synthetic
    host ingest, not the device step; recording this next to the steady wall
    makes the artifact self-attributing (steady ≈ ingest + put + step-enqueue;
    the device step itself is measured by tools/bench_train_step.py)."""
    from video_vae_tpu.data.pipeline import create_dataloader

    data_cfg = trainer.cfg.data.replace(
        batch_size=plan.batch_size, max_frames=plan.max_frames
    )
    loader = create_dataloader(data_cfg, seed=seed)
    n, t0 = 0, time.perf_counter()
    for _ in loader:
        n += 1
    return (time.perf_counter() - t0) / max(1, n) * 1e3


def fetch_scalar(metrics) -> float:
    import jax

    return float(jax.device_get(metrics["loss"]))


def build_trainer(args, batch_size: int, max_frames: int, curriculum: bool):
    from video_vae_tpu.core.config import (
        DataConfig,
        LossConfig,
        ModelConfig,
        TrainConfig,
        VAEConfig,
    )
    from video_vae_tpu.train.trainer import Trainer

    cfg = VAEConfig(
        model=ModelConfig(
            remat=args.remat, scan_rollout_decode=args.scan_rollout
        ),
        loss=LossConfig(vgg_layout=args.vgg_layout),
        data=DataConfig(
            synthetic=True,
            synthetic_num_clips=args.clips,
            batch_size=batch_size,
            max_frames=max_frames,
        ),
        train=TrainConfig(
            curriculum=curriculum,
            curriculum_max_frames=64,
            num_epochs=2,
            log_every=10_000,  # no mid-epoch host fetches
            video_every=0,
            checkpoint_every_steps=0,
            checkpoint_dir=args.workdir,
            video_save_dir=args.workdir,
            profile_dir=args.profile,
            profile_start_step=args.profile_start,
            profile_num_steps=5,
        ),
    )
    return Trainer(cfg, install_signal_handlers=False)


def compile_only(args) -> None:
    """Wall-time compile+first-step of the Trainer train_step per frame bucket."""
    import jax
    from flax import nnx

    from video_vae_tpu.core.config import DynamicHParams

    trainer = build_trainer(args, 1, 16, curriculum=False)
    results = {}
    for frames in args.buckets:
        # random, NOT zeros: constant tokens give LN variance ≈ 0 and the
        # backward cotangent overflows bf16 (PERF.md "remat NaN grads", r3) —
        # the Adam update after step 1 would poison every later bucket
        video = jax.random.uniform(
            jax.random.key(frames), (1, frames, 256, 256, 3), jax.numpy.float32
        )
        mask = jax.numpy.ones((1, frames), bool)
        hp = DynamicHParams.default()
        t0 = time.perf_counter()
        metrics = trainer.train_step(
            trainer.model, trainer.optimizer, video, mask, trainer.rngs, hp
        )
        loss = fetch_scalar(metrics)
        wall = time.perf_counter() - t0
        results[frames] = wall
        peak = device_peak_mb()
        peak_str = "unmeasured" if peak is None else f"{peak:.0f} MB"
        print(
            f"[soak] b1x{frames}f remat={args.remat}: compile+first step "
            f"{wall:.1f}s, loss={loss:.4f}, peak {peak_str}",
            flush=True,
        )
    print(json.dumps({"compile_only": results, "remat": args.remat}))


def soak(args) -> None:
    """Curriculum epochs through Trainer.run_epoch, slope-timed.

    ``--batch B --frames F`` pins a single bucket instead (curriculum off) —
    used for the sustained 64-frame run (the production curriculum tail,
    /root/reference/train/rl_nonadversarial.py:287-295): proving the
    perceptual-checkpoint memory fix holds across tens of consecutive Adam
    steps with data variation, not just compile+first-step.
    """
    import numpy as np

    fixed = args.batch is not None or args.frames is not None
    trainer = build_trainer(
        args, args.batch or 2, args.frames or 16, curriculum=not fixed
    )

    # Instrument the step boundary: wrap train_step to count steps and stamp
    # wall clocks at K1 and at end-of-epoch (one fetch each — slope method).
    inner = trainer.train_step
    state = {"steps": 0, "stamps": []}
    k1 = args.warm_steps

    def stamped(model, optimizer, video, mask, rngs, hp):
        metrics = inner(model, optimizer, video, mask, rngs, hp)
        state["steps"] += 1
        if state["steps"] in (1, k1):
            loss = fetch_scalar(metrics)  # drains the queue up to here
            state["stamps"].append((state["steps"], time.perf_counter(), loss))
        return metrics

    trainer.train_step = stamped

    report = {"remat": args.remat, "epochs": []}
    for epoch in range(args.epochs):
        from video_vae_tpu.train.trainer import curriculum_plan

        plan = curriculum_plan(trainer.cfg, epoch)
        state["steps"], state["stamps"] = 0, []
        t0 = time.perf_counter()
        trainer.run_epoch(epoch)
        # drain: fetch a param scalar so the epoch's tail is actually done
        import jax
        from flax import nnx

        leaf = jax.tree_util.tree_leaves(nnx.state(trainer.model, nnx.Param))[0]
        float(np.asarray(jax.device_get(leaf))[(0,) * leaf.ndim])
        t_end = time.perf_counter()
        (s1, w1, loss1) = state["stamps"][0]
        (sk, wk, lossk) = state["stamps"][1] if len(state["stamps"]) > 1 else (
            s1, w1, loss1
        )
        steps = state["steps"]
        compile_s = w1 - t0
        steady = (t_end - wk) / max(1, steps - sk)
        peak = device_peak_mb()
        ingest_ms = measure_host_ingest(
            trainer, plan, seed=trainer.cfg.data.seed + epoch
        )
        entry = {
            "bucket": f"b{plan.batch_size}x{plan.max_frames}f",
            "steps": steps,
            "compile_plus_first_step_s": round(compile_s, 1),
            "steady_ms_per_step": round(steady * 1e3, 1),
            # attribution: host-side decode+collate wall per batch, measured on
            # the same loader config with no device work — on this 1-core
            # sandbox it dominates the steady wall (device step time is the
            # bench_train_step number, recorded in PERF.md/BENCH)
            "host_ingest_ms_per_batch": round(ingest_ms, 1),
            "steps_per_sec": round(1.0 / steady, 3),
            "clips_per_sec": round(plan.batch_size / steady, 3),
            "final_loss": lossk,
            "peak_mb": None if peak is None else round(peak, 0),
        }
        if peak is None:
            entry["peak_mb_note"] = (
                "device memory_stats() is empty through the axon tunnel — "
                "peak HBM unmeasured (not zero)"
            )
        report["epochs"].append(entry)
        print(f"[soak] epoch {epoch}: {entry}", flush=True)
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
            f.write("\n")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--compile-only", action="store_true")
    parser.add_argument("--buckets", type=int, nargs="+", default=[16, 32, 64])
    parser.add_argument("--no-remat", dest="remat", action="store_false")
    parser.add_argument("--scan-rollout", dest="scan_rollout", action="store_true")
    parser.add_argument("--vgg_layout", default="nhwc", choices=["nhwc", "cf"])
    parser.add_argument("--clips", type=int, default=100)
    parser.add_argument("--batch", type=int, default=None,
                        help="pin the soak to one bucket (with --frames)")
    parser.add_argument("--frames", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--warm_steps", type=int, default=6)
    parser.add_argument("--workdir", default="/tmp/vvt_soak")
    parser.add_argument("--profile", default=None)
    parser.add_argument("--profile_start", type=int, default=10)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    if args.compile_only:
        compile_only(args)
    else:
        soak(args)


if __name__ == "__main__":
    main()
