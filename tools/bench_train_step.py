"""Slope-timed FULL training step of the flagship model on the real chip.

Covers the complete workload: rollout-duplicated forward, truncated-VGG
perceptual loss, all loss terms, backward, Adam update — chained K times inside
one lax.scan over functional (model, optimizer) state so the tunnel's constant
overhead cancels (see bench.py). remat is off (memory fits at this batch; remat
cannot cross scan).

    python tools/bench_train_step.py [--frames 16] [--batch 1]

The measurement core (``build_chained`` / ``measure``) is also consumed by
bench.py so the driver-visible BENCH json carries the train-step number next
to the forward headline (VERDICT r4 #5).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flax import nnx

from video_vae_tpu.core.config import DynamicHParams, LossConfig, ModelConfig, OptimConfig
from video_vae_tpu.losses.losses import vae_loss
from video_vae_tpu.models.vae import VideoVAE
from video_vae_tpu.train.setup import make_tx
from video_vae_tpu.train.step import build_perceptual


def build_chained(batch=1, frames=16, *, perceptual=True, vgg_layout="nhwc", remat=False):
    """Build the scan-chained train step. Returns (chained, states, inputs):
    ``chained(m_state, o_state, video, mask, k)`` runs k donated steps and
    returns (scalar, m_state, o_state)."""
    cfg = ModelConfig(remat=remat)
    loss_cfg = LossConfig(use_perceptual=perceptual, vgg_layout=vgg_layout)
    perceptual_fn = build_perceptual(loss_cfg)
    tx = make_tx(OptimConfig())

    model = nnx.jit(lambda: VideoVAE(cfg, nnx.Rngs(0, sampling=1)))()
    optimizer = nnx.jit(lambda m: nnx.Optimizer(m, tx, wrt=nnx.Param))(model)
    m_def, m_state = nnx.split(model)
    o_def, o_state = nnx.split(optimizer)

    video = jax.random.uniform(
        jax.random.key(0), (batch, frames, cfg.height, cfg.width, cfg.channels), jnp.bfloat16
    )
    mask = jnp.ones((batch, frames), jnp.float32)
    hp = DynamicHParams.default()

    @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(0, 1))
    def chained(m_state, o_state, video, mask, k):
        def body(carry, i):
            m_state, o_state = carry
            model = nnx.merge(m_def, m_state)
            optimizer = nnx.merge(o_def, o_state)
            rngs = nnx.Rngs(sampling=jax.random.fold_in(jax.random.key(7), i))

            def loss_fn(model, rngs):
                out = model(video, mask, rngs, train=True)
                loss, _ = vae_loss(out, video, mask, hp, loss_cfg, perceptual_fn)
                return loss

            loss, grads = nnx.value_and_grad(loss_fn)(model, rngs)
            optimizer.update(model, grads)
            _, m_state2 = nnx.split(model)
            _, o_state2 = nnx.split(optimizer)
            return (m_state2, o_state2), loss

        (m_state, o_state), losses = jax.lax.scan(
            body, (m_state, o_state), jnp.arange(k)
        )
        return jnp.sum(losses), m_state, o_state

    return chained, (m_state, o_state), (video, mask)


def measure(batch=1, frames=16, *, perceptual=True, vgg_layout="nhwc",
            remat=False, repeats=5, k_short=1, k_long=5):
    """Slope-timed ms/step estimate (utils.timing.RobustEstimate)."""
    chained, (m_state, o_state), (video, mask) = build_chained(
        batch, frames, perceptual=perceptual, vgg_layout=vgg_layout, remat=remat
    )

    # donation means we must re-feed the returned states every call
    def timed_feeding(k):
        nonlocal m_state, o_state
        t0 = time.perf_counter()
        total, m_state, o_state = chained(m_state, o_state, video, mask, k)
        float(total)
        return time.perf_counter() - t0

    timed_feeding(k_short)  # warmup/compile both chain lengths
    timed_feeding(k_long)

    from video_vae_tpu.utils.timing import robust_slope

    return robust_slope(
        lambda: timed_feeding(k_short),
        lambda: timed_feeding(k_long),
        k_short,
        k_long,
        repeats=repeats,
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=16)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--no_perceptual", action="store_true")
    parser.add_argument("--vgg_layout", default="nhwc", choices=["nhwc", "cf"],
                        help="perceptual-conv layout A/B (LossConfig.vgg_layout)")
    parser.add_argument("--remat", action="store_true",
                        help="config-gated per-block remat (what long-clip "
                        "curriculum training pays for memory). WARNING: the "
                        "remat graph inside this tool's scan-chained timing "
                        "loop did not finish compiling in 50 min on v5e — "
                        "measure remat steps through the Trainer instead")
    parser.add_argument("--profile", metavar="DIR", default=None,
                        help="dump an xplane trace of the timed region")
    parser.add_argument("--dump-hlo", metavar="FILE", default=None,
                        help="write the optimized HLO of the chained step "
                        "(k=5, the program the xplane trace names come from) "
                        "and exit without timing")
    args = parser.parse_args()
    b, t = args.batch, args.frames

    if args.dump_hlo or args.profile:
        chained, (m_state, o_state), (video, mask) = build_chained(
            b, t, perceptual=not args.no_perceptual,
            vgg_layout=args.vgg_layout, remat=args.remat,
        )
        if args.dump_hlo:
            compiled = chained.lower(m_state, o_state, video, mask, 5).compile()
            with open(args.dump_hlo, "w") as f:
                f.write(compiled.as_text())
            print(f"[bench_train_step] optimized HLO → {args.dump_hlo}")
            return
        from video_vae_tpu.utils.metrics import profile_trace

        # compile + warm BOTH programs fully outside the trace: starting the
        # profiler with a pending multi-minute remote compile hung the r5
        # first attempt for >40 min (the old flow always profiled last)
        total, m_state, o_state = chained(m_state, o_state, video, mask, 1)
        float(total)
        total, m_state, o_state = chained(m_state, o_state, video, mask, 5)
        float(total)
        with profile_trace(args.profile):
            total, m_state, o_state = chained(m_state, o_state, video, mask, 5)
            float(total)
        print(f"[bench_train_step] xplane trace → {args.profile}")
        return

    print("[bench_train_step] compiling (fwd+bwd, this is the big one)...", flush=True)
    est = measure(
        b, t, perceptual=not args.no_perceptual,
        vgg_layout=args.vgg_layout, remat=args.remat,
    )
    per_step = est.per_step
    print(f"[bench_train_step] {est.summary()}")
    msg = (
        f"[bench_train_step] flagship train step b{b}x{t}f: {per_step*1e3:.1f} ms "
        f"({b / per_step:.3f} clips/sec/chip), perceptual={not args.no_perceptual}, "
        f"remat={args.remat}"
    )
    # reference denominator: tools/measure_reference.py --train-only
    import json

    baseline_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_MEASURED.json",
    )
    if os.path.exists(baseline_path) and b == 1 and t == 16 and not args.remat:
        ref_ms = json.load(open(baseline_path)).get("train_step", {}).get("ms_per_step")
        if ref_ms:
            msg += f" | reference {ref_ms:.0f} ms → {ref_ms / (per_step*1e3):.2f}x"
    print(msg)


if __name__ == "__main__":
    main()
