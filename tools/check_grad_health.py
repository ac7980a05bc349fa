"""Gradient-health diagnostic: per-parameter non-finite-gradient census.

Runs one full train objective (rollouts + losses, optional perceptual) at a
configurable model size and reports, per parameter leaf, how many gradient
elements are non-finite — the tool that root-caused the round-3 "remat NaN"
finding (a zeros-input probe artifact: constant tokens give every LayerNorm
variance ≈ 0, so each LN backward carries a ~rsqrt(eps)=1e3 Jacobian and the
cotangent overflows bf16 a few blocks in; the reference model reproduces the
same counts run in place — see PERF.md).

Because of that artifact the default input is RANDOM video. --video zeros
exists to reproduce the degenerate case deliberately.

Examples:
    python tools/check_grad_health.py                      # flagship, random
    python tools/check_grad_health.py --hw 64 --video zeros --no-remat
    python tools/check_grad_health.py --attn xla --no-perceptual
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--hw", type=int, default=256, help="spatial size")
    parser.add_argument("--frames", type=int, default=16)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--video", choices=["random", "zeros"], default="random")
    parser.add_argument("--attn", choices=["fused", "pallas", "xla"], default="fused")
    parser.add_argument("--no-remat", dest="remat", action="store_false")
    parser.add_argument("--no-perceptual", dest="perceptual", action="store_false")
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    parser.add_argument("--top", type=int, default=30, help="worst leaves to print")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flax import nnx

    from video_vae_tpu.core.config import DynamicHParams, LossConfig, ModelConfig
    from video_vae_tpu.losses.losses import vae_loss
    from video_vae_tpu.models.vae import VideoVAE
    from video_vae_tpu.train.step import build_perceptual

    loss_cfg = LossConfig()
    perc = build_perceptual(loss_cfg, None) if args.perceptual else None
    hp = DynamicHParams.default()
    cfg = ModelConfig(
        remat=args.remat, height=args.hw, width=args.hw, attention_impl=args.attn
    )
    model = VideoVAE(cfg, nnx.Rngs(0, sampling=1))
    shape = (args.batch, args.frames, args.hw, args.hw, 3)
    if args.video == "zeros":
        video = jnp.zeros(shape, jnp.float32)
    else:
        video = jax.random.uniform(jax.random.key(3), shape)
    mask = jnp.ones((args.batch, args.frames), jnp.float32)

    @nnx.jit
    def gradstep(model, video, mask, rngs, hp):
        def loss_for_grad(model, rngs):
            out = model(video.astype(jnp.bfloat16), mask, rngs, train=True)
            loss, _ = vae_loss(out, video.astype(jnp.bfloat16), mask, hp, loss_cfg, perc)
            return loss

        loss, grads = nnx.value_and_grad(loss_for_grad)(model, rngs)
        flat = nnx.to_flat_state(grads)
        bad = {
            "/".join(str(k) for k in path): jnp.sum(~jnp.isfinite(g.astype(jnp.float32)))
            for path, g in flat
        }
        gnorm = jnp.sqrt(
            sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for _, g in flat)
        )
        return loss, sum(bad.values()), gnorm, bad

    loss, total_bad, gnorm, bad = gradstep(model, video, mask, nnx.Rngs(sampling=42), hp)
    print(
        f"[grad-health] hw={args.hw} f={args.frames} video={args.video} "
        f"attn={args.attn} remat={args.remat} perceptual={args.perceptual}: "
        f"loss={float(loss):.5f} bad_grads={int(total_bad)} gnorm={float(gnorm):.4g}",
        flush=True,
    )
    if int(total_bad):
        items = sorted(((int(v), k) for k, v in bad.items() if int(v)), reverse=True)
        for v, k in items[: args.top]:
            print(f"    BAD {v:>12,}  {k}")
        print(f"    ({len(items)} leaves with non-finite gradients)")
        sys.exit(1)
    print("[grad-health] all gradients finite")


if __name__ == "__main__":
    main()
