"""Headline benchmark: encode+decode throughput on the flagship model.

Metric (BASELINE.json): clips/sec/chip at 256×256 × 16 frames, deterministic
encode→decode (the latent-caching / serving path). Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` compares against a measured reference number if
``BASELINE_MEASURED.json`` exists (written by tools/measure_reference.py, which
runs the reference's own JAX model on the same chip); otherwise 1.0.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
from flax import nnx

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 2
FRAMES = 16
WARMUP = 3
ITERS = 20


def main() -> None:
    from video_vae_tpu.core.config import ModelConfig
    from video_vae_tpu.models.vae import VideoVAE

    cfg = ModelConfig()  # flagship: 256×256, p16, enc9/dec12 (reference prod config)
    graphdef, state_shapes = nnx.split(
        nnx.eval_shape(lambda: VideoVAE(cfg, nnx.Rngs(0, sampling=1)))
    )

    def init_state():
        _, s = nnx.split(VideoVAE(cfg, nnx.Rngs(0, sampling=1)))
        return s

    state = jax.jit(init_state)()

    @jax.jit
    def reconstruct(state, video, mask):
        model = nnx.merge(graphdef, state)
        mean, _, prob = model.encode(video, mask)
        keep = (prob >= 0.5).astype(mean.dtype)[..., None]
        return model.decode(model.blend_fill(mean, keep), mask)

    key = jax.random.key(0)
    video = jax.random.uniform(
        key, (BATCH, FRAMES, cfg.height, cfg.width, cfg.channels), jnp.bfloat16
    )
    mask = jnp.ones((BATCH, FRAMES), jnp.float32)

    for _ in range(WARMUP):
        reconstruct(state, video, mask).block_until_ready()

    start = time.perf_counter()
    for _ in range(ITERS):
        out = reconstruct(state, video, mask)
    out.block_until_ready()
    elapsed = time.perf_counter() - start

    clips_per_sec = BATCH * ITERS / elapsed

    baseline_path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    vs_baseline = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        ref_value = ref.get("clips_per_sec_per_chip")
        if ref_value:
            vs_baseline = clips_per_sec / ref_value

    print(
        json.dumps(
            {
                "metric": "encode+decode throughput, 256x256x16f flagship VAE",
                "value": round(clips_per_sec, 4),
                "unit": "clips/sec/chip",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
