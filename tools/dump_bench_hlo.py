"""Dump the optimized HLO of the bench.py chained program (compile is cached).

Usage: python tools/dump_bench_hlo.py /tmp/chained_hlo.txt [K]
Then grep op names from tools/xplane_summary.py output to get shapes.
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import nnx

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chained_hlo.txt"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 11

    from video_vae_tpu.core.config import ModelConfig
    from video_vae_tpu.models.vae import VideoVAE

    cfg = ModelConfig(remat=False)
    graphdef, _ = nnx.split(nnx.eval_shape(lambda: VideoVAE(cfg, nnx.Rngs(0, sampling=1))))
    state = jax.jit(lambda: nnx.split(VideoVAE(cfg, nnx.Rngs(0, sampling=1)))[1])()

    @functools.partial(jax.jit, static_argnums=(3,))
    def chained(state, video, mask, kk):
        def body(v, _):
            model = nnx.merge(graphdef, state)
            mean, _, prob = model.encode(v, mask)
            keep = (prob >= 0.5).astype(mean.dtype)[..., None]
            recon = model.decode(model.blend_fill(mean, keep), mask)
            return recon.astype(v.dtype), ()

        v, _ = jax.lax.scan(body, video, None, length=kk)
        return jnp.sum(v.astype(jnp.float32))

    video = jnp.zeros((2, 16, cfg.height, cfg.width, cfg.channels), jnp.bfloat16)
    mask = jnp.ones((2, 16), jnp.float32)
    compiled = chained.lower(state, video, mask, k).compile()
    text = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(text)
    print(f"wrote {len(text)} bytes to {out_path}")


if __name__ == "__main__":
    main()
