"""Component-level slope timing of the flagship forward on the real chip.

Answers: where do the ~100ms go — transformer blocks (matmuls/attention),
the 3D-conv UNet, or glue (patch (un)embedding, transposes)? Uses the same
chain-inside-scan slope methodology as bench.py (tunnel-safe).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import nnx

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH, FRAMES = 2, 16
K_SHORT, K_LONG = 1, 9


def slope(fn, *args):
    def timed(k):
        t0 = time.perf_counter()
        float(fn(*args, k))
        return time.perf_counter() - t0

    timed(K_SHORT)
    timed(K_LONG)
    vals = []
    for _ in range(2):
        vals.append((timed(K_LONG) - timed(K_SHORT)) / (K_LONG - K_SHORT))
    return min(vals)


def main() -> None:
    from video_vae_tpu.core.config import ModelConfig
    from video_vae_tpu.models.vae import VideoVAE, frame_mask_to_attention

    cfg = ModelConfig(remat=False)
    graphdef, _ = nnx.split(nnx.eval_shape(lambda: VideoVAE(cfg, nnx.Rngs(0, sampling=1))))
    state = jax.jit(lambda: nnx.split(VideoVAE(cfg, nnx.Rngs(0, sampling=1)))[1])()

    mask = jnp.ones((BATCH, FRAMES), jnp.float32)
    video = jax.random.uniform(
        jax.random.key(0), (BATCH, FRAMES, cfg.height, cfg.width, cfg.channels), jnp.bfloat16
    )
    tokens = jax.random.normal(
        jax.random.key(1), (BATCH, FRAMES, cfg.num_patches, cfg.embed_dim), jnp.bfloat16
    )
    conv_ch = cfg.channels * cfg.unembedding_upsample_rate
    conv_shape = (
        (BATCH, FRAMES, conv_ch, cfg.height, cfg.width)
        if cfg.unet_layout == "cf"
        else (BATCH, FRAMES, cfg.height, cfg.width, conv_ch)
    )
    conv_features = jax.random.normal(jax.random.key(2), conv_shape, jnp.bfloat16)

    def make_chained(body_fn):
        @functools.partial(jax.jit, static_argnums=(2,))
        def chained(state, x, k):
            def body(v, _):
                model = nnx.merge(graphdef, state)
                return body_fn(model, v).astype(v.dtype), ()

            v, _ = jax.lax.scan(body, x, None, length=k)
            return jnp.sum(v.astype(jnp.float32))

        return chained

    attn_mask = frame_mask_to_attention(mask)

    def full(model, v):
        mean, _, prob = model.encode(v, mask)
        keep = (prob >= 0.5).astype(mean.dtype)[..., None]
        return model.decode(model.blend_fill(mean, keep), mask)

    def encoder_blocks(model, t):
        x = t
        for layer in model.encoder.layers:
            x = layer(x, attn_mask)
        return x

    def decoder_blocks(model, t):
        x = t
        for layer in model.decoder.layers:
            x = layer(x, attn_mask)
        return x

    def one_block(model, t):
        return model.encoder.layers[0](t, attn_mask)

    ch_axis = 2 if cfg.unet_layout == "cf" else -1

    def unet_only(model, f):
        # keep a REAL data dependency (x*0 would let XLA dead-code the unet):
        # splice the 3-channel output back into the 12-channel carry, damped.
        out = model.decoder.unet(f)  # same layout as its input
        if cfg.unet_layout == "cf":
            rest = f[:, :, out.shape[2]:]
        else:
            rest = f[..., out.shape[-1]:]
        return jnp.concatenate([out, rest], axis=ch_axis) * 0.9

    def unembed_only(model, t):
        cf, direct = model.decoder.patch_unembedding(t)
        # real dependency, bounded carry
        return t * 0.9 + jnp.mean(direct.astype(jnp.float32)).astype(t.dtype)

    results = {}
    for name, fn, x in [
        ("full encode+decode", full, video),
        ("encoder 9 blocks", encoder_blocks, tokens),
        ("decoder 12 blocks", decoder_blocks, tokens),
        ("single block", one_block, tokens),
        ("unet", unet_only, conv_features),
        ("patch_unembed", unembed_only, tokens),
    ]:
        results[name] = slope(make_chained(fn), state, x)
        print(f"{name:24s}: {results[name]*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
