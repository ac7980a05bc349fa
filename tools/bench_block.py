"""Transformer-block microbench: where does the per-block time go.

A FactoredAttention block at flagship shape costs ~1.48 ms (31 ms / 21 blocks)
against a ~0.68 ms matmul-FLOP floor (~46% MFU). This tool slope-times the
block's sub-chains in-context (chained scan, tunnel-safe) to attribute the
gap: layernorms, QKV projection, qk-norm+RoPE, attention core, MLP, rearranges.

Usage: python tools/bench_block.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from einops import rearrange
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
    from video_vae_tpu.models.layers import FactoredAttention
    from video_vae_tpu.ops.rope import apply_rope

    cfg = ModelConfig(remat=False)
    block = FactoredAttention(
        in_features=cfg.embed_dim, mlp_dim=cfg.mlp_dim, num_heads=cfg.num_heads,
        qkv_features=cfg.qkv_features, rngs=nnx.Rngs(0), remat=False,
    )
    graphdef, state = nnx.split(block)

    hw = cfg.num_patches
    tokens = jax.random.normal(
        jax.random.key(1), (BATCH, FRAMES, hw, cfg.embed_dim), jnp.bfloat16
    )
    # spatial-pass layout: (b·t, hw, c); temporal-pass layout: (b·hw, t, c)
    spatial = jax.random.normal(
        jax.random.key(2), (BATCH * FRAMES, hw, cfg.embed_dim), jnp.bfloat16
    )
    temporal = jax.random.normal(
        jax.random.key(3), (BATCH * hw, FRAMES, cfg.embed_dim), jnp.bfloat16
    )

    def damp(x, like):
        return (x * 0.9).astype(like.dtype)

    def full_block(m, x):
        return m(x, None)

    def spatial_attn(m, x):
        return x + m.SpatialAttention(x)

    def spatial_mlp(m, x):
        return x + m.SpatialMLP(x)

    def temporal_attn(m, x):
        return x + m.TemporalAttention(x)

    def qkv_only(m, x):
        a = m.SpatialAttention
        y = a.qkv_projection(a.input_norm(x))
        return x + a.out_projection(y[..., : a.out_projection.kernel.value.shape[0]])

    def prechain(m, x):
        """everything before the attention core, plus out-proj"""
        a = m.SpatialAttention
        q, k, v = jnp.split(a.qkv_projection(a.input_norm(x)), 3, axis=-1)
        q = rearrange(q, "b s (h d) -> b s h d", h=a.num_heads)
        k = rearrange(k, "b s (h d) -> b s h d", h=a.num_heads)
        v = rearrange(v, "b s (h d) -> b s h d", h=a.num_heads)
        q = a.q_norm(q)
        k = a.k_norm(k)
        q, k = apply_rope(q, k, base=a.rope_base, alpha=a.rope_alpha)
        out = (q + k + v).reshape(*x.shape[:2], -1)
        return x + a.out_projection(out)

    def rearranges_only(m, x):
        y = rearrange(x, "(b t) hw c -> b t hw c", b=BATCH)
        y = rearrange(y, "b t hw c -> (b hw) t c")
        y = rearrange(y, "(b hw) t c -> b t hw c", b=BATCH)
        y = rearrange(y, "b t hw c -> (b t) hw c")
        return x + 0.001 * y

    cases = [
        ("full block (4D tokens)", full_block, tokens),
        ("spatial attn+res", spatial_attn, spatial),
        ("spatial mlp+res", spatial_mlp, spatial),
        ("temporal attn+res", temporal_attn, temporal),
        ("spatial qkv+out proj", qkv_only, spatial),
        ("spatial prechain (no sdpa)", prechain, spatial),
        ("temporal qkv+out proj", qkv_only, temporal),
        ("temporal prechain (no sdpa)", prechain, temporal),
        ("axial rearranges", rearranges_only, spatial),
    ]

    for name, fn, x in cases:
        @functools.partial(jax.jit, static_argnums=(2,))
        def chained(state, x, k, fn=fn):
            def body(v, _):
                m = nnx.merge(graphdef, state)
                return damp(fn(m, v), v), ()

            v, _ = jax.lax.scan(body, x, None, length=k)
            return jnp.sum(v.astype(jnp.float32))

        dt = slope(chained, state, x)
        print(f"{name:28s}: {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
