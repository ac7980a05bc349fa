"""In-context UNet bench: layout × dispatch variants on the real chip.

Round-1 lesson (CLAUDE.md): standalone conv timings disagree with in-context
ones (XLA fusion effects), so the dispatch table must be tuned against the
full UNet at the flagship shape. This tool slope-times the whole UNet3D
forward (chain-inside-scan, tunnel-safe) for each variant and prints a table.

Usage: python tools/bench_unet.py [variant ...]   (default: all)
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

BATCH, FRAMES, RES, CH = 2, 16, 256, 12
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


def set_impl(unet, selector):
    """selector(conv_module, level_tag) -> impl string; level_tag ∈
    {mixer, enc0..encN, bottleneck, dec0..decN, final}."""
    from video_vae_tpu.models.unet import Conv3D

    def apply(block, tag):
        for m in (block.conv1.conv, block.conv2.conv):
            m.impl = selector(m, tag)

    unet.patch_mixer.impl = selector(unet.patch_mixer, "mixer")
    for i, enc in enumerate(unet.encoders):
        apply(enc, f"enc{i}")
    for m in (unet.bottleneck1.conv, unet.bottleneck2.conv):
        m.impl = selector(m, "bottleneck")
    for i, dec in enumerate(unet.decoders):
        apply(dec, f"dec{i}")
    unet.final_conv.impl = selector(unet.final_conv, "final")


VARIANTS = {}


def variant(name):
    def deco(fn):
        VARIANTS[name] = fn
        return fn

    return deco


@variant("nhwc-auto")
def _v_nhwc(unet):
    return None


@variant("cf-auto")
def _v_cf(unet):
    return None


@variant("cf-xla")
def _v_cf_xla(unet):
    set_impl(unet, lambda m, tag: "xla")


@variant("cf-s2d")
def _v_cf_s2d(unet):
    set_impl(unet, lambda m, tag: "xla" if tag == "final" else "s2d")


@variant("cf-pallas")
def _v_cf_pallas(unet):
    # pallas where supported (256²/128² 3×3), auto elsewhere
    set_impl(unet, lambda m, tag: "auto")


@variant("cf-mixer-s2d")
def _v_cf_mixer(unet):
    set_impl(unet, lambda m, tag: "s2d" if tag == "mixer" else "auto")


@variant("cf-big-s2d")
def _v_cf_big_s2d(unet):
    # force s2d (not pallas) at the big levels too
    set_impl(unet, lambda m, tag: "xla" if tag == "final" else "s2d")


def main() -> None:
    from video_vae_tpu.models.unet import UNet3D

    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        layout = "nhwc" if name.startswith("nhwc") else "cf"
        unet = UNet3D(
            channels=CH, base_features=16, num_levels=3, out_features=3,
            rngs=nnx.Rngs(0), temporal_kernel=3, remat=False, layout=layout,
        )
        VARIANTS[name](unet)
        graphdef, state = nnx.split(unet)

        shape = (
            (BATCH, FRAMES, CH, RES, RES) if layout == "cf" else (BATCH, FRAMES, RES, RES, CH)
        )
        x = jax.random.normal(jax.random.key(0), shape, jnp.bfloat16)
        ch_axis = 2 if layout == "cf" else 4

        @functools.partial(jax.jit, static_argnums=(2,))
        def chained(state, x, k, graphdef=graphdef, ch_axis=ch_axis, layout=layout):
            def body(v, _):
                model = nnx.merge(graphdef, state)
                out = model(v)  # cf UNet is channels-first in AND out
                idx = [slice(None)] * 5
                idx[ch_axis] = slice(out.shape[ch_axis], None)
                rest = v[tuple(idx)]
                return jnp.concatenate([out, rest], axis=ch_axis) * 0.9, ()

            v, _ = jax.lax.scan(body, x, None, length=k)
            return jnp.sum(v.astype(jnp.float32))

        dt = slope(chained, state, x)
        print(f"{name:16s}: {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
