"""Per-part attribution of the UNet's time at the flagship shape.

Times each building block (single convs under each impl, GN+SiLU, pool,
transpose-conv, full levels) with the chain-inside-scan slope method so the
dispatch table argues from in-context-comparable numbers.

Usage: python tools/bench_unet_parts.py [case ...]
"""

from __future__ import annotations

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

B, T = 2, 16
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


def chained(fn):
    @functools.partial(jax.jit, static_argnums=(1,))
    def run(x, k):
        def body(v, _):
            out = fn(v)
            # splice output back into the carry with a real data dependency
            if out.shape == v.shape:
                nxt = out
            else:
                flat = jnp.mean(out.astype(jnp.float32))
                nxt = v * 0.9 + flat.astype(v.dtype)
            return nxt * 0.9, ()

        v, _ = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(v.astype(jnp.float32))

    return run


def main():
    from video_vae_tpu.ops.conv3d import (
        _conv3d_pallas_cf,
        conv3d_decomposed2d_cf,
        conv3d_s2d_cf,
    )
    from video_vae_tpu.ops.norm import group_norm_cf, max_pool_2x_cf

    key = jax.random.key(0)

    def data(c, hw):
        return jax.random.normal(key, (B, T, c, hw, hw), jnp.bfloat16)

    def kern(cin, cout, k=3, kt=3):
        return (
            jax.random.normal(key, (kt, k, k, cin, cout), jnp.bfloat16) * 0.05,
            jnp.zeros((cout,), jnp.float32),
        )

    cases = {}

    def conv_case(name, fn, cin, cout, hw, k=3):
        kernel, bias = kern(cin, cout, k)
        x = data(cin, hw)
        cases[name] = (lambda v, kernel=kernel, bias=bias, fn=fn: fn(v, kernel, bias), x)

    conv_case("12->16@256 pallas", _conv3d_pallas_cf, 12, 16, 256)
    conv_case("12->16@256 s2d", conv3d_s2d_cf, 12, 16, 256)
    conv_case("16->16@256 pallas", _conv3d_pallas_cf, 16, 16, 256)
    conv_case("16->16@256 s2d", conv3d_s2d_cf, 16, 16, 256)
    conv_case("32->16@256 pallas", _conv3d_pallas_cf, 32, 16, 256)
    conv_case("32->16@256 s2d", conv3d_s2d_cf, 32, 16, 256)
    conv_case("16->32@128 pallas", _conv3d_pallas_cf, 16, 32, 128)
    conv_case("16->32@128 s2d", conv3d_s2d_cf, 16, 32, 128)
    conv_case("32->32@128 pallas", _conv3d_pallas_cf, 32, 32, 128)
    conv_case("32->32@128 s2d", conv3d_s2d_cf, 32, 32, 128)
    conv_case("64->64@64 s2d", conv3d_s2d_cf, 64, 64, 64)

    from video_vae_tpu.ops.conv3d import _conv3d_xla_cf

    def pallas_wpad(x, kernel, bias):
        b, t, c, h, w = x.shape
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 0), (0, 128 - w)))
        return _conv3d_pallas_cf(xp, kernel, bias)[..., :w]

    conv_case("64->64@64 xla", _conv3d_xla_cf, 64, 64, 64)
    conv_case("64->64@64 pallas-wpad", pallas_wpad, 64, 64, 64)
    conv_case("128->64@64 s2d", conv3d_s2d_cf, 128, 64, 64)
    conv_case("128->64@64 xla", _conv3d_xla_cf, 128, 64, 64)
    conv_case("128->64@64 pallas-wpad", pallas_wpad, 128, 64, 64)
    conv_case("32->64@64 s2d", conv3d_s2d_cf, 32, 64, 64)
    conv_case("32->64@64 xla", _conv3d_xla_cf, 32, 64, 64)
    conv_case("32->64@64 pallas-wpad", pallas_wpad, 32, 64, 64)
    conv_case("64->128@32 s2d", conv3d_s2d_cf, 64, 128, 32)
    conv_case("64->128@32 xla", _conv3d_xla_cf, 64, 128, 32)
    conv_case("128->128@32 s2d", conv3d_s2d_cf, 128, 128, 32)
    conv_case("128->128@32 xla", _conv3d_xla_cf, 128, 128, 32)
    conv_case("mixer(3,7,7)@256 dec", conv3d_decomposed2d_cf, 12, 12, 256, k=7)
    conv_case("mixer(3,7,7)@256 s2d", conv3d_s2d_cf, 12, 12, 256, k=7)
    conv_case("mixer(3,7,7)@256 pallas", _conv3d_pallas_cf, 12, 12, 256, k=7)

    gn_x = data(16, 256)
    scale = jnp.ones((16,))
    bias16 = jnp.zeros((16,))
    cases["gn+silu 16@256"] = (
        lambda v: group_norm_cf(v, scale, bias16, 8, silu=True), gn_x,
    )
    cases["maxpool 16@256"] = (lambda v: max_pool_2x_cf(v), gn_x)

    def pool_slices(x):
        a = jnp.maximum(x[..., 0::2], x[..., 1::2])
        return jnp.maximum(a[..., 0::2, :], a[..., 1::2, :])

    def pool_reshape(x):
        b, t, c, h, w = x.shape
        y = x.reshape(b, t, c, h // 2, 2, w // 2, 2)
        return jnp.max(jnp.max(y, axis=6), axis=4)

    pool64 = data(64, 64)
    for nm, fn in [("rw", max_pool_2x_cf), ("slices", pool_slices), ("reshape", pool_reshape)]:
        cases[f"pool-{nm} 16@256"] = (fn, gn_x)
        cases[f"pool-{nm} 64@64"] = (fn, pool64)

    names = sys.argv[1:] or list(cases)
    for name in names:
        fn, x = cases[name]
        dt = slope(chained(fn), x)
        print(f"{name:24s}: {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
