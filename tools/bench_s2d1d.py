"""A/B the width-only (1-D) s2d packing against the current 2-D packing on the
UNet level-0 / up-0 conv shapes (the forward trace's biggest Pallas convs).

Motivation (r4 xplane + HLO): the 2-D s2d kernel multiplies true FLOPs by 4
for 3×3 convs (75% structural zeros per tap block); the packed convs run at
~45-50% device MFU, i.e. ~12% of the MATH floor. Width-only packing wastes
only 2× while keeping rows at exactly one 128-lane tile (256-px rows → 128).
If the per-shape slope wins ~2×, the UNet's s2d_full path should migrate.

    python tools/bench_s2d1d.py            # numerics check + slope timing
    python tools/bench_s2d1d.py --check    # numerics only (CPU-safe)
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
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from video_vae_tpu.ops.conv3d import (
    _s2d1d_kernel,
    _s2d_kernel,
    conv3d_cf,
    s2d1d_pack_cf,
    s2d1d_unpack_cf,
    s2d_pack_cf,
    s2d_unpack_cf,
)

# (name, unpacked shape (b,t,c,h,w), kernel (kt,kh,kw,ci,co))
SHAPES = [
    ("up0.conv2 16->16 @256²", (2, 16, 16, 256, 256), (3, 3, 3, 16, 16)),
    ("lvl0.conv1 12->16 @256²", (2, 16, 12, 256, 256), (3, 3, 3, 12, 16)),
    ("mixer 12->12 (3,7,7)", (2, 16, 12, 256, 256), (3, 7, 7, 12, 12)),
    ("up0.cat2-as-one 32->16 @256²", (2, 16, 32, 256, 256), (3, 3, 3, 32, 16)),
]


def check_numerics():
    for name, xs, ks in SHAPES:
        x = jax.random.normal(jax.random.key(0), xs, jnp.float32).astype(jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), ks, jnp.float32).astype(jnp.bfloat16) * 0.1
        bias = jnp.zeros((ks[-1],), jnp.float32)

        @jax.jit
        def ref(x, k, bias):
            return conv3d_cf(x, k, bias, "xla")

        @jax.jit
        def via_1d(x, k, bias):
            xp = s2d1d_pack_cf(x)
            kp = _s2d1d_kernel(k)
            y = conv3d_cf(xp, kp, jnp.repeat(bias, 2), "xla")
            return s2d1d_unpack_cf(y)

        a = np.asarray(ref(x, k, bias), np.float32)
        b = np.asarray(via_1d(x, k, bias), np.float32)
        err = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        print(f"[s2d1d] {name}: rel err {err:.2e}")
        assert err < 2e-2, (name, err)
    print("[s2d1d] numerics OK")


def slope(fn, x, k, bias, k_short=1, k_long=9, repeats=5):
    def refit(y, cin):
        c = y.shape[2]
        if c == cin:
            return y
        if c > cin:
            return y[:, :, :cin]
        reps = -(-cin // c)
        return jnp.tile(y, (1, 1, reps, 1, 1))[:, :, :cin]

    @functools.partial(jax.jit, static_argnums=(3,))
    def chained(x, k, bias, n):
        def body(v, _):
            y = fn(v, k, bias)
            # keep the chain shape-stable (data dependency, no elision)
            return refit(y, v.shape[2]).astype(v.dtype), ()

        v, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(v.astype(jnp.float32))

    def timed(n):
        t0 = time.perf_counter()
        float(chained(x, k, bias, n))
        return time.perf_counter() - t0

    timed(k_short)
    timed(k_long)
    from video_vae_tpu.utils.timing import robust_slope

    est = robust_slope(lambda: timed(k_short), lambda: timed(k_long), k_short, k_long, repeats)
    return est.per_step


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--check", action="store_true")
    args = parser.parse_args()
    if args.check or jax.devices()[0].platform != "tpu":
        check_numerics()
        if args.check:
            return

    for name, xs, ks in SHAPES:
        b, t, c, h, w = xs
        kt, kh, kw, ci, co = ks
        key = jax.random.key(2)
        bias2d = jnp.zeros((co * 4,), jnp.float32)
        bias1d = jnp.zeros((co * 2,), jnp.float32)

        # 2-D packed (current default)
        x2 = jax.random.normal(key, (b, t, c * 4, h // 2, w // 2), jnp.float32).astype(jnp.bfloat16)
        k2 = _s2d_kernel(
            jax.random.normal(jax.random.key(3), ks, jnp.float32).astype(jnp.bfloat16)
        )
        t2 = slope(lambda v, kk, bb: conv3d_cf(v, kk, bb), x2, k2, bias2d)

        # 1-D packed (candidate)
        x1 = jax.random.normal(key, (b, t, c * 2, h, w // 2), jnp.float32).astype(jnp.bfloat16)
        k1 = _s2d1d_kernel(
            jax.random.normal(jax.random.key(3), ks, jnp.float32).astype(jnp.bfloat16)
        )
        t1 = slope(lambda v, kk, bb: conv3d_cf(v, kk, bb), x1, k1, bias1d)

        flops = 2 * b * t * h * w * kt * kh * kw * ci * co
        print(
            f"[s2d1d] {name}: 2d {t2*1e3:.3f} ms | 1d {t1*1e3:.3f} ms "
            f"({t2/t1:.2f}x) | math floor {flops/197e12*1e3:.3f} ms"
        )


if __name__ == "__main__":
    main()
