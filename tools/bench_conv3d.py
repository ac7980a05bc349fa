"""Micro-benchmark: XLA conv3d vs temporal-tap-decomposed 2D convs.

A (kt,kh,kw) 3D convolution with SAME padding equals the sum over kt temporal
taps of 2D (kh,kw) convolutions applied to temporally shifted frames — exactly
(zero padding in t matches SAME). XLA's TPU 2D conv emitter is far more mature
than the 3D path, which collapses on this model's small channel counts.
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

K_SHORT, K_LONG = 1, 9


def conv3d_xla(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def conv3d_decomposed(x, kernel):
    b, t, h, w, c = x.shape
    kt = kernel.shape[0]
    cout = kernel.shape[-1]
    pad = kt // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    y = jnp.zeros((b * t, h, w, cout), jnp.float32)
    for dt in range(kt):
        xt = jax.lax.dynamic_slice_in_dim(xp, dt, t, axis=1).reshape(b * t, h, w, c)
        y = y + jax.lax.conv_general_dilated(
            xt, kernel[dt], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
    return y.reshape(b, t, h, w, cout).astype(x.dtype)


def slope_time(fn, x, kernel):
    @functools.partial(jax.jit, static_argnums=(2,))
    def chained(x, kernel, k):
        def body(v, _):
            out = fn(v, kernel)
            # splice back to carry shape (real dependency)
            cin = v.shape[-1]
            if out.shape[-1] >= cin:
                nxt = out[..., :cin]
            else:
                nxt = jnp.concatenate([out, v[..., out.shape[-1]:]], axis=-1)
            return nxt * 0.9, ()

        v, _ = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(v.astype(jnp.float32))

    def timed(k):
        t0 = time.perf_counter()
        float(chained(x, kernel, k))
        return time.perf_counter() - t0

    timed(K_SHORT); timed(K_LONG)
    vals = [(timed(K_LONG) - timed(K_SHORT)) / (K_LONG - K_SHORT) for _ in range(2)]
    return min(vals)


def main():
    b, t = 2, 16
    shapes = [
        ("mixer (3,7,7) 12->12 @256", (b, t, 256, 256, 12), (3, 7, 7, 12, 12)),
        ("L0 (3,3,3) 12->16 @256", (b, t, 256, 256, 12), (3, 3, 3, 12, 16)),
        ("L0b (3,3,3) 16->16 @256", (b, t, 256, 256, 16), (3, 3, 3, 16, 16)),
        ("L1 (3,3,3) 16->32 @128", (b, t, 128, 128, 16), (3, 3, 3, 16, 32)),
        ("L2 (3,3,3) 32->64 @64", (b, t, 64, 64, 32), (3, 3, 3, 32, 64)),
        ("bott (3,3,3) 64->128 @32", (b, t, 32, 32, 64), (3, 3, 3, 64, 128)),
    ]
    for name, xshape, kshape in shapes:
        x = jax.random.normal(jax.random.key(0), xshape, jnp.bfloat16)
        kernel = jax.random.normal(jax.random.key(1), kshape, jnp.bfloat16) * 0.05
        # correctness
        ref = conv3d_xla(x, kernel)
        dec = conv3d_decomposed(x, kernel)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - dec.astype(jnp.float32))))
        t3 = slope_time(conv3d_xla, x, kernel)
        t2 = slope_time(conv3d_decomposed, x, kernel)
        print(f"{name:28s} conv3d {t3*1e3:7.2f} ms | decomposed {t2*1e3:7.2f} ms | "
              f"speedup {t3/t2:5.2f}x | maxerr {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
