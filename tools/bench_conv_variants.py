"""Conv restructuring candidates for the small-channel 256² UNet level.

Variants (all mathematically identical to conv3d (3,3,3) SAME, stride 1):
  a) XLA conv3d NDHWC (baseline)
  b) taps-in-channels: ONE 2D (3,3) conv with cin*3 channels built by
     concatenating t-1/t/t+1 shifted frames — temporal taps move into the
     contraction dim instead of separate passes
  c) full im2col: 27 shifted HBM copies → one matmul (voxels, 27c)@(27c, cout)
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


def conv3d_taps_in_channels(x, kernel):
    b, t, h, w, c = x.shape
    kt, kh, kw, _, cout = kernel.shape
    pad = kt // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    shifted = [
        jax.lax.dynamic_slice_in_dim(xp, dt, t, axis=1) for dt in range(kt)
    ]
    xcat = jnp.concatenate(shifted, axis=-1).reshape(b * t, h, w, c * kt)
    # weights: tap-major channel concat must match [t-1 | t | t+1] order
    wcat = jnp.concatenate([kernel[dt] for dt in range(kt)], axis=2)  # (kh,kw,c*kt,cout)
    y = jax.lax.conv_general_dilated(
        xcat, wcat, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y.reshape(b, t, h, w, cout).astype(x.dtype)


def conv3d_im2col(x, kernel):
    b, t, h, w, c = x.shape
    kt, kh, kw, _, cout = kernel.shape
    xp = jnp.pad(
        x, ((0, 0), (kt // 2, kt // 2), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0))
    )
    cols = []
    for dt in range(kt):
        for dh in range(kh):
            for dw in range(kw):
                cols.append(
                    jax.lax.dynamic_slice(
                        xp, (0, dt, dh, dw, 0), (b, t, h, w, c)
                    )
                )
    patches = jnp.concatenate(cols, axis=-1).reshape(b * t * h * w, kt * kh * kw * c)
    wmat = kernel.reshape(kt * kh * kw * c, cout)
    y = patches @ wmat.astype(patches.dtype)
    return y.reshape(b, t, h, w, cout).astype(x.dtype)


def slope_time(fn, x, kernel):
    @functools.partial(jax.jit, static_argnums=(2,))
    def chained(x, kernel, k):
        def body(v, _):
            out = fn(v, kernel)
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
    vals = [(timed(K_LONG) - timed(K_SHORT)) / (K_LONG - K_SHORT) for _ in range(3)]
    return min(vals)


def main():
    b, t = 2, 16
    shapes = [
        ("L0 (3,3,3) 12->16 @256", (b, t, 256, 256, 12), (3, 3, 3, 12, 16)),
        ("up0a (3,3,3) 32->16 @256", (b, t, 256, 256, 32), (3, 3, 3, 32, 16)),
        ("mixer (3,7,7) 12->12 @256", (b, t, 256, 256, 12), (3, 7, 7, 12, 12)),
    ]
    for name, xshape, kshape in shapes:
        x = jax.random.normal(jax.random.key(0), xshape, jnp.bfloat16)
        kernel = jax.random.normal(jax.random.key(1), kshape, jnp.bfloat16) * 0.05
        ref = conv3d_xla(x, kernel)
        for vname, fn in [("conv3d", conv3d_xla),
                          ("taps-in-ch", conv3d_taps_in_channels),
                          ("im2col", conv3d_im2col)]:
            out = fn(x, kernel)
            err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - out.astype(jnp.float32))))
            dt = slope_time(fn, x, kernel)
            print(f"{name:26s} {vname:11s} {dt*1e3:7.2f} ms  maxerr {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
