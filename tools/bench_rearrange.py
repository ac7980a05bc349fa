"""A/B the token↔pixel rearranges that the xplane trace flagged (~5 ms/fwd).

Three hot spots (full-model trace, per forward):
* decoder un-patchify  "b t (h w) (p1 p2 c) -> b t c (h p1) (w p2)"  ≈2.5 ms
* ConvTranspose2x depth-to-space at 256²                              ≈1.65 ms
* encoder patchify     "b t (h p1) (w p2) c -> b t (h w) (p1 p2 c)"  ≈0.6 ms

Each is a pure permutation of a ~50 MB bf16 tensor — bandwidth SOL ≈0.15 ms —
so the cost is XLA's 7D transpose path. Candidates decompose the permutation
differently; slope-timed in context (chained scan, see bench_unet_parts).

Usage: python tools/bench_rearrange.py [case ...]
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

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, T, HW, P, C = 2, 16, 256, 16, 12
GRID = 16  # h = w = 16 token grid
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
            flat = jnp.mean(out.astype(jnp.float32))
            return v * 0.9 + flat.astype(v.dtype), ()

        v, _ = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(v.astype(jnp.float32))

    return run


def main():
    key = jax.random.key(0)
    tokens = jax.random.normal(key, (B, T, HW, P * P * C), jnp.bfloat16)
    pixels = jax.random.normal(key, (B, T, GRID * P, GRID * P, C), jnp.bfloat16)
    # transpose-conv matmul output, phase-major (a, b, co) channel blocks
    y_tc = jax.random.normal(key, (B, T, 4 * 16, 128, 128), jnp.bfloat16)

    cases = {}

    # ---- decoder un-patchify --------------------------------------------
    def unpatch_einops(x):
        return rearrange(
            x, "b t (h w) (p1 p2 c) -> b t c (h p1) (w p2)",
            h=GRID, w=GRID, p1=P, p2=P,
        )

    def unpatch_two_stage(x):
        # stage 1: token grid → pixels-last image (swap w ↔ p1, c stays minor)
        x = x.reshape(B, T, GRID, GRID, P, P, C)
        x = jnp.transpose(x, (0, 1, 2, 4, 3, 5, 6))  # b t h p1 w p2 c
        x = x.reshape(B, T, GRID * P, GRID * P, C)
        # stage 2: one standard 5D channels-last → channels-first transpose
        return jnp.transpose(x, (0, 1, 4, 2, 3))

    cases["unpatch einops"] = (unpatch_einops, tokens)
    cases["unpatch 2stage"] = (unpatch_two_stage, tokens)

    # ---- encoder patchify -----------------------------------------------
    def patch_einops(x):
        return rearrange(
            x, "b t (h p1) (w p2) c -> b t (h w) (p1 p2 c)", p1=P, p2=P
        )

    def patch_two_stage(x):
        x = x.reshape(B, T, GRID, P, GRID, P, C)
        x = jnp.transpose(x, (0, 1, 2, 4, 3, 5, 6))  # b t h w p1 p2 c
        return x.reshape(B, T, HW, P * P * C)

    cases["patchify einops"] = (patch_einops, pixels)
    cases["patchify 2stage"] = (patch_two_stage, pixels)

    # ---- ConvTranspose2x depth-to-space at 256² -------------------------
    def d2s_current(y):
        b, t, kc, h, w = y.shape
        cout = kc // 4
        y = y.reshape(b, t, 2, 2, cout, h, w)
        y = jnp.transpose(y, (0, 1, 4, 5, 2, 6, 3))
        return y.reshape(b, t, cout, 2 * h, 2 * w)

    def d2s_comajor(y):
        # pretend the matmul emitted (co, a, b)-major channels instead
        b, t, kc, h, w = y.shape
        cout = kc // 4
        y = y.reshape(b, t, cout, 2, 2, h, w)
        y = jnp.transpose(y, (0, 1, 2, 5, 3, 6, 4))  # b t co h a w b
        return y.reshape(b, t, cout, 2 * h, 2 * w)

    cases["d2s phase-major"] = (d2s_current, y_tc)
    cases["d2s co-major"] = (d2s_comajor, y_tc)

    names = sys.argv[1:] or list(cases)
    for name in names:
        fn, x = cases[name]
        ms = slope(chained(fn), x) * 1000
        print(f"{name:24s}: {ms:8.3f} ms")


if __name__ == "__main__":
    main()
