"""Measure the reference implementation's throughput on this TPU chip.

The reference publishes no numbers (BASELINE.md), so the baseline for
``bench.py``'s ``vs_baseline`` is produced by *running* the reference's own
model code (imported read-only from /root/reference — no code is copied into
this repo) on the same chip, same shapes, same task: deterministic
encode → frame-select → decode at 256×256×16 frames, batch 2.

The reference imports ``beartype``/``jaxtyping`` purely for annotations; those
packages aren't installed here, so minimal inert stubs are injected before
import.

    python tools/measure_reference.py          # writes BASELINE_MEASURED.json
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_TRAIN = "/root/reference/train"


def _install_annotation_stubs() -> None:
    class _Subscriptable:
        def __getitem__(self, item):
            return object

    jaxtyping = types.ModuleType("jaxtyping")
    jaxtyping.Float = _Subscriptable()
    jaxtyping.Array = object
    jaxtyping.jaxtyped = lambda fn=None, **kw: fn if callable(fn) else (lambda f: f)
    sys.modules.setdefault("jaxtyping", jaxtyping)

    beartype_mod = types.ModuleType("beartype")
    beartype_mod.beartype = lambda fn=None, **kw: fn if callable(fn) else (lambda f: f)
    sys.modules.setdefault("beartype", beartype_mod)


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    _install_annotation_stubs()
    sys.path.insert(0, REFERENCE_TRAIN)
    import flax

    # The reference was written for an older flax where Modules were not
    # pytrees; flax 0.12 rejects its plain-list layer containers otherwise.
    flax.config.update("flax_pytree_module", False)
    from flax import nnx

    # The reference hardwires @nnx.remat on its blocks (train/layers.py:209,
    # unet.py:44,76). Remat only changes *backward* memory/recompute — it is a
    # no-op for forward-only timing — but nnx.remat cannot cross the lax.scan
    # used by the slope-timing harness, so neutralize it for this measurement.
    real_remat = nnx.remat
    nnx.remat = lambda f, *a, **k: f
    try:
        import model as reference_model  # /root/reference/train/model.py (STE variant)
    finally:
        nnx.remat = real_remat

    batch, frames = 2, 16

    def build():
        return reference_model.VideoVAE(
            height=256, width=256, channels=3, patch_size=16,
            encoder_depth=9, decoder_depth=12, mlp_dim=1536, num_heads=8,
            qkv_features=512, max_temporal_len=64, spatial_compression_rate=8,
            unembedding_upsample_rate=4, rngs=nnx.Rngs(2, sampling=3),
        )

    print("[measure_reference] building reference model (jitted init)...")
    import functools

    graphdef, _ = nnx.split(nnx.eval_shape(build))

    def init_state():
        _, s = nnx.split(build())
        return s

    state = jax.jit(init_state)()

    # Same slope timing methodology as bench.py: chain K forwards inside one
    # jitted lax.scan with a data dependency (reconstruction feeds the next
    # input); per-step = (t_long - t_short)/(K_long - K_short). This cancels
    # the tunnel's constant dispatch/fetch overhead, and block_until_ready
    # (which does not block on this platform) is never relied upon.
    hw = (256 // 16) * (256 // 16)

    @functools.partial(jax.jit, static_argnums=(2,))
    def chained(state, video, k):
        # model.py's FactoredAttention expects the caller-expanded
        # (b·hw,1,1,t) mask (train/layers.py:210 variant).
        mask = jnp.ones((batch * hw, 1, 1, frames), bool)

        def body(v, _):
            # merge inside the scan body (nnx modules don't cross trace levels)
            model = nnx.merge(graphdef, state)
            rngs = nnx.Rngs(sampling=0)
            recon, *_ = model(v, mask, rngs, train=False)
            return recon.astype(v.dtype), ()

        v, _ = jax.lax.scan(body, video, None, length=k)
        return jnp.sum(v.astype(jnp.float32))

    video = jax.random.uniform(
        jax.random.key(0), (batch, frames, 256, 256, 3), jnp.bfloat16
    )

    def timed(k):
        start = time.perf_counter()
        float(chained(state, video, k))
        return time.perf_counter() - start

    print("[measure_reference] compiling + warmup...")
    k_short, k_long = 1, 11
    timed(k_short)
    timed(k_long)
    slopes = []
    for _ in range(3):
        slopes.append((timed(k_long) - timed(k_short)) / (k_long - k_short))
    print(f"[measure_reference] per-forward seconds: {[round(s, 4) for s in slopes]}")
    clips_per_sec = batch / min(slopes)
    result = {
        "clips_per_sec_per_chip": round(clips_per_sec, 4),
        "task": "deterministic encode+select+decode, 256x256x16f, batch 2, bf16",
        "source": "reference model.py VideoVAE (train=False) run in-place from /root/reference",
        "device": str(jax.devices()[0]),
    }
    out_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"[measure_reference] {result}")


if __name__ == "__main__":
    main()
