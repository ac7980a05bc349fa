"""Headline benchmark: encode+decode throughput on the flagship model.

Metric (BASELINE.json): clips/sec/chip at 256×256 × 16 frames, deterministic
encode→select→decode (the latent-caching / serving path). Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Timing methodology: on this environment the device is reached through a
high-latency tunnel where ``block_until_ready`` does not actually block and a
host fetch costs seconds of constant overhead. So the model forward is chained
K times inside ONE jitted ``lax.scan`` (each iteration consumes the previous
reconstruction — a real data dependency, so nothing can be elided or
overlapped), a single scalar is fetched, and the per-step time is the slope
between two chain lengths: (t_long − t_short) / (K_long − K_short). Constant
tunnel/dispatch overhead cancels exactly. The recorded number is the MEDIAN
over >=5 repeats with outlier-repeat rejection (utils/timing.py) — min-of-3
let one tunnel hiccup set the official number in round 3.

``vs_baseline`` compares against BASELINE_MEASURED.json if present (written by
tools/measure_reference.py, which times the reference's own model the same way
on the same chip); otherwise 1.0.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
from flax import nnx

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = int(os.environ.get("VVT_BATCH", "2"))
FRAMES = 16
K_SHORT = 1
K_LONG = 11
REPEATS = int(os.environ.get("VVT_BENCH_REPEATS", "5"))
# A/B knobs (default = shipping config)
ATTN_IMPL = os.environ.get("VVT_ATTN_IMPL", "")
UNET_LAYOUT = os.environ.get("VVT_UNET_LAYOUT", "")
UNET_S2D = os.environ.get("VVT_UNET_S2D", "")
UNET_S2D_FULL = os.environ.get("VVT_UNET_S2D_FULL", "")


def timed_chain(chained, state, video, mask, k):
    t0 = time.perf_counter()
    float(chained(state, video, mask, k))  # scalar fetch forces full execution
    return time.perf_counter() - t0


def main() -> None:
    from video_vae_tpu.core.config import ModelConfig
    from video_vae_tpu.models.vae import VideoVAE

    overrides = {}
    if ATTN_IMPL:
        overrides["attention_impl"] = ATTN_IMPL
    if UNET_LAYOUT:
        overrides["unet_layout"] = UNET_LAYOUT
    if UNET_S2D:
        overrides["unet_s2d_last"] = UNET_S2D == "1"
    if UNET_S2D_FULL:
        overrides["unet_s2d_full"] = UNET_S2D_FULL == "1"
    cfg = ModelConfig(remat=False, **overrides)  # flagship; no remat on inference
    # (remat is a training-memory optimization and clashes with scan-chained timing)
    graphdef, _ = nnx.split(nnx.eval_shape(lambda: VideoVAE(cfg, nnx.Rngs(0, sampling=1))))

    def init_state():
        _, s = nnx.split(VideoVAE(cfg, nnx.Rngs(0, sampling=1)))
        return s

    state = jax.jit(init_state)()

    @functools.partial(jax.jit, static_argnums=(3,))
    def chained(state, video, mask, k):
        def body(v, _):
            # merge inside the scan body: nnx modules created at one trace
            # level cannot be used inside a deeper one
            model = nnx.merge(graphdef, state)
            mean, _, prob = model.encode(v, mask)
            keep = (prob >= 0.5).astype(mean.dtype)[..., None]
            recon = model.decode(model.blend_fill(mean, keep), mask)
            return recon.astype(v.dtype), ()

        v, _ = jax.lax.scan(body, video, None, length=k)
        return jnp.sum(v.astype(jnp.float32))

    video = jax.random.uniform(
        jax.random.key(0), (BATCH, FRAMES, cfg.height, cfg.width, cfg.channels), jnp.bfloat16
    )
    mask = jnp.ones((BATCH, FRAMES), jnp.float32)

    # warmup/compile both chain lengths
    timed_chain(chained, state, video, mask, K_SHORT)
    timed_chain(chained, state, video, mask, K_LONG)

    from video_vae_tpu.utils.metrics import profile_trace

    profile_dir = None
    if "--profile" in sys.argv:
        idx = sys.argv.index("--profile")
        profile_dir = (
            sys.argv[idx + 1] if len(sys.argv) > idx + 1 else "bench_profile"
        )
        print(f"capturing xplane trace to {profile_dir}", file=sys.stderr)

    from video_vae_tpu.utils.timing import robust_slope

    with profile_trace(profile_dir):
        est = robust_slope(
            lambda: timed_chain(chained, state, video, mask, K_SHORT),
            lambda: timed_chain(chained, state, video, mask, K_LONG),
            K_SHORT,
            K_LONG,
            repeats=REPEATS,
        )
    per_step = est.per_step
    print(f"[bench] {est.summary()}", file=sys.stderr)

    clips_per_sec = BATCH / per_step

    baseline_path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    vs_baseline = 1.0
    ref = {}
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        ref_value = ref.get("clips_per_sec_per_chip")
        if ref_value:
            vs_baseline = clips_per_sec / ref_value

    record = {
        "metric": "encode+decode throughput, 256x256x16f flagship VAE",
        "value": round(clips_per_sec, 4),
        "unit": "clips/sec/chip",
        "vs_baseline": round(vs_baseline, 4),
    }

    # Train-step metric rides the same JSON line (VERDICT r4 #5: the other
    # half of the perf contract used to live only in PERF.md prose). Same
    # robust slope estimator, full RL objective b1x16f — the workload of
    # /root/reference/train/rl_nonadversarial.py:188-198. VVT_BENCH_TRAIN=0
    # skips it (forward-only debugging).
    if os.environ.get("VVT_BENCH_TRAIN", "1") == "1":
        try:
            import importlib.util

            spec = importlib.util.spec_from_file_location(
                "bench_train_step",
                os.path.join(os.path.dirname(__file__), "tools", "bench_train_step.py"),
            )
            bts = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(bts)
            print("[bench] measuring train step (b1x16f)...", file=sys.stderr)
            t_est = bts.measure(1, 16, repeats=REPEATS)
            print(f"[bench] train step {t_est.summary()}", file=sys.stderr)
            record["train_ms_per_step"] = round(t_est.per_step * 1e3, 2)
            ref_ms = (ref.get("train_step") or {}).get("ms_per_step")
            if ref_ms:
                record["train_vs_baseline"] = round(
                    ref_ms / (t_est.per_step * 1e3), 4
                )
        except Exception as e:  # the forward headline must survive regardless
            record["train_ms_per_step"] = None
            record["train_error"] = f"{type(e).__name__}: {e}"[:300]

    print(json.dumps(record))


if __name__ == "__main__":
    main()
