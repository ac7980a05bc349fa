"""Measure the reference implementation's throughput on this TPU chip.

The reference publishes no numbers (BASELINE.md), so the baselines for
``bench.py``/``tools/bench_train_step.py`` ``vs_baseline`` are produced by
*running* the reference's own model code (imported read-only from
/root/reference — no code is copied into this repo) on the same chip, same
shapes, same task:

- forward: deterministic encode → frame-select → decode at 256×256×16 frames,
  batch 2 (model.py VideoVAE, train=False).
- train step: the reference's actual training workload — rl_model.VideoVAE
  paired rollouts + the full rl_nonadversarial.loss_fn (MSE/MAE/KL/selection/
  RL/VGG16-perceptual) + clip-by-norm Adam (rl_nonadversarial.py:100-198,
  246-276), batch 1 × 16 frames to match tools/bench_train_step.py.

The reference imports ``beartype``/``jaxtyping`` purely for annotations and
``wandb``/``flaxmodels`` for logging/VGG16; none are installed here (no
egress), so inert stubs are injected before import. The VGG16 stand-in is
FLOP-faithful: the same 13-conv/5-pool stack, activations dict, ImageNet
normalization, and bf16 compute as flaxmodels.VGG16(output='activations',
include_head=False) — only the weights are random, which does not change the
timing. Both sides (reference and ours) therefore time the identical loss
terms with random VGG filters.

Remat: the reference hardwires @nnx.remat on its blocks (train/layers.py:209,
unet.py:44,76). nnx.remat cannot cross the lax.scan used by the slope-timing
harness, so it is neutralized — which only *reduces* the reference's backward
cost (no recompute), i.e. the reference is measured at its fastest. Our
comparison number (bench_train_step.py) is also measured without remat.

    python tools/measure_reference.py                # forward + train step
    python tools/measure_reference.py --forward-only
    python tools/measure_reference.py --train-only
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
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

    wandb_mod = types.ModuleType("wandb")
    wandb_mod.init = lambda *a, **k: None
    wandb_mod.log = lambda *a, **k: None
    sys.modules.setdefault("wandb", wandb_mod)


def _install_flaxmodels_stub() -> None:
    """flaxmodels is not installed (no egress); inject a FLOP-faithful VGG16.

    Mirrors fm.VGG16(output='activations', include_head=False, normalize=...,
    dtype=...): init(rng, x) -> params, apply(params, x) -> {name: activation}
    over the standard 13-conv stack. Weights are random (timing-identical to
    pretrained); vgg_tests.py:18-32 only needs this surface.
    """
    import jax
    import jax.numpy as jnp

    VGG_CFG = (
        (1, (64, 64)),
        (2, (128, 128)),
        (3, (256, 256, 256)),
        (4, (512, 512, 512)),
        (5, (512, 512, 512)),
    )

    class _VGG16Standin:
        def __init__(self, output="activations", pretrained=None, normalize=True,
                     include_head=False, dtype=jnp.bfloat16):
            del output, pretrained, include_head
            self.normalize = normalize
            self.dtype = dtype

        def init(self, rng, x):
            params = {}
            cin = x.shape[-1]
            for block, widths in VGG_CFG:
                for i, width in enumerate(widths, 1):
                    rng, sub = jax.random.split(rng)
                    scale = 1.0 / math.sqrt(9 * cin)
                    params[f"conv{block}_{i}"] = {
                        "kernel": scale * jax.random.normal(
                            sub, (3, 3, cin, width), jnp.float32
                        ),
                        "bias": jnp.zeros((width,), jnp.float32),
                    }
                    cin = width
            return {"params": params}

        def apply(self, params, x):
            if self.normalize:
                mean = jnp.asarray([0.485, 0.456, 0.406], x.dtype)
                std = jnp.asarray([0.229, 0.224, 0.225], x.dtype)
                x = (x - mean) / std
            x = x.astype(self.dtype)
            acts = {}
            for block, widths in VGG_CFG:
                for i, _ in enumerate(widths, 1):
                    p = params["params"][f"conv{block}_{i}"]
                    x = jax.lax.conv_general_dilated(
                        x, p["kernel"].astype(self.dtype), (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    ) + p["bias"].astype(self.dtype)
                    acts[f"conv{block}_{i}"] = x
                    x = jax.nn.relu(x)
                    acts[f"relu{block}_{i}"] = x
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
                acts[f"pool{block}"] = x
            return acts

    fm = types.ModuleType("flaxmodels")
    fm.VGG16 = _VGG16Standin
    sys.modules.setdefault("flaxmodels", fm)


def _import_reference(module_names):
    """Import reference modules with @nnx.remat neutralized (see module doc).

    NOTE: main() sets flax_pytree_module=False BEFORE flax.nnx is first
    imported — the reference's plain-list layer containers predate nnx
    pytree modules, and the flag only takes effect at nnx import time.
    """
    from flax import nnx

    real_remat = nnx.remat
    nnx.remat = lambda f, *a, **k: f
    try:
        import importlib

        return [importlib.import_module(name) for name in module_names]
    finally:
        nnx.remat = real_remat


def measure_forward(batch=2, frames=16):
    import functools

    import jax
    import jax.numpy as jnp
    from flax import nnx

    (reference_model,) = _import_reference(["model"])

    def build():
        return reference_model.VideoVAE(
            height=256, width=256, channels=3, patch_size=16,
            encoder_depth=9, decoder_depth=12, mlp_dim=1536, num_heads=8,
            qkv_features=512, max_temporal_len=64, spatial_compression_rate=8,
            unembedding_upsample_rate=4, rngs=nnx.Rngs(2, sampling=3),
        )

    print("[measure_reference] building reference model (jitted init)...")
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
    from video_vae_tpu.utils.timing import robust_slope

    est = robust_slope(
        lambda: timed(k_short), lambda: timed(k_long), k_short, k_long, repeats=5
    )
    print(f"[measure_reference] forward: {est.summary()}")
    return batch / est.per_step


def measure_train_step(batch=1, frames=16):
    """Slope-time the reference's full jit_train_step workload.

    loss_fn is the reference's own (imported in place); the optimizer update
    re-wires rl_nonadversarial.py:246-258's exact optax chain through the
    flax-0.12 nnx.Optimizer API (the reference's one-arg optimizer.update
    predates it). Chained K times inside one lax.scan over functional
    (model, optimizer) state, mirroring tools/bench_train_step.py.
    """
    import functools

    import jax
    import jax.numpy as jnp
    import optax
    from einops import rearrange, repeat
    from flax import nnx

    _install_flaxmodels_stub()
    rl_model, vgg_tests, ref_rl = _import_reference(
        ["rl_model", "vgg_tests", "rl_nonadversarial"]
    )

    def build():
        return rl_model.VideoVAE(
            height=256, width=256, channels=3, patch_size=16,
            encoder_depth=9, decoder_depth=12, mlp_dim=1536, num_heads=8,
            qkv_features=512, max_temporal_len=64, spatial_compression_rate=8,
            unembedding_upsample_rate=4, rngs=nnx.Rngs(2, sampling=3),
        )

    print("[measure_reference] building reference RL model (jitted init)...")
    m_def, _ = nnx.split(nnx.eval_shape(build))
    m_state = jax.jit(lambda: nnx.split(build())[1])()
    model = nnx.merge(m_def, m_state)

    # rl_nonadversarial.py:240-258 — their exact schedule + chain.
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=2e-5,
        warmup_steps=int(20000 // math.sqrt(2)),
        decay_steps=1_000_000, end_value=2e-6,
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(schedule))
    optimizer = nnx.jit(lambda m: nnx.Optimizer(m, tx, wrt=nnx.Param))(model)
    o_def, o_state = nnx.split(optimizer)
    m_def, m_state = nnx.split(model)

    vgg_model, vgg_params = vgg_tests.load_vgg()
    perceptual_loss_fn = vgg_tests.get_adversarial_perceptual_loss_fn(vgg_model)

    # rl_nonadversarial.py:254-262 hparams at their defaults
    hparams = {
        "gamma1": 0.2, "gamma2": 0.001, "gamma3": 0.1, "gamma4": 0.05,
        "max_compression_rate": 2, "magnify_negatives_rate": 100,
        "rl_loss_weight": 0.01,
    }
    hw = (256 // 16) * (256 // 16)

    video = jax.random.uniform(
        jax.random.key(0), (batch, frames, 256, 256, 3), jnp.bfloat16
    )
    original_mask = jnp.ones((batch, frames), jnp.float32)
    # train_step's mask expansion (rl_nonadversarial.py:188-192); bool for
    # jax.nn.dot_product_attention's dtype check
    mask = rearrange(original_mask.astype(bool), "b t -> b 1 1 t")
    mask = repeat(mask, "b 1 1 t -> (b hw) 1 1 t", hw=hw)

    @functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(0, 1))
    def chained(m_state, o_state, k):
        def body(carry, i):
            m_state, o_state = carry
            model = nnx.merge(m_def, m_state)
            optimizer = nnx.merge(o_def, o_state)
            rngs = nnx.Rngs(sampling=jax.random.fold_in(jax.random.key(7), i))
            grad_fn = nnx.value_and_grad(ref_rl.loss_fn, has_aux=True)
            (loss, aux), grads = grad_fn(
                model, video, mask, original_mask, rngs, hparams,
                perceptual_loss_fn, vgg_params,
            )
            optimizer.update(model, grads)
            return (nnx.split(model)[1], nnx.split(optimizer)[1]), loss

        (m_state, o_state), losses = jax.lax.scan(
            body, (m_state, o_state), jnp.arange(k)
        )
        return jnp.sum(losses), m_state, o_state

    def timed(k, m_state, o_state):
        t0 = time.perf_counter()
        total, m2, o2 = chained(m_state, o_state, k)
        float(total)
        return time.perf_counter() - t0, m2, o2

    print("[measure_reference] compiling reference train step (fwd+bwd)...")
    k_short, k_long = 1, 5

    def timed_feeding(k):
        nonlocal m_state, o_state
        dt, m_state, o_state = timed(k, m_state, o_state)
        return dt

    timed_feeding(k_short)
    timed_feeding(k_long)
    from video_vae_tpu.utils.timing import robust_slope

    est = robust_slope(
        lambda: timed_feeding(k_short),
        lambda: timed_feeding(k_long),
        k_short,
        k_long,
        repeats=5,
    )
    print(f"[measure_reference] train step: {est.summary()}")
    return est.per_step


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--forward-only", action="store_true")
    parser.add_argument("--train-only", action="store_true")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # Must precede the first `from flax import nnx` anywhere in this process:
    # the reference uses plain-list layer containers that flax 0.12's pytree
    # modules reject, and the flag is only read at nnx import time.
    import flax

    flax.config.update("flax_pytree_module", False)

    _install_annotation_stubs()
    sys.path.insert(0, REFERENCE_TRAIN)

    out_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    result = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            result = json.load(f)
    result["device"] = str(jax.devices()[0])
    result["version"] = 2

    if not args.train_only:
        clips_per_sec = measure_forward()
        result.update({
            "clips_per_sec_per_chip": round(clips_per_sec, 4),
            "task": "deterministic encode+select+decode, 256x256x16f, batch 2, bf16",
            "source": "reference model.py VideoVAE (train=False) run in-place from /root/reference",
        })
    if not args.forward_only:
        per_step = measure_train_step()
        result["train_step"] = {
            "ms_per_step": round(per_step * 1e3, 2),
            "task": "full RL train step (rollouts+VGG16 perceptual+Adam), 256x256x16f, batch 1, no remat",
            "source": "reference rl_model.VideoVAE + rl_nonadversarial.loss_fn run in-place; "
                      "random-weight FLOP-faithful VGG16 stand-in on both sides",
        }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"[measure_reference] {json.dumps(result, indent=2)}")


if __name__ == "__main__":
    main()
