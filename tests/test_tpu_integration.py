"""On-TPU integration tests (tier 3; parity with the reference's
claude_distributed/test_distributed.py run on real chips).

These run only when a real TPU is visible — conftest.py forces the CPU
simulation unless VVT_TPU_TESTS=1:

    VVT_TPU_TESTS=1 python -m pytest tests/test_tpu_integration.py -q

Under the default suite (CPU simulation) they are skipped.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

tpu_only = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs a real TPU chip"
)


@tpu_only
def test_flash_attention_on_chip():
    from video_vae_tpu.ops.flash_attention import flash_attention

    B, S, H, D = 4, 64, 2, 64
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
    mask = jnp.zeros((B, 1, 1, S), bool).at[..., :48].set(True)
    ref = jax.jit(lambda *a: jax.nn.dot_product_attention(a[0], a[1], a[2], mask=a[3]))(
        q, k, v, mask
    )
    out = jax.jit(lambda *a: flash_attention(*a))(q, k, v, mask)
    diff = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    assert diff < 5e-3, diff


@tpu_only
def test_pallas_conv_suite_on_chip():
    """Every Pallas conv entry point at a supported shape vs XLA, on-chip:
    direct (3,3,3), the K-chunked (3,7,7) mixer, fused pool, two-source cat2,
    and the im2col wgrad kernel."""
    from video_vae_tpu.ops.conv3d import (
        _conv3d_wgrad_pallas_cf,
        _conv3d_xla_cf,
        conv3d_cf,
        conv3d_cf_cat2,
        conv3d_cf_pooled,
    )
    from video_vae_tpu.ops.norm import max_pool_2x_cf

    ks = jax.random.split(jax.random.key(1), 5)
    x = jax.random.normal(ks[0], (1, 4, 12, 128, 128), jnp.bfloat16)

    def diff(a, b):
        return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))

    # direct 3x3
    k33 = jax.random.normal(ks[1], (3, 3, 3, 12, 16), jnp.bfloat16) * 0.1
    b33 = jnp.zeros((16,), jnp.float32)
    assert diff(
        jax.jit(lambda x: conv3d_cf(x, k33, b33, "pallas"))(x),
        jax.jit(lambda x: _conv3d_xla_cf(x, k33, b33))(x),
    ) < 2e-2
    # chunked 7x7 mixer
    k77 = jax.random.normal(ks[2], (3, 7, 7, 12, 12), jnp.bfloat16) * 0.05
    b77 = jnp.zeros((12,), jnp.float32)
    assert diff(
        jax.jit(lambda x: conv3d_cf(x, k77, b77, "pallas"))(x),
        jax.jit(lambda x: _conv3d_xla_cf(x, k77, b77))(x),
    ) < 5e-2
    # fused pool epilogue
    full, pooled = jax.jit(lambda x: conv3d_cf_pooled(x, k33, b33, "pallas"))(x)
    ref_full = jax.jit(lambda x: _conv3d_xla_cf(x, k33, b33))(x)
    assert diff(pooled, max_pool_2x_cf(ref_full)) < 2e-2
    # two-source concat conv
    x2 = jax.random.normal(ks[3], (1, 4, 16, 128, 128), jnp.bfloat16)
    x1 = jax.random.normal(ks[4], (1, 4, 16, 128, 128), jnp.bfloat16)
    kc = jax.random.normal(ks[2], (3, 3, 3, 32, 16), jnp.bfloat16) * 0.1
    assert diff(
        jax.jit(lambda a, b: conv3d_cf_cat2(a, b, kc, b33, "pallas"))(x1, x2),
        jax.jit(
            lambda a, b: _conv3d_xla_cf(jnp.concatenate([a, b], axis=2), kc, b33)
        )(x1, x2),
    ) < 5e-2  # K=864 bf16 contraction: a couple of ulps of ordering noise
    # wgrad kernel vs XLA's native filter gradient
    g = jax.random.normal(ks[1], (1, 4, 16, 128, 128), jnp.bfloat16) * 0.1
    dw = jax.jit(lambda x, g: _conv3d_wgrad_pallas_cf(x, g, 3, 3, 3))(x, g)
    def fwd(kern):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kern, (1, 1, 1), "SAME",
            dimension_numbers=("NDCHW", "DHWIO", "NDCHW"),
            preferred_element_type=jnp.float32,
        )
    _, vjp = jax.vjp(fwd, jnp.zeros((3, 3, 3, 12, 16), jnp.float32))
    (ref,) = vjp(g.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(dw), np.asarray(ref), atol=0.5, rtol=3e-2)


@tpu_only
def test_pallas_conv_64sq_on_chip():
    """w = 64 kernel support (the 64² UNet level) on real hardware: direct,
    cat2, fused pool, and the custom-vjp gradients at that width."""
    from video_vae_tpu.ops.conv3d import (
        _conv3d_xla_cf,
        conv3d_cf,
        conv3d_cf_cat2,
        conv3d_cf_pooled,
        pallas_conv_supported,
    )
    from video_vae_tpu.ops.norm import max_pool_2x_cf

    ks = jax.random.split(jax.random.key(7), 4)
    x = jax.random.normal(ks[0], (2, 4, 64, 64, 64), jnp.bfloat16)
    xcf = jnp.transpose(x, (0, 1, 4, 2, 3))
    assert pallas_conv_supported((2, 4, 64, 64, 64), (3, 3, 3, 64, 64))

    def diff(a, b):
        return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))

    k33 = jax.random.normal(ks[1], (3, 3, 3, 64, 64), jnp.bfloat16) * 0.05
    b33 = jnp.zeros((64,), jnp.float32)
    assert diff(
        jax.jit(lambda x: conv3d_cf(x, k33, b33, "pallas"))(xcf),
        jax.jit(lambda x: _conv3d_xla_cf(x, k33, b33))(xcf),
    ) < 5e-2
    # fused pool epilogue at w=64
    _, pooled = jax.jit(lambda x: conv3d_cf_pooled(x, k33, b33, "pallas"))(xcf)
    ref_full = jax.jit(lambda x: _conv3d_xla_cf(x, k33, b33))(xcf)
    assert diff(pooled, max_pool_2x_cf(ref_full)) < 5e-2
    # two-source (the level-2 UpBlock shape that XLA served as f32 fusions)
    x2 = jax.random.normal(ks[2], (2, 4, 64, 64, 64), jnp.bfloat16)
    x2cf = jnp.transpose(x2, (0, 1, 4, 2, 3))
    kc = jax.random.normal(ks[3], (3, 3, 3, 128, 64), jnp.bfloat16) * 0.05
    assert diff(
        jax.jit(lambda a, b: conv3d_cf_cat2(a, b, kc, b33, "pallas"))(xcf, x2cf),
        jax.jit(
            lambda a, b: _conv3d_xla_cf(jnp.concatenate([a, b], axis=2), kc, b33)
        )(xcf, x2cf),
    ) < 1e-1
    # gradients through the custom vjp (Pallas dgrad + wgrad at w=64)
    g_pal = jax.jit(
        jax.grad(
            lambda x, k: jnp.sum(conv3d_cf(x, k, b33, "pallas").astype(jnp.float32) ** 2),
            argnums=(0, 1),
        )
    )(xcf, k33)
    g_ref = jax.jit(
        jax.grad(
            # all-f32 reference: the bf16 XLA conv's vjp rejects the f32
            # cotangent its own preferred_element_type=f32 produces
            lambda x, k: jnp.sum(_conv3d_xla_cf(x, k, b33) ** 2),
            argnums=(0, 1),
        )
    )(xcf.astype(jnp.float32), k33.astype(jnp.float32))
    for a, r in zip(g_pal, g_ref):
        scale = float(jnp.max(jnp.abs(r.astype(jnp.float32)))) + 1e-6
        rel = float(jnp.max(jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)))) / scale
        assert rel < 5e-2, rel


@tpu_only
def test_fused_qkv_attention_on_chip():
    from video_vae_tpu.ops.flash_attention import (
        _reference_fused_chain,
        fused_qkv_attention,
    )
    from video_vae_tpu.ops.rope import rope_tables

    for b, s, h, d, with_mask in [(256, 16, 8, 64, True), (16, 256, 8, 64, False)]:
        key = jax.random.key(0)
        qkv = jax.random.normal(key, (b, s, 3 * h * d), jnp.bfloat16)
        qs = jax.random.normal(jax.random.key(1), (d,), jnp.float32) * 0.3 + 1.0
        ks_ = jax.random.normal(jax.random.key(2), (d,), jnp.float32) * 0.3 + 1.0
        mask = None
        if with_mask:
            mask = jax.random.uniform(jax.random.key(3), (b, 1, 1, s)) > 0.2
            mask = mask.at[:, :, :, 0].set(True)
        out = jax.jit(lambda q, a, c: fused_qkv_attention(q, a, c, mask, h))(qkv, qs, ks_)
        cos, sin = rope_tables(s, d, 10000.0, 1.0)
        ref = jax.jit(
            lambda q, a, c: _reference_fused_chain(q, a, c, mask, h, cos, sin)
        )(qkv, qs, ks_)
        diff = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        assert diff < 5e-2, (b, s, diff)


@tpu_only
def test_fused_qkv_attention_packed_on_chip(monkeypatch):
    """Tier-3: the packed small-S variant (VVT_ATTN_PACKED=1) — forward and
    backward — lowers through Mosaic and matches the reference chain at the
    temporal shapes (S ∈ {16, 32}, incl. a batch-padding case)."""
    from video_vae_tpu.ops.flash_attention import (
        _reference_fused_chain,
        fused_qkv_attention,
    )
    from video_vae_tpu.ops.rope import rope_tables

    monkeypatch.setenv("VVT_ATTN_PACKED", "1")
    for b, s, h, d in [(256, 16, 8, 64), (40, 16, 8, 64), (128, 32, 8, 64)]:
        qkv = jax.random.normal(jax.random.key(0), (b, s, 3 * h * d), jnp.bfloat16)
        qs = jax.random.normal(jax.random.key(1), (d,), jnp.float32) * 0.3 + 1.0
        ks_ = jax.random.normal(jax.random.key(2), (d,), jnp.float32) * 0.3 + 1.0
        mask = jax.random.uniform(jax.random.key(3), (b, 1, 1, s)) > 0.2
        mask = mask.at[:, :, :, 0].set(True)
        cos, sin = rope_tables(s, d, 10000.0, 1.0)

        def loss_fused(q, a, c):
            return jnp.sum(
                fused_qkv_attention(q, a, c, mask, h).astype(jnp.float32) ** 2
            )

        def loss_ref(q, a, c):
            return jnp.sum(
                _reference_fused_chain(q, a, c, mask, h, cos, sin).astype(jnp.float32)
                ** 2
            )

        vf, gf = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 1, 2)))(qkv, qs, ks_)
        vr, gr = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1, 2)))(qkv, qs, ks_)
        assert abs(float(vf) - float(vr)) / (abs(float(vr)) + 1e-6) < 2e-2
        for a, r in zip(gf, gr):
            scale = float(jnp.max(jnp.abs(r)).astype(jnp.float32)) + 1e-6
            rel = float(jnp.max(jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)))) / scale
            assert rel < 5e-2, (b, s, rel)


@tpu_only
def test_train_step_on_chip():
    from video_vae_tpu.core.config import DynamicHParams, tiny_config
    from video_vae_tpu.models.vae import VideoVAE
    from video_vae_tpu.train.setup import create_optimizer, create_sharded_model
    from video_vae_tpu.train.step import make_train_step

    cfg = tiny_config()
    model = create_sharded_model(lambda: VideoVAE(cfg.model, nnx.Rngs(0, sampling=1)))
    opt = create_optimizer(model, cfg.optim)
    step = make_train_step(cfg.loss, None)
    video = jax.random.uniform(jax.random.key(0), (2, 8, 32, 32, 3))
    mask = jnp.ones((2, 8))
    losses = [
        float(step(model, opt, video, mask, nnx.Rngs(sampling=1), DynamicHParams.default())["loss"])
        for _ in range(5)
    ]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


@tpu_only
def test_flagship_remat_grads_finite_on_chip():
    """Tier-3: flagship-config remat train objective produces finite grads on
    RANDOM video (VERDICT r3: the earlier NaN finding was a zeros-input probe
    artifact — LN backward amplification on constant tokens, reproduced in
    the reference model too; see PERF.md)."""
    from video_vae_tpu.core.config import DynamicHParams, LossConfig, ModelConfig
    from video_vae_tpu.losses.losses import vae_loss
    from video_vae_tpu.models.vae import VideoVAE
    from video_vae_tpu.train.step import build_perceptual

    loss_cfg = LossConfig()
    perc = build_perceptual(loss_cfg, None)
    cfg = ModelConfig(remat=True)
    model = VideoVAE(cfg, nnx.Rngs(0, sampling=1))
    video = jax.random.uniform(jax.random.key(3), (1, 16, 256, 256, 3))
    mask = jnp.ones((1, 16), jnp.float32)
    hp = DynamicHParams.default()

    @nnx.jit
    def gradstep(model, video, mask, rngs, hp):
        def loss_for_grad(model, rngs):
            out = model(video.astype(jnp.bfloat16), mask, rngs, train=True)
            loss, _ = vae_loss(out, video.astype(jnp.bfloat16), mask, hp, loss_cfg, perc)
            return loss
        loss, grads = nnx.value_and_grad(loss_for_grad)(model, rngs)
        flat = jax.tree_util.tree_leaves(grads)
        bad = sum(jnp.sum(~jnp.isfinite(g.astype(jnp.float32))) for g in flat)
        return loss, bad

    loss, bad = gradstep(model, video, mask, nnx.Rngs(sampling=42), hp)
    assert bool(jnp.isfinite(loss))
    assert int(bad) == 0, int(bad)


@tpu_only
def test_fused_attention_bwd_on_chip():
    """Tier-3: the fused Pallas backward kernel vs jax.vjp over the reference
    chain, at both factored shapes (VERDICT r2 next #5)."""
    import numpy as np

    from video_vae_tpu.ops.flash_attention import (
        _reference_fused_chain,
        fused_qkv_attention,
    )
    from video_vae_tpu.ops.rope import rope_tables

    for b, s, h, d in [(256, 16, 8, 64), (16, 256, 8, 64)]:
        qkv = jax.random.normal(jax.random.key(0), (b, s, 3 * h * d), jnp.bfloat16)
        qs = jax.random.normal(jax.random.key(1), (d,), jnp.float32) * 0.3 + 1.0
        ks_ = jax.random.normal(jax.random.key(2), (d,), jnp.float32) * 0.3 + 1.0
        mask = jax.random.uniform(jax.random.key(3), (b, 1, 1, s)) > 0.2
        mask = mask.at[:, :, :, 0].set(True)

        def loss_fused(q, a, c):
            return jnp.sum(
                fused_qkv_attention(q, a, c, mask, h).astype(jnp.float32) ** 2
            )

        cos, sin = rope_tables(s, d, 10000.0, 1.0)

        def loss_ref(q, a, c):
            return jnp.sum(
                _reference_fused_chain(q, a, c, mask, h, cos, sin).astype(jnp.float32)
                ** 2
            )

        gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(qkv, qs, ks_)
        gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(qkv, qs, ks_)
        for a, r in zip(gf, gr):
            scale = float(jnp.max(jnp.abs(r)).astype(jnp.float32)) + 1e-6
            rel = float(jnp.max(jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)))) / scale
            assert rel < 5e-2, (b, s, rel)
