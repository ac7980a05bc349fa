"""Pallas fused-attention kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import pytest

from video_vae_tpu.ops.flash_attention import flash_attention


def _inputs(B=2, S=16, H=2, D=32, masked=True):
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.float32)
    mask = None
    if masked:
        mask = jnp.zeros((B, 1, 1, S), bool).at[..., : S * 3 // 4].set(True)
    return q, k, v, mask


@pytest.mark.parametrize("masked", [True, False])
def test_flash_forward_matches_xla(masked):
    q, k, v, mask = _inputs(masked=masked)
    ref = jax.nn.dot_product_attention(q, k, v, mask=mask)
    out = jax.jit(lambda q, k, v, m: flash_attention(q, k, v, m, interpret=True))(
        q, k, v, mask
    )
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-3


def test_flash_backward_matches_xla():
    q, k, v, mask = _inputs()

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v, mask=mask) ** 2)

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(gf, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        assert float(jnp.max(jnp.abs(a - b))) / scale < 5e-3


def _module_reference(qkv, q_scale, k_scale, mask, num_heads):
    """The exact round-1 Attention chain (split → LN → RoPE → sdpa)."""
    from einops import rearrange
    from flax import nnx

    from video_vae_tpu.ops.rope import apply_rope

    b, s, three_hd = qkv.shape
    d = three_hd // (3 * num_heads)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = rearrange(q, "b s (h d) -> b s h d", h=num_heads)
    k = rearrange(k, "b s (h d) -> b s h d", h=num_heads)
    v = rearrange(v, "b s (h d) -> b s h d", h=num_heads)
    q_norm = nnx.LayerNorm(d, use_bias=False, rngs=nnx.Rngs(0))
    k_norm = nnx.LayerNorm(d, use_bias=False, rngs=nnx.Rngs(0))
    q_norm.scale.value = q_scale
    k_norm.scale.value = k_scale
    q, k = apply_rope(q_norm(q), k_norm(k))
    out = jax.nn.dot_product_attention(q, k, v, mask=mask)
    return out.reshape(b, s, num_heads * d)


@pytest.mark.parametrize("masked", [True, False])
@pytest.mark.parametrize("interpret", [True, False])
def test_fused_qkv_attention_matches_module_chain(masked, interpret):
    """The one-kernel qk-norm+RoPE+attention path (and its non-TPU fallback)
    reproduces the unfused module chain."""
    from video_vae_tpu.ops.flash_attention import fused_qkv_attention

    B, S, H, D = 3, 16, 2, 32
    qkv = jax.random.normal(jax.random.key(1), (B, S, 3 * H * D), jnp.float32)
    q_scale = 1.0 + 0.1 * jax.random.normal(jax.random.key(2), (D,))
    k_scale = 1.0 - 0.1 * jax.random.normal(jax.random.key(3), (D,))
    mask = None
    if masked:
        mask = jnp.zeros((B, 1, 1, S), bool).at[..., : S * 3 // 4].set(True)

    ref = _module_reference(qkv, q_scale, k_scale, mask, H)
    out = jax.jit(
        lambda qkv, qs, ks, m: fused_qkv_attention(
            qkv, qs, ks, m, H, 10000.0, 1.0, interpret
        )
    )(qkv, q_scale, k_scale, mask)
    assert out.shape == ref.shape
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-3


@pytest.mark.parametrize("masked", [True, False])
@pytest.mark.parametrize("b_s", [(64, 16), (40, 16), (32, 32)])
def test_fused_qkv_attention_packed_small_s(masked, b_s, monkeypatch):
    """VVT_ATTN_PACKED=1: the block-diagonal all-heads-in-one-lane-block
    variant matches the per-head kernel path at the factored temporal shapes
    (S ∈ {16, 32}, H·S a lane multiple), including the batch-padding path."""
    from video_vae_tpu.ops.flash_attention import fused_qkv_attention

    B, S = b_s
    H, D = 8, 64
    qkv = jax.random.normal(jax.random.key(7), (B, S, 3 * H * D), jnp.bfloat16)
    q_scale = 1.0 + 0.1 * jax.random.normal(jax.random.key(8), (D,))
    k_scale = 1.0 - 0.1 * jax.random.normal(jax.random.key(9), (D,))
    mask = None
    if masked:
        mask = jnp.zeros((B, 1, 1, S), bool).at[..., : S * 3 // 4].set(True)

    def run():
        return jax.jit(
            lambda qkv, qs, ks, m: fused_qkv_attention(
                qkv, qs, ks, m, H, 10000.0, 1.0, True
            )
        )(qkv, q_scale, k_scale, mask)

    monkeypatch.setenv("VVT_ATTN_PACKED", "0")
    base = run()
    monkeypatch.setenv("VVT_ATTN_PACKED", "1")
    packed = run()
    ref = _module_reference(
        qkv.astype(jnp.float32), q_scale, k_scale, mask, H
    )
    for out in (base, packed):
        rel = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))) / (
            float(jnp.max(jnp.abs(ref))) + 1e-6
        )
        assert rel < 0.03, rel


def test_fused_qkv_attention_degenerate_tokens_finite():
    """Constant-ish tokens (|mean| ≫ sigma, e.g. zero/padded frames or the
    fill token) make the q/k-LN E[x²]−mean² variance go NEGATIVE under f32
    cancellation; unclamped, rsqrt(var+eps) was NaN (root cause of the r3
    remat NaN-grads bisect). Both the kernel and the reference chain must
    clamp like flax (nnx/nn/normalization.py:122)."""
    from video_vae_tpu.ops.flash_attention import (
        _reference_fused_chain,
        fused_qkv_attention,
    )
    from video_vae_tpu.ops.rope import rope_tables

    B, S, H, D = 8, 16, 8, 64
    noise = jax.random.normal(jax.random.key(5), (B, S, 3 * H * D), jnp.float32)
    qkv = (1000.0 + 1e-3 * noise).astype(jnp.float32)  # var ~1e-6, mean² ~1e6
    qs = jnp.ones((D,))
    ks = jnp.ones((D,))
    cos, sin = rope_tables(S, D, 10000.0, 1.0)

    for fn in (
        lambda a, b, c: fused_qkv_attention(a, b, c, None, H, 10000.0, 1.0, True),
        lambda a, b, c: _reference_fused_chain(a, b, c, None, H, cos, sin),
    ):
        out, grads = jax.jit(
            jax.value_and_grad(
                lambda a, b, c: jnp.sum(fn(a, b, c).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2),
            )
        )(qkv, qs, ks)
        assert bool(jnp.isfinite(out)), out
        for g in grads:
            assert not bool(jnp.any(~jnp.isfinite(g.astype(jnp.float32))))


def test_fused_qkv_attention_packed_gradients(monkeypatch):
    """Packed-path backward (one block-diagonal recompute chain for all
    heads) matches the reference-chain vjp at the temporal shape."""
    from video_vae_tpu.ops.flash_attention import (
        _reference_fused_chain,
        fused_qkv_attention,
    )
    from video_vae_tpu.ops.rope import rope_tables

    monkeypatch.setenv("VVT_ATTN_PACKED", "1")
    B, S, H, D = 40, 16, 8, 64  # B=40: exercises the batch-padding path
    qkv = jax.random.normal(jax.random.key(11), (B, S, 3 * H * D), jnp.bfloat16)
    q_scale = jnp.ones((D,)) * 1.1
    k_scale = jnp.ones((D,)) * 0.9
    mask = jnp.zeros((B, 1, 1, S), bool).at[..., : S * 3 // 4].set(True)
    g = jax.random.normal(jax.random.key(12), (B, S, H * D), jnp.bfloat16)
    cos, sin = rope_tables(S, D, 10000.0, 1.0)

    @jax.jit
    def run(qkv, qs, ks, g):
        _, vjp = jax.vjp(
            lambda a, b, c: fused_qkv_attention(a, b, c, mask, H, 10000.0, 1.0, True),
            qkv, qs, ks,
        )
        _, ref_vjp = jax.vjp(
            lambda a, b, c: _reference_fused_chain(a, b, c, mask, H, cos, sin),
            qkv, qs, ks,
        )
        return vjp(g), ref_vjp(g)

    ours, ref = run(qkv, q_scale, k_scale, g)
    for a, b in zip(ours, ref):
        af, bf = a.astype(jnp.float32), b.astype(jnp.float32)
        assert not bool(jnp.any(~jnp.isfinite(af)))
        rel = float(jnp.max(jnp.abs(af - bf))) / (float(jnp.max(jnp.abs(bf))) + 1e-9)
        assert rel < 0.05, rel


def test_fused_qkv_attention_gradients():
    from video_vae_tpu.ops.flash_attention import fused_qkv_attention

    B, S, H, D = 2, 8, 2, 32
    qkv = jax.random.normal(jax.random.key(4), (B, S, 3 * H * D), jnp.float32)
    q_scale = jnp.ones((D,))
    k_scale = jnp.ones((D,))
    mask = jnp.zeros((B, 1, 1, S), bool).at[..., : S - 2].set(True)

    gf = jax.jit(
        jax.grad(
            lambda qkv, qs, ks: jnp.sum(
                fused_qkv_attention(qkv, qs, ks, mask, H, 10000.0, 1.0, True) ** 2
            ),
            argnums=(0, 1, 2),
        )
    )(qkv, q_scale, k_scale)
    gr = jax.jit(
        jax.grad(
            lambda qkv, qs, ks: jnp.sum(
                _module_reference(qkv, qs, ks, mask, H) ** 2
            ),
            argnums=(0, 1, 2),
        )
    )(qkv, q_scale, k_scale)
    for a, b in zip(gf, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        assert float(jnp.max(jnp.abs(a - b))) / scale < 5e-3


def test_flash_batch_padding():
    """Batch not divisible by the kernel's block size still works."""
    q, k, v, mask = _inputs(B=3)
    ref = jax.nn.dot_product_attention(q, k, v, mask=mask)
    out = jax.jit(lambda q, k, v, m: flash_attention(q, k, v, m, interpret=True))(
        q, k, v, mask
    )
    assert out.shape == ref.shape
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-3


@pytest.mark.parametrize("B", [3, 130])
def test_fused_bwd_pallas_matches_xla_chain(monkeypatch, B):
    """The fused Pallas backward kernel (VVT_FUSED_BWD=pallas, the default)
    must match the XLA-chain backward (VVT_FUSED_BWD=xla) it replaces —
    nonuniform scales + padding mask + a batch that needs block padding.
    B=130 forces n_blocks=3: the per-block dscale partials must be emitted
    as (n_blocks, 1, HD) (a (1, HD) block of a (n_blocks, HD) array violates
    Mosaic's 8-sublane block rule — caught on-chip, so CI pins the
    multi-block wrapper math here)."""
    from video_vae_tpu.ops.flash_attention import fused_qkv_attention

    S, H, D = 16, 2, 64
    ks = jax.random.split(jax.random.key(9), 3)
    qkv = jax.random.normal(ks[0], (B, S, 3 * H * D), jnp.float32)
    q_scale = 1.0 + 0.2 * jax.random.normal(ks[1], (D,), jnp.float32)
    k_scale = 1.0 + 0.2 * jax.random.normal(ks[2], (D,), jnp.float32)
    mask = jnp.zeros((B, 1, 1, S), bool).at[..., : S - 3].set(True)

    def loss(qkv, qs, kscale):
        out = fused_qkv_attention(qkv, qs, kscale, mask, H, 10000.0, 1.0, True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grad_fn = jax.grad(loss, argnums=(0, 1, 2))
    monkeypatch.setenv("VVT_FUSED_BWD", "pallas")
    g_pallas = jax.jit(grad_fn)(qkv, q_scale, k_scale)
    monkeypatch.setenv("VVT_FUSED_BWD", "xla")
    # new jit trace (env is read at trace time) — different lambda identity
    g_xla = jax.jit(lambda a, b, c: grad_fn(a, b, c))(qkv, q_scale, k_scale)
    for a, b in zip(g_pallas, g_xla):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        assert float(jnp.max(jnp.abs(a - b))) / scale < 5e-3


@pytest.mark.parametrize("masked", [True, False])
def test_fused_qkv_attention_pipelined_head_loop(masked, monkeypatch):
    """VVT_ATTN_PIPELINE=1 (issue head h+1's score matmul before head h's
    softmax) is a pure instruction-order change — identical ops, so the
    per-head path must match it bit-for-bit at a spatial (S>=128) shape."""
    from video_vae_tpu.ops.flash_attention import fused_qkv_attention

    B, S, H, D = 4, 128, 8, 64  # S>=128: the non-packed per-head path
    qkv = jax.random.normal(jax.random.key(21), (B, S, 3 * H * D), jnp.bfloat16)
    q_scale = 1.0 + 0.1 * jax.random.normal(jax.random.key(22), (D,))
    k_scale = 1.0 - 0.1 * jax.random.normal(jax.random.key(23), (D,))
    mask = None
    if masked:
        mask = jnp.zeros((B, 1, 1, S), bool).at[..., : S * 3 // 4].set(True)

    def run():
        return jax.jit(
            lambda qkv, qs, ks, m: fused_qkv_attention(
                qkv, qs, ks, m, H, 10000.0, 1.0, True
            )
        )(qkv, q_scale, k_scale, mask)

    monkeypatch.setenv("VVT_ATTN_PIPELINE", "0")
    base = run()
    monkeypatch.setenv("VVT_ATTN_PIPELINE", "1")
    piped = run()
    assert jnp.array_equal(base, piped), float(jnp.max(jnp.abs(base - piped)))
