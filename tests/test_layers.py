"""Layer-level unit tests (parity with test_rl_model.py shape/gradient tests)."""

import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from video_vae_tpu.models.layers import (
    FactoredAttention,
    PatchEmbedding,
    PatchUnEmbedding,
)
from video_vae_tpu.ops.rope import apply_rope, rope_tables
from video_vae_tpu.ops.ste import gumbel_sigmoid_sample, round_ste


def test_round_ste_forward_and_gradient():
    x = jnp.array([0.2, 0.7, 1.4, -0.6])
    y = round_ste(x)
    assert jnp.array_equal(y, jnp.round(x))
    # straight-through: gradient of sum(round_ste(x)) wrt x is all ones
    g = jax.grad(lambda v: jnp.sum(round_ste(v)))(x)
    assert jnp.array_equal(g, jnp.ones_like(x))


def test_gumbel_sigmoid_binary_and_deterministic_eval():
    logits = jnp.linspace(-3, 3, 32)
    out = gumbel_sigmoid_sample(logits, jax.random.key(0), train=True)
    assert jnp.all((out == 0) | (out == 1))
    # eval: threshold at 0.5 — logits>0 → 1
    ev = gumbel_sigmoid_sample(logits, None, train=False)
    assert jnp.array_equal(ev, (logits > 0).astype(ev.dtype))
    # gradient flows through the train path
    g = jax.grad(lambda l: jnp.sum(gumbel_sigmoid_sample(l, jax.random.key(1))))(logits)
    assert jnp.all(jnp.isfinite(g)) and jnp.any(g != 0)


def test_rope_norm_preserving_and_relative():
    q = jax.random.normal(jax.random.key(0), (2, 16, 4, 32))
    k = jax.random.normal(jax.random.key(1), (2, 16, 4, 32))
    q_rot, k_rot = apply_rope(q, k)
    assert q_rot.shape == q.shape
    # rotation preserves per-vector norms
    assert jnp.allclose(
        jnp.linalg.norm(q_rot, axis=-1), jnp.linalg.norm(q, axis=-1), atol=1e-4
    )
    # dot products depend only on relative position: q@pos i vs k@pos j with
    # equal contents must give the same score for equal (i - j).
    qq = jnp.broadcast_to(q[:, :1], q.shape)  # same content at every position
    kk = jnp.broadcast_to(k[:, :1], k.shape)
    q_r, k_r = apply_rope(qq, kk)
    # precision='highest': the default matmul precision truncates fp32 inputs
    # and would swamp the 1e-3 tolerance with matmul noise.
    score = jnp.einsum("bshd,bthd->bhst", q_r, k_r, precision="highest")
    d0 = jnp.diagonal(score, offset=1, axis1=2, axis2=3)
    assert jnp.allclose(d0 - d0[..., :1], 0.0, atol=1e-3)


def test_rope_tables_match_reference_formula():
    cos, sin = rope_tables(8, 16, base=10000.0, alpha=1.0)
    assert cos.shape == (8, 16)
    assert jnp.allclose(cos[0], jnp.ones(16))
    assert jnp.allclose(sin[0], jnp.zeros(16))


def test_patch_embed_unembed_shapes():
    rngs = nnx.Rngs(0)
    h = w = 16
    p, c = 4, 3
    embed = PatchEmbedding(c, p, rngs)
    unembed = PatchUnEmbedding(h, w, c, p, upsample_rate=2, rngs=rngs)
    x = jax.random.uniform(jax.random.key(0), (2, 5, h, w, c))
    tokens = embed(x)
    assert tokens.shape == (2, 5, (h // p) * (w // p), p * p * c)
    conv_features, direct = unembed(tokens)
    assert conv_features.shape == (2, 5, h, w, c * 2)
    assert direct.shape == (2, 5, h, w, c)


def test_factored_attention_shape_and_mask_arity():
    rngs = nnx.Rngs(0)
    block = FactoredAttention(
        in_features=48, mlp_dim=64, num_heads=2, qkv_features=32, rngs=rngs, remat=False
    )
    x = jax.random.normal(jax.random.key(0), (2, 6, 4, 48))
    mask = jnp.ones((2, 1, 1, 6), bool)
    out = nnx.jit(lambda m, x, mask: m(x, mask))(block, x, mask)
    assert out.shape == x.shape
    out2 = nnx.jit(lambda m, x: m(x, None))(block, x)
    assert out2.shape == x.shape


def test_proj_fold_matches_module_chain(monkeypatch):
    """VVT_PROJ_FOLD=1: folding the pre-LN affine into the qkv / linear1
    projections (W' = diag(g)W, b' = c@W + b) reproduces the module chain.
    f32 end-to-end → the only difference is op order, so the tolerance is
    tight; bf16 adds one rounding of xn at the GEMM input."""
    from video_vae_tpu.models.layers import MLP, Attention

    B, S, C = 2, 16, 64
    x = jax.random.normal(jax.random.key(31), (B, S, C), jnp.float32)
    attn = Attention(C, 2, 64, nnx.Rngs(0), dtype=jnp.float32)
    mlp = MLP(C, 128, nnx.Rngs(1), dtype=jnp.float32)
    # non-trivial affines (default init is g=1, c=0 — the fold would be vacuous)
    for norm in (attn.input_norm, mlp.norm):
        norm.scale.value = 1.0 + 0.1 * jax.random.normal(jax.random.key(32), (C,))
        norm.bias.value = 0.1 * jax.random.normal(jax.random.key(33), (C,))

    def run(module, *args):
        graphdef, state = nnx.split(module)
        return jax.jit(lambda s, *a: nnx.merge(graphdef, s)(*a))(state, *args)

    monkeypatch.setenv("VVT_PROJ_FOLD", "0")
    attn_base, mlp_base = run(attn, x, None), run(mlp, x)
    monkeypatch.setenv("VVT_PROJ_FOLD", "1")
    attn_fold, mlp_fold = run(attn, x, None), run(mlp, x)

    for base, fold in ((attn_base, attn_fold), (mlp_base, mlp_fold)):
        denom = float(jnp.max(jnp.abs(base))) + 1e-6
        assert float(jnp.max(jnp.abs(base - fold))) / denom < 1e-5
