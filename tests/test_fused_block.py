"""Fused MLP-sublayer kernel (ops/fused_block.py) vs the nnx module chain.

Interpret mode on CPU; the module reference is the ACTUAL MLP module plus the
residual add, exactly as FactoredAttention composes it (models/layers.py).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from video_vae_tpu.models.layers import MLP
from video_vae_tpu.ops.fused_block import fused_mlp_sublayer


def _setup(B=4, S=16, C=128, F=256, dtype=jnp.bfloat16, seed=0):
    mlp = MLP(C, F, nnx.Rngs(seed), dtype=dtype)
    x = jax.random.normal(jax.random.key(seed + 1), (B, S, C), jnp.float32).astype(dtype)
    return mlp, x


def _fused(mlp, x, interpret=True):
    return fused_mlp_sublayer(
        x,
        mlp.norm.scale.value,
        mlp.norm.bias.value,
        mlp.linear1.kernel.value,
        mlp.linear1.bias.value,
        mlp.linear2.kernel.value,
        mlp.linear2.bias.value,
        interpret,
    )


@pytest.mark.parametrize("shape", [(4, 16, 128, 256), (2, 50, 256, 512)])
def test_fused_mlp_forward_matches_module(shape):
    B, S, C, F = shape
    mlp, x = _setup(B, S, C, F)
    ref = x + mlp(x)
    out = jax.jit(lambda x: _fused(mlp, x))(x)
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
    assert float(err) / scale < 3e-2, float(err)


def test_fused_mlp_grads_match_module():
    mlp, x = _setup()
    graphdef, params = nnx.split(mlp)

    def loss_fused(params, x):
        m = nnx.merge(graphdef, params)
        return jnp.sum(_fused(m, x).astype(jnp.float32) ** 2)

    def loss_ref(params, x):
        m = nnx.merge(graphdef, params)
        return jnp.sum((x + m(x)).astype(jnp.float32) ** 2)

    gf_p, gf_x = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(params, x)
    gr_p, gr_x = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gf_p), jax.tree_util.tree_leaves(gr_p)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-3
        assert float(jnp.max(jnp.abs(a - b))) / scale < 5e-2
    scale = float(jnp.max(jnp.abs(gr_x))) + 1e-3
    assert float(jnp.max(jnp.abs(gf_x - gr_x))) / scale < 5e-2


def test_fused_mlp_xla_fallback_matches(monkeypatch):
    """Off-TPU without interpret the op runs the XLA chain — same math."""
    mlp, x = _setup()
    ref = x + mlp(x)
    out = jax.jit(lambda x: _fused(mlp, x, interpret=False))(x)
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
    assert float(err) / scale < 3e-2


def test_fused_mlp_under_mesh_shard_maps():
    """Under a data-sharded mesh the kernel dispatches via shard_map and the
    result matches the single-device run."""
    from video_vae_tpu.parallel.mesh import build_mesh
    from video_vae_tpu.parallel.sharding import (
        activate_mesh,
        clear_dispatch_log,
        dispatch_log,
    )

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 simulated devices")
    mlp, x = _setup(B=4)
    ref = jax.jit(lambda x: _fused(mlp, x))(x)
    mesh = build_mesh(2, 1, 1, devices=jax.devices()[:2])
    clear_dispatch_log()
    with activate_mesh(mesh):
        out = jax.jit(lambda x: _fused(mlp, x))(x)
    assert any(op == "fused_mlp" and impl == "pallas" and ax for op, impl, ax in dispatch_log())
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
    )


# ---------------------------------------------------------------------------
# fused attention sublayer (ops/flash_attention.py fused_attention_sublayer)
# ---------------------------------------------------------------------------

from video_vae_tpu.models.layers import Attention
from video_vae_tpu.ops.flash_attention import fused_attention_sublayer


def _attn_setup(B=4, S=16, C=128, H=2, QKV=64, masked=True, seed=3):
    attn = Attention(C, H, QKV, nnx.Rngs(seed), attention_impl="xla")
    x = jax.random.normal(jax.random.key(seed + 1), (B, S, C), jnp.float32).astype(
        jnp.bfloat16
    )
    mask = None
    if masked:
        mask = jnp.zeros((B, 1, 1, S), bool).at[..., : S * 3 // 4].set(True)
    return attn, x, mask


def _fused_attn(attn, x, mask, interpret=True):
    return fused_attention_sublayer(
        x,
        attn.input_norm.scale.value,
        attn.input_norm.bias.value,
        attn.qkv_projection.kernel.value,
        attn.qkv_projection.bias.value,
        attn.q_norm.scale.value,
        attn.k_norm.scale.value,
        attn.out_projection.kernel.value,
        attn.out_projection.bias.value,
        mask,
        attn.num_heads,
        attn.rope_base,
        attn.rope_alpha,
        interpret,
    )


@pytest.mark.parametrize("masked", [True, False])
def test_fused_attn_sublayer_forward_matches_module(masked):
    attn, x, mask = _attn_setup(masked=masked)
    ref = x + attn(x, mask)
    out = jax.jit(lambda x: _fused_attn(attn, x, mask))(x)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
    assert err / scale < 3e-2, err


def test_fused_attn_sublayer_packed_shape():
    """S·H multiple of 128 takes the packed small-S path in-kernel."""
    attn, x, mask = _attn_setup(B=4, S=16, C=128, H=8, QKV=128)
    ref = x + attn(x, mask)
    out = jax.jit(lambda x: _fused_attn(attn, x, mask))(x)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
    assert err / scale < 3e-2, err


def test_fused_attn_sublayer_grads_match_module():
    attn, x, mask = _attn_setup()
    graphdef, params = nnx.split(attn)

    def loss_fused(params, x):
        m = nnx.merge(graphdef, params)
        return jnp.sum(_fused_attn(m, x, mask).astype(jnp.float32) ** 2)

    def loss_ref(params, x):
        m = nnx.merge(graphdef, params)
        return jnp.sum((x + m(x, mask)).astype(jnp.float32) ** 2)

    gf_p, gf_x = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(params, x)
    gr_p, gr_x = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(params, x)
    for (pf, a), (pr, b) in zip(
        jax.tree_util.tree_flatten_with_path(gf_p)[0],
        jax.tree_util.tree_flatten_with_path(gr_p)[0],
    ):
        scale = float(jnp.max(jnp.abs(b))) + 1e-3
        assert float(jnp.max(jnp.abs(a - b))) / scale < 6e-2, (pf, pr)
    scale = float(jnp.max(jnp.abs(gr_x))) + 1e-3
    assert float(jnp.max(jnp.abs(gf_x - gr_x))) / scale < 6e-2


def test_fused_attn_sublayer_under_mesh_shard_maps():
    from video_vae_tpu.parallel.mesh import build_mesh
    from video_vae_tpu.parallel.sharding import (
        activate_mesh,
        clear_dispatch_log,
        dispatch_log,
    )

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 simulated devices")
    attn, x, mask = _attn_setup(B=4)
    ref = jax.jit(lambda x: _fused_attn(attn, x, mask))(x)
    mesh = build_mesh(2, 1, 1, devices=jax.devices()[:2])
    clear_dispatch_log()
    with activate_mesh(mesh):
        out = jax.jit(lambda x: _fused_attn(attn, x, mask))(x)
    assert any(
        op == "fused_attention_sublayer" and impl == "pallas" and ax
        for op, impl, ax in dispatch_log()
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2
    )


def test_fused_mlp_ragged_rows():
    """Token counts that don't divide the row tile are padded, not corrupted."""
    mlp, x = _setup(B=1, S=13, C=128, F=256)
    ref = x + mlp(x)
    out = jax.jit(lambda x: _fused(mlp, x))(x)
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
    assert float(err) / scale < 3e-2
