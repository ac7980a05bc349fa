"""Fused transformer-sublayer Pallas kernels: LN + GEMM(s) + epilogue + residual.

Motivation (round-4 xplane trace of the 45.5 ms flagship forward): the
transformer spends ~17 ms in XLA GEMM fusions at ~55% MFU plus ~6 ms in the
fused-attention custom-calls plus ~1.5 ms of LayerNorm reduce fusions and
residual adds — and most of that gap to the 9.6 ms GEMM floor is HBM traffic
BETWEEN the ops: each sublayer's LN output, projection output, and branch
output make a full HBM round trip before the next op reads them. At the
flagship shapes one attention sublayer moves ~90 MB through HBM across 5 ops;
fused into one kernel it needs ~19 MB (x in, weights, y out).

This module provides the MLP sublayer as ONE kernel:

    y = x + W2 @ silu(W1 @ LayerNorm(x) + b1) + b2         (models/layers.py MLP)

computed per row tile entirely in VMEM: the LN statistics are full-lane
reductions, the two GEMMs run on the MXU back to back, and only x and y touch
HBM. Semantics parity: /root/reference/train/layers.py:174-196 (pre-LN MLP
with SiLU) plus the residual add at layers.py:221-223.

Backward: a custom VJP. The forward (when differentiated) additionally emits
the post-LN activations and the pre-SiLU hidden as bf16 residuals — exactly
what XLA autodiff of the unfused chain keeps alive — and the backward runs the
standard dgrad/wgrad GEMMs + LN backward in XLA (they are partitioner-visible
and already near-peak; the fusion win is forward HBM traffic, not backward
FLOPs).

Dispatch policy matches ops/flash_attention.py: Pallas on TPU (or interpret),
shard_mapped over the batch axes under a data/fsdp mesh, XLA module chain
under tensor>1 meshes (the Megatron column/row split of W1/W2 must stay with
the partitioner) and off-TPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-6

# Rows per grid instance. 1024×1536 f32 hidden = 6 MB in VMEM; per-instance
# GEMM work 2×1024×512×1536 ≈ 3.2 GFLOP ≈ 16 µs MXU — big enough to amortize
# instance overhead, small enough to double-buffer the x/y blocks.
_ROW_TILE = int(os.environ.get("VVT_MLP_ROWS", "1024"))


def _ln_f32(xf: jnp.ndarray):
    """Full-lane LayerNorm statistics (f32, flax-clamped variance)."""
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean), 0.0
    )
    r = jax.lax.rsqrt(var + _LN_EPS)
    return (xf - mean) * r, r


def _mlp_body(x, g, b, w1, b1, w2, b2):
    """Shared fwd math on VMEM values: returns (y, xa_bf16, h_bf16)."""
    xf = x.astype(jnp.float32)
    xn, _ = _ln_f32(xf)
    xa = (xn * g + b).astype(w1.dtype)  # post-affine, bf16 like the module LN
    h = (
        jax.lax.dot_general(
            xa, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        + b1
    ).astype(w1.dtype)
    hf = h.astype(jnp.float32)
    a = (hf * jax.nn.sigmoid(hf)).astype(w2.dtype)
    y = (
        jax.lax.dot_general(
            a, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        + b2
    )
    return (xf + y).astype(x.dtype), xa, h


def _mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
    y, _, _ = _mlp_body(
        x_ref[:], g_ref[:].astype(jnp.float32), b_ref[:].astype(jnp.float32),
        w1_ref[:], b1_ref[:].astype(jnp.float32),
        w2_ref[:], b2_ref[:].astype(jnp.float32),
    )
    y_ref[:] = y


def _mlp_kernel_res(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    y_ref, xa_ref, h_ref):
    y, xa, h = _mlp_body(
        x_ref[:], g_ref[:].astype(jnp.float32), b_ref[:].astype(jnp.float32),
        w1_ref[:], b1_ref[:].astype(jnp.float32),
        w2_ref[:], b2_ref[:].astype(jnp.float32),
    )
    y_ref[:] = y
    xa_ref[:] = xa
    h_ref[:] = h


@functools.partial(jax.jit, static_argnames=("interpret", "save_residuals"))
def _mlp_pallas(x2, g, b, w1, b1, w2, b2, interpret=False, save_residuals=False):
    """(N, C) rows through the fused kernel; returns y or (y, xa, h)."""
    n, c = x2.shape
    f = w1.shape[1]
    rows = min(_ROW_TILE, ((n + 7) // 8) * 8)  # sublane-aligned row tiles
    pad = (-n) % rows
    if pad:
        x2 = jnp.concatenate([x2, jnp.zeros((pad, c), x2.dtype)])
    grid = ((n + pad) // rows,)

    row_spec = pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    hid_spec = pl.BlockSpec((rows, f), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_c = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec_f = pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((c, f), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((f, c), lambda i: (0, 0), memory_space=pltpu.VMEM)

    kernel = _mlp_kernel_res if save_residuals else _mlp_kernel
    out_specs = (row_spec, row_spec, hid_spec) if save_residuals else row_spec
    out_shape = (
        (
            jax.ShapeDtypeStruct((n + pad, c), x2.dtype),
            jax.ShapeDtypeStruct((n + pad, c), jnp.bfloat16),
            jax.ShapeDtypeStruct((n + pad, f), jnp.bfloat16),
        )
        if save_residuals
        else jax.ShapeDtypeStruct((n + pad, c), x2.dtype)
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec, vec_c, vec_c, w1_spec, vec_f, w2_spec, vec_c],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(x2, g, b, w1, b1, w2, b2)
    if save_residuals:
        y, xa, h = out
        return y[:n], xa[:n], h[:n]
    return out[:n]


def _prep(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """Cast params to kernel dtypes and flatten x to rows."""
    b_, s, c = x.shape
    x2 = x.reshape(b_ * s, c)
    return (
        x2,
        ln_scale.astype(jnp.float32).reshape(1, c),
        ln_bias.astype(jnp.float32).reshape(1, c),
        w1.astype(jnp.bfloat16),
        b1.astype(jnp.float32).reshape(1, -1),
        w2.astype(jnp.bfloat16),
        b2.astype(jnp.float32).reshape(1, c),
    )


def mlp_reference_chain(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """Pure-jnp sublayer (module-equivalent math) for fallback and tests."""
    xf = x.astype(jnp.float32)
    xn, _ = _ln_f32(xf)
    xa = (xn * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)).astype(
        jnp.bfloat16
    )
    h = (
        jax.lax.dot_general(
            xa, w1.astype(jnp.bfloat16), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1.astype(jnp.float32)
    ).astype(jnp.bfloat16)
    hf = h.astype(jnp.float32)
    a = (hf * jax.nn.sigmoid(hf)).astype(jnp.bfloat16)
    y = (
        jax.lax.dot_general(
            a, w2.astype(jnp.bfloat16), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2.astype(jnp.float32)
    )
    return (xf + y).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_mlp_sublayer(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = x + MLP(LN(x)) on (B, S, C) tokens, one HBM round trip.

    Params arrive in their stored dtype (f32) and are cast in the wrapper, so
    cotangents come back f32 and Adam sees full-precision grads.
    """
    y, _, _ = _sublayer_fwd_impl(
        x, ln_scale, ln_bias, w1, b1, w2, b2, interpret, save_residuals=False
    )
    return y


def _sublayer_fwd_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, interpret,
                       save_residuals):
    from video_vae_tpu.ops.conv3d import _env_interpret
    from video_vae_tpu.parallel.sharding import (
        log_dispatch as _log_dispatch,
        mesh_info as _mesh_info,
        shard_map_unchecked as _shard_map,
    )

    interpret = interpret or _env_interpret()
    on_tpu = jax.devices()[0].platform == "tpu"
    bsz, s, c = x.shape
    mesh, axes = _mesh_info(bsz, tensor_safe=False)
    if not (on_tpu or interpret) or (mesh is not None and axes is None):
        # XLA module-equivalent chain (CPU, or Megatron-TP mesh where the
        # W1/W2 column/row split must stay with the partitioner).
        y = mlp_reference_chain(x, ln_scale, ln_bias, w1, b1, w2, b2)
        return y, None, None

    args = _prep(x, ln_scale, ln_bias, w1, b1, w2, b2)
    _log_dispatch("fused_mlp", "pallas", axes)
    if mesh is None:
        out = _mlp_pallas(*args, interpret=interpret, save_residuals=save_residuals)
    else:
        from jax.sharding import PartitionSpec as P

        x2 = args[0].reshape(bsz, s, c)  # shard_map over the batch axis

        def body(x3, g, b, w1c, b1c, w2c, b2c):
            n_loc = x3.shape[0] * x3.shape[1]
            return _mlp_pallas(
                x3.reshape(n_loc, c), g, b, w1c, b1c, w2c, b2c,
                interpret=interpret, save_residuals=save_residuals,
            )

        # Rows are (b·s)-flattened batch-major, sharded on b — shard_map's
        # row-axis concat therefore reproduces the global row order exactly.
        out = _shard_map(
            body, mesh,
            (P(axes),) + (P(),) * 6,
            (P(axes), P(axes), P(axes)) if save_residuals else P(axes),
        )(x2, *args[1:])
    if save_residuals:
        y2, xa, h = out
        return y2.reshape(bsz, s, c), xa, h
    return out.reshape(bsz, s, c), None, None


def _sublayer_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, interpret):
    y, xa, h = _sublayer_fwd_impl(
        x, ln_scale, ln_bias, w1, b1, w2, b2, interpret, save_residuals=True
    )
    return y, (x, ln_scale, ln_bias, w1, b1, w2, xa, h)


def _sublayer_bwd(interpret, residuals, dy):
    """dgrad/wgrad GEMMs + LN backward in XLA (partitioner-visible, near-peak).

    ``xa``/``h`` are the bf16 residuals the forward kernel emitted — the same
    live set XLA autodiff keeps for the unfused chain. When the forward fell
    back to the XLA chain (xa is None), recompute them here (still cheaper
    than differentiating through a second full chain).
    """
    x, ln_scale, ln_bias, w1, b1, w2, xa, h = residuals
    bsz, s, c = x.shape
    n = bsz * s
    x2 = x.reshape(n, c)
    dy2 = dy.reshape(n, c).astype(jnp.float32)

    xf = x2.astype(jnp.float32)
    xn, r = _ln_f32(xf)
    g32 = ln_scale.astype(jnp.float32)
    if xa is None:  # forward took the XLA chain — rebuild the live set
        xa = (xn * g32 + ln_bias.astype(jnp.float32)).astype(jnp.bfloat16)
        h = (
            jax.lax.dot_general(
                xa, w1.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b1.astype(jnp.float32)
        ).astype(jnp.bfloat16)

    hf = h.astype(jnp.float32)
    sig = jax.nn.sigmoid(hf)
    a16 = (hf * sig).astype(jnp.bfloat16)
    dy16 = dy2.astype(jnp.bfloat16)

    da = jax.lax.dot_general(  # dy @ w2ᵀ : (N, F)
        dy16, w2.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw2 = jax.lax.dot_general(  # aᵀ @ dy : (F, C)
        a16, dy16, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db2 = jnp.sum(dy2, axis=0)
    dh = da * (sig + hf * sig * (1.0 - sig))
    dh16 = dh.astype(jnp.bfloat16)
    dw1 = jax.lax.dot_general(  # xaᵀ @ dh : (C, F)
        xa, dh16, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1 = jnp.sum(dh, axis=0)
    dxa = jax.lax.dot_general(  # dh @ w1ᵀ : (N, C)
        dh16, w1.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dg = jnp.sum(dxa * xn, axis=0)
    db = jnp.sum(dxa, axis=0)
    du = dxa * g32
    dx_ln = r * (
        du
        - jnp.mean(du, axis=-1, keepdims=True)
        - xn * jnp.mean(du * xn, axis=-1, keepdims=True)
    )
    dx = (dy2 + dx_ln).astype(x.dtype).reshape(bsz, s, c)
    return (
        dx,
        dg.astype(ln_scale.dtype),
        db.astype(ln_scale.dtype),
        dw1.astype(w1.dtype),
        db1.astype(w1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(w2.dtype),
    )


fused_mlp_sublayer.defvjp(_sublayer_fwd, _sublayer_bwd)
