"""Fused masked attention as a Pallas TPU kernel, with custom VJP.

Design (see /opt/skills/guides/pallas_guide.md): the factored space/time model
attends over *short* sequences — t ≤ 64 temporally, hw = 256 spatially
(/root/reference/train/layers.py:210-224) — with a *huge* effective batch
(b·hw or b·t, times heads). The right kernel shape is therefore not a
streaming/online-softmax flash loop (that pays bookkeeping to avoid
materializing an S×S matrix that here fits VMEM trivially) but a single fused
block per (batch-tile, head): QKᵀ → mask → softmax → ·V entirely in VMEM,
batched over a tile of BB batch rows so the MXU sees (BB·S, D)-scale matmuls.
One HBM round-trip for q/k/v/o instead of XLA's score-matrix writeback.

The backward pass recomputes probabilities in-kernel (flash-style remat) and
emits dq, dk, dv in one fused kernel — no S×S residuals ever reach HBM.

Interface matches jax.nn.dot_product_attention(q, k, v, mask) for the mask
layouts this model uses ((B,1,1,S) key-padding masks or None). Non-TPU
backends fall back to XLA in ops/attention.py; interpret=True runs the same
kernel on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Batch rows processed per kernel instance. 8×(S=256)×(D=64) bf16 ≈ 256 KB per
# tensor in VMEM; scores 8×256×256 fp32 ≈ 2 MB — comfortably inside ~16 MB VMEM.
_BLOCK_B = 8
_NEG_INF = -1e30


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[:]  # (BB, S, D)
    k = k_ref[:]
    v = v_ref[:]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    s = s * scale
    mask = mask_ref[:]  # (BB, 1, S) int32: 1 = attend (pre-shaped host-side —
    # Mosaic cannot shape-cast narrow-int vectors in-kernel)
    s = jnp.where(mask > 0, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[:] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale: float):
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    do = do_ref[:].astype(jnp.float32)
    # Recompute probabilities (flash-style rematerialization).
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    s = s * scale
    mask = mask_ref[:]  # (BB, 1, S) int32
    s = jnp.where(mask > 0, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l  # (BB, S, S) fp32

    # dv = pᵀ · do
    dv = jax.lax.dot_general(
        p, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    # dp = do · vᵀ
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # softmax backward: ds = p ∘ (dp − rowsum(p ∘ dp))
    row = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - row) * scale
    dq = jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dk = jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _specs(bb: int, s: int, d: int):
    tensor = pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((bb, 1, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return tensor, mask


def _flatten(q, k, v, mask):
    """(B,S,H,D) + (B,1,1,S) → head-major (B·H, S, D) and (B·H, S) int8 mask."""
    b, s, h, d = q.shape
    qt = jnp.transpose(q, (0, 2, 1, 3)).reshape(b * h, s, d)
    kt = jnp.transpose(k, (0, 2, 1, 3)).reshape(b * h, s, d)
    vt = jnp.transpose(v, (0, 2, 1, 3)).reshape(b * h, s, d)
    if mask is None:
        m = jnp.ones((b * h, 1, s), jnp.int32)
    else:
        m = jnp.broadcast_to(mask.reshape(b, 1, 1, s).astype(jnp.int32), (b, h, 1, s)).reshape(
            b * h, 1, s
        )
    return qt, kt, vt, m


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention over (B, S, H, D); mask is a (B,1,1,S) key-padding mask."""
    out, _ = _flash_fwd(q, k, v, mask, interpret)
    return out


def _pad_batch(x, bb):
    n = x.shape[0]
    pad = (-n) % bb
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], axis=0)
    return x, n


def _flash_fwd(q, k, v, mask, interpret):
    b, s, h, d = q.shape
    scale = 1.0 / (d**0.5)
    qt, kt, vt, m = _flatten(q, k, v, mask)
    bb = min(_BLOCK_B, qt.shape[0])
    qt, n = _pad_batch(qt, bb)
    kt, _ = _pad_batch(kt, bb)
    vt, _ = _pad_batch(vt, bb)
    # Padded batch rows get an all-ones mask: an all-zero key mask would make
    # softmax 0/0 (the real rows never see them).
    m = jnp.concatenate(
        [m, jnp.ones((qt.shape[0] - n, 1, s), jnp.int32)], axis=0
    ) if qt.shape[0] != n else m

    tensor_spec, mask_spec = _specs(bb, s, d)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(qt.shape[0] // bb,),
        in_specs=[tensor_spec, tensor_spec, tensor_spec, mask_spec],
        out_specs=tensor_spec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        interpret=interpret,
    )(qt, kt, vt, m)
    out = out[:n].reshape(b, h, s, d).transpose(0, 2, 1, 3)
    return out, (q, k, v, mask)


def _flash_bwd(interpret, residuals, g):
    q, k, v, mask = residuals
    b, s, h, d = q.shape
    scale = 1.0 / (d**0.5)
    qt, kt, vt, m = _flatten(q, k, v, mask)
    gt = jnp.transpose(g, (0, 2, 1, 3)).reshape(b * h, s, d)
    bb = min(_BLOCK_B, qt.shape[0])
    qt, n = _pad_batch(qt, bb)
    kt, _ = _pad_batch(kt, bb)
    vt, _ = _pad_batch(vt, bb)
    gt, _ = _pad_batch(gt, bb)
    m = jnp.concatenate(
        [m, jnp.ones((qt.shape[0] - n, 1, s), jnp.int32)], axis=0
    ) if qt.shape[0] != n else m

    tensor_spec, mask_spec = _specs(bb, s, d)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(qt.shape[0] // bb,),
        in_specs=[tensor_spec, tensor_spec, tensor_spec, mask_spec, tensor_spec],
        out_specs=(tensor_spec, tensor_spec, tensor_spec),
        out_shape=(
            jax.ShapeDtypeStruct(qt.shape, q.dtype),
            jax.ShapeDtypeStruct(qt.shape, k.dtype),
            jax.ShapeDtypeStruct(qt.shape, v.dtype),
        ),
        interpret=interpret,
    )(qt, kt, vt, m, gt)

    def unflat(x):
        return x[:n].reshape(b, h, s, d).transpose(0, 2, 1, 3)

    return unflat(dq), unflat(dk), unflat(dv), None


flash_attention.defvjp(
    lambda q, k, v, mask, interpret: _flash_fwd(q, k, v, mask, interpret),
    _flash_bwd,
)
