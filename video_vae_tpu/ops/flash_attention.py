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
import os
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


# ---------------------------------------------------------------------------
# Fused qk-norm + RoPE + attention on the raw fused-QKV projection output.
#
# The pre-attention chain (split → per-head LayerNorm on q/k → rotary) is a
# stack of memory-bound elementwise passes plus two head-layout transposes
# (models/layers.py round-1 path). This kernel consumes the QKV projection
# output directly — grid (batch-tile, head), BlockSpecs carve the q/k/v head
# slices out of the fused (B, S, 3·H·D) array — and applies LayerNorm + rotary
# in VMEM before the score matmul. One HBM round trip for the whole chain.
#
# rotate_half(x) = concat(-x2, x1) is a lane roll by D/2 with a sign flip on
# the first half — no lane-concat relayout (pallas_guide.md: prefer rolls).
#
# Backward recomputes the identical chain in XLA (jax.vjp over the pure-jnp
# reference below) — fwd-path fusion is where the serving/bench win is, and
# the bwd stays numerically exact vs autodiff.
# ---------------------------------------------------------------------------

_LN_EPS = 1e-6


def _seg_max_lanes(x, seq):
    """Per-segment max over SEQ-lane segments of the last dim, broadcast back
    to every lane: a suffix max-scan then a prefix max-scan, log2(seq) masked
    rolls each (packed small-S path; see _fused_kernel)."""
    L = x.shape[-1]
    phase = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2) % seq
    step = 1
    while step < seq:
        rolled = pltpu.roll(x, shift=L - step, axis=2)
        x = jnp.where(phase < seq - step, jnp.maximum(x, rolled), x)
        step *= 2
    step = 1
    while step < seq:
        rolled = pltpu.roll(x, shift=step, axis=2)
        x = jnp.where(phase >= step, jnp.maximum(x, rolled), x)
        step *= 2
    return x


def _seg_sum_bcast(x, seq, num_heads):
    """Per-segment sum over SEQ-lane segments, broadcast back to every lane,
    via two matmuls against 0/1 segment matrices (lane dim of the intermediate
    stays ≥ 2·H for the 128-lane tiling)."""
    L = x.shape[-1]
    seg_rows = (
        jax.lax.broadcasted_iota(jnp.int32, (L, 2 * num_heads), 0) // seq
        == jax.lax.broadcasted_iota(jnp.int32, (L, 2 * num_heads), 1)
    ).astype(jnp.float32)
    sums = jax.lax.dot_general(
        x, seg_rows, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    seg_back = (
        jax.lax.broadcasted_iota(jnp.int32, (num_heads, L), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (num_heads, L), 1) // seq
    ).astype(jnp.float32)
    return jax.lax.dot_general(
        sums[:, :, :num_heads], seg_back, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _attention_core(
    qkv, mask, qs, ks, cos3, sin3, seg, o_ref,
    *, scale: float, num_heads: int, packed: bool, has_mask: bool,
):
    """The in-VMEM chain on a qkv VALUE: per-head LN + RoPE + attention,
    stored head-slice-wise into ``o_ref`` (an output or scratch ref).

    Shared by _fused_kernel (which reads the fused-QKV projection from HBM)
    and _sublayer_kernel (which computes it in-kernel off the raw tokens).

    The pre-attention chain (per-head LayerNorm + rotary) runs VECTORIZED over
    all heads in one (BB, S, H·D) pass — a per-head loop of D=64-lane VPU ops
    measured 0.355 ms/call regardless of shape (xplane), ~5× over the memory
    bound. Per-head segmentation uses lane tricks:
    * segment mean/var: one (S,HD)@(HD,H) matmul against the 0/1 segment
      matrix seg, broadcast back with its transpose — no reshapes
    * rotate_half within each D-lane segment: two global rolls of ±D/2 and a
      lane-phase select (a global roll crosses segment boundaries exactly at
      the lanes the phase select discards)
    * scales and rope tables arrive pre-tiled to H·D lanes
    Heads are looped ONLY for the two MXU dots + softmax.
    """
    hd = qkv.shape[-1] // 3
    d = hd // num_heads
    lane_phase = jax.lax.broadcasted_iota(jnp.int32, (1, 1, hd), dimension=2) & (d - 1)
    cos = cos3
    sin = sin3

    def norm_rope(x, scale_vec):
        x = x.astype(jnp.float32)  # (BB, S, HD)
        sums = jax.lax.dot_general(  # (BB, S, 2H): per-head Σx, then zeros
            x, seg, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        sqs = jax.lax.dot_general(
            jnp.square(x), seg, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        segT = seg[:, : num_heads]  # (HD, H)
        mean = jax.lax.dot_general(  # broadcast back: (BB, S, HD)
            sums[:, :, : num_heads], segT,
            (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * (1.0 / d)
        meansq = jax.lax.dot_general(
            sqs[:, :, : num_heads], segT,
            (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * (1.0 / d)
        # E[x²]−mean² can go (slightly) NEGATIVE from f32 cancellation when
        # |mean| ≫ sigma (constant-ish tokens: zero/padded frames, fill
        # token); unclamped, rsqrt(var+eps) is NaN once var < −eps. flax
        # clamps the same form (nnx/nn/normalization.py:122) — match it.
        # Root cause of the remat NaN-grads bisect (r3): the remat-recompute
        # fused this chain differently, flipping borderline variances.
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        xn = (x - mean) * jax.lax.rsqrt(var + _LN_EPS) * scale_vec
        # rotate_half within each D-lane segment
        fwd = pltpu.roll(xn, shift=hd - d // 2, axis=2)  # lane j ← xn[j + d/2]
        bwd = pltpu.roll(xn, shift=d // 2, axis=2)       # lane j ← xn[j − d/2]
        rot = jnp.where(lane_phase < d // 2, -fwd, bwd)
        return xn * cos + rot * sin

    qn = norm_rope(qkv[:, :, :hd], qs)
    kn = norm_rope(qkv[:, :, hd : 2 * hd], ks)

    if packed:
        # Small-S packed path: ONE (BB, S, H·S) score block for all heads.
        # At the temporal shape (S=16) the per-head loop's scores use 16 of
        # 128 lanes and run H separate softmax chains; here the heads pack
        # the lane dim to full width via BLOCK-DIAGONAL contraction — the
        # sublane-tiled K/V copies are masked so each H·S lane segment only
        # contracts its own head's D-lane segment (zero lanes add exact
        # zeros in the f32 accumulator, so numerics match the per-head dot).
        seq = o_ref.shape[1]
        L = num_heads * seq  # lane dim of the packed scores; mask arrives
        # pre-tiled to (BB, 1, L) by the wrapper
        v_all = qkv[:, :, 2 * hd :]
        # head-of-row (sublane, H·S) vs head-of-lane (HD) block mask
        bm = (
            jax.lax.broadcasted_iota(jnp.int32, (L, hd), 0) // seq
            == jax.lax.broadcasted_iota(jnp.int32, (L, hd), 1) // d
        )
        k_t = jnp.concatenate([kn] * num_heads, axis=1)  # (BB, H·S, HD) f32
        k_mat = jnp.where(bm[None], k_t, 0.0)
        v_t = jnp.concatenate([v_all] * num_heads, axis=1)
        v_mat = jnp.where(bm[None], v_t, jnp.zeros((), v_all.dtype))
        s_all = jax.lax.dot_general(  # (BB, S, H·S)
            qn, k_mat, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s_all = s_all * scale
        if has_mask:
            s_all = jnp.where(mask > 0, s_all, _NEG_INF)
        m_seg = _seg_max_lanes(s_all, seq)
        p = jnp.exp(s_all - m_seg)
        l_b = _seg_sum_bcast(p, seq, num_heads)
        p = (p / l_b).astype(v_all.dtype)
        o = jax.lax.dot_general(  # (BB, S, HD)
            p, v_mat, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = o.astype(o_ref.dtype)
        return

    def head_scores(h):
        q = qn[:, :, h * d : (h + 1) * d]
        k = kn[:, :, h * d : (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        s = s * scale
        if has_mask:
            s = jnp.where(mask > 0, s, _NEG_INF)
        return s

    if os.environ.get("VVT_ATTN_PIPELINE", "0") == "1":
        # Software-pipelined head loop (identical math, different issue order):
        # head h+1's independent score matmul is ISSUED before head h's
        # softmax VPU chain, so the MXU crunches scores while the VPU walks
        # max/exp/sum — the per-head chain is the residual overhead that keeps
        # the spatial-shape calls at ~0.16 ms vs ~0.07 SOL (PERF.md). Costs
        # one extra (BB, S, S) f32 score block of VMEM stack.
        s_cur = head_scores(0)
        for h in range(num_heads):
            s_next = head_scores(h + 1) if h + 1 < num_heads else None
            v = qkv[:, :, 2 * hd + h * d : 2 * hd + (h + 1) * d]
            m = jnp.max(s_cur, axis=-1, keepdims=True)
            p = jnp.exp(s_cur - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            o_ref[:, :, h * d : (h + 1) * d] = (o * (1.0 / l)).astype(o_ref.dtype)
            s_cur = s_next
        return

    for h in range(num_heads):
        v = qkv[:, :, 2 * hd + h * d : 2 * hd + (h + 1) * d]
        s = head_scores(h)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        # fold the softmax normalizer into the (S, D) output instead of
        # dividing the (S, S) probability matrix — one big VPU pass saved
        # per head (S/D = 4× fewer divides at the spatial shape)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, h * d : (h + 1) * d] = (o * (1.0 / l)).astype(o_ref.dtype)


def _fused_kernel(
    qkv_ref, mask_ref, qs_ref, ks_ref, cos_ref, sin_ref, seg_ref, o_ref,
    *, scale: float, num_heads: int, packed: bool = False, has_mask: bool = True,
):
    """Block = a batch tile of the FULL fused (BB, S, 3·H·D) projection output
    (full-lane blocks — per-head 64-lane blocks violate the 128-lane tiling on
    real TPUs). The math lives in _attention_core."""
    _attention_core(
        qkv_ref[:],
        mask_ref[:],
        qs_ref[:].astype(jnp.float32),
        ks_ref[:].astype(jnp.float32),
        cos_ref[:].astype(jnp.float32)[None],
        sin_ref[:].astype(jnp.float32)[None],
        seg_ref[:].astype(jnp.float32),
        o_ref,
        scale=scale,
        num_heads=num_heads,
        packed=packed,
        has_mask=has_mask,
    )


def _sublayer_kernel(
    x_ref, mask_ref, lng_ref, lnb_ref, wqkv_ref, bqkv_ref, qs_ref, ks_ref,
    cos_ref, sin_ref, seg_ref, wout_ref, bout_ref, y_ref, o_buf,
    *, scale: float, num_heads: int, packed: bool, has_mask: bool,
    qkv_out_ref=None, o_out_ref=None,
):
    """FULL attention sublayer on a token tile, one HBM round trip:

        y = x + Wout · attention(per-head-LN+RoPE(LN(x) · Wqkv + b))

    The unfused pipeline moves ~90 MB through HBM per flagship call (LN out,
    25 MB qkv write+read around the projection GEMM, 8 MB attention out,
    25 MB projection out); this kernel moves ~19 MB (x in, weights, y out) and
    runs both GEMMs on tokens already resident in VMEM. Parity: the Attention
    module chain, models/layers.py:261-303 (/root/reference/train/layers.py:
    131-171) plus the residual add at layers.py:216.

    ``qkv_out_ref``/``o_out_ref`` (training variant) additionally spill the
    bf16 qkv projection and attention output — the residuals the custom VJP
    needs (the same live set XLA autodiff keeps for the unfused chain).
    """
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    # token LayerNorm over the full feature lane dim (flax-clamped variance)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean), 0.0
    )
    xn = (xf - mean) * jax.lax.rsqrt(var + _LN_EPS)
    xa = (
        xn * lng_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    ).astype(wqkv_ref.dtype)
    qkv = (
        jax.lax.dot_general(
            xa, wqkv_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(x.dtype)
    if qkv_out_ref is not None:
        qkv_out_ref[:] = qkv
    _attention_core(
        qkv,
        mask_ref[:],
        qs_ref[:].astype(jnp.float32),
        ks_ref[:].astype(jnp.float32),
        cos_ref[:].astype(jnp.float32)[None],
        sin_ref[:].astype(jnp.float32)[None],
        seg_ref[:].astype(jnp.float32),
        o_buf,
        scale=scale,
        num_heads=num_heads,
        packed=packed,
        has_mask=has_mask,
    )
    o = o_buf[:].astype(x.dtype)
    if o_out_ref is not None:
        o_out_ref[:] = o
    y = (
        jax.lax.dot_general(
            o, wout_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bout_ref[:].astype(jnp.float32)
    )
    y_ref[:] = (xf + y).astype(y_ref.dtype)


def _reference_fused_chain(qkv, q_scale, k_scale, mask, num_heads, cos, sin):
    """Pure-jnp chain: split → per-head LN (no bias) → RoPE → attention.

    Matches nnx.LayerNorm(use_bias=False) + ops.rope numerics; used for the
    backward pass, non-TPU fallback, and numerics tests.
    """
    b, s, three_hd = qkv.shape
    d = three_hd // (3 * num_heads)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(x):
        return x.reshape(b, s, num_heads, d)

    def ln(x, scale):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        # clamped like flax (normalization.py:122): cancellation can make
        # this negative on constant-ish tokens → rsqrt NaN (remat bisect r3)
        var = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean), 0.0
        )
        return (xf - mean) * jax.lax.rsqrt(var + _LN_EPS) * scale.astype(jnp.float32)

    def rope(x):
        c = cos[None, :, None, :].astype(x.dtype)
        si = sin[None, :, None, :].astype(x.dtype)
        x1, x2 = jnp.split(x, 2, axis=-1)
        rot = jnp.concatenate((-x2, x1), axis=-1)
        return x * c + rot * si

    qh = rope(ln(heads(q), q_scale))
    kh = rope(ln(heads(k), k_scale))
    vh = heads(v)
    out = jax.nn.dot_product_attention(
        qh.astype(qkv.dtype), kh.astype(qkv.dtype), vh, mask=mask
    )
    return out.reshape(b, s, num_heads * d)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7)
)
def fused_qkv_attention(
    qkv: jnp.ndarray,
    q_scale: jnp.ndarray,
    k_scale: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    num_heads: int,
    rope_base: float = 10000.0,
    rope_alpha: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, S, 3·H·D) fused-QKV → attention output (B, S, H·D).

    mask: (B, 1, 1, S) bool key-padding mask or None. Scales are the (D,)
    LayerNorm scale params of q_norm/k_norm.
    """
    out, _ = _fused_fwd(
        qkv, q_scale, k_scale, mask, num_heads, rope_base, rope_alpha, interpret
    )
    return out


def _tile_operands(q_scale, k_scale, cos, sin, hd, d, num_heads):
    """Per-head params/tables pre-tiled across the H·D lane dim, plus the 0/1
    segment matrix for the in-kernel per-head mean/var (see _fused_kernel).
    SHARED by the fwd and bwd wrappers."""
    qs_tiled = jnp.tile(q_scale.reshape(1, d), (1, num_heads))
    ks_tiled = jnp.tile(k_scale.reshape(1, d), (1, num_heads))
    cos_t = jnp.tile(cos.astype(jnp.float32), (1, num_heads))  # (S, HD)
    sin_t = jnp.tile(sin.astype(jnp.float32), (1, num_heads))
    lane = jnp.arange(hd)
    seg = jnp.zeros((hd, 2 * num_heads), jnp.float32).at[lane, lane // d].set(1.0)
    return qs_tiled, ks_tiled, cos_t, sin_t, seg


def _packed_and_bb(s: int, num_heads: int):
    """(packed, bb) tile rule SHARED by the fwd and bwd wrappers.

    bb=8/64 measured best end-to-end (16/128 A/B'd at -1 clips/s: bigger
    tiles reduce grid parallelism without improving the VPU-bound chain).
    Scale down between those anchors: at s=64, bb=64 blocks put ~79 MB of
    f32 chain temporaries on the Mosaic VMEM stack (64-frame curriculum
    bucket OOM'd at compile, soak probe r3) — keep bb·s ≈ 1024 rows.
    Packed small-S path (VVT_ATTN_PACKED=1): all heads' scores in one
    full-lane (S, H·S) block — see _fused_kernel. Smaller batch tiles keep
    the block-diagonal K/V copies (bb·H·S·HD f32) on the VMEM stack.
    """
    packed = (
        s < 128
        and (s * num_heads) % 128 == 0
        and os.environ.get("VVT_ATTN_PACKED", "1") == "1"
    )
    bb = 8 if s >= 128 else max(8, (512 if packed else 1024) // s)
    return packed, bb


def _fused_pallas(
    qkv, m, qs_tiled, ks_tiled, cos_t, sin_t, seg, *, num_heads, interpret,
    has_mask=True,
):
    """The pallas_call portion on (possibly per-shard) operands."""
    b, s, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // num_heads
    packed, bb = _packed_and_bb(s, num_heads)
    pad = (-b) % bb
    if pad:
        qkv = jnp.concatenate([qkv, jnp.zeros((pad, s, three_hd), qkv.dtype)], axis=0)
        m = jnp.concatenate([m, jnp.ones((pad, 1, s), jnp.int32)], axis=0)
    if packed:
        m = jnp.tile(m, (1, 1, num_heads))  # (B, 1, H·S): per-head key mask
    s_m = s * num_heads if packed else s

    qkv_spec = pl.BlockSpec((bb, s, three_hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((1, hd), lambda i: (0, 0), memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((s, hd), lambda i: (0, 0), memory_space=pltpu.VMEM)
    seg_spec = pl.BlockSpec((hd, 2 * num_heads), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((bb, 1, s_m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _fused_kernel, scale=1.0 / (d**0.5), num_heads=num_heads, packed=packed,
            has_mask=has_mask,
        ),
        grid=((b + pad) // bb,),
        in_specs=[
            qkv_spec,
            mask_spec,
            scale_spec,
            scale_spec,
            table_spec,
            table_spec,
            seg_spec,
        ],
        out_specs=pl.BlockSpec(
            (bb, s, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b + pad, s, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qkv, m, qs_tiled, ks_tiled, cos_t, sin_t, seg)
    return out[:b]


def _fused_call(qkv, q_scale, k_scale, mask, num_heads, rope_base, rope_alpha, interpret):
    from video_vae_tpu.ops.rope import rope_tables
    from video_vae_tpu.ops.conv3d import _env_interpret

    interpret = interpret or _env_interpret()
    b, s, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // num_heads
    cos, sin = rope_tables(s, d, rope_base, rope_alpha)

    on_tpu = jax.devices()[0].platform == "tpu"
    if not (on_tpu or interpret):
        return _reference_fused_chain(qkv, q_scale, k_scale, mask, num_heads, cos, sin)

    # Mesh safety: pallas_call is opaque to GSPMD — under a sharded mesh, run
    # the kernel per batch shard via shard_map (no collectives; the batch grid
    # is embarrassingly parallel), or fall back to the identical-math XLA
    # chain when the batch can't be evenly mapped. (ops/conv3d.py has the
    # same policy for the conv kernels.)
    from video_vae_tpu.parallel.sharding import (
        log_dispatch as _log_dispatch,
        mesh_info as _mesh_info,
        shard_map_unchecked as _shard_map,
    )

    mesh, axes = _mesh_info(b, tensor_safe=False)
    if mesh is not None and axes is None:
        return _reference_fused_chain(qkv, q_scale, k_scale, mask, num_heads, cos, sin)

    if mask is None:
        m = jnp.ones((b, 1, s), jnp.int32)
    else:
        m = mask.reshape(b, 1, s).astype(jnp.int32)

    # per-head params/tables pre-tiled across the H·D lane dim; 0/1 segment
    # matrix for the in-kernel per-head mean/var (see _fused_kernel)
    qs_tiled, ks_tiled, cos_t, sin_t, seg = _tile_operands(
        q_scale, k_scale, cos, sin, hd, d, num_heads
    )

    kernel = functools.partial(
        _fused_pallas, num_heads=num_heads, interpret=interpret,
        has_mask=mask is not None,
    )
    _log_dispatch("fused_attention", "pallas", axes)
    if mesh is None:
        return kernel(qkv, m, qs_tiled, ks_tiled, cos_t, sin_t, seg)
    from jax.sharding import PartitionSpec as P

    return _shard_map(
        kernel, mesh,
        (P(axes), P(axes), P(), P(), P(), P(), P()),
        P(axes),
    )(qkv, m, qs_tiled, ks_tiled, cos_t, sin_t, seg)


def _fused_fwd(qkv, q_scale, k_scale, mask, num_heads, rope_base, rope_alpha, interpret):
    out = _fused_call(
        qkv, q_scale, k_scale, mask, num_heads, rope_base, rope_alpha, interpret
    )
    return out, (qkv, q_scale, k_scale, mask)


def _fused_bwd_kernel(
    qkv_ref, mask_ref, qs_ref, ks_ref, cos_ref, sin_ref, seg_ref, g_ref,
    dqkv_ref, dqs_ref, dks_ref, dqr_buf, dkr_buf,
    *, scale: float, num_heads: int, packed: bool = False,
):
    """Fused backward: recompute the LN+RoPE+softmax chain in VMEM (flash-style
    remat), then emit dqkv in ONE kernel — the round-2 backward re-ran the
    whole chain as ~a dozen XLA elementwise passes + head transposes per
    block (ops/flash_attention.py r2 note; VERDICT r2 weak #2).

    Structure mirrors _fused_kernel: the pre-attention chain and its backward
    run VECTORIZED over all heads via the segment-matmul / global-roll lane
    tricks; heads are looped only for the MXU dots (7 per head here: softmax
    recompute 2 + dv/dp/dqr/dkr/… 5). Per-block dscale partials land in
    (1, HD) output rows — the wrapper sums blocks and folds the H segments.
    """
    hd = g_ref.shape[-1]
    d = hd // num_heads
    mask = mask_ref[:]
    cos = cos_ref[:].astype(jnp.float32)[None]
    sin = sin_ref[:].astype(jnp.float32)[None]
    seg = seg_ref[:].astype(jnp.float32)
    segT = seg[:, :num_heads]
    lane_phase = jax.lax.broadcasted_iota(jnp.int32, (1, 1, hd), dimension=2) & (d - 1)

    def seg_mean(x):  # per-head mean broadcast back to HD lanes
        sums = jax.lax.dot_general(
            x, seg, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return jax.lax.dot_general(
            sums[:, :, :num_heads], segT,
            (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * (1.0 / d)

    def ln_norm(x):  # (xn, r): normalized-unscaled activations + rsqrt factor
        mean = seg_mean(x)
        meansq = seg_mean(jnp.square(x))
        # clamp like flax — see norm_rope in _fused_kernel (remat NaN r3)
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        r = jax.lax.rsqrt(var + _LN_EPS)
        return (x - mean) * r, r

    def rope_fwd(x):
        fwd = pltpu.roll(x, shift=hd - d // 2, axis=2)
        bwd = pltpu.roll(x, shift=d // 2, axis=2)
        rot = jnp.where(lane_phase < d // 2, -fwd, bwd)
        return x * cos + rot * sin

    def rope_bwd(u):  # transpose of rope_fwd: rotᵀ(v)[j<d/2]=v[j+d/2], else −v[j−d/2]
        us = u * sin
        a = pltpu.roll(us, shift=hd - d // 2, axis=2)
        b_ = pltpu.roll(us, shift=d // 2, axis=2)
        return u * cos + jnp.where(lane_phase < d // 2, a, -b_)

    q = qkv_ref[:, :, :hd].astype(jnp.float32)
    k = qkv_ref[:, :, hd : 2 * hd].astype(jnp.float32)
    xn_q, r_q = ln_norm(q)
    xn_k, r_k = ln_norm(k)
    qs = qs_ref[:].astype(jnp.float32)
    ks = ks_ref[:].astype(jnp.float32)
    qr = rope_fwd(xn_q * qs)
    kr = rope_fwd(xn_k * ks)

    do = g_ref[:].astype(jnp.float32)
    if packed:
        # Packed small-S path (mirrors _fused_kernel): one (BB, S, H·S)
        # score/probability block for all heads via block-diagonal K/V, one
        # segmented-softmax recompute, 6 full-lane MXU dots total instead of
        # 5 × H narrow ones. dv/dkr come out sublane-tiled (BB, H·S, HD);
        # the block mask + an H-way sublane-slice fold recover (BB, S, HD).
        seq = g_ref.shape[1]
        L = num_heads * seq  # mask_ref is pre-tiled to (BB, 1, L)
        v_all = qkv_ref[:, :, 2 * hd :].astype(jnp.float32)
        bm = (
            jax.lax.broadcasted_iota(jnp.int32, (L, hd), 0) // seq
            == jax.lax.broadcasted_iota(jnp.int32, (L, hd), 1) // d
        )[None]
        k_mat = jnp.where(bm, jnp.concatenate([kr] * num_heads, axis=1), 0.0)
        v_mat = jnp.where(bm, jnp.concatenate([v_all] * num_heads, axis=1), 0.0)

        def fold(x_pack):  # (BB, H·S, HD) block-diag → (BB, S, HD)
            x_sel = jnp.where(bm, x_pack, 0.0)
            out = x_sel[:, :seq, :]
            for h in range(1, num_heads):
                out = out + x_sel[:, h * seq : (h + 1) * seq, :]
            return out

        s_all = jax.lax.dot_general(
            qr, k_mat, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        s_all = jnp.where(mask > 0, s_all, _NEG_INF)
        p = jnp.exp(s_all - _seg_max_lanes(s_all, seq))
        p = p / _seg_sum_bcast(p, seq, num_heads)
        dv = fold(jax.lax.dot_general(
            p, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ))
        dqkv_ref[:, :, 2 * hd :] = dv.astype(dqkv_ref.dtype)
        dp = jax.lax.dot_general(
            do, v_mat, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        row = _seg_sum_bcast(p * dp, seq, num_heads)
        ds = p * (dp - row) * scale
        dqr_buf[:] = jax.lax.dot_general(
            ds, k_mat, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dkr_buf[:] = fold(jax.lax.dot_general(
            ds, qr, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ))

    for h in range(0 if packed else num_heads):
        sl = slice(h * d, (h + 1) * d)
        qh, kh = qr[:, :, sl], kr[:, :, sl]
        vh = qkv_ref[:, :, 2 * hd + h * d : 2 * hd + (h + 1) * d].astype(jnp.float32)
        doh = do[:, :, sl]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        s = jnp.where(mask > 0, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        dv = jax.lax.dot_general(
            p, doh, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dqkv_ref[:, :, 2 * hd + h * d : 2 * hd + (h + 1) * d] = dv.astype(dqkv_ref.dtype)
        dp = jax.lax.dot_general(
            doh, vh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        row = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = p * (dp - row) * scale
        dqr_buf[:, :, sl] = jax.lax.dot_general(
            ds, kh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dkr_buf[:, :, sl] = jax.lax.dot_general(
            ds, qh, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )

    def ln_scale_bwd(dr, xn, r, scale_vec, dscale_ref, dst):
        """Backward through rope → scale → LN, vectorized over heads."""
        dln = rope_bwd(dr)  # d(xn·scale)
        # dscale partial: Σ over (BB,S); H-segment fold happens host-side.
        # The ref is (1, 1, HD): a (n_blocks, HD) layout's (1, HD) block
        # would need an 8-divisible sublane dim, but (1, HD) blocks of a
        # (n_blocks, 1, HD) array match the full trailing dims exactly.
        dscale_ref[0, 0, :] = jnp.sum(dln * xn, axis=(0, 1))
        dxn = dln * scale_vec
        # LN backward per segment: dx = r·(dxn − mean(dxn) − xn·mean(dxn∘xn))
        dx = r * (dxn - seg_mean(dxn) - xn * seg_mean(dxn * xn))
        dqkv_ref[:, :, dst] = dx.astype(dqkv_ref.dtype)

    ln_scale_bwd(dqr_buf[:], xn_q, r_q, qs, dqs_ref, slice(0, hd))
    ln_scale_bwd(dkr_buf[:], xn_k, r_k, ks, dks_ref, slice(hd, 2 * hd))


def _fused_bwd_pallas(qkv, m, g, qs_tiled, ks_tiled, cos_t, sin_t, seg, *, num_heads, interpret):
    b, s, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // num_heads
    packed, bb = _packed_and_bb(s, num_heads)
    pad = (-b) % bb
    if pad:
        qkv = jnp.concatenate([qkv, jnp.zeros((pad, s, three_hd), qkv.dtype)], axis=0)
        m = jnp.concatenate([m, jnp.ones((pad, 1, s), jnp.int32)], axis=0)
        g = jnp.concatenate([g, jnp.zeros((pad, s, hd), g.dtype)], axis=0)
    if packed:
        m = jnp.tile(m, (1, 1, num_heads))
    s_m = s * num_heads if packed else s
    n_blocks = (b + pad) // bb

    qkv_spec = pl.BlockSpec((bb, s, three_hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bb, s, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((1, hd), lambda i: (0, 0), memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((s, hd), lambda i: (0, 0), memory_space=pltpu.VMEM)
    seg_spec = pl.BlockSpec((hd, 2 * num_heads), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((bb, 1, s_m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    part_spec = pl.BlockSpec((1, 1, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    dqkv, dqs_p, dks_p = pl.pallas_call(
        functools.partial(
            _fused_bwd_kernel, scale=1.0 / (d**0.5), num_heads=num_heads,
            packed=packed,
        ),
        grid=(n_blocks,),
        in_specs=[
            qkv_spec, mask_spec, scale_spec, scale_spec,
            table_spec, table_spec, seg_spec, o_spec,
        ],
        out_specs=(qkv_spec, part_spec, part_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b + pad, s, three_hd), qkv.dtype),
            jax.ShapeDtypeStruct((n_blocks, 1, hd), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 1, hd), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bb, s, hd), jnp.float32),
            pltpu.VMEM((bb, s, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(qkv, m, qs_tiled, ks_tiled, cos_t, sin_t, seg, g)
    # sum the per-block partials, fold the H lane segments back to (D,)
    dqs = jnp.sum(dqs_p, axis=(0, 1)).reshape(num_heads, d).sum(axis=0)
    dks = jnp.sum(dks_p, axis=(0, 1)).reshape(num_heads, d).sum(axis=0)
    return dqkv[:b], dqs, dks


def _fused_bwd(num_heads, rope_base, rope_alpha, interpret, residuals, g):
    from video_vae_tpu.ops.rope import rope_tables
    from video_vae_tpu.ops.conv3d import _env_interpret

    interpret = interpret or _env_interpret()
    qkv, q_scale, k_scale, mask = residuals
    b, s, three_hd = qkv.shape
    hd = three_hd // 3
    d = hd // num_heads
    cos, sin = rope_tables(s, d, rope_base, rope_alpha)

    on_tpu = jax.devices()[0].platform == "tpu"
    use_pallas = (on_tpu or interpret) and os.environ.get("VVT_FUSED_BWD", "pallas") != "xla"
    if use_pallas:
        from video_vae_tpu.parallel.sharding import (
            log_dispatch as _log_dispatch,
            mesh_info as _mesh_info,
            shard_map_unchecked as _shard_map,
        )

        mesh, axes = _mesh_info(b, tensor_safe=False)
        if not (mesh is not None and axes is None):
            if mask is None:
                m = jnp.ones((b, 1, s), jnp.int32)
            else:
                m = mask.reshape(b, 1, s).astype(jnp.int32)
            qs_tiled, ks_tiled, cos_t, sin_t, seg = _tile_operands(
                q_scale, k_scale, cos, sin, hd, d, num_heads
            )
            kern = functools.partial(
                _fused_bwd_pallas, num_heads=num_heads, interpret=interpret
            )
            _log_dispatch("fused_attention_bwd", "pallas", axes)
            if mesh is None:
                return (*kern(qkv, m, g, qs_tiled, ks_tiled, cos_t, sin_t, seg), None)
            from jax.sharding import PartitionSpec as P

            def body(qkv, m, g, qs_t, ks_t, cos_t, sin_t, seg):
                dqkv, dqs, dks = kern(qkv, m, g, qs_t, ks_t, cos_t, sin_t, seg)
                # scale params are replicated — their grads need the
                # cross-shard sum
                return dqkv, jax.lax.psum(dqs, axes), jax.lax.psum(dks, axes)

            dqkv, dqs, dks = _shard_map(
                body, mesh,
                (P(axes), P(axes), P(axes), P(), P(), P(), P(), P()),
                (P(axes), P(), P()),
            )(qkv, m, g, qs_tiled, ks_tiled, cos_t, sin_t, seg)
            return dqkv, dqs, dks, None

    _, vjp = jax.vjp(
        lambda qkv, qs, ks: _reference_fused_chain(
            qkv, qs, ks, mask, num_heads, cos, sin
        ),
        qkv, q_scale, k_scale,
    )
    dqkv, dqs, dks = vjp(g)
    return dqkv, dqs, dks, None


fused_qkv_attention.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Whole attention sublayer as ONE kernel: y = x + Wout·attn(chain(LN(x)·Wqkv)).
# See _sublayer_kernel for the HBM-traffic rationale. Backward reuses the
# existing Pallas attention backward for the qk-norm+RoPE+softmax segment and
# XLA GEMMs for the projections (partitioner-visible, already near-peak).
# ---------------------------------------------------------------------------


def _sublayer_pallas(
    x, m, lng, lnb, wqkv, bqkv, qs_tiled, ks_tiled, cos_t, sin_t, seg,
    wout, bout, *, num_heads, interpret, has_mask, save_residuals,
):
    b, s, c = x.shape
    three_hd = wqkv.shape[1]
    hd = three_hd // 3
    d = hd // num_heads
    packed, bb = _packed_and_bb(s, num_heads)
    pad = (-b) % bb
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, s, c), x.dtype)], axis=0)
        m = jnp.concatenate([m, jnp.ones((pad, 1, s), jnp.int32)], axis=0)
    if packed:
        m = jnp.tile(m, (1, 1, num_heads))
    s_m = s * num_heads if packed else s
    grid = ((b + pad) // bb,)

    x_spec = pl.BlockSpec((bb, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((bb, 1, s_m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vec_c = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec_3hd = pl.BlockSpec((1, three_hd), lambda i: (0, 0), memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((1, hd), lambda i: (0, 0), memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((s, hd), lambda i: (0, 0), memory_space=pltpu.VMEM)
    seg_spec = pl.BlockSpec((hd, 2 * num_heads), lambda i: (0, 0), memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((c, three_hd), lambda i: (0, 0), memory_space=pltpu.VMEM)
    wout_spec = pl.BlockSpec((hd, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    qkv_spec = pl.BlockSpec((bb, s, three_hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bb, s, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    out_specs = [x_spec]
    out_shape = [jax.ShapeDtypeStruct((b + pad, s, c), x.dtype)]
    if save_residuals:
        out_specs += [qkv_spec, o_spec]
        out_shape += [
            jax.ShapeDtypeStruct((b + pad, s, three_hd), x.dtype),
            jax.ShapeDtypeStruct((b + pad, s, hd), x.dtype),
        ]

    def kernel(x_ref, mask_ref, lng_ref, lnb_ref, wqkv_ref, bqkv_ref, qs_ref,
               ks_ref, cos_ref, sin_ref, seg_ref, wout_ref, bout_ref,
               *outs_and_scratch):
        if save_residuals:
            y_ref, qkv_out_ref, o_out_ref, o_buf = outs_and_scratch
        else:
            (y_ref, o_buf) = outs_and_scratch
            qkv_out_ref = o_out_ref = None
        _sublayer_kernel(
            x_ref, mask_ref, lng_ref, lnb_ref, wqkv_ref, bqkv_ref, qs_ref,
            ks_ref, cos_ref, sin_ref, seg_ref, wout_ref, bout_ref, y_ref, o_buf,
            scale=1.0 / (d**0.5), num_heads=num_heads, packed=packed,
            has_mask=has_mask, qkv_out_ref=qkv_out_ref, o_out_ref=o_out_ref,
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            x_spec, mask_spec, vec_c, vec_c, wqkv_spec, vec_3hd,
            scale_spec, scale_spec, table_spec, table_spec, seg_spec,
            wout_spec, vec_c,
        ],
        out_specs=tuple(out_specs) if save_residuals else out_specs[0],
        out_shape=tuple(out_shape) if save_residuals else out_shape[0],
        scratch_shapes=[pltpu.VMEM((bb, s, hd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, m, lng, lnb, wqkv, bqkv, qs_tiled, ks_tiled, cos_t, sin_t, seg, wout, bout)
    if save_residuals:
        y, qkv, o = out
        return y[:b], qkv[:b], o[:b]
    return out[:b], None, None


def _ln_affine(x, lng, lnb):
    """Token LayerNorm + affine exactly as the kernel/module compute it:
    f32 stats (flax-clamped variance), bf16 output. Returns (xa, xn, r)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean), 0.0
    )
    r = jax.lax.rsqrt(var + _LN_EPS)
    xn = (xf - mean) * r
    xa = (xn * lng.astype(jnp.float32) + lnb.astype(jnp.float32)).astype(jnp.bfloat16)
    return xa, xn, r


def _attn_sublayer_reference(x, lng, lnb, wqkv, bqkv, qs, ks, wout, bout,
                             mask, num_heads, cos, sin):
    """Module-equivalent XLA chain (fallback + tests): LN → qkv → fused chain
    → out projection → residual."""
    xa, _, _ = _ln_affine(x, lng, lnb)
    qkv = (
        jax.lax.dot_general(
            xa, wqkv.astype(jnp.bfloat16), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv.astype(jnp.float32)
    ).astype(x.dtype)
    out = _reference_fused_chain(qkv, qs, ks, mask, num_heads, cos, sin)
    y = (
        jax.lax.dot_general(
            out.astype(jnp.bfloat16), wout.astype(jnp.bfloat16),
            (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        + bout.astype(jnp.float32)
    )
    return (x.astype(jnp.float32) + y).astype(x.dtype)


def _attn_sublayer_impl(x, lng, lnb, wqkv, bqkv, q_scale, k_scale, wout, bout,
                        mask, num_heads, rope_base, rope_alpha, interpret,
                        save_residuals):
    from video_vae_tpu.ops.conv3d import _env_interpret
    from video_vae_tpu.ops.rope import rope_tables
    from video_vae_tpu.parallel.sharding import (
        log_dispatch as _log_dispatch,
        mesh_info as _mesh_info,
        shard_map_unchecked as _shard_map,
    )

    interpret = interpret or _env_interpret()
    b, s, c = x.shape
    three_hd = wqkv.shape[1]
    hd = three_hd // 3
    d = hd // num_heads
    cos, sin = rope_tables(s, d, rope_base, rope_alpha)

    on_tpu = jax.devices()[0].platform == "tpu"
    mesh, axes = _mesh_info(b, tensor_safe=False)
    if not (on_tpu or interpret) or (mesh is not None and axes is None):
        y = _attn_sublayer_reference(
            x, lng, lnb, wqkv, bqkv, q_scale, k_scale, wout, bout,
            mask, num_heads, cos, sin,
        )
        return y, None, None

    if mask is None:
        m = jnp.ones((b, 1, s), jnp.int32)
    else:
        m = mask.reshape(b, 1, s).astype(jnp.int32)
    qs_tiled, ks_tiled, cos_t, sin_t, seg = _tile_operands(
        q_scale, k_scale, cos, sin, hd, d, num_heads
    )
    args = (
        x, m,
        lng.astype(jnp.float32).reshape(1, c),
        lnb.astype(jnp.float32).reshape(1, c),
        wqkv.astype(jnp.bfloat16),
        bqkv.astype(jnp.float32).reshape(1, three_hd),
        qs_tiled, ks_tiled, cos_t, sin_t, seg,
        wout.astype(jnp.bfloat16),
        bout.astype(jnp.float32).reshape(1, c),
    )
    kern = functools.partial(
        _sublayer_pallas, num_heads=num_heads, interpret=interpret,
        has_mask=mask is not None, save_residuals=save_residuals,
    )
    _log_dispatch("fused_attention_sublayer", "pallas", axes)
    if mesh is None:
        return kern(*args)
    from jax.sharding import PartitionSpec as P

    in_specs = (P(axes), P(axes)) + (P(),) * 11
    if save_residuals:
        return _shard_map(
            lambda *a: kern(*a), mesh, in_specs, (P(axes), P(axes), P(axes))
        )(*args)
    y = _shard_map(
        lambda *a: kern(*a)[0], mesh, in_specs, P(axes)
    )(*args)
    return y, None, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def fused_attention_sublayer(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    q_scale: jnp.ndarray,
    k_scale: jnp.ndarray,
    wout: jnp.ndarray,
    bout: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    num_heads: int,
    rope_base: float = 10000.0,
    rope_alpha: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = x + out_proj(attention(qk-LN+RoPE(LN(x)·Wqkv))) in one kernel.

    Params arrive in stored dtype (f32) and are cast in the wrapper, so
    cotangents come back f32. mask: (B,1,1,S) bool key-padding or None.
    """
    y, _, _ = _attn_sublayer_impl(
        x, ln_scale, ln_bias, wqkv, bqkv, q_scale, k_scale, wout, bout,
        mask, num_heads, rope_base, rope_alpha, interpret, save_residuals=False,
    )
    return y


def _attn_sublayer_fwd(x, lng, lnb, wqkv, bqkv, q_scale, k_scale, wout, bout,
                       mask, num_heads, rope_base, rope_alpha, interpret):
    y, qkv, o = _attn_sublayer_impl(
        x, lng, lnb, wqkv, bqkv, q_scale, k_scale, wout, bout,
        mask, num_heads, rope_base, rope_alpha, interpret, save_residuals=True,
    )
    return y, (x, lng, lnb, wqkv, bqkv, q_scale, k_scale, wout, mask, qkv, o)


def _attn_sublayer_bwd(num_heads, rope_base, rope_alpha, interpret, res, dy):
    from video_vae_tpu.ops.rope import rope_tables

    x, lng, lnb, wqkv, bqkv, q_scale, k_scale, wout, mask, qkv, o = res
    b, s, c = x.shape
    three_hd = wqkv.shape[1]
    hd = three_hd // 3
    d = hd // num_heads
    n = b * s
    dyf = dy.astype(jnp.float32)
    dy16 = dy.astype(jnp.bfloat16).reshape(n, c)

    xa, xn, r = _ln_affine(x, lng, lnb)
    if qkv is None:  # forward took the XLA chain — rebuild the live set
        cos, sin = rope_tables(s, d, rope_base, rope_alpha)
        qkv = (
            jax.lax.dot_general(
                xa, wqkv.astype(jnp.bfloat16), (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bqkv.astype(jnp.float32)
        ).astype(x.dtype)
        o = _reference_fused_chain(
            qkv, q_scale, k_scale, mask, num_heads, cos, sin
        ).astype(x.dtype)

    # --- out projection ---
    o16 = o.astype(jnp.bfloat16).reshape(n, hd)
    do = jax.lax.dot_general(  # dy @ woutᵀ : (N, HD)
        dy16, wout.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwout = jax.lax.dot_general(  # oᵀ @ dy : (HD, C)
        o16, dy16, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbout = jnp.sum(dyf.reshape(n, c), axis=0)

    # --- attention segment: reuse the op-level backward (Pallas on TPU) ---
    dqkv, dqs, dks, _ = _fused_bwd(
        num_heads, rope_base, rope_alpha, interpret,
        (qkv, q_scale, k_scale, mask), do.reshape(b, s, hd).astype(qkv.dtype),
    )

    # --- qkv projection ---
    dqkv16 = dqkv.astype(jnp.bfloat16).reshape(n, three_hd)
    xa2 = xa.reshape(n, c)
    dwqkv = jax.lax.dot_general(  # xaᵀ @ dqkv : (C, 3HD)
        xa2, dqkv16, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbqkv = jnp.sum(dqkv.astype(jnp.float32).reshape(n, three_hd), axis=0)
    dxa = jax.lax.dot_general(  # dqkv @ wqkvᵀ : (N, C)
        dqkv16, wqkv.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(b, s, c)

    # --- LayerNorm backward ---
    g32 = lng.astype(jnp.float32)
    dg = jnp.sum((dxa * xn).reshape(n, c), axis=0)
    dbeta = jnp.sum(dxa.reshape(n, c), axis=0)
    du = dxa * g32
    dx_ln = r * (
        du
        - jnp.mean(du, axis=-1, keepdims=True)
        - xn * jnp.mean(du * xn, axis=-1, keepdims=True)
    )
    dx = (dyf + dx_ln).astype(x.dtype)
    return (
        dx,
        dg.astype(lng.dtype),
        dbeta.astype(lng.dtype),
        dwqkv.astype(wqkv.dtype),
        dbqkv.astype(wqkv.dtype),
        dqs,
        dks,
        dwout.astype(wout.dtype),
        dbout.astype(wout.dtype),
        None,
    )


fused_attention_sublayer.defvjp(_attn_sublayer_fwd, _attn_sublayer_bwd)
