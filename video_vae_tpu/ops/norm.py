"""GroupNorm (+ fused SiLU) on channels-first video activations.

Matches flax ``nnx.GroupNorm`` semantics on (b, t, h, w, c) inputs — statistics
per (batch, group) over ALL non-batch axes (t, h, w and the channels inside the
group), float32 reductions, epsilon 1e-6 — but takes (b, t, c, h, w) so the
channels-first UNet never transposes just to normalize. Scale/bias are the
(c,) parameters of the twin ``nnx.GroupNorm`` module (checkpoint-compatible).

Parity: /root/reference/train/unet.py:24-27 (GroupNorm(≤8 groups) + SiLU).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def group_norm_cf(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    *,
    eps: float = 1e-6,
    silu: bool = False,
) -> jnp.ndarray:
    """x: (b, t, c, h, w); scale/bias: (c,). Returns x.dtype."""
    b, t, c, h, w = x.shape
    if (
        silu
        and eps == 1e-6  # _gn_stats hardcodes the default epsilon
        and os.environ.get("VVT_GN_VJP", "1") == "1"
        and os.environ.get("VVT_NORM_STATS", "dtype") == "dtype"
    ):
        # hand-derived fused backward (identical forward math) — see
        # _gn_silu_bwd; on-chip train-step A/B won (231.1 vs 238.9 ms b1x16f)
        return _gn_silu_cf(x, scale, bias, num_groups)
    xg = x.reshape(b, t, num_groups, c // num_groups, h, w)
    if os.environ.get("VVT_NORM_STATS", "dtype") == "upcast":
        # materialized f32 upcast: XLA fuses the convert INTO the producing
        # conv, which then emits f32 at a pathological layout (xplane r3:
        # the two 64² UNet convs ran as f32 XLA fusions at ~15% MFU plus two
        # 0.2 ms layout copies — ~3.2 ms/forward)
        xf = xg.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 3, 4, 5), keepdims=True)
        var = jnp.maximum(  # clamp: cancellation can go negative (flax does
            # the same for this form, normalization.py:122)
            jnp.mean(jnp.square(xf), axis=(1, 3, 4, 5), keepdims=True)
            - jnp.square(mean),
            0.0,
        )
    else:
        # f32-ACCUMULATING reduces straight off the bf16 activations — no f32
        # tensor exists for XLA to producer-fuse, so the conv keeps its bf16
        # output/layout and the converts live inside convert_reduce fusions
        # (exactly how the transformer LNs compile). Variance is TWO-PASS
        # (center, then square): the centered f32 intermediate feeds only the
        # reduction, so it input-fuses without materializing, and unlike
        # E[x²]−mean² it has no cancellation blow-up when |mean| ≫ sigma
        # (bf16 squares made that form drift 2.6 in the adversarial regime).
        mean = jnp.mean(xg, axis=(1, 3, 4, 5), keepdims=True, dtype=jnp.float32)
        var = jnp.mean(
            jnp.square(xg.astype(jnp.float32) - mean),
            axis=(1, 3, 4, 5),
            keepdims=True,
            dtype=jnp.float32,
        )
    mul = jax.lax.rsqrt(var + eps)
    # Statistics are f32 (above); the subtract/scale runs in COMPUTE dtype.
    # A/B'd on v5e (flagship forward): f32 subtract 58.3 ms vs bf16 52.9 ms —
    # upcasting the whole activation chain to f32 breaks the surrounding
    # conv→norm→SiLU loop fusions, a 10% end-to-end tax. The numerics cost is
    # bounded by tests/test_conv3d.py::test_group_norm_cf_bf16_drift_vs_twin
    # against the bf16 nnx.GroupNorm twin (same class as bf16-rounding the
    # twin's own f32 output; fp32 runs are bit-identical either way because
    # every cast below is a no-op).
    y = (xg - mean.astype(x.dtype)) * mul.astype(x.dtype)
    y = y.reshape(b, t, c, h, w)
    y = y * scale.astype(x.dtype)[None, None, :, None, None]
    y = y + bias.astype(x.dtype)[None, None, :, None, None]
    if silu:
        y = jax.nn.silu(y)
    return y


def _gn_stats(x: jnp.ndarray, num_groups: int):
    """(xg, mean, r): grouped view + f32 two-pass stats (see group_norm_cf)."""
    b, t, c, h, w = x.shape
    xg = x.reshape(b, t, num_groups, c // num_groups, h, w)
    mean = jnp.mean(xg, axis=(1, 3, 4, 5), keepdims=True, dtype=jnp.float32)
    var = jnp.mean(
        jnp.square(xg.astype(jnp.float32) - mean),
        axis=(1, 3, 4, 5),
        keepdims=True,
        dtype=jnp.float32,
    )
    return xg, mean, jax.lax.rsqrt(var + 1e-6)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gn_silu_cf(x, scale, bias, num_groups):
    out, _ = _gn_silu_fwd(x, scale, bias, num_groups)
    return out


def _gn_silu_fwd(x, scale, bias, num_groups):
    b, t, c, h, w = x.shape
    xg, mean, r = _gn_stats(x, num_groups)
    xn = (xg - mean.astype(x.dtype)) * r.astype(x.dtype)
    y = xn.reshape(b, t, c, h, w)
    y = y * scale.astype(x.dtype)[None, None, :, None, None]
    y = y + bias.astype(x.dtype)[None, None, :, None, None]
    return jax.nn.silu(y), (x, scale, bias, mean, r)


def _gn_silu_bwd(num_groups, residuals, dz):
    """Hand-derived fused backward (VVT_GN_VJP, default ON — on-chip A/B won
    −7.8 ms/step b1x16f): silu' → per-channel dscale/dbias reductions → the standard grouped
    normalization backward dx = r·(dxn − mean_g(dxn) − xn·mean_g(dxn·xn)),
    recomputing xn/y from the saved (x, mean, r) instead of letting autodiff
    save/replay the whole elementwise chain — targets the LN/silu/residual
    backward loop-fusion tail of the train step (PERF.md)."""
    x, scale, bias, mean, r = residuals
    b, t, c, h, w = x.shape
    cg = c // num_groups
    xg = x.reshape(b, t, num_groups, cg, h, w)
    xn = ((xg - mean.astype(x.dtype)) * r.astype(x.dtype)).reshape(b, t, c, h, w)
    xnf = xn.astype(jnp.float32)
    yf = xnf * scale.astype(jnp.float32)[None, None, :, None, None] + bias.astype(
        jnp.float32
    )[None, None, :, None, None]
    sig = jax.nn.sigmoid(yf)
    dy = dz.astype(jnp.float32) * sig * (1.0 + yf * (1.0 - sig))
    dscale = jnp.sum(dy * xnf, axis=(0, 1, 3, 4))
    dbias = jnp.sum(dy, axis=(0, 1, 3, 4))
    dxn = dy * scale.astype(jnp.float32)[None, None, :, None, None]
    dxng = dxn.reshape(b, t, num_groups, cg, h, w)
    xng = xnf.reshape(b, t, num_groups, cg, h, w)
    m1 = jnp.mean(dxng, axis=(1, 3, 4, 5), keepdims=True)
    m2 = jnp.mean(dxng * xng, axis=(1, 3, 4, 5), keepdims=True)
    dx = r * (dxng - m1 - xng * m2)
    return (
        dx.reshape(b, t, c, h, w).astype(x.dtype),
        dscale.astype(scale.dtype),
        dbias.astype(bias.dtype),
    )


_gn_silu_cf.defvjp(_gn_silu_fwd, _gn_silu_bwd)


# ---------------------------------------------------------------------------
# LayerNorm with a hand-derived backward (VVT_LN_VJP) — the GroupNorm+SiLU VJP
# pattern applied to the transformer LN chains (train-step backward loop-fusion
# tail, PERF.md). Forward math is BIT-EXACT nnx.LayerNorm with use_fast_variance
# (flax _normalize): f32 statistics via E[x²]−mean² clamped at 0 (flax
# normalization.py:122), then (x−mean)·(r·scale)+bias ALL in f32 — the bf16
# operands promote against the f32 stats exactly as in flax — with ONE cast to
# the module dtype at the end. Parity target: the pre-LN / qk-LN placement
# of /root/reference/train/layers.py:131-196.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm(x, scale, bias, eps=1e-6):
    """Last-axis LayerNorm; ``bias`` may be None (qk-norm has none)."""
    out, _ = _ln_fwd(x, scale, bias, eps)
    return out


def _ln_stats(x, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean), 0.0
    )
    return mean, jax.lax.rsqrt(var + eps)


def _ln_fwd(x, scale, bias, eps):
    mean, r = _ln_stats(x, eps)
    # flax op order (normalization.py _normalize): mul = rsqrt(var+eps) * scale
    # first, then y = (x − mean) * mul — everything promoted to f32, one cast
    # at the end. Matching the order keeps the forward bit-identical.
    mul = r * scale.astype(jnp.float32)
    y = (x.astype(jnp.float32) - mean) * mul
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype), (x, scale, bias, mean, r)


def _ln_bwd(eps, residuals, dy):
    """dx = r·(dxn − mean(dxn) − xn·mean(dxn·xn)) over the last axis,
    recomputing xn from the saved (x, mean, r) instead of letting autodiff
    save/replay the normalize chain; dscale/dbias are single f32 reductions
    over every leading axis."""
    x, scale, bias, mean, r = residuals
    xnf = (x.astype(jnp.float32) - mean) * r
    dyf = dy.astype(jnp.float32)
    lead = tuple(range(x.ndim - 1))
    dscale = jnp.sum(dyf * xnf, axis=lead)
    dbias = None if bias is None else jnp.sum(dyf, axis=lead)
    dxn = dyf * scale.astype(jnp.float32)
    m1 = jnp.mean(dxn, axis=-1, keepdims=True)
    m2 = jnp.mean(dxn * xnf, axis=-1, keepdims=True)
    dx = (r * (dxn - m1 - xnf * m2)).astype(x.dtype)
    return (
        dx,
        dscale.astype(scale.dtype),
        dbias if dbias is None else dbias.astype(bias.dtype),
    )


layer_norm.defvjp(_ln_fwd, _ln_bwd)


def apply_layer_norm(norm, x: jnp.ndarray) -> jnp.ndarray:
    """Dispatch an ``nnx.LayerNorm`` module: VVT_LN_VJP=1 (trace-time) routes
    through :func:`layer_norm`'s hand-derived backward, else the flax module.
    Restricted to the configurations the hand kernel reproduces exactly
    (last-axis reduction, fast variance) — everything the transformer uses."""
    if (
        os.environ.get("VVT_LN_VJP", "1") == "1"
        and norm.reduction_axes in (-1, (-1,))
        and norm.feature_axes in (-1, (-1,))
        and norm.use_fast_variance
        and norm.use_scale
        # flax would canonicalize the output dtype from (x, scale, bias,
        # norm.dtype); the hand kernel returns x.dtype. Only take over when
        # those agree — i.e. the module's compute dtype matches the input
        # (every transformer use: dtype=bf16 modules on bf16 activations).
        # With dtype=None flax promotes against the params instead, so then
        # the params themselves must already be x.dtype.
        and (
            norm.dtype == x.dtype
            if norm.dtype is not None
            else (
                norm.scale.value.dtype == x.dtype
                and (not norm.use_bias or norm.bias.value.dtype == x.dtype)
            )
        )
    ):
        bias = norm.bias.value if norm.use_bias else None
        return layer_norm(x, norm.scale.value, bias, norm.epsilon)
    return norm(x)


def max_pool_2x_cf(x: jnp.ndarray) -> jnp.ndarray:
    """Spatial-only (1,2,2) max pool on (b, t, c, h, w).

    Strided-slice max rather than ``lax.reduce_window``: standalone the two
    are comparable at 256² (0.38 vs 0.23 ms) and slices win 9× at 64²
    (0.05 vs 0.41), but IN CONTEXT reduce-window blows up to ~4.7 ms at
    16ch@256² (xplane trace of the full UNet) — its windowed lowering can't
    fuse with the surrounding GroupNorm+SiLU loop fusion, while slice+max is
    ordinary elementwise data flow XLA fuses freely.
    """
    a = jnp.maximum(x[..., 0::2], x[..., 1::2])
    return jnp.maximum(a[..., 0::2, :], a[..., 1::2, :])
