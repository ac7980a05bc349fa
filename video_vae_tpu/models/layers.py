"""Transformer building blocks for the factored space/time video model.

Semantics parity (layer math, init scales, norm placement) with
/root/reference/train/layers.py:8-224, re-architected for TPU:

* RoPE is stateless (trace-time constant tables) instead of an 8k-entry cached
  ``nnx.Variable`` — see :mod:`video_vae_tpu.ops.rope`.
* Attention dispatches through :func:`video_vae_tpu.ops.masked_attention` so the
  backend (XLA fused attention vs Pallas flash kernel) is a config choice.
* The temporal padding mask is expanded to the (b·hw) axis *inside*
  FactoredAttention (the newer reference variant,
  /root/reference/claude_distributed/layers.py:213-214), so callers never build
  giant broadcasted masks.
* Activation sharding constraints (:func:`video_vae_tpu.parallel.constrain`)
  pin the batch axis to the ('data','fsdp') mesh axes at block boundaries; with
  no active mesh they are no-ops, so the same module runs single-chip.
* Remat is config-gated per block instead of hardwired decorators.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import nnx

from video_vae_tpu.ops.attention import masked_attention
from video_vae_tpu.ops.norm import apply_layer_norm
from video_vae_tpu.ops.rope import apply_rope
from video_vae_tpu.parallel.sharding import constrain

def _norm_project(norm: nnx.LayerNorm, linear: nnx.Linear, x: jnp.ndarray) -> jnp.ndarray:
    """LN(x) @ W + b, with the LN affine optionally folded into the projection.

    VVT_PROJ_FOLD=1 (trace-time): (xn·g + c) @ W + b  ≡  xn @ (diag(g)·W) +
    (c @ W + b) — the PatchEmbedding trick (see above) applied to the
    transformer pre-LN sublayers (/root/reference/train/layers.py:131-196).
    W' is a (in, out) elementwise scale recomputed per step (trivial next to
    the GEMM; hoisted entirely out of inference scans since weights are
    loop-invariant), and the LN loop fusion drops its affine tail. Identical
    math up to bf16 rounding of the (xn → GEMM input) cast.
    """
    import os

    if os.environ.get("VVT_PROJ_FOLD", "0") != "1":
        return linear(apply_layer_norm(norm, x))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    # E[x²]−mean² clamped like flax (normalization.py:122)
    var = jnp.maximum(
        jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean), 0.0
    )
    xn = ((xf - mean) * jax.lax.rsqrt(var + norm.epsilon)).astype(x.dtype)
    kern = linear.kernel.value
    wf = (norm.scale.value[:, None] * kern).astype(x.dtype)
    bf = (norm.bias.value @ kern + linear.bias.value).astype(x.dtype)
    return xn @ wf + bf


# 100x-reduced init scale on residual-branch output projections
# (/root/reference/train/layers.py:143-147,182-186) — keeps deep residual
# stacks near-identity at init.
def small_init(scale: float = 1e-2):
    return nnx.initializers.variance_scaling(
        scale=scale, mode="fan_in", distribution="truncated_normal"
    )


class PatchEmbedding(nnx.Module):
    """(b,t,H,W,C) → (b,t,hw,p²c): non-overlapping patches, LayerNorm, Linear.

    Parity: /root/reference/train/layers.py:8-27 (einops rearrange rather than a
    conv — the patch pixels *are* the embedding; the Linear is square).
    """

    def __init__(
        self,
        channels: int,
        patch_size: int,
        rngs: nnx.Rngs,
        *,
        dtype=jnp.bfloat16,
        param_dtype=jnp.float32,
    ):
        dim = channels * patch_size * patch_size
        self.patch_size = patch_size
        self.dtype = dtype
        self.norm = nnx.LayerNorm(dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.linear = nnx.Linear(dim, dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        # cast BEFORE the patchify permutation: the video arrives fp32 and the
        # 7D rearrange is bandwidth-bound — fp32 made it ~1.2 ms of copies in
        # the trace; LayerNorm still reduces in fp32 internally.
        x = x.astype(self.dtype)
        # LayerNorm in PIXEL space: each token's feature vector is one (p,p,c)
        # patch, so the per-token mean/var are per-patch block reductions on
        # the un-patchified video, and the normalize fuses into the patchify
        # transpose as a bf16 elementwise. The naive norm(patchify(x)) made
        # XLA hoist the LayerNorm's f32 upcast INTO the transpose — a ~0.9 ms
        # f32 7-D copy chain in the r3 xplane trace. The LN affine (γ, β) is
        # folded into the Linear: y@K = xn@(γ⊙K) + (β@K + b), exact same math.
        b, t, hh, ww, c = x.shape
        xb = x.reshape(b, t, hh // p, p, ww // p, p, c)
        xf = xb.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(3, 5, 6), keepdims=True)
        # E[x²]−mean² clamped like flax (normalization.py:122): f32
        # cancellation can go negative on constant-ish patches
        var = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=(3, 5, 6), keepdims=True)
            - jnp.square(mean),
            0.0,
        )
        xn = ((xb - mean.astype(x.dtype)) * jax.lax.rsqrt(var + self.norm.epsilon).astype(x.dtype))
        tokens = rearrange(xn, "b t h p1 w p2 c -> b t (h w) (p1 p2 c)")
        gamma = self.norm.scale.value
        beta = self.norm.bias.value
        kern = self.linear.kernel.value
        wk = (gamma[:, None] * kern).astype(self.dtype)
        bias = (beta @ kern + self.linear.bias.value).astype(self.dtype)
        return tokens @ wk + bias


class PatchUnEmbedding(nnx.Module):
    """Tokens → (upsampled conv features, direct pixel reconstruction).

    Parity: /root/reference/train/layers.py:29-55. ``conv_features`` (channels ×
    upsample_rate) feed the UNet; ``x`` is the low-capacity direct path that the
    UNet output is added to as a residual.
    """

    def __init__(
        self,
        height: int,
        width: int,
        channels: int,
        patch_size: int,
        upsample_rate: int,
        rngs: nnx.Rngs,
        *,
        conv_layout: str = "nhwc",
        pack_s2d: bool = False,
        dtype=jnp.bfloat16,
        param_dtype=jnp.float32,
    ):
        dim = channels * patch_size * patch_size
        self.patch_size = patch_size
        self.height = height
        self.width = width
        self.upsample_rate = upsample_rate
        self.conv_layout = conv_layout
        # emit conv_features PHASE-PACKED (b,t,4c,h/2,w/2) for the s2d_full
        # UNet — the 2×2 pixel phases stay in the channel dim instead of
        # being interleaved out here and re-packed inside the UNet.
        self.pack_s2d = pack_s2d and conv_layout == "cf" and patch_size % 2 == 0
        self.dtype = dtype
        self.linear = nnx.Linear(dim, dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.upsample = nnx.Linear(
            dim, dim * upsample_rate, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )
        self.downsample = nnx.Linear(
            channels * upsample_rate, channels, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )

    def __call__(self, x: jnp.ndarray):
        x = self.linear(x)
        kw = dict(
            p1=self.patch_size,
            p2=self.patch_size,
            h=self.height // self.patch_size,
            w=self.width // self.patch_size,
        )
        if self.pack_s2d:
            # Emit PHASE-PACKED channels-first features (b,t,4c,H/2,W/2),
            # channel index c·4+pa·2+pb (ops/conv3d._s2d_kernel convention):
            # token patch offset p1 = q1·2+pa, p2 = q2·2+pb. The UNet's
            # s2d_full path consumes this directly — the full-resolution
            # depth-to-space never happens.
            #
            # The within-token channel permutation (q1 pa q2 pb c)→(c pa pb
            # q1 q2) is FOLDED INTO the upsample Linear's output columns (a
            # ~2 M-element weight permute, free next to the matmul), so the
            # spatial step is a plain depth-to-space. The unfused einops form
            # compiled to a 9-D transpose chain worth ~2.9 ms/forward
            # (xplane r3: copy.6149 et al.).
            p = self.patch_size
            q = p // 2
            wu = rearrange(
                self.upsample.kernel.value.astype(self.dtype),
                "i (q1 pa q2 pb c) -> i (c pa pb q1 q2)",
                q1=q, pa=2, q2=q, pb=2,
            )
            bu = rearrange(
                self.upsample.bias.value.astype(self.dtype),
                "(q1 pa q2 pb c) -> (c pa pb q1 q2)",
                q1=q, pa=2, q2=q, pb=2,
            )
            x = jnp.einsum("btnd,de->btne", x, wu) + bu
            conv_features = rearrange(
                x,
                "b t (h w) (cc q1 q2) -> b t cc (h q1) (w q2)",
                h=kw["h"], w=kw["w"], q1=q, q2=q,
            )
            # packed (c_up → c) contraction: kron with I₄ keeps each phase
            # independent, so `direct` comes out packed like the UNet output.
            w4 = jnp.kron(
                self.downsample.kernel.value.astype(self.dtype),
                jnp.eye(4, dtype=self.dtype),
            )  # (4c_up, 4c)
            direct = jnp.einsum("btchw,cd->btdhw", conv_features, w4) + jnp.repeat(
                self.downsample.bias.value.astype(self.dtype), 4
            )[None, None, :, None, None]
        elif self.conv_layout == "cf":
            x = self.upsample(x)
            # Emit channels-first features directly — the UNet's cf path then
            # has zero layout transposes anywhere. The direct reconstruction
            # applies the (c_up → c) Linear params over the cf channel axis.
            # (A two-stage token-grid→pixels-last→cf permutation was A/B'd at
            # -0.6 ms end-to-end vs this one-shot einops form — keep this.)
            conv_features = rearrange(
                x, "b t (h w) (p1 p2 c) -> b t c (h p1) (w p2)", **kw
            )
            # (A token-side variant — contract c on (b,t,hw·p²,c_up) and
            # un-patchify the c=3 result — A/B'd ~1.5 ms SLOWER end-to-end;
            # XLA fuses this einsum+transpose better than it looked in the
            # per-op trace.) Emitted CHANNELS-FIRST like the UNet output; the
            # Decoder transposes the 3-channel sum once at its exit.
            direct = jnp.einsum(
                "btchw,cd->btdhw",
                conv_features,
                self.downsample.kernel.value.astype(self.dtype),
            ) + self.downsample.bias.value.astype(self.dtype)[None, None, :, None, None]
        else:
            x = self.upsample(x)
            conv_features = rearrange(
                x, "b t (h w) (p1 p2 c) -> b t (h p1) (w p2) c", **kw
            )
            direct = self.downsample(conv_features)
        return conv_features, direct


class Attention(nnx.Module):
    """Pre-LN multi-head attention: fused QKV, per-head QK-norm, RoPE.

    Parity: /root/reference/train/layers.py:131-171.
    """

    def __init__(
        self,
        in_features: int,
        num_heads: int,
        qkv_features: int,
        rngs: nnx.Rngs,
        *,
        rope_base: float = 10000.0,
        rope_alpha: float = 1.0,
        attention_impl: str = "xla",
        dtype=jnp.bfloat16,
        param_dtype=jnp.float32,
    ):
        self.num_heads = num_heads
        self.rope_base = rope_base
        self.rope_alpha = rope_alpha
        self.attention_impl = attention_impl
        head_dim = qkv_features // num_heads
        self.input_norm = nnx.LayerNorm(
            in_features, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )
        self.qkv_projection = nnx.Linear(
            in_features, qkv_features * 3, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )
        self.out_projection = nnx.Linear(
            qkv_features,
            in_features,
            kernel_init=small_init(),
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )
        self.q_norm = nnx.LayerNorm(
            head_dim, use_bias=False, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )
        self.k_norm = nnx.LayerNorm(
            head_dim, use_bias=False, dtype=dtype, param_dtype=param_dtype, rngs=rngs
        )

    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # pre-LN + fused QKV projection (LN affine foldable — _norm_project)
        qkv = _norm_project(self.input_norm, self.qkv_projection, x)
        impl = self.attention_impl
        if impl == "fused" and jnp.dtype(x.dtype).itemsize != 2:
            # the fused kernels' VMEM tile budgets assume 2-byte elements —
            # f32 overflows the Mosaic stack on the flagship backward
            # (111.7M vs 96M, r5); the XLA chain is identical math
            impl = "xla"
        if impl == "fused":
            from video_vae_tpu.parallel.sharding import active_mesh, _axis_size

            mesh = active_mesh()
            if mesh is not None and _axis_size(mesh, "tensor") > 1:
                # pallas_call is opaque to the partitioner — under a
                # tensor-parallel mesh its operands would be silently
                # all-gathered. The XLA chain shards correctly via the
                # head-axis constraints below; use it.
                impl = "xla"
        if impl == "fused":
            # One Pallas kernel: split + per-head LN + RoPE + attention,
            # straight off the fused QKV projection (ops/flash_attention.py).
            from video_vae_tpu.ops.flash_attention import fused_qkv_attention

            out = fused_qkv_attention(
                qkv,
                self.q_norm.scale.value,
                self.k_norm.scale.value,
                mask,
                self.num_heads,
                self.rope_base,
                self.rope_alpha,
            )
            return self.out_projection(out)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rearrange(q, "b s (h d) -> b s h d", h=self.num_heads)
        k = rearrange(k, "b s (h d) -> b s h d", h=self.num_heads)
        v = rearrange(v, "b s (h d) -> b s h d", h=self.num_heads)
        q = apply_layer_norm(self.q_norm, q)
        k = apply_layer_norm(self.k_norm, k)
        q, k = apply_rope(q, k, base=self.rope_base, alpha=self.rope_alpha)
        # Keep heads on the tensor axis (follows the column-parallel QKV split).
        q = constrain(q, ("data", "fsdp"), None, "tensor")
        k = constrain(k, ("data", "fsdp"), None, "tensor")
        v = constrain(v, ("data", "fsdp"), None, "tensor")
        out = masked_attention(q, k, v, mask, impl=impl)
        out = rearrange(out, "b s h d -> b s (h d)")
        return self.out_projection(out)


class MLP(nnx.Module):
    """Pre-LN → Linear → SiLU → Linear (small-init out).

    Parity: /root/reference/train/layers.py:174-196.
    """

    def __init__(
        self,
        in_features: int,
        mlp_dim: int,
        rngs: nnx.Rngs,
        *,
        dtype=jnp.bfloat16,
        param_dtype=jnp.float32,
    ):
        self.norm = nnx.LayerNorm(in_features, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.linear1 = nnx.Linear(in_features, mlp_dim, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.linear2 = nnx.Linear(
            mlp_dim,
            in_features,
            kernel_init=small_init(),
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.linear2(nnx.silu(_norm_project(self.norm, self.linear1, x)))


def _apply_attention(attn: "Attention", x: jnp.ndarray, mask) -> jnp.ndarray:
    """Residual attention sublayer: x + Attention(x).

    VVT_ATTN_SUBLAYER=1 (trace-time) routes through the single-kernel Pallas
    sublayer (ops/flash_attention.py fused_attention_sublayer): input LN + qkv
    GEMM + per-head LN/RoPE/attention + out GEMM + residual in one HBM round
    trip. Falls back to the module chain off-TPU and under tensor>1 meshes
    (the module path carries the head-axis sharding constraints TP needs).

    On-chip A/B (v5e, r4): LOSES — 42.25 vs 43.9 clips/s (+0.85 ms forward,
    ~+20 µs/call). The HBM-traffic model favored the fusion (~90 MB → ~19 MB
    per call) but XLA's GEMMs already overlap that traffic with compute, and
    Mosaic does not software-pipeline the in-kernel dot against the VPU
    LN/softmax chain the way XLA's tiled GEMM+fusion does. Default stays off;
    kept (tested, mesh-dispatched) as the ready-made shape for chips where
    the MXU:HBM ratio shifts further toward compute (v6e+).
    """
    import os

    if attn.attention_impl == "fused" and os.environ.get(
        "VVT_ATTN_SUBLAYER", "0"
    ) == "1":  # default off — on-chip A/B LOST (see docstring)
        from video_vae_tpu.parallel.sharding import _axis_size, active_mesh

        mesh = active_mesh()
        if mesh is None or _axis_size(mesh, "tensor") <= 1:
            from video_vae_tpu.ops.flash_attention import fused_attention_sublayer

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
            )
    return x + attn(x, mask)


def _apply_mlp(mlp: MLP, x: jnp.ndarray) -> jnp.ndarray:
    """Residual MLP sublayer: x + MLP(LN(x)).

    VVT_MLP_FUSED=1 (trace-time) routes through the single-kernel Pallas
    sublayer (ops/fused_block.py): LN + both GEMMs + SiLU + residual in one
    HBM round trip. The op itself falls back to the identical-math XLA chain
    off-TPU and under tensor>1 meshes (Megatron W1/W2 splits stay with the
    partitioner).

    On-chip A/B (v5e, r4): LOSES — 42.15 vs 43.9 clips/s (+1.0 ms forward).
    Same verdict as the attention sublayer (see _apply_attention): Mosaic's
    single-shot in-kernel dots trail XLA's pipelined GEMM fusions by more
    than the saved HBM round trips are worth at these shapes. Default off.
    """
    import os

    if os.environ.get("VVT_MLP_FUSED", "0") == "1":  # default off — on-chip A/B LOST
        from video_vae_tpu.ops.fused_block import fused_mlp_sublayer

        return fused_mlp_sublayer(
            x,
            mlp.norm.scale.value,
            mlp.norm.bias.value,
            mlp.linear1.kernel.value,
            mlp.linear1.bias.value,
            mlp.linear2.kernel.value,
            mlp.linear2.bias.value,
        )
    return x + mlp(x)


class FactoredAttention(nnx.Module):
    """Axial space/time block: temporal attention+MLP, then spatial attention+MLP.

    Parity: /root/reference/train/layers.py:198-224 with the internal mask
    expansion of /root/reference/claude_distributed/layers.py:213-214. The two
    O(t²)+O(hw²) passes are how the reference scales sequence length without
    joint O((t·hw)²) attention (SURVEY.md §2.4).

    Sequence parallelism falls out of the data layout: temporal attention runs
    on (b·hw, t, c) and spatial attention on (b·t, hw, c); constraining the
    leading axis to the ('data','fsdp') mesh axes shards both embarrassingly
    parallel passes without collectives inside the block.
    """

    def __init__(
        self,
        in_features: int,
        mlp_dim: int,
        num_heads: int,
        qkv_features: int,
        rngs: nnx.Rngs,
        *,
        rope_base: float = 10000.0,
        rope_alpha: float = 1.0,
        attention_impl: str = "xla",
        remat: bool = True,
        dtype=jnp.bfloat16,
        param_dtype=jnp.float32,
    ):
        kw = dict(
            rope_base=rope_base,
            rope_alpha=rope_alpha,
            attention_impl=attention_impl,
            dtype=dtype,
            param_dtype=param_dtype,
        )
        self.TemporalAttention = Attention(in_features, num_heads, qkv_features, rngs, **kw)
        self.TemporalMLP = MLP(in_features, mlp_dim, rngs, dtype=dtype, param_dtype=param_dtype)
        self.SpatialAttention = Attention(in_features, num_heads, qkv_features, rngs, **kw)
        self.SpatialMLP = MLP(in_features, mlp_dim, rngs, dtype=dtype, param_dtype=param_dtype)
        self.use_remat = remat

    def _forward(self, x: jnp.ndarray, temporal_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        b, t, hw, c = x.shape
        # --- temporal pass over (b·hw, t, c) ---
        temporal_x = rearrange(x, "b t hw c -> (b hw) t c")
        temporal_x = constrain(temporal_x, ("data", "fsdp"))
        if temporal_mask is not None:
            # (b,1,1,t) -> (b·hw,1,1,t) without materializing an intermediate.
            mask = jnp.broadcast_to(
                temporal_mask[:, None, :, :, :], (b, hw, 1, 1, t)
            ).reshape(b * hw, 1, 1, t)
        else:
            mask = None
        temporal_x = _apply_attention(self.TemporalAttention, temporal_x, mask)
        temporal_x = _apply_mlp(self.TemporalMLP, temporal_x)
        x = rearrange(temporal_x, "(b hw) t c -> b t hw c", b=b, hw=hw)

        # --- spatial pass over (b·t, hw, c); padding frames are masked in the
        # loss, so no mask is needed here (parity: layers.py:219) ---
        spatial_x = rearrange(x, "b t hw c -> (b t) hw c")
        spatial_x = constrain(spatial_x, ("data", "fsdp"))
        spatial_x = _apply_attention(self.SpatialAttention, spatial_x, None)
        spatial_x = _apply_mlp(self.SpatialMLP, spatial_x)
        x = rearrange(spatial_x, "(b t) hw c -> b t hw c", b=b, t=t)
        return constrain(x, ("data", "fsdp"))

    def __call__(self, x: jnp.ndarray, temporal_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if self.use_remat:
            return nnx.remat(FactoredAttention._forward)(self, x, temporal_mask)
        return self._forward(x, temporal_mask)
