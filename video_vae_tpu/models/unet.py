"""Shape-preserving 3D-conv UNet decoder head.

Parity: /root/reference/train/unet.py:7-188 — (t_k,7,7) patch-mixer conv,
``num_levels`` down blocks (2×conv + spatial-only 2×2 maxpool), 2 bottleneck
convs, up blocks (spatial ConvTranspose + skip concat + 2×conv), zero-initialized
1×1×1 final conv so the UNet starts as an identity residual.

TPU notes: the UNet is the model's MXU-hostile region (3–64 channels vs the
128-lane systolic array), so every conv goes through the per-shape dispatch in
:mod:`video_vae_tpu.ops.conv3d`. Two activation layouts are supported:

* ``layout="nhwc"`` — channels-last (b,t,h,w,c); XLA-friendly default off-TPU.
* ``layout="cf"`` — channels-first (b,t,c,h,w) END-TO-END: the Pallas direct
  kernel is internally channels-first, so this removes every per-conv
  NDHWC↔NCDHW transpose (~0.8 ms × 6 big convs on v5e); GroupNorm+SiLU run
  fused on the cf tensor (:mod:`video_vae_tpu.ops.norm`).

Parameters are identical in both layouts (DHWIO kernels, nnx.GroupNorm
scale/bias), so checkpoints are layout-independent. Remat is config-gated per
block (the reference hardwires it, /root/reference/train/unet.py:44,76).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from video_vae_tpu.ops.conv3d import (
    _s2d_kernel,
    conv3d_cf,
    conv3d_cf_cat2,
    conv3d_direct,
    s2d_pack_cf,
    s2d_unpack_cf,
)
from video_vae_tpu.ops.norm import group_norm_cf, max_pool_2x_cf
from video_vae_tpu.parallel.sharding import constrain


class Conv3D(nnx.Module):
    """Stride-1 SAME conv3d with per-shape backend dispatch.

    Parameter names/shapes match nnx.Conv ({kernel, bias}, DHWIO kernel,
    lecun-normal init) so checkpoints are interchangeable, but the forward
    goes through ops/conv3d.py: Pallas direct kernel on large feature maps,
    temporally-decomposed 2D convs for wide spatial kernels, XLA otherwise.
    """

    def __init__(
        self,
        in_features: int,
        out_features: int,
        kernel_size,
        rngs: nnx.Rngs,
        *,
        kernel_init=None,
        impl: str = "auto",
        dtype=jnp.bfloat16,
        param_dtype=jnp.float32,
    ):
        init = kernel_init or nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(
            init(rngs.params(), (*kernel_size, in_features, out_features), param_dtype)
        )
        self.bias = nnx.Param(jnp.zeros((out_features,), param_dtype))
        self.impl = impl
        self.dtype = dtype

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return conv3d_direct(
            x.astype(self.dtype),
            self.kernel.value.astype(self.dtype),
            self.bias.value.astype(jnp.float32),
            self.impl,
        )

    def call_cf(self, x: jnp.ndarray) -> jnp.ndarray:
        """Channels-first forward: (b, t, c, h, w) → (b, t, cout, h, w)."""
        return conv3d_cf(
            x.astype(self.dtype),
            self.kernel.value.astype(self.dtype),
            self.bias.value.astype(jnp.float32),
            self.impl,
        )

    def call_cf_s2d(self, x: jnp.ndarray) -> jnp.ndarray:
        """Phase-packed forward: (b,t,4cin,h/2,w/2) → (b,t,4cout,h/2,w/2).

        Exact same math as call_cf on the unpacked tensor (the s2d kernel
        transform is a pure index rearrangement); a (3,7,7) kernel becomes
        (3,5,5) in block space, so even the patch-mixer stays odd/SAME and
        eligible for the Pallas direct kernel at 4× the channel width.
        """
        ks = _s2d_kernel(self.kernel.value.astype(self.dtype))
        bias4 = jnp.repeat(self.bias.value.astype(jnp.float32), 4)
        return conv3d_cf(x.astype(self.dtype), ks, bias4, self.impl)


class ConvTranspose2x(nnx.Module):
    """Spatial 2× transpose conv with kernel=strides=(1,2,2), as one matmul.

    A stride-2 kernel-2 transpose conv has non-overlapping output blocks:
    y[t, 2i+a, 2j+b] = Σ_ci W̃[a,b,ci,co] · x[t,i,j,ci] — a (voxels, cin) @
    (cin, 4·cout) matmul plus depth-to-space, where W̃ is the spatially
    flipped kernel (lax.conv_transpose convention, verified numerically
    against nnx.ConvTranspose). Param names/shapes match nnx.ConvTranspose
    for checkpoint compatibility; the matmul avoids XLA's transpose-conv
    lowering entirely.
    """

    def __init__(
        self,
        in_features: int,
        out_features: int,
        rngs: nnx.Rngs,
        *,
        dtype=jnp.bfloat16,
        param_dtype=jnp.float32,
    ):
        init = nnx.initializers.lecun_normal()
        self.kernel = nnx.Param(
            init(rngs.params(), (1, 2, 2, in_features, out_features), param_dtype)
        )
        self.bias = nnx.Param(jnp.zeros((out_features,), param_dtype))
        self.dtype = dtype

    def _wmat(self):
        wk = self.kernel.value[0][::-1, ::-1].astype(self.dtype)  # (2,2,ci,co), flipped
        return jnp.transpose(wk, (2, 0, 1, 3)).reshape(
            wk.shape[2], 4 * wk.shape[3]
        )  # (ci, (a,b,co)) phase-major — a (co,a,b)-major variant A/B'd
        # 0.8 clips/s SLOWER end-to-end; keep phase-major

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, cin = x.shape
        cout = self.kernel.value.shape[-1]
        y = (x.astype(self.dtype) @ self._wmat()).reshape(b, t, h, w, 2, 2, cout)
        y = jnp.transpose(y, (0, 1, 2, 4, 3, 5, 6)).reshape(b, t, 2 * h, 2 * w, cout)
        return y + self.bias.value.astype(self.dtype)

    def call_cf(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, cin, h, w = x.shape
        cout = self.kernel.value.shape[-1]
        y = jnp.einsum("btchw,ck->btkhw", x.astype(self.dtype), self._wmat())
        y = y.reshape(b, t, 2, 2, cout, h, w)
        y = jnp.transpose(y, (0, 1, 4, 5, 2, 6, 3)).reshape(b, t, cout, 2 * h, 2 * w)
        return y + self.bias.value.astype(self.dtype)[None, None, :, None, None]

    def call_cf_s2d(self, x: jnp.ndarray) -> jnp.ndarray:
        """Emit the upsampled result STILL PHASE-PACKED: (b,t,4·cout,h,w) with
        phase-minor channels co·4+a·2+b (the s2d packing) — no depth-to-space
        transpose; the output is exactly ``s2d_pack_cf(call_cf(x))``, produced
        directly as a matmul column order."""
        wk = self.kernel.value[0][::-1, ::-1].astype(self.dtype)  # (2,2,ci,co)
        wmat = jnp.transpose(wk, (2, 3, 0, 1)).reshape(wk.shape[2], -1)  # (ci, co·4+a·2+b)
        y = jnp.einsum("btchw,ck->btkhw", x.astype(self.dtype), wmat)
        bias4 = jnp.repeat(self.bias.value.astype(self.dtype), 4)
        return y + bias4[None, None, :, None, None]


class ConvBlock3D(nnx.Module):
    """Conv3D (t_k,k,k) SAME → GroupNorm(≤8 groups) → SiLU."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int,
        rngs: nnx.Rngs,
        *,
        temporal_kernel: int = 3,
        layout: str = "nhwc",
        dtype=jnp.bfloat16,
        param_dtype=jnp.float32,
    ):
        self.layout = layout
        self.conv = Conv3D(
            in_features=in_channels,
            out_features=out_channels,
            kernel_size=(temporal_kernel, kernel_size, kernel_size),
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )
        self.norm = nnx.GroupNorm(
            num_groups=min(8, out_channels),
            num_features=out_channels,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.layout == "cf":
            y = self.conv.call_cf(x)
            return group_norm_cf(
                y,
                self.norm.scale.value,
                self.norm.bias.value,
                self.norm.num_groups,
                silu=True,
            )
        return nnx.silu(self.norm(self.conv(x)))

    def call_cat2(self, x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        """cf-only: conv over channel-concat [x; skip] without materializing
        the concat (two-source halo DMA, ops/conv3d.py conv3d_cf_cat2)."""
        c = self.conv
        y = conv3d_cf_cat2(
            x.astype(c.dtype),
            skip.astype(c.dtype),
            c.kernel.value.astype(c.dtype),
            c.bias.value.astype(jnp.float32),
            c.impl,
        )
        return group_norm_cf(
            y,
            self.norm.scale.value,
            self.norm.bias.value,
            self.norm.num_groups,
            silu=True,
        )

    def _s2d_params(self):
        """s2d-transformed kernel + phase-repeated bias/GN params: in phase-
        packed space (channels c·4+phase) the SAME conv is the _s2d_kernel
        conv, GroupNorm groups stay contiguous (c-major packing) and contain
        the identical elements, and per-channel affine params repeat ×4."""
        c = self.conv
        ks = _s2d_kernel(c.kernel.value.astype(c.dtype))
        bias4 = jnp.repeat(c.bias.value.astype(jnp.float32), 4)
        scale4 = jnp.repeat(self.norm.scale.value, 4)
        gbias4 = jnp.repeat(self.norm.bias.value, 4)
        return ks, bias4, scale4, gbias4

    def call_s2d(self, x: jnp.ndarray) -> jnp.ndarray:
        """Forward entirely in phase-packed (s2d) space: (b,t,4cin,h/2,w/2) →
        (b,t,4cout,h/2,w/2). Exact same math as the unpacked block."""
        ks, bias4, scale4, gbias4 = self._s2d_params()
        y = conv3d_cf(x.astype(self.conv.dtype), ks, bias4, self.conv.impl)
        return group_norm_cf(y, scale4, gbias4, self.norm.num_groups, silu=True)

    def call_s2d_cat2(self, x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        """Phase-packed two-source variant: channel concat [x; skip] in packed
        space matches the packed concat (both blocks are c-major)."""
        ks, bias4, scale4, gbias4 = self._s2d_params()
        y = conv3d_cf_cat2(
            x.astype(self.conv.dtype), skip.astype(self.conv.dtype),
            ks, bias4, self.conv.impl,
        )
        return group_norm_cf(y, scale4, gbias4, self.norm.num_groups, silu=True)


def phase_max_pool_cf(x: jnp.ndarray) -> jnp.ndarray:
    """(1,2,2) max pool of a PHASE-PACKED cf tensor.

    The pool's non-overlapping 2×2 windows are exactly the 4 phases of each
    channel (c-major packing), so the full-resolution reduce-window becomes an
    elementwise max over 4 channel slices at half size — and the result is
    already the UNPACKED pooled tensor (b,t,c,h/2,w/2)."""
    b, t, c4, h, w = x.shape
    return jnp.max(x.reshape(b, t, c4 // 4, 4, h, w), axis=3)


class DownBlock3D(nnx.Module):
    """2×ConvBlock3D, returns (spatially pooled, pre-pool skip)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        rngs: nnx.Rngs,
        *,
        temporal_kernel: int = 3,
        remat: bool = True,
        layout: str = "nhwc",
        dtype=jnp.bfloat16,
        param_dtype=jnp.float32,
    ):
        kw = dict(
            temporal_kernel=temporal_kernel, layout=layout, dtype=dtype, param_dtype=param_dtype
        )
        self.conv1 = ConvBlock3D(in_channels, out_channels, 3, rngs, **kw)
        self.conv2 = ConvBlock3D(out_channels, out_channels, 3, rngs, **kw)
        self.use_remat = remat
        self.layout = layout

    def _forward(self, x):
        x = self.conv1(x)
        x = self.conv2(x)
        skip = x
        # Spatial-only pooling; the temporal axis is preserved.
        if self.layout == "cf":
            x = max_pool_2x_cf(x)
        else:
            x = nnx.max_pool(x, window_shape=(1, 2, 2), strides=(1, 2, 2))
        return x, skip

    def _forward_s2d(self, x):
        """cf-only: both convs run PHASE-PACKED at half spatial size with 4×
        channels; the skip stays packed (consumed packed by the matching
        UpBlock), and the pool degenerates to a 4-way phase max whose result
        is the unpacked half-resolution tensor the next level expects."""
        x = self.conv1.call_s2d(x)
        x = self.conv2.call_s2d(x)
        return phase_max_pool_cf(x), x

    def __call__(self, x: jnp.ndarray, *, s2d: bool = False):
        fwd = DownBlock3D._forward_s2d if s2d else DownBlock3D._forward
        if self.use_remat:
            return nnx.remat(fwd)(self, x)
        return fwd(self, x)


class UpBlock3D(nnx.Module):
    """Spatial 2× ConvTranspose, skip concat, 2×ConvBlock3D."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        rngs: nnx.Rngs,
        *,
        temporal_kernel: int = 3,
        remat: bool = True,
        layout: str = "nhwc",
        dtype=jnp.bfloat16,
        param_dtype=jnp.float32,
    ):
        kw = dict(
            temporal_kernel=temporal_kernel, layout=layout, dtype=dtype, param_dtype=param_dtype
        )
        self.upsample = ConvTranspose2x(
            in_features=in_channels,
            out_features=out_channels,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )
        self.conv1 = ConvBlock3D(out_channels * 2, out_channels, 3, rngs, **kw)
        self.conv2 = ConvBlock3D(out_channels, out_channels, 3, rngs, **kw)
        self.use_remat = remat
        self.layout = layout

    def _forward(self, x, skip):
        if self.layout == "cf":
            x = self.upsample.call_cf(x)
            x = self.conv1.call_cat2(x, skip)
        else:
            x = self.upsample(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = self.conv1(x)
        x = self.conv2(x)
        return x

    def _forward_s2d(self, x, skip_p):
        """cf-only: run the whole block PHASE-PACKED — the transpose-conv
        emits packed phases directly (no depth-to-space transpose) and both
        convs run at half spatial size with 4× channels (much better MXU
        shapes at the UNet's top level). ``skip_p`` arrives ALREADY PACKED
        (either packed here by the caller, or produced packed by a
        DownBlock3D s2d level). Returns the packed (b,t,4·cout,h/2,w/2)
        tensor; the caller unpacks after the (cheap) final 1×1 contraction.
        Identical math to _forward."""
        up = self.upsample.call_cf_s2d(x)
        y = self.conv1.call_s2d_cat2(up, skip_p)
        return self.conv2.call_s2d(y)

    def __call__(
        self,
        x: jnp.ndarray,
        skip: jnp.ndarray,
        *,
        s2d: bool = False,
        skip_packed: bool = False,
    ) -> jnp.ndarray:
        if s2d and not skip_packed:
            skip = s2d_pack_cf(skip)
        fwd = UpBlock3D._forward_s2d if s2d else UpBlock3D._forward
        if self.use_remat:
            return nnx.remat(fwd)(self, x, skip)
        return fwd(self, x, skip)


class UNet3D(nnx.Module):
    """(b,t,h,w,c_in) → (b,t,h,w,c_out), zero-init output.

    ``layout="cf"`` expects (b,t,c,h,w) INPUT and RETURNS (b,t,c_out,h,w) —
    features flow channels-first end-to-end with no transpose anywhere; the
    Decoder converts the small 3-channel output to pixels-last once at its
    exit (XLA's conv op at cout=3 was picking pathological layouts worth
    ~3 ms either way, per the xplane trace).
    """

    def __init__(
        self,
        channels: int,
        base_features: int = 16,
        num_levels: int = 3,
        out_features: int = 3,
        rngs: nnx.Rngs = None,
        *,
        temporal_kernel: int = 3,
        remat: bool = True,
        layout: str = "nhwc",
        s2d_last: bool = False,
        s2d_full: bool = False,
        dtype=jnp.bfloat16,
        param_dtype=jnp.float32,
    ):
        assert layout in ("nhwc", "cf")
        self.dtype = dtype
        self.layout = layout
        self.s2d_full = s2d_full and layout == "cf"
        self.s2d_last = (s2d_last and layout == "cf") or self.s2d_full
        kw = dict(
            temporal_kernel=temporal_kernel, remat=remat, layout=layout,
            dtype=dtype, param_dtype=param_dtype,
        )
        self.patch_mixer = Conv3D(
            in_features=channels,
            out_features=channels,
            kernel_size=(temporal_kernel, 7, 7),
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )
        self.encoders = nnx.List([])
        in_ch = channels
        for i in range(num_levels):
            out_ch = base_features * (2**i)
            self.encoders.append(DownBlock3D(in_ch, out_ch, rngs, **kw))
            in_ch = out_ch
        bottleneck_ch = base_features * (2**num_levels)
        cb_kw = dict(
            temporal_kernel=temporal_kernel, layout=layout, dtype=dtype, param_dtype=param_dtype
        )
        self.bottleneck1 = ConvBlock3D(in_ch, bottleneck_ch, 3, rngs, **cb_kw)
        self.bottleneck2 = ConvBlock3D(bottleneck_ch, bottleneck_ch, 3, rngs, **cb_kw)
        self.decoders = nnx.List([])
        in_ch = bottleneck_ch
        for i in range(num_levels - 1, -1, -1):
            out_ch = base_features * (2**i)
            self.decoders.append(UpBlock3D(in_ch, out_ch, rngs, **kw))
            in_ch = out_ch
        self.final_conv = Conv3D(
            in_features=base_features,
            out_features=out_features,
            kernel_size=(1, 1, 1),
            kernel_init=nnx.initializers.zeros,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """``s2d_full`` changes the I/O contract: the input must arrive
        PHASE-PACKED (b,t,4·cin,h/2,w/2) and the output is returned packed
        (b,t,4·out,h/2,w/2) — the Decoder fuses the single unpack into its
        exit permutation. All other configurations keep (b,t,c,h,w) I/O."""
        layout = self.layout
        x = x.astype(self.dtype)
        x = constrain(x, ("data", "fsdp"))
        if self.s2d_full:
            x = self.patch_mixer.call_cf_s2d(x)
        elif layout == "cf":
            x = self.patch_mixer.call_cf(x)
        else:
            x = self.patch_mixer(x)
        skips = []
        for i, encoder in enumerate(self.encoders):
            if layout == "cf":
                # level 0 under s2d_full: convs run packed, the skip STAYS
                # packed (its UpBlock consumes it packed), the phase-max pool
                # emits the unpacked half-res tensor level 1 expects.
                x, skip = encoder(x, s2d=self.s2d_full and i == 0)
            else:
                x, skip = encoder(x)
            skips.append(skip)
        x = self.bottleneck1(x)
        x = self.bottleneck2(x)
        n_dec = len(self.decoders)
        packed = False
        for i, (decoder, skip) in enumerate(zip(self.decoders, reversed(skips))):
            last = i == n_dec - 1
            # under s2d_full the last skip is already packed, so the s2d path
            # is mandatory (the parity check refers to unpacked dims)
            use_s2d = last and (
                (self.s2d_full)
                or (
                    self.s2d_last
                    and skip.shape[-1] % 2 == 0
                    and skip.shape[-2] % 2 == 0
                )
            )
            if layout == "cf":
                x = decoder(
                    x, skip, s2d=use_s2d, skip_packed=self.s2d_full and last
                )
            else:
                x = decoder(x, skip)
            packed = use_s2d
        if layout == "cf":
            fc = self.final_conv
            w = fc.kernel.value[0, 0, 0].astype(fc.dtype)  # (cin, cout)
            if packed:
                # 1×1×1 contraction stays phase-packed (kron with I₄ keeps
                # each phase independent); under s2d_full the packed result is
                # returned as-is (the Decoder's exit permutation unpacks),
                # otherwise ONE cheap unpack of the small 3-channel result
                w4 = jnp.kron(w, jnp.eye(4, dtype=fc.dtype))  # (4cin, 4cout)
                y = jnp.einsum("btchw,cd->btdhw", x.astype(fc.dtype), w4)
                y = y + jnp.repeat(fc.bias.value.astype(fc.dtype), 4)[
                    None, None, :, None, None
                ]
                return y if self.s2d_full else s2d_unpack_cf(y)
            # emit CHANNELS-FIRST: a pixels-last (…, cout=3) output stores
            # into 3-lane-minor tiles (~20× over bandwidth); the decoder
            # transposes the small 3-channel result once at its exit
            return jnp.einsum(
                "btchw,cd->btdhw", x.astype(fc.dtype), w
            ) + fc.bias.value.astype(fc.dtype)[None, None, :, None, None]
        return self.final_conv(x)
