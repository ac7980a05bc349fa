"""3D-CNN real/fake discriminator with spectral-normalized convolutions.

Parity: Classifier + ManualSpectralNorm (/root/reference/train/classifier.py:10-186):
initial 7×7 conv block, ``num_levels`` spectral-normed down blocks (2×conv +
spatial-only maxpool), global mean-pool, Linear → one logit per clip. Spectral
norm = 1-step Miyato power iteration with the ``u`` vector in a BatchStat.

Re-architected: the reference temporarily overwrites the wrapped layer's kernel
and restores it in a ``finally`` (classifier.py:56-66) — stateful kernel
mutation inside a traced function. Since convolution is linear in its kernel,
here the *output* is scaled instead: conv(x; W/σ) = conv(x; W)/σ (bias added
after), which is mutation-free, autodiff-clean, and lets XLA fold 1/σ into the
conv epilogue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx


class SpectralNorm(nnx.Module):
    """Wrap a kernel-bearing layer; divides its output by the spectral norm."""

    def __init__(self, layer: nnx.Module, rngs: nnx.Rngs, n_steps: int = 1):
        self.layer = layer
        self.n_steps = n_steps
        kernel_shape = layer.kernel.value.shape
        self.u = nnx.BatchStat(jax.random.normal(rngs.params(), (1, kernel_shape[-1])))

    def _sigma(self, update_stats: bool) -> jnp.ndarray:
        weight = self.layer.kernel.value
        weight_mat = weight.reshape(-1, weight.shape[-1]).astype(jnp.float32)
        u = self.u.value.astype(jnp.float32)
        v = None
        if update_stats:
            for _ in range(self.n_steps):
                v = u @ weight_mat.T
                v = v / jnp.linalg.norm(v, keepdims=True)
                u = v @ weight_mat
                u = u / jnp.linalg.norm(u, keepdims=True)
            self.u.value = u
        if v is None:
            v = u @ weight_mat.T
            v = v / jnp.linalg.norm(v, keepdims=True)
        return (v @ weight_mat @ u.T)[0, 0]

    def __call__(self, x, update_stats: bool = True):
        sigma = jax.lax.stop_gradient(self._sigma(update_stats))
        bias = getattr(self.layer, "bias", None)
        out = self.layer(x)
        if bias is not None and bias.value is not None:
            b = bias.value.astype(out.dtype)
            return (out - b) / sigma.astype(out.dtype) + b
        return out / sigma.astype(out.dtype)


class SNConvBlock3D(nnx.Module):
    """Spectral-normed Conv3D → GroupNorm → SiLU."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int,
        rngs: nnx.Rngs,
        *,
        temporal_kernel: int = 3,
        dtype=jnp.bfloat16,
        param_dtype=jnp.float32,
    ):
        self.conv = SpectralNorm(
            nnx.Conv(
                in_features=in_channels,
                out_features=out_channels,
                kernel_size=(temporal_kernel, kernel_size, kernel_size),
                padding="SAME",
                dtype=dtype,
                param_dtype=param_dtype,
                rngs=rngs,
            ),
            rngs=rngs,
        )
        self.norm = nnx.GroupNorm(
            num_groups=min(8, out_channels),
            num_features=out_channels,
            dtype=dtype,
            param_dtype=param_dtype,
            rngs=rngs,
        )

    def __call__(self, x):
        return nnx.silu(self.norm(self.conv(x)))


class SNDownBlock3D(nnx.Module):
    def __init__(self, in_channels, out_channels, rngs, *, temporal_kernel=3,
                 remat=True, dtype=jnp.bfloat16, param_dtype=jnp.float32):
        kw = dict(temporal_kernel=temporal_kernel, dtype=dtype, param_dtype=param_dtype)
        self.conv1 = SNConvBlock3D(in_channels, out_channels, 3, rngs, **kw)
        self.conv2 = SNConvBlock3D(out_channels, out_channels, 3, rngs, **kw)
        self.use_remat = remat

    def _forward(self, x):
        x = self.conv1(x)
        x = self.conv2(x)
        return nnx.max_pool(x, window_shape=(1, 2, 2), strides=(1, 2, 2))

    def __call__(self, x):
        if self.use_remat:
            return nnx.remat(SNDownBlock3D._forward)(self, x)
        return self._forward(x)


class Discriminator(nnx.Module):
    """(b,t,h,w,c) video → (b,1) real/fake logits."""

    def __init__(
        self,
        channels: int = 3,
        base_features: int = 32,
        num_levels: int = 4,
        rngs: nnx.Rngs = None,
        *,
        temporal_kernel: int = 3,
        remat: bool = True,
        dtype=jnp.bfloat16,
        param_dtype=jnp.float32,
    ):
        kw = dict(temporal_kernel=temporal_kernel, dtype=dtype, param_dtype=param_dtype)
        self.initial_conv = SNConvBlock3D(channels, base_features, 7, rngs, **kw)
        self.encoders = nnx.List([])
        in_ch = base_features
        for i in range(num_levels):
            out_ch = base_features * (2 ** (i + 1))
            self.encoders.append(
                SNDownBlock3D(in_ch, out_ch, rngs, remat=remat, **kw)
            )
            in_ch = out_ch
        self.classifier = nnx.Linear(in_ch, 1, dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = self.initial_conv(x)
        for encoder in self.encoders:
            x = encoder(x)
        x = jnp.mean(x, axis=(1, 2, 3))
        return self.classifier(x)
