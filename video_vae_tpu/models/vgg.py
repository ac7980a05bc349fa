"""VGG16 feature extractor for perceptual loss, implemented in-repo.

The reference pulls VGG16 from ``flaxmodels`` (/root/reference/train/vgg_tests.py:18-32),
which is not available here. Only the layers the perceptual loss actually reads
matter — relu1_1, relu1_2, relu2_1 (/root/reference/train/vgg_tests.py:36) — so
by default the network is truncated after conv2_1: 3 convolutions instead of 13,
which removes >90% of the VGG FLOPs from the loss with identical semantics.

Weights: pass ``weights_path`` pointing at an .npz produced by
``python -m video_vae_tpu.cli.convert_vgg <torchvision_vgg16.pth> <out.npz>``.
torch (CPU) is available to run the converter, but torchvision/flaxmodels are
NOT installed and this environment has no network egress, so the ``.pth``
checkpoint itself must be user-supplied. Without weights the filters are
He-initialized and ``load_vgg`` emits a LOUD warning: random VGG features are a
materially different training objective from the reference's pretrained
perceptual loss (/root/reference/train/vgg_tests.py:18-32).
"""

from __future__ import annotations

import os
import warnings
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


# Layer plan up to relu2_1 (torchvision features indices in comments).
_TRUNCATED_PLAN: Sequence[Tuple[str, int, int]] = (
    ("conv1_1", 3, 64),  # features.0
    ("conv1_2", 64, 64),  # features.2
    # maxpool                     features.4
    ("conv2_1", 64, 128),  # features.5
)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

PERCEPTUAL_LAYERS = ("relu1_1", "relu1_2", "relu2_1")


# ---------------------------------------------------------------------------
# NHWC conv with a reformulated input-gradient (VVT_VGG_DGRAD=convfwd).
#
# r5 xplane of the b1x16f train step: XLA's derived dgrad for conv1_2
# (fusion.9744, bf16[32,256,256,64] from a 3,3,64,64 kernel) runs 4.86 ms/step
# ≈ 16% MFU while its FORWARD conv emitter does the same-shaped contraction at
# ~29% (multiply_reduce_fusion.679). For a stride-1 SAME odd conv the input
# gradient IS a forward conv of g with the spatially-flipped, io-swapped
# kernel — expressing it that way hands XLA the better emitter. The filter
# gradient stays on XLA's native path (jax.vjp w.r.t. w only).
# ---------------------------------------------------------------------------


def _conv2d_same(x, w, b):
    import jax.lax as lax

    # same arithmetic as nnx.Conv (no preferred_element_type: a f32-typed
    # output makes jax's conv transpose feed a f32 cotangent against bf16
    # operands inside the native-wgrad vjp, which lax rejects)
    y = lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(y.dtype)


@jax.custom_vjp
def conv2d_same_fast_dgrad(x, w, b):
    return _conv2d_same(x, w, b)


def _c2d_fwd(x, w, b):
    return _conv2d_same(x, w, b), (x, w)


def _c2d_bwd(res, g):
    import jax.lax as lax

    x, w = res
    g = g.astype(x.dtype)
    # dgrad as a forward-style conv (exact for stride 1, SAME, odd taps)
    w_t = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    dx = lax.conv_general_dilated(
        g, w_t, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(x.dtype)
    # filter gradient: XLA's native path (differentiate w.r.t. w only)
    _, vjp_w = jax.vjp(lambda wk: _conv2d_same(x, wk, jnp.zeros((w.shape[-1],), x.dtype)), w)
    (dw,) = vjp_w(g)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dw, db


conv2d_same_fast_dgrad.defvjp(_c2d_fwd, _c2d_bwd)


class VGG16Features(nnx.Module):
    """Truncated VGG16 returning {reluX_Y: activation} on NHWC [0,1] images."""

    def __init__(
        self,
        rngs: nnx.Rngs,
        *,
        normalize: bool = True,
        layout: str = "nhwc",
        dtype=jnp.bfloat16,
        param_dtype=jnp.float32,
    ):
        assert layout in ("nhwc", "cf")
        self.normalize = normalize
        self.layout = layout
        self.dtype = dtype
        self.convs = nnx.Dict()
        for name, cin, cout in _TRUNCATED_PLAN:
            self.convs[name] = nnx.Conv(
                in_features=cin,
                out_features=cout,
                kernel_size=(3, 3),
                padding="SAME",
                dtype=dtype,
                param_dtype=param_dtype,
                rngs=rngs,
            )

    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        # layout="nhwc": plain XLA NHWC convs. Routing these through the
        # Pallas direct kernel via the CHANNELS-LAST wrapper was A/B'd
        # ~180 ms/step SLOWER in round 2: that wrapper transposes the ~0.5 GB
        # 64-channel activations around every call (fwd + remat recompute +
        # dgrad), drowning the MXU win.
        # layout="cf": the channels-first-NATIVE variant that note scoped —
        # transpose ONLY the 3-channel input once at entry, then every conv
        # (and its Pallas dgrad/wgrad) runs on the cf activations directly
        # with zero further transposes; activations stay cf through the
        # layout-agnostic loss reductions. A/B'd on-chip r3: 283.0 vs
        # 231.1 ms/step — LOSES by 52 ms even transpose-free (the direct
        # kernel's im2col stores don't pay at 64ch@256²x3x3 where XLA's
        # native NHWC conv is already MXU-shaped), so nhwc stays default.
        x = x.astype(self.dtype)
        if self.normalize:
            mean = jnp.asarray(IMAGENET_MEAN, self.dtype)
            std = jnp.asarray(IMAGENET_STD, self.dtype)
            x = (x - mean) / std
        if self.layout == "cf":
            return self._call_cf(x)

        # default xla: the convfwd reformulation A/B'd NEUTRAL on-chip
        # (164.15 vs 164.1-164.3 ms/step b1x16f, r5) — the derived-dgrad
        # fusion's 16% MFU is evidently bounded by the relu-mask elementwise
        # riding it, not by the conv emitter choice. Kept for chips/XLA
        # versions where the emitters diverge.
        if os.environ.get("VVT_VGG_DGRAD", "xla") == "convfwd":
            # reformulated input-gradient (see conv2d_same_fast_dgrad)
            def conv(name, t):
                c = self.convs[name]
                return conv2d_same_fast_dgrad(
                    t,
                    c.kernel.value.astype(self.dtype),
                    c.bias.value.astype(self.dtype),
                )
        else:
            def conv(name, t):
                return self.convs[name](t)

        acts = {}
        x = jax.nn.relu(conv("conv1_1", x))
        acts["relu1_1"] = x
        x = jax.nn.relu(conv("conv1_2", x))
        acts["relu1_2"] = x
        # reduce_window pool: a strided-slice max variant was A/B'd ~40 ms/step
        # SLOWER here — its backward lowers to scatter-add chains far worse
        # than select_and_scatter (unlike the UNet's inference-path pools,
        # where slice-max wins).
        x = nnx.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        x = jax.nn.relu(conv("conv2_1", x))
        acts["relu2_1"] = x
        return acts

    def _conv_cf(self, name: str, x5: jnp.ndarray) -> jnp.ndarray:
        """One VGG conv on (1, N, c, H, W) through the conv3d_cf dispatch —
        a (1,3,3) kernel makes each frame independent while the kernel's
        temporal M-packing fills the MXU rows (f·cout) across frames."""
        from video_vae_tpu.ops.conv3d import conv3d_cf

        conv = self.convs[name]
        kernel = conv.kernel.value.astype(self.dtype)[None]  # (1,3,3,cin,cout)
        return conv3d_cf(x5, kernel, conv.bias.value.astype(jnp.float32))

    def _call_cf(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        n, h, w, _ = x.shape
        x5 = jnp.transpose(x, (0, 3, 1, 2))[None]  # (1, N, 3, H, W)
        acts = {}
        y = jax.nn.relu(self._conv_cf("conv1_1", x5))
        acts["relu1_1"] = y
        y = jax.nn.relu(self._conv_cf("conv1_2", y))
        acts["relu1_2"] = y
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 1, 1, 2, 2), (1, 1, 1, 2, 2), "VALID"
        )
        y = jax.nn.relu(self._conv_cf("conv2_1", y))
        acts["relu2_1"] = y
        return acts


def load_vgg(
    weights_path: Optional[str] = None,
    *,
    normalize: bool = True,
    layout: str = "nhwc",
    dtype=jnp.bfloat16,
) -> VGG16Features:
    """Build the feature extractor, optionally loading converted weights."""
    model = VGG16Features(nnx.Rngs(0), normalize=normalize, layout=layout, dtype=dtype)
    if not weights_path:
        warnings.warn(
            "Perceptual loss is using RANDOM (He-init) VGG filters — no "
            "weights_path was given. This is a materially different training "
            "objective from the reference's ImageNet-pretrained VGG16. "
            "Convert weights with `python -m video_vae_tpu.cli.convert_vgg "
            "vgg16.pth vgg16.npz` and pass --vgg_weights / weights_path.",
            stacklevel=2,
        )
    if weights_path:
        if not os.path.exists(weights_path):
            raise FileNotFoundError(weights_path)
        data = np.load(weights_path)
        for name, _, _ in _TRUNCATED_PLAN:
            kernel = data[f"{name}.kernel"]  # (kh, kw, cin, cout)
            bias = data[f"{name}.bias"]
            conv = model.convs[name]
            assert conv.kernel.value.shape == kernel.shape, (
                name,
                conv.kernel.value.shape,
                kernel.shape,
            )
            conv.kernel.value = jnp.asarray(kernel, conv.kernel.value.dtype)
            conv.bias.value = jnp.asarray(bias, conv.bias.value.dtype)
    return model


def convert_torchvision_state_dict(state_dict, out_path: str) -> None:
    """torchvision vgg16 state_dict (.pth) → .npz with HWIO kernels."""
    index = {"conv1_1": 0, "conv1_2": 2, "conv2_1": 5}
    arrays = {}
    for name, idx in index.items():
        w = np.asarray(state_dict[f"features.{idx}.weight"])  # (out, in, kh, kw)
        b = np.asarray(state_dict[f"features.{idx}.bias"])
        arrays[f"{name}.kernel"] = np.transpose(w, (2, 3, 1, 0))  # → (kh, kw, in, out)
        arrays[f"{name}.bias"] = b
    np.savez(out_path, **arrays)
