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


class VGG16Features(nnx.Module):
    """Truncated VGG16 returning {reluX_Y: activation} on NHWC [0,1] images."""

    def __init__(
        self,
        rngs: nnx.Rngs,
        *,
        normalize: bool = True,
        dtype=jnp.bfloat16,
        param_dtype=jnp.float32,
    ):
        self.normalize = normalize
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
        # Plain XLA NHWC convs. Routing these through the Pallas direct kernel
        # was A/B'd ~180 ms/step SLOWER: the channels-last wrapper transposes
        # the ~0.5 GB frame batch around every call (fwd + remat recompute +
        # dgrad), drowning the MXU win. XLA's ~23% MFU here is layout-bound,
        # not fixable from the conv alone.
        x = x.astype(self.dtype)
        if self.normalize:
            mean = jnp.asarray(IMAGENET_MEAN, self.dtype)
            std = jnp.asarray(IMAGENET_STD, self.dtype)
            x = (x - mean) / std
        acts = {}
        x = jax.nn.relu(self.convs["conv1_1"](x))
        acts["relu1_1"] = x
        x = jax.nn.relu(self.convs["conv1_2"](x))
        acts["relu1_2"] = x
        # reduce_window pool: a strided-slice max variant was A/B'd ~40 ms/step
        # SLOWER here — its backward lowers to scatter-add chains far worse
        # than select_and_scatter (unlike the UNet's inference-path pools,
        # where slice-max wins).
        x = nnx.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        x = jax.nn.relu(self.convs["conv2_1"](x))
        acts["relu2_1"] = x
        return acts


def load_vgg(
    weights_path: Optional[str] = None,
    *,
    normalize: bool = True,
    dtype=jnp.bfloat16,
) -> VGG16Features:
    """Build the feature extractor, optionally loading converted weights."""
    model = VGG16Features(nnx.Rngs(0), normalize=normalize, dtype=dtype)
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
