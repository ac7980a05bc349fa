"""conv3d backend dispatch: numerics vs XLA reference, forward and backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_vae_tpu.ops.conv3d import (
    _conv3d_xla,
    conv3d_decomposed2d,
    conv3d_direct,
    conv3d_s2d,
)


def _data(cin=4, cout=6, k=(3, 3, 3), hw=16):
    ks = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(ks[0], (2, 4, hw, hw, cin), jnp.float32)
    kern = jax.random.normal(ks[1], (*k, cin, cout), jnp.float32) * 0.1
    bias = jax.random.normal(ks[2], (cout,), jnp.float32) * 0.1
    return x, kern, bias


@pytest.mark.parametrize("variant", [conv3d_decomposed2d, conv3d_s2d])
def test_variants_match_xla(variant):
    x, kern, bias = _data()
    ref = _conv3d_xla(x, kern, bias)
    out = jax.jit(variant)(x, kern, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_s2d_wide_kernel_matches_xla():
    x, kern, bias = _data(k=(3, 7, 7))
    ref = _conv3d_xla(x, kern, bias)
    out = jax.jit(conv3d_s2d)(x, kern, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3)


def test_custom_vjp_gradients_match_xla():
    """conv3d_direct's custom backward must equal autodiff through XLA conv."""
    x, kern, bias = _data()

    def loss_direct(x, kern, bias):
        return jnp.sum(conv3d_direct(x, kern, bias) ** 2)

    def loss_ref(x, kern, bias):
        return jnp.sum(_conv3d_xla(x, kern, bias) ** 2)

    g_direct = jax.jit(jax.grad(loss_direct, argnums=(0, 1, 2)))(x, kern, bias)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(x, kern, bias)
    for a, b in zip(g_direct, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


def test_conv_transpose_2x_matches_flax():
    from flax import nnx

    from video_vae_tpu.models.unet import ConvTranspose2x

    ref = nnx.ConvTranspose(
        in_features=3, out_features=5, kernel_size=(1, 2, 2), strides=(1, 2, 2),
        rngs=nnx.Rngs(0),
    )
    ours = ConvTranspose2x(3, 5, rngs=nnx.Rngs(1), dtype=jnp.float32)
    ours.kernel.value = ref.kernel.value
    ours.bias.value = ref.bias.value
    x = jax.random.normal(jax.random.key(1), (2, 2, 4, 4, 3))
    np.testing.assert_allclose(
        np.asarray(ours(x)), np.asarray(ref(x)), atol=1e-5, rtol=1e-5
    )
