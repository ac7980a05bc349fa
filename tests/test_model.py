"""Model-level tests: shapes, rollout duplication, gradient health.

Parity targets: /root/reference/claude_distributed/test_rl_model.py:49-239.
"""

import jax
import jax.numpy as jnp
from flax import nnx

from video_vae_tpu.utils.metrics import count_params


def test_vae_rl_shapes_and_rollout(tiny_model, cfg, batch):
    video, mask = batch
    b, t = mask.shape
    m = cfg.model
    out = nnx.jit(lambda model, v, mk, r: model(v, mk, r))(
        tiny_model, video, mask, nnx.Rngs(sampling=0)
    )
    assert out.rollouts == 2
    assert out.reconstruction.shape == (2 * b, t, m.height, m.width, m.channels)
    assert out.latent.shape == (2 * b, t, m.num_patches, m.latent_dim)
    assert out.selection_prob.shape == (2 * b, t, 1, 1)
    assert out.selection_mask.shape == (2 * b, t, 1, 1)
    # selection mask is hard binary; probabilities are in (0, 1)
    sel = out.selection_mask
    assert jnp.all((sel == 0) | (sel == 1))
    assert jnp.all((out.selection_prob > 0) & (out.selection_prob < 1))
    # the two rollouts decode the same latent statistics (mean duplicated)
    mean_pairs = out.mean.reshape(b, 2, *out.mean.shape[1:])
    assert jnp.allclose(mean_pairs[:, 0], mean_pairs[:, 1])


def test_vae_ste_shapes(tiny_ste_model, cfg, batch):
    video, mask = batch
    b, t = mask.shape
    m = cfg.model
    out = nnx.jit(lambda model, v, mk, r: model(v, mk, r))(
        tiny_ste_model, video, mask, nnx.Rngs(sampling=0)
    )
    assert out.rollouts == 1
    assert out.reconstruction.shape == (b, t, m.height, m.width, m.channels)
    assert jnp.all((out.selection_mask == 0) | (out.selection_mask == 1))


def test_eval_mode_uses_mean_latent(tiny_ste_model, batch):
    video, mask = batch

    @nnx.jit
    def run_eval(model, v, mk, r):
        return model(v, mk, r, train=False)

    out1 = run_eval(tiny_ste_model, video, mask, nnx.Rngs(sampling=0))
    out2 = run_eval(tiny_ste_model, video, mask, nnx.Rngs(sampling=999))
    # eval is deterministic: different sampling seeds give identical output
    assert jnp.allclose(out1.reconstruction, out2.reconstruction, atol=1e-5)


def test_param_count_positive(tiny_model):
    n = count_params(tiny_model)
    assert n > 10_000


def test_gradients_finite(tiny_model, batch):
    video, mask = batch

    @nnx.jit
    def grad_norm(model, v, mk, r):
        def loss(model, r):
            out = model(v, mk, r)
            return jnp.mean(jnp.square(out.reconstruction.astype(jnp.float32)))

        grads = nnx.grad(loss)(model, r)
        leaves = jax.tree_util.tree_leaves(grads)
        return jnp.max(jnp.array([jnp.max(jnp.abs(g)) for g in leaves])), jnp.array(
            [jnp.all(jnp.isfinite(g)) for g in leaves]
        ).all()

    gmax, finite = grad_norm(tiny_model, video, mask, nnx.Rngs(sampling=0))
    assert bool(finite)
    assert float(gmax) > 0


def test_encode_decode_roundtrip_api(tiny_model, cfg, batch):
    video, mask = batch
    m = cfg.model

    @nnx.jit
    def roundtrip(model, v, mk):
        mean, logvar, prob = model.encode(v, mk)
        keep = (prob >= 0.5).astype(mean.dtype)[..., None]
        return model.decode(model.blend_fill(mean, keep), mk), mean, logvar, prob

    recon, mean, logvar, prob = roundtrip(tiny_model, video, mask)
    assert recon.shape == video.shape
    assert mean.shape == (*mask.shape, m.num_patches, m.latent_dim)
    assert logvar.shape == mean.shape
    assert prob.shape == (*mask.shape, 1)
    assert jnp.all(jnp.isfinite(recon.astype(jnp.float32)))


def test_scan_rollout_decode_matches_batched(cfg, batch):
    """scan_rollout_decode sequentializes the paired-rollout decode via a
    checkpointed lax.scan (single-chip 64-frame memory lever, PERF.md) — it
    must reproduce the batched (b·rollouts) decode exactly, values and
    gradients, including under the production remat=True (nnx.remat inside
    the scan body)."""
    import numpy as np

    from video_vae_tpu.models.vae import VideoVAE

    video, mask = batch
    base = cfg.model.replace(dtype="float32", remat=True)
    batched = VideoVAE(base, nnx.Rngs(0, sampling=1))
    scanned = VideoVAE(base.replace(scan_rollout_decode=True), nnx.Rngs(0, sampling=1))

    @nnx.jit
    def run(model, v, mk, r):
        out = model(v, mk, r)
        return out.reconstruction, out.selection_mask

    ref, sel_ref = run(batched, video, mask, nnx.Rngs(sampling=7))
    out, sel = run(scanned, video, mask, nnx.Rngs(sampling=7))
    # identical rng consumption order → identical sampled rollout masks
    np.testing.assert_array_equal(np.asarray(sel), np.asarray(sel_ref))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    @nnx.jit
    def grads(model, v, mk, r):
        def loss(model, r):
            out = model(v, mk, r)
            return jnp.mean(jnp.square(out.reconstruction.astype(jnp.float32)))

        return nnx.grad(loss)(model, r)

    g_ref = grads(batched, video, mask, nnx.Rngs(sampling=7))
    g_out = grads(scanned, video, mask, nnx.Rngs(sampling=7))
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_out)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-4)


def test_decoder_s2d_full_matches_plain(cfg, batch):
    """unet_s2d_full wires packed emission (PatchUnEmbedding), the packed
    UNet, and the fused unpack+channels-last exit — the reconstruction must
    match the plain cf path bit-for-bit up to fp32 tolerance."""
    from video_vae_tpu.models.vae import VideoVAE

    video, mask = batch
    base = cfg.model.replace(dtype="float32", remat=False)
    plain = VideoVAE(base, nnx.Rngs(0, sampling=1))
    packed = VideoVAE(base.replace(unet_s2d_full=True), nnx.Rngs(0, sampling=1))

    @jax.jit
    def run(m, video, mask):
        mean, logvar, prob = m.encode(video, mask)
        return m.decode(mean, mask)

    ref = run(plain, video, mask)
    out = run(packed, video, mask)
    assert out.shape == ref.shape
    import numpy as np

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-3)
