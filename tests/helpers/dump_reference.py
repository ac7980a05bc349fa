"""Subprocess helper: run the reference VideoVAE and dump params + outputs.

Run in a FRESH interpreter because the reference's plain-list module
containers require ``flax_pytree_module=False`` to be set before ``flax.nnx``
is imported — impossible inside a pytest process where conftest already
imported nnx. Usage:

    python tests/helpers/dump_reference.py <out.npz>

Writes: flat reference params ("param/<path>"), encoder outputs, decoder
output, and full-forward outputs under shared rng seed 123, for fixed
synthetic inputs the parent test regenerates identically.
"""

import sys
import types

import numpy as np


def _install_stubs():
    class _Subscriptable:
        def __getitem__(self, item):
            return object

    jaxtyping = types.ModuleType("jaxtyping")
    jaxtyping.Float = _Subscriptable()
    jaxtyping.Array = object
    jaxtyping.jaxtyped = lambda fn=None, **kw: fn if callable(fn) else (lambda f: f)
    sys.modules.setdefault("jaxtyping", jaxtyping)
    beartype_mod = types.ModuleType("beartype")
    beartype_mod.beartype = lambda fn=None, **kw: fn if callable(fn) else (lambda f: f)
    sys.modules.setdefault("beartype", beartype_mod)


H = W = 64
PATCH = 16
FRAMES = 4
BATCH = 1


def main(out_path: str, enc_depth: int = 1, dec_depth: int = 1) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    _install_stubs()
    import flax

    flax.config.update("flax_pytree_module", False)
    from flax import nnx
    import jax.numpy as jnp

    sys.path.insert(0, "/root/reference/train")
    import rl_model

    ref = rl_model.VideoVAE(
        height=H, width=W, channels=3, patch_size=PATCH,
        encoder_depth=enc_depth, decoder_depth=dec_depth, mlp_dim=64, num_heads=2,
        qkv_features=32, max_temporal_len=8, spatial_compression_rate=8,
        unembedding_upsample_rate=4, rngs=nnx.Rngs(0, sampling=1),
        dtype=jnp.float32, param_dtype=jnp.float32,
    )

    hw = (H // PATCH) * (W // PATCH)
    video = jax.random.uniform(jax.random.key(2), (BATCH, FRAMES, H, W, 3), jnp.float32)
    frame_mask = jnp.ones((BATCH, FRAMES), jnp.float32).at[0, FRAMES - 1].set(0)
    ref_mask = jnp.broadcast_to(
        frame_mask.astype(bool)[:, None, None, :], (BATCH, hw, 1, FRAMES)
    ).reshape(BATCH * hw, 1, 1, FRAMES)
    latent_dim = 3 * PATCH * PATCH // 8
    z = jax.random.normal(jax.random.key(3), (BATCH, FRAMES, hw, latent_dim), jnp.float32)
    video4 = jax.random.uniform(jax.random.key(4), (BATCH, FRAMES, H, W, 3), jnp.float32)

    arrays = {}

    def _flatten(tree, prefix):
        if hasattr(tree, "items"):
            for key, value in tree.items():
                _flatten(value, prefix + (str(key),))
        elif isinstance(tree, (list, tuple)):
            for i, value in enumerate(tree):
                _flatten(value, prefix + (str(i),))
        else:
            value = getattr(tree, "value", tree)
            if value is not None:
                arrays["param/" + "/".join(prefix)] = np.asarray(value)

    _flatten(nnx.state(ref), ())

    # split/merge inside jit — nnx modules cannot be mutated across trace
    # levels as bare closures (same pattern as tools/measure_reference.py)
    graphdef, state = nnx.split(ref)

    @jax.jit
    def run_encoder(state, v, m):
        model = nnx.merge(graphdef, state)
        return model.encoder(v, m, nnx.Rngs(sampling=0), train=False)

    @jax.jit
    def run_decoder(state, z, m):
        model = nnx.merge(graphdef, state)
        return model.decoder(z, m, nnx.Rngs(sampling=0), train=False)

    @jax.jit
    def run_full(state, v, m):
        model = nnx.merge(graphdef, state)
        return model(v, m, nnx.Rngs(sampling=123), train=True)

    enc_mean, enc_logvar, enc_sel = run_encoder(state, video, ref_mask)
    arrays["enc_mean"] = np.asarray(enc_mean)
    arrays["enc_logvar"] = np.asarray(enc_logvar)
    arrays["enc_sel"] = np.asarray(enc_sel)

    dec_out = run_decoder(state, z, ref_mask)
    arrays["dec_out"] = np.asarray(dec_out)

    recon, comp, sel, selmask, logvar, mean = run_full(state, video4, ref_mask)
    arrays["fwd_recon"] = np.asarray(recon)
    arrays["fwd_comp"] = np.asarray(comp)
    arrays["fwd_selmask"] = np.asarray(selmask)

    np.savez(out_path, **arrays)
    print(f"[dump_reference] wrote {len(arrays)} arrays to {out_path}")


if __name__ == "__main__":
    main(
        sys.argv[1],
        int(sys.argv[2]) if len(sys.argv) > 2 else 1,
        int(sys.argv[3]) if len(sys.argv) > 3 else 1,
    )
