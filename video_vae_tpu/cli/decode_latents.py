"""Decode cached latents back to mp4 (parity: /root/reference/data_prep/decode_video.py:46-67,
using our decoder on TPU instead of DC-AE on CUDA).

    python -m video_vae_tpu.cli.decode_latents --model_path ckpt --latents L.npz --out out.mp4
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Decode cached latents to video")
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--latents", type=str, required=True)
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--resize", type=int, default=256)
    parser.add_argument("--fps", type=float, default=30.0)
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from flax import nnx

    from video_vae_tpu.core.config import ModelConfig, tiny_config
    from video_vae_tpu.data.video_io import write_video
    from video_vae_tpu.models.vae import VideoVAE
    from video_vae_tpu.train.checkpoint import _abstract

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
    except Exception as e:
        print(f"[decode_latents] WARNING: checkpoint restore failed ({e}); random weights")

    data = np.load(args.latents)
    mean = jnp.asarray(data["mean"])[None].astype(jnp.bfloat16)
    prob = jnp.asarray(data["selection_prob"])[None]
    mask = jnp.asarray(data["mask"])[None]

    @nnx.jit
    def decode(model, mean, prob, mask):
        keep = (prob >= 0.5).astype(mean.dtype)[..., None]
        return model.decode(model.blend_fill(mean, keep), mask)

    recon = np.asarray(decode(model, mean, prob, mask)[0], np.float32)
    write_video({"video": recon, "mask": np.asarray(data["mask"])}, args.out, fps=args.fps)
    print(f"[decode_latents] wrote {args.out}")


if __name__ == "__main__":
    main()
