"""Decode saved latent shards to video files with the group-causal VAE.

Parity with /root/reference/decode_video.py (which decodes saved latents to
mp4 with an external tokenizer): here latents stored by the offline builder
(scripts/build_cs_dataset.py .npz shards) are decoded by our VAE's streaming
decoder and written as mp4 (OpenCV, when available) or as a .npy frame dump.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vae-ckpt", required=True)
    ap.add_argument("--shard", required=True, help=".npz latent shard")
    ap.add_argument("--out", required=True, help="output .mp4 / .npy path")
    ap.add_argument("--fps", type=int, default=15)
    ap.add_argument("--max-frames", type=int, default=256)
    ap.add_argument("--latent-mean", type=float, nargs="*", default=None)
    ap.add_argument("--latent-std", type=float, nargs="*", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp
    from autoregressive_diffusion_tpu.models.vae import (VAE, VAEConfig,
                                                         latents_to_frames)
    from autoregressive_diffusion_tpu.utils import load_model

    kwargs, variables, extra = load_model(args.vae_ckpt, with_extra=True)
    vae = VAE(VAEConfig(**kwargs))
    mean = np.asarray(args.latent_mean if args.latent_mean is not None else
                      (extra or {}).get("latent_mean", 0.0), np.float32)
    std = np.asarray(args.latent_std if args.latent_std is not None else
                     (extra or {}).get("latent_std", 1.0), np.float32)

    with np.load(args.shard) as z:
        latents = z["latents"][:args.max_frames].astype(np.float32)

    frames_u8 = latents_to_frames(vae, variables, jnp.asarray(latents)[None],
                                  jnp.asarray(mean), jnp.asarray(std))
    frames = np.asarray(frames_u8[0])
    print(f"decoded {frames.shape[0]} frames of {frames.shape[1:]}")

    if args.out.endswith(".npy"):
        np.save(args.out, frames)
    else:
        import cv2
        h, w = frames.shape[1:3]
        vw = cv2.VideoWriter(args.out, cv2.VideoWriter_fourcc(*"mp4v"),
                             args.fps, (w, h))
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
    print(f"wrote -> {args.out}")


if __name__ == "__main__":
    main()
