"""Compute per-channel VAE latent mean/std over dataset samples and attach
them to the VAE checkpoint.

Parity with /root/reference/save_model_to_s3.py:19+ (which computes latent
statistics over N dataset samples, stores them as `mean`/`std` buffers on the
VAE and re-uploads): here the statistics are saved into the kwargs-bundle
checkpoint (utils/checkpoint.py) under `latent_mean` / `latent_std`, the
buffers `frames_to_latents`/`latents_to_frames` consume
(models/vae.py:326-340). Uses the intended normalize-to-unit-std semantics
(SURVEY.md section 2.5 notes the reference's frames_to_latents bug; the
training scripts use `(means - mean)/std`, cs_train.py:102).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vae-ckpt", required=True,
                    help="kwargs-bundle VAE checkpoint (utils.save_model)")
    ap.add_argument("--out", default=None,
                    help="output checkpoint path (default: overwrite input)")
    ap.add_argument("--num-samples", type=int, default=64)
    ap.add_argument("--state-size", type=int, default=32)
    ap.add_argument("--env", default="LunarLander-v3")
    ap.add_argument("--frame-size", type=int, default=256)
    ap.add_argument("--shard-dir", default=None,
                    help="use local frame shards instead of the gym env")
    ap.add_argument("--synthetic", action="store_true",
                    help="synthetic frames (environment-free smoke test)")
    args = ap.parse_args()

    from autoregressive_diffusion_tpu.data import u8_to_pm1
    from autoregressive_diffusion_tpu.models.vae import VAE, VAEConfig
    from autoregressive_diffusion_tpu.utils import load_model, save_model

    kwargs, variables, extra = load_model(args.vae_ckpt, with_extra=True)
    cfg = VAEConfig(**kwargs)
    vae = VAE(cfg)
    encode = jax.jit(lambda v, x: vae.apply(v, x, method=VAE.encode)[0])

    if args.synthetic:
        from autoregressive_diffusion_tpu.data import SyntheticVideoGenerator
        gen = iter(SyntheticVideoGenerator(state_size=args.state_size,
                                           frame_size=args.frame_size))
        frames_iter = (next(gen)[0] for _ in range(args.num_samples))
    elif args.shard_dir:
        from autoregressive_diffusion_tpu.data import LocalLatentShards
        ds = iter(LocalLatentShards(args.shard_dir, clip_size=args.state_size,
                                    key="frames"))
        frames_iter = (next(ds)["frames"] for _ in range(args.num_samples))
    else:
        from autoregressive_diffusion_tpu.data import GymDataGenerator
        gen = iter(GymDataGenerator(state_size=args.state_size,
                                    environment_name=args.env,
                                    frame_size=args.frame_size))
        frames_iter = (next(gen)[0] for _ in range(args.num_samples))

    # Welford-style accumulation of per-channel moments over latent means.
    n = 0
    s1 = s2 = None
    for i, frames in enumerate(frames_iter):
        if frames.dtype == np.uint8:
            frames = u8_to_pm1(frames)
        lat = np.asarray(encode(variables, jnp.asarray(frames)[None]))
        flat = lat.reshape(-1, lat.shape[-1]).astype(np.float64)
        if s1 is None:
            s1 = flat.sum(0)
            s2 = (flat**2).sum(0)
        else:
            s1 += flat.sum(0)
            s2 += (flat**2).sum(0)
        n += flat.shape[0]
        print(f"\r{i + 1}/{args.num_samples} clips", end="", flush=True)
    print()

    mean = s1 / n
    std = np.sqrt(np.maximum(s2 / n - mean**2, 1e-12))
    print("latent mean:", np.round(mean, 4))
    print("latent std: ", np.round(std, 4))

    extra = dict(extra or {})
    extra["latent_mean"] = mean.astype(np.float32)
    extra["latent_std"] = std.astype(np.float32)
    out = args.out or args.vae_ckpt
    save_model(out, kwargs, variables, extra=extra)
    print(f"saved -> {out}")


if __name__ == "__main__":
    main()
