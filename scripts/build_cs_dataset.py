"""Offline dataset builder: raw gameplay clips -> VAE latent shards.

Parity with /root/reference/edm2/cs_dataset_processing/
dataset_processing_counter_strike.py:20-136 (download h5 tars -> resize 256^2
-> vae.encode_long_sequence(split=512) -> fp16 means -> MDSWriter shards) and
dataset_reupload.py (raw-frame shards, --raw). TPU-native differences:
  * resize + [-1,1] normalization run through the native C++ kernel
    (native/adx_data.cpp), OpenMP-parallel across frames;
  * encoding uses the chunked-scan streaming encoder
    (models/vae.py:313-324) on the accelerator;
  * shards are written as local .npz (data/cs_data.py LocalLatentShards
    layout) by default, or MosaicML MDS when `streaming` is installed and
    --mds is passed (same zstd compression as the reference).

Input sources (first match wins per --src):
  * a directory of .h5 files with datasets 'frame_i' (TeaPearce CS layout)
  * a directory of .npz files with arrays 'frames' (+optional 'actions')
  * --synthetic N: N synthetic clips (smoke test, no data needed)
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def iter_clips(args):
    if args.synthetic:
        rng = np.random.default_rng(0)
        for i in range(args.synthetic):
            t = args.clip_frames
            yield (f"synthetic_{i}",
                   rng.integers(0, 256, (t, 128, 128, 3), dtype=np.uint8),
                   rng.integers(0, args.n_actions, (t,), dtype=np.int64))
        return
    names = sorted(os.listdir(args.src))
    for name in names:
        path = os.path.join(args.src, name)
        if name.endswith(".h5") or name.endswith(".hdf5"):
            import h5py
            with h5py.File(path, "r") as f:
                n = len([k for k in f.keys() if k.startswith("frame_")])
                frames = np.stack([np.asarray(f[f"frame_{i}_x"]
                                              if f"frame_{i}_x" in f else
                                              f[f"frame_{i}"])
                                   for i in range(n)])
                actions = (np.asarray(f["actions"])
                           if "actions" in f else np.zeros(n, np.int64))
            yield name, frames, actions
        elif name.endswith(".npz"):
            with np.load(path) as z:
                yield name, z["frames"], (z["actions"] if "actions" in z
                                          else np.zeros(len(z["frames"]),
                                                        np.int64))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=None, help="directory of .h5/.npz clips")
    ap.add_argument("--out", required=True, help="output shard directory")
    ap.add_argument("--vae-ckpt", default=None,
                    help="kwargs-bundle VAE checkpoint; omit with --raw")
    ap.add_argument("--raw", action="store_true",
                    help="write raw frames, no VAE encode (dataset_reupload)")
    ap.add_argument("--frame-size", type=int, default=256)
    ap.add_argument("--split-size", type=int, default=512,
                    help="streaming-encode chunk (reference split=512)")
    ap.add_argument("--mds", action="store_true",
                    help="write MosaicML MDS shards instead of .npz")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--clip-frames", type=int, default=64)
    ap.add_argument("--n-actions", type=int, default=4)
    args = ap.parse_args()
    assert args.src or args.synthetic, "need --src or --synthetic"

    from autoregressive_diffusion_tpu.data import (resize_frames_batch,
                                                   write_latent_shard)

    encode = None
    if not args.raw:
        assert args.vae_ckpt, "--vae-ckpt required unless --raw"
        import jax
        import jax.numpy as jnp
        from autoregressive_diffusion_tpu.models.vae import (
            VAE, VAEConfig, encode_long_sequence)
        kwargs, variables = __import__(
            "autoregressive_diffusion_tpu.utils", fromlist=["load_model"]
        ).load_model(args.vae_ckpt)
        vae = VAE(VAEConfig(**kwargs))

        def encode(frames_pm1):
            lat = encode_long_sequence(vae, variables,
                                       jnp.asarray(frames_pm1)[None],
                                       split_size=args.split_size)
            return np.asarray(lat[0], np.float16)

    os.makedirs(args.out, exist_ok=True)
    mds_writer = None
    if args.mds:
        from streaming import MDSWriter
        key = "frames" if args.raw else "latents"
        mds_writer = MDSWriter(
            out=args.out, compression="zstd",
            columns={key: "ndarray", "actions": "ndarray"})

    for name, frames, actions in iter_clips(args):
        frames_pm1 = resize_frames_batch(frames, args.frame_size)
        if args.raw:
            data, key = (frames_pm1 * 127.5 + 127.5).astype(np.uint8), "frames"
        else:
            data, key = encode(frames_pm1), "latents"
        if mds_writer is not None:
            mds_writer.write({key: data, "actions": actions})
        else:
            out_path = os.path.join(args.out,
                                    os.path.splitext(name)[0] + ".npz")
            write_latent_shard(out_path, data, actions, key=key)
        print(f"{name}: {key} {data.shape} {data.dtype}")

    if mds_writer is not None:
        mds_writer.finish()
    print(f"done -> {args.out}")


if __name__ == "__main__":
    main()
