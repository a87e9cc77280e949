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


def structured_clip(rng, t, size=128, n_actions=4, tc=4):
    """Structured synthetic video with learnable temporal dynamics (the
    CS-scale *learning* proof needs real signal, not white noise): an
    action-controlled CAMERA PAN over a fixed textured world (terrain
    strip + colored landmarks), plus two drifting sprites and a bright
    player marker. The pan makes EVERY pixel's next value a function of
    past frames + the action (a context-free denoiser cannot know the
    scroll phase at high sigma), which is what a world model must learn
    -- the first cut put the temporal signal in ~1% of pixels (one
    sprite) and a 310M model learned single-frame denoising instead
    (round-5 scrambled-context probe: loss identical under context
    shuffling)."""
    # world texture: coarse blocky field + a terrain band + landmarks,
    # toroidal (np.roll camera)
    world = rng.normal(0, 1, (size // 8, size // 8, 3))
    world = np.kron(world, np.ones((8, 8, 1)))
    world = ((world - world.min()) / (np.ptp(world) + 1e-6) * 90).astype(
        np.uint8)
    band = size // 2 + int(rng.integers(0, size // 4))
    world[band:band + size // 6] = (120, 110, 80)  # terrain band
    for _ in range(6):  # bright landmarks the pan sweeps across
        ly, lx = rng.integers(0, size, 2)
        world[ly:ly + 6, lx:lx + 6] = rng.integers(120, 255, 3)
    frames = np.empty((t, size, size, 3), np.uint8)
    actions = np.empty((t,), np.int64)
    # action = camera velocity (CS mouse-look analogue)
    vel = [(0, 0), (4, 0), (0, 4), (-4, -4)][:n_actions]
    ox = oy = 0
    spr = [(rng.integers(0, size), rng.integers(0, size),
            int(rng.integers(1, 3)), int(rng.integers(1, 3)))
           for _ in range(2)]
    a = int(rng.integers(0, n_actions))
    for i in range(t):
        if i % tc == 0:
            a = int(rng.integers(0, n_actions))
        actions[i] = a
        dx, dy = vel[a % len(vel)]
        ox = (ox + dx) % size
        oy = (oy + dy) % size
        f = np.roll(np.roll(world, -oy, 0), -ox, 1).copy()
        for k, (sx, sy, sv, sw) in enumerate(spr):
            px = int((sx + sv * i - ox) % size)
            py = int((sy + sw * i - oy) % size)
            f[max(0, py - 3):py + 3, max(0, px - 3):px + 3] = (
                (200, 60, 60) if k == 0 else (60, 60, 220))
        c = size // 2  # player marker fixed at screen center
        f[c - 4:c + 4, c - 4:c + 4] = (235, 235, 235)
        frames[i] = f
    return frames, actions


def iter_clips(args):
    if args.synthetic:
        rng = np.random.default_rng(args.seed)
        for i in range(args.synthetic):
            frames, actions = structured_clip(
                rng, args.clip_frames, n_actions=args.n_actions)
            yield f"synthetic_{i}", frames, actions
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
    ap.add_argument("--seed", type=int, default=0,
                    help="synthetic-clip RNG seed (use a different seed to "
                         "build a held-out eval split)")
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
        # same guard as cs_train.py: sitecustomize re-pins JAX_PLATFORMS to
        # the TPU plugin, so a host-only build must force CPU explicitly
        if "xla_force_host_platform_device_count" in os.environ.get(
                "XLA_FLAGS", ""):
            try:
                jax.config.update("jax_platforms", "cpu")
            except Exception:
                pass
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
        # reference column schema ('mean'/'action',
        # dataset_processing_counter_strike.py:90); the vendored writer
        # (data/mds.py) stands in when `streaming` is not installed
        mkey = "frames" if args.raw else "mean"
        columns = {mkey: "ndarray", "action": "ndarray"}
        try:
            from streaming import MDSWriter
            mds_writer = MDSWriter(out=args.out, compression="zstd",
                                   columns=columns)
        except ImportError:
            from autoregressive_diffusion_tpu.data import MDSShardWriter
            mds_writer = MDSShardWriter(args.out, columns,
                                        compression="zstd")

    for name, frames, actions in iter_clips(args):
        frames_pm1 = resize_frames_batch(frames, args.frame_size)
        if args.raw:
            data, key = (frames_pm1 * 127.5 + 127.5).astype(np.uint8), "frames"
        else:
            data, key = encode(frames_pm1), "latents"
            # actions are recorded per PIXEL frame; the latent stream is
            # time-compressed, so window alignment (cs_dataloading.py
            # clip windows index latents and actions together) needs one
            # action per latent frame -- the action at each group start
            # (exact for tc-aligned resampling, structured_clip)
            tc = max(1, len(actions) // max(1, len(data)))
            actions = np.asarray(actions)[::tc][:len(data)]
        if mds_writer is not None:
            mds_writer.write({("frames" if args.raw else "mean"): data,
                              "action": np.asarray(actions, np.int64)})
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
