"""Scrambled-context probe: does a trained world model actually USE context?

Compares train-mode EDM2 loss on real clips against clips whose temporal
coherence is destroyed -- for each frame index i, the batch assignment is
independently permuted, so every "clip" becomes a sequence of frames drawn
from DIFFERENT clips (per-frame marginals identical, temporal signal gone;
actions travel with their frame). A context-free single-frame denoiser
scores the same on both; a model that exploits the DART context scores
markedly worse on the scrambled batch.

This is the 2-minute test that exposed the first CS synthetic dataset
(round 5: loss identical under shuffling -> the 310M model had learned pure
single-frame denoising because the temporal signal lived in ~1% of pixels).
The reference has no such tool; its CS run's learning was never validated
(index.html "no flashy interactive demo").

Usage:
  python tools/context_probe.py --ckpt-dir /tmp/cs_pan_ckpt \
      --mds /tmp/cs_pan_mds --use-actions [--batches 4] [--cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--mds", required=True)
    ap.add_argument("--model-channels", type=int, default=128)
    ap.add_argument("--clip-size", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--lat-mean", type=float, default=0.0)
    ap.add_argument("--lat-std", type=float, default=1.0)
    ap.add_argument("--use-actions", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (leave the chip claim alone)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from autoregressive_diffusion_tpu.data import streaming_dataset
    from autoregressive_diffusion_tpu.models import Precond, UNetConfig
    from autoregressive_diffusion_tpu.train import (EDM2LossConfig,
                                                    create_train_state,
                                                    edm2_loss, make_optimizer)
    from autoregressive_diffusion_tpu.utils import (latest_step,
                                                    restore_train_state)

    # the cs_train.py config (knob-for-knob, cs_train.py docstring)
    cfg = UNetConfig(img_resolution=32, img_channels=8, label_dim=4,
                     model_channels=args.model_channels,
                     channel_mult=(1, 2, 4, 4), num_blocks=2,
                     video_attn_resolutions=(4,), frame_attn_resolutions=(8,),
                     max_frames=64)
    model = Precond(cfg, sigma_data=1.0, body_dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 2, 32, 32, 8))
    variables = jax.jit(model.init, static_argnames=("mode",))(
        jax.random.PRNGKey(0), x0, jnp.ones((1, 2)),
        jnp.zeros((1, 2), jnp.int32), mode="train")
    state = create_train_state(
        model, variables,
        make_optimizer(learning_rate=lambda s: 1e-3, grad_clip=0.1,
                       eps=1e-4))
    step = latest_step(args.ckpt_dir)
    assert step is not None, f"no checkpoint under {args.ckpt_dir}"
    state, _ = restore_train_state(args.ckpt_dir, step, jax.device_get(state))
    ev = {"params": jax.tree.map(jnp.asarray, state.params),
          "buffers": jax.tree.map(jnp.asarray, state.buffers)}
    print(f"# restored step {step} from {args.ckpt_dir}")

    loss_cfg = EDM2LossConfig(P_mean=0.9, P_std=1.0, sigma_data=1.0,
                              context_noise_reduction=0.1)

    @jax.jit
    def loss_of(images, cond, key):
        out, aux = edm2_loss(model, ev, images, key, loss_cfg,
                             conditioning=cond)
        return aux["unweighted"]

    b, t = args.batch, args.clip_size
    wins = []
    for item in streaming_dataset(None, args.mds, clip_size=t, shuffle=True):
        wins.append(item)
        if len(wins) >= b * args.batches:
            break
    assert len(wins) >= b, "dataset too small for one probe batch"

    rng = np.random.default_rng(0)
    real_losses, scram_losses = [], []
    for bi in range(len(wins) // b):
        chunk = wins[bi * b:(bi + 1) * b]
        lat = np.stack([(np.asarray(w["latents"], np.float32)
                         - args.lat_mean) / args.lat_std for w in chunk])
        act = np.stack([np.asarray(w["actions"] if w.get("actions") is not
                                   None else np.zeros(t)) for w in chunk])
        # scramble: independent batch permutation per frame index --
        # marginals preserved, temporal coherence destroyed; the action
        # travels with its frame
        slat, sact = lat.copy(), act.copy()
        for i in range(t):
            perm = rng.permutation(b)
            slat[:, i], sact[:, i] = lat[perm, i], act[perm, i]
        cond = jnp.asarray(act, jnp.int32) if args.use_actions else None
        scond = jnp.asarray(sact, jnp.int32) if args.use_actions else None
        key = jax.random.PRNGKey(bi)  # paired sigma/noise draws
        lr = float(loss_of(jnp.asarray(lat), cond, key))
        ls = float(loss_of(jnp.asarray(slat), scond, key))
        real_losses.append(lr)
        scram_losses.append(ls)
        print(f"# batch {bi}: real={lr:.4f} scrambled={ls:.4f}", flush=True)

    mr, ms = np.mean(real_losses), np.mean(scram_losses)
    print(f"# probe: real={mr:.4f} scrambled={ms:.4f} "
          f"ratio={ms / mr:.3f}x "
          f"({'USES context' if ms > 1.05 * mr else 'context-FREE'})")


if __name__ == "__main__":
    main()
