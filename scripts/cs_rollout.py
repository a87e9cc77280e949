"""CS-scale rollout coherence check (round-5 learning proof).

Loads a cs_train.py checkpoint (Orbax train state; EMA weights), prefill's
context latents from a held-out clip of the MDS dataset, rolls out N frames
conditioned on the clip's ground-truth actions, and reports per-frame latent
MSE vs the true continuation AND vs the persistence baseline. If --vae is
given, decodes generated + truth to a side-by-side PNG strip.

The reference has no such artifact (its CS run never converged,
index.html "no flashy interactive demo"); this is the in-env counterpart
with VAE-encoded structured synthetic video (build_cs_dataset.py).
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
    ap.add_argument("--vae", default=None)
    ap.add_argument("--model-channels", type=int, default=128)
    ap.add_argument("--context", type=int, default=4)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--clips", type=int, default=2)
    ap.add_argument("--num-steps", type=int, default=32)
    ap.add_argument("--ema", type=int, default=0, help="EMA slot (0: std .05)")
    ap.add_argument("--lat-mean", type=float, default=0.0)
    ap.add_argument("--lat-std", type=float, default=1.0)
    ap.add_argument("--use-actions", action="store_true")
    ap.add_argument("--out", default="run_artifacts/cs_rollout")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from autoregressive_diffusion_tpu.data import streaming_dataset
    from autoregressive_diffusion_tpu.models import (Precond, UNetConfig,
                                                     init_cache)
    from autoregressive_diffusion_tpu.sampling.sampler import edm_sampler
    from autoregressive_diffusion_tpu.train import (create_train_state,
                                                    make_optimizer)
    from autoregressive_diffusion_tpu.utils import (latest_step,
                                                    restore_train_state)

    os.makedirs(args.out, exist_ok=True)
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
        jnp.zeros((1, 2), jnp.int32), mode="eval")
    # optimizer TEMPLATE must match cs_train's STRUCTURE (schedule-valued
    # LR -> ScaleByScheduleState; a scalar LR would restore-mismatch)
    state = create_train_state(
        model, variables,
        make_optimizer(learning_rate=lambda s: 1e-3, grad_clip=0.1,
                       eps=1e-4))
    step = latest_step(args.ckpt_dir)
    assert step is not None, f"no checkpoint under {args.ckpt_dir}"
    state, _ = restore_train_state(args.ckpt_dir, step, jax.device_get(state))
    # --ema -1: raw (non-averaged) params -- at only a few thousand steps
    # the power EMA still remembers early-training weights
    ema = (state.params if args.ema < 0 or not state.ema
           else state.ema[args.ema])
    ev = {"params": jax.tree.map(jnp.asarray, ema),
          "buffers": jax.tree.map(jnp.asarray, state.buffers)}
    print(f"# restored step {step}, weights: "
          f"{'raw' if args.ema < 0 else f'EMA slot {args.ema}'}")

    prefill = jax.jit(partial(model.apply, mode="eval", update_cache=True,
                              prefill_offset=0))
    sampler = jax.jit(
        partial(edm_sampler, model, num_steps=args.num_steps, sigma_max=80.0,
                sigma_min=0.4, rho=2.0, S_churn=0.0),
        static_argnames=("shape",))

    need = args.context + args.frames
    clips = []
    for item in streaming_dataset(None, args.mds, clip_size=need,
                                  shuffle=False):
        clips.append(item)
        if len(clips) >= args.clips:
            break
    assert clips, "dataset has no windows of the required length"

    key = jax.random.PRNGKey(0)
    all_mse, all_persist = [], []
    strip = None
    for ci, item in enumerate(clips):
        lat = (np.asarray(item["latents"], np.float32)
               - args.lat_mean) / args.lat_std
        z = jnp.asarray(lat)[None]
        acts = jnp.asarray(np.asarray(item.get("actions"))[None]
                           if item.get("actions") is not None
                           else np.zeros((1, need)), jnp.int32)
        ctx, gt = z[:, :args.context], z[:, args.context:]
        cache = init_cache(model, ev, 1)
        sig = jnp.full((1, args.context), 0.05)
        cond_ctx = acts[:, :args.context] if args.use_actions else None
        _, cache = prefill(ev, ctx, sig, cond_ctx, cache=cache)
        gen = []
        for i in range(args.frames):
            key, k = jax.random.split(key)
            cond = (acts[:, args.context + i:args.context + i + 1]
                    if args.use_actions else None)
            x, _, _, cache = sampler(ev, cache, k, shape=(1, 1, 32, 32, 8),
                                     conditioning=cond)
            gen.append(x)
        gen = jnp.concatenate(gen, axis=1)
        g, t = np.asarray(gen), np.asarray(gt)
        mse = ((g - t) ** 2).mean(axis=(0, 2, 3, 4))
        persist = ((np.asarray(ctx[:, -1:]) - t) ** 2).mean(axis=(0, 2, 3, 4))
        all_mse.append(mse)
        all_persist.append(persist)
        print(f"# clip {ci}: mse frame1={mse[0]:.4f} "
              f"frame{args.frames}={mse[-1]:.4f} "
              f"(persistence {persist[-1]:.4f}) "
              f"gen std={g.std():.3f} gt std={t.std():.3f}", flush=True)
        if ci == 0 and args.vae:
            from autoregressive_diffusion_tpu.models.vae import (
                VAE, VAEConfig, latents_to_frames)
            from autoregressive_diffusion_tpu.utils import load_model
            vk, vv = load_model(args.vae)
            vae = VAE(VAEConfig(**{k: tuple(v) if isinstance(v, list) else v
                                   for k, v in vk.items()}))
            lm = jnp.zeros((8,))
            ls = jnp.asarray(args.lat_std)
            dec = jax.jit(lambda zz: latents_to_frames(vae, vv, zz, lm, ls))
            px_g = np.asarray(dec(gen))[0]
            px_t = np.asarray(dec(gt))[0]
            sel = np.linspace(0, px_g.shape[0] - 1, 8).astype(int)
            strip = np.concatenate(
                [np.concatenate(list(px_g[sel]), axis=1),
                 np.concatenate(list(px_t[sel]), axis=1)], axis=0)

    mse = np.mean(all_mse, axis=0)
    persist = np.mean(all_persist, axis=0)
    np.savez(os.path.join(args.out, "cs_rollout.npz"), mse=mse,
             persistence=persist)
    if strip is not None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.figure(figsize=(16, 4))
        plt.imshow(np.clip(strip, 0, 255).astype(np.uint8))
        plt.axis("off")
        plt.title("CS-scale rollout: generated (top) vs ground truth "
                  "(bottom)")
        plt.savefig(os.path.join(args.out, "cs_rollout_strip.png"),
                    bbox_inches="tight", dpi=120)
    print(f"# mean: frame1={mse[0]:.4f} frame{args.frames}={mse[-1]:.4f} "
          f"persistence@{args.frames}={persist[-1]:.4f} -> "
          f"{'BEATS' if mse[-1] < persist[-1] else 'worse than'} persistence",
          flush=True)


if __name__ == "__main__":
    main()
