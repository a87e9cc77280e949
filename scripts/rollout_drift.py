"""Rollout-stability metric: quantify long-horizon autoregressive drift.

The reference claims O(1)-per-frame inference enables unbounded-length
rollouts (/root/reference/README.md:105,126) but never measures rollout
quality beyond the 8-frame dashboard tiles. This tool generates >=32 latent
frames from a trained checkpoint, conditioned on the GROUND-TRUTH action
sequence of a recorded episode, and reports per-frame:

  * latent MSE vs the ground-truth continuation (trajectory divergence --
    expected to grow with horizon in a chaotic env even for a perfect
    model, so it is reported against the PERSISTENCE baseline: repeating
    the last context frame);
  * generated-latent per-frame std vs ground truth (magnitude stability:
    an exploding/collapsing world model shows here long before MSE does);
  * pixel MSE of the decoded frames.

Outputs a curve PNG + an .npz of the raw series under --out, and a tiled
strip of decoded generated-vs-truth frames.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def collect_long_episode(env_name, n_pixel_frames, tc, seed_start,
                         frame_size=256, warmup=10, max_probe=20000,
                         policy="heuristic"):
    """Return (frames [n_pixel_frames,S,S,3] uint8, actions [n_latent] int64,
    next_seed) from ONE uninterrupted episode of >= warmup + 2*n_pixel_frames
    env steps.

    policy='heuristic': actions from gymnasium's built-in LunarLander
    controller, held for tc*frame_interval env steps (matching the
    training conditioning cadence, data/gym_data.py) -- OUT of the training
    action distribution (trained on random actions) but able to survive long
    horizons. policy='random': uniform random actions at the same cadence --
    IN distribution, but random episodes average ~92 env steps, so only
    short horizons are obtainable (drift v2 compares the two regimes to
    separate conditioning shift from model drift). Episodes are first probed
    WITHOUT rendering (Box2D physics is deterministic given the reset seed +
    action sequence, ~100x cheaper than rgb_array rendering) and only a
    surviving seed is replayed with rendering."""
    import gymnasium as gym
    from gymnasium.envs.box2d.lunar_lander import heuristic

    from autoregressive_diffusion_tpu.data.gym_data import resize_frame

    frame_interval = 2
    hold = tc * frame_interval  # env steps per latent frame
    # step counter runs -(warmup-1)..need_steps like the reference's
    # step_count (gym_dataloader.py:40-92, which resets at -warmup and takes
    # its first env step at -warmup+1): capture at n>=0, n%2==0; action
    # resampled when n % hold == 0 (python mod aligns negatives)
    need_steps = n_pixel_frames * frame_interval

    probe_env = gym.make(env_name)
    actions = None
    seed = seed_start
    for seed in range(seed_start, seed_start + max_probe):
        s, _ = probe_env.reset(seed=seed)
        rng = np.random.default_rng(seed)
        acts, n, done, a = [], -(warmup - 1), False, 0
        while not done and n < need_steps:
            if n % hold == 0:
                a = (int(rng.integers(probe_env.action_space.n))
                     if policy == "random"
                     else int(heuristic(probe_env.unwrapped, s)))
                acts.append(a)
            s, _, term, trunc, _ = probe_env.step(a)
            done = term or trunc
            n += 1
        if n >= need_steps:
            actions = acts
            break
    probe_env.close()
    if actions is None:
        raise RuntimeError(f"no {policy} episode surviving "
                           f"{need_steps + warmup - 1} steps in "
                           f"{max_probe} probes")

    env = gym.make(env_name, render_mode="rgb_array")
    env.reset(seed=seed)
    frames, latent_actions = [], []
    action_iter = iter(actions)
    n, a = -(warmup - 1), 0
    while n < need_steps:
        if n % hold == 0:
            a = next(action_iter)
            if n >= 0:
                latent_actions.append(a)
        _, _, term, trunc, _ = env.step(a)
        # the probe promised survival; nondeterminism (gym version change,
        # wind) would silently collect post-crash frames as ground truth
        assert not (term or trunc) or n >= need_steps - 1, (
            f"episode ended at replay step {n} but probe survived")
        if n >= 0 and n % frame_interval == 0:
            frames.append(resize_frame(env.render(), frame_size))
        n += 1
    env.close()
    assert len(frames) == n_pixel_frames, (len(frames), n_pixel_frames)
    assert len(latent_actions) == n_pixel_frames // tc
    return (np.stack(frames), np.asarray(latent_actions, np.int64), seed + 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--unet", required=True, help="UNet kwargs-bundle ckpt")
    ap.add_argument("--vae", required=True, help="VAE kwargs-bundle ckpt")
    ap.add_argument("--vae-std", type=float, default=1.45)
    ap.add_argument("--context", type=int, default=4, help="latent ctx frames")
    ap.add_argument("--frames", type=int, default=32,
                    help="generated latent frames (>=32 for the stability claim)")
    ap.add_argument("--episodes", type=int, default=3)
    ap.add_argument("--num-steps", type=int, default=32, help="sampler NFE/2")
    ap.add_argument("--env", default="LunarLander-v3")
    ap.add_argument("--out", default="run_artifacts/rollout_drift")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--policy", choices=("heuristic", "random"),
                    default="heuristic",
                    help="ground-truth action source: 'heuristic' survives "
                         "long horizons but is out of the (random-action) "
                         "training distribution; 'random' matches training "
                         "but only short episodes survive")
    # sampler knobs (drift sweep, VERDICT r4 #3). Defaults keep the r4
    # protocol; the reference's own rollout recipe is sigma_min=0.4, rho=2,
    # num_steps=64, S_churn=0, guidance=1 (generation_code.py:94)
    ap.add_argument("--guidance", type=float, default=1.0)
    ap.add_argument("--s-churn", type=float, default=20.0)
    ap.add_argument("--sigma-max", type=float, default=80.0)
    ap.add_argument("--sigma-min", type=float, default=0.002)
    ap.add_argument("--rho", type=float, default=7.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from autoregressive_diffusion_tpu.models import Precond, UNetConfig
    from autoregressive_diffusion_tpu.models.cache import init_cache
    from autoregressive_diffusion_tpu.models.vae import (VAE, VAEConfig,
                                                         frames_to_latents,
                                                         latents_to_frames)
    from autoregressive_diffusion_tpu.sampling.sampler import edm_sampler
    from autoregressive_diffusion_tpu.utils import load_model

    os.makedirs(args.out, exist_ok=True)

    vae_kwargs, vae_vars = load_model(args.vae)
    vae_cfg = VAEConfig(**{k: tuple(v) if isinstance(v, list) else v
                           for k, v in vae_kwargs.items()})
    vae = VAE(vae_cfg)
    lat_mean = jnp.zeros((vae_cfg.latent_channels,))
    lat_std = jnp.asarray(args.vae_std)

    unet_kwargs, unet_vars = load_model(args.unet)
    cfg = UNetConfig(**{k: tuple(v) if isinstance(v, list) else v
                        for k, v in unet_kwargs.items()})
    # the KV cache is a ring (sliding window of cfg.max_frames frames), so
    # rollouts of any length run on the checkpoint's own config
    model = Precond(cfg, sigma_data=1.0, body_dtype=jnp.bfloat16)

    tc = vae_cfg.time_compression
    state_size = (args.context + args.frames) * tc  # pixel frames needed

    encode = jax.jit(lambda f: frames_to_latents(vae, vae_vars, f,
                                                 lat_mean, lat_std))
    decode = jax.jit(lambda z: latents_to_frames(vae, vae_vars, z,
                                                 lat_mean, lat_std))
    prefill = jax.jit(partial(model.apply, mode="eval", update_cache=True,
                              prefill_offset=0))
    sampler = jax.jit(
        partial(edm_sampler, model, num_steps=args.num_steps,
                sigma_max=args.sigma_max, sigma_min=args.sigma_min,
                rho=args.rho, S_churn=args.s_churn, guidance=args.guidance),
        static_argnames=("shape",))

    key = jax.random.PRNGKey(args.seed)
    all_mse, all_pmse, all_std, all_gt_std, all_persist = [], [], [], [], []
    strips = None
    next_seed = args.seed
    for ep in range(args.episodes):
        frames, actions, next_seed = collect_long_episode(
            args.env, state_size, tc, next_seed, policy=args.policy)
        print(f"# episode {ep}: collected {len(frames)} frames "
              f"(probe seed {next_seed - 1})", flush=True)
        z = encode(jnp.asarray(frames, jnp.float32)[None])  # (1, T, h, w, c)
        acts = jnp.asarray(actions, jnp.int32)[None]        # (1, T)
        ctx, gt = z[:, :args.context], z[:, args.context:]
        b, _, h, w, c = z.shape
        cache = init_cache(model, unet_vars, batch_size=b)
        sig = jnp.full((b, args.context), 0.05, jnp.float32)
        _, cache = prefill(unet_vars, ctx, sig, acts[:, :args.context],
                           cache=cache)
        gen_frames = []
        for i in range(args.frames):
            key, k = jax.random.split(key)
            cond = acts[:, args.context + i:args.context + i + 1]
            x, _, _, cache = sampler(unet_vars, cache, k,
                                     shape=(b, 1, h, w, c),
                                     conditioning=cond)
            gen_frames.append(x)
        gen_lat = jnp.concatenate(gen_frames, axis=1)      # (1, F, h, w, c)

        gt_np = np.asarray(gt)
        gen_np = np.asarray(gen_lat)
        last_ctx = np.asarray(ctx[:, -1:])
        all_mse.append(((gen_np - gt_np) ** 2).mean(axis=(0, 2, 3, 4)))
        all_persist.append(((last_ctx - gt_np) ** 2).mean(axis=(0, 2, 3, 4)))
        all_std.append(gen_np.std(axis=(0, 2, 3, 4)))
        all_gt_std.append(gt_np.std(axis=(0, 2, 3, 4)))
        px_gen = np.asarray(decode(gen_lat))
        px_gt = np.asarray(decode(gt))
        per_px_frame = (
            ((px_gen.astype(np.float32) - px_gt.astype(np.float32)) ** 2)
            .mean(axis=(0, 2, 3, 4)) / 255.0 ** 2)
        # decoded video has time_compression x the latent frame count;
        # aggregate per latent frame so every curve shares one x axis
        all_pmse.append(per_px_frame.reshape(args.frames, -1).mean(axis=1))
        if strips is None:  # first episode: save a visual strip
            sel = np.linspace(0, px_gen.shape[1] - 1, 8).astype(int)
            strips = (px_gen[0][sel], px_gt[0][sel])
        print(f"# episode {ep}: latent MSE frame0={all_mse[-1][0]:.4f} "
              f"frame{args.frames-1}={all_mse[-1][-1]:.4f}", flush=True)

    mse = np.mean(all_mse, axis=0)
    persist = np.mean(all_persist, axis=0)
    pmse = np.mean(all_pmse, axis=0)
    std = np.mean(all_std, axis=0)
    gt_std = np.mean(all_gt_std, axis=0)
    np.savez(os.path.join(args.out, "drift.npz"), latent_mse=mse,
             persistence_mse=persist, pixel_mse=pmse, gen_std=std,
             gt_std=gt_std)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    f = np.arange(1, args.frames + 1)
    axes[0].plot(f, mse, label="generated vs truth")
    axes[0].plot(f, persist, "--", label="persistence baseline")
    axes[0].set(xlabel="generated frame", ylabel="latent MSE",
                title="Trajectory divergence")
    axes[0].legend()
    axes[1].plot(f, std, label="generated")
    axes[1].plot(f, gt_std, "--", label="ground truth")
    axes[1].set(xlabel="generated frame", ylabel="latent std",
                title="Magnitude stability (flat = stable)")
    axes[1].legend()
    axes[2].plot(f, pmse)
    axes[2].set(xlabel="generated frame", ylabel="pixel MSE (norm.)",
                title="Decoded-pixel divergence")
    for ax in axes:
        ax.grid(alpha=0.3)
    fig.suptitle(f"AR rollout drift ({args.policy} actions): "
                 f"{args.frames} frames, {args.episodes} episodes, "
                 f"ctx {args.context}")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "drift_curves.png"), dpi=120)

    g, t = strips
    rows = [np.concatenate(list(g), axis=1), np.concatenate(list(t), axis=1)]
    strip = np.concatenate(rows, axis=0).astype(np.uint8)
    plt.figure(figsize=(16, 4))
    plt.imshow(strip)
    plt.axis("off")
    plt.title("top: generated (frames 1..N sampled), bottom: ground truth")
    plt.savefig(os.path.join(args.out, "drift_strip.png"), dpi=120,
                bbox_inches="tight")
    print(f"# wrote {args.out}/drift_curves.png, drift_strip.png, drift.npz")
    # 0-based frame indexing, matching the per-episode lines above
    print(f"# [{args.policy}] latent MSE frame0={mse[0]:.4f} "
          f"frame{args.frames-1}={mse[-1]:.4f} "
          f"(persistence {persist[-1]:.4f}); "
          f"std drift {std[-1]/max(gt_std[-1],1e-8):.3f}x truth")


if __name__ == "__main__":
    main()
