"""Autoregressive inference demo + per-frame latency micro-benchmark.

Mirrors /root/reference/generation_code.py: encode context frames at
sigma=0.05 prefill with cache update, roll out frames with the EDM sampler
(sigma_max 80, ~64 steps), decode through the VAE to a tiled PNG, and time
the cached single-frame denoiser forward (the O(1)-per-frame claim,
generation_code.py:87-88 -- which never printed its result; we do).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--unet", default=None, help="UNet kwargs-bundle ckpt")
    ap.add_argument("--vae", default=None)
    ap.add_argument("--context-frames", type=int, default=6)
    ap.add_argument("--gen-frames", type=int, default=6)
    ap.add_argument("--num-steps", type=int, default=64)
    ap.add_argument("--sigma-max", type=float, default=80.0)
    ap.add_argument("--rho", type=float, default=2.0)
    ap.add_argument("--guidance", type=float, default=1.0)
    ap.add_argument("--out", default="images_training/generated.png")
    ap.add_argument("--bench-iters", type=int, default=100)
    ap.add_argument("--reprime-frames", type=int, default=2,
                    help="observed frames fed into the warm cache after the "
                         "rollout (exercises the static prefill_offset "
                         "warm-prefill path; 0 disables)")
    args = ap.parse_args()

    from autoregressive_diffusion_tpu.models import (Precond, UNetConfig,
                                                     init_cache)
    from autoregressive_diffusion_tpu.sampling import edm_sampler, generate
    from autoregressive_diffusion_tpu.utils import load_model

    if args.unet:
        kwargs, variables = load_model(args.unet)
        cfg = UNetConfig(**{k: tuple(v) if isinstance(v, list) else v
                            for k, v in kwargs.items()})
    else:
        print("# no --unet: random-weight demo config")
        cfg = UNetConfig(img_resolution=64, img_channels=8, label_dim=4,
                         model_channels=32, channel_mult=(1, 2, 4, 8),
                         num_blocks=2, video_attn_resolutions=(8,),
                         frame_attn_resolutions=(16,), max_frames=64)
        model = Precond(cfg, sigma_data=1.0)
        x0 = jnp.zeros((1, 1, cfg.img_resolution, cfg.img_resolution,
                        cfg.img_channels))
        variables = jax.jit(model.init, static_argnames=("mode",))(
            jax.random.PRNGKey(0), x0, jnp.ones((1, 1)),
            jnp.zeros((1, 1), jnp.int32), mode="eval")
    model = Precond(cfg, sigma_data=1.0)
    b = 1
    res, ch = cfg.img_resolution, cfg.img_channels

    # prefill context (reference generation_code.py:44-53)
    cache = init_cache(model, variables, b, with_conditioning=True)
    context = jax.random.normal(jax.random.PRNGKey(1),
                                (b, args.context_frames, res, res, ch))
    sigma = jnp.full((b, args.context_frames), 0.05)
    cond = jnp.zeros((b, args.context_frames), jnp.int32)
    # prefill_offset is a STATIC hint (one compile per offset bucket) that
    # routes prefill through the splash kernel instead of the dense
    # (t*hw)x(f*hw) fallback; the fresh cache starts at frame 0
    prefill = jax.jit(lambda v, x, s, c, ca, off=0: model.apply(
        v, x, s, c, cache=ca, update_cache=True, mode="eval",
        prefill_offset=off), static_argnames=("off",))
    _, cache = prefill(variables, context, sigma, cond, cache)
    print(f"# prefilled {args.context_frames} context frames")

    # O(1)-per-frame micro-benchmark: cached single-frame denoiser forward
    dec = jax.jit(lambda v, x, s, c, ca: model.apply(
        v, x, s, c, cache=ca, mode="eval")[0])
    x1 = jax.random.normal(jax.random.PRNGKey(2), (b, 1, res, res, ch))
    s1 = jnp.full((b, 1), 1.0)
    c1 = jnp.zeros((b, 1), jnp.int32)
    y = dec(variables, x1, s1, c1, cache)
    float(y.sum())

    def timed(iters):
        # chain calls (output feeds input) and force a host fetch so async
        # runtimes cannot return early; see bench.py timing notes
        yy = x1
        t0 = time.perf_counter()
        for _ in range(iters):
            yy = dec(variables, yy, s1, c1, cache)
        float(yy.sum())
        return time.perf_counter() - t0

    timed(2)
    t_short = timed(max(args.bench_iters // 10, 1))
    t_long = timed(args.bench_iters)
    per_call = (t_long - t_short) / (args.bench_iters -
                                     max(args.bench_iters // 10, 1))
    print(f"# cached denoiser forward: {per_call*1e3:.2f} ms/call "
          f"({1/per_call:.1f} calls/s)")

    # autoregressive rollout (reference generation_code.py:92-95)
    frames, cache = generate(model, variables, cache, jax.random.PRNGKey(3),
                             n_frames=args.gen_frames,
                             shape=(b, 1, res, res, ch),
                             conditioning=c1, num_steps=args.num_steps,
                             sigma_max=args.sigma_max, sigma_min=0.4,
                             rho=args.rho, guidance=args.guidance)
    print(f"# generated {args.gen_frames} frames; latent stats "
          f"mean={float(frames.mean()):.3f} std={float(frames.std()):.3f}")

    # warm-cache re-prime: feed more observed context into the ALREADY-WARM
    # cache (e.g. a world model receiving new real frames mid-rollout). The
    # frame counter here is statically known (context + generated), so the
    # static prefill_offset hint routes this through the splash prefill
    # kernel rather than the dense fallback (models/attention.py).
    if args.reprime_frames > 0:
        off = args.context_frames + args.gen_frames
        obs = jax.random.normal(jax.random.PRNGKey(4),
                                (b, args.reprime_frames, res, res, ch))
        sig_r = jnp.full((b, args.reprime_frames), 0.05)
        cond_r = jnp.zeros((b, args.reprime_frames), jnp.int32)
        _, cache = prefill(variables, obs, sig_r, cond_r, cache, off=off)
        print(f"# re-primed {args.reprime_frames} frames at warm offset "
              f"{off} (cache frames: {int(cache['frames'])})")
    per_frame = args.num_steps * 2 * per_call
    print(f"# est. rollout cost: {per_frame:.2f} s/frame "
          f"({args.num_steps} steps x 2 denoiser calls)")

    if args.vae:
        from autoregressive_diffusion_tpu.models.vae import (VAE, VAEConfig,
                                                             latents_to_frames)
        vk, vv = load_model(args.vae)
        vae = VAE(VAEConfig(**{k: tuple(v) if isinstance(v, list) else v
                               for k, v in vk.items()}))
        pix = latents_to_frames(vae, vv, frames, 0.0, 1.0)
        from autoregressive_diffusion_tpu.utils.plotting import \
            plot_training_dashboard
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        tile = np.concatenate(list(np.asarray(pix[0])), axis=1)
        plt.imsave(args.out, tile)
        print(f"# wrote {args.out}")


if __name__ == "__main__":
    main()
