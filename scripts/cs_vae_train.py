"""Counter-Strike VAE training (Gaussian NLL + perceptual).

Mirrors /root/reference/cs_vae_train.py:25-135: VAE(channels=[3,32,128,512,8],
n_res_blocks=5, space [1,2,2,2] x time [1,2,2,1] -> 96x compression),
GaussianLoss + 0.1 * log-perceptual, warmup(100) + exponential decay to
0.4x, micro-batch accumulation, grad clip 0.5. Perceptual term: the exact
AlexNet-LPIPS architecture when AD_TPU_LPIPS_WEIGHTS points at torch
checkpoint files, otherwise the random-feature substitute
(train/perceptual.py; calibrated weights are not redistributable here).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10_000)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--micro-batch", type=int, default=1)
    ap.add_argument("--clip-size", type=int, default=32)
    ap.add_argument("--frame-size", type=int, default=256)
    ap.add_argument("--shards", default=None, help=".npz frame shards")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--ckpt-dir", default="saved_models_cs")
    ap.add_argument("--small", action="store_true",
                    help="tiny channels for smoke testing")
    ap.add_argument("--synthetic", action="store_true",
                    help="force synthetic frames (also the default when no --shards)")
    args = ap.parse_args()

    from autoregressive_diffusion_tpu.data import (LocalLatentShards,
                                                   batched_latents)
    from autoregressive_diffusion_tpu.models.vae import VAE, VAEConfig
    from autoregressive_diffusion_tpu.ops import gaussian_loss
    from autoregressive_diffusion_tpu.train.perceptual import \
        perceptual_loss
    from autoregressive_diffusion_tpu.utils import save_model

    # reference cs_vae_train.py:35-38
    if args.small:
        cfg = VAEConfig(channels=(3, 16, 32, 64, 8), n_res_blocks=1,
                        time_compressions=(1, 2, 2, 1),
                        spatial_compressions=(1, 2, 2, 2))
    else:
        cfg = VAEConfig(channels=(3, 32, 128, 512, 8), n_res_blocks=5,
                        time_compressions=(1, 2, 2, 1),
                        spatial_compressions=(1, 2, 2, 2))
    vae = VAE(cfg)
    x0 = jnp.zeros((1, 8, args.frame_size, args.frame_size, 3))
    variables = jax.jit(vae.init)(jax.random.PRNGKey(0), x0,
                                  key=jax.random.PRNGKey(1))
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    print(f"# VAE: {n_params/1e6:.2f}M params, "
          f"{cfg.time_compression * cfg.spatial_compression**2 * 3 // cfg.latent_channels}x compression")

    # warmup + exponential decay (reference cs_vae_train.py:60-76)
    warmup = 100
    gamma = 0.4 ** (1 / max(args.steps - warmup, 1))

    def sched(s):
        return args.lr * jnp.where(s < warmup, s / warmup,
                                   gamma ** (s - warmup))

    tx = optax.chain(optax.clip_by_global_norm(0.5),
                     optax.adamw(sched, eps=1e-8))
    params = variables["params"]
    opt_state = tx.init(params)

    def loss_fn(p, frames, key):
        v = dict(variables, params=p)
        r_mean, r_logvar, _ = vae.apply(v, frames, key=key)
        g = gaussian_loss(r_mean, r_logvar, frames)
        perc = perceptual_loss(r_mean, frames)
        return g + 0.1 * perc, dict(gaussian=g, perceptual=perc,
                                    l1=jnp.mean(jnp.abs(r_mean - frames)))

    @jax.jit
    def step(p, opt_state, frames, key):
        (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(p, frames, key)
        upd, opt_state = tx.update(g, opt_state, p)
        return optax.apply_updates(p, upd), opt_state, l, aux

    if args.shards:
        ds = LocalLatentShards(args.shards, clip_size=args.clip_size,
                               key="frames")
        loader = batched_latents(ds, args.batch)
        get = lambda item: jnp.asarray(item["frames"]) / 127.5 - 1
    else:
        print("# synthetic frames (smoke mode)")
        from autoregressive_diffusion_tpu.data import SyntheticVideoGenerator
        def synth():
            # infinite: re-create the finite generator on exhaustion (the
            # loop pulls one batch past args.steps before breaking)
            epoch = 0
            while True:
                gen = iter(SyntheticVideoGenerator(
                    args.clip_size, args.frame_size, 4, 4,
                    max(args.batch, 64), seed=epoch))
                try:
                    while True:
                        yield {"frames": np.stack(
                            [next(gen)[0] for _ in range(args.batch)])}
                except StopIteration:
                    epoch += 1
        loader = synth()
        get = lambda item: jnp.asarray(item["frames"], jnp.float32) / 127.5 - 1

    key = jax.random.PRNGKey(2)
    t0 = time.time()
    for i, item in enumerate(loader):
        if i >= args.steps:
            break
        frames = get(item)
        key, k = jax.random.split(key)
        params, opt_state, l, aux = step(params, opt_state, frames, k)
        if i % 20 == 0:
            print(f"step {i}: gaussian={float(aux['gaussian']):.4f} "
                  f"l1={float(aux['l1']):.4f} perc={float(aux['perceptual']):.3f} "
                  f"({args.batch*(i+1)/(time.time()-t0):.2f} clips/s)", flush=True)
        if i % 1000 == 0 and i > 0:
            save_model(os.path.join(args.ckpt_dir, "vae_cs.ad"),
                       dict(cfg.__dict__),
                       {**variables, "params": jax.device_get(params)})
            print("# saved VAE checkpoint")


if __name__ == "__main__":
    main()
