"""Counter-Strike VAE with GAN finetuning.

Mirrors /root/reference/cs_vae_adversarial.py:26-273: GaussianLoss + 0.1 *
log-perceptual + 0.1 * adversarial, with the MixedDiscriminator trained in
alternation on (frames||recon)-vs-(recon||frames) channel stacks.
Perceptual term: exact AlexNet-LPIPS with AD_TPU_LPIPS_WEIGHTS set,
random-feature substitute otherwise (train/perceptual.py).
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
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--clip-size", type=int, default=16)
    ap.add_argument("--frame-size", type=int, default=256)
    ap.add_argument("--shards", default=None)
    ap.add_argument("--vae", default=None, help="resume from cs_vae_train ckpt")
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--adv-weight", type=float, default=0.1)
    ap.add_argument("--ckpt-dir", default="saved_models_cs")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--synthetic", action="store_true",
                    help="force synthetic frames (also the default when no --shards)")
    args = ap.parse_args()

    from autoregressive_diffusion_tpu.data import (LocalLatentShards,
                                                   batched_latents,
                                                   SyntheticVideoGenerator)
    from autoregressive_diffusion_tpu.models.discriminator import (
        MixedDiscriminator, discriminator_loss, vae_adversarial_loss)
    from autoregressive_diffusion_tpu.models.vae import VAE, VAEConfig
    from autoregressive_diffusion_tpu.ops import gaussian_loss
    from autoregressive_diffusion_tpu.train.perceptual import \
        perceptual_loss
    from autoregressive_diffusion_tpu.utils import load_model, save_model

    if args.vae:
        kwargs, vae_vars = load_model(args.vae)
        cfg = VAEConfig(**{k: tuple(v) if isinstance(v, list) else v
                           for k, v in kwargs.items()})
        vae = VAE(cfg)
    else:
        cfg = VAEConfig(channels=(3, 16, 32, 64, 8) if args.small
                        else (3, 32, 128, 512, 8),
                        n_res_blocks=1 if args.small else 5,
                        time_compressions=(1, 2, 2, 1),
                        spatial_compressions=(1, 2, 2, 2))
        vae = VAE(cfg)
        vae_vars = jax.jit(vae.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, args.frame_size, args.frame_size, 3)),
            key=jax.random.PRNGKey(1))

    disc = MixedDiscriminator()
    disc_vars = jax.jit(disc.init)(
        jax.random.PRNGKey(2),
        jnp.zeros((1, 8, args.frame_size, args.frame_size, 6)))

    tx_vae = optax.chain(optax.clip_by_global_norm(0.5),
                         optax.adamw(args.lr, eps=1e-8))
    tx_disc = optax.chain(optax.clip_by_global_norm(1.0),
                          optax.adamw(args.lr, eps=1e-8))
    vp, dp = vae_vars["params"], disc_vars["params"]
    opt_v, opt_d = tx_vae.init(vp), tx_disc.init(dp)
    dvars = disc_vars

    def vae_loss_fn(p, dvars, frames, key):
        v = dict(vae_vars, params=p)
        r_mean, r_logvar, _ = vae.apply(v, frames, key=key)
        g = gaussian_loss(r_mean, r_logvar, frames)
        perc = perceptual_loss(r_mean, frames)
        adv, _ = vae_adversarial_loss(disc, dvars, frames, r_mean, train=False)
        loss = g + 0.1 * perc + args.adv_weight * adv
        return loss, dict(gaussian=g, perceptual=perc, adv=adv, recon=r_mean)

    @jax.jit
    def step(vp, opt_v, dp, opt_d, dvars, frames, key):
        (l, aux), gv = jax.value_and_grad(vae_loss_fn, has_aux=True)(
            vp, dict(dvars, params=dp), frames, key)
        upd, opt_v = tx_vae.update(gv, opt_v, vp)
        vp = optax.apply_updates(vp, upd)

        recon = jax.lax.stop_gradient(aux.pop("recon"))

        def d_loss(p):
            loss, mutated = discriminator_loss(
                disc, dict(dvars, params=p), frames, recon, train=True)
            return loss, mutated
        (dl, mutated), gd = jax.value_and_grad(d_loss, has_aux=True)(dp)
        upd_d, opt_d = tx_disc.update(gd, opt_d, dp)
        dp = optax.apply_updates(dp, upd_d)
        return vp, opt_v, dp, opt_d, dict(dvars, params=dp, **mutated), l, aux, dl

    if args.shards:
        ds = LocalLatentShards(args.shards, clip_size=args.clip_size,
                               key="frames")
        loader = batched_latents(ds, args.batch)
    else:
        print("# synthetic frames (smoke mode)")
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

    key = jax.random.PRNGKey(3)
    t0 = time.time()
    for i, item in enumerate(loader):
        if i >= args.steps:
            break
        frames = jnp.asarray(item["frames"], jnp.float32) / 127.5 - 1
        key, k = jax.random.split(key)
        vp, opt_v, dp, opt_d, dvars, l, aux, dl = step(
            vp, opt_v, dp, opt_d, dvars, frames, k)
        if i % 20 == 0:
            print(f"step {i}: gaussian={float(aux['gaussian']):.4f} "
                  f"perc={float(aux['perceptual']):.3f} adv={float(aux['adv']):.3f} "
                  f"disc={float(dl):.3f} "
                  f"({args.batch*(i+1)/(time.time()-t0):.2f} clips/s)", flush=True)
        if i % 1000 == 0 and i > 0:
            save_model(os.path.join(args.ckpt_dir, "vae_cs_adversarial.ad"),
                       dict(cfg.__dict__),
                       {**vae_vars, "params": jax.device_get(vp)})
            print("# saved VAE checkpoint")


if __name__ == "__main__":
    main()
