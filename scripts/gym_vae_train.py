"""LunarLander VAE + adversarial discriminator training.

Mirrors /root/reference/gym_vae_train.py:21-118: VAE(channels=[3,8,8,8],
n_res_blocks=2, spatial=[1,2,2]), losses = worst-0.2%-pixel MSE + group-KL
* 1e-3 + hinged adversarial (2e-5 * relu(CE-1)^2), dual AdamW (disc lr
* 8e-2) with exponential decay to 0.1x over the run, grad clip 1.0.

Divergence note: the reference script is stale w.r.t. its own VAE (it
unpacks (recon, mean, logvar, _) but vae.py returns (r_mean, r_logvar,
mean, cache), gym_vae_train.py:18-19 imports a removed symbol). This script
implements the intended training against the CURRENT VAE API: the group-KL
regularizes the latent mean statistics toward N(0,1); there is no per-sample
latent logvar in the noise-augmented-decode VAE.
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
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--state-size", type=int, default=32)
    ap.add_argument("--env", default="LunarLander-v3")
    ap.add_argument("--frame-size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--ckpt-dir", default="saved_models")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--out-dir", default="images_training")
    ap.add_argument("--replay", type=int, default=0, metavar="CAPACITY",
                    help="replay-buffer capacity in clips (0 = stream fresh; "
                         "see data/replay.py)")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the VAE/discriminator applies: "
                         "recompute activations in the backward pass so the "
                         "reference batch=4 fits HBM at 256px (the "
                         "both-orders adversarial pass doubles activation "
                         "memory)")
    args = ap.parse_args()

    from autoregressive_diffusion_tpu.data import (GymDataGenerator,
                                                   ReplayLoader,
                                                   SyntheticVideoGenerator,
                                                   batched)
    from autoregressive_diffusion_tpu.models.discriminator import \
        MixedDiscriminator
    from autoregressive_diffusion_tpu.models.vae import (VAE, VAEConfig,
                                                         worst_k_percent_loss)
    from autoregressive_diffusion_tpu.utils import save_model

    vae_cfg = VAEConfig(channels=(3, 8, 8, 8), n_res_blocks=2,
                        time_compressions=(1, 2, 2),
                        spatial_compressions=(1, 2, 2))
    vae = VAE(vae_cfg)
    disc = MixedDiscriminator()
    vae_apply = vae.apply
    disc_apply = disc.apply
    if args.remat:
        vae_apply = jax.checkpoint(
            lambda v, f, key=None: vae.apply(v, f, key=key),
            static_argnums=())
        disc_apply = jax.checkpoint(disc.apply, static_argnums=(2,))

    t = args.state_size
    x0 = jnp.zeros((1, 8, args.frame_size, args.frame_size, 3))
    vae_vars = jax.jit(vae.init)(jax.random.PRNGKey(0), x0,
                                 key=jax.random.PRNGKey(1))
    # discriminator input is the 6-channel (frames || recon) concat
    # (reference discriminator.py:304-329)
    disc_vars = jax.jit(disc.init)(jax.random.PRNGKey(2),
                                   jnp.zeros((1, 8, args.frame_size,
                                              args.frame_size, 6)))
    print(f"# VAE params: "
          f"{sum(p.size for p in jax.tree.leaves(vae_vars['params']))/1e3:.0f}K")

    gamma = 0.1 ** (1 / args.steps)  # decay to 0.1x (reference :58)
    sched = lambda lr0: (lambda s: lr0 * gamma**s)
    tx_vae = optax.chain(optax.clip_by_global_norm(1.0),
                         optax.adamw(sched(args.lr), eps=1e-8))
    tx_disc = optax.chain(optax.clip_by_global_norm(1.0),
                          optax.adamw(sched(args.lr * 8e-2), eps=1e-8))
    opt_vae = tx_vae.init(vae_vars["params"])
    opt_disc = tx_disc.init(disc_vars["params"])

    def vae_loss_fn(vp, dv, frames, key):
        variables = dict(vae_vars, params=vp)
        r_mean, r_logvar, mean = vae_apply(variables, frames, key=key)
        recon = worst_k_percent_loss(r_mean, frames, percent=0.2)
        # group-KL on latent statistics (intended semantics, see docstring)
        group_var = jnp.var(mean, axis=(0, 1, 2, 3)) + 1e-8
        group_mean = jnp.mean(mean, axis=(0, 1, 2, 3))
        kl_group = -0.5 * jnp.sum(1 + jnp.log(group_var)
                                  - group_mean**2 - group_var)
        # hinged adversarial loss (reference :88-93). The reference's gym
        # script scores a 3-channel discriminator(recon) against "real"; our
        # MixedDiscriminator is the 6-channel which-half-is-real head
        # (reference discriminator.py:304-329), so the generator is scored
        # on the same both-orders (frames||recon, recon||frames) inputs the
        # discriminator trains on, with flipped targets -- the same pairing
        # models/discriminator.py::vae_adversarial_loss and
        # cs_vae_adversarial.py use, kept per-element here for the hinge.
        fr = jnp.concatenate([frames, r_mean], axis=-1)
        rf = jnp.concatenate([r_mean, frames], axis=-1)
        logits = disc_apply(dv, jnp.concatenate([fr, rf], axis=0), False)
        n = frames.shape[0]
        logp = jax.nn.log_softmax(logits, axis=-1)
        # generator targets: misclassify (frames||recon)->0, (recon||frames)->1
        ce = -jnp.concatenate([logp[:n, ..., 0], logp[n:, ..., 1]],
                              axis=0) / np.log(2)
        adv = 2e-5 * jnp.mean(jax.nn.relu(ce - 1) ** 2)
        loss = recon + kl_group * 1e-3 + adv
        return loss, dict(recon=recon, kl_group=kl_group, adv=jnp.mean(ce))

    def disc_loss_fn(dp, frames, recon):
        from autoregressive_diffusion_tpu.models.discriminator import \
            discriminator_loss
        dv = dict(disc_vars, params=dp)
        loss, mutated = discriminator_loss(disc, dv, frames, recon, train=True)
        return loss, mutated

    @jax.jit
    def step(vp, opt_v, dp, opt_d, dvars, frames_u8, key):
        # frames arrive uint8 and are normalized on-device: 4x less
        # host->device traffic per step (the tunnel link is the bottleneck)
        frames = frames_u8.astype(jnp.float32) / 127.5 - 1.0
        (l, aux), gv = jax.value_and_grad(vae_loss_fn, has_aux=True)(
            vp, dict(dvars, params=dp), frames, key)
        upd, opt_v = tx_vae.update(gv, opt_v, vp)
        vp = optax.apply_updates(vp, upd)

        r_mean, _, _ = vae_apply(dict(vae_vars, params=vp), frames)
        (dl, mutated), gd = jax.value_and_grad(disc_loss_fn, has_aux=True)(
            dp, frames, jax.lax.stop_gradient(r_mean))
        upd_d, opt_d = tx_disc.update(gd, opt_d, dp)
        dp = optax.apply_updates(dp, upd_d)
        new_dvars = dict(dvars, params=dp, **mutated)
        # metrics as ONE stacked device array so the host can defer the
        # fetch (per-step float() syncs would serialize the device queue)
        metrics = jnp.stack([aux["recon"], aux["kl_group"], aux["adv"], dl])
        return vp, opt_v, dp, opt_d, new_dvars, metrics

    if args.synthetic:
        gen = SyntheticVideoGenerator(t, args.frame_size, 4, 4, args.steps * 2)
    else:
        gen = GymDataGenerator(t, args.env, args.steps * 2, 4,
                               frame_size=args.frame_size)
    if args.replay > 0:
        replay = ReplayLoader(gen, args.batch, capacity=args.replay, seed=7)
        loader = iter(replay)
    else:
        replay = None
        loader = batched(gen, args.batch, num_workers=4)

    vp, dp = vae_vars["params"], disc_vars["params"]
    dvars = disc_vars
    key = jax.random.PRNGKey(3)
    history = {"recon": [], "kl_group": [], "adv": [], "disc": []}
    pending = []  # un-fetched per-step metric stacks (device arrays)

    def flush_pending():
        if pending:
            got = np.asarray(jnp.stack(pending))  # one fetch for the window
            for row in got:
                for name, val in zip(history, row):
                    history[name].append(float(val))
            pending.clear()

    t0 = time.time()
    for i, (frames, _, _) in enumerate(loader):
        if i >= args.steps:
            break
        key, k = jax.random.split(key)
        vp, opt_vae, dp, opt_disc, dvars, metrics = step(
            vp, opt_vae, dp, opt_disc, dvars, jnp.asarray(frames), k)
        pending.append(metrics)
        if i % 20 == 0:
            flush_pending()
            extra_msg = ""
            if replay is not None:
                rs = replay.stats()
                extra_msg = (f" replay[{rs['produced']} fresh, "
                             f"x{rs['reuse_factor']:.1f} reuse]")
            print(f"step {i}: recon={history['recon'][-1]:.4f} "
                  f"kl_group={history['kl_group'][-1]:.3f} "
                  f"adv={history['adv'][-1]:.3f} "
                  f"disc={history['disc'][-1]:.3f} "
                  f"({args.batch*(i+1)/(time.time()-t0):.2f} clips/s)"
                  f"{extra_msg}", flush=True)
        if i % 500 == 0 and i > 0:
            flush_pending()
            save_model(os.path.join(args.ckpt_dir, "vae_lunar_lander.ad"),
                       dict(vae_cfg.__dict__),
                       {**vae_vars, "params": jax.device_get(vp)})
            _save_curves(args.out_dir, history, i)
            print("# saved VAE checkpoint + loss curves")
    flush_pending()
    save_model(os.path.join(args.ckpt_dir, "vae_lunar_lander.ad"),
               dict(vae_cfg.__dict__),
               {**vae_vars, "params": jax.device_get(vp)})
    _save_curves(args.out_dir, history, "final")
    print("# final VAE checkpoint saved")


def _save_curves(out_dir, history, tag):
    """Loss-curve artifact (the reference tracks these ad hoc in its
    scripts; committed as training evidence)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    os.makedirs(out_dir, exist_ok=True)
    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    for ax, (name, vals) in zip(axes.ravel(), history.items()):
        ax.plot(vals, alpha=0.4)
        if len(vals) > 50:
            w = max(1, len(vals) // 50)
            ma = np.convolve(vals, np.ones(w) / w, mode="valid")
            ax.plot(np.arange(len(vals) - len(ma), len(vals)), ma)
        ax.set_title(name)
        ax.grid(True)
        if name in ("recon",):
            ax.set_yscale("log")
    fig.suptitle(f"gym VAE training (step {tag})")
    fig.savefig(os.path.join(out_dir, f"vae_losses_{tag}.png"), dpi=110,
                bbox_inches="tight")
    plt.close(fig)
    np.savez(os.path.join(out_dir, f"vae_losses_{tag}.npz"),
             **{k: np.asarray(v, np.float32) for k, v in history.items()})


if __name__ == "__main__":
    main()
