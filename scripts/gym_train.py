"""LunarLander world-model diffusion training (single chip).

Mirrors /root/reference/gym_train.py:29-146 knob-for-knob: frozen VAE
latents, UNet(model_channels=32, channel_mult=[1,2,4,8], num_blocks=2,
label_dim=4, video@8, frame@16), EDM2Loss(P_mean=1.2, P_std=1,
context_noise_reduction=0.5), AdamW(lr 1e-2, eps 1e-8) + grad clip 0.1,
just_2d every 4th step, power-function EMA per optimizer step, inverse-sqrt
LR schedule with rampup total/50, dashboard + resumable checkpoints.
"""
import argparse
import os
import signal
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80_000)
    ap.add_argument("--micro-batch", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--state-size", type=int, default=32)
    ap.add_argument("--env", default="LunarLander-v3")
    ap.add_argument("--vae", default=None, help="VAE kwargs-bundle checkpoint")
    ap.add_argument("--vae-std", type=float, default=1.45,
                    help="latent std override (reference gym_train.py:34)")
    ap.add_argument("--ckpt-dir", default="saved_models")
    ap.add_argument("--out-dir", default="images_training")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--synthetic", action="store_true",
                    help="synthetic moving-square data instead of gym")
    ap.add_argument("--ref-lr", type=float, default=1e-2)
    ap.add_argument("--dashboard-every", type=int, default=500)
    ap.add_argument("--ckpt-every", type=int, default=0,
                    help="checkpoint interval in optimizer steps "
                         "(0 = steps/40, the reference cadence)")
    ap.add_argument("--replay", type=int, default=0, metavar="CAPACITY",
                    help="replay-buffer capacity in clips (0 = stream fresh "
                         "batches like the reference; >0 = sample from a "
                         "continuously refreshed buffer of pre-encoded "
                         "latents -- see data/replay.py for why)")
    ap.add_argument("--replay-device", action="store_true",
                    help="with --replay: keep the buffer resident in device "
                         "HBM, gather batches on device, and dispatch "
                         "groups of steps in one call (DeviceReplay + "
                         "make_replay_train_step) -- removes the per-step "
                         "host gather + batch upload that bottleneck the "
                         "one-core host")
    args = ap.parse_args()

    from autoregressive_diffusion_tpu.data import (DeviceReplay,
                                                   GymDataGenerator,
                                                   ReplayLoader,
                                                   SyntheticVideoGenerator,
                                                   batched)
    from autoregressive_diffusion_tpu.models import Precond, UNetConfig
    from autoregressive_diffusion_tpu.models.vae import (VAE, VAEConfig,
                                                         frames_to_latents)
    from autoregressive_diffusion_tpu.train import (
        EDM2LossConfig, MultiNoiseState, create_train_state,
        learning_rate_schedule, make_optimizer, make_replay_train_step,
        make_train_step)
    from autoregressive_diffusion_tpu.utils import (latest_step, load_model,
                                                    restore_train_state,
                                                    save_model,
                                                    save_train_state,
                                                    wait_for_pending_saves)
    from autoregressive_diffusion_tpu.models.vae import latents_to_frames
    from autoregressive_diffusion_tpu.sampling import make_sampler_callback
    from autoregressive_diffusion_tpu.utils.plotting import \
        plot_training_dashboard

    # ---- frozen VAE (reference gym_train.py:33-34)
    if args.vae:
        vae_kwargs, vae_vars = load_model(args.vae)
        vae_cfg = VAEConfig(**{k: tuple(v) if isinstance(v, list) else v
                               for k, v in vae_kwargs.items()})
    else:
        print("# no --vae given: using a fresh frozen random VAE (smoke mode)")
        vae_cfg = VAEConfig(channels=(3, 8, 8, 8), n_res_blocks=2,
                            time_compressions=(1, 2, 2),
                            spatial_compressions=(1, 2, 2))
        vae = VAE(vae_cfg)
        vae_vars = jax.jit(vae.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 4, 64, 64, 3)))
    vae = VAE(vae_cfg)
    lat_mean = jnp.zeros((vae_cfg.latent_channels,))
    lat_std = jnp.asarray(args.vae_std)

    frame_size = 256 if not args.synthetic else 64
    lat_res = frame_size // vae_cfg.spatial_compression
    unet_cfg = UNetConfig(
        img_resolution=lat_res, img_channels=vae_cfg.latent_channels,
        label_dim=4, model_channels=32, channel_mult=(1, 2, 4, 8),
        num_blocks=2, video_attn_resolutions=(8,),
        frame_attn_resolutions=(16,), max_frames=64)
    model = Precond(unet_cfg, sigma_data=1.0, body_dtype=jnp.bfloat16)

    t_lat = args.state_size // vae_cfg.time_compression
    x0 = jnp.zeros((1, 2 * t_lat, lat_res, lat_res, vae_cfg.latent_channels))
    variables = jax.jit(model.init, static_argnames=("mode",))(
        jax.random.PRNGKey(42), x0, jnp.ones((1, 2 * t_lat)),
        jnp.zeros((1, 2 * t_lat), jnp.int32), mode="train")
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    print(f"# UNet: {n_params/1e6:.1f}M params, latents "
          f"{lat_res}x{lat_res}x{vae_cfg.latent_channels}, T={t_lat}")

    # ---- optimizer / state (reference gym_train.py:69-83, :111)
    accumulation = args.batch // args.micro_batch
    sched = lambda step: learning_rate_schedule(
        step, args.ref_lr, args.steps / 50, args.steps / 50)
    tx = make_optimizer(learning_rate=sched, grad_clip=0.1)
    state = create_train_state(model, variables, tx)
    loss_cfg = EDM2LossConfig(P_mean=1.2, P_std=1.0, sigma_data=1.0,
                              context_noise_reduction=0.5)
    step_fn = jax.jit(
        make_train_step(model, loss_cfg, tx, batch_size=args.batch,
                        microbatch=args.micro_batch),
        static_argnames=("just_2d",), donate_argnums=(0,))

    noise_state = MultiNoiseState()
    losses_history = []
    start = 0
    if args.resume and (ls := latest_step(args.ckpt_dir)) is not None:
        state, extra = restore_train_state(args.ckpt_dir, ls, state,
                                           {"losses": losses_history})
        losses_history = list(extra.get("losses", []))
        start = int(state.step)
        print(f"# resumed at optimizer step {start}")

    # ---- data (reference gym_train.py:61-62)
    if args.synthetic:
        gen = SyntheticVideoGenerator(args.state_size, frame_size, 4,
                                      vae_cfg.time_compression, args.steps * 2)
    else:
        gen = GymDataGenerator(args.state_size, args.env, args.steps * 2,
                               vae_cfg.time_compression, return_anyways=False,
                               frame_size=frame_size)
    encode = jax.jit(lambda v, f: frames_to_latents(vae, v, f, lat_mean, lat_std))
    decode = jax.jit(lambda v, z: latents_to_frames(vae, v, z, lat_mean, lat_std))

    if args.replay > 0 and args.replay_device:
        # device-resident ring buffer: fresh clips upload once as uint8,
        # training batches are gathered on device inside the dispatched
        # step group (see data/replay.py::DeviceReplay)
        def to_latent_dev(item):
            frames, actions, _ = item
            z = encode(vae_vars, jnp.asarray(frames)[None])
            return z[0], np.asarray(actions, np.int32)
        replay = DeviceReplay(gen, to_latent_dev, args.batch,
                              capacity=args.replay, seed=5)
        loader = None
    elif args.replay > 0:
        # producer thread encodes each fresh clip to latents on-device
        # (jax serializes this against train steps), buffer holds latents
        def to_latent(item):
            frames, actions, _ = item
            z = encode(vae_vars, jnp.asarray(frames, jnp.float32)[None])
            return np.asarray(z[0], np.float32), np.asarray(actions)
        replay = ReplayLoader(gen, args.batch, capacity=args.replay,
                              transform=to_latent, seed=5)
        loader = iter(replay)
    else:
        replay = None
        def _stream():
            for frames, actions, _ in batched(gen, args.batch,
                                              num_workers=args.micro_batch):
                yield encode(vae_vars, jnp.asarray(frames, jnp.float32)), actions
        loader = _stream()
    # eval rollout + per-step-MSE feedback loop, run every dashboard
    # interval (reference sampler.py:91-146, gym_train.py:115-130)
    eval_callback = make_sampler_callback(model)

    key = jax.random.PRNGKey(1234)
    t_start = time.time()
    pending = []  # un-fetched (unweighted, sigma, losses) device tuples:
    # per-step float() syncs would serialize the device queue over the
    # host<->chip link; one bulk fetch per print window keeps it full

    def flush_pending():
        for unw, sig, lo in jax.device_get(pending):
            noise_state.add_data(sig, lo)
            # unweighted is a scalar (per-step dispatch) or a per-step
            # vector (grouped replay dispatch)
            losses_history.extend(np.atleast_1d(unw).tolist())
        pending.clear()

    ckpt_every = args.ckpt_every or max(args.steps // 40, 1)

    # Graceful preemption: on SIGTERM (timeout wrapper, scheduler eviction)
    # finish the in-flight dispatch, checkpoint, and exit cleanly. The
    # reference has only inert should_stop/should_suspend stubs
    # (torch_utils/distributed.py:59-70); on preemptible TPU pods a real
    # handler is table stakes -- and a clean exit releases the chip claim
    # (a killed process can wedge the tunneled runtime's grant for hours).
    stop_requested = []
    signal.signal(signal.SIGTERM,
                  lambda s, f: (stop_requested.append(True),
                                print("# SIGTERM: will checkpoint and exit",
                                      flush=True)))

    def log_window(i):
        sps = args.batch * (i + 1 - start) / (time.time() - t_start)
        extra_msg = ""
        if replay is not None:
            rs = replay.stats()
            extra_msg = (f" replay[{rs['buffered']} buf, "
                         f"{rs['produced']} fresh, "
                         f"x{rs['reuse_factor']:.1f} reuse]")
        print(f"step {i}: loss={np.mean(losses_history[-accumulation:]):.4f} "
              f"lr={float(sched(i)):.6f} {sps:.1f} samples/s{extra_msg}",
              flush=True)

    def do_dashboard(state, i, latents, k):
        state = state.replace(coefs=jnp.asarray(noise_state.fit()))
        mse_steps, _, roll_lat = eval_callback(
            {"params": state.params, "buffers": state.buffers},
            latents, k)
        roll_frames = np.asarray(decode(vae_vars, roll_lat))[0]
        plot_training_dashboard(
            os.path.join(args.out_dir, f"dashboard_step_{i}.png"),
            losses_history, i, noise_state, np.asarray(state.coefs),
            mse_steps=mse_steps, rollout_frames=roll_frames,
            unet_params=n_params)
        return state

    def do_checkpoint(state, i, block=False):
        save_model(os.path.join(args.ckpt_dir, f"unet_{n_params//10**6}M.ad"),
                   dict(unet_cfg.__dict__),
                   {"params": jax.device_get(state.params),
                    "buffers": jax.device_get(state.buffers)})
        # periodic saves write on a background thread (block=False); the
        # SIGTERM/final paths pass block=True so the process exits cleanly
        save_train_state(args.ckpt_dir, int(state.step), jax.device_get(state),
                         {"losses": losses_history}, keep=3, block=block)
        print(f"# checkpoint at step {i}", flush=True)

    if loader is None:
        # ---- device-resident replay: dispatch groups of steps; the
        # reference cadence just_2d = i%4==0 becomes one just_2d dispatch
        # followed by one 3-step 3D dispatch per group of 4
        replay_fn = jax.jit(
            make_replay_train_step(model, loss_cfg, tx,
                                   batch_size=args.batch,
                                   microbatch=args.micro_batch),
            static_argnames=("just_2d",), donate_argnums=(0,))
        i = start
        t_fill = time.time()
        while i < args.steps:
            if stop_requested and i == start:
                break  # terminated during the initial buffer fill
            replay.ingest()
            if not replay.ready():
                if replay.exhausted():
                    print("# generator exhausted before one batch filled")
                    break
                if time.time() - t_fill > 30:
                    t_fill = time.time()
                    print(f"# filling replay buffer: "
                          f"{replay.stats()['buffered']}/{replay.min_fill}",
                          flush=True)
                time.sleep(0.2)
                continue
            if i % 4 == 0:
                g, j2 = 1, True
            else:
                g, j2 = 4 - i % 4, False
            g = min(g, args.steps - i)
            buf_z, buf_a = replay.buffers()
            key, k = jax.random.split(key)
            idx = jnp.asarray(replay.sample_idx(g))
            state, metrics = replay_fn(state, buf_z, buf_a, idx, k,
                                       just_2d=j2)
            pending.append((metrics["unweighted"], metrics["sigma"],
                            metrics["losses"]))
            i_new = i + g
            if i // 50 != i_new // 50:
                flush_pending()
                log_window(i_new - 1)
            if i // args.dashboard_every != i_new // args.dashboard_every:
                flush_pending()
                lat = jnp.take(buf_z, jnp.asarray(replay.sample_idx(1)[0]),
                               axis=0)
                key, k = jax.random.split(key)
                state = do_dashboard(state, i_new, lat, k)
            if i // ckpt_every != i_new // ckpt_every:
                flush_pending()
                do_checkpoint(state, i_new)
            i = i_new
            if stop_requested:
                flush_pending()
                do_checkpoint(state, i, block=True)
                break
        replay.stop()
        wait_for_pending_saves()
        return

    for i, (latents, actions) in enumerate(loader, start=start):
        if i >= args.steps:
            break
        latents = jnp.asarray(latents)
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, latents, jnp.asarray(actions), k,
                                 just_2d=(i % 4 == 0))
        pending.append((metrics["unweighted"], metrics["sigma"],
                        metrics["losses"]))

        if i % 50 == 0:
            flush_pending()
            log_window(i)
        if i % args.dashboard_every == 0 and i > start:
            flush_pending()
            key, k = jax.random.split(key)
            state = do_dashboard(state, i, latents, k)
        if i % ckpt_every == 0 and i > start:
            flush_pending()
            do_checkpoint(state, i)
        if stop_requested:
            flush_pending()
            do_checkpoint(state, i + 1, block=True)
            break
    wait_for_pending_saves()


if __name__ == "__main__":
    main()
