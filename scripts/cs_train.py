"""Counter-Strike latent diffusion training, multi-chip data-parallel.

Mirrors /root/reference/cs_train.py:31-175 knob-for-knob:

| knob | value | reference |
|---|---|---|
| UNet | img_resolution=32, img_channels=8, label_dim=4, model_channels=128, channel_mult=[1,2,4,4], num_blocks=2, video@4, frame@8 | cs_train.py:35-44 |
| batch / micro-batch | 8 / 2 | cs_train.py:58-59 |
| clip length | 16 latent frames | cs_train.py:63 |
| loss | EDM2Loss(P_mean=0.9, P_std=1.0, sigma_data=1.0, cnr=0.1) | cs_train.py:75 |
| optimizer | AdamW(ref_lr=1e-2, eps=1e-4), grad clip 0.1 | cs_train.py:78 |
| just_2d cadence | every 4th step (part of the DART mixed 2D/3D recipe) | cs_train.py:106 |
| LR schedule | inverse-sqrt, ref_step = rampup = total/500 | cs_train.py:128 |
| EMA | PowerFunctionEMA stds [0.050, 0.100] | cs_train.py:80 |
| loss fit | every 500 steps, rank-0 fit + broadcast | cs_train.py:131, loss_weight.py:122-149 |

The reference keeps label_dim=4 while passing actions=None (cs_train.py:104);
actions stream through the CS data layer either way. This script does the
same by default and `--use-actions` feeds them to the UNet's label
embedding, enabling an action-conditioned CS world model.

TPU-native distribution (SURVEY.md section 2.7): instead of
torchrun/DDP/NCCL, the batch is sharded over the 'data' axis of a
('data','model') mesh; XLA emits the gradient all-reduce over ICI.
Process-0-only work (loss-fit history, checkpoints) is guarded by
jax.process_index(). Launch with no wrapper: `python scripts/cs_train.py`.
"""
import argparse
import os
import signal
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

# virtual-device runs (XLA_FLAGS=--xla_force_host_platform_device_count=N):
# this environment's sitecustomize re-pins JAX_PLATFORMS to the TPU plugin,
# so a host-device fan-out must force the CPU platform explicitly (same
# guard as __graft_entry__.py)
if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40_000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--micro-batch", type=int, default=2)
    ap.add_argument("--clip-size", type=int, default=16,
                    help="latent frames (reference cs_train.py:63)")
    ap.add_argument("--shards", default=None,
                    help="local .npz latent shard dir (cs_data.py)")
    ap.add_argument("--mds", default=None,
                    help="MDS dataset dir (MosaicML streaming format, the "
                         "reference's CS data path; read via `streaming` "
                         "when installed, else the vendored data/mds.py "
                         "reader)")
    ap.add_argument("--tp", type=int, default=1, help="tensor parallelism")
    ap.add_argument("--fsdp", action="store_true",
                    help="fully-sharded data parallelism: shard every large "
                         "weight + its optimizer moments over the 'data' "
                         "axis (ZeRO); XLA all-gathers weights just-in-time "
                         "over ICI and reduce-scatters their gradients")
    ap.add_argument("--sp", type=int, default=1,
                    help="sequence parallelism: shard the clip's frame axis "
                         "over the mesh 'seq' axis (for long CS clips where "
                         "activation memory, not batch, is the constraint)")
    ap.add_argument("--lat-mean", type=float, default=0.0)
    ap.add_argument("--lat-std", type=float, default=1.0)
    ap.add_argument("--ckpt-dir", default="saved_models_cs")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--ref-lr", type=float, default=1e-2)
    ap.add_argument("--synthetic", action="store_true",
                    help="random latents (pipeline smoke test)")
    ap.add_argument("--model-channels", type=int, default=128,
                    help="UNet width (reference cs_train.py:38 uses 128; "
                         "smaller values for pipeline smoke tests)")
    ap.add_argument("--use-actions", action="store_true",
                    help="condition the UNet on streamed actions (the "
                         "reference keeps label_dim=4 but passes None)")
    args = ap.parse_args()

    from autoregressive_diffusion_tpu.data import (LocalLatentShards,
                                                   batched_latents)
    from autoregressive_diffusion_tpu.models import Precond, UNetConfig
    from autoregressive_diffusion_tpu.parallel import (create_mesh,
                                                       gather_to_host,
                                                       replicated,
                                                       seq_sharding,
                                                       set_sp_context,
                                                       shard_train_state)
    from autoregressive_diffusion_tpu.train import (
        EDM2LossConfig, MultiNoiseState, create_train_state,
        fit_and_broadcast, learning_rate_schedule, make_optimizer,
        make_train_step)
    from autoregressive_diffusion_tpu.utils import (latest_step,
                                                    restore_train_state,
                                                    save_train_state)

    # reference cs_train.py:35-44
    cfg = UNetConfig(img_resolution=32, img_channels=8, label_dim=4,
                     model_channels=args.model_channels,
                     channel_mult=(1, 2, 4, 4),
                     num_blocks=2, video_attn_resolutions=(4,),
                     frame_attn_resolutions=(8,), max_frames=128)
    model = Precond(cfg, sigma_data=1.0, body_dtype=jnp.bfloat16)

    mesh = create_mesh(tp=args.tp, sp=args.sp)
    print(f"# mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")
    if args.sp > 1:
        # route VideoAttention through the sequence-parallel splash kernels
        # (Q/mask sharded over 'seq', K/V all-gathered in a shard_map)
        set_sp_context(mesh)

    b, t = args.batch, args.clip_size
    x0 = jnp.zeros((b, 2 * t, 32, 32, 8))
    variables = jax.jit(model.init, static_argnames=("mode",))(
        jax.random.PRNGKey(0), x0, jnp.ones((b, 2 * t)),
        jnp.zeros((b, 2 * t), jnp.int32), mode="train")
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    print(f"# UNet: {n_params/1e6:.1f}M params")

    # reference cs_train.py:128: ref_step = rampup = total/500
    sched = lambda s: learning_rate_schedule(s, args.ref_lr, args.steps / 500,
                                             args.steps / 500)
    # reference cs_train.py:78: AdamW eps=1e-4
    tx = make_optimizer(learning_rate=sched, grad_clip=0.1, eps=1e-4)
    state = create_train_state(model, variables, tx)
    state, shardings = shard_train_state(state, mesh, fsdp=args.fsdp)

    loss_cfg = EDM2LossConfig(P_mean=0.9, P_std=1.0, sigma_data=1.0,
                              context_noise_reduction=0.1)
    step_fn = jax.jit(
        make_train_step(model, loss_cfg, tx, batch_size=b,
                        microbatch=args.micro_batch),
        static_argnames=("just_2d",),
        in_shardings=(shardings, seq_sharding(mesh), seq_sharding(mesh),
                      replicated(mesh)),
        out_shardings=(shardings, None),
        donate_argnums=(0,))

    start = 0
    if args.resume and (ls := latest_step(args.ckpt_dir)) is not None:
        # gather_to_host (not device_get): with --fsdp in a multi-process
        # run the state's leaves are not fully addressable
        state, _ = restore_train_state(args.ckpt_dir, ls,
                                       gather_to_host(state))
        state, _ = shard_train_state(state, mesh, fsdp=args.fsdp)
        start = int(state.step)
        print(f"# resumed at step {start}")

    synth_fn = None
    if args.mds is not None:
        from autoregressive_diffusion_tpu.data import streaming_dataset

        def _mds_epochs():  # re-open per epoch: the windows generator is finite
            while True:
                yield from streaming_dataset(None, args.mds, clip_size=t,
                                             shuffle=True)
        loader = batched_latents(_mds_epochs(), b,
                                 normalize=(args.lat_mean, args.lat_std),
                                 num_workers=0)
    elif args.synthetic or args.shards is None:
        # Device-generated synthetic latents: the batch never crosses the
        # host<->chip boundary (the 1-core host cannot synthesize + upload
        # 16 MB/step at chip rate -- same lesson as the gym run's
        # device-resident replay, data/replay.py). The latents are NOT white
        # noise (white noise pins the EDM2-weighted loss at ~1.0 -- the
        # optimum is context-free shrinkage): each clip is an AR(1) process
        # over frames (rho=0.95) of spatially-smoothed fields, so the
        # context frames carry ~90% of the next frame's variance and the
        # DART objective has real, learnable temporal signal. Marginal
        # std stays ~1 (sigma_data) by construction.
        print("# synthetic latents (device-generated, AR(1) rho=0.95)")
        rho = 0.95

        def _synth(k):
            kl, ka = jax.random.split(k)
            eps = jax.random.normal(kl, (t, b, 32, 32, 8), jnp.float32)
            # unit-variance spatial smoothing: 5-tap plus-stencil of iid
            # noise, /sqrt(5)
            eps = (eps + jnp.roll(eps, 1, -3) + jnp.roll(eps, -1, -3)
                   + jnp.roll(eps, 1, -2) + jnp.roll(eps, -1, -2)) \
                / jnp.sqrt(5.0)

            def ar(prev, e):
                nxt = rho * prev + jnp.sqrt(1 - rho ** 2) * e
                return nxt, nxt
            _, lat = jax.lax.scan(ar, eps[0], eps[1:])
            lat = jnp.concatenate([eps[:1], lat], 0).transpose(1, 0, 2, 3, 4)
            act = jax.random.randint(ka, (b, t), 0, 4)
            return lat, act
        synth_fn = jax.jit(_synth, out_shardings=(seq_sharding(mesh),
                                                  seq_sharding(mesh)))
        loader = iter(int, 1)  # infinite dummy iterator
    else:
        ds = LocalLatentShards(args.shards, clip_size=t,
                               rank=jax.process_index(),
                               num_replicas=jax.process_count())
        loader = batched_latents(ds, b, normalize=(args.lat_mean, args.lat_std))

    noise_state = MultiNoiseState()
    is_p0 = jax.process_index() == 0
    key = jax.random.PRNGKey(7)
    losses = []
    t0 = time.time()
    t_win, i_win = t0, start  # sustained-rate window (excludes compile)
    # graceful preemption (see gym_train.py): checkpoint + clean exit on
    # SIGTERM instead of losing up to 2000 steps and wedging the chip claim
    stop_requested = []
    signal.signal(signal.SIGTERM,
                  lambda s, f: (stop_requested.append(True),
                                print("# SIGTERM: will checkpoint and exit",
                                      flush=True)))
    # Deferred metric fetches: per-step float()/np.asarray syncs serialize
    # the device queue over the tunnel (ROADMAP round-2 lesson). Device
    # metric handles are held and converted in one bulk drain every 20
    # steps -- by then the async dispatches have long completed.
    pending = []

    def drain():
        for m in pending:
            noise_state.add_data(np.asarray(m["sigma"]),
                                 np.asarray(m["losses"]))
            losses.append(float(m["unweighted"]))
        pending.clear()

    for i, batch in enumerate(loader, start=start):
        if i >= args.steps:
            break
        key, k = jax.random.split(key)
        if synth_fn is not None:
            latents, acts = synth_fn(jax.random.fold_in(key, i))
            actions = acts if args.use_actions else None
        else:
            latents = jax.device_put(jnp.asarray(batch["latents"]),
                                     seq_sharding(mesh))
            # label_dim=4 like the reference, which still passes
            # actions=None (cs_train.py:104); --use-actions feeds them.
            actions = None
            if args.use_actions and batch.get("actions") is not None:
                actions = jax.device_put(
                    jnp.asarray(batch["actions"], jnp.int32),
                    seq_sharding(mesh))
        # just_2d passed positionally: pjit rejects kwargs when
        # in_shardings is set (static_argnames still applies by position)
        state, metrics = step_fn(state, latents, actions, k, i % 4 == 0)
        if is_p0:
            pending.append(metrics)
        if i % 20 == 0 and is_p0:
            drain()
            now = time.time()
            sustained = b * (i + 1 - i_win) / (now - t_win)
            print(f"step {i}: loss={np.mean(losses[-20:]):.4f} "
                  f"{sustained:.2f} samples/s "
                  f"(avg {b*(i+1-start)/(now-t0):.2f})", flush=True)
            t_win, i_win = now, i + 1
        if i % 500 == 0 and i > start:
            if is_p0:
                drain()
            # rank-0 fit + cross-process broadcast, then replicate over the
            # mesh (reference loss_weight.py:122-149)
            coefs = jnp.asarray(fit_and_broadcast(noise_state))
            state = state.replace(coefs=jax.device_put(coefs, replicated(mesh)))
        if i % 2000 == 0 and i > start:
            if is_p0:
                drain()
            # all processes participate in the FSDP all-gather inside
            # gather_to_host; only process 0 writes
            host_state = gather_to_host(state)
            if is_p0:
                # block=False: disk write runs on a background thread while
                # training continues (round-4 sync saves stalled ~120 s/save)
                save_train_state(args.ckpt_dir, int(state.step), host_state,
                                 {"losses": list(losses)}, keep=3, block=False)
                print("# checkpoint save started (async)")
        if stop_requested:
            if is_p0:
                drain()
            host_state = gather_to_host(state)
            if is_p0:
                save_train_state(args.ckpt_dir, int(state.step), host_state,
                                 {"losses": losses}, keep=3)
                print("# checkpoint saved on SIGTERM")
            break
    host_state = gather_to_host(state)
    if is_p0:
        drain()
        save_train_state(args.ckpt_dir, int(state.step), host_state,
                         {"losses": losses}, keep=3)
        print(f"# done: {len(losses)} steps recorded, "
              f"final loss {np.mean(losses[-20:]):.4f}; checkpoint saved",
              flush=True)


if __name__ == "__main__":
    main()
