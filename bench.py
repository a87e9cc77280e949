"""Benchmark: DART training throughput of the flagship LunarLander denoiser
on the available accelerator (one TPU chip under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference trains gym_train.py on one RTX 4090 at ~14.8
samples/s (80k microbatch steps x 8 samples in the ~12 h loss-curve run,
/root/reference/README.md:150, gym_train.py:55-62). Driver target is >=1.5x
per TPU v5e chip (BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

BASELINE_SAMPLES_PER_SEC = 14.8  # RTX 4090, reference gym training


def main():
    from autoregressive_diffusion_tpu.models import Precond, UNetConfig
    from autoregressive_diffusion_tpu.train import (EDM2LossConfig,
                                                    create_train_state,
                                                    make_optimizer,
                                                    make_train_step)

    # flagship gym config (reference gym_train.py:37-47, :55-62):
    # latents 64x64x8, micro-batch 8, state_size 32 -> 8 latent frames
    cfg = UNetConfig(img_resolution=64, img_channels=8, label_dim=4,
                     model_channels=32, channel_mult=(1, 2, 4, 8),
                     num_blocks=2, video_attn_resolutions=(8,),
                     frame_attn_resolutions=(16,), max_frames=64)
    model = Precond(cfg, sigma_data=1.0, body_dtype=jnp.bfloat16)
    b, t = 8, 8

    x0 = jnp.zeros((b, 2 * t, 64, 64, 8))
    variables = jax.jit(model.init, static_argnames=("mode",))(
        jax.random.PRNGKey(0), x0, jnp.ones((b, 2 * t)),
        jnp.zeros((b, 2 * t), jnp.int32), mode="train")
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    print(f"# flagship UNet: {n_params/1e6:.1f}M params on "
          f"{jax.devices()[0].platform}:{jax.devices()[0].device_kind}",
          file=sys.stderr)

    from autoregressive_diffusion_tpu.train import make_scanned_train_step

    tx = make_optimizer(learning_rate=1e-3)
    state = create_train_state(model, variables, tx)
    # Device-side scan of G optimizer steps per dispatch: hides the
    # host->chip tunnel latency the same way a production input pipeline
    # (prefetched device batches) does.
    g = 10
    # NOTE: no donate_argnums -- the marginal-cost harness restarts each
    # timed run from the same `state`, which donation would invalidate.
    step = jax.jit(make_scanned_train_step(model, EDM2LossConfig(
        P_mean=1.2, P_std=1.0, context_noise_reduction=0.5), tx,
        batch_size=b), static_argnames=("just_2d",))

    images = jax.random.normal(jax.random.PRNGKey(1), (g, b, t, 64, 64, 8))
    cond = jnp.zeros((g, b, t), jnp.int32)

    # warmup / compile. NOTE: under the tunneled TPU runtime,
    # block_until_ready returns before device completion, so all timing
    # below forces a device->host scalar fetch and uses the marginal cost
    # between two run lengths (subtracting fixed dispatch+fetch overhead).
    # Insurance: if the fused Pallas conv path fails to compile on this
    # runtime, fall back to the XLA conv path instead of losing the
    # benchmark entirely.
    try:
        state, metrics = step(state, images, cond, jax.random.PRNGKey(0))
        float(metrics["loss"])
    except Exception as e:  # pragma: no cover - hardware-specific
        print(f"# fused path failed ({type(e).__name__}); "
              "retrying with AD_TPU_FUSED_CONV=0", file=sys.stderr)
        os.environ["AD_TPU_FUSED_CONV"] = "0"
        jax.clear_caches()
        state, metrics = step(state, images, cond, jax.random.PRNGKey(0))
        float(metrics["loss"])

    def run(n_dispatch):
        s = state
        t0 = time.perf_counter()
        for i in range(n_dispatch):
            s, m = step(s, images, cond, jax.random.PRNGKey(100 + i))
        float(m["loss"])  # forced fetch: cannot return before compute
        return time.perf_counter() - t0

    run(1)
    t_short, t_long = run(1), run(5)
    dt = (t_long - t_short) / 4  # marginal seconds per dispatch of g steps

    samples_per_sec = b * g / dt
    print(json.dumps({
        "metric": "train_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 3),
    }))


def rollout():
    """AR rollout frames/sec: prefill 6 context frames, generate frames with
    the EDM sampler (64 steps, rho=2, sigma in [0.4, 80] -- reference
    generation_code.py:87-95 knobs) through the fixed-shape KV/conv cache.

    Decode weights are int8 (train/quantize.py): batch-1 decode is
    weight-read-bound, so int8 HBM reads are the shipped configuration.
    AD_TPU_BENCH_QUANT=0 times the bf16-weight path instead."""
    from autoregressive_diffusion_tpu.models import Precond
    from autoregressive_diffusion_tpu.models.cache import init_cache
    from autoregressive_diffusion_tpu.sampling.sampler import edm_sampler
    from autoregressive_diffusion_tpu.train import (forced_weight_norm,
                                                    quantize_variables,
                                                    quantized_config)
    from functools import partial

    from autoregressive_diffusion_tpu.models import UNetConfig
    cfg = UNetConfig(img_resolution=64, img_channels=8, label_dim=4,
                     model_channels=32, channel_mult=(1, 2, 4, 8),
                     num_blocks=2, video_attn_resolutions=(8,),
                     frame_attn_resolutions=(16,), max_frames=32)
    model = Precond(cfg, sigma_data=1.0, body_dtype=jnp.bfloat16)
    b, t_ctx = 1, 6
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t_ctx, 64, 64, 8))
    sig = jnp.full((b, t_ctx), 0.05)
    cond = jnp.zeros((b, t_ctx), jnp.int32)
    variables = jax.jit(model.init, static_argnames=("mode",))(
        jax.random.PRNGKey(0), x, sig, cond, mode="eval")
    quant = os.environ.get("AD_TPU_BENCH_QUANT", "1") != "0"
    if quant:
        variables = dict(variables,
                         params=forced_weight_norm(variables["params"]))
        variables = quantize_variables(variables)
        model = Precond(quantized_config(cfg), sigma_data=1.0,
                        body_dtype=jnp.bfloat16)
        print("# rollout: int8 decode weights", file=sys.stderr)

    prefill = jax.jit(partial(model.apply, mode="eval", update_cache=True))
    cache = init_cache(model, variables, batch_size=b)
    _, cache = prefill(variables, x, sig, cond, cache=cache)

    num_steps = 64
    sample = jax.jit(partial(edm_sampler, model, num_steps=num_steps,
                             sigma_min=0.4, sigma_max=80.0, rho=2.0),
                     static_argnames=("shape",))
    shape = (b, 1, 64, 64, 8)

    # warmup/compile one frame
    key = jax.random.PRNGKey(1)
    key, k = jax.random.split(key)
    xw, _, _, _ = sample(variables, cache, k, shape=shape,
                         conditioning=cond[:, :1])
    float(xw.sum())

    def run(n_frames, key):
        c = cache
        t0 = time.perf_counter()
        for _ in range(n_frames):
            key, k = jax.random.split(key)
            xf, _, _, c = sample(variables, c, k, shape=shape,
                                 conditioning=cond[:, :1])
        float(xf.sum())  # forced fetch (see note in main())
        return time.perf_counter() - t0

    run(1, key)
    t_short, t_long = run(1, key), run(9, key)
    dt = (t_long - t_short) / 8  # marginal seconds per frame

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "rollout_frames_per_sec",
        "value": round(fps, 3),
        "unit": (f"frames/s ({num_steps}-step sampler, 2 NFE/step"
                 + (", int8 weights)" if quant else ")")),
        "vs_baseline": None,
    }))


def cs(compare_fused: bool = False):
    """CS-scale training throughput (reference cs_train.py:35-63 config:
    128 model channels, mult 1/2/4/4, 32x32x8 latents, clip T=16,
    micro-batch 2 -> DART concat is 32 frames of 32x32). The reference
    publishes no CS throughput number (its 8xH100 run failed,
    index.html:402), so vs_baseline is null; the value documents that the
    frame-blocked fused-conv kernel runs AND is fast at the scale it was
    built for.

    With compare_fused, times the same step with AD_TPU_FUSED_CONV=0 (pure
    XLA convs) and reports the fused/XLA speed ratio."""
    from autoregressive_diffusion_tpu.models import Precond, UNetConfig
    from autoregressive_diffusion_tpu.train import (EDM2LossConfig,
                                                    create_train_state,
                                                    make_optimizer,
                                                    make_scanned_train_step)

    cfg = UNetConfig(img_resolution=32, img_channels=8, label_dim=4,
                     model_channels=128, channel_mult=(1, 2, 4, 4),
                     num_blocks=2, video_attn_resolutions=(4,),
                     frame_attn_resolutions=(8,), max_frames=64)
    model = Precond(cfg, sigma_data=1.0, body_dtype=jnp.bfloat16)
    b, t, g = 2, 16, 4

    x0 = jnp.zeros((b, 2 * t, 32, 32, 8))
    variables = jax.jit(model.init, static_argnames=("mode",))(
        jax.random.PRNGKey(0), x0, jnp.ones((b, 2 * t)),
        jnp.zeros((b, 2 * t), jnp.int32), mode="train")
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    print(f"# CS UNet: {n_params/1e6:.1f}M params, 32x32x8 latents, T=16, "
          f"micro-batch {b}", file=sys.stderr)

    tx = make_optimizer(learning_rate=1e-3)
    loss_cfg = EDM2LossConfig(P_mean=0.9, P_std=1.0,
                              context_noise_reduction=0.1)
    images = jax.random.normal(jax.random.PRNGKey(1), (g, b, t, 32, 32, 8))
    cond = jnp.zeros((g, b, t), jnp.int32)

    def measure():
        # At 310M params the TrainState (params + 2 Adam moments + 2 EMAs,
        # fp32) is ~5.8 GiB -- donate it and THREAD it through every
        # dispatch so at most one copy plus in-flight update buffers exist
        # (two undonated copies OOMed the 16 GiB chip). Threading keeps the
        # marginal-cost timing honest: no input is ever reused after
        # donation.
        state = create_train_state(model, variables, tx)
        step = jax.jit(make_scanned_train_step(model, loss_cfg, tx,
                                               batch_size=b),
                       static_argnames=("just_2d",), donate_argnums=(0,))
        state, m = step(state, images, cond, jax.random.PRNGKey(0))
        float(m["loss"])  # compile + warm

        def run(n_dispatch, state):
            t0 = time.perf_counter()
            for i in range(n_dispatch):
                state, m = step(state, images, cond, jax.random.PRNGKey(i))
            float(m["loss"])  # forced fetch (see main())
            return time.perf_counter() - t0, state

        _, state = run(1, state)
        t_short, state = run(1, state)
        t_long, state = run(4, state)
        del state
        return (t_long - t_short) / 3  # marginal sec per g-step dispatch

    try:
        dt_fused = measure()
    except Exception as e:  # pragma: no cover - hardware-specific
        print(f"# CS fused path failed ({type(e).__name__}); "
              "AD_TPU_FUSED_CONV=0 fallback", file=sys.stderr)
        os.environ["AD_TPU_FUSED_CONV"] = "0"
        jax.clear_caches()
        dt_fused = measure()

    unit = f"samples/s (ms/step: {dt_fused/g*1e3:.1f})"
    if compare_fused:
        # comparison leg is best-effort: a failure here (e.g. transient
        # runtime error rebuilding the 5.8 GiB state) must not lose the
        # primary metric line
        prev = os.environ.get("AD_TPU_FUSED_CONV")
        os.environ["AD_TPU_FUSED_CONV"] = "0"
        jax.clear_caches()
        try:
            dt_xla = measure()
            ratio = dt_xla / dt_fused
            print(f"# CS fused-conv kernel vs XLA convs: "
                  f"{dt_fused/g*1e3:.1f} vs {dt_xla/g*1e3:.1f} ms/step "
                  f"-> {ratio:.2f}x", file=sys.stderr)
            unit = (f"samples/s (default {dt_fused/g*1e3:.1f} ms/step, "
                    f"all-XLA {dt_xla/g*1e3:.1f}, {ratio:.2f}x)")
        except Exception as e:  # pragma: no cover - hardware-specific
            print(f"# CS all-XLA comparison failed: {type(e).__name__}",
                  file=sys.stderr)
        finally:
            if prev is None:
                del os.environ["AD_TPU_FUSED_CONV"]
            else:
                os.environ["AD_TPU_FUSED_CONV"] = prev

    samples_per_sec = b * g / dt_fused
    print(json.dumps({
        "metric": "cs_train_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 2),
        "unit": unit,
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    # One run emits the target metrics (BASELINE.md: training samples/s/chip
    # AND AR rollout frames/s) plus the CS-scale throughput, one JSON line
    # each; --train-only/--rollout/--cs restrict to one.
    if "--rollout" in sys.argv:
        rollout()
    elif "--train-only" in sys.argv:
        main()
    elif "--cs" in sys.argv:
        cs(compare_fused=True)
    else:
        rollout()
        main()
        try:
            cs()
        except Exception as e:  # keep the headline metrics if CS fails
            print(f"# cs bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
