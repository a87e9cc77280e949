"""CS-scale fused-conv policy ablation (VERDICT r3 weak #7).

Times the CS training step (bench.py cs() config + harness) under three
fused-conv gating policies in ONE process:

  default   -- shipped gate (AD_TPU_FUSED_MAX_CP=96): only the stem conv
               (cin 9 -> cp 16) enters the fused path at CS scale
  cop-cap   -- AD_TPU_FUSED_MAX_COP=96 additionally excludes the stem
               (cout 128): identical to all-XLA at this scale, but through
               the policy gate rather than the global kill switch
  all-XLA   -- AD_TPU_FUSED_CONV=0

Reconciles the r3 bench (119.5 ms/step default) vs docs/PERF.md's 106.1
all-XLA ablation by re-measuring both cells back-to-back on the same chip,
and decides the shipped AD_TPU_FUSED_MAX_COP default.

One cell per PROCESS: flipping the gating env vars + jax.clear_caches()
inside one process wedges the tunneled runtime after the first cell's
donated 5.8 GiB TrainState (TPU backend InvalidArgument on the recompile,
reproduced) -- so with no --cell argument this re-execs itself once per
cell, waiting for the relay to reap the previous grant between runs.

Usage: python tools/cs_sweep.py            # all cells, one process each
       python tools/cs_sweep.py --cell N   # one cell in this process
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

CELLS = [
    ("default (stem fused)", {}),
    ("cop96 (stem -> XLA)", {"AD_TPU_FUSED_MAX_COP": "96"}),
    ("all-XLA", {"AD_TPU_FUSED_CONV": "0"}),
]


def driver():
    for i, (name, env) in enumerate(CELLS):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cell", str(i)],
            env={**os.environ, **env})
        if r.returncode:
            print(f"{name:24s} FAILED: exit {r.returncode}", flush=True)
        if i + 1 < len(CELLS):
            time.sleep(150)  # relay grant reap (~2 min) before next register


def main():
    import jax
    import jax.numpy as jnp
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
    tx = make_optimizer(learning_rate=1e-3)
    loss_cfg = EDM2LossConfig(P_mean=0.9, P_std=1.0,
                              context_noise_reduction=0.1)
    images = jax.random.normal(jax.random.PRNGKey(1), (g, b, t, 32, 32, 8))
    cond = jnp.zeros((g, b, t), jnp.int32)

    def measure():
        # same harness as bench.py cs(): donated, threaded state; marginal
        # cost between two run lengths with a forced fetch (tunnel runtime
        # returns from block_until_ready early)
        state = create_train_state(model, variables, tx)
        step = jax.jit(make_scanned_train_step(model, loss_cfg, tx,
                                               batch_size=b),
                       static_argnames=("just_2d",), donate_argnums=(0,))
        state, m = step(state, images, cond, jax.random.PRNGKey(0))
        float(m["loss"])

        def run(n_dispatch, state):
            t0 = time.perf_counter()
            for i in range(n_dispatch):
                state, m = step(state, images, cond, jax.random.PRNGKey(i))
            float(m["loss"])
            return time.perf_counter() - t0, state

        _, state = run(1, state)
        t_short, state = run(1, state)
        t_long, state = run(4, state)
        del state
        return (t_long - t_short) / 3

    name = CELLS[int(sys.argv[sys.argv.index("--cell") + 1])][0]
    dt = measure()
    print(f"{name:24s} {dt/g*1e3:7.1f} ms/step "
          f"{b*g/dt:6.2f} samples/s", flush=True)


if __name__ == "__main__":
    if "--cell" in sys.argv:
        main()
    else:
        driver()
