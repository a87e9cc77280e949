import os, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

from autoregressive_diffusion_tpu.models import Precond, UNetConfig
from autoregressive_diffusion_tpu.train import (EDM2LossConfig, create_train_state,
                                                make_optimizer, make_scanned_train_step)
from autoregressive_diffusion_tpu.utils.profiling import trace, top_ops

cfg = UNetConfig(img_resolution=64, img_channels=8, label_dim=4,
                 model_channels=32, channel_mult=(1, 2, 4, 8),
                 num_blocks=2, video_attn_resolutions=(8,),
                 frame_attn_resolutions=(16,), max_frames=64)
model = Precond(cfg, sigma_data=1.0, body_dtype=jnp.bfloat16)
b, t, g = 8, 8, 10
x0 = jnp.zeros((b, 2 * t, 64, 64, 8))
variables = jax.jit(model.init, static_argnames=("mode",))(
    jax.random.PRNGKey(0), x0, jnp.ones((b, 2 * t)),
    jnp.zeros((b, 2 * t), jnp.int32), mode="train")
tx = make_optimizer(learning_rate=1e-3)
state = create_train_state(model, variables, tx)
step = jax.jit(make_scanned_train_step(model, EDM2LossConfig(
    P_mean=1.2, P_std=1.0, context_noise_reduction=0.5), tx,
    batch_size=b), static_argnames=("just_2d",))
images = jax.random.normal(jax.random.PRNGKey(1), (g, b, t, 64, 64, 8))
cond = jnp.zeros((g, b, t), jnp.int32)
print("# compiling + warm step...", flush=True)
state, metrics = step(state, images, cond, jax.random.PRNGKey(0))
float(metrics["loss"])
print("# warm step done; tracing...", flush=True)

logdir = "/tmp/jax-trace-train"
with trace(logdir):
    state, metrics = step(state, images, cond, jax.random.PRNGKey(1))
    float(metrics["loss"])
print("# trace captured; parsing...", flush=True)

tot = 0.0
rows = top_ops(logdir, n=40)
for ms, cnt, name, long in rows:
    tot += ms
    print(f"{ms:9.3f} ms x{cnt:4d}  {name}  | {long[:110]}")
print(f"TOTAL(top40): {tot:.1f} ms for {g} steps of batch {b}")
