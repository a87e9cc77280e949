"""Export EMA weights from a training checkpoint as a model bundle.

The reference evaluates/generates with power-function-EMA weights (the
deep-copied nets in edm2/phema.py, saved alongside the optimizer state at
gym_train.py:132-141); our TrainState carries the same EMA param trees.
This tool writes one `save_model` kwargs-bundle per requested EMA std so
`generate.py` / `rollout_drift.py` can load it like any checkpoint.

    python scripts/export_ema.py --ckpt-dir saved_models/gym_r3 \
        --cfg saved_models/gym_r3/unet_46M.ad --out saved_models/gym_r3
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", required=True, help="train-state dir")
    ap.add_argument("--cfg", required=True,
                    help="model bundle whose kwargs + buffers to reuse "
                         "(e.g. the raw-weights unet_46M.ad the same run "
                         "saved)")
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--ema", type=int, default=0,
                    help="EMA index (0 = std 0.050, 1 = std 0.100)")
    ap.add_argument("--out", default=None, help="output dir (default: ckpt dir)")
    ap.add_argument("--dtype", default="float32",
                    choices=("float32", "bfloat16", "float16"),
                    help="param dtype in the written bundle (bfloat16 halves "
                         "the file; the UNet body runs bf16 anyway and EDM2 "
                         "weights are forced-normalized, so eval quality is "
                         "unaffected)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from autoregressive_diffusion_tpu.models import Precond, UNetConfig
    from autoregressive_diffusion_tpu.train import (create_train_state,
                                                    make_optimizer)
    from autoregressive_diffusion_tpu.utils import (latest_step, load_model,
                                                    restore_train_state,
                                                    save_model)

    kwargs, variables = load_model(args.cfg)
    cfg = UNetConfig(**{k: tuple(v) if isinstance(v, list) else v
                        for k, v in kwargs.items()})
    model = Precond(cfg, sigma_data=1.0, body_dtype=jnp.bfloat16)
    # The training scripts pass a SCHEDULE to make_optimizer; a scalar lr
    # would give the adamw scale-by-lr state a different optax tree
    # structure and fail Orbax's restore-template match.
    import optax
    template = create_train_state(
        model, {"params": variables["params"],
                "buffers": variables["buffers"]},
        make_optimizer(optax.constant_schedule(1e-3), grad_clip=0.1))
    step = args.step if args.step is not None else latest_step(args.ckpt_dir)
    assert step is not None, f"no checkpoints under {args.ckpt_dir}"
    state, _ = restore_train_state(args.ckpt_dir, step, template)
    std = state.ema_stds[args.ema]
    out_dir = args.out or args.ckpt_dir
    n = sum(p.size for p in jax.tree.leaves(state.ema[args.ema]))
    dt = jnp.dtype(args.dtype)
    suffix = "" if args.dtype == "float32" else f"_{args.dtype}"
    path = os.path.join(
        out_dir, f"unet_{n // 10**6}M_ema{std:.3f}_step{step}{suffix}.ad")
    save_model(path, dict(kwargs),
               {"params": jax.tree.map(lambda p: jax.device_get(p).astype(dt),
                                       state.ema[args.ema]),
                "buffers": jax.device_get(state.buffers)})
    print(f"# wrote {path} (EMA std {std}, step {step})")


if __name__ == "__main__":
    main()
