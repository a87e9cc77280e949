"""Decode-floor budget (VERDICT r3 weak #5): quantify WHY the batch-1
autoregressive rollout runs at the frames/s it does, instead of the
qualitative "op-count bound" claim.

For the flagship rollout configuration (64-step Heun sampler = 128 NFE per
frame, int8 decode weights) this prints, per NFE:

  * FLOPs and HBM bytes from XLA's own cost model (compiled.cost_analysis()),
  * the MXU-bound and HBM-bound time floors they imply,
  * the number of HLO instructions / fusions in the compiled sampler module
    (~ kernel launches per NFE),
  * the measured per-NFE time (marginal-cost timing, forced fetch),
  * the residual attributable to per-kernel dispatch overhead.

Usage: python tools/decode_budget.py [--num-steps 64] [--guidance 1.0]
"""
import argparse
import os
import re
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

PEAK_BF16_FLOPS = 197e12   # v5e chip
HBM_GBPS = 820e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-steps", type=int, default=64)
    ap.add_argument("--guidance", type=float, default=1.0)
    ap.add_argument("--quant", type=int, default=1)
    ap.add_argument("--frames", type=int, default=9, help="timed rollout len")
    args = ap.parse_args()

    from autoregressive_diffusion_tpu.models import Precond, UNetConfig
    from autoregressive_diffusion_tpu.models.cache import init_cache
    from autoregressive_diffusion_tpu.sampling.sampler import edm_sampler
    from autoregressive_diffusion_tpu.train import (forced_weight_norm,
                                                    quantize_variables,
                                                    quantized_config)

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
    if args.quant:
        variables = dict(variables,
                         params=forced_weight_norm(variables["params"]))
        variables = quantize_variables(variables)
        model = Precond(quantized_config(cfg), sigma_data=1.0,
                        body_dtype=jnp.bfloat16)

    prefill = jax.jit(partial(model.apply, mode="eval", update_cache=True))
    cache = init_cache(model, variables, batch_size=b)
    _, cache = prefill(variables, x, sig, cond, cache=cache)

    n = args.num_steps
    nfe_per_frame = 2 * n - 1  # Heun: 2 denoiser calls/step, last step Euler
    if args.guidance != 1.0:
        nfe_per_frame *= 2     # + just_2d reference pass per denoise
    sample = jax.jit(partial(edm_sampler, model, num_steps=n,
                             sigma_min=0.4, sigma_max=80.0, rho=2.0,
                             guidance=args.guidance),
                     static_argnames=("shape",))
    shape = (b, 1, 64, 64, 8)

    lowered = sample.lower(variables, cache, jax.random.PRNGKey(1),
                           shape=shape, conditioning=cond[:, :1])
    compiled = lowered.compile()

    # ---- static budget from the compiled module -------------------------
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", float("nan")))
        bytes_ = float(ca.get("bytes accessed", float("nan")))
    except Exception as e:
        flops = bytes_ = float("nan")
        print(f"# cost_analysis unavailable: {type(e).__name__}: {e}")

    hlo = compiled.as_text()
    dump = os.environ.get("AD_DUMP_HLO")
    if dump:
        with open(dump, "w") as fh:
            fh.write(hlo)
        print(f"# wrote compiled HLO to {dump}")
    n_fusion = len(re.findall(r"^\s*(?:ROOT\s+)?%?fusion[.\d]*\s*=", hlo,
                              re.M))
    n_custom = len(re.findall(r"custom-call", hlo))
    n_instr = len(re.findall(r"^\s+%", hlo, re.M))
    # the sampler body is a scan: while-loop body executes (num_steps-1)x;
    # count instructions inside the loop body module separately
    body_m = re.search(r"%while_body[^{]*\{(.*?)\n\}", hlo, re.S)
    body_instr = len(re.findall(r"^\s+%", body_m.group(1), re.M)) if body_m else 0

    print(f"# sampler: {n} steps, {nfe_per_frame} NFE/frame, "
          f"guidance={args.guidance}, int8={bool(args.quant)}")
    print(f"# compiled module: {n_instr} HLO instrs total, {n_fusion} "
          f"fusions, {n_custom} custom-calls; scan body {body_instr} instrs")
    if flops == flops:
        print(f"# XLA cost model / frame: {flops/1e9:.2f} GFLOP, "
              f"{bytes_/1e6:.1f} MB accessed")
        print(f"#   per NFE: {flops/nfe_per_frame/1e9:.3f} GFLOP, "
              f"{bytes_/nfe_per_frame/1e6:.2f} MB")
        t_mxu = flops / PEAK_BF16_FLOPS / nfe_per_frame
        t_hbm = bytes_ / HBM_GBPS / nfe_per_frame
        print(f"#   floors per NFE: MXU {t_mxu*1e6:.1f} us, "
              f"HBM {t_hbm*1e6:.1f} us")

    # ---- measured -------------------------------------------------------
    key = jax.random.PRNGKey(2)
    xw, _, _, _ = sample(variables, cache, key, shape=shape,
                         conditioning=cond[:, :1])
    float(xw.sum())

    def run(n_frames, key):
        c = cache
        t0 = time.perf_counter()
        for _ in range(n_frames):
            key, k = jax.random.split(key)
            xf, _, _, c = sample(variables, c, k, shape=shape,
                                 conditioning=cond[:, :1])
        float(xf.sum())
        return time.perf_counter() - t0

    run(1, key)
    t_short = run(1, key)
    t_long = run(args.frames, key)
    dt = (t_long - t_short) / (args.frames - 1)
    per_nfe = dt / nfe_per_frame
    print(f"# measured: {1/dt:.2f} frames/s, {dt*1e3:.2f} ms/frame, "
          f"{per_nfe*1e6:.1f} us/NFE")
    if flops == flops:
        t_mxu = flops / PEAK_BF16_FLOPS / nfe_per_frame
        t_hbm = bytes_ / HBM_GBPS / nfe_per_frame
        resid = per_nfe - max(t_mxu, t_hbm)
        # ~launches per NFE ~ scan-body instr share; fusions is the closest
        # static proxy we have for dispatched kernels
        per_launch = resid / max(body_instr, 1) * (2 * n - 2) / nfe_per_frame
        print(f"# residual over roofline: {resid*1e6:.1f} us/NFE "
              f"(dispatch/launch + non-overlapped small ops)")
    print(f"# scan-body instrs per NFE (2 NFE/body iter): {body_instr/2:.0f}")


if __name__ == "__main__":
    main()
