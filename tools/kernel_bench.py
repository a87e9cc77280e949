"""Stage-isolated kernel timings on the real chip.

Device traces wedge this environment's tunneled runtime (ROADMAP round-3),
so this is the per-stage proxy that makes the MFU story falsifiable at
finer grain than end-to-end ablations (VERDICT r4 weak #8): each fused
gated-conv shape of the gym flagship config is timed in isolation --
forward and forward+backward, Pallas kernel vs the XLA module path -- and
reported against its own MXU roofline.

Usage (on the chip):  python tools/kernel_bench.py [--csv out.csv]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

from autoregressive_diffusion_tpu.ops import fused_conv as fc
from autoregressive_diffusion_tpu.utils.profiling import benchmark

PEAK_TFLOPS = 197.0  # v5e bf16


def gym_fused_shapes(b=8, t=8):
    """(name, b, t, h, w, cin, cout) for every train-mode conv the gym
    flagship routes through the fused kernel (Cp <= 96 gate): the level-0
    stem + both 32-channel levels and the 64-channel level.
    Derived from UNetConfig(model_channels=32, channel_mult=(1,2,4,8),
    img_resolution=64, num_blocks=2)."""
    return [
        ("stem 9->32 @64", b, t, 64, 64, 9, 32),
        ("enc0 32->32 @64", b, t, 64, 64, 32, 32),
        ("enc1 32->64 @32", b, t, 32, 32, 32, 64),
        ("lvl1 64->64 @32", b, t, 32, 32, 64, 64),
        ("dec0 64->32 @64", b, t, 64, 64, 64, 32),
        ("dec0 96->32 @64", b, t, 64, 64, 96, 32),  # skip-cat inputs
    ]


def conv_flops(b, t, h, w, cin, cout):
    """Matmul FLOPs: 2D conv on both DART halves + 18-tap context conv on
    the clean half."""
    hw = h * w
    f2d = 2 * (b * 2 * t * hw) * 9 * cin * cout
    fctx = 2 * (b * t * hw) * 18 * cin * cout
    return f2d + fctx


def xla_gated_conv(x, w2, w3, cvec, gates, silu_in=True):
    """The module's unfused XLA path (layers.py:243-309) at matched math:
    transform -> 2D conv -> channel-concat context conv -> mp_sum blend."""
    b, t2, h, w, cin = x.shape
    t = t2 // 2
    cout = w2.shape[-1]
    if cvec is not None:  # (b, t, 2, cin) fused layout -> (b, 2t, cin)
        cv = cvec.transpose(0, 2, 1, 3).reshape(b, t2, cin)
        x = x * cv[:, :, None, None, :].astype(x.dtype)
    if silu_in:
        x = jax.nn.silu(x) / 0.596
    y2d = jax.lax.conv_general_dilated(
        x.reshape(-1, h, w, cin), w2.astype(x.dtype), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y2d = y2d.reshape(b, t2, h, w, cout)
    clean = x[:, :t]
    pad = jnp.ones((b, 2, h, w, cin), x.dtype)
    ctx_in = jnp.concatenate([pad, clean], axis=1)[:, :-1]
    xs = jnp.concatenate([ctx_in[:, j:j + t] for j in range(2)], axis=-1)
    wcat = w3.transpose(1, 2, 0, 3, 4).reshape(3, 3, 2 * cin, cout)
    ctx = jax.lax.conv_general_dilated(
        xs.reshape(-1, h, w, 2 * cin), wcat.astype(x.dtype), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ctx = ctx.reshape(b, t, h, w, cout)
    ctx = jnp.concatenate([ctx, ctx], axis=1)
    g = jnp.concatenate([gates[..., 0], gates[..., 1]], axis=1)
    g = g[:, :, None, None, None]
    s = jax.lax.rsqrt((1 - g) ** 2 + g ** 2)
    return (y2d + (ctx - y2d) * g) * s


def _marginal(step, x0, target_s=4.0):
    """On-device chained marginal-cost timing: a DYNAMIC-length
    lax.fori_loop runs n data-dependent iterations of `step` in ONE
    dispatch (one compile; host/tunnel RTT jitter subtracts out in the
    marginal), each run ends in a forced host fetch, and n is auto-scaled
    so the marginal work is ~target_s seconds -- tunnel fetch-time jitter
    is tens of ms, so the signal must be O(seconds) (same recipe as
    bench.py)."""
    import time

    @jax.jit
    def chain(x, n):
        return jax.lax.fori_loop(0, n, lambda i, xx: step(xx), x)

    def run(n):
        t0 = time.perf_counter()
        out = chain(x0, jnp.int32(n))
        np.asarray(jax.device_get(jax.tree.leaves(out)[0]))
        return time.perf_counter() - t0

    run(2)  # compile
    # pilot must itself be a MARGINAL: a single run's wall time is
    # dominated by the fixed ~100ms tunnel dispatch+fetch overhead, which
    # would inflate the per-iter estimate ~40x and make n_long uselessly
    # short
    t16, t128 = run(16), run(128)
    rough = max((t128 - t16) / 112, 2e-7)
    n_long = int(min(max(target_s / rough, 256), 100_000))
    n_short = max(n_long // 8, 1)
    run(n_short)
    best = min((run(n_long) - run(n_short)) / (n_long - n_short)
               for _ in range(3))
    return best


def bench_shape(name, b, t, h, w, cin, cout, iters=200):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (b, 2 * t, h, w, cin), dt)
    w2 = jax.random.normal(ks[1], (3, 3, cin, cout), jnp.float32)
    w3 = jax.random.normal(ks[2], (2, 3, 3, cin, cout), jnp.float32)
    cv = jax.random.normal(ks[3], (b, t, 2, cin), jnp.float32)
    gates = jax.random.uniform(ks[4], (b, t, 2), jnp.float32)
    xp = jax.jit(lambda a: fc.pack_x(a, h, w))(x)

    @jax.jit
    def fwd(xp):
        out = fc.fused_gated_conv(xp, w2, w3, cv, gates, h, w, True, True)
        return xp * (1 + 1e-6 * jnp.mean(out.astype(jnp.float32))
                     ).astype(xp.dtype)

    def _consume(xp, g):
        # keep ALL grads live (weight grads would otherwise be DCE'd in the
        # XLA cell, skewing the comparison) while chaining on dx
        s = sum(jnp.sum(t.astype(jnp.float32)) for t in g[1:])
        return xp + 1e-6 * g[0].astype(xp.dtype) \
            + (1e-20 * s).astype(xp.dtype)

    @jax.jit
    def fwdbwd(xp):
        def loss(a, *ws):
            # sum(out**2): the cotangent 2*out is LOOP-VARIANT, so XLA
            # cannot hoist the backward out of the timing fori_loop (with
            # sum(out) the cotangent is constant and most of the XLA
            # backward is loop-invariant -> fake 300+ TF/s readings)
            o = fc.fused_gated_conv(a, *ws, h, w, True, True)
            return jnp.sum(o.astype(jnp.float32) ** 2)
        g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(xp, w2, w3, cv, gates)
        return _consume(xp, g)

    @jax.jit
    def xfwd(x):
        out = xla_gated_conv(x, w2, w3, cv, gates)
        return x * (1 + 1e-6 * jnp.mean(out.astype(jnp.float32))
                    ).astype(x.dtype)

    @jax.jit
    def xfwdbwd(x):
        def loss(a, *ws):
            return jnp.sum(xla_gated_conv(a, *ws).astype(jnp.float32) ** 2)
        g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, w2, w3, cv, gates)
        return _consume(x, g)

    rows = []
    fl = conv_flops(b, t, h, w, cin, cout)
    for tag, fn, x0, mult in (
            ("pallas fwd", fwd, xp, 1),
            ("pallas f+b", fwdbwd, xp, 3),
            ("xla fwd", xfwd, x, 1),
            ("xla f+b", xfwdbwd, x, 3)):
        sec = _marginal(fn, x0)
        us = sec * 1e6
        tf = mult * fl / sec / 1e12
        rows.append((name, tag, us, tf, 100 * tf / PEAK_TFLOPS))
        print(f"{name:18s} {tag:10s} {us:9.1f} us  {tf:7.2f} TF/s "
              f"({100 * tf / PEAK_TFLOPS:5.1f}% peak)", flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()
    dev = jax.devices()[0]
    print(f"# device: {dev.platform}:{dev.device_kind}", flush=True)
    all_rows = []
    for shape in gym_fused_shapes():
        all_rows += bench_shape(*shape, iters=args.iters)
    if args.csv:
        with open(args.csv, "w") as f:
            f.write("shape,path,us,tflops,pct_peak\n")
            for r in all_rows:
                f.write(",".join(str(v) for v in r) + "\n")
        print(f"# wrote {args.csv}")


if __name__ == "__main__":
    main()
