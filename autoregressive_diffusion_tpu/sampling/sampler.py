"""EDM (Karras) stochastic sampler with cache-carried autoregressive decode.

Reimplementation of /root/reference/edm2/sampler.py:12-85
(edm_sampler_with_mse) as a jit-compilable function: the rho-schedule and
churn coefficients are precomputed statically (numpy), the Euler+Heun loop is
a lax.scan, and the final step updates the fixed-shape KV/conv cache so the
finished frame enters the context (reference :66).

One call generates ONE frame of shape (b, 1, h, w, c) given the cache.
`generate` rolls out N frames with a python loop over jitted single-frame
samplers (cache shapes are static, so the jit cache hits every frame).
"""
from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def karras_schedule(num_steps: int, sigma_min: float, sigma_max: float,
                    rho: float) -> np.ndarray:
    """t_i = (smax^(1/rho) + i/(N-1)(smin^(1/rho)-smax^(1/rho)))^rho, then a
    terminal 0 (reference sampler.py:35-38)."""
    i = np.arange(num_steps, dtype=np.float64)
    t = (sigma_max ** (1 / rho)
         + i / (num_steps - 1) * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))) ** rho
    return np.concatenate([t, [0.0]]).astype(np.float32)


def edm_sampler(model, variables, cache, key, shape, conditioning=None,
                num_steps: int = 32, sigma_min: float = 0.002,
                sigma_max: float = 80.0, rho: float = 7.0,
                guidance: float = 1.0, S_churn: float = 0.0,
                S_min: float = 0.0, S_max: float = float("inf"),
                S_noise: float = 1.0, update_cache: bool = True,
                target: Optional[jax.Array] = None,
                x_init: Optional[jax.Array] = None):
    """Sample one frame. Returns (x, mse_values, mse_pred_values, cache).

    `shape` = (b, 1, h, w, c) static. `target`, if given, is added to the
    initial noise and per-step MSEs are tracked (reference :45-47, :77-82);
    cache is then NOT updated (reference :66). `x_init` injects the initial
    noise (already scaled by sigma_max) instead of drawing it -- used by the
    golden parity tests to replay a recorded reference trajectory.
    """
    b = shape[0]
    t_steps = karras_schedule(num_steps, sigma_min, sigma_max, rho)

    # static churn coefficients per step (reference :57-63)
    gamma = np.zeros(num_steps, np.float32)
    if S_churn > 0:
        g = min(S_churn / num_steps, math.sqrt(2) - 1)
        sel = (t_steps[:-1] >= S_min) & (t_steps[:-1] <= S_max)
        gamma[sel] = g
    t_hats = t_steps[:-1] * (1.0 + gamma)
    churn_scale = np.sqrt(np.maximum(t_hats**2 - t_steps[:-1] ** 2, 0.0)) * S_noise

    def denoise(x, t, cache, do_update):
        sigma = jnp.full((b, 1), t, jnp.float32)
        d_x, cache = model.apply(variables, x, sigma, conditioning,
                                 cache=cache, update_cache=do_update,
                                 mode="eval")
        if guidance == 1.0:
            return d_x, cache
        ref_dx, _ = model.apply(variables, x, sigma, conditioning,
                                mode="eval", just_2d=True)
        return ref_dx + (d_x - ref_dx) * guidance, cache

    key, k0 = jax.random.split(key)
    if x_init is None:
        x_next = jax.random.normal(k0, shape, jnp.float32) * float(t_steps[0])
    else:
        x_next = x_init.astype(jnp.float32)
    if target is not None:
        x_next = x_next + target.astype(jnp.float32)

    def step(carry, inp):
        x_cur, key = carry
        t_cur, t_hat, c_scale, t_next = inp
        key, kn = jax.random.split(key)
        x_hat = x_cur + c_scale * jax.random.normal(kn, shape, jnp.float32)
        x_pred, _ = denoise(x_hat, t_hat, cache, False)
        d_cur = (x_hat - x_pred) / t_hat
        x_nxt = x_hat + (t_next - t_hat) * d_cur
        # 2nd-order Heun correction (applies to all but the last step;
        # the last step runs outside the scan)
        x_pred2, _ = denoise(x_nxt, t_next, cache, False)
        d_prime = (x_nxt - x_pred2) / t_next
        x_nxt = x_hat + (t_next - t_hat) * (0.5 * d_cur + 0.5 * d_prime)
        mse_pred = jnp.mean((x_pred2 - target) ** 2) if target is not None else jnp.float32(0)
        mse = jnp.mean((x_nxt - target) ** 2) if target is not None else jnp.float32(0)
        return (x_nxt, key), (mse, mse_pred)

    xs = jnp.stack([jnp.asarray(t_steps[:-2]), jnp.asarray(t_hats[:-1]),
                    jnp.asarray(churn_scale[:-1]), jnp.asarray(t_steps[1:-1])], axis=1)
    (x_cur, key), (mses, mses_pred) = jax.lax.scan(
        lambda c, r: step(c, (r[0], r[1], r[2], r[3])), (x_next, key), xs)

    # final step: Euler only, cache update iff no target (reference :66)
    i = num_steps - 1
    key, kn = jax.random.split(key)
    x_hat = x_cur + float(churn_scale[i]) * jax.random.normal(kn, shape, jnp.float32)
    t_hat = float(t_hats[i])
    do_update = update_cache and target is None
    x_pred, cache = denoise(x_hat, t_hat, cache, do_update)
    d_cur = (x_hat - x_pred) / t_hat
    x_next = x_hat + (0.0 - t_hat) * d_cur

    if target is not None:
        mse_last = jnp.mean((x_next - target) ** 2)
        mses = jnp.concatenate([mses, mse_last[None]])
        mses_pred = jnp.concatenate([mses_pred, jnp.mean((x_pred - target) ** 2)[None]])
    return x_next, mses, mses_pred, cache


@lru_cache(maxsize=32)
def _jitted_sampler(model, **static_kwargs):
    """Module-level cache of jitted per-frame samplers keyed on (model,
    scalar sampler kwargs). A fresh `jax.jit(partial(...))` per generate()
    call would be a new function identity each time -> in-process retrace on
    every call (only the persistent compile cache saved it). Flax modules
    are frozen dataclasses, hence hashable; sampler kwargs are scalars."""
    return jax.jit(partial(edm_sampler, model, **static_kwargs),
                   static_argnames=("shape",))


def generate(model, variables, cache, key, n_frames: int, shape,
             conditioning=None, **sampler_kwargs):
    """Autoregressive rollout: sample `n_frames` frames, each entering the
    cache (reference sampler_training_callback, sampler.py:130-135).

    Returns (frames (b, n_frames, h, w, c), cache). The per-frame sampler is
    jitted once PER (model, kwargs) ACROSS calls (module-level lru_cache, so
    a second generate() call compiles nothing); all frames within a call
    reuse the compiled step because cache shapes are fixed.
    """
    sampler_kwargs.setdefault("num_steps", 32)
    fn = _jitted_sampler(model, **sampler_kwargs)
    frames = []
    for _ in range(n_frames):
        key, k = jax.random.split(key)
        x, _, _, cache = fn(variables, cache, k, shape=shape,
                            conditioning=conditioning)
        frames.append(x)
    return jnp.concatenate(frames, axis=1), cache


def make_sampler_callback(model, num_mse_steps: int = 32,
                          n_context: int = 4, n_prefill: int = 2,
                          n_rollout: int = 4, sigma_prefill: float = 0.05):
    """Eval-time training feedback (reference sampler.py:91-146
    `sampler_training_callback`, wired at gym_train.py:115-130).

    Returns callback(variables, latents, key) -> (mse_steps, mse_pred,
    rollout_latents):
      1. prefill `n_context` frames at sigma=0.05, then denoise the next
         frame with per-step MSE against the ground truth (sigma_max=3,
         32 steps, S_churn=20 -- reference :100-112);
      2. prefill `n_prefill` frames and roll out `n_rollout` frames
         autoregressively (sigma_max=80 -- reference :127-132), returning
         (prefill + generated) latents for VAE decode by the caller.

    All device functions are jitted ONCE here; calling the callback every
    dashboard interval reuses the compiled executables.
    """
    from ..models.cache import init_cache

    # prefill_offset=0 (STATIC): both callback prefills start from a fresh
    # cache, so the frame counter is statically 0 -- the hint lets
    # VideoAttention route through the splash prefill kernel instead of the
    # dense (t*hw)x(f*hw) fallback (models/attention.py warm-prefill path)
    prefill = jax.jit(partial(model.apply, mode="eval", update_cache=True,
                              prefill_offset=0))
    mse_sampler = jax.jit(
        partial(edm_sampler, model, num_steps=num_mse_steps, sigma_max=3.0,
                rho=7.0, S_churn=20.0, update_cache=False),
        static_argnames=("shape",))
    roll_sampler = jax.jit(
        partial(edm_sampler, model, num_steps=num_mse_steps, sigma_max=80.0,
                rho=7.0, S_churn=20.0),
        static_argnames=("shape",))

    def callback(variables, latents, key):
        lat = latents[:1]  # one sample is enough for the dashboard
        b, t_lat, h, w, c = lat.shape
        shape = (b, 1, h, w, c)
        n_ctx = min(n_context, t_lat - 1)  # clamp for short clips

        # (1) per-step denoising MSE against a held-out frame
        ctx, target = lat[:, :n_ctx], lat[:, n_ctx:n_ctx + 1]
        sig = jnp.full((b, n_ctx), sigma_prefill, jnp.float32)
        cache = init_cache(model, variables, batch_size=b)
        _, cache = prefill(variables, ctx, sig, cache=cache)
        key, k = jax.random.split(key)
        _, mses, mses_pred, _ = mse_sampler(variables, cache, k, shape=shape,
                                            target=target)

        # (2) autoregressive rollout from a short prefill
        n_pre = min(n_prefill, t_lat)
        pre = lat[:, :n_pre]
        sigp = jnp.full((b, n_pre), sigma_prefill, jnp.float32)
        cache = init_cache(model, variables, batch_size=b)
        _, cache = prefill(variables, pre, sigp, cache=cache)
        frames = [pre]
        for _ in range(n_rollout):
            key, k = jax.random.split(key)
            x, _, _, cache = roll_sampler(variables, cache, k, shape=shape)
            frames.append(x)
        rollout = jnp.concatenate(frames, axis=1)
        return np.asarray(mses), np.asarray(mses_pred), rollout

    return callback
