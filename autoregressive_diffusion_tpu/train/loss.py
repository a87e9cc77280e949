"""DART training loss + LR schedule.

Reimplementation of /root/reference/edm2/loss.py (EDM2Loss :9-47,
learning_rate_schedule :63-69, top_losses :52-58) as pure jittable
functions with explicit PRNG keys. The MultiNoiseLoss statefulness is
externalized: the loss takes the current Fourier coefficients as input and
returns the (sigma, weighted-loss) pairs for the host-side history.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .loss_weight import fourier_eval


@dataclasses.dataclass(frozen=True)
class EDM2LossConfig:
    P_mean: float = 0.5
    P_std: float = 2.0
    sigma_data: float = 1.0
    context_noise_reduction: float = 0.1

    def __post_init__(self):
        assert 0 <= self.context_noise_reduction <= 1


def edm2_loss(model, variables, images: jax.Array, key: jax.Array,
              cfg: EDM2LossConfig, conditioning: Optional[jax.Array] = None,
              coefs: Optional[jax.Array] = None, just_2d: bool = False,
              sample_offset=0, sigma: Optional[jax.Array] = None,
              noise: Optional[jax.Array] = None):
    """images: (b, t, h, w, c) latents. Returns (scalar_loss, aux) where aux
    carries the per-frame sigmas and weighted losses for the loss-fit history
    plus the unweighted mean (reference loss.py:17-47).

    sigma/noise are drawn from PER-SAMPLE keys `fold_in(key, sample_offset+i)`
    so gradient accumulation over microbatch slices (train_state.py) samples
    exactly what the full batch would -- scan-accumulation == full-batch step
    is testable (and tested). Dropout (if enabled) is the one exception: its
    mask is drawn per forward call, not per sample.

    Passing `sigma` (b, 2t or t) and `noise` (same shape as the DART concat)
    bypasses the sampling -- the reference's own `sigma=None` injection hook
    (loss.py:25), used by the golden parity tests.
    """
    b, t = images.shape[:2]
    k_drop = jax.random.fold_in(key, 0x7FFFFFFF)

    if just_2d:
        cat_images = images
        cond = conditioning
    else:
        cat_images = jnp.concatenate([images, images], axis=1)
        cond = (jnp.concatenate([conditioning, conditioning], axis=1)
                if conditioning is not None else None)

    def draw(i):
        k_sig, k_ctx, k_noise = jax.random.split(jax.random.fold_in(key, i), 3)
        sig_noisy = jnp.exp(
            jax.random.normal(k_sig, (t,)) * cfg.P_std + cfg.P_mean)
        if just_2d:
            sig = sig_noisy
        else:
            sig_ctx = (jax.random.uniform(k_ctx, ())
                       * cfg.context_noise_reduction)
            sig = jnp.concatenate(
                [jnp.broadcast_to(sig_ctx, (t,)), sig_noisy])
        eps = jax.random.normal(k_noise, cat_images.shape[1:],
                                cat_images.dtype)
        return sig, eps

    if sigma is None:
        sigma, eps = jax.vmap(draw)(sample_offset + jnp.arange(b))
        noise = sigma[:, :, None, None, None] * eps
    elif noise is None:
        eps = jax.random.normal(jax.random.fold_in(key, 0),
                                cat_images.shape, cat_images.dtype)
        noise = sigma[:, :, None, None, None] * eps
    out, _ = model.apply(variables, cat_images + noise, sigma, cond,
                         mode="train", just_2d=just_2d,
                         rngs={"dropout": k_drop})
    denoised = out[:, -t:]
    errors = (denoised - images) ** 2
    losses = jnp.mean(errors, axis=(-1, -2, -3))  # (b, t)

    sig = sigma[:, -t:]
    sd = cfg.sigma_data
    weight = (sig**2 + sd**2) / (sig * sd) ** 2
    losses = losses * weight
    unweighted = jnp.mean(losses)

    mean_loss = fourier_eval(coefs, sig) if coefs is not None else 1.0
    normalized = jnp.mean(losses / mean_loss)
    aux = dict(sigma=sig, losses=losses, unweighted=unweighted)
    return normalized, aux


def top_losses(errors: jax.Array, fraction: float) -> jax.Array:
    """Mean of the top-k pixel errors + overall mean (reference :52-58,
    unused alternative). errors: (b, t, h, w, c)."""
    e = jnp.mean(errors, axis=-1).reshape(errors.shape[0], errors.shape[1], -1)
    k = int(e.shape[-1] * e.shape[-2] * fraction)
    top_k = jax.lax.top_k(e, k)[0]
    return jnp.mean(top_k, axis=-1) + jnp.mean(e, axis=-1)


def learning_rate_schedule(step, ref_lr: float = 1e-2, ref_step: float = 7e4,
                           rampup_steps: float = 1e3):
    """EDM2 inverse-sqrt decay + linear rampup (reference loss.py:63-69).
    Traceable: usable both as an optax schedule and with python ints."""
    step = jnp.asarray(step, jnp.float32)
    lr = jnp.asarray(ref_lr, jnp.float32)
    if ref_step > 0:
        lr = lr / jnp.sqrt(jnp.maximum(step / ref_step, 1.0))
    if rampup_steps > 0:
        lr = lr * jnp.minimum(step / rampup_steps, 1.0)
    return lr
