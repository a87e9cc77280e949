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
              coefs: Optional[jax.Array] = None, just_2d: bool = False):
    """images: (b, t, h, w, c) latents. Returns (scalar_loss, aux) where aux
    carries the per-frame sigmas and weighted losses for the loss-fit history
    plus the unweighted mean (reference loss.py:17-47)."""
    b, t = images.shape[:2]
    k_sig, k_ctx, k_noise = jax.random.split(key, 3)

    sigma_noisy = jnp.exp(
        jax.random.normal(k_sig, (b, t)) * cfg.P_std + cfg.P_mean)
    if just_2d:
        cat_images = images
        sigma = sigma_noisy
        cond = conditioning
    else:
        cat_images = jnp.concatenate([images, images], axis=1)
        sigma_ctx = (jax.random.uniform(k_ctx, (b, 1))
                     * cfg.context_noise_reduction)
        sigma_ctx = jnp.broadcast_to(sigma_ctx, (b, t))
        sigma = jnp.concatenate([sigma_ctx, sigma_noisy], axis=1)
        cond = (jnp.concatenate([conditioning, conditioning], axis=1)
                if conditioning is not None else None)

    noise = sigma[:, :, None, None, None] * jax.random.normal(
        k_noise, cat_images.shape, cat_images.dtype)
    out, _ = model.apply(variables, cat_images + noise, sigma, cond,
                         mode="train", just_2d=just_2d)
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
