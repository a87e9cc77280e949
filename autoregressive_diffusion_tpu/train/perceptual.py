"""Perceptual loss substitute for LPIPS.

The reference uses alexnet-LPIPS (/root/reference/cs_vae_train.py:81,
cs_vae_adversarial.py) which has no JAX implementation and whose calibrated
weights are unavailable in this environment (documented divergence,
SURVEY.md section 7 "LPIPS"). This module provides:

  * `random_feature_perceptual_loss`: distance in the feature space of a
    FIXED random multi-scale conv net (random-feature perceptual metrics
    correlate well with trained ones for reconstruction training), with the
    same log-compression the reference applies (log(lpips + eps)).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=4)
def _random_filters(seed: int, in_ch: int, widths=(32, 64, 64)):
    rng = np.random.default_rng(seed)
    filters = []
    c = in_ch
    for w in widths:
        f = rng.normal(size=(3, 3, c, w)).astype(np.float32)
        f /= np.sqrt((f**2).sum(axis=(0, 1, 2), keepdims=True)) + 1e-8
        filters.append(f)
        c = w
    return tuple(filters)


def _features(x, filters):
    feats = []
    for f in filters:
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(f), window_strides=(2, 2),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.leaky_relu(x, 0.2)
        # unit-normalize channels like LPIPS
        feats.append(x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8))
    return feats


def random_feature_perceptual_loss(recon: jax.Array, frames: jax.Array,
                                   seed: int = 0, log_compress: bool = True,
                                   eps: float = 1e-8) -> jax.Array:
    """recon/frames: (b, t, h, w, c) in [-1, 1]. Per-frame perceptual
    distance, log-compressed and averaged (reference cs_vae_train.py:
    110-121)."""
    b, t = frames.shape[:2]
    x = jnp.clip(recon, -1, 1).reshape((b * t,) + recon.shape[2:])
    y = jnp.clip(frames, -1, 1).reshape((b * t,) + frames.shape[2:])
    filters = _random_filters(seed, frames.shape[-1])
    fx, fy = _features(x, filters), _features(y, filters)
    per_frame = sum(jnp.mean((a - b) ** 2, axis=(1, 2, 3)) for a, b in zip(fx, fy))
    if log_compress:
        return jnp.mean(jnp.log(per_frame + eps))
    return jnp.mean(per_frame)
