"""Magnitude-preserving numerics core (EDM2-style), TPU-native.

These are the L0 primitives of the framework: every formula matches the
reference semantics in fp32 (reference: /root/reference/edm2/utils.py:83-158,
edm2/conv.py:8-21) but is written for JAX/XLA with channels-LAST layouts
(NHWC / NTHWC), which is the native TPU layout.

Conventions that differ from the PyTorch reference (documented divergences):
  * Tensor layout is channels-last everywhere: images are (..., H, W, C),
    videos are (B, T, H, W, C). The reference uses NCHW/NCTHW.
  * Weights are stored in XLA-native layouts: dense = (in, out),
    conv2d = (kh, kw, in, out)  [HWIO], conv3d = (kt, kh, kw, in, out)
    [DHWIO]. The *output* channel axis is always last; normalization for
    magnitude preservation reduces over every other axis (the reference
    stores (out, in, *k) and reduces over all-but-first --- same math).
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------------------
# normalize: pixel/weight norm. Reference edm2/utils.py:83-88.
# out = x / (eps + ||x||_axis * sqrt(1 / prod(reduced dims)))
def normalize(x: jax.Array, axis=None, eps: float = 1e-4) -> jax.Array:
    if axis is None:
        axis = tuple(range(1, x.ndim))
    elif isinstance(axis, int):
        axis = (axis,)
    x32 = x.astype(jnp.float32)
    # The 1e-24 inside the sqrt changes the norm by O(1e-24/norm) --
    # invisible at fp32 -- but makes the backward well-defined at an
    # exactly-zero vector (d sqrt(S)/dS at S=0 is inf, and the chain rule's
    # 0*inf is NaN; torch defines this subgradient as 0, JAX does not).
    # Zero vectors occur legitimately: the packed layout's H-padding rows
    # (ops/fused_conv.pack_x) are exactly zero, and pixel-norm in packed
    # space runs over them.
    n = jnp.sqrt(jnp.sum(x32 * x32, axis=axis, keepdims=True) + 1e-24)
    reduced = 1
    for a in axis:
        reduced *= x.shape[a]
    n = eps + n * (1.0 / math.sqrt(reduced))
    return (x32 / n).astype(x.dtype)


# ----------------------------------------------------------------------------
# Magnitude-preserving SiLU (EDM2 Eq. 81). Reference edm2/utils.py:112-113.
def mp_silu(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x) / 0.596


# ----------------------------------------------------------------------------
# bmult: broadcast multiply over leading (batch[, channel]) dims.
# Reference edm2/utils.py:153-158 -- but with channels-LAST semantics here:
#   t.ndim == 0 -> scalar multiply
#   t.ndim == 1 -> t indexed by leading (batch) axis:   (b, ...) * (b,)
#   t.ndim == 2 -> t indexed by (batch, channel-last):  (b, ..., c) * (b, c)
def bmult(x: jax.Array, t: jax.Array) -> jax.Array:
    t = jnp.asarray(t, dtype=x.dtype)
    if t.ndim == 0:
        return x * t
    if t.ndim == 1:
        return x * t.reshape(t.shape + (1,) * (x.ndim - 1))
    assert t.ndim == 2
    b, c = t.shape
    return x * t.reshape((b,) + (1,) * (x.ndim - 2) + (c,))


# ----------------------------------------------------------------------------
# Magnitude-preserving sum (EDM2 Eq. 88). Reference edm2/utils.py:118-123.
# Scalar t:  lerp(a, b, t) / sqrt((1-t)^2 + t^2)
# Tensor t:  same, with t broadcast via bmult (per-row gates).
def mp_sum(a: jax.Array, b: jax.Array, t=0.5) -> jax.Array:
    if isinstance(t, (int, float)):
        return (a + (b - a) * t) / math.sqrt((1 - t) ** 2 + t**2)
    lerp = a + bmult(b - a, t)
    return bmult(lerp, ((1 - t) ** 2 + t**2) ** (-0.5))


# ----------------------------------------------------------------------------
# Magnitude-preserving concat (EDM2 Eq. 103). Reference edm2/utils.py:128-134.
# Concatenates along `axis` (default: channel-last).
def mp_cat(a: jax.Array, b: jax.Array, axis: int = -1, t: float = 0.5) -> jax.Array:
    na, nb = a.shape[axis], b.shape[axis]
    c = math.sqrt((na + nb) / ((1 - t) ** 2 + t**2))
    wa = c / math.sqrt(na) * (1 - t)
    wb = c / math.sqrt(nb) * t
    return jnp.concatenate([wa * a, wb * b], axis=axis)


# ----------------------------------------------------------------------------
# Magnitude-preserving Fourier features (EDM2 Eq. 75).
# Reference edm2/utils.py:139-150. freqs/phases are fixed random buffers made
# at init; the forward is pure.
def mp_fourier(x: jax.Array, freqs: jax.Array, phases: jax.Array) -> jax.Array:
    y = x.astype(jnp.float32)
    y = jnp.outer(y.reshape(-1), freqs.astype(jnp.float32)).reshape(x.shape + freqs.shape)
    y = jnp.cos(y + phases.astype(jnp.float32)) * math.sqrt(2.0)
    return y.astype(x.dtype)


def mp_fourier_init(key: jax.Array, num_channels: int, bandwidth: float = 1.0):
    """freqs ~ 2*pi*N(0, bandwidth^2), phases ~ 2*pi*U[0,1)."""
    kf, kp = jax.random.split(key)
    freqs = 2 * jnp.pi * jax.random.normal(kf, (num_channels,)) * bandwidth
    phases = 2 * jnp.pi * jax.random.uniform(kp, (num_channels,))
    return freqs, phases


# ----------------------------------------------------------------------------
# Weight normalization for magnitude-preserving layers.
# Reference edm2/conv.py:8-21 (NormalizedWeight). The weight's OUTPUT channel
# axis is last here; normalization reduces over all other axes, then scales by
# gain / sqrt(fan_in). The "forced" renormalization of the raw parameter
# happens in the optimizer step (train/optim.py: forced_weight_norm), keeping
# the forward pure.
def mp_weight(w: jax.Array, gain=1.0) -> jax.Array:
    axes = tuple(range(w.ndim - 1))
    w = normalize(w, axis=axes)
    fan_in = 1
    for a in axes:
        fan_in *= w.shape[a]
    return w * (gain / math.sqrt(fan_in))


# ----------------------------------------------------------------------------
# resample: up/down-sampling with a separable binomial filter.
# Reference edm2/utils.py:94-107. x is (..., H, W, C); filter default [1,1]
# (2x2 average pool down / nearest-neighbour repeat up).
def resample(x: jax.Array, f: Sequence[float] = (1, 1), mode: str = "keep") -> jax.Array:
    if mode == "keep":
        return x
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim == 1 and len(f) % 2 == 0
    f = f / f.sum()
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    x4 = x.reshape((-1, h, w, c))
    pad = (len(f) - 1) // 2
    k2 = np.outer(f, f)  # (kf, kf)
    if mode == "down":
        if len(f) == 2:  # fast path: 2x2 average pool
            y = x4.reshape(-1, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
        else:
            kern = jnp.tile(jnp.asarray(k2, x.dtype)[:, :, None, None], (1, 1, 1, c))
            y = jax.lax.conv_general_dilated(
                x4, kern, window_strides=(2, 2), padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
        return y.reshape(lead + y.shape[1:])
    assert mode == "up"
    if len(f) != 2:
        raise NotImplementedError("only the binomial [1,1] upsampling filter is supported")
    # f*4 == ones(2,2): conv_transpose stride 2 == nearest-neighbour repeat
    y = jnp.repeat(jnp.repeat(x4, 2, axis=1), 2, axis=2)
    return y.reshape(lead + y.shape[1:])


# ----------------------------------------------------------------------------
# Heteroscedastic Gaussian NLL. Reference edm2/utils.py:209-210.
def gaussian_loss(mean: jax.Array, logvar: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((logvar + (mean - target) ** 2 * jnp.exp(-logvar)) * 0.5 + 0.918)
