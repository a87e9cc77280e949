"""xPos-scaled rotary embedding over the FRAME (time) axis.

Functional reimplementation of /root/reference/edm2/attention/RoPe.py:5-75.
Tables are computed in fp32 (the reference uses fp16; fp32 is both faster and
more accurate on TPU --- parity tests run in fp32).

The xPos scale is centred at `center` (= seq_len // 2 in the reference). The
centre cancels exactly in q.k^T products, so attention outputs are invariant
to it; we keep it for magnitude parity with the reference tensors.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rope_tables(head_dim: int, positions: jax.Array, center, scale_base: float = 64.0):
    """cos/sin/scale tables for the given (possibly traced) frame positions.

    positions: (P,) array of absolute frame indices.
    center: scalar (may be traced) -- the xPos pivot.
    Returns cos, sin, scale each of shape (P, head_dim), fp32.
    """
    half = head_dim // 2
    inv_freq = jnp.asarray(1.0 / (10000.0 ** (np.arange(0, head_dim, 2) / head_dim)),
                           dtype=jnp.float32)
    pos = positions.astype(jnp.float32)
    freqs = pos[:, None] * inv_freq[None, :]
    freqs = jnp.concatenate([freqs, freqs], axis=-1)
    scale_vec = jnp.asarray((np.arange(0, head_dim, 2) + 0.4 * head_dim) / (1.4 * head_dim),
                            dtype=jnp.float32)
    power = (pos - jnp.asarray(center, jnp.float32)) / scale_base
    scale = jnp.exp(power[:, None] * jnp.log(scale_vec)[None, :])
    scale = jnp.concatenate([scale, scale], axis=-1)
    return jnp.cos(freqs), jnp.sin(freqs), scale


def rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array, scale: jax.Array) -> jax.Array:
    """x: (..., T, HW, C) with tables (T, C); q uses scale, k uses 1/scale."""
    dt = x.dtype
    cos = cos[:, None, :].astype(dt)
    sin = sin[:, None, :].astype(dt)
    scale = scale[:, None, :].astype(dt)
    return (x * cos + rotate_half(x) * sin) * scale


def rope_qk(q: jax.Array, k: jax.Array, q_positions: jax.Array, k_positions: jax.Array,
            center, scale_base: float = 64.0):
    """Rotate q (scale^+1) and k (scale^-1) with absolute frame positions.

    q: (..., Tq, HW, C), k: (..., Tk, HW, C).
    """
    head_dim = q.shape[-1]
    cos_k, sin_k, scale_k = rope_tables(head_dim, k_positions, center, scale_base)
    k = apply_rope(k, cos_k, sin_k, 1.0 / scale_k)
    cos_q, sin_q, scale_q = rope_tables(head_dim, q_positions, center, scale_base)
    q = apply_rope(q, cos_q, sin_q, scale_q)
    return q, k
