"""Attention compute paths.

`dense_attention` is the XLA reference path (softmax(q k^T / sqrt(c)) v with an
optional boolean mask). It is used:
  * for FrameAttention / just_2d (no mask) at every scale,
  * as the correctness reference for the Pallas block-sparse kernel,
  * as the fallback when shapes are too small to tile (LunarLander scale).

The Pallas DART flash-attention kernel lives in ops/flash_attention.py and is
selected automatically by `dart_attention` when shapes are TPU-tileable.

Reference behavior being matched: F.scaled_dot_product_attention /
flex_attention in /root/reference/edm2/attention/attention_modules.py:63-75.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def dense_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    mask: Optional[jax.Array] = None) -> jax.Array:
    """q: (..., Sq, C), k/v: (..., Sk, C), mask broadcastable to (..., Sq, Sk).

    Softmax is accumulated in fp32 regardless of input dtype (TPU MXU emits
    fp32 accumulators natively).
    """
    c = q.shape[-1]
    logits = jnp.einsum("...qc,...kc->...qk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(c)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-jnp.inf))
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("...qk,...kc->...qc", w.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)
