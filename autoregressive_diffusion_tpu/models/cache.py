"""Cache construction for autoregressive rollout.

The reference builds caches lazily inside mutable dicts
(/root/reference/edm2/networks_edm2.py:191-236). Here the cache is a pytree of
FIXED-SHAPE arrays created up front, so prefill/decode steps are fully
jittable and buffers can be donated between steps:

  * conv activation ring buffers   -> init ONES (reference conv.py:68)
  * attention KV buffers (max_frames capacity) -> init zeros
  * global frame counter 'frames'  -> int32 0

The structure is derived from the model itself via jax.eval_shape, so it can
never drift from the module tree.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_cache(model, variables, batch_size: int, dtype=jnp.float32,
               with_conditioning: bool = False):
    """Build a zeroed/one-initialised cache pytree for `model` (a Precond or
    UNet Flax module with cfg attribute)."""
    cfg = model.cfg
    x = jnp.zeros((batch_size, 1, cfg.img_resolution, cfg.img_resolution,
                   cfg.img_channels), dtype)
    sigma = jnp.ones((batch_size, 1), dtype)
    cond = (jnp.zeros((batch_size, 1), jnp.int32)
            if (cfg.label_dim and with_conditioning) else None)

    def run(v):
        _, cache = model.apply(v, x, sigma, cond, cache=None,
                               update_cache=True, mode="eval")
        return cache

    shapes = jax.eval_shape(run, variables)

    def materialize(path, leaf):
        name = None
        for p in reversed(path):
            if isinstance(p, jax.tree_util.DictKey):
                name = p.key
                break
        if name == "act":
            return jnp.ones(leaf.shape, leaf.dtype)
        if name == "bias":
            # decode-attention slot-validity bias (attention.decode_tables):
            # -inf = no ring slot has been written yet
            return jnp.full(leaf.shape, -jnp.inf, leaf.dtype)
        return jnp.zeros(leaf.shape, leaf.dtype)

    return jax.tree_util.tree_map_with_path(materialize, shapes)
