"""Optimizer assembly: AdamW + global-norm clip + forced weight normalization.

The reference renormalizes NormalizedWeight parameters in place during every
training forward (/root/reference/edm2/conv.py:15-19). In a pure-functional
setting the equivalent is: (a) the forward always uses normalize(w) (see
ops/numerics.mp_weight), so gradients flow through the normalized weight; and
(b) after each optimizer update the raw parameter is renormalized. Since the
parameter is renormalized at every step, normalize(w) inside the forward sees
an already-unit-norm weight -- exactly the reference fixed point.
"""
from __future__ import annotations

import jax
import optax

from ..ops.numerics import normalize


def _is_normalized_weight(path) -> bool:
    """All magnitude-preserving conv/dense kernels are named 'w'
    (models/layers.py MPConv, MPCausalConv3d context weight)."""
    for p in reversed(path):
        if isinstance(p, jax.tree_util.DictKey):
            return p.key == "w"
    return False


def forced_weight_norm(params):
    """Renormalize every MP weight to unit magnitude per output channel
    (output axis is last; reduce over the rest)."""
    def renorm(path, p):
        if _is_normalized_weight(path):
            return normalize(p, axis=tuple(range(p.ndim - 1)))
        return p

    return jax.tree_util.tree_map_with_path(renorm, params)


def make_optimizer(learning_rate, grad_clip: float = 0.1,
                   eps: float = 1e-8, weight_decay: float = 0.0):
    """clip_grad_norm(grad_clip) -> AdamW(lr, eps) (reference gym_train.py:71,
    :105). learning_rate may be a scalar or an optax schedule."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(learning_rate=learning_rate, eps=eps,
                    weight_decay=weight_decay),
    )
