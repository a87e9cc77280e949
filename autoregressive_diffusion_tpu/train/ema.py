"""Power-function EMA (Karras et al., "Analyzing and Improving the Training
Dynamics of Diffusion Models").

Reimplementation of /root/reference/edm2/phema.py as pure pytree math: the
EMA copies live inside the train state and are lerped in the jitted train
step. Post-hoc reconstruction helpers are kept for parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def exp_to_std(exp):
    """Eq. 123 (reference phema.py:19-22)."""
    exp = np.float64(exp)
    return np.sqrt((exp + 1) / (exp + 2) ** 2 / (exp + 3))


def std_to_exp(std):
    """Eq. 126 / Algorithm 2 (reference phema.py:28-33)."""
    std = np.float64(std)
    tmp = np.atleast_1d(std).flatten() ** -2
    exp = [np.roots([1, 7, 16 - t, 12 - t]).real.max() for t in tmp]
    return np.float64(exp).reshape(np.shape(std))


def power_function_beta(std, t_next, t_delta):
    """Eq. 127 (reference phema.py:68-70). std static; t_* may be traced."""
    gamma = float(std_to_exp(std))
    return (1.0 - t_delta / t_next) ** (gamma + 1.0)


def power_function_response(ofs, std, length, axis=0):
    """Eq. 121/108 (reference phema.py:39-48)."""
    ofs, std = np.broadcast_arrays(ofs, std)
    ofs = np.stack([np.float64(ofs)], axis=axis)
    exp = np.stack([std_to_exp(std)], axis=axis)
    s = [1] * exp.ndim
    s[axis] = -1
    t = np.arange(length).reshape(s)
    resp = np.where(t <= ofs, (t / ofs) ** exp, 0) / ofs * (exp + 1)
    return resp / np.sum(resp, axis=axis, keepdims=True)


def power_function_correlation(a_ofs, a_std, b_ofs, b_std):
    """Eq. 151 / Algorithm 3 (reference phema.py:54-62)."""
    a_exp = std_to_exp(a_std)
    b_exp = std_to_exp(b_std)
    t_ratio = a_ofs / b_ofs
    t_exp = np.where(a_ofs < b_ofs, b_exp, -a_exp)
    t_max = np.maximum(a_ofs, b_ofs)
    num = (a_exp + 1) * (b_exp + 1) * t_ratio**t_exp
    den = (a_exp + b_exp + 1) * t_max
    return num / den


def solve_posthoc_coefficients(in_ofs, in_std, out_ofs, out_std):
    """Algorithm 3 (reference phema.py:76-85): coefficients to reconstruct an
    arbitrary EMA profile from training snapshots."""
    in_ofs, in_std = np.broadcast_arrays(in_ofs, in_std)
    out_ofs, out_std = np.broadcast_arrays(out_ofs, out_std)
    rv = lambda x: np.float64(x).reshape(-1, 1)
    cv = lambda x: np.float64(x).reshape(1, -1)
    a = power_function_correlation(rv(in_ofs), rv(in_std), cv(in_ofs), cv(in_std))
    b = power_function_correlation(rv(in_ofs), rv(in_std), cv(out_ofs), cv(out_std))
    x = np.linalg.solve(a, b)
    return x / np.sum(x, axis=0)


def ema_update(ema_params, params, beta):
    """p_ema <- lerp(p_ema, p, 1-beta) over the pytree (phema.py:104-108).
    beta may be a traced scalar."""
    return jax.tree.map(lambda e, p: e + (p - e) * (1.0 - beta),
                        ema_params, params)


def init_ema(params, stds=(0.050, 0.100)):
    """Deep copies of params, one per EMA std (phema.py:92-95)."""
    return tuple(jax.tree.map(jnp.array, params) for _ in stds)


def traditional_ema_beta(cur_nimg, batch_size, halflife_Mimg=float("inf"),
                         rampup_ratio=0.09):
    """Classic half-life EMA decay with rampup (reference phema.py:128-148,
    `TraditionalEMA.update`): `beta = 0.5 ** (batch/halflife_imgs)` with the
    halflife ramped as `min(halflife, nimg * rampup_ratio)`. Use together
    with `ema_update`; works on traced scalars inside a jitted step."""
    halflife = halflife_Mimg
    if rampup_ratio is not None:
        halflife = jnp.minimum(halflife, cur_nimg / 1e6 * rampup_ratio)
    return 0.5 ** (batch_size / jnp.maximum(halflife * 1e6, 1e-8))
