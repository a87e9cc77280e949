"""Adaptive sigma-conditioned loss normalizer (MultiNoiseLoss).

Reimplementation of /root/reference/edm2/loss_weight.py:9-162. The reference
keeps a rank-0-only rolling history of (sigma, loss) pairs, fits
log10(loss) as a 7-basis Fourier series in log10(sigma) by lstsq, and
broadcasts the coefficients.

TPU-native split:
  * `fourier_eval` runs IN-GRAPH inside the jitted loss, taking the
    coefficient vector as a plain array input (replicated across the mesh).
  * `MultiNoiseState` lives on the HOST (process 0): it accumulates the
    (sigma, loss) aux outputs of each train step and refits with numpy
    lstsq every fit interval. The refreshed coefficients are fed back into
    the train state (the jax equivalent of dist.broadcast).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

NUM_TERMS = 4  # reference loss_weight.py:19 (FourierSeriesFit num_terms=4)
NUM_BASIS = 2 * NUM_TERMS - 1  # 7: one constant + 3 cos/sin pairs
INTERVAL = (-np.pi, np.pi)  # in log10(sigma) (reference :19, :135)
HISTORY_SIZE = 10_000  # reference :17


def fourier_basis(x_log10):
    """Basis [0.5, cos(n x), sin(n x)]_{n=1..3} evaluated at log10(sigma).
    Works for jnp and np inputs; returns (..., NUM_BASIS)."""
    xp = jnp if isinstance(x_log10, jax.Array) else np
    cols = [xp.ones_like(x_log10) * 0.5]
    for n in range(1, NUM_TERMS):
        cols.append(xp.cos(n * x_log10))
        cols.append(xp.sin(n * x_log10))
    return xp.stack(cols, axis=-1)


def fourier_eval(coefs: jax.Array, sigma: jax.Array) -> jax.Array:
    """mean_loss(sigma) = 10 ** (basis(log10 sigma) @ coefs). coefs: (7, 1).
    With zero coefs this is identically 1 (no normalization before the first
    fit, matching the reference's zero-init)."""
    basis = fourier_basis(jnp.log10(sigma))
    pred = basis.reshape(-1, NUM_BASIS) @ coefs.astype(basis.dtype)
    return (10.0 ** pred).reshape(sigma.shape)


def init_coefs() -> jax.Array:
    return jnp.zeros((NUM_BASIS, 1), jnp.float32)


@dataclasses.dataclass
class MultiNoiseState:
    """Host-side rolling history + lstsq fit (process-0 only)."""
    sigmas: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros((0,), np.float32))
    losses: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros((0,), np.float32))
    positions: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros((0,), np.int64))

    def add_data(self, sigmas, losses):
        """sigmas/losses: (b, t) arrays from the train-step aux output
        (reference :30-39)."""
        sigmas = np.asarray(sigmas, np.float32)
        losses = np.asarray(losses, np.float32)
        positions = np.arange(sigmas.size) % sigmas.shape[1]
        self.sigmas = np.concatenate([self.sigmas, sigmas.ravel()])[-HISTORY_SIZE:]
        self.losses = np.concatenate([self.losses, losses.ravel()])[-HISTORY_SIZE:]
        self.positions = np.concatenate([self.positions, positions])[-HISTORY_SIZE:]

    def fit(self) -> np.ndarray:
        """Least-squares fit of log10(loss) over the valid log-sigma interval
        (reference :122-143). Returns (NUM_BASIS, 1) float32."""
        x, y = self.sigmas, self.losses
        xl = np.log10(x, where=x > 0, out=np.full_like(x, -np.inf))
        m = (xl >= INTERVAL[0]) & (xl <= INTERVAL[1]) & (y > 0)
        if m.sum() < NUM_BASIS:
            return np.zeros((NUM_BASIS, 1), np.float32)
        basis = np.asarray(fourier_basis(xl[m].astype(np.float64)))
        target = np.log10(y[m].astype(np.float64))[:, None]
        sol, *_ = np.linalg.lstsq(basis, target, rcond=None)
        return sol.astype(np.float32)


def fit_and_broadcast(state: MultiNoiseState) -> np.ndarray:
    """Rank-0 fit + broadcast to every process (the dist.broadcast of
    reference loss_weight.py:122-149).

    Only process 0 accumulates history (scripts guard `add_data` with
    `jax.process_index() == 0`), so only its fit is meaningful; every other
    process must receive p0's coefficients or the replicated `coefs` train-
    state arrays silently diverge across hosts. Single-process runs return
    the local fit unchanged.
    """
    if jax.process_count() == 1:
        return state.fit()
    coefs = (state.fit() if jax.process_index() == 0
             else np.zeros((NUM_BASIS, 1), np.float32))
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.broadcast_one_to_all(coefs),
                      np.float32)
