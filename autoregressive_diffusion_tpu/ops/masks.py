"""DART / block-causal attention masks at FRAME granularity.

The reference builds FlexAttention BlockMasks on the fly
(/root/reference/edm2/attention/attention_masking.py:8-90). On TPU the same
sparsity pattern is a *static* boolean frame-level matrix: it is broadcast to
pixel granularity by the dense fallback path, and consumed as a static
block-index map by the Pallas block-sparse kernel (ops/flash_attention.py).

Frame semantics of the DART training mask over a 2T-frame sequence
(clean copy = frames [0, T), noisy copy = frames [T, 2T), reference
attention_masking.py:15-24):
  * clean query i   attends clean frames <= i
  * noisy query i+T attends clean frames  < i, plus ONLY itself in the noisy
    half (noisy frame 0 sees no context at all).
"""
from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=32)
def train_frame_mask(n_frames: int) -> np.ndarray:
    """(2T, 2T) bool DART mask at frame granularity."""
    t = n_frames
    q = np.arange(2 * t)[:, None]
    k = np.arange(2 * t)[None, :]
    clean_q, clean_k = q < t, k < t
    both_clean = clean_q & clean_k & (k <= q)
    noisy_to_clean = (~clean_q) & clean_k & (k < q - t)
    noisy_self = (~clean_q) & (~clean_k) & (q == k)
    return both_clean | noisy_to_clean | noisy_self


@functools.lru_cache(maxsize=32)
def causal_frame_mask(n_frames: int) -> np.ndarray:
    """(T, T) bool block-causal mask (inference prefill),
    reference attention_masking.py:56-62."""
    q = np.arange(n_frames)[:, None]
    k = np.arange(n_frames)[None, :]
    return q >= k


def expand_to_tokens(frame_mask: np.ndarray, tokens_per_frame: int) -> np.ndarray:
    """Broadcast a frame-level mask to token granularity (dense fallback)."""
    m = np.repeat(frame_mask, tokens_per_frame, axis=0)
    return np.repeat(m, tokens_per_frame, axis=1)


@functools.lru_cache(maxsize=32)
def train_block_indices(n_frames: int):
    """Static block-sparsity descriptor of the DART train mask for the Pallas
    kernel: for each query frame row, the number of active kv frame-blocks and
    their column indices (padded with 0).

    Returns (kv_num_blocks[2T], kv_indices[2T, T+1]) as int32 numpy arrays.
    Row q<T has q+1 blocks: [0..q]. Row q>=T has (q-T)+1 blocks:
    [0..q-T-1] ++ [q] (the diagonal block in the noisy half).
    """
    t = n_frames
    num = np.zeros(2 * t, dtype=np.int32)
    idx = np.zeros((2 * t, t + 1), dtype=np.int32)
    for q in range(t):
        num[q] = q + 1
        idx[q, : q + 1] = np.arange(q + 1)
    for q in range(t, 2 * t):
        f = q - t
        num[q] = f + 1
        idx[q, :f] = np.arange(f)
        idx[q, f] = q  # self block in the noisy half
    return num, idx
