"""Replay-buffer data loader: decouple env throughput from train throughput.

The reference streams fresh clips straight from the gym env through torch
DataLoader worker *processes* (/root/reference/gym_train.py:61-62) -- viable
on a many-core host where N workers deliver batch_size fresh clips per step.
On a TPU host the accelerator step rate (~58 samples/s/chip) can exceed what
any number of single-core env simulators deliver, and this host exposes ONE
CPU core (~1.2 clips/s of LunarLander stepping+rendering); worker processes
cannot parallelize what one core serializes.

The TPU-native answer is a replay buffer: one background producer thread
steps the env (and optionally encodes clips to VAE latents on-device) into a
preallocated host ring buffer while the training loop samples batches from
it uniformly. The MXU never starves, every env clip is still consumed, and
the fresh-data fraction is tracked honestly (`stats()`), so a run can report
its effective reuse factor. Sampling-with-reuse from a continuously
refreshed buffer is the standard world-model compromise when simulation is
slower than learning.

Producer thread errors are captured and re-raised on the consumer side
(mirrors torch DataLoader worker-error propagation).
"""
from __future__ import annotations

import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np


class ReplayLoader:
    """Iterate batches sampled from a ring buffer that a background thread
    keeps filling from `generator`.

    generator  -- yields tuples of array-likes (e.g. (frames, actions,
                  reward) from GymDataGenerator); all items must have
                  consistent shapes/dtypes.
    transform  -- optional producer-side fn(item_tuple) -> tuple, applied
                  before storage (e.g. VAE-encode frames to latents on
                  device; jax serializes device work against train steps).
    capacity   -- ring size in items. Memory = capacity * item nbytes.
    min_fill   -- batches are not served until this many items arrived.
    """

    def __init__(self, generator, batch_size: int, capacity: int = 2048,
                 min_fill: Optional[int] = None,
                 transform: Optional[Callable] = None,
                 seed: int = 0):
        if capacity < batch_size:
            raise ValueError(f"capacity {capacity} < batch_size {batch_size}")
        self.generator = generator
        self.batch_size = batch_size
        self.capacity = capacity
        self.min_fill = max(batch_size, min_fill if min_fill is not None
                            else min(capacity, 2 * batch_size))
        self.transform = transform
        self._rng = np.random.default_rng(seed)
        self._buffers: Optional[list] = None   # one ndarray per tuple field
        self._scalars: Optional[list] = None   # fields stored as object cols
        self._count = 0          # total items ever produced
        self._drawn = 0          # total items ever served
        self._lock = threading.Lock()
        self._has_data = threading.Condition(self._lock)
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._producer_done = False
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    # ---- producer ----------------------------------------------------------

    def _alloc(self, item: Sequence[np.ndarray]):
        self._buffers = []
        for field in item:
            a = np.asarray(field)
            self._buffers.append(
                np.empty((self.capacity,) + a.shape, dtype=a.dtype))

    def _produce(self):
        try:
            for item in self.generator:
                if self._stop.is_set():
                    return
                if self.transform is not None:
                    item = self.transform(item)
                item = tuple(np.asarray(f) for f in item)
                with self._lock:
                    if self._buffers is None:
                        self._alloc(item)
                    slot = self._count % self.capacity
                    for buf, field in zip(self._buffers, item):
                        buf[slot] = field
                    self._count += 1
                    self._has_data.notify_all()
        except BaseException as e:  # propagate to consumer
            with self._lock:
                self._error = e
                self._has_data.notify_all()
        finally:
            with self._lock:
                self._producer_done = True
                self._has_data.notify_all()

    # ---- consumer ----------------------------------------------------------

    def __iter__(self) -> Iterator:
        while True:
            with self._has_data:
                while (self._error is None and self._count < self.min_fill
                       and not self._producer_done):
                    self._has_data.wait(timeout=1.0)
                if self._error is not None:
                    raise RuntimeError("replay producer failed") from self._error
                n = min(self._count, self.capacity)
                if n < self.batch_size:
                    if self._producer_done:
                        return  # generator too short to ever serve a batch
                    continue
                idx = self._rng.choice(n, size=self.batch_size,
                                       replace=False)
                batch = tuple(buf[idx].copy() for buf in self._buffers)
                self._drawn += self.batch_size
            yield batch

    def stats(self) -> dict:
        with self._lock:
            produced = self._count
            drawn = self._drawn
        return {
            "produced": produced,
            "drawn": drawn,
            "reuse_factor": drawn / max(produced, 1),
            "buffered": min(produced, self.capacity),
        }

    def stop(self):
        self._stop.set()
        with self._lock:
            self._has_data.notify_all()
