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

SINGLE DEVICE OWNER: when `transform` does device work (VAE encode), it
must NOT run on the producer thread -- two host threads dispatching to the
tunneled TPU runtime concurrently wedge the device queue (observed: a gym
training run froze ~1h in with every thread in futex wait). With
`main_thread_transform=True` (the default when a transform is given) the
producer stays pure-CPU (env stepping into a small bounded raw queue) and
the CONSUMER drains + transforms queued items between training steps, so
exactly one thread ever touches the device.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np


class ReplayLoader:
    """Iterate batches sampled from a ring buffer that a background thread
    keeps filling from `generator`.

    generator  -- yields tuples of array-likes (e.g. (frames, actions,
                  reward) from GymDataGenerator); all items must have
                  consistent shapes/dtypes.
    transform  -- optional fn(item_tuple) -> tuple, applied before storage
                  (e.g. VAE-encode frames to latents on device). Runs on
                  the CONSUMER thread (see module docstring) unless
                  main_thread_transform=False.
    capacity   -- ring size in items. Memory = capacity * item nbytes.
    min_fill   -- batches are not served until this many items arrived.
    """

    def __init__(self, generator, batch_size: int, capacity: int = 2048,
                 min_fill: Optional[int] = None,
                 transform: Optional[Callable] = None,
                 seed: int = 0, main_thread_transform: bool = True):
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
        # consumer-side transform: producer fills a small bounded raw queue
        # (blocking when full pauses the env -- fine), consumer drains it
        self._consumer_transform = (transform is not None
                                    and main_thread_transform)
        self._pending: Optional[queue.Queue] = (
            queue.Queue(maxsize=8) if self._consumer_transform else None)
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
                if self._consumer_transform:
                    # device-touching transform runs on the consumer thread;
                    # hand the raw item over (blocking put pauses the env
                    # when the consumer lags)
                    while not self._stop.is_set():
                        try:
                            self._pending.put(item, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    continue
                if self.transform is not None:
                    item = self.transform(item)
                self._store(item)
        except BaseException as e:  # propagate to consumer
            with self._lock:
                self._error = e
                self._has_data.notify_all()
        finally:
            with self._lock:
                self._producer_done = True
                self._has_data.notify_all()

    def _store(self, item):
        item = tuple(np.asarray(f) for f in item)
        with self._lock:
            if self._buffers is None:
                self._alloc(item)
            slot = self._count % self.capacity
            for buf, field in zip(self._buffers, item):
                buf[slot] = field
            self._count += 1
            self._has_data.notify_all()

    # ---- consumer ----------------------------------------------------------

    def _ingest(self, max_items: Optional[int] = None):
        """Drain queued raw items, transform on THIS thread, store. Called
        from the consumer loop so the device only ever sees one thread."""
        if not self._consumer_transform:
            return
        done = 0
        while max_items is None or done < max_items:
            try:
                item = self._pending.get_nowait()
            except queue.Empty:
                return
            self._store(self.transform(item))
            done += 1

    def __iter__(self) -> Iterator:
        import time as _time
        while True:
            self._ingest()
            batch = None
            with self._has_data:
                if self._error is not None:
                    raise RuntimeError("replay producer failed") from self._error
                n = min(self._count, self.capacity)
                drained = self._producer_done and self._pending_empty()
                if n < self.min_fill and not drained:
                    pass  # keep filling below
                elif n >= self.batch_size:
                    idx = self._rng.choice(n, size=self.batch_size,
                                           replace=False)
                    batch = tuple(buf[idx].copy() for buf in self._buffers)
                    self._drawn += self.batch_size
                elif drained:
                    return  # generator too short to ever serve a batch
            if batch is not None:
                yield batch
                continue
            # still filling: wait for the producer without spinning the core
            # it needs (consumer-transform mode cannot block in the condvar
            # -- the producer only fills the raw queue, we must keep
            # ingesting)
            if self._consumer_transform:
                _time.sleep(0.05)
            else:
                with self._has_data:
                    if (self._error is None and self._count < self.min_fill
                            and not self._producer_done):
                        self._has_data.wait(timeout=1.0)

    def _pending_empty(self) -> bool:
        return self._pending is None or self._pending.empty()

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


class DeviceReplay:
    """Replay buffer resident in device HBM.

    Same producer discipline as ReplayLoader (env thread -> bounded raw
    queue -> consumer-thread transform), but items are stored in
    device-resident ring buffers and training batches are gathered ON
    DEVICE by slot index (train/train_state.py::make_replay_train_step), so
    after the buffer warms up no batch bytes cross the host<->device link.
    Inserts rebuild the ring with `dynamic_update_slice` (one jitted call
    per field; NOT donated -- an in-flight train dispatch may still hold
    the previous buffer, and a full-buffer HBM copy is microseconds).

    generator -- yields raw item tuples (e.g. (frames, actions, reward)).
    transform -- fn(raw item) -> tuple of device/np arrays to store (e.g.
                 VAE-encode frames to latents). Runs on the CONSUMER thread
                 via ingest(): exactly one thread touches the device.
    """

    def __init__(self, generator, transform: Callable, batch_size: int,
                 capacity: int = 512, min_fill: Optional[int] = None,
                 seed: int = 0):
        import jax
        import jax.numpy as jnp
        if capacity < batch_size:
            raise ValueError(f"capacity {capacity} < batch_size {batch_size}")
        self.batch_size = batch_size
        self.capacity = capacity
        self.min_fill = max(batch_size, min_fill if min_fill is not None
                            else min(capacity, 2 * batch_size))
        self.transform = transform
        self._rng = np.random.default_rng(seed)
        self._bufs: Optional[list] = None
        self._count = 0
        self._drawn = 0
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._producer_done = False
        self._pending: queue.Queue = queue.Queue(maxsize=8)
        self._insert = jax.jit(
            lambda buf, val, slot: jax.lax.dynamic_update_slice(
                buf, val[None].astype(buf.dtype),
                (slot,) + (0,) * (buf.ndim - 1)))
        self._jnp = jnp
        self._generator = generator
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _produce(self):
        try:
            for item in self._generator:
                if self._stop.is_set():
                    return
                while not self._stop.is_set():
                    try:
                        self._pending.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:
            self._error = e
        finally:
            self._producer_done = True

    def ingest(self, max_items: Optional[int] = None) -> int:
        """Drain queued raw items, transform + insert on THIS thread.
        Returns the number of items stored. Raises if the producer died."""
        if self._error is not None:
            raise RuntimeError("replay producer failed") from self._error
        done = 0
        while max_items is None or done < max_items:
            try:
                item = self._pending.get_nowait()
            except queue.Empty:
                break
            fields = self.transform(item)
            if self._bufs is None:
                self._bufs = [
                    self._jnp.zeros((self.capacity,) + tuple(f.shape),
                                    self._jnp.asarray(f).dtype)
                    for f in fields]
            slot = self._count % self.capacity
            self._bufs = [self._insert(b, self._jnp.asarray(f), slot)
                          for b, f in zip(self._bufs, fields)]
            self._count += 1
            done += 1
        return done

    def ready(self) -> bool:
        return self._count >= self.min_fill or (
            self._producer_done and self._pending.empty()
            and self._count >= self.batch_size)

    def exhausted(self) -> bool:
        """Generator ended before ever producing one batch worth of items."""
        return (self._producer_done and self._pending.empty()
                and self._count < self.batch_size)

    def buffers(self) -> tuple:
        """Current device ring buffers (one per stored field)."""
        return tuple(self._bufs)

    def sample_idx(self, g: int) -> np.ndarray:
        """(g, batch_size) int32 slot indices, without replacement per row."""
        n = min(self._count, self.capacity)
        idx = np.stack([self._rng.choice(n, size=self.batch_size,
                                         replace=False) for _ in range(g)])
        self._drawn += g * self.batch_size
        return idx.astype(np.int32)

    def stats(self) -> dict:
        return {
            "produced": self._count,
            "drawn": self._drawn,
            "reuse_factor": self._drawn / max(self._count, 1),
            "buffered": min(self._count, self.capacity),
        }

    def stop(self):
        self._stop.set()
