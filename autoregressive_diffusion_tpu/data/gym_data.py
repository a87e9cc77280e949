"""Gymnasium on-the-fly video data pipeline (LunarLander et al.).

Reimplementation of /root/reference/edm2/gym_dataloader.py:13-92 as a plain
Python generator feeding the host->device pipeline (there is no torch
DataLoader here; batches are assembled on host and jax.device_put by the
training loop). Semantics preserved:
  * random action resampled every (time_compression * frame_interval) env
    steps; every `frame_interval`-th frame captured at 256x256 INTER_AREA,
  * clips where the lander leaves the frame are dropped
    (`return_anyways=False`),
  * warmup `evolution_time` steps before capture; episodes capped at
    `terminate_size` steps.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np


def resize_frame(frame: np.ndarray, size: int = 256) -> np.ndarray:
    """INTER_AREA resize of one HWC uint8 frame (reference
    gym_dataloader.py:61). Uses the native C++ kernel (native/adx_data.cpp)
    when available; OpenCV otherwise."""
    from .native import get_lib, resize_area_batch
    if get_lib() is not None:
        out = resize_area_batch(frame[None], size)
        return np.clip(out[0] + 0.5, 0, 255).astype(np.uint8)
    import cv2
    return cv2.resize(frame, (size, size), interpolation=cv2.INTER_AREA)


def resize_frames_batch(frames: np.ndarray, size: int = 256) -> np.ndarray:
    """Fused resize + [-1,1] normalization of a clip of uint8 frames --
    one native call, OpenMP-parallel across frames."""
    from .native import resize_area_batch
    return resize_area_batch(frames, size, scale=np.float32(1 / 127.5),
                             offset=np.float32(-1.0))


class GymDataGenerator:
    """Yields (frames [state_size, 256, 256, 3] uint8, actions
    [state_size // time_compression] int64, reward float)."""

    def __init__(self, state_size: int = 32,
                 environment_name: str = "LunarLander-v3",
                 training_examples: int = 10_000,
                 autoencoder_time_compression: int = 4,
                 return_anyways: bool = True,
                 frame_size: int = 256,
                 seed: Optional[int] = None):
        assert state_size % autoencoder_time_compression == 0
        self.state_size = state_size
        self.environment_name = environment_name
        self.evolution_time = 10
        self.terminate_size = 512
        self.training_examples = training_examples
        self.time_compression = autoencoder_time_compression
        self.frame_interval = 2
        self.return_anyways = return_anyways
        self.frame_size = frame_size
        self.seed = seed

    @staticmethod
    def _lander_in_frame(state) -> bool:
        x, y = state[0], state[1]
        return y < 1.4 and abs(x) < 1.0

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, float]]:
        import gymnasium as gym
        env = gym.make(self.environment_name, render_mode="rgb_array")
        if self.seed is not None:
            env.reset(seed=self.seed)
            env.action_space.seed(self.seed)
        terminated = True
        n_yielded = 0
        step_count = 0
        frames, states, actions = [], [], []
        reward, action = 0.0, 0

        while n_yielded < self.training_examples:
            if (not terminated and step_count > 0
                    and step_count % (self.state_size * self.frame_interval) == 0):
                if self.return_anyways or all(self._lander_in_frame(s) for s in states):
                    yield (np.stack(frames), np.asarray(actions, np.int64), reward)
                    n_yielded += 1
                frames, states, actions = [], [], []

            if terminated:
                env.reset()
                terminated = False
                reward, action = 0.0, 0
                frames, states, actions = [], [], []
                step_count = -self.evolution_time
            else:
                if step_count % (self.time_compression * self.frame_interval) == 0:
                    action = env.action_space.sample()
                    if step_count >= 0:
                        actions.append(action)
                state, reward, terminated, _, _ = env.step(action)

            if step_count >= 0 and step_count % self.frame_interval == 0:
                frames.append(resize_frame(env.render(), self.frame_size))
                states.append(state)

            if step_count > self.terminate_size:
                terminated = True
            step_count += 1

    def __len__(self):
        return self.training_examples


def batched(generator, batch_size: int, num_workers: int = 0,
            prefetch: int = 4):
    """Assemble (frames [b,t,h,w,3], actions [b,t'], rewards [b]) batches.
    With num_workers > 0, runs `num_workers` generator copies in background
    threads with a prefetch queue (the TPU-side equivalent of the reference
    DataLoader worker pool, gym_train.py:62)."""
    if num_workers <= 0:
        it = iter(generator)
        while True:
            items = []
            for _ in range(batch_size):
                try:
                    items.append(next(it))
                except StopIteration:
                    return  # drop the incomplete tail batch
            yield _collate(items)

    q: "queue.Queue" = queue.Queue(maxsize=max(prefetch * batch_size, batch_size))
    _done = object()  # end-of-stream sentinel, one per worker

    def worker(gen):
        for item in gen:
            q.put(item)
        q.put(_done)

    import copy
    for i in range(num_workers):
        g = copy.copy(generator)
        g.seed = None if generator.seed is None else generator.seed + i
        threading.Thread(target=worker, args=(g,), daemon=True).start()

    finished = 0
    items = []
    while True:
        while len(items) < batch_size:
            item = q.get()
            if item is _done:
                finished += 1
                if finished == num_workers:
                    return  # all generators exhausted; drop the tail
                continue
            items.append(item)
        yield _collate(items)
        items = []


def _collate(items):
    frames = np.stack([it[0] for it in items])
    actions = np.stack([it[1] for it in items])
    rewards = np.asarray([it[2] for it in items], np.float32)
    return frames, actions, rewards


class SyntheticVideoGenerator:
    """Deterministic moving-square videos for tests/benchmarks when no env is
    available; same interface as GymDataGenerator."""

    def __init__(self, state_size=32, frame_size=64, n_actions=4,
                 time_compression=4, training_examples=1000, seed=0):
        self.state_size = state_size
        self.frame_size = frame_size
        self.n_actions = n_actions
        self.time_compression = time_compression
        self.training_examples = training_examples
        self.seed = seed

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        for _ in range(self.training_examples):
            t, s = self.state_size, self.frame_size
            actions = rng.integers(0, self.n_actions, t // self.time_compression)
            frames = np.zeros((t, s, s, 3), np.uint8)
            x, y = s // 2, s // 2
            vel = {0: (0, 0), 1: (2, 0), 2: (0, 2), 3: (-2, -2)}
            for i in range(t):
                a = actions[min(i // self.time_compression, len(actions) - 1)]
                dx, dy = vel[int(a) % 4]
                x = (x + dx) % s
                y = (y + dy) % s
                frames[i, max(0, y - 4):y + 4, max(0, x - 4):x + 4] = 255
            yield frames, actions, 0.0

    def __len__(self):
        return self.training_examples
