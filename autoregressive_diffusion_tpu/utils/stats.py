"""Cross-process training-statistics aggregation.

TPU-native rebuild of the reference's lock-free stat collector
(/root/reference/torch_utils/training_stats.py:22-283): every `report(name,
values)` accumulates per-name 3-moment counters `[n, sum(x), sum(x^2)]`
(NaN/Inf filtered); a `Collector` snapshots mean/std over the reporting
period. Where the reference all-reduces counters over NCCL
(training_stats.py:266), this build sums them over all JAX processes with
`multihost_utils.process_allgather` (ICI/DCN collectives); single-process
runs skip the sync entirely.

The name-consistency hash check of the reference (training_stats.py:247-251)
is unnecessary here: each process contributes its full name->moments dict and
missing names simply contribute zero.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional

import jax
import numpy as np

_NUM_MOMENTS = 3  # [num, sum x, sum x^2]

_counters: Dict[str, np.ndarray] = {}
_cumulative: Dict[str, np.ndarray] = {}


def report(name: str, value) -> object:
    """Accumulate scalars under `name`. NaN/Inf are ignored; returns value
    unchanged so it can be used inline (reference :55-96)."""
    elems = np.asarray(
        jax.device_get(value) if isinstance(value, jax.Array) else value,
        dtype=np.float64).ravel()
    if elems.size:
        finite = np.isfinite(elems)
        moments = np.array([finite.sum(),
                            elems[finite].sum(),
                            np.square(elems[finite]).sum()], np.float64)
        _counters[name] = _counters.get(name, np.zeros(_NUM_MOMENTS)) + moments
    elif name not in _counters:
        _counters[name] = np.zeros(_NUM_MOMENTS)
    return value


def report0(name: str, value) -> object:
    """Accumulate only on process 0 (reference :106-112)."""
    report(name, value if jax.process_index() == 0 else [])
    return value


def _drain_synced() -> Dict[str, np.ndarray]:
    """Take the pending deltas, summed across processes, and reset them."""
    global _counters
    pending, _counters = _counters, {}
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # every process must contribute the same names, in the same order;
        # gather the union of names first, then the moment matrix.
        blob = ("\x00".join(sorted(pending))).encode()[:4096]
        all_names = multihost_utils.process_allgather(
            np.frombuffer(blob.ljust(4096, b"\x01"), dtype=np.uint8))
        union: List[str] = sorted({
            n for row in np.atleast_2d(all_names)
            for n in bytes(row).rstrip(b"\x01").decode().split("\x00") if n})
        full = np.zeros((len(union), _NUM_MOMENTS))
        for i, n in enumerate(union):
            if n in pending:
                full[i] = pending[n]
        summed = np.asarray(multihost_utils.process_allgather(full)).sum(0)
        pending = {n: summed[i] for i, n in enumerate(union)}
    for name, moments in pending.items():
        _cumulative[name] = _cumulative.get(name, np.zeros(_NUM_MOMENTS)) + moments
    return pending


class Collector:
    """Snapshots period averages of reported stats (reference :115-283)."""

    def __init__(self, regex: str = ".*", keep_previous: bool = True):
        self._regex = re.compile(regex)
        self._keep_previous = keep_previous
        self._moments: Dict[str, np.ndarray] = {}
        self.update()
        self._moments.clear()

    def names(self) -> List[str]:
        return [n for n in _cumulative if self._regex.fullmatch(n)]

    def update(self) -> None:
        if not self._keep_previous:
            self._moments.clear()
        for name, delta in _drain_synced().items():
            if not self._regex.fullmatch(name):
                continue
            if delta[0] or name not in self._moments:
                self._moments[name] = delta

    def _get(self, name: str) -> np.ndarray:
        return self._moments.get(name, np.zeros(_NUM_MOMENTS))

    def num(self, name: str) -> int:
        return int(self._get(name)[0])

    def mean(self, name: str) -> float:
        m = self._get(name)
        return float(m[1] / m[0]) if m[0] else float("nan")

    def std(self, name: str) -> float:
        m = self._get(name)
        if m[0] == 0 or not np.isfinite(m[1]):
            return float("nan")
        if m[0] == 1:
            return 0.0
        mean = m[1] / m[0]
        return float(np.sqrt(max(m[2] / m[0] - mean**2, 0)))

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {n: dict(num=self.num(n), mean=self.mean(n), std=self.std(n))
                for n in self.names()}

    def __getitem__(self, name: str) -> float:
        return self.mean(name)
