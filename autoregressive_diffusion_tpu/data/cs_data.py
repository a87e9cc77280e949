"""Counter-Strike latent/frame streaming datasets.

Reimplementation of /root/reference/edm2/cs_dataloading.py (CsDataset /
CsVaeDataset + collates) and the offline processing pipeline
(/root/reference/edm2/cs_dataset_processing/). The reference streams
MosaicML-MDS shards from S3; here the same windows are read from:
  * MosaicML `streaming.StreamingDataset` when the library is installed
    (remote object stores), or
  * a local shard directory of .npz files (one 1000-frame clip per file),
    the object-store-free path used on TPU pods with prefetched data.

Each sample mirrors the reference: a `clip_size` window of pre-encoded VAE
latent means (fp16) + actions, chunked from ~1000-frame clips
(cs_dataloading.py:28-45, :60-81).
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Optional

import numpy as np


class LocalLatentShards:
    """Reads .npz shards with arrays 'latents' (t, h, w, c) [or 'frames'] and
    'actions' (t, a), yielding clip windows. Shard layout is produced by
    `write_latent_shard` below."""

    def __init__(self, shard_dir: str, clip_size: int = 64,
                 key: str = "latents", seed: int = 0, shuffle: bool = True,
                 rank: int = 0, num_replicas: int = 1):
        """rank/num_replicas stride the shard order across data-parallel
        processes (the InfiniteSampler role, reference
        torch_utils/misc.py:122-144); pass jax.process_index()/count()."""
        self.paths = sorted(
            os.path.join(shard_dir, f) for f in os.listdir(shard_dir)
            if f.endswith(".npz"))
        if not self.paths:
            raise FileNotFoundError(f"no .npz shards in {shard_dir}")
        self.clip_size = clip_size
        self.key = key
        self.seed = seed
        self.shuffle = shuffle
        self.rank = rank
        self.num_replicas = num_replicas

    def __iter__(self) -> Iterator[dict]:
        rng = np.random.default_rng(self.seed)  # same order on all ranks
        order = np.arange(len(self.paths))
        while True:
            if self.shuffle:
                rng.shuffle(order)
            for i in order[self.rank::self.num_replicas]:
                with np.load(self.paths[i]) as z:
                    data = z[self.key]
                    actions = z["actions"] if "actions" in z else None
                t = data.shape[0]
                n = t // self.clip_size
                starts = np.arange(n) * self.clip_size
                if self.shuffle:
                    rng.shuffle(starts)
                for s in starts:
                    item = {self.key: data[s:s + self.clip_size]}
                    if actions is not None:
                        item["actions"] = actions[s:s + self.clip_size]
                    yield item


def write_latent_shard(path: str, latents: np.ndarray,
                       actions: Optional[np.ndarray] = None,
                       key: str = "latents"):
    """Offline tool output format (the MDSWriter equivalent of
    dataset_processing_counter_strike.py:89-131): fp16 latents (or uint8
    raw frames under key='frames') + actions per clip, zstd-free npz
    (XLA-host friendly)."""
    arrays = {key: latents.astype(np.float16) if key == "latents" else latents}
    if actions is not None:
        arrays["actions"] = actions
    np.savez_compressed(path, **arrays)


def merge_shard_index(out_dir: str, shard_dirs) -> str:
    """Merge per-worker MosaicML `index.json` files into one dataset index
    (parity with /root/reference/edm2/cs_dataset_processing/
    index_fusion.py:37-44 `merge_index`).

    Uses `streaming.base.util.merge_index` when the library is installed;
    otherwise falls back to the same transformation in pure JSON -- the MDS
    v2 index is `{"version": 2, "shards": [...]}` and merging is
    concatenating the shard entries with each shard's file basenames
    rewritten to be relative to `out_dir` (so `StreamingDataset` can
    resolve them through the merged root)."""
    index_files = [os.path.join(d, "index.json") for d in shard_dirs]
    try:
        from streaming.base.util import merge_index
        merge_index(index_files, out_dir)
        return os.path.join(out_dir, "index.json")
    except ImportError:
        pass
    import json
    merged = {"version": 2, "shards": []}
    for d, f in zip(shard_dirs, index_files):
        with open(f) as fh:
            idx = json.load(fh)
        assert idx.get("version", 2) == 2, f"unsupported index version in {f}"
        rel = os.path.relpath(os.path.abspath(d), os.path.abspath(out_dir))
        for shard in idx["shards"]:
            shard = dict(shard)
            for k in ("raw_data", "zip_data", "raw_meta", "zip_meta"):
                v = shard.get(k)
                if v and v.get("basename"):
                    v = dict(v)
                    v["basename"] = os.path.join(rel, v["basename"]) \
                        if rel != "." else v["basename"]
                    shard[k] = v
            merged["shards"].append(shard)
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "index.json")
    with open(out, "w") as fh:
        json.dump(merged, fh)
    return out


# the reference's MDS column names (dataset_processing_counter_strike.py:90)
# mapped onto this repo's batch keys
_MDS_KEY_ALIASES = {"latents": ("mean",), "frames": ("frames",),
                    "actions": ("action",)}


def _mds_column(sample: dict, key: str):
    if key in sample:
        return np.asarray(sample[key])
    for alias in _MDS_KEY_ALIASES.get(key, ()):
        if alias in sample:
            return np.asarray(sample[alias])
    return None


def streaming_dataset(remote: Optional[str], local: str, clip_size: int = 64,
                      key: str = "latents", shuffle: bool = True):
    """MosaicML streaming path (reference cs_dataloading.py:20-27, :53-70).
    Yields the same dict windows as LocalLatentShards.

    Uses `streaming.StreamingDataset` when the library is installed (object
    stores, distributed shuffles); otherwise falls back to the vendored
    local MDS reader (data/mds.py) -- `remote` must then be None or a local
    path equal to `local`. Column names follow the reference's schema
    ('mean'/'action') with this repo's 'latents'/'actions' accepted too."""
    try:
        from streaming import StreamingDataset  # optional dependency
        ds = StreamingDataset(local=local, remote=remote, shuffle=shuffle,
                              batch_size=1)
    except ImportError:
        if remote not in (None, local):
            raise ImportError(
                "remote MDS streams need the `streaming` package; the "
                "vendored reader (data/mds.py) only reads local datasets")
        from .mds import MDSLocalReader
        ds = MDSLocalReader(local, shuffle=shuffle)
    for sample in ds:
        data = _mds_column(sample, key)
        if data is None:
            raise KeyError(f"MDS sample has none of "
                           f"{(key,) + _MDS_KEY_ALIASES.get(key, ())}; "
                           f"columns: {sorted(sample)}")
        if isinstance(data, (bytes, bytearray)):
            data = np.frombuffer(data, dtype=np.float16)
        actions = _mds_column(sample, "actions")
        t = data.shape[0]
        for s in range(0, t - clip_size + 1, clip_size):
            item = {key: data[s:s + clip_size]}
            if actions is not None:
                item["actions"] = actions[s:s + clip_size]
            yield item


def batched_latents(dataset, batch_size: int, normalize=None,
                    num_workers: int = 2, prefetch: int = 4):
    """(b, t, h, w, c) fp32 latent batches (+ actions when present), with the
    reference's latent normalization applied on host:
    (means - vae.mean)/vae.std (cs_train.py:102)."""
    q: "queue.Queue" = queue.Queue(maxsize=prefetch * batch_size)

    def worker(it):
        for item in it:
            q.put(item)

    if num_workers > 0:
        for w in range(num_workers):
            import copy
            ds = copy.copy(dataset)
            if hasattr(ds, "seed"):
                ds.seed = dataset.seed + w
            threading.Thread(target=worker, args=(iter(ds),), daemon=True).start()
        get = q.get
    else:
        it = iter(dataset)
        get = lambda: next(it)

    while True:
        items = [get() for _ in range(batch_size)]
        key = "latents" if "latents" in items[0] else "frames"
        arr = np.stack([np.asarray(it[key], np.float32) for it in items])
        if normalize is not None:
            mean, std = normalize
            arr = (arr - mean) / std
        out = {key: arr}
        if "actions" in items[0]:
            out["actions"] = np.stack([it["actions"] for it in items])
        yield out
