"""Checkpointing.

Two mechanisms, mirroring the reference (SURVEY.md section 5):
  1. kwargs-bundle model checkpoints (`save_model` / `load_model`): a
     msgpack file holding {kwargs, variables} so a model can be rebuilt
     without its config -- the TPU equivalent of BetterModule
     save_to_state_dict / from_pretrained (/root/reference/edm2/utils.py:
     13-64). Remote object-store paths (gs:// / s3://) are supported when the
     relevant client library is installed, with a /tmp cache like the
     reference.
  2. full train-state checkpoints via Orbax (async, sharding-aware) for
     resumable training (`save_train_state` / `restore_train_state` /
     `latest_step`), replacing the torch.save optimizer bundles
     (gym_train.py:132-141).
"""
from __future__ import annotations

import json
import os
import re
import shutil
import tempfile
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


_CACHE_DIR = "/tmp/cache/autoregressive_diffusion_models/"


def _fetch_remote(path: str) -> str:
    """Download s3://... or gs://... to the local cache (reference
    utils.py:39-57)."""
    os.makedirs(_CACHE_DIR, exist_ok=True)
    local = os.path.join(_CACHE_DIR, os.path.basename(path))
    if os.path.exists(local):
        return local
    if path.startswith("s3://"):
        import boto3  # optional dependency
        from urllib.parse import urlparse
        p = urlparse(path)
        boto3.client("s3").download_file(p.netloc, p.path.lstrip("/"), local)
    elif path.startswith("gs://"):
        from google.cloud import storage  # optional dependency
        from urllib.parse import urlparse
        p = urlparse(path)
        storage.Client().bucket(p.netloc).blob(
            p.path.lstrip("/")).download_to_filename(local)
    else:
        raise ValueError(f"unknown remote scheme: {path}")
    return local


def _push_remote(local: str, path: str):
    if path.startswith("s3://"):
        import boto3
        from urllib.parse import urlparse
        p = urlparse(path)
        boto3.client("s3").upload_file(local, p.netloc, p.path.lstrip("/"))
    elif path.startswith("gs://"):
        from google.cloud import storage
        from urllib.parse import urlparse
        p = urlparse(path)
        storage.Client().bucket(p.netloc).blob(
            p.path.lstrip("/")).upload_from_filename(local)
    else:
        raise ValueError(f"unknown remote scheme: {path}")


def save_model(path: str, kwargs: Dict[str, Any], variables,
               extra: Optional[Dict[str, Any]] = None) -> None:
    """Write a {kwargs, variables[, extra]} bundle. kwargs must be
    JSON-serializable (the constructor knob set, mirroring the reference's
    self-recorded ctor kwargs, networks_edm2.py:186-189). `extra` is an
    optional pytree of arrays (e.g. latent mean/std buffers,
    save_model_to_s3.py parity)."""
    payload = {
        b"kwargs": json.dumps(kwargs).encode(),
        b"variables": serialization.to_bytes(
            jax.tree.map(np.asarray, variables)),
    }
    if extra:
        payload[b"extra"] = serialization.to_bytes(
            jax.tree.map(np.asarray, extra))
    blob = serialization.msgpack_serialize(payload)
    if path.startswith(("s3://", "gs://")):
        with tempfile.NamedTemporaryFile(delete=False) as tmp:
            tmp.write(blob)
        _push_remote(tmp.name, path)
        os.remove(tmp.name)
    else:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            f.write(blob)


def load_model(path: str, template=None, with_extra: bool = False):
    """Returns (kwargs, variables) -- or (kwargs, variables, extra) when
    `with_extra` -- from a save_model bundle. If `template` (a variables
    pytree) is given, the stored arrays are restored onto its exact
    structure/dtypes."""
    if path.startswith(("s3://", "gs://")):
        path = _fetch_remote(path)
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    kwargs = json.loads(payload[b"kwargs"].decode())
    raw = payload[b"variables"]
    if template is not None:
        variables = serialization.from_bytes(template, raw)
    else:
        variables = serialization.msgpack_restore(raw)
    if with_extra:
        extra = (serialization.msgpack_restore(payload[b"extra"])
                 if b"extra" in payload else None)
        return kwargs, variables, extra
    return kwargs, variables


# ---------------------------------------------------------------------------
# Orbax train-state checkpoints

def _ckpt_dir(path: str) -> str:
    return os.path.abspath(path)


_PENDING_SAVE: Optional["threading.Thread"] = None


def wait_for_pending_saves() -> None:
    """Join the in-flight background checkpoint write, if any. Called
    automatically by save/restore_train_state; call it explicitly before
    process exit if the last save used block=False."""
    global _PENDING_SAVE
    if _PENDING_SAVE is not None:
        _PENDING_SAVE.join()
        _PENDING_SAVE = None


def save_train_state(ckpt_dir: str, step: int, state, extra: Optional[dict] = None,
                     keep: Optional[int] = None, block: bool = True):
    """Orbax checkpoint of the TrainState; `extra` (loss history etc.) is a
    schema-free pytree, msgpack-serialized so its structure can change
    between save and resume (e.g. a growing loss list).

    `keep` -- if given, prune all but the newest `keep` step_* directories
    after a successful save (a full TrainState of the 46M gym model is
    ~800 MB; the reference keeps one rolling file, torch.save over the same
    name, gym_train.py:132-141 -- rotation is the crash-safe equivalent).

    `block=False` -- snapshot the state to host in the foreground (a no-op
    when the caller already passes numpy leaves, e.g. via gather_to_host),
    then run the disk write + rotation on a daemon-less background thread.
    Training resumes immediately; at most one write is in flight (a new
    save joins the previous one first). The round-4 CS run stalled ~120 s
    per checkpoint on the synchronous write (logs/cs_synth_r4.log step
    2020); this hides it behind subsequent train steps. Keep block=True on
    the SIGTERM path so the process does not exit mid-write."""
    import threading

    wait_for_pending_saves()
    path = os.path.join(_ckpt_dir(ckpt_dir), f"step_{step:09d}")
    blob = serialization.msgpack_serialize(
        jax.tree.map(np.asarray, extra or {}))
    # host snapshot happens in the FOREGROUND either way: jax.Arrays may be
    # donated/overwritten by the very next train step, so the background
    # thread must only ever touch numpy
    host_state = jax.tree.map(np.asarray, state)

    def _write():
        import orbax.checkpoint as ocp
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, dict(state=host_state,
                                  extra_blob=np.frombuffer(blob, np.uint8).copy()),
                       force=True)
        if keep is not None and keep > 0:
            d = _ckpt_dir(ckpt_dir)
            steps = sorted(int(m.group(1)) for n in os.listdir(d)
                           if (m := re.fullmatch(r"step_(\d+)", n)))
            for s in steps[:-keep]:
                shutil.rmtree(os.path.join(d, f"step_{s:09d}"),
                              ignore_errors=True)

    if block:
        _write()
    else:
        global _PENDING_SAVE
        t = threading.Thread(target=_write, name=f"ckpt-write-{step}")
        t.start()
        _PENDING_SAVE = t


def restore_train_state(ckpt_dir: str, step: int, state_template,
                        extra_template: Optional[dict] = None):
    """Returns (state, extra) with HOST (numpy) leaves -- callers device_put
    / shard afterwards. The template is forced to numpy before Orbax sees it:
    restoring onto device-resident jax.Arrays makes Orbax issue device puts
    from its own event loop, which deadlocks tunneled TPU runtimes.
    `extra_template` is accepted for backward compatibility but ignored --
    extra restores schema-free from its msgpack blob."""
    import orbax.checkpoint as ocp
    wait_for_pending_saves()
    path = os.path.join(_ckpt_dir(ckpt_dir), f"step_{step:09d}")
    host_template = jax.tree.map(lambda x: np.asarray(jax.device_get(x)),
                                 state_template)
    with ocp.PyTreeCheckpointer() as ckptr:
        out = ckptr.restore(path, item=dict(
            state=host_template, extra_blob=np.zeros(0, np.uint8)))
    extra = serialization.msgpack_restore(bytes(bytearray(out["extra_blob"])))
    return out["state"], extra


def latest_step(ckpt_dir: str) -> Optional[int]:
    """Regex scan for the newest checkpoint (reference
    torch_utils/distributed.py:118-139 CheckpointIO.load_latest)."""
    wait_for_pending_saves()
    d = _ckpt_dir(ckpt_dir)
    if not os.path.isdir(d):
        return None
    steps = [int(m.group(1)) for n in os.listdir(d)
             if (m := re.fullmatch(r"step_(\d+)", n))]
    return max(steps) if steps else None
