"""Debug & inspection utilities.

TPU-native equivalents of the reference's debug harnesses:
  * `assert_shape`        <- torch_utils/misc.py:93-105
  * `tile_images`         <- torch_utils/misc.py:270-274 (rollout tiling)
  * `find_nonfinite`      <- edm2/utils.py:165-206 `nan_inspector` forward
                             hooks; here a pure pytree scan usable on params,
                             grads, activations, or caches.
  * `nan_guard`           <- jax.debug-based check inside jitted code
                             (the reference's hooks cannot exist in JAX:
                             traced modules have no runtime hook points).
  * `compare_caches`      <- edm2/utils.py:214-357 recursive tolerant
                             comparison of nested cache pytrees.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class EasyDict(dict):
    """Attribute-access dict (reference dnnlib/util.py:37-50)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        del self[name]


def assert_shape(x, ref_shape: Sequence[Optional[int]]) -> None:
    """Assert x.shape matches ref_shape; None entries are wildcards."""
    if x.ndim != len(ref_shape):
        raise AssertionError(
            f"Wrong number of dimensions: got {x.ndim}, expected {len(ref_shape)}")
    for i, (size, ref) in enumerate(zip(x.shape, ref_shape)):
        if ref is not None and size != ref:
            raise AssertionError(
                f"Wrong size for dimension {i}: got {size}, expected {ref}")


def tile_images(images: np.ndarray, grid_w: Optional[int] = None,
                grid_h: Optional[int] = None) -> np.ndarray:
    """(N, H, W, C) -> (grid_h*H, grid_w*W, C) tiled image."""
    images = np.asarray(images)
    n, h, w = images.shape[:3]
    if grid_w is None:
        grid_w = int(np.ceil(np.sqrt(n))) if grid_h is None else -(-n // grid_h)
    if grid_h is None:
        grid_h = -(-n // grid_w)
    pad = grid_w * grid_h - n
    if pad:
        images = np.concatenate([images, np.zeros((pad,) + images.shape[1:],
                                                  images.dtype)])
    return (images.reshape(grid_h, grid_w, *images.shape[1:])
            .swapaxes(1, 2)
            .reshape(grid_h * images.shape[1], grid_w * images.shape[2],
                     *images.shape[3:]))


def find_nonfinite(tree: Any, prefix: str = "") -> List[str]:
    """Scan a pytree for arrays containing NaN/Inf; returns their key paths.

    Host-side equivalent of the reference's nan_inspector forward hooks
    (edm2/utils.py:165-206): run on params/grads/caches between steps."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if leaf is None:
            continue
        arr = np.asarray(jax.device_get(leaf))
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            name = prefix + jax.tree_util.keystr(path)
            n_bad = int((~np.isfinite(arr)).sum())
            bad.append(f"{name}: {n_bad}/{arr.size} non-finite")
    return bad


def nan_guard(x: jax.Array, name: str = "tensor") -> jax.Array:
    """In-jit NaN tripwire: prints from compiled code when x goes non-finite.
    Cheap (one reduction); returns x unchanged."""
    bad = jnp.logical_not(jnp.all(jnp.isfinite(x)))
    jax.debug.print("NaN-guard [{n}]: non_finite={b}", n=name, b=bad,
                    ordered=False)
    return x


def compare_caches(a: Any, b: Any, rtol: float = 1e-4, atol: float = 1e-4,
                   _path: str = "") -> List[str]:
    """Recursively compare two nested cache pytrees; returns a list of
    human-readable mismatch descriptions (empty == equal). Reference:
    edm2/utils.py:214-357 `compare_caches`."""
    diffs: List[str] = []
    if isinstance(a, dict) and isinstance(b, dict):
        for k in sorted(set(a) | set(b)):
            if k not in a or k not in b:
                diffs.append(f"{_path}/{k}: present in only one cache")
            else:
                diffs += compare_caches(a[k], b[k], rtol, atol, f"{_path}/{k}")
        return diffs
    if a is None and b is None:
        return diffs
    if (a is None) != (b is None):
        return [f"{_path}: one side is None"]
    av, bv = np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b))
    if av.shape != bv.shape:
        return [f"{_path}: shape {av.shape} vs {bv.shape}"]
    if av.dtype.kind == "f":
        if not np.allclose(av, bv, rtol=rtol, atol=atol):
            err = float(np.abs(av - bv).max())
            diffs.append(f"{_path}: max abs diff {err:.3e}")
    elif not np.array_equal(av, bv):
        diffs.append(f"{_path}: values differ")
    return diffs
