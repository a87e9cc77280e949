"""Perceptual losses: exact-architecture AlexNet-LPIPS + a random-feature
substitute.

The reference uses alexnet-LPIPS (/root/reference/cs_vae_train.py:80,118-121,
cs_vae_adversarial.py). This module provides:

  * `alexnet_lpips_distance` / `alexnet_lpips_loss`: the EXACT architecture
    of pip-lpips `LPIPS(net='alex', spatial=False)` — scaling layer, the five
    torchvision-AlexNet feature slices, channel-unit-normalized feature
    diffs, calibrated 1x1 linear heads, spatial average — in JAX, with
    `load_lpips_params` importing the torch weights (torchvision AlexNet
    backbone + the lpips v0.1 linear heads) when checkpoint files are
    available. Architecture-exactness is proven against a torch-side oracle
    in tests/test_perceptual.py. The calibrated weights themselves are not
    shipped (no network egress in this environment) — point
    AD_TPU_LPIPS_WEIGHTS at a torch state-dict file to get weight-exact
    parity with the reference.
  * `random_feature_perceptual_loss`: distance in the feature space of a
    FIXED random multi-scale conv net (random-feature perceptual metrics
    correlate well with trained ones for reconstruction training), with the
    same log-compression the reference applies (log(lpips + eps)). Used as
    the fallback when no LPIPS weights are provided.
  * `perceptual_loss`: dispatcher the training scripts call — exact LPIPS
    when AD_TPU_LPIPS_WEIGHTS is set, random-feature otherwise.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=4)
def _random_filters(seed: int, in_ch: int, widths=(32, 64, 64)):
    rng = np.random.default_rng(seed)
    filters = []
    c = in_ch
    for w in widths:
        f = rng.normal(size=(3, 3, c, w)).astype(np.float32)
        f /= np.sqrt((f**2).sum(axis=(0, 1, 2), keepdims=True)) + 1e-8
        filters.append(f)
        c = w
    return tuple(filters)


def _features(x, filters):
    feats = []
    for f in filters:
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(f), window_strides=(2, 2),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.leaky_relu(x, 0.2)
        # unit-normalize channels like LPIPS
        feats.append(x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8))
    return feats


def random_feature_perceptual_loss(recon: jax.Array, frames: jax.Array,
                                   seed: int = 0, log_compress: bool = True,
                                   eps: float = 1e-8) -> jax.Array:
    """recon/frames: (b, t, h, w, c) in [-1, 1]. Per-frame perceptual
    distance, log-compressed and averaged (reference cs_vae_train.py:
    110-121)."""
    b, t = frames.shape[:2]
    x = jnp.clip(recon, -1, 1).reshape((b * t,) + recon.shape[2:])
    y = jnp.clip(frames, -1, 1).reshape((b * t,) + frames.shape[2:])
    filters = _random_filters(seed, frames.shape[-1])
    fx, fy = _features(x, filters), _features(y, filters)
    per_frame = sum(jnp.mean((a - b) ** 2, axis=(1, 2, 3)) for a, b in zip(fx, fy))
    if log_compress:
        return jnp.mean(jnp.log(per_frame + eps))
    return jnp.mean(per_frame)


# ---------------------------------------------------------------------------
# Exact AlexNet-LPIPS (pip-lpips v0.1 `LPIPS(net='alex')`, the loss the
# reference instantiates at cs_vae_train.py:80).
# ---------------------------------------------------------------------------

# The five torchvision-AlexNet feature slices LPIPS taps (pretrained_networks
# alexnet slices 1-5): (maxpool 3x2 before, out_ch, kernel, stride, pad).
_ALEX_SLICES = (
    (False, 64, 11, 4, 2),
    (True, 192, 5, 1, 2),
    (True, 384, 3, 1, 1),
    (False, 256, 3, 1, 1),
    (False, 256, 3, 1, 1),
)
# LPIPS ScalingLayer buffers (input in [-1, 1] -> ImageNet-ish statistics).
LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def alexnet_lpips_distance(x: jax.Array, y: jax.Array, params: dict,
                           eps: float = 1e-10) -> jax.Array:
    """Exact pip-lpips `LPIPS(net='alex')` forward. x, y: (n, h, w, 3) NHWC
    in [-1, 1]; returns (n,) distances.

    params: {'convs': [(w_hwio, b)] * 5, 'lins': [(c,)] * 5} — see
    `lpips_params_from_torch` / `load_lpips_params`.
    """
    shift = jnp.asarray(LPIPS_SHIFT)
    scale = jnp.asarray(LPIPS_SCALE)

    def backbone(v):
        v = (v - shift) / scale
        feats = []
        for i, (pool, _, _, s, p) in enumerate(_ALEX_SLICES):
            if pool:
                v = jax.lax.reduce_window(
                    v, -jnp.inf, jax.lax.max,
                    (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
            w, b = params["convs"][i]
            v = jax.lax.conv_general_dilated(
                v, jnp.asarray(w), (s, s), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + jnp.asarray(b)
            v = jax.nn.relu(v)
            feats.append(v)
        return feats

    fx, fy = backbone(x), backbone(y)
    total = jnp.zeros(x.shape[0], x.dtype)
    for lin, a, b in zip(params["lins"], fx, fy):
        # lpips normalize_tensor: v / (||v||_channels + eps)
        na = a / (jnp.sqrt(jnp.sum(a * a, -1, keepdims=True)) + eps)
        nb = b / (jnp.sqrt(jnp.sum(b * b, -1, keepdims=True)) + eps)
        d = (na - nb) ** 2
        # NetLinLayer: 1x1 conv to 1 channel, no bias; then spatial average.
        total = total + jnp.mean(d @ jnp.asarray(lin), axis=(1, 2))
    return total


def alexnet_lpips_loss(recon: jax.Array, frames: jax.Array, params: dict,
                       log_compress: bool = True,
                       eps: float = 1e-8) -> jax.Array:
    """(b, t, h, w, 3) in [-1, 1] -> mean over frames of log(lpips + eps),
    the reference's reduction (cs_vae_train.py:118-121)."""
    b, t = frames.shape[:2]
    x = jnp.clip(recon, -1, 1).reshape((b * t,) + recon.shape[2:])
    y = jnp.clip(frames, -1, 1).reshape((b * t,) + frames.shape[2:])
    per_frame = alexnet_lpips_distance(x, y, params)
    if log_compress:
        return jnp.mean(jnp.log(per_frame + eps))
    return jnp.mean(per_frame)


_ALEX_CONV_SHAPES = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
                     (256, 384, 3, 3), (256, 256, 3, 3)]


def lpips_params_from_torch(*state_dicts) -> dict:
    """Convert torch state dict(s) into `alexnet_lpips_distance` params.

    Accepts any combination of: a torchvision AlexNet state dict
    (features.{0,3,6,8,10}.weight/bias), a pip-lpips full-model dump
    (net.slice{k}.{j}.weight, lin{k}.model.1.weight), or the official lpips
    v0.1 linear-heads-only file. Tensors are identified by shape — conv
    weights by their unique 4-d shapes, linear heads by (1, c, 1, 1) — so
    key prefixes don't matter. Raises ValueError on missing pieces.
    """
    convs: dict[int, tuple] = {}
    lins: dict[int, np.ndarray] = {}
    lin_chans = [s[0] for s in _ALEX_CONV_SHAPES]
    for sd in state_dicts:
        for key, val in sd.items():
            arr = np.asarray(val.detach().cpu().numpy()
                             if hasattr(val, "detach") else val,
                             dtype=np.float32)
            if arr.ndim != 4:
                continue
            shape = tuple(arr.shape)
            if shape[0] == 1 and shape[2:] == (1, 1) and shape[1] in lin_chans:
                # linear head (1, c, 1, 1); the two 256-channel heads are
                # disambiguated by state-dict order (lin3 before lin4).
                idx = lin_chans.index(shape[1])
                while idx in lins and idx + 1 < 5 and lin_chans[idx + 1] == shape[1]:
                    idx += 1
                lins[idx] = arr[0, :, 0, 0]
            elif shape in _ALEX_CONV_SHAPES:
                idx = _ALEX_CONV_SHAPES.index(shape)
                bias_key = key[:-len("weight")] + "bias"
                bias = sd.get(bias_key)
                if bias is None:
                    raise ValueError(f"conv weight {key} has no bias {bias_key}")
                bias = np.asarray(bias.detach().cpu().numpy()
                                  if hasattr(bias, "detach") else bias,
                                  dtype=np.float32)
                # torch OIHW -> HWIO
                convs[idx] = (arr.transpose(2, 3, 1, 0), bias)
    if sorted(convs) != [0, 1, 2, 3, 4]:
        raise ValueError(f"missing AlexNet convs: have {sorted(convs)}")
    if sorted(lins) != [0, 1, 2, 3, 4]:
        raise ValueError(f"missing LPIPS linear heads: have {sorted(lins)}")
    return {"convs": [convs[i] for i in range(5)],
            "lins": [lins[i] for i in range(5)]}


@functools.lru_cache(maxsize=2)
def load_lpips_params(paths: tuple) -> dict:
    """Load torch checkpoint file(s) (comma-joined in AD_TPU_LPIPS_WEIGHTS,
    e.g. 'alexnet.pth,lpips_alex_v0.1.pth') and convert."""
    import torch
    sds = [torch.load(p, map_location="cpu", weights_only=True)
           for p in paths]
    return lpips_params_from_torch(*sds)


_CALIBRATED_NPZ = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "saved_models",
    "lpips_alex_calibrated.npz")


@functools.lru_cache(maxsize=1)
def calibrated_lpips_params(path: str = "") -> dict:
    """The committed offline-calibrated AlexNet-LPIPS params
    (tools/calibrate_lpips.py): exact lpips architecture, fixed-seed
    He-init backbone, linear heads calibrated for equal per-layer
    contribution on a synthetic distortion corpus. Under the reference's
    log(lpips + eps) reduction the global scale is gradient-free, so the
    per-layer weighting is the entire calibration surface."""
    z = np.load(path or _CALIBRATED_NPZ)
    return {"convs": [(z[f"conv{i}_w"], z[f"conv{i}_b"]) for i in range(5)],
            "lins": [z[f"lin{i}"] for i in range(5)]}


def perceptual_loss(recon: jax.Array, frames: jax.Array,
                    seed: int = 0) -> jax.Array:
    """What the VAE training scripts call, in preference order:
      1. exact trained AlexNet-LPIPS when AD_TPU_LPIPS_WEIGHTS points at
         torch checkpoint file(s) (weight-exact reference parity);
      2. the committed offline-calibrated AlexNet-LPIPS
         (calibrated_lpips_params) for 3-channel inputs;
      3. the random-feature substitute (non-RGB inputs, or
         AD_TPU_LPIPS_CALIBRATED=0)."""
    weights = os.environ.get("AD_TPU_LPIPS_WEIGHTS", "")
    if weights:
        params = load_lpips_params(tuple(p for p in weights.split(",") if p))
        return alexnet_lpips_loss(recon, frames, params)
    if (frames.shape[-1] == 3 and os.path.exists(_CALIBRATED_NPZ)
            and os.environ.get("AD_TPU_LPIPS_CALIBRATED", "1") != "0"):
        return alexnet_lpips_loss(recon, frames, calibrated_lpips_params())
    return random_feature_perceptual_loss(recon, frames, seed=seed)
