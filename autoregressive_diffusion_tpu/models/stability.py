"""Bridge to the Stability `sd-vae-ft-mse` image VAE as an alternative
latent source.

Parity with /root/reference/edm2/vae/stability.py:7-53 (StabilityVAEEncoder):
a host-side, torch-CPU/GPU encoder whose numpy outputs feed the TPU training
pipeline (the diffusion model itself never touches torch). Latents are
affine-rescaled from the published raw statistics to (final_mean, final_std),
matching the reference's scale/bias buffers.

The rescale math and the frames<->latents plumbing are pure functions
(`affine_from_stats`, `rescale_to_final`, `rescale_from_final`) unit-tested
without diffusers (tests/test_stability.py); only the pretrained-VAE download
requires `diffusers`, and a custom `vae` object can be injected instead.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def affine_from_stats(raw_mean: Sequence[float], raw_std: Sequence[float],
                      final_mean: float, final_std: float):
    """Per-channel affine (scale, bias) mapping raw latents with statistics
    (raw_mean, raw_std) to (final_mean, final_std): z' = z*scale + bias.
    Reference stability.py:20-24 (scale/bias buffers)."""
    raw_mean = np.asarray(raw_mean, np.float32)
    raw_std = np.asarray(raw_std, np.float32)
    scale = np.float32(final_std) / raw_std
    bias = np.float32(final_mean) - raw_mean * scale
    return scale, bias


def rescale_to_final(z: np.ndarray, scale: np.ndarray,
                     bias: np.ndarray) -> np.ndarray:
    """Raw channels-last latents -> final (rescaled) latents."""
    return z * scale + bias


def rescale_from_final(z: np.ndarray, scale: np.ndarray,
                       bias: np.ndarray) -> np.ndarray:
    """Inverse of `rescale_to_final` (reference stability.py:45-49)."""
    return (z - bias) / scale


class StabilityVAEBridge:
    """Host-side wrapper: uint8 frames (b, t, h, w, c) -> final latents
    (b, t, h/8, w/8, 4) as numpy arrays (channels-last for the TPU model).

    `vae`: optional pre-built object with diffusers' AutoencoderKL interface
    (`encode(x)["latent_dist"].mean/.std`, `decode(z)["sample"]`); when None,
    `vae_name` is downloaded via diffusers.
    """

    def __init__(self,
                 vae_name: str = "stabilityai/sd-vae-ft-mse",
                 raw_mean: Sequence[float] = (5.81, 3.25, 0.12, -2.15),
                 raw_std: Sequence[float] = (4.17, 4.62, 3.71, 3.28),
                 final_mean: float = 0.0,
                 final_std: float = 0.5,
                 batch_size: int = 8,
                 device: str = "cpu",
                 vae: Optional[object] = None):
        import torch

        self._torch = torch
        self.scale, self.bias = affine_from_stats(raw_mean, raw_std,
                                                  final_mean, final_std)
        self.batch_size = int(batch_size)
        self.device = device
        if vae is None:
            from diffusers import AutoencoderKL
            vae = (AutoencoderKL.from_pretrained(vae_name)
                   .requires_grad_(False).to(device))
        self._vae = vae

    def _encode_raw(self, x_bchw):
        torch = self._torch
        outs = []
        with torch.no_grad():
            for chunk in x_bchw.split(self.batch_size):
                d = self._vae.encode(chunk)["latent_dist"]
                outs.append(torch.cat([d.mean, d.std], dim=1))
        return torch.cat(outs)

    def frames_to_latents(self, frames: np.ndarray, sample: bool = True,
                          seed: int = 0) -> np.ndarray:
        """uint8 (b, t, h, w, c) [0,255] -> final latents (b, t, h/8, w/8, 4).
        `sample=False` returns the rescaled posterior mean."""
        torch = self._torch
        b, t = frames.shape[:2]
        x = torch.from_numpy(
            np.ascontiguousarray(frames.reshape((-1,) + frames.shape[2:]))
        ).to(self.device).permute(0, 3, 1, 2).float() / 255.0
        raw = self._encode_raw(x)  # (bt, 8, h', w'): mean ‖ std
        mean, std = raw.chunk(2, dim=1)
        if sample:
            g = torch.Generator(device="cpu").manual_seed(seed)
            noise = torch.randn(mean.shape, generator=g).to(mean.device)
            z = mean + noise * std
        else:
            z = mean
        z = z.permute(0, 2, 3, 1).cpu().numpy()
        z = rescale_to_final(z, self.scale, self.bias)
        return z.reshape((b, t) + z.shape[1:])

    def latents_to_frames(self, latents: np.ndarray) -> np.ndarray:
        """final latents (b, t, h', w', 4) -> uint8 frames (b, t, 8h', 8w', 3)
        (reference stability.py:45-53)."""
        torch = self._torch
        b, t = latents.shape[:2]
        z = rescale_from_final(latents.reshape((-1,) + latents.shape[2:]),
                               self.scale, self.bias)
        zt = torch.from_numpy(np.ascontiguousarray(z)).to(
            self.device).permute(0, 3, 1, 2).float()
        outs = []
        with torch.no_grad():
            for chunk in zt.split(self.batch_size):
                outs.append(self._vae.decode(chunk)["sample"])
        x = torch.cat(outs).clamp(0, 1).mul(255).to(torch.uint8)
        x = x.permute(0, 2, 3, 1).cpu().numpy()
        return x.reshape((b, t) + x.shape[1:])
