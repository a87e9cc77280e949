"""Stability-VAE bridge tests (models/stability.py) without diffusers.

The reference StabilityVAEEncoder (/root/reference/edm2/vae/stability.py:7-53)
needs the downloaded sd-vae-ft-mse weights; here the affine-rescale math is
tested as pure functions and the batching/reshape plumbing of the bridge with
an injected fake torch VAE (torch is available in this environment,
diffusers / the weights are not).
"""
import numpy as np
import pytest

from autoregressive_diffusion_tpu.models.stability import (
    StabilityVAEBridge, affine_from_stats, rescale_from_final,
    rescale_to_final)

torch = pytest.importorskip("torch")


def test_affine_from_stats_normalizes_raw_statistics():
    raw_mean = (5.81, 3.25, 0.12, -2.15)
    raw_std = (4.17, 4.62, 3.71, 3.28)
    scale, bias = affine_from_stats(raw_mean, raw_std, final_mean=0.0,
                                    final_std=0.5)
    rng = np.random.default_rng(0)
    # raw latents with exactly the published statistics
    z = rng.normal(size=(4096, 4)).astype(np.float32)
    z = (z - z.mean(0)) / z.std(0) * raw_std + raw_mean
    out = rescale_to_final(z, scale, bias)
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(0), 0.5, atol=1e-5)


def test_rescale_round_trip():
    scale, bias = affine_from_stats((1.0, -2.0), (3.0, 0.5), 0.1, 0.7)
    rng = np.random.default_rng(1)
    z = rng.normal(size=(8, 5, 5, 2)).astype(np.float32)
    back = rescale_from_final(rescale_to_final(z, scale, bias), scale, bias)
    np.testing.assert_allclose(back, z, rtol=1e-5, atol=1e-6)


class _FakeLatentDist:
    def __init__(self, mean, std):
        self.mean, self.std = mean, std


class _FakeVAE:
    """Deterministic stand-in for diffusers' AutoencoderKL: encode = 8x8
    average-pool to 4 channels (linear), decode = its transpose-ish upsample.
    Records chunk sizes so batching can be asserted."""

    def __init__(self):
        self.encode_chunks = []
        self.decode_chunks = []

    def encode(self, x):  # x: (b, 3, h, w)
        self.encode_chunks.append(int(x.shape[0]))
        b, c, h, w = x.shape
        p = x.reshape(b, c, h // 8, 8, w // 8, 8).mean(dim=(3, 5))
        mean = torch.cat([p, p[:, :1] * 0.5], dim=1)  # 4 channels
        std = torch.ones_like(mean) * 0.25
        return {"latent_dist": _FakeLatentDist(mean, std)}

    def decode(self, z):  # z: (b, 4, h', w')
        self.decode_chunks.append(int(z.shape[0]))
        up = z[:, :3].repeat_interleave(8, dim=2).repeat_interleave(8, dim=3)
        return {"sample": up}


def _bridge(batch_size=3):
    return StabilityVAEBridge(raw_mean=(0.0, 0.0, 0.0, 0.0),
                              raw_std=(1.0, 1.0, 1.0, 1.0),
                              final_mean=0.0, final_std=1.0,
                              batch_size=batch_size, vae=_FakeVAE())


def test_frames_to_latents_shapes_and_batching():
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, size=(2, 4, 32, 32, 3), dtype=np.uint8)
    br = _bridge(batch_size=3)
    z = br.frames_to_latents(frames, sample=False)
    assert z.shape == (2, 4, 4, 4, 4)  # (b, t, h/8, w/8, 4)
    # 8 images split into chunks of 3 -> 3, 3, 2
    assert br._vae.encode_chunks == [3, 3, 2]


def test_batch_size_does_not_change_results():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(1, 5, 32, 32, 3), dtype=np.uint8)
    z_small = _bridge(batch_size=2).frames_to_latents(frames, sample=False)
    z_big = _bridge(batch_size=64).frames_to_latents(frames, sample=False)
    np.testing.assert_allclose(z_small, z_big, rtol=1e-6, atol=1e-6)


def test_frames_to_latents_applies_affine():
    rng = np.random.default_rng(4)
    frames = rng.integers(0, 256, size=(1, 2, 32, 32, 3), dtype=np.uint8)
    raw = _bridge().frames_to_latents(frames, sample=False)
    br = StabilityVAEBridge(raw_mean=(1.0, 2.0, 3.0, 4.0),
                            raw_std=(2.0, 2.0, 2.0, 2.0),
                            final_mean=0.0, final_std=0.5,
                            batch_size=8, vae=_FakeVAE())
    scaled = br.frames_to_latents(frames, sample=False)
    expect = rescale_to_final(raw, br.scale, br.bias)
    np.testing.assert_allclose(scaled, expect, rtol=1e-5, atol=1e-5)


def test_sampling_uses_posterior_std_deterministically():
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, size=(1, 2, 32, 32, 3), dtype=np.uint8)
    br = _bridge()
    mean = br.frames_to_latents(frames, sample=False)
    s1 = br.frames_to_latents(frames, sample=True, seed=7)
    s2 = br.frames_to_latents(frames, sample=True, seed=7)
    s3 = br.frames_to_latents(frames, sample=True, seed=8)
    np.testing.assert_array_equal(s1, s2)  # seeded -> reproducible
    assert np.abs(s1 - mean).max() > 1e-3  # noise actually added
    assert np.abs(s1 - s3).max() > 1e-3    # seed-dependent
    # fake posterior std is 0.25 everywhere; final_std scale is 1
    resid = (s1 - mean).ravel()
    assert 0.15 < resid.std() < 0.35


def test_latents_to_frames_round_trip_shapes():
    rng = np.random.default_rng(6)
    lat = rng.normal(size=(2, 3, 4, 4, 4)).astype(np.float32)
    br = _bridge(batch_size=4)
    px = br.latents_to_frames(lat)
    assert px.shape == (2, 3, 32, 32, 3)
    assert px.dtype == np.uint8
    assert br._vae.decode_chunks == [4, 2]
