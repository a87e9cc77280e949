"""VAE stack: group-causality (mirrors /root/reference/edm2/vae_test.py),
streaming-encode consistency, shape round-trips, worst-k loss, and the
adversarial discriminator."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoregressive_diffusion_tpu.models.vae import (
    VAE, VAEConfig, GroupCausalConv3d, adaptive_channel_pool,
    encode_long_sequence, frames_to_latents, latents_to_frames,
    worst_k_percent_loss)
from autoregressive_diffusion_tpu.models.discriminator import (
    MixedDiscriminator, discriminator_loss, vae_adversarial_loss)


def test_group_causality():
    """Perturbing frame t affects exactly [(t//g)*g, (t//g)*g + kt) and
    nothing else (reference vae_test.py:26-58)."""
    conv = GroupCausalConv3d(3, (8, 3, 3), group_size=4)
    b, t, h, w, c = 2, 16, 8, 8, 3
    x = jnp.zeros((b, t, h, w, c))
    params = conv.init(jax.random.PRNGKey(0), x)
    # the group-causal init zeroes taps older than the group (so at init the
    # receptive field is only the frame's own group); test the STRUCTURAL
    # receptive field with dense random weights instead
    params = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(9), p.shape) * 0.2
        if p.ndim == 5 else p, params)

    y0, _ = conv.apply(params, x)
    cut = 6
    g, kt = 4, 8
    lo = (cut // g) * g
    hi = min(lo + kt, t)
    xp = x.at[:, cut].set(jax.random.normal(jax.random.PRNGKey(1), (b, h, w, c)))
    y1, _ = conv.apply(params, xp)
    d = y1 - y0
    assert float(jnp.std(d[:, :lo])) <= 1e-3
    assert float(jnp.min(jnp.std(d[:, lo:hi], axis=(0, 2, 3)))) >= 0.01
    assert float(jnp.std(d[:, hi:])) <= 1e-3


CFG = VAEConfig(channels=(3, 8, 8, 4), n_res_blocks=1,
                time_compressions=(1, 2, 2), spatial_compressions=(1, 2, 2))


@pytest.fixture(scope="module")
def vae_setup():
    model = VAE(CFG)
    x = jnp.zeros((1, 8, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x, key=jax.random.PRNGKey(1))
    return model, variables


def test_vae_shapes(vae_setup):
    model, variables = vae_setup
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 16, 16, 3))
    r_mean, r_logvar, mean = model.apply(variables, x, key=jax.random.PRNGKey(3))
    # 4x time, 4x space compression; 4 latent channels
    assert mean.shape == (2, 2, 4, 4, 4)
    assert r_mean.shape == x.shape
    assert r_logvar.shape == x.shape
    assert bool(jnp.isfinite(r_mean).all())


def test_streaming_encode_matches_full(vae_setup):
    """encode_long_sequence with carried cache == one-shot encode
    (reference vae.py:249-259)."""
    model, variables = vae_setup
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 16, 3))
    full, _ = model.apply(variables, x, method=VAE.encode)
    chunked = encode_long_sequence(model, variables, x, split_size=8)
    assert chunked.shape == full.shape
    d = float(jnp.abs(full - chunked).max())
    assert d <= 1e-4, d


def test_frames_latents_roundtrip_shapes(vae_setup):
    model, variables = vae_setup
    frames = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (1, 8, 16, 16, 3)),
        jnp.float32)
    mean, std = jnp.zeros((4,)), jnp.ones((4,))
    lat = frames_to_latents(model, variables, frames, mean, std)
    assert lat.shape == (1, 2, 4, 4, 4)
    out = latents_to_frames(model, variables, lat, mean, std)
    assert out.shape == frames.shape
    assert out.dtype == jnp.uint8


def test_adaptive_channel_pool_matches_torch_area():
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 10, 12)).astype(np.float32)
    for cf in (3, 4, 6, 24):
        ours = np.asarray(adaptive_channel_pool(jnp.asarray(x), cf))
        theirs = F.interpolate(torch.from_numpy(x), cf, mode="area").numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_worst_k_percent_loss():
    recon = jnp.zeros((1000,))
    frames = jnp.concatenate([jnp.zeros((990,)), jnp.full((10,), 2.0)])
    # worst 1% = the 10 elements with error 4
    assert float(worst_k_percent_loss(recon, frames, percent=1.0)) == pytest.approx(4.0)


def test_discriminator_losses():
    disc = MixedDiscriminator()
    frames = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 16, 16, 3))
    recon = frames + 0.1 * jax.random.normal(jax.random.PRNGKey(6), frames.shape)
    x6 = jnp.concatenate([frames, recon], axis=-1)
    variables = disc.init(jax.random.PRNGKey(7), x6)
    logits = disc.apply(variables, x6, False)
    assert logits.shape[0] == 1 and logits.shape[-1] == 2

    g_loss, _ = vae_adversarial_loss(disc, variables, frames, recon, train=False)
    d_loss, _ = discriminator_loss(disc, variables, frames, recon, train=False)
    assert np.isfinite(float(g_loss)) and np.isfinite(float(d_loss))
    # untrained discriminator: both CE/log2 values are near 1 bit
    assert 0.3 < float(d_loss) < 3.0
