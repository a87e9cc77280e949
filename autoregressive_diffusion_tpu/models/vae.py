"""Group-causal video VAE (Flax, channels-last).

Reimplementation of /root/reference/edm2/vae/vae.py:
  * GroupCausalConv3d (:18-53): conv3d with time-stride = group_size and
    pixel-unshuffle back, causal time padding carried as a streaming cache.
    Fully causal in latent space, group-causal in pixels.
  * VAEResBlock (:56-93), EncoderDecoderBlock/UpDownBlock (:96-163),
    EncoderDecoder (:167-203), VAE (:207-318).

Documented divergences:
  * frames_to_latents implements the INTENDED semantics (normalize latents to
    unit std: (l - mean) / std) -- the reference function has a missing
    return and applies (l-mean)+std (vae.py:264-284, noted buggy in
    SURVEY.md section 7); every caller (cs_train.py:102) uses the intended
    form.
  * conv bias init is zeros (torch default is uniform); training from
    scratch makes this immaterial.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import einops
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.numerics import mp_fourier

# torch Conv default: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), ..)
_torch_conv_init = nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform")


def _group_causal_init(group_size: int):
    """Reference vae.py:26-30: zero every tap older than the group, then
    scale by 32**-0.25."""
    def init(key, shape, dtype=jnp.float32):
        w = _torch_conv_init(key, shape, dtype)
        kt = shape[0]
        if kt > group_size:
            mask = jnp.concatenate([jnp.zeros((kt - group_size,)),
                                    jnp.ones((group_size,))])
            w = w * mask[:, None, None, None, None]
        return w * 32 ** -0.25
    return init


class GroupCausalConv3d(nn.Module):
    """Conv3d(in, out*g, kernel, stride=(g,1,1)) + time pixel-unshuffle.
    Reference vae.py:18-53. x: (b, t, h, w, c); cache carries the last
    `time_padding` spatially-padded frames for streaming."""
    out_channels: int
    kernel: Tuple[int, int, int]
    group_size: int = 1
    dilation: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x: jax.Array, cache=None, streaming: bool = False):
        kt, kh, kw = self.kernel
        dt, dh, dw = self.dilation
        g = self.group_size
        time_padding = kt + (kt - 1) * (dt - 1) - g

        w = self.param("kernel", _group_causal_init(g),
                       (kt, kh, kw, x.shape[-1], self.out_channels * g))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels * g,))

        # spatial SAME padding (explicit, so the cache includes it)
        x = jnp.pad(x, ((0, 0), (0, 0), (dh * (kh // 2),) * 2,
                        (dw * (kw // 2),) * 2, (0, 0)))
        if cache is None:
            # self-padding: repeat the first frames (reference vae.py:43-47)
            cache = jax.lax.stop_gradient(x[:, :time_padding])
        x = jnp.concatenate([cache, x], axis=1)
        new_cache = (jax.lax.stop_gradient(x[:, -time_padding:])
                     if streaming else None)

        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(g, 1, 1), padding="VALID",
            rhs_dilation=self.dilation,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
        y = einops.rearrange(y, "b t h w (c g) -> b (t g) h w c", g=g)
        return y, new_cache


def rms_norm(x: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Channel RMS pixel-norm (reference vae.py:77)."""
    return x / jnp.sqrt(jnp.mean(x**2, axis=-1, keepdims=True) + eps)


class VAEResBlock(nn.Module):
    """Reference vae.py:56-93."""
    channels: int
    kernel: Tuple[int, int, int] = (8, 3, 3)
    group_size: int = 1
    t_cond: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, t=None, cache=None, streaming=False):
        if cache is None:
            cache = {}
        y = rms_norm(x)
        if t is not None and self.t_cond:
            def init_f(name):
                def init():
                    k = self.make_rng("params")
                    if name == "freqs":
                        return 2 * jnp.pi * jax.random.normal(k, (self.channels * 2,))
                    return 2 * jnp.pi * jax.random.uniform(k, (self.channels * 2,))
                return init
            freqs = self.variable("buffers", "freqs", init_f("freqs")).value
            phases = self.variable("buffers", "phases", init_f("phases")).value
            f_t = mp_fourier(t, freqs, phases)
            t_emb = nn.Dense(self.channels * 2, kernel_init=nn.initializers.zeros,
                             bias_init=nn.initializers.zeros, name="t_cond")(f_t)
            scale, shift = jnp.split(t_emb[:, None, None, None, :], 2, axis=-1)
            y = y * (1 + scale) + shift
        y = jax.nn.silu(y)
        y, c0 = GroupCausalConv3d(self.channels, self.kernel, self.group_size,
                                  name="conv3d0")(
            y, cache.get("conv3d0"), streaming)
        y = rms_norm(y)
        y = jax.nn.silu(y)
        y = nn.Conv(self.channels, (1, 3, 3), padding=((0, 0), (1, 1), (1, 1)),
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="conv3d1")(y)
        new_cache = {"conv3d0": c0} if streaming else None
        return x + y, new_cache


def adaptive_channel_pool(x: jax.Array, out_channels: int) -> jax.Array:
    """torch F.interpolate(mode='area') over the channel axis
    (reference vae.py:136-141 interpolate_channels). Exact adaptive average
    pooling implemented as a static (in, out) averaging matrix."""
    c = x.shape[-1]
    if c == out_channels:
        return x
    mat = np.zeros((c, out_channels), np.float32)
    for j in range(out_channels):
        start = (j * c) // out_channels
        end = -((-(j + 1) * c) // out_channels)  # ceil
        mat[start:end, j] = 1.0 / (end - start)
    return x @ jnp.asarray(mat, x.dtype)


def updown(x: jax.Array, time_c: int, spatial_c: int, direction: str) -> jax.Array:
    """Space/time pixel shuffle (reference vae.py:148-163)."""
    if time_c * spatial_c**2 == 1:
        return x
    if direction == "down":
        return einops.rearrange(
            x, "b (t tc) (h hc) (w wc) c -> b t h w (tc hc wc c)",
            tc=time_c, hc=spatial_c, wc=spatial_c)
    return einops.rearrange(
        x, "b t h w (tc hc wc c) -> b (t tc) (h hc) (w wc) c",
        tc=time_c, hc=spatial_c, wc=spatial_c)


class EncoderDecoderBlock(nn.Module):
    """Reference vae.py:96-134."""
    in_channels: int
    out_channels: int
    time_compression: int
    spatial_compression: int
    kernel: Tuple[int, int, int]
    group_size: int
    n_res_blocks: int
    block_type: str = "encoder"

    @nn.compact
    def __call__(self, x, t=None, cache=None, streaming=False):
        if cache is None:
            cache = {}
        total = self.time_compression * self.spatial_compression**2
        is_dec = self.block_type == "decoder"

        if is_dec:
            x = nn.Conv(self.in_channels * total, (1, 1, 1),
                        kernel_init=_torch_conv_init,
                        name="decompression_block")(x)
            x = updown(x, self.time_compression, self.spatial_compression, "up")
        else:
            x = updown(x, self.time_compression, self.spatial_compression, "down")
            res = x
            x = nn.Conv(self.out_channels, (1, 1, 1),
                        kernel_init=_torch_conv_init,
                        name="compression_block")(x)
            x = x + adaptive_channel_pool(res, x.shape[-1])

        new_cache = {}
        ch = self.in_channels if is_dec else self.out_channels
        for i in range(self.n_res_blocks):
            x, c = VAEResBlock(ch, self.kernel, self.group_size,
                               t_cond=is_dec, name=f"res_block_{i}")(
                x, t if is_dec else None, cache.get(f"res_block_{i}"), streaming)
            new_cache[f"res_block_{i}"] = c

        if is_dec:
            res = x
            x = nn.Conv(self.out_channels, (1, 1, 1),
                        kernel_init=_torch_conv_init, name="final_conv")(x)
            x = x + adaptive_channel_pool(res, x.shape[-1])
        return x, (new_cache if streaming else None)


class EncoderDecoder(nn.Module):
    """Reference vae.py:167-203."""
    channels: Tuple[int, ...]
    n_res_blocks: int
    time_compressions: Tuple[int, ...]
    spatial_compressions: Tuple[int, ...]
    coder_type: str = "encoder"

    @nn.compact
    def __call__(self, x, t=None, cache=None, streaming=False):
        if cache is None:
            cache = {}
        assert len(self.channels) - 1 == len(self.time_compressions) \
            == len(self.spatial_compressions)
        channels = list(self.channels)
        group_sizes = list(np.cumprod(self.time_compressions))
        if self.coder_type == "encoder":
            group_sizes = group_sizes[::-1]
        else:
            channels = channels[::-1]
            channels[-1] = channels[-1] * 2  # (mean, logvar)
        kernels = [(int(g) * 2, 3, 3) for g in group_sizes]
        cin, cout = channels[:-1], channels[1:]

        new_cache = {}
        for i in range(len(group_sizes)):
            x, c = EncoderDecoderBlock(
                cin[i], cout[i], self.time_compressions[i],
                self.spatial_compressions[i], kernels[i], int(group_sizes[i]),
                self.n_res_blocks, self.coder_type,
                name=f"encoder_block_{i}")(
                x, t, cache.get(f"encoder_block_{i}"), streaming)
            new_cache[f"encoder_block_{i}"] = c
        new_cache = new_cache if streaming else None

        if self.coder_type == "encoder":
            return x, new_cache
        logvar_multiplier = self.param("logvar_multiplier",
                                       lambda k: jnp.float32(-2.0))
        mean, logvar = jnp.split(x, 2, axis=-1)
        logvar = logvar * jnp.exp(logvar_multiplier)
        return mean, logvar, new_cache


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    channels: Tuple[int, ...]
    n_res_blocks: int
    time_compressions: Tuple[int, ...] = (1, 2, 2)
    spatial_compressions: Tuple[int, ...] = (1, 2, 2)

    @property
    def latent_channels(self):
        return self.channels[-1]

    @property
    def time_compression(self):
        return int(np.prod(self.time_compressions))

    @property
    def spatial_compression(self):
        return int(np.prod(self.spatial_compressions))


class VAE(nn.Module):
    """Reference vae.py:207-318. Video layout (b, t, h, w, c); latents
    (b, t_lat, h_lat, w_lat, c_lat)."""
    cfg: VAEConfig

    def setup(self):
        c = self.cfg
        self.encoder = EncoderDecoder(c.channels, c.n_res_blocks,
                                      c.time_compressions,
                                      c.spatial_compressions, "encoder")
        self.decoder = EncoderDecoder(c.channels, c.n_res_blocks,
                                      c.time_compressions,
                                      c.spatial_compressions, "decoder")

    def __call__(self, x, key=None, t_max: float = 0.1):
        """Noise-augmented autoencode (reference :228-237):
        z = (1-t)*mean + t*eps with t ~ U(0, t_max)."""
        mean, _ = self.encode(x)
        if key is None:
            t = jnp.zeros((x.shape[0],), x.dtype)
            z = mean
        else:
            k1, k2 = jax.random.split(key)
            t = jax.random.uniform(k1, (x.shape[0],), x.dtype) * t_max
            tb = t[:, None, None, None, None]
            z = mean * (1 - tb) + jax.random.normal(k2, mean.shape, mean.dtype) * tb
        r_mean, r_logvar, _ = self.decode(z, t)
        return r_mean, r_logvar, mean

    def encode(self, x, cache=None, streaming=False):
        return self.encoder(x, None, cache, streaming)

    def decode(self, z, t, cache=None, streaming=False):
        return self.decoder(z, t, cache, streaming)


# ---------------------------------------------------------------------------
# Stateless helpers around VAE.apply (the reference has these as methods on
# the module; here they are host-level utilities that own the jit).

def encode_long_sequence(model, variables, frames, split_size: int = 256):
    """Chunked streaming encode with carried cache (reference :249-259)."""
    mean = None
    cache = None
    t = frames.shape[1]
    for s in range(0, t, split_size):
        chunk = frames[:, s:s + split_size]
        m, cache = model.apply(variables, chunk, cache=cache, streaming=True,
                               method=VAE.encode)
        mean = m if mean is None else jnp.concatenate([mean, m], axis=1)
    return mean


def frames_to_latents(model, variables, frames, mean, std):
    """(b, t, h, w, rgb) uint8/float in [0,255] -> unit-std latents.
    Intended semantics of reference :264-284 (see module docstring)."""
    x = frames.astype(jnp.float32) / 127.5 - 1.0
    latents, _ = model.apply(variables, x, method=VAE.encode)
    return (latents - mean) / std


def latents_to_frames(model, variables, latents, mean, std, t: float = 0.1):
    """Unit-std latents -> uint8 frames (reference :289-318)."""
    z = latents * std + mean
    tv = jnp.full((latents.shape[0],), t, latents.dtype)
    frames, _, _ = model.apply(variables, z, tv, method=VAE.decode)
    return jnp.clip((frames + 1) * 127.5, 0, 255).astype(jnp.uint8)


def worst_k_percent_loss(recon, frames, percent: float = 0.5):
    """Mean of the worst k% pixel MSEs (reference vae/utils.py:53-68) --
    'The Trick' that made the LunarLander VAE train."""
    losses = ((recon - frames) ** 2).reshape(-1)
    k = max(1, int(losses.size * percent / 100.0))
    return jnp.mean(jax.lax.top_k(losses, k)[0])
