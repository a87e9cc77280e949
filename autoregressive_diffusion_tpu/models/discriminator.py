"""Mixed 2D+3D video discriminator for adversarial VAE training.

Reimplementation of /root/reference/edm2/vae/discriminator.py (itself adapted
from Ruyi-Models): a BatchNorm/LeakyReLU/BlurPool 2D discriminator over
frames plus a GroupNorm/BlurPool3D temporal discriminator, judging which
channel-half of a 6-channel (frames||recon) stack is real via a 2-class
cross-entropy / log(2) (reference :286-329).

Layout: videos are (b, t, h, w, c) channels-last.
"""
from __future__ import annotations

import math
from typing import Tuple

import einops
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_torch_conv_init = nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform")


def _blur_filter(ndim: int) -> np.ndarray:
    f = np.array([1.0, 2.0, 1.0])
    k = f
    for _ in range(ndim - 1):
        k = np.multiply.outer(k, f)
    return (k / k.sum()).astype(np.float32)


def blur_pool_2d(x: jax.Array) -> jax.Array:
    """Depthwise [1,2,1] blur + stride-2 (reference :154-178).
    x: (..., h, w, c)."""
    c = x.shape[-1]
    k = jnp.asarray(_blur_filter(2))[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c)).astype(x.dtype)
    lead = x.shape[:-3]
    x4 = x.reshape((-1,) + x.shape[-3:])
    y = jax.lax.conv_general_dilated(
        x4, k, window_strides=(2, 2), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return y.reshape(lead + y.shape[1:])


def blur_pool_3d(x: jax.Array) -> jax.Array:
    """Depthwise 3D blur + stride-2 in (t,h,w) (reference :128-152).
    x: (b, t, h, w, c)."""
    c = x.shape[-1]
    k = jnp.asarray(_blur_filter(3))[:, :, :, None, None]
    k = jnp.tile(k, (1, 1, 1, 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(2, 2, 2), padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), feature_group_count=c)


class DiscriminatorBlock2D(nn.Module):
    """Reference :11-67."""
    out_channels: int
    add_downsample: bool = True
    output_scale_factor: float = math.sqrt(2)

    @nn.compact
    def __call__(self, x, train: bool = True):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        h = nn.BatchNorm(use_running_average=not train, name="norm1")(x)
        h = lrelu(h)
        h = nn.Conv(self.out_channels, (3, 3), kernel_init=_torch_conv_init,
                    name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, name="norm2")(h)
        h = lrelu(h)
        if self.add_downsample:
            h = blur_pool_2d(h)
            shortcut = nn.Conv(self.out_channels, (1, 1),
                               kernel_init=_torch_conv_init,
                               name="shortcut_conv")(blur_pool_2d(x))
        else:
            shortcut = x
        h = nn.Conv(self.out_channels, (3, 3), kernel_init=_torch_conv_init,
                    name="conv2")(h)
        return (h + shortcut) / self.output_scale_factor


class Discriminator2D(nn.Module):
    """Reference :70-113. Input (n, h, w, c) -> (n, h', w', 2) logits."""
    block_out_channels: Tuple[int, ...] = (64,)

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.block_out_channels[0], (3, 3),
                    kernel_init=_torch_conv_init, name="conv_in")(x)
        for i, ch in enumerate(self.block_out_channels):
            is_final = i == len(self.block_out_channels) - 1
            x = DiscriminatorBlock2D(ch, add_downsample=not is_final,
                                     name=f"block_{i}")(x, train)
        return nn.Conv(2, (3, 3), kernel_init=_torch_conv_init,
                       name="conv_out")(x)


class DiscriminatorBlock3D(nn.Module):
    """Reference :182-240. GroupNorm instead of BatchNorm; 3D shortcut conv
    always present."""
    out_channels: int
    add_downsample: bool = True
    output_scale_factor: float = math.sqrt(2)

    @nn.compact
    def __call__(self, x):
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        # torch GroupNorm eps default is 1e-5 (flax: 1e-6)
        h = nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=1e-5,
                         name="norm1")(x)
        h = lrelu(h)
        h = nn.Conv(self.out_channels, (3, 3, 3), kernel_init=_torch_conv_init,
                    name="conv1")(h)
        h = nn.GroupNorm(num_groups=min(32, self.out_channels), epsilon=1e-5,
                         name="norm2")(h)
        h = lrelu(h)
        if self.add_downsample:
            h = blur_pool_3d(h)
            shortcut = nn.Conv(self.out_channels, (1, 1, 1),
                               kernel_init=_torch_conv_init,
                               name="shortcut_conv")(blur_pool_3d(x))
        else:
            shortcut = nn.Conv(self.out_channels, (1, 1, 1),
                               kernel_init=_torch_conv_init,
                               name="shortcut_conv")(x)
        h = nn.Conv(self.out_channels, (3, 3, 3), kernel_init=_torch_conv_init,
                    name="conv2")(h)
        return (h + shortcut) / self.output_scale_factor


class Discriminator3D(nn.Module):
    """Reference :243-283. Input (b, t, h, w, c); stride-2 conv_in."""
    block_out_channels: Tuple[int, ...] = (64,)

    @nn.compact
    def __call__(self, x):
        # explicit (1,1) padding: torch pads symmetrically and floor-crops;
        # XLA SAME would pad stride-2 even sizes asymmetrically (off-by-one
        # window alignment vs the reference)
        x = nn.Conv(self.block_out_channels[0], (3, 3, 3), strides=(2, 2, 2),
                    padding=((1, 1), (1, 1), (1, 1)),
                    kernel_init=_torch_conv_init, name="conv_in")(x)
        for i, ch in enumerate(self.block_out_channels):
            is_final = i == len(self.block_out_channels) - 1
            x = DiscriminatorBlock3D(ch, add_downsample=not is_final,
                                     name=f"block_{i}")(x)
        return nn.Conv(2, (3, 3, 3), kernel_init=_torch_conv_init,
                       name="conv_out")(x)


class MixedDiscriminator(nn.Module):
    """Reference :286-303: concat of per-frame 2D logits and temporal 3D
    logits along the (downsampled) time axis. Returns (b, t', h', w', 2)."""
    in_channels: int = 6
    block_out_channels: Tuple[int, ...] = (64, 32)

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, t = x.shape[:2]
        x3 = Discriminator3D((64, 64), name="discriminator3d")(x)
        x2 = Discriminator2D((64, 64, 64), name="discriminator2d")(
            x.reshape((b * t,) + x.shape[2:]), train)
        x2 = x2.reshape((b, t) + x2.shape[1:])
        return jnp.concatenate([x2, x3], axis=1)


def _cross_entropy(model, variables, frames, recon, flip: bool, train: bool):
    """2-class 'which half is real' CE / log2 (reference :304-324)."""
    frames_recon = jnp.concatenate([frames, recon], axis=-1)
    recon_frames = jnp.concatenate([recon, frames], axis=-1)
    if flip:  # generator loss: wants D to misclassify
        inputs = jnp.concatenate([frames_recon, recon_frames], axis=0)
    else:     # discriminator loss: detached inputs
        inputs = jax.lax.stop_gradient(
            jnp.concatenate([recon_frames, frames_recon], axis=0))
    logits, mutated = model.apply(variables, inputs, train,
                                  mutable=["batch_stats"] if train else [])
    n = frames.shape[0]
    targets = jnp.concatenate([jnp.zeros((n,), jnp.int32),
                               jnp.ones((n,), jnp.int32)])
    targets = jnp.broadcast_to(targets[:, None, None, None],
                               logits.shape[:-1])
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return jnp.mean(ce) / math.log(2), mutated


def vae_adversarial_loss(model, variables, frames, recon, train=True):
    return _cross_entropy(model, variables, frames, recon, flip=True, train=train)


def discriminator_loss(model, variables, frames, recon, train=True):
    return _cross_entropy(model, variables, frames, recon, flip=False, train=train)
