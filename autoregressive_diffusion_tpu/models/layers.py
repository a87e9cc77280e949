"""Core magnitude-preserving layers (Flax linen, channels-last).

Reimplementation of /root/reference/edm2/conv.py (MPConv,
MPCausal3DGatedConv, Gating) with a pure-functional cache protocol:

  y, new_cache = layer(x, ..., cache=cache, update_cache=..., mode=...)

Modes are *static* Python values ('train' | 'eval'); caches are pytrees of
fixed-shape arrays so every path is jittable. Video tensors are
(B, T, H, W, C); there is no (b t) flattening at module boundaries.

Forced weight normalization (reference conv.py:15-19 mutates the parameter in
forward) is moved to the optimizer step -- see train/optim.py
`forced_weight_norm`. Forwards always use normalize(w) so gradients match.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.numerics import mp_weight, mp_sum, bmult

# Parameter init: the reference uses torch.randn (std 1); the forced weight
# normalization makes the scale irrelevant after the first optimizer step.
_randn = nn.initializers.normal(stddev=1.0)


def mp_sum_gated(a: jax.Array, b: jax.Array, gate: jax.Array) -> jax.Array:
    """mp_sum with a per-(batch, frame) gate.

    a, b: (B, T, H, W, C); gate: (B, T). Matches reference conv.py:95
    `mp_sum(last_frame_conv, context, gating.flatten())` which gates per
    flattened (b t) row.
    """
    g = gate.astype(a.dtype)[:, :, None, None, None]
    lerp = a + (b - a) * g
    return lerp * ((1 - g) ** 2 + g**2) ** -0.5


class MPConv(nn.Module):
    """Magnitude-preserving dense (kernel=()) or 2D conv (kernel=(kh,kw)).

    Reference: edm2/conv.py:27-46. Input layout: (..., C_in) for dense,
    (..., H, W, C_in) for conv (leading dims collapsed to batch).

    quant=True is the DECODE-ONLY int8 weight path: the normalized weight
    (normalize(w)/sqrt(fan_in), which forced weight normalization keeps
    constant between optimizer steps) is prebaked, quantized per OUTPUT
    channel to int8, and dequantized in-register at use. Batch-1
    autoregressive decode is weight-read-bound on HBM; int8 reads cut the
    weight bytes 4x vs fp32 (2x vs bf16) and skip the per-call
    renormalization. Build such params with train/quantize.quantize_variables.
    """
    out_channels: int
    kernel: Tuple[int, ...] = ()
    quant: bool = False

    def _weight(self, shape, gain, dtype):
        if self.quant:
            w_q = self.param("w_q", lambda k: jnp.zeros(shape, jnp.int8))
            scale = self.param(
                "w_scale", lambda k: jnp.ones((self.out_channels,), jnp.float32))
            w = w_q.astype(jnp.float32) * scale  # broadcast over out axis
            return (w * gain).astype(dtype)
        w = self.param("w", _randn, shape)
        return mp_weight(w, gain).astype(dtype)

    @nn.compact
    def __call__(self, x: jax.Array, gain=1.0,
                 return_weight: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        if len(self.kernel) == 0:
            w = self._weight((in_ch, self.out_channels), gain, x.dtype)
            if return_weight:
                return w
            return x @ w
        kh, kw = self.kernel
        w = self._weight((kh, kw, in_ch, self.out_channels), gain, x.dtype)
        if return_weight:
            return w
        if kh == kw == 1:
            # Pointwise conv == matmul over the channel axis. Lowering it as
            # a real convolution forces XLA's TPU conv emitter layout
            # (batch-minor) and a relayout copy on both sides; the matmul
            # stays in the producer/consumer elementwise layout and fuses
            # (~23% of step time was such copies before this).
            return jnp.einsum("...c,cd->...d", x, w[0, 0])
        lead = x.shape[:-3]
        x4 = x.reshape((-1,) + x.shape[-3:])
        y = jax.lax.conv_general_dilated(
            x4, w, window_strides=(1, 1),
            padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.reshape(lead + y.shape[1:])


class Gating(nn.Module):
    """Noise/position-conditioned gate between the 2D and 3D-context conv
    branches. Reference: edm2/conv.py:104-127.

    gate = mn + (1-mn)*mx*sigmoid(1.5*c_noise - 0.5*log1p(position) + offsets)
    with mn = sigmoid(min_gating), mx = sigmoid(max_gating) (both init -5).
    """

    @nn.compact
    def __call__(self, c_noise: jax.Array, n_context_frames=0,
                 just_2d: bool = False, train: bool = False):
        offset = self.param("offset", nn.initializers.zeros, (2,))
        mult = self.param("mult", lambda k: jnp.array([1.5, -0.5], jnp.float32))
        max_g = self.param("max_gating", lambda k: jnp.float32(-5.0))
        min_g = self.param("min_gating", lambda k: jnp.float32(-5.0))

        b, t_total = c_noise.shape
        t_dim = t_total // 2 if train else t_total
        if just_2d:
            positions = jnp.zeros_like(c_noise)
        else:
            pos = jnp.arange(b * t_total) % t_dim
            pos = pos.reshape(b, t_total) + n_context_frames
            positions = jnp.log1p(pos.astype(c_noise.dtype))

        state = (c_noise * mult[0] + offset[0]) + (positions * mult[1] + offset[1])
        mn = jax.nn.sigmoid(min_g)
        mx = jax.nn.sigmoid(max_g)
        gate = mn + (1 - mn) * mx * jax.nn.sigmoid(state)
        return gate, n_context_frames + t_dim


class MPCausalConv3d(nn.Module):
    """Magnitude-preserving causal 3D gated conv -- the temporal-mixing
    workhorse. Reference: edm2/conv.py:49-101 (MPCausal3DGatedConv).

    The (kt,kh,kw) conv splits into:
      * a 2D (kh,kw) conv on each frame ("last_frame_conv"),
      * a (kt-1,kh,kw) 3D conv over STRICTLY PAST frames of the clean stream,
    blended by the learned Gating.

    Modes:
      train:  x is the DART concat (B, 2T, H, W, C); only the clean half
              feeds the context conv, the result is duplicated to both halves
              (reference conv.py:76-91).
      eval:   x is (B, T, H, W, C); the cache carries the last kt-1 frames of
              padded activations (ring buffer, init ones -- conv.py:68).
    """
    out_channels: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    quant: bool = False  # decode-only int8 weights (see MPConv.quant)

    @nn.compact
    def __call__(self, x: jax.Array, c_noise: jax.Array, frames=0,
                 cache=None, update_cache: bool = False,
                 mode: str = "train", just_2d: bool = False,
                 fused: bool = False, silu_in: bool = False, cvec=None,
                 fused_interpret: bool = False, packed_hw=None,
                 out_packed=None, decode_weights: bool = False):
        # out_packed: None = packed iff the input was packed; True/False
        # forces the output representation ((B, T, 2, Co, H*W) kernel layout
        # vs (B, 2T, H, W, Co)). Lets the UNet chain fused modules in packed
        # space across Block boundaries (the pack/unpack relayouts between
        # consecutive fused Blocks were pure HBM waste).
        if packed_hw is not None:
            # x is already in the kernel's packed layout
            # (B, T, 2, C, (H+2)*W) -- see ops/fused_conv.py repad_packed;
            # output stays packed (B, T, 2, Co, H*W).
            h, w = packed_hw
            b, t_half, _, cin, _ = x.shape
            t_total = 2 * t_half
        else:
            b, t_total, h, w, cin = x.shape
        kt, kh, kw = self.kernel
        last_frame_conv = MPConv(self.out_channels, (kh, kw),
                                 quant=self.quant, name="last_frame_conv")

        if decode_weights:
            # Accessor for the fused eval/decode Block kernel
            # (ops/fused_conv.fused_decode_block): return this module's
            # normalized weights + gate so the Block can hand them to one
            # Pallas call. Param creation matches the regular paths exactly
            # (same names/shapes under this module's scope); never taken
            # during init.
            w2n = last_frame_conv(
                jnp.zeros((1, 1, 1, cin), x.dtype), return_weight=True)
            kt_ctx = kt - 1
            if self.quant:
                w3_q = self.param("w_q", lambda k: jnp.zeros(
                    (kt_ctx, kh, kw, cin, self.out_channels), jnp.int8))
                w3_s = self.param("w_scale", lambda k: jnp.ones(
                    (self.out_channels,), jnp.float32))
                w3n = (w3_q.astype(jnp.float32) * w3_s).astype(x.dtype)
            else:
                w3r = self.param("w", _randn,
                                 (kt_ctx, kh, kw, cin, self.out_channels))
                w3n = mp_weight(w3r).astype(x.dtype)
            gate, _ = Gating(name="gating")(
                c_noise, n_context_frames=frames, train=False)
            return (w2n, w3n, gate), cache

        if fused:
            assert not self.quant, "int8 weights are a decode-only path"
            # Pallas fused transform+conv+gate path (train mode only); the
            # XLA path below stays as the reference/eval implementation.
            # ops/fused_conv.py documents the layout rationale.
            from ..ops import fused_conv as fc
            assert mode == "train", "fused path is train-mode only"
            w2n = last_frame_conv(
                x if packed_hw is None else jnp.zeros((1, 1, 1, cin), x.dtype),
                return_weight=True)
            if just_2d:
                # ctx branch disabled: placeholder weight/gates (unread by
                # the kernel, zero gradients). just_2d input is NOT the DART
                # concat (reference loss.py:20-26) but the kernel's (s, t)
                # pairing is a pure relabeling of independent frames.
                w3n = jnp.zeros((kt - 1, kh, kw, cin, self.out_channels),
                                x.dtype)
                gp = jnp.zeros((b, t_total // 2, 2), jnp.float32)
            else:
                kt_ctx = kt - 1
                w3r = self.param(
                    "w", _randn, (kt_ctx, kh, kw, cin, self.out_channels))
                w3n = mp_weight(w3r).astype(x.dtype)
                gate, _ = Gating(name="gating")(
                    c_noise, n_context_frames=frames, train=True)
                t_half = t_total // 2
                gp = gate.reshape(b, 2, t_half).transpose(0, 2, 1)
            xp = x if packed_hw is not None else fc.pack_x(x, h, w)
            cvp = None
            if cvec is not None:
                cv = cvec.astype(x.dtype)
                cvp = cv.reshape(b, 2, t_total // 2, cin).transpose(0, 2, 1, 3)
            out = fc.fused_gated_conv(xp, w2n, w3n, cvp, gp, h, w, silu_in,
                                      not just_2d, fused_interpret)
            if out_packed is None:
                out_packed = packed_hw is not None
            if out_packed:
                return out, cache
            return fc.unpack_out(out, h, w, self.out_channels), cache

        if cvec is not None:
            x = x * cvec[:, :, None, None, :].astype(x.dtype)
        if silu_in:
            x = jax.nn.silu(x) / 0.596
        y2d = last_frame_conv(x)
        if just_2d:
            return y2d, cache

        kt_ctx = kt - 1
        if self.quant:
            w3_q = self.param("w_q", lambda k: jnp.zeros(
                (kt_ctx, kh, kw, cin, self.out_channels), jnp.int8))
            w3_s = self.param("w_scale", lambda k: jnp.ones(
                (self.out_channels,), jnp.float32))
            w3 = (w3_q.astype(jnp.float32) * w3_s).astype(x.dtype)
        else:
            w3 = self.param("w", _randn,
                            (kt_ctx, kh, kw, cin, self.out_channels))
            w3 = mp_weight(w3).astype(x.dtype)

        gate, _ = Gating(name="gating")(
            c_noise, n_context_frames=frames, train=(mode == "train"))

        if mode == "train":
            t = t_total // 2
            clean = x[:, :t]
            pad = jnp.ones((b, kt_ctx, h, w, cin), x.dtype)
            ctx_in = jnp.concatenate([pad, clean], axis=1)
            new_cache = cache
        else:
            if cache is None:
                pad = jnp.ones((b, kt_ctx, h, w, cin), x.dtype)
            else:
                pad = cache["act"].astype(x.dtype)
            ctx_in = jnp.concatenate([pad, x], axis=1)
            new_cache = (
                {"act": jax.lax.stop_gradient(ctx_in[:, -kt_ctx:])}
                if update_cache else cache)

        # conv over strictly past frames: drop the last frame, VALID in time.
        # The (kt_ctx, kh, kw) 3D conv is expressed as ONE 2D conv over the
        # kt_ctx shifted frame windows CONCATENATED on channels, with the
        # kernel stacked on its input-channel axis (the tap sum moves inside
        # the contraction -- same math). Two reasons over a plain 3D conv:
        #   * the 5D-kernel conv partitioner cannot move w3 between the
        #     shardings the jvp/transpose passes want under a
        #     (data, seq, model) mesh and falls back to SPMD involuntary full
        #     rematerialization at every Block; a 4D kernel never does;
        #   * one (kt_ctx*cin)->cout conv is a single dispatch with a 2x
        #     contraction dim -- on the op-count-bound batch-1 decode path a
        #     per-tap conv loop measurably costs throughput, and at small cin
        #     the wider contraction tiles the MXU better.
        x_ctx = ctx_in[:, :-1]
        t_out = x_ctx.shape[1] - kt_ctx + 1
        xs = jnp.concatenate([x_ctx[:, j:j + t_out] for j in range(kt_ctx)],
                             axis=-1)
        wcat = w3.transpose(1, 2, 0, 3, 4).reshape(
            kh, kw, kt_ctx * cin, self.out_channels)
        ctx = jax.lax.conv_general_dilated(
            xs.reshape((-1,) + xs.shape[2:]), wcat, window_strides=(1, 1),
            padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ctx = ctx.reshape((b, t_out) + ctx.shape[1:])

        if mode == "train":
            ctx = jnp.concatenate([ctx, ctx], axis=1)  # duplicate to both halves

        return mp_sum_gated(y2d, ctx, gate), new_cache
