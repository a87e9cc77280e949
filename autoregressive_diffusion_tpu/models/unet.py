"""EDM2 magnitude-preserving UNet denoiser + preconditioner (Flax).

Reimplementation of /root/reference/edm2/networks_edm2.py (Block :19,
UNet :117, Precond :266) with:
  * channels-last video tensors (B, T, H, W, C),
  * a typed pytree cache threaded through calls (no mutable dicts),
  * static `mode` ('train'|'eval') instead of nn.Module.training,
  * bf16 body / fp32 preconditioning on TPU (reference uses fp16/fp32).

Documented divergences from the reference:
  * the dead `emb_fourier_time`/`emb_time` branch (networks_edm2.py:205-210,
    computed but excluded from the sum) is not reproduced;
  * `out_res` gating (networks_edm2.py:197, result unused) is kept only as
    the frame counter bookkeeping it performs.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.fused_conv import decode_fused_supported, fused_supported
from ..ops.numerics import (bmult, mp_cat, mp_fourier, mp_silu, mp_sum,
                            normalize, resample)
from .attention import FrameAttention, VideoAttention
from .layers import MPConv, MPCausalConv3d, Gating


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Knob set of reference UNet.__init__ (networks_edm2.py:118-131)."""
    img_resolution: int
    img_channels: int
    label_dim: int = 0
    model_channels: int = 128
    channel_mult: Tuple[int, ...] = (1, 2, 2, 4)
    channel_mult_noise: Optional[int] = None
    channel_mult_emb: Optional[int] = None
    num_blocks: int = 3
    video_attn_resolutions: Tuple[int, ...] = (8,)
    frame_attn_resolutions: Tuple[int, ...] = (16,)
    label_balance: float = 0.5
    concat_balance: float = 0.5
    channels_per_head: int = 64
    res_balance: float = 0.3
    attn_balance: float = 0.3
    clip_act: float = 256.0
    dropout: float = 0.0
    # KV ring-buffer capacity: rollouts are UNBOUNDED; attention sees a
    # sliding window of the last `max_frames` frames (models/attention.py)
    max_frames: int = 64
    remat: bool = False   # jax.checkpoint each Block (memory for flops)
    # Decode-only int8 weight path (batch-1 rollout is weight-read-bound):
    # build params with train/quantize.quantize_variables, eval mode only.
    decode_quant: bool = False

    @property
    def cblock(self):
        return [self.model_channels * m for m in self.channel_mult]

    @property
    def cnoise(self):
        return (self.model_channels * self.channel_mult_noise
                if self.channel_mult_noise is not None else self.cblock[0])

    @property
    def cemb(self):
        return (self.model_channels * self.channel_mult_emb
                if self.channel_mult_emb is not None else max(self.cblock))

    def block_layout(self):
        """Replays the reference constructor (networks_edm2.py:152-184):
        yields ('enc'|'dec', name, dict(in, out, res, flavor, resample,
        attention, is_conv)). Guarantees the Flax module tree and the cache
        initializer agree."""
        out = []
        cout = self.img_channels + 1
        for level, channels in enumerate(self.cblock):
            res = self.img_resolution >> level
            if level == 0:
                cin, cout = cout, channels
                out.append(("enc", f"{res}x{res}_conv",
                            dict(cin=cin, cout=cout, res=res, kind="conv")))
            else:
                out.append(("enc", f"{res}x{res}_down",
                            dict(cin=cout, cout=cout, res=res, kind="block",
                                 flavor="enc", resample="down", attention=None)))
            for idx in range(self.num_blocks):
                cin, cout = cout, channels
                attn = ("video" if res in self.video_attn_resolutions else
                        "frame" if res in self.frame_attn_resolutions else None)
                out.append(("enc", f"{res}x{res}_block{idx}",
                            dict(cin=cin, cout=cout, res=res, kind="block",
                                 flavor="enc", resample="keep", attention=attn)))
        skips = [spec["cout"] for (_, _, spec) in out]
        for level, channels in reversed(list(enumerate(self.cblock))):
            res = self.img_resolution >> level
            if level == len(self.cblock) - 1:
                out.append(("dec", f"{res}x{res}_in0",
                            dict(cin=cout, cout=cout, res=res, kind="block",
                                 flavor="dec", resample="keep", attention="video")))
                out.append(("dec", f"{res}x{res}_in1",
                            dict(cin=cout, cout=cout, res=res, kind="block",
                                 flavor="dec", resample="keep", attention=None)))
            else:
                out.append(("dec", f"{res}x{res}_up",
                            dict(cin=cout, cout=cout, res=res, kind="block",
                                 flavor="dec", resample="up", attention=None)))
            for idx in range(self.num_blocks + 1):
                cin = cout + skips.pop()
                cout = channels
                attn = ("video" if res in self.video_attn_resolutions else
                        "frame" if res in self.frame_attn_resolutions else None)
                out.append(("dec", f"{res}x{res}_block{idx}",
                            dict(cin=cin, cout=cout, res=res, kind="block",
                                 flavor="dec", resample="keep", attention=attn)))
        out.append(("out", "out_conv",
                    dict(cin=cout, cout=self.img_channels, res=self.img_resolution,
                         kind="conv")))
        return out


class MPFourier(nn.Module):
    """Random Fourier features with fixed (buffer) freqs/phases.
    Reference: edm2/utils.py:139-150."""
    num_channels: int
    bandwidth: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def init_freqs():
            k = self.make_rng("params")
            return 2 * jnp.pi * jax.random.normal(k, (self.num_channels,)) * self.bandwidth

        def init_phases():
            k = self.make_rng("params")
            return 2 * jnp.pi * jax.random.uniform(k, (self.num_channels,))

        freqs = self.variable("buffers", "freqs", init_freqs).value
        phases = self.variable("buffers", "phases", init_phases).value
        return mp_fourier(x, freqs, phases)


class Block(nn.Module):
    """UNet residual block (reference networks_edm2.py:19-94).

    packed_in/packed_out (static module attrs, set by the UNet's chain
    planner): the Block takes/returns activations in the fused kernel's
    packed interchange layout (B, T, 2, C, H*W) instead of (B, 2T, H, W, C),
    so consecutive fused Blocks -- including skip tensors across the
    enc/dec boundary -- never pay the pack/unpack relayouts between them.
    packed_hw carries the true (H, W) when the shape no longer does.
    """
    out_channels: int
    flavor: str = "enc"
    resample_mode: str = "keep"
    attention: Optional[str] = None  # 'video' | 'frame' | None
    channels_per_head: int = 64
    dropout: float = 0.0
    res_balance: float = 0.3
    attn_balance: float = 0.3
    clip_act: Optional[float] = 256.0
    max_frames: int = 64
    quant: bool = False
    packed_in: bool = False
    packed_out: bool = False
    packed_hw: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array, c_noise: jax.Array,
                 frames=0, cache=None, update_cache: bool = False,
                 mode: str = "train", just_2d: bool = False):
        if cache is None:
            cache = {}
        if self.packed_in:
            assert self.resample_mode == "keep" and self.packed_hw
            in_channels = x.shape[3]
            h_, w_ = self.packed_hw
            t_frames = 2 * x.shape[1]
        else:
            in_channels = x.shape[-1]
            x = resample(x, f=(1, 1), mode=self.resample_mode)
            h_, w_ = x.shape[2:4]
            t_frames = x.shape[1]
        num_heads = (self.out_channels // self.channels_per_head
                     if self.attention else 0)

        # On TPU in train mode the conv + its preceding elementwise transform
        # (mp_silu, noise-embedding modulation) run as one fused Pallas
        # kernel (ops/fused_conv.py); the unfused path is the reference.
        # Attention-free Blocks (the hot high resolutions by construction:
        # attention only runs at 8/16) additionally execute the skip conv,
        # pixel norm, residual mp_sum and clip in the kernel's packed layout,
        # so the whole Block touches HBM in dense tiles.
        use_fused, fi = fused_supported(mode, h_, w_, t_frames,
                                        cin=max(in_channels,
                                                self.out_channels),
                                        cout=self.out_channels)
        # The fused branch chains convs in the kernel's PACKED layout
        # (channels zero-padded to a multiple of 8). Conv params are sized
        # from the packed tensor, and the second conv asserts its input
        # channel count is already a padded multiple -- so the fused path is
        # only taken when no padding would occur; otherwise train-mode params
        # would be shape-incompatible with eval-mode params, and e.g.
        # out_channels=12 would trip fused_conv._prep. The unfused path is
        # always valid.
        packed_ok = in_channels % 8 == 0 and self.out_channels % 8 == 0
        # Dropout sits between the fused transform and conv_res1 (reference
        # networks_edm2.py:78-79) and cannot be folded into the kernel's
        # read; train with dropout runs the unfused path.
        use_dropout = self.dropout > 0.0 and mode == "train"
        emb_gain = self.param("emb_gain", nn.initializers.zeros, ())
        c = MPConv(self.out_channels, (), quant=self.quant,
                   name="emb_linear")(emb, gain=emb_gain) + 1
        af_fused = (use_fused and self.attention is None and packed_ok
                    and not use_dropout)
        if self.packed_in or self.packed_out:
            # the UNet's chain planner mirrors this Block's gating; a
            # mismatch would silently return the wrong layout
            assert af_fused, (self.name, use_fused, packed_ok, use_dropout)
        if af_fused:
            from ..ops import fused_conv as fc
            xhw = x if self.packed_in else fc.pack_hw(x, h_, w_)
            if self.flavor == "enc":
                if in_channels != self.out_channels:
                    wsk = MPConv(self.out_channels, (1, 1),
                                 name="conv_skip")(
                        jnp.zeros((1, 1, 1, in_channels), xhw.dtype),
                        return_weight=True)
                    xhw = jnp.einsum("btscy,cd->btsdy", xhw,
                                     wsk[0, 0].astype(xhw.dtype))
                # pixel norm over channels; H-pad rows don't exist in the
                # HW interchange layout and normalize is zero-safe anyway
                xhw = normalize(xhw, axis=3)
            yp, c0 = MPCausalConv3d(self.out_channels, (3, 3, 3),
                                    name="conv_res0")(
                fc.repad_packed(xhw, h_, w_), c_noise, frames,
                cache.get("conv_res0"), update_cache,
                mode, just_2d, fused=True, silu_in=True, fused_interpret=fi,
                packed_hw=(h_, w_))
            yp, c1 = MPCausalConv3d(self.out_channels, (3, 3, 3),
                                    name="conv_res1")(
                fc.repad_packed(yp, h_, w_), c_noise, frames,
                cache.get("conv_res1"), update_cache, mode, just_2d,
                fused=True, silu_in=True, cvec=c, fused_interpret=fi,
                packed_hw=(h_, w_))
            xr = xhw
            if self.flavor == "dec" and in_channels != self.out_channels:
                wsk = MPConv(self.out_channels, (1, 1), name="conv_skip")(
                    jnp.zeros((1, 1, 1, in_channels), xhw.dtype),
                    return_weight=True)
                xr = jnp.einsum("btscy,cd->btsdy", xhw,
                                wsk[0, 0].astype(xhw.dtype))
            xo = mp_sum(xr, yp, t=self.res_balance)
            if self.clip_act is not None:
                xo = jnp.clip(xo, -self.clip_act, self.clip_act)
            new_cache = dict(conv_res0=c0, conv_res1=c1)
            if self.packed_out:
                return xo, new_cache
            return fc.unpack_out(xo, h_, w_, self.out_channels), new_cache

        # Fused eval/decode Block (T=1 cached step): the batch-1
        # autoregressive rollout is kernel-launch-bound, so the whole
        # attention-free Block -- skip conv, pixel norm, silu, both gated
        # causal convs reading the 2-frame activation rings, modulation,
        # residual and clip -- runs as ONE Pallas call
        # (ops/fused_conv.fused_decode_block).
        dec_ok, dec_fi = decode_fused_supported(mode, h_, w_, t_frames)
        cache0, cache1 = cache.get("conv_res0"), cache.get("conv_res1")
        if (dec_ok and self.attention is None and packed_ok
                and (just_2d or (cache0 is not None and cache1 is not None))):
            from ..ops import fused_conv as fc
            conv0 = MPCausalConv3d(self.out_channels, (3, 3, 3),
                                   quant=self.quant, name="conv_res0")
            conv1 = MPCausalConv3d(self.out_channels, (3, 3, 3),
                                   quant=self.quant, name="conv_res1")
            c0_in = (self.out_channels if self.flavor == "enc"
                     else in_channels)
            (w20, w30, g0), _ = conv0(
                jnp.zeros((1, 1, 1, 1, c0_in), x.dtype), c_noise, frames,
                mode=mode, decode_weights=True)
            (w21, w31, g1), _ = conv1(
                jnp.zeros((1, 1, 1, 1, self.out_channels), x.dtype),
                c_noise, frames, mode=mode, decode_weights=True)
            wsk = None
            if in_channels != self.out_channels:
                wsk = MPConv(self.out_channels, (1, 1), quant=self.quant,
                             name="conv_skip")(
                    jnp.zeros((1, 1, 1, in_channels), x.dtype),
                    return_weight=True)[0, 0]
            if just_2d:
                ones = jnp.ones((x.shape[0], 2, h_, w_, c0_in), x.dtype)
                a0 = ones
                a1 = jnp.ones((x.shape[0], 2, h_, w_, self.out_channels),
                              x.dtype)
            else:
                a0, a1 = cache0["act"], cache1["act"]
            gates = jnp.stack([g0[:, 0], g1[:, 0]], axis=1)
            y, t0, t1 = fc.fused_decode_block(
                x, a0, a1, wsk, w20, w30, w21, w31, c[:, 0], gates,
                h_, w_, self.flavor, self.res_balance,
                self.clip_act, not just_2d, dec_fi)
            if update_cache and not just_2d:
                nc0 = {"act": jax.lax.stop_gradient(
                    jnp.concatenate([a0[:, 1:], t0], axis=1))}
                nc1 = {"act": jax.lax.stop_gradient(
                    jnp.concatenate([a1[:, 1:], t1], axis=1))}
            else:
                nc0, nc1 = cache0, cache1
            new_cache = dict(conv_res0=nc0, conv_res1=nc1)
            return y, new_cache

        if self.flavor == "enc":
            if in_channels != self.out_channels:
                x = MPConv(self.out_channels, (1, 1), quant=self.quant,
                           name="conv_skip")(x)
            x = normalize(x, axis=-1)  # pixel norm

        if use_fused and packed_ok and not use_dropout:
            from ..ops import fused_conv as fc
            h_, w_ = x.shape[2:4]
            yp, c0 = MPCausalConv3d(self.out_channels, (3, 3, 3),
                                    name="conv_res0")(
                fc.pack_x(x, h_, w_), c_noise, frames,
                cache.get("conv_res0"), update_cache, mode, just_2d,
                fused=True, silu_in=True, fused_interpret=fi,
                packed_hw=(h_, w_))
            yp, c1 = MPCausalConv3d(self.out_channels, (3, 3, 3),
                                    name="conv_res1")(
                fc.repad_packed(yp, h_, w_), c_noise, frames,
                cache.get("conv_res1"), update_cache, mode, just_2d,
                fused=True, silu_in=True, cvec=c, fused_interpret=fi,
                packed_hw=(h_, w_))
            y = fc.unpack_out(yp, h_, w_, self.out_channels)
        else:
            y, c0 = MPCausalConv3d(self.out_channels, (3, 3, 3), quant=self.quant,
                                   name="conv_res0")(
                mp_silu(x), c_noise, frames, cache.get("conv_res0"), update_cache,
                mode, just_2d)
            y = y * c[:, :, None, None, :].astype(y.dtype)
            y = mp_silu(y)
            if use_dropout:
                # reference networks_edm2.py:78-79 (train-mode only)
                y = nn.Dropout(rate=self.dropout, deterministic=False)(y)
            y, c1 = MPCausalConv3d(self.out_channels, (3, 3, 3), quant=self.quant,
                                   name="conv_res1")(
                y, c_noise, frames, cache.get("conv_res1"), update_cache, mode, just_2d)

        if self.flavor == "dec" and in_channels != self.out_channels:
            x = MPConv(self.out_channels, (1, 1), quant=self.quant,
                           name="conv_skip")(x)
        x = mp_sum(x, y, t=self.res_balance)

        attn_cache = cache.get("attn")
        if self.attention == "video":
            x, attn_cache = VideoAttention(
                self.out_channels, num_heads, self.attn_balance,
                max_frames=self.max_frames, quant=self.quant, name="attn")(
                    x, attn_cache, update_cache, frames, mode, just_2d)
        elif self.attention == "frame":
            x, attn_cache = FrameAttention(
                self.out_channels, num_heads, self.attn_balance,
                quant=self.quant, name="attn")(
                    x, attn_cache, update_cache, frames, mode, just_2d)

        if self.clip_act is not None:
            x = jnp.clip(x, -self.clip_act, self.clip_act)

        new_cache = dict(conv_res0=c0, conv_res1=c1)
        if attn_cache is not None:
            new_cache["attn"] = attn_cache
        return x, new_cache


class UNet(nn.Module):
    """Full encoder/decoder (reference networks_edm2.py:117-236)."""
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x: jax.Array, c_noise: jax.Array, conditioning=None,
                 cache=None, update_cache: bool = False, mode: str = "train",
                 just_2d: bool = False, prefill_offset=None):
        cfg = self.cfg
        if cache is None:
            cache = {}
        b, t = x.shape[:2]
        frames = cache.get("frames", jnp.int32(0))
        if prefill_offset is not None:
            # STATIC frame offset hint (jit-static kwarg): asserts the
            # cache's frame counter and lets warm-cache prefill take the
            # splash kernel (models/attention.py). One compile per offset
            # bucket, like length bucketing.
            frames = int(prefill_offset)

        out_gain = self.param("out_gain", nn.initializers.zeros, ())
        # out_res gating: result unused (reference :197, :235 commented out);
        # kept for the frame counter + parameter parity.
        _, new_frames = Gating(name="out_res")(
            c_noise, frames, just_2d=just_2d, train=(mode == "train"))

        # Embeddings (per-frame).
        emb = MPConv(cfg.cemb, (), quant=cfg.decode_quant,
                     name="emb_noise")(
            MPFourier(cfg.cnoise, name="emb_fourier_sigma")(c_noise))
        if cfg.label_dim != 0 and conditioning is not None:
            one_hot = jax.nn.one_hot(conditioning, cfg.label_dim,
                                     dtype=c_noise.dtype)
            one_hot = one_hot * math.sqrt(cfg.label_dim)
            lab = MPConv(cfg.cemb, (), quant=cfg.decode_quant,
                         name="emb_label")(one_hot)
            emb = mp_sum(emb, lab, t=1 / 3)
        emb = mp_silu(emb)

        # Encoder: append the ones channel (reference :221).
        x = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
        new_cache = {"frames": jnp.asarray(
            new_frames if update_cache else frames, jnp.int32)}
        skips = []
        blocks = {}
        for side, name, spec in cfg.block_layout():
            blocks.setdefault(side, []).append((name, spec))

        # Optional per-Block rematerialization: activations inside a Block
        # are recomputed in the backward pass. update_cache/mode/just_2d are
        # static call args; in flax's lifted remat the module itself is
        # argument 0, so they sit at positions 6, 7, 8.
        BlockMod = (nn.remat(Block, static_argnums=(6, 7, 8))
                    if cfg.remat else Block)

        # --- packed-chain planner (all static): consecutive fused
        # attention-free modules at the same resolution exchange activations
        # in the kernel's packed (B, T, 2, C, H*W) layout -- including skip
        # tensors across the enc/dec boundary -- instead of paying the
        # pack/unpack relayouts at every Block edge. `packed` tracks the
        # current representation of x: None = (B, 2T, H, W, C), else (h, w).
        from ..ops import fused_conv as fc
        t_frames = x.shape[1]

        def af_fused(spec, cin):
            """Will Block(spec) take the packed fused attention-free branch?
            Mirrors the gating inside Block.__call__ exactly."""
            if spec["kind"] != "block" or spec["attention"] is not None:
                return False
            cout = spec["cout"]
            if cin % 8 or cout % 8:
                return False
            if cfg.dropout > 0.0 and mode == "train":
                return False
            r = spec["res"]
            return fused_supported(mode, r, r, t_frames,
                                   cin=max(cin, cout), cout=cout)[0]

        def accepts_packed(spec):
            return (spec is not None and af_fused(spec, spec["cin"])
                    and spec["resample"] == "keep")

        def unpack(v, meta, channels):
            return fc.unpack_out(v, meta[0], meta[1], channels)

        packed = None  # None or (h, w)
        enc_cache, dec_cache = {}, {}
        enc_list, dec_list = blocks["enc"], blocks["dec"]
        for i, (name, spec) in enumerate(enc_list):
            sub = cache.get("enc", {}).get(name)
            res = spec["res"]
            nxt = (enc_list[i + 1][1] if i + 1 < len(enc_list)
                   else dec_list[0][1])
            nxt_in_chain = (nxt["res"] == res and accepts_packed(nxt))
            if spec["kind"] == "conv":
                uf, fi = fused_supported(mode, res, res, t_frames,
                                         cin=x.shape[-1], cout=spec["cout"])
                emit = uf and nxt_in_chain and spec["cout"] % 8 == 0
                x, c = MPCausalConv3d(spec["cout"], (3, 3, 3),
                                      quant=cfg.decode_quant,
                                      name=f"enc_{name}")(
                    x, c_noise, frames, sub, update_cache, mode, just_2d,
                    fused=uf, fused_interpret=fi,
                    out_packed=True if emit else None)
                packed = (res, res) if emit else None
            else:
                this_af = af_fused(spec, spec["cin"])
                p_in = (packed == (res, res) and this_af
                        and spec["resample"] == "keep")
                if packed is not None and not p_in:
                    x = unpack(x, packed, spec["cin"])
                    packed = None
                x, c = BlockMod(spec["cout"], flavor="enc",
                             resample_mode=spec["resample"],
                             attention=spec["attention"],
                             channels_per_head=cfg.channels_per_head,
                             dropout=cfg.dropout, res_balance=cfg.res_balance,
                             attn_balance=cfg.attn_balance,
                             clip_act=cfg.clip_act, max_frames=cfg.max_frames,
                             quant=cfg.decode_quant,
                             packed_in=p_in, packed_out=this_af,
                             packed_hw=(res, res) if this_af else None,
                             name=f"enc_{name}")(
                    x, emb, c_noise, frames, sub, update_cache, mode, just_2d)
                packed = (res, res) if this_af else None
            enc_cache[name] = c
            # the skip keeps x's current representation; the dec consumer
            # unpacks lazily if its own chain is broken there
            skips.append((x, packed, spec["cout"]))
            if packed is not None and not nxt_in_chain:
                # next module needs the spatial layout (resample/attention/
                # unfused); the skip above stays packed for the dec side
                x = unpack(x, packed, spec["cout"])
                packed = None

        for i, (name, spec) in enumerate(dec_list):
            res = spec["res"]
            this_af = af_fused(spec, spec["cin"])
            p_in = (this_af and spec["resample"] == "keep")
            if "block" in name:
                skip, skip_meta, skip_ch = skips.pop()
                if p_in and packed == (res, res) and skip_meta == (res, res):
                    x = mp_cat(x, skip, axis=3, t=cfg.concat_balance)
                else:
                    if packed is not None:
                        x = unpack(x, packed, x.shape[3])
                        packed = None
                    if skip_meta is not None:
                        skip = unpack(skip, skip_meta, skip_ch)
                    x = mp_cat(x, skip, t=cfg.concat_balance)
                    p_in = False
            else:
                if packed is not None and not (p_in and packed == (res, res)):
                    x = unpack(x, packed, x.shape[3])
                    packed = None
                p_in = p_in and packed == (res, res)
            sub = cache.get("dec", {}).get(name)
            x, c = BlockMod(spec["cout"], flavor="dec",
                         resample_mode=spec["resample"],
                         attention=spec["attention"],
                         channels_per_head=cfg.channels_per_head,
                         dropout=cfg.dropout, res_balance=cfg.res_balance,
                         attn_balance=cfg.attn_balance,
                         clip_act=cfg.clip_act, max_frames=cfg.max_frames,
                         quant=cfg.decode_quant,
                         packed_in=p_in, packed_out=this_af,
                         packed_hw=(res, res) if this_af else None,
                         name=f"dec_{name}")(
                x, emb, c_noise, frames, sub, update_cache, mode, just_2d)
            packed = (res, res) if this_af else None
            dec_cache[name] = c

        res = cfg.img_resolution
        uf, fi = fused_supported(mode, res, res, t_frames,
                                 cin=(x.shape[3] if packed else x.shape[-1]),
                                 cout=cfg.img_channels)
        if packed is not None and not uf:
            x = unpack(x, packed, x.shape[3])
            packed = None
        if packed is not None:
            x = fc.repad_packed(x, res, res)
        x, out_c = MPCausalConv3d(cfg.img_channels, (3, 3, 3),
                              quant=cfg.decode_quant, name="out_conv")(
            x, c_noise, frames, cache.get("out_conv"), update_cache, mode,
            just_2d, fused=uf, fused_interpret=fi,
            packed_hw=(res, res) if packed else None, out_packed=False)
        x = x * out_gain

        new_cache.update(enc=enc_cache, dec=dec_cache, out_conv=out_c)
        return x, new_cache


class Precond(nn.Module):
    """EDM preconditioner (reference networks_edm2.py:266-297).

    c_skip = sd^2/(s^2+sd^2); c_out = s*sd/sqrt(s^2+sd^2);
    c_in = 1/sqrt(sd^2+s^2); c_noise = log(s)/4. Body runs in `body_dtype`
    (bf16 on TPU), preconditioning stays fp32.
    """
    cfg: UNetConfig
    sigma_data: float = 0.5
    body_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, sigma: jax.Array, conditioning=None,
                 cache=None, update_cache: bool = False, mode: str = "train",
                 just_2d: bool = False, prefill_offset=None):
        x = x.astype(jnp.float32)
        sigma = sigma.astype(jnp.float32)
        s = sigma[:, :, None, None, None]
        sd = self.sigma_data
        c_skip = sd**2 / (s**2 + sd**2)
        c_out = s * sd / jnp.sqrt(s**2 + sd**2)
        c_in = 1 / jnp.sqrt(sd**2 + s**2)
        c_noise = jnp.log(sigma) / 4

        x_in = (c_in * x).astype(self.body_dtype)
        f_x, cache = UNet(self.cfg, name="unet")(
            x_in, c_noise, conditioning, cache, update_cache, mode, just_2d,
            prefill_offset)
        return c_skip * x + c_out * f_x.astype(jnp.float32), cache
