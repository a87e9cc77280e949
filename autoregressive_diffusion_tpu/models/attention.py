"""Video / frame self-attention with a fixed-shape per-frame KV cache.

Reimplementation of /root/reference/edm2/attention/attention_modules.py.

Key TPU redesign vs the reference:
  * The reference grows its KV cache by torch.cat each frame
    (attention_modules.py:56). JAX needs static shapes, so the cache is a
    PREALLOCATED RING buffer of `max_frames` slots: frame p is written to
    slot p % max_frames, overwriting the oldest frame once capacity is
    reached -- a sliding attention window that makes rollouts genuinely
    unbounded (the TPU-native answer to the reference's grow-forever cache).
    Each slot's absolute position is derived from the global frame counter
    (ring_slot_positions); unwritten slots are masked out.
  * K/V are cached UN-rotated (like the reference) and RoPE is re-applied
    with absolute frame positions on every call, so positions stay exact for
    arbitrarily long rollouts. The xPos pivot is re-centred at the current
    frame counter so its scale tables stay bounded at any rollout length
    (the pivot cancels exactly in q.k^T -- see ops/rope.py).
  * Execution paths (reference :63-75):
      train  -> DART block-sparse mask over the 2T-frame concat
      eval   -> block-causal prefill / single-frame decode vs the cache
      just_2d-> per-frame attention, no mask/cache/RoPE.
"""
from __future__ import annotations

from typing import Optional

import einops
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import dense_attention
from ..ops.flash_attention import (causal_frame_attention, dart_attention,
                                   dart_attention_sp, flash_supported,
                                   full_attention, full_flash_supported,
                                   prefill_cache_attention,
                                   sp_flash_supported)
from ..ops.numerics import mp_sum, normalize
from ..ops.masks import train_frame_mask, expand_to_tokens
from ..ops.rope import apply_rope, rope_qk, rope_tables
from .layers import MPConv


def _quant_kv(x: jax.Array) -> jax.Array:
    """Unit-norm rows (post pixel-norm K/V) -> int8 at a fixed 127 scale.
    No per-channel scales needed: normalize() bounds every component to
    [-1, 1], so symmetric int8 costs <0.4% RMS per component."""
    return jnp.clip(jnp.rint(x * 127.0), -127, 127).astype(jnp.int8)


def _dequant_kv(buf: jax.Array, dtype) -> jax.Array:
    if buf.dtype == jnp.int8:
        return buf.astype(dtype) * jnp.asarray(1.0 / 127.0, dtype)
    return buf.astype(dtype)


def _to_cache_dtype(x: jax.Array, buf: jax.Array) -> jax.Array:
    return _quant_kv(x) if buf.dtype == jnp.int8 else x.astype(buf.dtype)


def ring_slot_positions(frames, capacity: int) -> jax.Array:
    """Absolute frame position held by ring slot i after `frames` frames
    have been written: the largest p < frames with p % capacity == i.
    Negative -> the slot was never written (mask it out)."""
    i = jnp.arange(capacity)
    return i + capacity * ((frames - 1 - i) // capacity)


def decode_tables(kbuf: jax.Array, vbuf: jax.Array, new_frames,
                  dtype) -> dict:
    """Precompute the decode-attention view of the KV ring: dequantized,
    RoPE-rotated (absolute slot positions, xPos pivot at `new_frames`),
    token-flattened keys/values plus an additive validity bias.

    Computed ONCE per cache update (per frame) and stored in the cache, so
    the 2-NFE-per-step diffusion scan reads finished tables instead of
    re-deriving them. Round 3 relied on XLA loop-invariant code motion for
    this hoist; the ring cache's dynamic slot positions broke the pattern
    (the compiled sampler re-dequantized + re-roped the full buffer and
    re-applied the validity select EVERY denoiser call -- 15.4 -> 13.6
    frames/s measured), so the hoist is now structural.

    Memory cost: kr/vr duplicate the ring in the compute dtype (bf16), so
    with int8 k/v buffers the per-layer attention-cache footprint is
    1 (int8 k/v) + 4 (bf16 kr/vr) bytes/elem -- a deliberate HBM-for-speed
    trade on the batch-1 rollout path."""
    b, m, f, hw, c = kbuf.shape
    slot_pos = ring_slot_positions(new_frames, f)
    kc = _dequant_kv(kbuf, dtype)
    vc = _dequant_kv(vbuf, dtype)
    cos_k, sin_k, scale_k = rope_tables(c, slot_pos, new_frames)
    kc = apply_rope(kc, cos_k, sin_k, 1.0 / scale_k)
    bias = jnp.where(slot_pos >= 0, 0.0, -jnp.inf).astype(jnp.float32)
    return {"kr": kc.reshape(b, m, f * hw, c),
            "vr": vc.reshape(b, m, f * hw, c),
            "bias": jnp.broadcast_to(bias[:, None], (f, hw)).reshape(f * hw)}


def ring_write(buf: jax.Array, new: jax.Array, frames) -> jax.Array:
    """Write `new` (t frames, axis 2) into the ring buffer at slots
    (frames + j) % capacity. t == 1 (decode) is a cheap dynamic slice; the
    general case is a scatter over the frame axis (slots are distinct after
    keeping only the last `capacity` frames)."""
    capacity, t = buf.shape[2], new.shape[2]
    if t == 1:
        return jax.lax.dynamic_update_slice_in_dim(
            buf, new, jnp.asarray(frames) % capacity, axis=2)
    t0 = max(0, t - capacity)
    slots = (jnp.asarray(frames) + jnp.arange(t0, t)) % capacity
    return buf.at[:, :, slots].set(new[:, :, t0:])


class VideoAttention(nn.Module):
    """Block-sparse spatiotemporal self-attention (reference :15-88)."""
    channels: int
    num_heads: int
    attn_balance: float = 0.3
    max_frames: int = 64  # KV ring capacity = sliding attention window
    quant: bool = False   # decode-only int8 weights (layers.MPConv.quant)

    @nn.compact
    def __call__(self, x: jax.Array, cache=None, update_cache: bool = False,
                 frames=0, mode: str = "train", just_2d: bool = False):
        if self.num_heads == 0:
            return x, cache
        b, t, h, w = x.shape[:4]
        hw = h * w
        y = MPConv(self.channels * 3, (1, 1), quant=self.quant,
                   name="attn_qkv")(x)
        # qkv channel layout: (s m c) -- s outermost so the q/k/v split is a
        # contiguous slice (8% step win on TPU vs the reference's (m c s),
        # attention_modules.py:48; utils/import_2d.py permutes imported
        # checkpoints between the two conventions)
        y = einops.rearrange(y, "b t h w (s m c) -> s b m t (h w) c",
                             s=3, m=self.num_heads)
        q, k, v = normalize(y, axis=-1)  # per-head pixel norm (reference :49)

        if just_2d:
            # per-frame attention; (b, m, t) are batch dims
            if full_flash_supported(hw, q.shape[-1]) and b * t >= 16:
                qf, kf, vf = (einops.rearrange(a, "b m t y c -> (b t) m y c")
                              for a in (q, k, v))
                o = einops.rearrange(full_attention(qf, kf, vf),
                                     "(b t) m y c -> b m t y c", t=t)
            else:
                o = dense_attention(q, k, v)
        elif mode == "train":
            t_half = t // 2
            pos = jnp.arange(t_half)
            # clean/noisy replicas share positions (reference RoPe.py:47-49)
            qs = q.reshape(b, self.num_heads, 2, t_half, hw, -1)
            ks = k.reshape(b, self.num_heads, 2, t_half, hw, -1)
            qs, ks = rope_qk(qs, ks, pos, pos, center=t_half // 2)
            q = qs.reshape(b, self.num_heads, t * hw, -1)
            k = ks.reshape(b, self.num_heads, t * hw, -1)
            vv = v.reshape(b, self.num_heads, t * hw, -1)
            sp_ok, sp_mesh, sp_seq, sp_heads, sp_interp = sp_flash_supported(
                t * hw, self.num_heads)
            if sp_ok:
                # sequence-parallel splash kernel (shard_map): Q rows and
                # mask metadata stay sharded over the mesh 'seq' axis, only
                # K/V are all-gathered over ICI (parallel.set_sp_context)
                o = dart_attention_sp(q, k, vv, t_half, hw, sp_mesh,
                                      seq_axis=sp_seq, head_axis=sp_heads,
                                      interpret=sp_interp)
            elif flash_supported(t * hw, q.shape[-1]):
                # Pallas block-sparse DART flash kernel (fwd+bwd)
                o = dart_attention(q, k, vv, t_half, hw)
            else:
                mask = jnp.asarray(expand_to_tokens(train_frame_mask(t_half), hw))
                o = dense_attention(q, k, vv, mask)
            o = o.reshape(b, self.num_heads, t, hw, -1)
        else:
            o = self._eval_attention(q, k, v, cache, frames, b, t, hw)
            if update_cache and cache is not None:
                kbuf = ring_write(cache["k"], _to_cache_dtype(k, cache["k"]),
                                  frames)
                vbuf = ring_write(cache["v"], _to_cache_dtype(v, cache["v"]),
                                  frames)
                cache = {"k": kbuf, "v": vbuf,
                         **decode_tables(kbuf, vbuf, frames + t, k.dtype)}
            elif update_cache and cache is None:
                # create a fresh preallocated ring buffer holding the new
                # frames; int8 KV under decode quantization (K/V are
                # pixel-normed, so a fixed scale suffices). NOTE: since the
                # decode fast path reads the precomputed bf16 kr/vr tables
                # (decode_tables), int8 now mainly shrinks the k/v ring
                # buffers themselves; the per-layer attention-cache HBM
                # footprint is k/v (int8) + kr/vr (bf16), measured a net win
                # on the weight/cache-read-bound batch-1 rollout
                f = self.max_frames
                cdtype = jnp.int8 if self.quant else k.dtype
                kbuf = jnp.zeros((b, self.num_heads, f, hw, k.shape[-1]), cdtype)
                vbuf = jnp.zeros_like(kbuf)
                kbuf = ring_write(kbuf, _to_cache_dtype(k, kbuf), frames)
                vbuf = ring_write(vbuf, _to_cache_dtype(v, vbuf), frames)
                cache = {"k": kbuf, "v": vbuf,
                         **decode_tables(kbuf, vbuf, frames + t, k.dtype)}

        y = einops.rearrange(o, "b m t (h w) c -> b t h w (m c)", h=h, w=w)
        y = MPConv(self.channels, (1, 1), quant=self.quant,
                   name="attn_proj")(y)
        return mp_sum(x, y, t=self.attn_balance), cache

    def _eval_attention(self, q, k, v, cache, frames, b, t, hw):
        """Prefill (t>=1 frames vs cache+self) and decode (t==1) share one
        path: attend to all valid cached frames plus the new ones,
        frame-causally. The cache is a ring (sliding window): slot absolute
        positions come from ring_slot_positions, so attention is over the
        last min(frames, max_frames) frames at any rollout length."""
        q_pos = frames + jnp.arange(t)
        center = (frames + t) // 2
        if cache is not None and t == 1 and "kr" in cache:
            # Decode fast path. The dequantized + absolutely-roped +
            # token-flattened cache view (kr/vr) and the slot-validity bias
            # were precomputed by decode_tables() when the cache was last
            # written -- ONCE per frame, outside the sampler's diffusion
            # scan -- so each of the 2-NFE-per-step denoiser calls is just
            # two dots + a biased joint softmax. (Round 3 left this hoist to
            # XLA's loop-invariant code motion; the ring cache's dynamic
            # slot positions silently broke it. Structural now.) The xPos
            # pivot sits at `frames`, matching decode_tables: it cancels
            # exactly in q.k^T (see ops/rope.py docstring) but keeps the
            # scale tables bounded at ANY rollout length, where a fixed
            # pivot would over/underflow fp32 past ~2.4k frames
            # (0.2857^(f/64) dynamics).
            kr, vr, bias = cache["kr"], cache["vr"], cache["bias"]
            fhw = kr.shape[2]
            c = q.shape[-1]
            qr, kfr = rope_qk(q, k, q_pos, q_pos, center=frames)
            scale = 1.0 / np.sqrt(c)
            # two-dot biased joint softmax: cached keys (precomputed) + the
            # fresh frame's keys (attends to itself, reference :69-70)
            lc = jnp.einsum("bmqc,bmkc->bmqk", qr[:, :, 0],
                            kr.astype(k.dtype),
                            preferred_element_type=jnp.float32) * scale
            lc = lc + bias
            lf = jnp.einsum("bmqc,bmyc->bmqy", qr[:, :, 0], kfr[:, :, 0],
                            preferred_element_type=jnp.float32) * scale
            wts = jax.nn.softmax(jnp.concatenate([lc, lf], axis=-1), axis=-1)
            wts = wts.astype(v.dtype)
            o = jnp.einsum("bmqk,bmkc->bmqc", wts[..., :fhw],
                           vr.astype(v.dtype),
                           preferred_element_type=jnp.float32)
            o = o + jnp.einsum("bmqy,bmyc->bmqc", wts[..., fhw:],
                               v[:, :, 0],
                               preferred_element_type=jnp.float32)
            return o.astype(v.dtype).reshape(b, self.num_heads, t, hw, -1)
        if cache is None:
            k_pos = q_pos
            kk, vv = k, v
            # frame-causal mask (tq, tk)
            fmask = q_pos[:, None] >= k_pos[None, :]
        else:
            f = cache["k"].shape[2]
            kk = ring_write(_dequant_kv(cache["k"], k.dtype), k, frames)
            vv = ring_write(_dequant_kv(cache["v"], v.dtype), v, frames)
            # slot positions AFTER the new frames land; never-written slots
            # stay negative and are masked below
            k_pos = ring_slot_positions(frames + t, f)
            fmask = (q_pos[:, None] >= k_pos[None, :]) & (k_pos[None, :] >= 0)
            center = frames  # bounded xPos exponents at any rollout length
        qr, kr = rope_qk(q, kk, q_pos, k_pos, center=center)
        tk = kr.shape[2]
        qr = qr.reshape(b, self.num_heads, t * hw, -1)
        kr = kr.reshape(b, self.num_heads, tk * hw, -1)
        vr = vv.reshape(b, self.num_heads, tk * hw, -1)
        if cache is None and flash_supported(t * hw, qr.shape[-1]):
            # fresh prefill: Pallas frame-causal flash kernel
            o = causal_frame_attention(qr, kr, vr, t, hw)
        elif (cache is not None and t > 1 and isinstance(frames, int)
              and flash_supported(t * hw, qr.shape[-1])):
            # warm-cache prefill: splash kernel over (new frames x full
            # buffer) with a STATIC frame offset (threaded via the model's
            # `prefill_offset` hint) -- avoids the dense (t*hw)x(f*hw)
            # fallback at CS scale (reference attention_modules.py:72-75).
            # PrefillMask maps ring slots to absolute positions, so this
            # covers the WRAPPED ring (frames + t > capacity) too: the mask
            # follows the same slot->position rule as ring_slot_positions.
            o = prefill_cache_attention(qr, kr, vr, t, tk, frames, hw)
        else:
            mask = jnp.repeat(jnp.repeat(fmask, hw, axis=0), hw, axis=1)
            o = dense_attention(qr, kr, vr, mask)
        return o.reshape(b, self.num_heads, t, hw, -1)


class FrameAttention(nn.Module):
    """Per-frame (spatial-only) self-attention; no mask/cache/RoPE.
    Reference: attention_modules.py:93-119."""
    channels: int
    num_heads: int
    attn_balance: float = 0.3
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, cache=None, update_cache: bool = False,
                 frames=0, mode: str = "train", just_2d: bool = True):
        if self.num_heads == 0:
            return x, cache
        b, t, h, w = x.shape[:4]
        hw = h * w
        y = MPConv(self.channels * 3, (1, 1), quant=self.quant,
                   name="attn_qkv")(x)
        y = einops.rearrange(y, "b t h w (s m c) -> s b m t (h w) c",
                             s=3, m=self.num_heads)
        q, k, v = normalize(y, axis=-1)
        # the kernel's per-call overhead loses below training-scale batches
        # (batch-1 single-frame decode keeps the dense path)
        if full_flash_supported(hw, q.shape[-1]) and b * t >= 16:
            # frames fold into the vmapped batch; heads stay the kernel's
            qf, kf, vf = (einops.rearrange(a, "b m t y c -> (b t) m y c")
                          for a in (q, k, v))
            o = full_attention(qf, kf, vf)
            o = einops.rearrange(o, "(b t) m y c -> b m t y c", t=t)
        else:
            o = dense_attention(q, k, v)
        y = einops.rearrange(o, "b m t (h w) c -> b t h w (m c)", h=h, w=w)
        y = MPConv(self.channels, (1, 1), quant=self.quant,
                   name="attn_proj")(y)
        return mp_sum(x, y, t=self.attn_balance), cache
