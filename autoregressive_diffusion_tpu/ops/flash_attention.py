"""Block-sparse DART flash attention (Pallas splash-attention kernels).

The reference JIT-compiles Triton FlexAttention kernels from its BlockMasks
(/root/reference/edm2/attention/attention_modules.py:63-88,
attention_masking.py:27-90). The TPU-native equivalent is the Pallas
splash-attention kernel family: the DART mask becomes a *lazy* computable
mask (never materialized at token granularity) from which the kernel derives
its static block-sparsity grid; forward and backward are fused flash kernels
that never materialize the (S, S) logits.

Masks (frame granularity, SURVEY.md section 2.1 "TrainingMask"):
  * DartMask over 2T frames of `hw` tokens: clean q attends clean <= q;
    noisy q attends clean < q plus itself.
  * CausalFrameMask over T frames: block-causal prefill.

Kernels are memoized per (heads, shape, dtype) bucket, mirroring the
reference's lru_cache(16) on mask construction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas.ops.tpu.splash_attention import (
    splash_attention_kernel as splash,
    splash_attention_mask as mask_lib,
)


class DartMask(mask_lib._ComputableMask):
    """DART training mask at token granularity over S = 2*T*hw tokens.

    mask(q, k) with qf = q // hw, kf = k // hw (frame indices in [0, 2T)):
      qf,kf < T        : kf <= qf            (clean causal, inclusive)
      qf >= T, kf < T  : kf <  qf - T        (noisy sees strictly-past clean)
      qf,kf >= T       : qf == kf            (noisy self block)
    """

    def __init__(self, n_frames: int, tokens_per_frame: int,
                 shard_count: int = 1):
        self.n_frames = n_frames
        self.tokens_per_frame = tokens_per_frame
        t, hw = n_frames, tokens_per_frame

        def dart_mask_function(q_ids, kv_ids):
            qf = q_ids // hw
            kf = kv_ids // hw
            clean_q, clean_k = qf < t, kf < t
            both_clean = clean_q & clean_k & (kf <= qf)
            noisy_clean = (~clean_q) & clean_k & (kf < qf - t)
            noisy_self = (~clean_q) & (~clean_k) & (qf == kf)
            return both_clean | noisy_clean | noisy_self

        s = 2 * t * hw
        super().__init__(shape=(s, s), mask_function=dart_mask_function,
                         shard_count=shard_count)

    def __eq__(self, other):
        if not isinstance(other, type(self)):
            return NotImplemented
        return (self.n_frames == other.n_frames
                and self.tokens_per_frame == other.tokens_per_frame)

    def __hash__(self):
        return hash((type(self), self.n_frames, self.tokens_per_frame))


class CausalFrameMask(mask_lib._ComputableMask):
    """Block-causal (frame granular) mask for inference prefill."""

    def __init__(self, n_frames: int, tokens_per_frame: int,
                 shard_count: int = 1):
        self.n_frames = n_frames
        self.tokens_per_frame = tokens_per_frame
        hw = tokens_per_frame

        def causal_fn(q_ids, kv_ids):
            return q_ids // hw >= kv_ids // hw

        s = n_frames * hw
        super().__init__(shape=(s, s), mask_function=causal_fn,
                         shard_count=shard_count)

    def __eq__(self, other):
        if not isinstance(other, type(self)):
            return NotImplemented
        return (self.n_frames == other.n_frames
                and self.tokens_per_frame == other.tokens_per_frame)

    def __hash__(self):
        return hash((type(self), self.n_frames, self.tokens_per_frame))


class PrefillMask(mask_lib._ComputableMask):
    """Warm-cache prefill mask: `t_new` query frames entering a ring cache
    that already holds `offset` frames, attending frame-causally over the
    FULL `f_total`-slot KV buffer. Rectangular (t_new*hw, f_total*hw).
    `offset` must be static -- one kernel per offset bucket, like the
    reference's lru_cache'd masks per shape.

    Handles the WRAPPED ring too (offset + t_new > f_total): after the new
    frames are ring-written, slot s holds the newest absolute position
    congruent to s mod f_total, i.e. p(s) = end-1 - ((end-1-s) % f_total)
    with end = offset + t_new (matching models/attention.py
    ring_slot_positions). A query at absolute position offset + qf sees
    slot s iff p(s) <= offset + qf and p(s) >= 0. When the ring has not
    wrapped this reduces exactly to the plain absolute-position causal
    mask (p(s) = s for written slots, unwritten slots come out negative)."""

    def __init__(self, t_new: int, f_total: int, offset: int,
                 tokens_per_frame: int, shard_count: int = 1):
        self.t_new = t_new
        self.f_total = f_total
        self.offset = offset
        self.tokens_per_frame = tokens_per_frame
        hw = tokens_per_frame
        end = offset + t_new

        def fn(q_ids, kv_ids):
            s = kv_ids // hw
            p = end - 1 - ((end - 1 - s) % f_total)
            return (p <= q_ids // hw + offset) & (p >= 0)

        super().__init__(shape=(t_new * hw, f_total * hw), mask_function=fn,
                         shard_count=shard_count)

    def __eq__(self, other):
        if not isinstance(other, type(self)):
            return NotImplemented
        return ((self.t_new, self.f_total, self.offset, self.tokens_per_frame)
                == (other.t_new, other.f_total, other.offset,
                    other.tokens_per_frame))

    def __hash__(self):
        return hash((type(self), self.t_new, self.f_total, self.offset,
                     self.tokens_per_frame))


def _block_sizes(seq_len: int, kv_len=None):
    import os
    b = min(int(os.environ.get("AD_TPU_FLASH_BLOCK", "512")), seq_len)
    bkv = b if kv_len is None else min(
        int(os.environ.get("AD_TPU_FLASH_BLOCK", "512")), kv_len)
    return splash.BlockSizes(
        block_q=b, block_kv=bkv, block_kv_compute=bkv,
        block_q_dkv=b, block_kv_dkv=bkv, block_kv_dkv_compute=bkv,
        block_q_dq=b, block_kv_dq=bkv,
    )


@functools.lru_cache(maxsize=16)
def _make_kernel(kind: str, num_heads: int, n_frames: int,
                 tokens_per_frame: int, interpret: bool):
    mask_cls = DartMask if kind == "dart" else CausalFrameMask
    one = mask_cls(n_frames, tokens_per_frame)
    mask = mask_lib.MultiHeadMask([one] * num_heads)
    # splash lru-caches processed MaskInfo arrays; force eager (concrete)
    # construction so the cache never captures tracers from an enclosing jit
    # trace (they would leak into the backward trace otherwise).
    with jax.ensure_compile_time_eval():
        return splash.make_splash_mha(
            mask, block_sizes=_block_sizes(one.shape[0]),
            head_shards=1, q_seq_shards=1, interpret=interpret)


def _apply(kind: str, q, k, v, n_frames, tokens_per_frame, interpret):
    """q, k, v: (b, heads, S, d). The splash kernel does NOT scale logits;
    pre-scale q by 1/sqrt(d) to match scaled_dot_product semantics."""
    b, h, s, d = q.shape
    kernel = _make_kernel(kind, h, n_frames, tokens_per_frame, interpret)
    qs = (q * (1.0 / np.sqrt(d))).astype(q.dtype)
    return jax.vmap(kernel)(qs, k, v)


def dart_attention(q, k, v, n_frames: int, tokens_per_frame: int,
                   interpret: bool = False):
    """DART-masked flash attention over the 2T-frame concat.
    q, k, v: (b, heads, 2*T*hw, d)."""
    return _apply("dart", q, k, v, n_frames, tokens_per_frame, interpret)


def causal_frame_attention(q, k, v, n_frames: int, tokens_per_frame: int,
                           interpret: bool = False):
    """Frame-causal flash attention (prefill). q,k,v: (b, heads, T*hw, d)."""
    return _apply("causal", q, k, v, n_frames, tokens_per_frame, interpret)


@functools.lru_cache(maxsize=16)
def _make_prefill_kernel(num_heads: int, t_new: int, f_total: int,
                         offset: int, tokens_per_frame: int, interpret: bool):
    one = PrefillMask(t_new, f_total, offset, tokens_per_frame)
    mask = mask_lib.MultiHeadMask([one] * num_heads)
    with jax.ensure_compile_time_eval():
        return splash.make_splash_mha(
            mask, block_sizes=_block_sizes(one.shape[0], one.shape[1]),
            head_shards=1, q_seq_shards=1, interpret=interpret)


def prefill_cache_attention(q, k, v, t_new: int, f_total: int, offset: int,
                            tokens_per_frame: int, interpret: bool = False):
    """Warm-cache prefill: q (b, heads, t_new*hw, d) over the full KV buffer
    k/v (b, heads, f_total*hw, d) with a static frame offset. Replaces the
    dense (t_new*hw) x (f_total*hw) fallback at CS scale (reference prefill:
    attention_modules.py:72-75)."""
    b, h, s, d = q.shape
    kernel = _make_prefill_kernel(h, t_new, f_total, offset,
                                  tokens_per_frame, interpret)
    qs = (q * (1.0 / np.sqrt(d))).astype(q.dtype)
    return jax.vmap(kernel)(qs, k, v)


@functools.lru_cache(maxsize=16)
def _make_full_kernel(num_heads: int, seq: int, interpret: bool):
    mask = mask_lib.MultiHeadMask(
        [mask_lib.FullMask((seq, seq))] * num_heads)
    with jax.ensure_compile_time_eval():
        return splash.make_splash_mha(
            mask, block_sizes=_block_sizes(seq),
            head_shards=1, q_seq_shards=1, interpret=interpret)


def full_attention(q, k, v, interpret: bool = False):
    """Unmasked flash attention (FrameAttention's per-frame softmax,
    reference attention_modules.py:93-119). q, k, v: (batch, heads, S, d);
    the dense path materializes (S, S) fp32 logits per (batch, frame, head)
    -- the dominant cost of the 16x16 frame-attention blocks -- while the
    splash kernel streams them."""
    b, h, s, d = q.shape
    kernel = _make_full_kernel(h, s, interpret)
    qs = (q * (1.0 / np.sqrt(d))).astype(q.dtype)
    return jax.vmap(kernel)(qs, k, v)


def full_flash_supported(seq_len: int, head_dim: int) -> bool:
    import os
    if os.environ.get("AD_TPU_FLASH") == "0":
        return False
    on_tpu = jax.default_backend() in ("tpu", "axon")
    return on_tpu and seq_len % 128 == 0 and head_dim >= 32


def flash_supported(seq_len: int, head_dim: int) -> bool:
    """Conservative gate: splash needs TPU-tileable shapes; tiny CPU test
    shapes fall back to the dense path. AD_TPU_FLASH=0 disables, =1 forces
    (benchmarking)."""
    import os
    env = os.environ.get("AD_TPU_FLASH")
    if env == "0":
        return False
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not (on_tpu and seq_len % 128 == 0 and head_dim >= 32):
        return False
    if env == "1":
        return True
    # Measured on v5e (marginal-cost timing, 2026-08): the splash kernel
    # edges out XLA's dense fused attention already at S=1024 on the DART
    # train mask (~4% whole-step win) and scales O(S * clean-frames) at long
    # context where dense is O(S^2). Kernel overhead only loses below ~512.
    return seq_len >= 512


# ---- sequence-parallel kernels (shard_map fast path) -----------------------
#
# Under a mesh with sp > 1 the auto-SPMD (jit) path cannot partition a
# pallas_call, so sharded training steps fall back to XLA dense attention.
# These wrappers are the TPU fast path: Q rows and the block-sparse mask
# metadata STAY sharded over the 'seq' mesh axis (splash q_seq_shards +
# manual_sharding_spec), heads stay sharded over 'model', and only K/V are
# all-gathered over ICI inside the shard_map -- the same collective XLA
# would insert around a dense attention, now amortized against a streaming
# kernel that never materializes the (S, S) logits.

def _sp_block_sizes(q_local: int, kv_len: int):
    import os
    b = min(int(os.environ.get("AD_TPU_FLASH_BLOCK", "512")), q_local)
    bkv = min(int(os.environ.get("AD_TPU_FLASH_BLOCK", "512")), kv_len)
    return splash.BlockSizes(
        block_q=b, block_kv=bkv, block_kv_compute=bkv,
        block_q_dkv=b, block_kv_dkv=bkv, block_kv_dkv_compute=bkv,
        block_q_dq=b, block_kv_dq=bkv,
    )


@functools.lru_cache(maxsize=16)
def _make_sp_kernel(kind: str, num_heads: int, n_frames: int,
                    tokens_per_frame: int, q_shards: int, head_shards: int,
                    interpret: bool):
    mask_cls = DartMask if kind == "dart" else CausalFrameMask
    one = mask_cls(n_frames, tokens_per_frame, shard_count=q_shards)
    mask = mask_lib.MultiHeadMask([one] * num_heads)
    s = one.shape[0]
    with jax.ensure_compile_time_eval():
        return splash.make_splash_mha(
            mask, block_sizes=_sp_block_sizes(s // q_shards, s),
            head_shards=head_shards, q_seq_shards=q_shards,
            interpret=interpret)


def _sp_apply(kind: str, q, k, v, n_frames: int, tokens_per_frame: int,
              mesh, seq_axis: str, head_axis, interpret: bool):
    from jax.sharding import NamedSharding, PartitionSpec as P
    b, h, s, d = q.shape
    n = int(mesh.shape[seq_axis])
    hshards = int(mesh.shape[head_axis]) if head_axis else 1
    kernel = _make_sp_kernel(kind, h, n_frames, tokens_per_frame, n,
                             hshards, interpret)
    kspec = kernel.manual_sharding_spec(
        NamedSharding(mesh, P(head_axis, seq_axis)))
    batch_axes = tuple(a for a in ("replica", "data") if a in mesh.shape)
    bspec = batch_axes if batch_axes else None
    io_spec = P(bspec, head_axis, seq_axis, None)

    def inner(kern, qs, ks, vs):
        ks = jax.lax.all_gather(ks, seq_axis, axis=2, tiled=True)
        vs = jax.lax.all_gather(vs, seq_axis, axis=2, tiled=True)
        return jax.vmap(kern)(qs, ks, vs)

    qs = (q * (1.0 / np.sqrt(d))).astype(q.dtype)
    return jax.shard_map(inner, mesh=mesh,
                         in_specs=(kspec, io_spec, io_spec, io_spec),
                         out_specs=io_spec, check_vma=False)(kernel, qs, k, v)


def dart_attention_sp(q, k, v, n_frames: int, tokens_per_frame: int, mesh,
                      seq_axis: str = "seq", head_axis=None,
                      interpret: bool = False):
    """Sequence-parallel DART flash attention over the 2T-frame concat.
    q, k, v: (b, heads, 2*T*hw, d) GLOBAL arrays whose S axis is sharded
    over `seq_axis` (and heads over `head_axis`, e.g. 'model')."""
    return _sp_apply("dart", q, k, v, n_frames, tokens_per_frame, mesh,
                     seq_axis, head_axis, interpret)


def causal_frame_attention_sp(q, k, v, n_frames: int, tokens_per_frame: int,
                              mesh, seq_axis: str = "seq", head_axis=None,
                              interpret: bool = False):
    """Sequence-parallel frame-causal flash attention (prefill)."""
    return _sp_apply("causal", q, k, v, n_frames, tokens_per_frame, mesh,
                     seq_axis, head_axis, interpret)


# ---- SP context: lets VideoAttention reach the shard_map kernels -----------
#
# The mesh is a host-side static object, not a traced value, so it cannot be
# threaded through the (jitted) model's arguments; training scripts that
# shard the frame axis install it here (parallel.set_sp_context) and
# VideoAttention picks the sequence-parallel kernel over the XLA dense
# fallback whenever the shapes tile.

_SP_CTX = None


def set_sp_context(mesh, seq_axis: str = "seq", head_axis="model",
                   interpret: bool = False):
    """Install (or clear, mesh=None) the sequence-parallel attention
    context. `interpret` runs the splash kernels in interpreter mode
    (CPU tests)."""
    global _SP_CTX
    if mesh is None:
        _SP_CTX = None
    else:
        _SP_CTX = (mesh, seq_axis, head_axis, bool(interpret))
    return _SP_CTX


def sp_context():
    return _SP_CTX


def sp_flash_supported(seq_len: int, num_heads: int):
    """Whether the installed SP context can serve an S=seq_len DART/causal
    attention: sp>1 and each seq shard tiles to the 128-row splash grid.
    Returns (ok, mesh, seq_axis, head_axis_or_None, interpret)."""
    ctx = _SP_CTX
    if ctx is None:
        return False, None, None, None, False
    mesh, seq_axis, head_axis, interpret = ctx
    sp = int(mesh.shape.get(seq_axis, 1))
    if sp <= 1 or seq_len % (sp * 128):
        return False, None, None, None, False
    if not (interpret or jax.default_backend() in ("tpu", "axon")):
        return False, None, None, None, False
    if head_axis is not None:
        hs = int(mesh.shape.get(head_axis, 1))
        if hs <= 1 or num_heads % hs:
            head_axis = None
    return True, mesh, seq_axis, head_axis, interpret
