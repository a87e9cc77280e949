"""Fused magnitude-preserving causal gated conv (Pallas TPU kernel).

This is the TPU-native implementation of the reference's temporal-mixing
workhorse MPCausal3DGatedConv in its DART *training* mode
(/root/reference/edm2/conv.py:49-101):

    y2d  = conv2d_3x3(transform(x))                  (both DART halves)
    ctx  = conv3d_(kt-1)x3x3(transform(clean past))  (strictly past frames,
                                                      ones-padding at t<kt-1)
    out  = mp_sum(y2d, ctx, gate)                    (per-frame learned gate)

where transform = optional per-(frame, channel) scale (the UNet's noise-
embedding modulation) followed by optional mp_silu -- i.e. the elementwise
ops that precede each conv in Block.forward
(/root/reference/edm2/networks_edm2.py:71-76) are fused into the conv read.

Why a hand-written kernel: at the UNet's hot resolutions every trailing dim
(H, W, C in {32..96}) is smaller than the 128-lane TPU tile, so XLA's layout
assignment either pads lanes 2-4x on elementwise ops or inserts relayout
copies around its conv emitter (measured: ~28% of step time in copies, 2.5x
elementwise slowdown). This kernel takes activations PACKED as
(B, T, 2, C, Lp) with Lp = (H+2)*W fused on lanes -- dense tiles, no
relayout -- and computes the convolution as shifted-tap matmuls on the MXU
(9 taps for the 2D conv, 18 for the two-past-frame context conv),
accumulating in fp32. Tap shifts are circular lane rolls; every lane that
wraps corresponds to a W-edge position that the dx-mask zeroes anyway, so
the roll needs no padding buffer.

Grid design: (B, ceil(T/TB)) programs, each covering a TB-frame block with
a jax.lax.fori_loop over its frames and ring-indexed scratch buffers. TB is
picked per shape so the backward program fits VMEM (_pick_tb; TB=T for the
gym-scale shapes, TB<T for CS-scale). Inside a block the causal context is
local: transformed clean frames live in a 2-slot ring reused by the frames
t+1 / t+2 that convolve over them. Across block boundaries the ring is
preloaded from single-frame clamped-index halo views (frames t0-2, t0-1;
the ones frame before the clip start), and in the backward kernel the
context gradients that cross a boundary are recomputed by the receiving
program from forward-looking halo views of (gout, residuals, gates).

The backward pass is a second Pallas kernel (custom_vjp) that recomputes
the tap stacks and produces dX, dW (grid-resident accumulation over the
batch), and the gate/modulation gradients.

Shapes/terms:
    B batch, T frames per DART half, s in {0=clean, 1=noisy},
    C in-channels (zero-padded to Cp, a multiple of 8), Co out-channels,
    H, W spatial, HW = H*W, Lp = (H+2)*W (one zero H-pad row each side),
    taps: dy, dx in {-1,0,1}; context taps additionally dt in {2,1}.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32

# Tap order shared by the kernel and the weight packers.
_TAPS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _cpad(c: int) -> int:
    return -(-c // 8) * 8


def pack_x(x: jax.Array, h: int, w: int) -> jax.Array:
    """(B, 2T, H, W, C) -> (B, T, 2, Cp, (H+2)*W) with zero H- and C-padding.

    DART frame order is (clean block, noisy block) along the 2T axis
    (reference edm2/loss.py:20-22), so s is the OUTER factor.
    """
    b, t2 = x.shape[:2]
    c = x.shape[-1]
    t = t2 // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0), (0, _cpad(c) - c)))
    xp = xp.reshape(b, 2, t, (h + 2), w, -1)
    # (b, s, t, hp, w, c) -> (b, t, s, c, hp*w)
    xp = xp.transpose(0, 2, 1, 5, 3, 4)
    return xp.reshape(b, t, 2, xp.shape[3], (h + 2) * w)


def unpack_out(o: jax.Array, h: int, w: int, co: int) -> jax.Array:
    """(B, T, 2, Cop, H*W) -> (B, 2T, H, W, Co)."""
    b, t, _, cop, _ = o.shape
    o = o.reshape(b, t, 2, cop, h, w).transpose(0, 2, 1, 4, 5, 3)
    return o.reshape(b, 2 * t, h, w, cop)[..., :co]


def pack_hw(x: jax.Array, h: int, w: int) -> jax.Array:
    """(B, 2T, H, W, C) -> (B, T, 2, Cp, H*W): the kernel OUTPUT layout.

    The packed interchange format between chained fused Blocks: no H-pad
    rows (those are re-inserted per conv by repad_packed), channels
    zero-padded to a multiple of 8. Inverse of unpack_out."""
    b, t2 = x.shape[:2]
    c = x.shape[-1]
    t = t2 // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 0), (0, _cpad(c) - c)))
    xp = xp.reshape(b, 2, t, h, w, -1)
    xp = xp.transpose(0, 2, 1, 5, 3, 4)
    return xp.reshape(b, t, 2, xp.shape[3], h * w)


def repad_packed(o: jax.Array, h: int, w: int) -> jax.Array:
    """Chain two fused convs without leaving packed space:
    (B, T, 2, Co, H*W) kernel output -> (B, T, 2, Co, (H+2)*W) kernel input.
    Re-inserts the zero H-padding rows; ~1x-traffic pad instead of the two
    relayout transposes of unpack_out + pack_x."""
    b, t, s, co, _ = o.shape
    o = o.reshape(b, t, s, co, h, w)
    o = jnp.pad(o, ((0, 0), (0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    return o.reshape(b, t, s, co, (h + 2) * w)


def _pack_w(wk: jax.Array) -> jax.Array:
    """(taps..., C, Co) -> (ntaps*Cp, Co) with C zero-padded to Cp."""
    *taps, c, co = wk.shape
    n = 1
    for tdim in taps:
        n *= tdim
    wk = wk.reshape(n, c, co)
    wk = jnp.pad(wk, ((0, 0), (0, _cpad(c) - c), (0, 0)))
    return wk.reshape(n * _cpad(c), co)


def _bwd_vmem_bytes(tb: int, h: int, w: int, cp: int, cop: int) -> int:
    """Estimated VMEM footprint of the (bigger) backward kernel for one grid
    program handling a TB-frame block: double-buffered in/out blocks +
    scratch. The time axis is blocked (grid (B, ceil(T/TB))) precisely so
    large models (CS: 256ch at 32x32, T=16) fit the chip's 128M VMEM."""
    l, hw = (h + 2) * w, h * w
    bf, f32, dbuf = 2, 4, 2
    inb = (tb * 2 * cp * l * bf          # xp block
           + 2 * cp * l * bf             # xp halo frames
           + 2 * tb * 2 * cop * hw * bf  # gout + y2d residual
           + tb * cop * hw * bf          # ctx residual
           + 5 * cop * hw * bf           # gout/y2d/ctx halo frames
           + 3 * 9 * cop * cp * bf)      # w2t / w3at / w3bt
    outb = (tb * 2 * cp * l * bf         # dx
            + 3 * 9 * cop * cp * f32     # dw2t / dw3at / dw3bt
            + tb * 2 * cp * f32)         # dcv
    scratch = (2 * 9 * cop * l + 2 * cop * l
               + 3 * cp * l + 2 * cp * l) * f32
    return dbuf * (inb + outb) + scratch


def _pick_tb(t: int, h: int, w: int, cp: int, cop: int) -> int:
    """Largest frame-block size whose backward program fits the VMEM budget
    (AD_TPU_FUSED_VMEM_MB, default 64; AD_TPU_FUSED_TB forces a value).

    Why 64 when the chip's scoped-VMEM cap is ~97 MiB: _bwd_vmem_bytes is
    an under-estimate whose miss grows with the limit the scheduler is
    granted (measured on the CS dec-16x16 Cp=768 shape, estimate 80.0M:
    real stack 91.6M under an 88.8M limit, 109.9M under a 96.8M limit --
    XLA packs more live buffers the more scoped VMEM it gets, so chasing
    with margin diverges). 64 keeps every shape's real footprint safely
    below the cap; shapes whose TB=2 estimate still exceeds it (CS
    dec-16x16 up/block0) take the XLA conv path instead of OOMing the
    compiler."""
    import os
    env = os.environ.get("AD_TPU_FUSED_TB")
    if env:
        return max(2, min(int(env), t))
    budget = int(os.environ.get("AD_TPU_FUSED_VMEM_MB", "64")) << 20
    tb = t
    while tb > 2 and _bwd_vmem_bytes(tb, h, w, cp, cop) > budget:
        tb = -(-tb // 2)
    return tb


def fused_supported(mode: str, h: int, w: int, t_total: int,
                    cin: int = 0, cout: int = 0):
    """Gate for the fused train-mode conv path.

    Returns (use_fused, interpret). Env AD_TPU_FUSED_CONV: '0' disables,
    'interpret' forces the kernel in interpreter mode (CPU tests), unset/'1'
    enables on TPU for tileable shapes. Shapes whose backward kernel would
    not fit VMEM even at the minimum frame-block size (see _bwd_vmem_bytes /
    _pick_tb) fall back to the XLA path -- with cin/cout unknown (0) the
    check is skipped for backward compatibility.

    AD_TPU_FUSED_MAX_CP (default 192 since round 5) caps the padded
    in-channel count the kernel accepts: its edge over XLA is lane-starved
    shapes, and the stream-paired stacks (round 5) moved the crossover up
    -- measured end-to-end (v5e, gym config, paired kernels):
    68.2 samples/s at cap 96, 69.4 at 128, 70.7 at 192, 70.6 no-cap with
    a 96M VMEM budget (the remaining Cp>=256 shapes are footprint-
    rejected). Round-4 pre-pairing numbers for history: 61.1 at 96,
    60.4 at 192, 58.5 no-cap; CS config 106.1 ms/step pure-XLA vs 117.2
    all-fused (re-swept in round 4 to a wash).
    """
    import os
    env = os.environ.get("AD_TPU_FUSED_CONV", "")
    if env == "0":
        return False, False
    if mode != "train" or t_total % 2 or (h * w) % 128:
        return False, False
    if cin or cout:
        cp = _cpad(max(cin, 1))
        cop = max(_cpad(max(cout, 1)), 8)
        if cp > int(os.environ.get("AD_TPU_FUSED_MAX_CP", "192")):
            return False, False
        # Separate cout cap: a small-cin conv into a wide cout (the CS
        # stem, 9->128 at 32x32) gives XLA a densely-tiled output and the
        # kernel no lane win on that side of the dot. Unset = no cap;
        # the shipped default is set from the on-chip ablation below.
        max_cop = os.environ.get("AD_TPU_FUSED_MAX_COP")
        if max_cop is not None and cop > int(max_cop):
            return False, False
        budget = int(os.environ.get("AD_TPU_FUSED_VMEM_MB", "64")) << 20
        if _bwd_vmem_bytes(2, h, w, cp, cop) > budget:
            return False, False
    if env == "interpret":
        return True, True
    on_tpu = jax.default_backend() in ("tpu", "axon")
    return on_tpu, False


def decode_fused_supported(mode: str, h: int, w: int, t_frames: int):
    """Gate for the fused eval/decode Block path (fused_decode_block).

    OFF by default: measured on the chip (64-step rollout bench, int8
    weights), the one-program-per-Block kernel runs the rollout at 11.2
    frames/s vs 15.3 frames/s for the XLA decode path -- at T=1 XLA's own
    fusion already covers the elementwise chain, and the kernel's packed
    relayouts + VPU tap rolls cost more than the launch overhead they
    save. Kept (oracle-tested) for environments where launch overhead
    dominates differently.

    Env AD_TPU_FUSED_DECODE: '1' enables on TPU, 'interpret' forces
    interpreter mode (CPU tests), unset/'0' disables. Applies only to the
    T=1 cached-decode step -- prefill and train have their own paths."""
    import os
    env = os.environ.get("AD_TPU_FUSED_DECODE", "")
    if env not in ("1", "interpret"):
        return False, False
    if mode != "eval" or t_frames != 1 or (h * w) % 128:
        return False, False
    if env == "interpret":
        return True, True
    return jax.default_backend() in ("tpu", "axon"), False


def _make_masks(c_rows: int, l: int, w: int):
    """The two W-edge masks shared by every tap: lanes whose W-coordinate
    leaves the row under a dx=+1 / dx=-1 shift. Computed ONCE per kernel
    invocation -- the integer mod on a full tile is expensive on the VPU and
    dominated the kernel when recomputed per tap."""
    col = jax.lax.broadcasted_iota(jnp.int32, (c_rows, l), 1) % w
    return {1: col < w - 1, -1: col > 0}


def _roll(x, shift):
    """Circular lane roll: out[j] = x[j + shift] (mod L)."""
    return pltpu.roll(x, (-shift) % x.shape[1], 1)


def _stack_into(scr, base_row, xt, w: int, hw: int, masks):
    """Write the 9 shifted-tap rows of frame xt (Cp, Lp) into scratch rows
    [base_row, base_row + 9*Cp). Wrapped lanes are always dx-masked."""
    c = xt.shape[0]
    for k, (dy, dx) in enumerate(_TAPS):
        off = (1 + dy) * w + dx
        shifted = _roll(xt, off)[:, :hw]
        if dx != 0:
            shifted = jnp.where(masks[dx], shifted, 0)
        scr[base_row + k * c: base_row + (k + 1) * c, :] = (
            shifted.astype(scr.dtype))


def _stack_pair_into(scr, xt2, w: int, hw: int, l: int, masks):
    """Stream-PAIRED tap stack: xt2 is the lane-concat of both DART halves'
    padded frames (Cp, 2*Lp); each tap does ONE roll over the pair and the
    two output windows (clean at [0:hw], noisy at [l:l+hw] pre-trim) land
    side by side in scratch rows of width 2*hw. Halves the per-frame roll
    op count and doubles the conv dot's N dim (the MXU is N-starved at the
    low resolutions). Cross-seam reads are safe by construction: every roll
    offset |off| <= w+1 < 2w, and the 2w lanes around the seam are the two
    frames' H-padding rows (zeros) -- wrapped/seam lanes are additionally
    dx-masked, exactly like the single-frame stack. masks: (c, hw) single
    width (both windows share the per-lane dx masks). The two windows are
    written as two stores -- a per-tap lane-concat would materialize an
    extra copy of the whole stack (measured +41% on the enc0 fwd cell)."""
    c = xt2.shape[0]
    for k, (dy, dx) in enumerate(_TAPS):
        off = (1 + dy) * w + dx
        r = _roll(xt2, off)
        a, bn = r[:, :hw], r[:, l:l + hw]
        if dx != 0:
            a = jnp.where(masks[dx], a, 0)
            bn = jnp.where(masks[dx], bn, 0)
        scr[k * c:(k + 1) * c, :hw] = a.astype(scr.dtype)
        scr[k * c:(k + 1) * c, hw:] = bn.astype(scr.dtype)


def _ones_interior(c: int, l: int, w: int, dtype=F32):
    """A 'ones frame' in packed layout: ones on the H interior, zeros on the
    two H-padding rows (the conv's zero spatial padding must survive the
    ones-initialized temporal padding, reference conv.py:68)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (c, l), 1)
    row = lane // w
    h_rows = l // w
    return jnp.where((row >= 1) & (row < h_rows - 1),
                     jnp.ones((c, l), dtype), jnp.zeros((c, l), dtype))


def _silu_f32(z):
    return jax.nn.sigmoid(z) * z * (1.0 / 0.596)


def _dsilu_f32(z):
    s = jax.nn.sigmoid(z)
    return s * (1 + z * (1 - s)) * (1.0 / 0.596)


def _blend(a, b, g):
    """mp_sum with scalar gate g (reference edm2/utils.py:118-123 via
    conv.py:95): lerp(a, b, g) / sqrt((1-g)^2 + g^2)."""
    s = jax.lax.rsqrt((1 - g) ** 2 + g ** 2)
    return (a + (b - a) * g) * s


def _dot_kc(a, b):
    """(K, M) x (K, N) -> (M, N)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=F32)


def _dot_nn(a, b):
    """(K, N) x (M, N) -> (K, M)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=F32)


def _dot_cn(a, b):
    """(K, M) x (M, N) -> (K, N) (contract a dim1 with b dim0)."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=F32)


# ---------------------------------------------------------------------------
# Forward kernel: grid (B, ceil(T/TB)), loop over the TB-frame block
#
# Large models (CS: 256ch at 32x32, T=16) cannot hold the whole (T, 2, C, L)
# slab in VMEM, so the time axis is split into TB-frame blocks. The causal
# context needs the transformed CLEAN frames t0-1, t0-2 from before the
# block: they arrive as two single-frame clamped-index halo views of the
# same input and are transformed once into the ring scratch before the
# loop (pre-clip frames preload the ones frame instead -- which also
# removes the per-frame where(t>=k, ring, ones) selects the unblocked
# kernel needed). TB=T reproduces the original single-block behavior.
# ---------------------------------------------------------------------------

def _fwd_kernel(xq, xh0, xh1, w2p, w3p, cvq, cvh0, cvh1, gates, out, *rest,
                tb: int, t_total: int, w: int, hw: int, silu_in: bool,
                has_cv: bool, with_ctx: bool, mm_dtype, packed: bool = False):
    if with_ctx:
        y2d_res, ctx_res, a_scr, st_ring = rest
    else:
        (a_scr,) = rest
        st_ring = None
    t0 = pl.program_id(1) * tb
    c = xq.shape[-2]
    l = xq.shape[-1]
    # packed rolls: channel PAIRS are bitcast into one i32 sublane before
    # the 9 tap rolls (Mosaic's dynamic_rotate is 32-bit-only, so bf16
    # cannot roll natively) -- the rolls then move half the elements of
    # the f32 formulation. Lanes are pixels and stay 1:1 through the
    # bitcast, so shifts and the per-lane dx edge masks are unaffected;
    # one bitcast back to bf16 feeds the MXU dot.
    #
    # Stream pairing (round 5): the two DART halves are lane-concatenated
    # and tap-stacked TOGETHER (_stack_pair_into), so each frame does 9
    # rolls instead of 18 and ONE 2D-conv dot with N = 2*HW instead of two
    # N = HW dots. The clean half of the pair stack (lanes [0:hw]) is what
    # the context ring stores.
    masks = _make_masks(c // 2 if packed else c, hw, w)
    w2 = w2p[...].astype(mm_dtype)
    if with_ctx:
        w3a = w3p[:9 * c].astype(mm_dtype)
        w3b = w3p[9 * c:].astype(mm_dtype)

    def _pack(xv):
        return pltpu.bitcast(xv.astype(jnp.bfloat16), jnp.int32)

    def _unpack(a):
        return pltpu.bitcast(a, jnp.bfloat16) if packed else a

    def transform_one(xv, cvv):
        xv = xv.astype(F32)
        if has_cv:
            xv = xv * cvv.astype(F32)[:, None]
        return _silu_f32(xv) if silu_in else xv

    def transform_pair(j):
        pair = jnp.concatenate(
            [transform_one(xq[0, j, 0], cvq[0, j, 0] if has_cv else None),
             transform_one(xq[0, j, 1], cvq[0, j, 1] if has_cv else None)],
            axis=1)
        return _pack(pair) if packed else pair

    def transform_halo(xh, cvh):
        xv = transform_one(xh[0, 0, 0], cvh[0, 0, 0] if has_cv else None)
        return _pack(xv) if packed else xv

    if with_ctx:
        # STACKED-tap ring: slot t % 2 holds the 9 shifted-tap rows of
        # transformed clean frame t (width hw -- the clean half of the
        # pair stack). Each clean frame is tap-stacked ONCE and reused by
        # the context convs of frames t+1 / t+2. Preload frames t0-2 (same
        # parity as t0) and t0-1; ones before the clip start (reference
        # conv.py:68). Halo frames ride the pair path duplicated -- two
        # single-frame stacks per program, cost is noise.
        ones = (_pack(_ones_interior(c, l, w)) if packed
                else _ones_interior(c, l, w))
        h0 = jnp.where(t0 >= 2, transform_halo(xh0, cvh0), ones)
        _stack_pair_into(a_scr, jnp.concatenate([h0, h0], axis=1),
                         w, hw, l, masks)
        st_ring[t0 % 2] = a_scr[:, :hw]
        h1 = jnp.where(t0 >= 1, transform_halo(xh1, cvh1), ones)
        _stack_pair_into(a_scr, jnp.concatenate([h1, h1], axis=1),
                         w, hw, l, masks)
        st_ring[(t0 + 1) % 2] = a_scr[:, :hw]

    def body(j, _):
        t = t0 + j
        if with_ctx:
            # context from the stacked ring (frames t-2, t-1) BEFORE frame
            # t's own stack overwrites the t-2 slot below
            ctx = (_dot_kc(w3a, _unpack(st_ring[t % 2]))
                   + _dot_kc(w3b, _unpack(st_ring[(t + 1) % 2])))
        _stack_pair_into(a_scr, transform_pair(j), w, hw, l, masks)
        y2d = _dot_kc(w2, _unpack(a_scr[...]))   # (Cop, 2*hw)
        if with_ctx:
            st_ring[t % 2] = a_scr[:, :hw]  # clean half of frame t's stack
        y2d_c, y2d_n = y2d[:, :hw], y2d[:, hw:]
        if with_ctx:
            g_c = gates[0, j, 0, 0]
            g_n = gates[0, j, 0, 1]
            out[0, j, 0] = _blend(y2d_c, ctx, g_c).astype(out.dtype)
            out[0, j, 1] = _blend(y2d_n, ctx, g_n).astype(out.dtype)
            # residuals for the backward pass (blend partials need them)
            y2d_res[0, j, 0] = y2d_c.astype(y2d_res.dtype)
            y2d_res[0, j, 1] = y2d_n.astype(y2d_res.dtype)
            ctx_res[0, j, 0] = ctx.astype(ctx_res.dtype)
        else:
            out[0, j, 0] = y2d_c.astype(out.dtype)
            out[0, j, 1] = y2d_n.astype(out.dtype)
        return 0

    # dynamic bound: the last block may be partial
    jax.lax.fori_loop(0, jnp.minimum(tb, t_total - t0), body, 0)


# ---------------------------------------------------------------------------
# Backward kernel: grid (B, ceil(T/TB)), loop over the TB-frame block.
#
# dX for a CLEAN frame t collects contributions from its own convs and from
# the context convs of frames t+1, t+2. Inside a block those arrive through
# the 3-slot pending ring exactly as in the unblocked kernel; contributions
# that cross the block boundary are recomputed by the receiving program
# from two single-frame forward halo views of (gout, y2d_res, ctx_res,
# gates) -- frames t0+tb, t0+tb+1 -- in two static epilogue steps (only the
# blend backward + inverse-stack dot, no dW/dX writes: those belong to the
# program that owns the halo frames). The transformed-clean ring mirrors
# the forward preload, replacing the unblocked kernel's per-frame
# recompute of frames t-1/t-2.
# ---------------------------------------------------------------------------

def _stack_inv_into(scr, da, gscr, w: int, hw: int, masks, lw: int):
    """Inverse-shifted stack of an output gradient: scr row-block k holds
    wide_k[m] = masked_k(da)[m - off_k] (zeros outside the HW window; the
    only wrap positions land on discarded H-pad lanes). Rolls run on the
    (Co, lw) prefix of the widen scratch (f32, or packed-i32 channel pairs
    -- see _bwd_kernel) -- independent of the (possibly much larger) input
    channel count, which is what makes this formulation cheaper than
    un-stacking a (9C, HW) gradient. `lw` selects the single-frame width
    (Lp; the scratches are allocated 2*Lp wide for the paired variant
    below)."""
    co = da.shape[0]
    for k, (dy, dx) in enumerate(_TAPS):
        off = (1 + dy) * w + dx
        g = da
        if dx != 0:
            g = jnp.where(masks[dx], g, 0)
        gscr[:, :hw] = g
        gscr[:, hw:lw] = jnp.zeros((co, lw - hw), gscr.dtype)
        scr[k * co:(k + 1) * co, :lw] = _roll(gscr[:, :lw], -off)


def _stack_inv_pair_into(scr, da_c, da_n, gscr, w: int, hw: int, l: int,
                         masks):
    """Stream-PAIRED inverse stack: the two DART halves' output gradients
    are placed at the pair layout's two windows (clean at [0:hw], noisy at
    [l:l+hw]) of the 2*Lp widen scratch and every tap does ONE roll over
    the pair -- the exact transpose of _stack_pair_into. Cross-seam and
    wrapped contributions are zero by the same argument as the forward
    pair stack (pad rows + dx masks). masks: single-width (Co, hw)."""
    co = da_c.shape[0]
    gscr[...] = jnp.zeros(gscr.shape, gscr.dtype)
    for k, (dy, dx) in enumerate(_TAPS):
        off = (1 + dy) * w + dx
        gc, gn = da_c, da_n
        if dx != 0:
            gc = jnp.where(masks[dx], gc, 0)
            gn = jnp.where(masks[dx], gn, 0)
        gscr[:, :hw] = gc
        gscr[:, l:l + hw] = gn
        scr[k * co:(k + 1) * co, :] = _roll(gscr[...], -off)


def _bwd_kernel(xq, xh0, xh1, w2t, w3at, w3bt, cvq, cvh0, cvh1, gates,
                gout, y2dres, ctxres, gouth0, gouth1, yrh0, yrh1, crh0,
                crh1, gateh0, gateh1,
                dxq, dw2t, dw3at, dw3bt, dcvq, dgates,
                si_scr, g_scr, pend_ring, tr_ring,
                *, tb: int, t_total: int, w: int, hw: int, silu_in: bool,
                has_cv: bool, with_ctx: bool, mm_dtype, packed: bool = False):
    b_i = pl.program_id(0)
    t0 = pl.program_id(1) * tb
    c = xq.shape[-2]
    l = xq.shape[-1]
    cop = gout.shape[-2]
    # packed inverse-stack rolls: same scheme as _fwd_kernel -- the
    # output-channel gradient is cast to bf16 (the dots consumed it as
    # mm_dtype anyway), channel pairs bitcast to i32, the 9 rolls run on
    # half the elements, and one bitcast back feeds the dW/dX dots.
    masks = _make_masks(cop // 2 if packed else cop, hw, w)
    w2m = w2t[...].astype(mm_dtype)
    if with_ctx:
        w3am = w3at[...].astype(mm_dtype)
        w3bm = w3bt[...].astype(mm_dtype)

    @pl.when((b_i == 0) & (t0 == 0))
    def _():
        dw2t[...] = jnp.zeros_like(dw2t)
        if with_ctx:
            dw3at[...] = jnp.zeros_like(dw3at)
            dw3bt[...] = jnp.zeros_like(dw3bt)

    def parts(j, s):
        """raw, pre-silu z, transformed (local frame j)."""
        xv = xq[0, j, s].astype(F32)
        z = xv * cvq[0, j, s].astype(F32)[:, None] if has_cv else xv
        tr = _silu_f32(z) if silu_in else z
        return xv, z, tr

    def transform_halo(xh, cvh):
        xv = xh[0, 0, 0].astype(F32)
        if has_cv:
            xv = xv * cvh[0, 0, 0].astype(F32)[:, None]
        return _silu_f32(xv) if silu_in else xv

    def back_transform(dtr, j, s, xv, z):
        """dtr (grad wrt transformed) -> write dcv, return grad wrt raw."""
        dz = dtr * _dsilu_f32(z) if silu_in else dtr
        if has_cv:
            dcvq[0, j, s] = jnp.sum(dz * xv, axis=1).astype(dcvq.dtype)
            dz = dz * cvq[0, j, s].astype(F32)[:, None]
        return dz

    def blend_bwd(go, a, b, g):
        s_ = jax.lax.rsqrt((1 - g) ** 2 + g ** 2)
        ds = -(s_ ** 3) * (2 * g - 1)
        lerp = a + (b - a) * g
        return (go * ((1 - g) * s_), go * (g * s_),
                jnp.sum(go * ((b - a) * s_ + lerp * ds)))

    def inv_stack(da):
        """Single-width inverse 9-tap stack (ctx grads, halo epilogue):
        writes the [:, :l] prefix of the 2*Lp scratches, as mm_dtype."""
        if packed:
            dap = pltpu.bitcast(da.astype(jnp.bfloat16), jnp.int32)
            _stack_inv_into(si_scr, dap, g_scr, w, hw, masks, l)
            return pltpu.bitcast(si_scr[:, :l], jnp.bfloat16)
        _stack_inv_into(si_scr, da, g_scr, w, hw, masks, l)
        return si_scr[:, :l].astype(mm_dtype)

    def inv_stack_pair(da_c, da_n):
        """Stream-paired inverse stack (both halves' 2D-conv grads in one
        9-roll pass over the 2*Lp scratches), as mm_dtype (9*Cop, 2*Lp)."""
        if packed:
            dc = pltpu.bitcast(da_c.astype(jnp.bfloat16), jnp.int32)
            dn = pltpu.bitcast(da_n.astype(jnp.bfloat16), jnp.int32)
            _stack_inv_pair_into(si_scr, dc, dn, g_scr, w, hw, l, masks)
            return pltpu.bitcast(si_scr[...], jnp.bfloat16)
        _stack_inv_pair_into(si_scr, da_c, da_n, g_scr, w, hw, l, masks)
        return si_scr[...].astype(mm_dtype)

    def finalize_clean(j):
        t = t0 + j
        x_c, z_c, _ = parts(j, 0)
        dtr = pend_ring[t % 3]
        dxq[0, j, 0] = back_transform(dtr, j, 0, x_c, z_c).astype(dxq.dtype)
        pend_ring[t % 3] = jnp.zeros((c, l), F32)

    if with_ctx:
        ones = _ones_interior(c, l, w)
        # transformed-clean ring preloaded with frames t0-2, t0-1 (ones
        # before the clip), mirroring the forward kernel
        tr_ring[t0 % 2] = jnp.where(t0 >= 2, transform_halo(xh0, cvh0),
                                    ones)
        tr_ring[(t0 + 1) % 2] = jnp.where(t0 >= 1,
                                          transform_halo(xh1, cvh1), ones)

    def body(j, _):
        t = t0 + j
        x_n, z_n, tr_n = parts(j, 1)
        _, _, tr_c = parts(j, 0)
        go_c = gout[0, j, 0].astype(F32)
        go_n = gout[0, j, 1].astype(F32)

        if with_ctx:
            y2d_c = y2dres[0, j, 0].astype(F32)
            y2d_n = y2dres[0, j, 1].astype(F32)
            ctx = ctxres[0, j, 0].astype(F32)
            g_c, g_n = gates[0, j, 0, 0], gates[0, j, 0, 1]
            da_c, db_c, dg_c = blend_bwd(go_c, y2d_c, ctx, g_c)
            da_n, db_n, dg_n = blend_bwd(go_n, y2d_n, ctx, g_n)
            dgates[0, j, 0, 0] = dg_c
            dgates[0, j, 0, 1] = dg_n
        else:
            da_c, da_n = go_c, go_n

        # paired 2D-conv backward: ONE inverse stack + one dX dot + one dW
        # dot for both DART halves (the dW dot's 2*Lp contraction sums the
        # two halves' contributions exactly)
        si2 = inv_stack_pair(da_c, da_n)
        tr_pair = jnp.concatenate([tr_c, tr_n], axis=1).astype(mm_dtype)
        dtr2 = _dot_kc(w2m, si2)
        dw2t[...] += _dot_nn(si2, tr_pair)
        dtr_c, dtr_n = dtr2[:, :l], dtr2[:, l:]

        if with_ctx:
            tr2 = tr_ring[t % 2]
            tr1 = tr_ring[(t + 1) % 2]
            dctx = db_c + db_n
            si = inv_stack(dctx)
            dw3at[...] += _dot_nn(si, tr2.astype(mm_dtype))
            dw3bt[...] += _dot_nn(si, tr1.astype(mm_dtype))
            d2 = _dot_kc(w3am, si)
            d1 = _dot_kc(w3bm, si)

            # pushes stay within this block: contributions into the
            # previous block's frames are recomputed by that block's halo
            # epilogue (pushing here would corrupt ring slots this block
            # reuses for its own frames)
            @pl.when(j >= 2)
            def _():
                pend_ring[(t - 2) % 3] += d2

            @pl.when(j >= 1)
            def _():
                pend_ring[(t - 1) % 3] += d1

            tr_ring[t % 2] = tr_c

        dxq[0, j, 1] = back_transform(dtr_n, j, 1, x_n, z_n).astype(dxq.dtype)
        pend_ring[t % 3] += dtr_c

        # frame t-2's pending grad is now complete
        @pl.when(j >= 2)
        def _():
            finalize_clean(j - 2)
        return 0

    # ring slots must start at zero (uninitialized VMEM otherwise)
    pend_ring[...] = jnp.zeros(pend_ring.shape, F32)
    jmax = jnp.minimum(tb, t_total - t0)
    jax.lax.fori_loop(0, jmax, body, 0)

    if with_ctx:
        # halo epilogue: context-conv gradients of frames t0+tb, t0+tb+1
        # land in this block's last two frames. Only the blend backward +
        # inverse-stack dots run here; dW/dX/dgate writes for the halo
        # frames belong to the program that owns them.
        def halo_push(gh, yh, ch, gateh, jh):
            s = t0 + tb + jh

            @pl.when(s < t_total)
            def _():
                go_c = gh[0, 0, 0].astype(F32)
                go_n = gh[0, 0, 1].astype(F32)
                y2d_c = yh[0, 0, 0].astype(F32)
                y2d_n = yh[0, 0, 1].astype(F32)
                ctx = ch[0, 0, 0].astype(F32)
                g_c, g_n = gateh[0, 0, 0, 0], gateh[0, 0, 0, 1]
                _, db_c, _ = blend_bwd(go_c, y2d_c, ctx, g_c)
                _, db_n, _ = blend_bwd(go_n, y2d_n, ctx, g_n)
                si = inv_stack(db_c + db_n)
                # d2 -> local tb-2+jh; d1 -> local tb-1+jh (only in-block)
                pend_ring[(s - 2) % 3] += _dot_kc(w3am, si)
                if jh == 0:
                    pend_ring[(s - 1) % 3] += _dot_kc(w3bm, si)

        halo_push(gouth0, yrh0, crh0, gateh0, 0)
        halo_push(gouth1, yrh1, crh1, gateh1, 1)

    # finalize the block's last two frames (dynamic: block may be partial)
    @pl.when(jmax >= 2)
    def _():
        finalize_clean(jmax - 2)

    @pl.when(jmax >= 1)
    def _():
        finalize_clean(jmax - 1)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _prep(xp, w2, w3, cvec):
    c_raw = w2.shape[-2]
    cp = _cpad(c_raw)
    assert xp.shape[-2] == cp, (xp.shape, c_raw)
    co = w2.shape[-1]
    cop = max(8, co)
    w2p = _pack_w(w2)
    w3p = _pack_w(w3)
    if cop != co:
        w2p = jnp.pad(w2p, ((0, 0), (0, cop - co)))
        w3p = jnp.pad(w3p, ((0, 0), (0, cop - co)))
    cv = None
    if cvec is not None:
        cv = jnp.pad(cvec, ((0, 0), (0, 0), (0, 0), (0, cp - c_raw)))
    return w2p, w3p, cv, cp, co, cop


def _dummy_cv(xp):
    b, t = xp.shape[:2]
    return jnp.zeros((b, t, 2, xp.shape[3]), xp.dtype)


def _specs(tb, cp, cop, l):
    """Blocked input specs for the (B, ceil(T/TB)) grid: main blocks are
    indexed (b, i); the two halo views are single-frame clamped-index views
    of the SAME arrays (frames i*TB-2 and i*TB-1; clamping at 0 is safe --
    the kernel substitutes the ones frame before the clip start)."""
    vm = pltpu.VMEM
    xq = pl.BlockSpec((1, tb, 2, cp, l), lambda b, i: (b, i, 0, 0, 0),
                      memory_space=vm)
    xh0 = pl.BlockSpec((1, 1, 2, cp, l),
                       lambda b, i: (b, jnp.maximum(i * tb - 2, 0), 0, 0, 0),
                       memory_space=vm)
    xh1 = pl.BlockSpec((1, 1, 2, cp, l),
                       lambda b, i: (b, jnp.maximum(i * tb - 1, 0), 0, 0, 0),
                       memory_space=vm)
    w2 = pl.BlockSpec((9 * cp, cop), lambda b, i: (0, 0), memory_space=vm)
    w3 = pl.BlockSpec((18 * cp, cop), lambda b, i: (0, 0), memory_space=vm)
    cvq = pl.BlockSpec((1, tb, 2, cp), lambda b, i: (b, i, 0, 0),
                       memory_space=vm)
    cvh0 = pl.BlockSpec((1, 1, 2, cp),
                        lambda b, i: (b, jnp.maximum(i * tb - 2, 0), 0, 0),
                        memory_space=vm)
    cvh1 = pl.BlockSpec((1, 1, 2, cp),
                        lambda b, i: (b, jnp.maximum(i * tb - 1, 0), 0, 0),
                        memory_space=vm)
    gates = pl.BlockSpec((1, tb, 1, 2), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.SMEM)
    return xq, xh0, xh1, w2, w3, cvq, cvh0, cvh1, gates


def _vmem_params(*byte_counts):
    """Scoped-VMEM limit sized to the call (double-buffered blocks + live
    values); a blanket high limit starves XLA's scheduling of neighboring
    ops, a blanket low one OOMs the big level-0 backward.

    The 24 MiB additive margin is measured, not theoretical: the CS-scale
    dec-16x16 (Cp=768, Co=256, TB=2) forward allocates 49.88 MiB on stack
    against an 8-MiB-margin request of 49.72 MiB, and its backward
    91.58 MiB against a 16-MiB-margin request of 88.81 MiB -- both
    compile-time scoped-vmem OOMs."""
    need = int(sum(byte_counts) * 2.5) + 24 * 1024 * 1024
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(max(need, 32 * 1024 * 1024),
                             124 * 1024 * 1024))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def fused_gated_conv(xp, w2, w3, cvec, gates, h, w, silu_in, with_ctx,
                     interpret=False):
    """Fused transform+conv2d+context-conv+gate-blend (train mode).

    xp:    (B, T, 2, Cp, (H+2)*W) packed activations (pack_x)
    w2:    (3, 3, C, Co) normalized 2D weights
    w3:    (2, 3, 3, C, Co) normalized context weights (dt 0 = frame t-2)
    cvec:  (B, T, 2, C) per-frame channel scale or None
    gates: (B, T, 2) f32 gate per frame (ignored when with_ctx=False)
    Returns (B, T, 2, Cop, H*W); use unpack_out for (B, 2T, H, W, Co).
    """
    out, _, _ = _fused_fwd_impl(xp, w2, w3, cvec, gates, h, w, silu_in,
                                with_ctx, interpret)
    return out


def _fused_fwd_impl(xp, w2, w3, cvec, gates, h, w, silu_in, with_ctx,
                    interpret):
    b, t, _, cp, l = xp.shape
    hw = h * w
    has_cv = cvec is not None
    w2p, w3p, cv, _, co, cop = _prep(xp, w2, w3, cvec)
    if cv is None:
        cv = _dummy_cv(xp)
    mm_dtype = xp.dtype if xp.dtype == jnp.bfloat16 else F32
    packed = (mm_dtype == jnp.bfloat16 and cp % 2 == 0 and
              os.environ.get("AD_TPU_PACKED_ROLLS", "1") != "0")
    tb = _pick_tb(t, h, w, cp, cop)
    nt = -(-t // tb)
    xq, xh0, xh1, w2s, w3s, cvq, cvh0, cvh1, gsp = _specs(tb, cp, cop, l)
    kernel = functools.partial(
        _fwd_kernel, tb=tb, t_total=t, w=w, hw=hw, silu_in=silu_in,
        has_cv=has_cv, with_ctx=with_ctx, mm_dtype=mm_dtype, packed=packed)
    osp = pl.BlockSpec((1, tb, 2, cop, hw), lambda b_, i: (b_, i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    osh = jax.ShapeDtypeStruct((b, t, 2, cop, hw), xp.dtype)
    if with_ctx:
        csp = pl.BlockSpec((1, tb, 1, cop, hw),
                           lambda b_, i: (b_, i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
        csh = jax.ShapeDtypeStruct((b, t, 1, cop, hw), xp.dtype)
        out_specs, out_shape = [osp, osp, csp], [osh, osh, csh]
    else:
        out_specs, out_shape = [osp], [osh]
    gf = gates.astype(F32)[:, :, None]
    res = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[xq, xh0, xh1, w2s, w3s, cvq, cvh0, cvh1, gsp],
        out_specs=out_specs,
        out_shape=out_shape,
        # a_scr (stream-paired: 2*hw lanes) + (ctx only) the 2-slot
        # stacked-tap ring (clean half only, hw lanes). With the bf16 body
        # (the training configuration) forward scratch (36*cp*hw*2) stays
        # below the backward's, so _pick_tb's backward footprint remains
        # the binding VMEM model. packed: same bytes, half the sublanes,
        # i32 (see _fwd_kernel).
        scratch_shapes=([pltpu.VMEM((9 * cp // 2, 2 * hw), jnp.int32)] + (
            [pltpu.VMEM((2, 9 * cp // 2, hw), jnp.int32)] if with_ctx
            else []) if packed else
            [pltpu.VMEM((9 * cp, 2 * hw), mm_dtype)] + (
            [pltpu.VMEM((2, 9 * cp, hw), mm_dtype)] if with_ctx else [])),
        compiler_params=_vmem_params(
            tb * 2 * cp * l * 2 * 2, 2 * 2 * cp * l * 2,
            tb * 2 * cop * hw * 2 * (3 if with_ctx else 1),
            2 * 9 * cp * hw * 2,
            (2 * 9 * cp * hw * 2) if with_ctx else 0),
        interpret=interpret,
    )(xp, xp, xp, w2p, w3p, cv, cv, cv, gf)
    if with_ctx:
        return res[0], res[1], res[2]
    return res[0], None, None


def _fused_fwd(xp, w2, w3, cvec, gates, h, w, silu_in, with_ctx, interpret):
    out, y2d_res, ctx_res = _fused_fwd_impl(xp, w2, w3, cvec, gates, h, w,
                                            silu_in, with_ctx, interpret)
    return out, (xp, w2, w3, cvec, gates, y2d_res, ctx_res)


def _pack_wt(wk: jax.Array, cop: int) -> jax.Array:
    """(taps..., C, Co) -> transposed packing (ntaps*Cop, Cp): row
    k*Cop + co, column c. Used by the backward kernel so neither the
    inverse-stack dots nor the dW accumulators need an in-kernel
    transpose."""
    *taps, c, co = wk.shape
    n = 1
    for tdim in taps:
        n *= tdim
    wk = wk.reshape(n, c, co).transpose(0, 2, 1)   # (n, co, c)
    wk = jnp.pad(wk, ((0, 0), (0, cop - co), (0, _cpad(c) - c)))
    return wk.reshape(n * cop, _cpad(c))


def _fused_bwd(h, w, silu_in, with_ctx, interpret, res, gout):
    xp, w2, w3, cvec, gates, y2d_res, ctx_res = res
    b, t, _, cp, l = xp.shape
    hw = h * w
    has_cv = cvec is not None
    c_raw = w2.shape[-2]
    co = w2.shape[-1]
    cop = max(8, co)
    w2t = _pack_wt(w2, cop)
    w3t = _pack_wt(w3, cop)
    w3at, w3bt = w3t[:9 * cop], w3t[9 * cop:]
    cv = (jnp.pad(cvec, ((0, 0), (0, 0), (0, 0), (0, cp - c_raw)))
          if has_cv else _dummy_cv(xp))
    mm_dtype = xp.dtype if xp.dtype == jnp.bfloat16 else F32
    packed = (mm_dtype == jnp.bfloat16 and cop % 2 == 0 and
              os.environ.get("AD_TPU_PACKED_ROLLS", "1") != "0")
    tb = _pick_tb(t, h, w, cp, cop)
    nt = -(-t // tb)
    vm = pltpu.VMEM
    (xq, xh0, xh1, _, _, cvq, cvh0, cvh1, gsp) = _specs(tb, cp, cop, l)
    wts = pl.BlockSpec((9 * cop, cp), lambda b_, i: (0, 0), memory_space=vm)
    goutsp = pl.BlockSpec((1, tb, 2, cop, hw),
                          lambda b_, i: (b_, i, 0, 0, 0), memory_space=vm)
    ctxsp = pl.BlockSpec((1, tb, 1, cop, hw),
                         lambda b_, i: (b_, i, 0, 0, 0), memory_space=vm)

    # forward-looking single-frame halo views (frames i*TB+TB, i*TB+TB+1,
    # clamped into range; the kernel predicates on s < T)
    def _fh(jh, tdim):
        def idx(b_, i):
            return ((b_, jnp.minimum((i + 1) * tb + jh, t - 1)) +
                    (0,) * (tdim - 2))
        return idx

    gouth = [pl.BlockSpec((1, 1, 2, cop, hw), _fh(jh, 5), memory_space=vm)
             for jh in (0, 1)]
    ctxh = [pl.BlockSpec((1, 1, 1, cop, hw), _fh(jh, 5), memory_space=vm)
            for jh in (0, 1)]
    gateh = [pl.BlockSpec((1, 1, 1, 2), _fh(jh, 4),
                          memory_space=pltpu.SMEM) for jh in (0, 1)]
    if y2d_res is None:
        y2d_res = gout      # unread placeholder operand (no-ctx path)
        ctx_res = jnp.zeros((b, t, 1, cop, hw), xp.dtype)
    out_specs = [
        pl.BlockSpec((1, tb, 2, cp, l), lambda b_, i: (b_, i, 0, 0, 0),
                     memory_space=vm),                           # dxq
        wts,                                                     # dw2t
        pl.BlockSpec((9 * cop, cp), lambda b_, i: (0, 0),
                     memory_space=vm),                           # dw3at
        pl.BlockSpec((9 * cop, cp), lambda b_, i: (0, 0),
                     memory_space=vm),                           # dw3bt
        pl.BlockSpec((1, tb, 2, cp), lambda b_, i: (b_, i, 0, 0),
                     memory_space=vm),                           # dcvq
        pl.BlockSpec((1, tb, 1, 2), lambda b_, i: (b_, i, 0, 0),
                     memory_space=pltpu.SMEM),                   # dgates
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((b, t, 2, cp, l), xp.dtype),
        jax.ShapeDtypeStruct((9 * cop, cp), F32),
        jax.ShapeDtypeStruct((9 * cop, cp), F32),
        jax.ShapeDtypeStruct((9 * cop, cp), F32),
        jax.ShapeDtypeStruct((b, t, 2, cp), F32),
        jax.ShapeDtypeStruct((b, t, 1, 2), F32),
    ]
    kernel = functools.partial(
        _bwd_kernel, tb=tb, t_total=t, w=w, hw=hw, silu_in=silu_in,
        has_cv=has_cv, with_ctx=with_ctx, mm_dtype=mm_dtype, packed=packed)
    gf = gates.astype(F32)[:, :, None]
    if packed:
        # si/g scratch in packed-i32 (half sublanes, bf16 values -- see
        # _bwd_kernel); 2*Lp wide for the stream-paired inverse stack (the
        # ctx/halo single-width variant uses the [:, :l] prefix); pend_ring
        # stays F32 (gradient ACCUMULATION).
        si_g_scr = [pltpu.VMEM((9 * cop // 2, 2 * l), jnp.int32),
                    pltpu.VMEM((cop // 2, 2 * l), jnp.int32)]
    else:
        si_g_scr = [pltpu.VMEM((9 * cop, 2 * l), F32),
                    pltpu.VMEM((cop, 2 * l), F32)]
    dxq, dw2t, dw3at_o, dw3bt_o, dcvq, dgates = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[xq, xh0, xh1, wts, wts, wts, cvq, cvh0, cvh1, gsp,
                  goutsp, goutsp, ctxsp, gouth[0], gouth[1],
                  gouth[0], gouth[1], ctxh[0], ctxh[1],
                  gateh[0], gateh[1]],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=si_g_scr + [
            pltpu.VMEM((3, cp, l), F32),
            pltpu.VMEM((2, cp, l), F32),
        ],
        compiler_params=_vmem_params(
            tb * 2 * cp * l * 2 * 3, 2 * 2 * cp * l * 2,
            tb * 2 * cop * hw * 2 * 3, 5 * cop * hw * 2,
            2 * 9 * cop * l * 4, 5 * cp * l * 4, 2 * 9 * cop * cp * 4),
        interpret=interpret,
    )(xp, xp, xp, w2t, w3at, w3bt, cv, cv, cv, gf,
      gout, y2d_res, ctx_res, gout, gout, y2d_res, y2d_res,
      ctx_res, ctx_res, gf, gf)

    def unpack_dwt(dwt, taps):
        n = 1
        for td in taps:
            n *= td
        d = dwt.reshape((n, cop, cp))[:, :co, :c_raw]
        return d.transpose(0, 2, 1).reshape(taps + (c_raw, co))

    dx = dxq.astype(xp.dtype)
    dw2 = unpack_dwt(dw2t, (3, 3)).astype(w2.dtype)
    if with_ctx:
        dw3 = jnp.concatenate(
            [unpack_dwt(dw3at_o, (9,)), unpack_dwt(dw3bt_o, (9,))],
            axis=0).reshape(w3.shape).astype(w3.dtype)
    else:
        dw3 = jnp.zeros_like(w3)
    dcv = dcvq[..., :c_raw].astype(cvec.dtype) if has_cv else None
    dgates = (dgates[:, :, 0].astype(gates.dtype) if with_ctx
              else jnp.zeros_like(gates))
    return (dx, dw2, dw3, dcv, dgates)


fused_gated_conv.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Pure-JAX reference of the same packed function (tests / oracle)
# ---------------------------------------------------------------------------

def fused_gated_conv_reference(xp, w2, w3, cvec, gates, h, w,
                               silu_in, with_ctx):
    """Dense XLA implementation of fused_gated_conv's exact semantics
    (including the C/Co zero padding), used as the correctness oracle."""
    b, t, _, cp, l = xp.shape
    hw = h * w
    w2p, w3p, cv, _, co, cop = _prep(xp, w2, w3, cvec)
    x = xp.astype(F32)
    if cv is not None:
        x = x * cv.astype(F32)[..., None]
    if silu_in:
        x = _silu_f32(x)

    def stack(frame):  # (..., Cp, Lp) -> (..., 9Cp, HW)
        rows = []
        for dy, dx in _TAPS:
            off = (1 + dy) * w + dx
            sl = jnp.roll(frame, -off, axis=-1)[..., :hw]
            col = jnp.arange(hw) % w
            if dx > 0:
                sl = jnp.where(col < w - 1, sl, 0)
            elif dx < 0:
                sl = jnp.where(col > 0, sl, 0)
            rows.append(sl)
        return jnp.concatenate(rows, axis=-2)

    a = stack(x)  # (b, t, 2, 9Cp, HW)
    y2d = jnp.einsum("btsky,ko->btsoy", a, w2p.astype(F32))
    if not with_ctx:
        return y2d.astype(xp.dtype)

    clean = x[:, :, 0]
    lane = jnp.arange(l)
    interior = ((lane // w >= 1) & (lane // w < l // w - 1)).astype(F32)
    ones = jnp.broadcast_to(interior, (b, 2, cp, l))
    hist = jnp.concatenate([ones, clean[:, :-1]], axis=1)  # frame j = t=j-2
    ctx_in = jnp.stack([hist[:, :t], hist[:, 1:t + 1]], axis=2)  # (b,t,2,c,l)
    ctx_stack = stack(ctx_in).reshape(b, t, 2 * 9 * cp, hw)
    ctx = jnp.einsum("btky,ko->btoy", ctx_stack, w3p.astype(F32))

    g = gates.astype(F32)[..., None, None]
    s = jax.lax.rsqrt((1 - g) ** 2 + g ** 2)
    out = (y2d + (ctx[:, :, None] - y2d) * g) * s
    return out.astype(xp.dtype)


# ---------------------------------------------------------------------------
# Decode kernel: one program per batch row fuses an ENTIRE attention-free
# Block for the T=1 cached-decode step -- skip conv, pixel norm (enc),
# silu transform, BOTH gated causal convs (context read from the 2-frame
# activation ring caches), the noise-embedding modulation between them,
# the residual mp_sum and the activation clip. The batch-1 autoregressive
# rollout is kernel-launch-bound (hundreds of tiny HLOs per NFE); this
# collapses ~10+ device ops per Block into one.
#
# Cache semantics match the XLA eval path exactly (models/layers.py
# MPCausalConv3d eval): each conv's cache holds the last kt-1=2 TRANSFORMED
# input frames; frame index 0 is t-2 (pairs with w3[0]), index 1 is t-1.
# The kernel also emits this step's transformed inputs t0/t1 so the caller
# can advance the rings on update_cache steps.
# ---------------------------------------------------------------------------

def _decode_kernel(xq, a0q, a1q, wskq, w20q, w30aq, w30bq, w21q, w31aq,
                   w31bq, cvq, gates, o, t0o, t1o, s_scr, wide_scr, *,
                   w: int, hw: int, c0: int, co: int, flavor: str,
                   has_skip: bool, with_ctx: bool, res_t: float,
                   clip: float, mm_dtype):
    l = xq.shape[-1]
    masks = {c0: _make_masks(c0, hw, w)}
    if co not in masks:
        masks[co] = _make_masks(co, hw, w)

    def stack_dot(frame_cl, wt, c_rows):
        """stack 9 shifted taps of (C, L) into scratch rows, then (Co, HW)."""
        _stack_into(s_scr, 0, frame_cl, w, hw, masks[c_rows])
        return _dot_kc(wt[...].astype(mm_dtype),
                       s_scr[:9 * c_rows, :].astype(mm_dtype))

    x = xq[0].astype(F32)
    if flavor == "enc":
        h = _dot_kc(wskq[...].astype(F32), x) if has_skip else x
        # pixel norm over channels (ops/numerics.normalize, axis=channel)
        n = jnp.sqrt(jnp.sum(h * h, axis=0, keepdims=True) + 1e-24)
        h = h / (1e-4 + n * (c0 ** -0.5))
        res = h
    else:
        h = x
        res = _dot_kc(wskq[...].astype(F32), x) if has_skip else x

    g0 = gates[0, 0]
    g1 = gates[0, 1]
    t0 = _silu_f32(h)                                   # (C0, L)
    y = stack_dot(t0, w20q, c0)                         # (Co, HW)
    if with_ctx:
        ctx0 = (stack_dot(a0q[0, 0].astype(F32), w30aq, c0)
                + stack_dot(a0q[0, 1].astype(F32), w30bq, c0))
        y = _blend(y, ctx0, g0)

    cv = cvq[0].astype(F32)                             # (Co,)
    t1 = _silu_f32(y * cv[:, None])                     # (Co, HW)
    # widen to (Co, L): zero H-pad rows so the tap rolls stay correct
    wide_scr[...] = jnp.zeros(wide_scr.shape, F32)
    wide_scr[:, w:w + hw] = t1
    y = stack_dot(wide_scr[...], w21q, co)
    if with_ctx:
        ctx1 = (stack_dot(a1q[0, 0].astype(F32), w31aq, co)
                + stack_dot(a1q[0, 1].astype(F32), w31bq, co))
        y = _blend(y, ctx1, g1)

    out = _blend_const(res[:, w:w + hw], y, res_t)
    if clip is not None:
        out = jnp.clip(out, -clip, clip)
    o[0] = out.astype(o.dtype)
    t0o[0] = t0[:, w:w + hw].astype(t0o.dtype)
    t1o[0] = t1.astype(t1o.dtype)


def _blend_const(a, b, t: float):
    """mp_sum with a static t (reference edm2/utils.py:118-123)."""
    s = ((1 - t) ** 2 + t ** 2) ** -0.5
    return (a + (b - a) * t) * s


def fused_decode_block(x, a0, a1, wsk, w20, w30, w21, w31, cv, gates, h, w,
                       flavor, res_t, clip, with_ctx, interpret=False):
    """Fused eval/decode Block step (T=1).

    x:    (B, 1, H, W, Cin) raw Block input (post-resample)
    a0:   (B, 2, H, W, C0) conv_res0 activation cache (transformed frames
          t-2, t-1); C0 = out-channels for enc flavor, Cin for dec
    a1:   (B, 2, H, W, Co) conv_res1 activation cache
    wsk:  (Cin, Co) 1x1 skip weight or None
    w20/w21: (3, 3, Cin0/Co, Co) normalized 2D weights
    w30/w31: (2, 3, 3, Cin0/Co, Co) context weights (dt 0 = frame t-2)
    cv:   (B, Co) noise-embedding modulation for conv_res1 (y*c)
    gates: (B, 2) f32 [conv0 gate, conv1 gate]
    Returns (y (B, 1, H, W, Co), t0 (B, 1, H, W, C0), t1 (B, 1, H, W, Co)):
    the Block output and this step's transformed conv inputs for the
    caller's cache-ring update.
    """
    b = x.shape[0]
    c_in = x.shape[-1]
    c0 = w20.shape[-2]
    co = w20.shape[-1]
    assert c_in % 8 == 0 and c0 % 8 == 0 and co % 8 == 0, (c_in, c0, co)
    hw = h * w
    l = (h + 2) * w

    def pack1(v, c):  # (B, T, H, W, C) -> (B, T, C, L) with H padding
        t = v.shape[1]
        vp = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))
        vp = vp.transpose(0, 1, 4, 2, 3)
        return vp.reshape(b, t, c, l)

    xq = pack1(x, c_in).reshape(b, c_in, l)
    a0q = (pack1(a0, c0) if with_ctx
           else jnp.zeros((b, 2, c0, l), x.dtype))
    a1q = (pack1(a1, co) if with_ctx
           else jnp.zeros((b, 2, co, l), x.dtype))
    wskq = (wsk if wsk is not None
            else jnp.zeros((c_in, co), x.dtype)).astype(x.dtype)
    w20q = _pack_w(w20)
    w21q = _pack_w(w21)
    if with_ctx:
        w30q, w31q = _pack_w(w30), _pack_w(w31)
    else:
        w30q = jnp.zeros((18 * c0, co), x.dtype)
        w31q = jnp.zeros((18 * co, co), x.dtype)
    w30a, w30b = w30q[:9 * c0], w30q[9 * c0:]
    w31a, w31b = w31q[:9 * co], w31q[9 * co:]

    vm = pltpu.VMEM
    cmax = max(c0, co)
    mm_dtype = x.dtype if x.dtype == jnp.bfloat16 else F32
    kernel = functools.partial(
        _decode_kernel, w=w, hw=hw, c0=c0, co=co, flavor=flavor,
        has_skip=wsk is not None, with_ctx=with_ctx, res_t=res_t, clip=clip,
        mm_dtype=mm_dtype)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape,
                            lambda i, _nd=nd: (i,) + (0,) * _nd,
                            memory_space=vm)

    wspec = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                   memory_space=vm)
    o, t0, t1 = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[bspec((c_in, l)), bspec((2, c0, l)), bspec((2, co, l)),
                  wspec((c_in, co)), wspec((9 * c0, co)),
                  wspec((9 * c0, co)), wspec((9 * c0, co)),
                  wspec((9 * co, co)), wspec((9 * co, co)),
                  wspec((9 * co, co)), bspec((co,)),
                  pl.BlockSpec((1, 2), lambda i: (i, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=[bspec((co, hw)), bspec((c0, hw)), bspec((co, hw))],
        out_shape=[jax.ShapeDtypeStruct((b, co, hw), x.dtype),
                   jax.ShapeDtypeStruct((b, c0, hw), x.dtype),
                   jax.ShapeDtypeStruct((b, co, hw), x.dtype)],
        scratch_shapes=[pltpu.VMEM((9 * cmax, hw), F32),
                        pltpu.VMEM((co, l), F32)],
        compiler_params=_vmem_params(
            (c_in + 4 * cmax) * l * 2, 8 * 27 * cmax * cmax * 2,
            9 * cmax * hw * 4, co * l * 4, 3 * cmax * hw * 2),
        interpret=interpret,
    )(xq, a0q, a1q, wskq, w20q,
      w30a, w30b, w21q, w31a, w31b, cv.astype(x.dtype),
      gates.astype(F32))

    def unpack1(v, c):  # (B, C, HW) -> (B, 1, H, W, C)
        return v.reshape(b, c, h, w).transpose(0, 2, 3, 1)[:, None]

    return unpack1(o, co), unpack1(t0, c0), unpack1(t1, co)
