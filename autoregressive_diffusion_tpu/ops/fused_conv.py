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

Grid design: ONE program per batch element, with a jax.lax.fori_loop over
the T frame pairs and ring-indexed scratch buffers. Keeping the whole time
axis in-program makes the causal context local: transformed clean frames
are stacked once into a ring scratch and reused by the frames t+1 / t+2
that convolve over them, the ones-frame substitution at t < 2 becomes a
ring slot preloaded with the ones frame, and in the backward kernel every
context gradient lands in this program's own dX block (no cross-program
reassembly).

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


def _bwd_vmem_bytes(t: int, h: int, w: int, cp: int, cop: int) -> int:
    """Estimated VMEM footprint of the (bigger) backward kernel for one grid
    program: double-buffered in/out blocks + scratch. The grid is (b,) with
    whole (T, 2, C, L) slabs per program, so the footprint scales with
    T*C*H*W and large models (CS: 256ch at 32x32, T=16) overflow the chip's
    128M VMEM -- those shapes must take the unfused XLA path."""
    l, hw = (h + 2) * w, h * w
    bf, f32, dbuf = 2, 4, 2
    inb = (t * 2 * cp * l * bf          # xp block
           + 2 * t * 2 * cop * hw * bf  # gout + y2d residual
           + t * cop * hw * bf          # ctx residual
           + 3 * 9 * cop * cp * bf)     # w2t / w3at / w3bt
    outb = (t * 2 * cp * l * bf         # dx
            + 3 * 9 * cop * cp * f32    # dw2t / dw3at / dw3bt
            + t * 2 * cp * f32)         # dcv
    scratch = (9 * cop * l + cop * l + 3 * cp * l) * f32
    return dbuf * (inb + outb) + scratch


def fused_supported(mode: str, h: int, w: int, t_total: int,
                    cin: int = 0, cout: int = 0):
    """Gate for the fused train-mode conv path.

    Returns (use_fused, interpret). Env AD_TPU_FUSED_CONV: '0' disables,
    'interpret' forces the kernel in interpreter mode (CPU tests), unset/'1'
    enables on TPU for tileable shapes. Shapes whose backward kernel would
    not fit VMEM (see _bwd_vmem_bytes; budget AD_TPU_FUSED_VMEM_MB, default
    96) fall back to the XLA path -- with cin/cout unknown (0) the check is
    skipped for backward compatibility.
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
        budget = int(os.environ.get("AD_TPU_FUSED_VMEM_MB", "96")) << 20
        if _bwd_vmem_bytes(t_total // 2, h, w, cp, cop) > budget:
            return False, False
    if env == "interpret":
        return True, True
    on_tpu = jax.default_backend() in ("tpu", "axon")
    return on_tpu, False


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
# Forward kernel: grid (B,), static loop over T
# ---------------------------------------------------------------------------

def _fwd_kernel(xq, w2p, w3p, cvq, gates, out, *rest,
                t_frames: int, w: int, hw: int, silu_in: bool,
                has_cv: bool, with_ctx: bool, mm_dtype):
    if with_ctx:
        y2d_res, ctx_res, a_scr, tr_ring = rest
    else:
        a_scr, tr_ring = rest
    c = xq.shape[-2]
    l = xq.shape[-1]
    masks = _make_masks(c, hw, w)
    w2 = w2p[...].astype(mm_dtype)
    if with_ctx:
        w3a = w3p[:9 * c].astype(mm_dtype)
        w3b = w3p[9 * c:].astype(mm_dtype)
        ones = _ones_interior(c, l, w)

    def transform(t, s):
        xv = xq[0, t, s].astype(F32)
        if has_cv:
            xv = xv * cvq[0, t, s].astype(F32)[:, None]
        return _silu_f32(xv) if silu_in else xv

    def conv2d(tr):
        _stack_into(a_scr, 0, tr, w, hw, masks)
        return _dot_kc(w2, a_scr[...])

    def body(t, _):
        tr_c = transform(t, 0)
        y2d_c = conv2d(tr_c)
        y2d_n = conv2d(transform(t, 1))
        if with_ctx:
            # transformed clean frames t-1, t-2 come from the 2-slot ring
            # (written at their own iteration); ones before the clip.
            tr2 = jnp.where(t >= 2, tr_ring[t % 2], ones)
            tr1 = jnp.where(t >= 1, tr_ring[(t + 1) % 2], ones)
            _stack_into(a_scr, 0, tr2, w, hw, masks)
            ctx = _dot_kc(w3a, a_scr[...])
            _stack_into(a_scr, 0, tr1, w, hw, masks)
            ctx = ctx + _dot_kc(w3b, a_scr[...])
            g_c = gates[0, t, 0, 0]
            g_n = gates[0, t, 0, 1]
            out[0, t, 0] = _blend(y2d_c, ctx, g_c).astype(out.dtype)
            out[0, t, 1] = _blend(y2d_n, ctx, g_n).astype(out.dtype)
            # residuals for the backward pass (blend partials need them)
            y2d_res[0, t, 0] = y2d_c.astype(y2d_res.dtype)
            y2d_res[0, t, 1] = y2d_n.astype(y2d_res.dtype)
            ctx_res[0, t, 0] = ctx.astype(ctx_res.dtype)
            tr_ring[t % 2] = tr_c
        else:
            out[0, t, 0] = y2d_c.astype(out.dtype)
            out[0, t, 1] = y2d_n.astype(out.dtype)
        return 0

    jax.lax.fori_loop(0, t_frames, body, 0)


# ---------------------------------------------------------------------------
# Backward kernel: grid (B,), static loop over T
# ---------------------------------------------------------------------------

def _stack_inv_into(scr, da, gscr, w: int, hw: int, masks):
    """Inverse-shifted stack of an output gradient: scr row-block k holds
    wide_k[m] = masked_k(da)[m - off_k] (zeros outside the HW window; the
    only wrap positions land on discarded H-pad lanes). Rolls run on the
    (Co, Lp) f32 widen scratch -- independent of the (possibly much larger)
    input channel count, which is what makes this formulation cheaper than
    un-stacking a (9C, HW) gradient."""
    co = da.shape[0]
    l = gscr.shape[1]
    for k, (dy, dx) in enumerate(_TAPS):
        off = (1 + dy) * w + dx
        g = da
        if dx != 0:
            g = jnp.where(masks[dx], g, 0)
        gscr[:, :hw] = g
        gscr[:, hw:] = jnp.zeros((co, l - hw), gscr.dtype)
        scr[k * co:(k + 1) * co, :] = _roll(gscr[...], -off)


def _bwd_kernel(xq, w2t, w3at, w3bt, cvq, gates, gout, y2dres, ctxres,
                dxq, dw2t, dw3at, dw3bt, dcvq, dgates,
                si_scr, g_scr, pend_ring,
                *, t_frames: int, w: int, hw: int, silu_in: bool,
                has_cv: bool, with_ctx: bool, mm_dtype):
    b_i = pl.program_id(0)
    c = xq.shape[-2]
    l = xq.shape[-1]
    cop = gout.shape[-2]
    masks = _make_masks(cop, hw, w)
    w2m = w2t[...].astype(mm_dtype)
    if with_ctx:
        w3am = w3at[...].astype(mm_dtype)
        w3bm = w3bt[...].astype(mm_dtype)
        ones = _ones_interior(c, l, w)

    @pl.when(b_i == 0)
    def _():
        dw2t[...] = jnp.zeros_like(dw2t)
        if with_ctx:
            dw3at[...] = jnp.zeros_like(dw3at)
            dw3bt[...] = jnp.zeros_like(dw3bt)

    def parts(t, s):
        """raw, pre-silu z, transformed."""
        xv = xq[0, t, s].astype(F32)
        z = xv * cvq[0, t, s].astype(F32)[:, None] if has_cv else xv
        tr = _silu_f32(z) if silu_in else z
        return xv, z, tr

    def back_transform(dtr, t, s, xv, z):
        """dtr (grad wrt transformed) -> write dcv, return grad wrt raw."""
        dz = dtr * _dsilu_f32(z) if silu_in else dtr
        if has_cv:
            dcvq[0, t, s] = jnp.sum(dz * xv, axis=1).astype(dcvq.dtype)
            dz = dz * cvq[0, t, s].astype(F32)[:, None]
        return dz

    def blend_bwd(go, a, b, g):
        s_ = jax.lax.rsqrt((1 - g) ** 2 + g ** 2)
        ds = -(s_ ** 3) * (2 * g - 1)
        lerp = a + (b - a) * g
        return (go * ((1 - g) * s_), go * (g * s_),
                jnp.sum(go * ((b - a) * s_ + lerp * ds)))

    def branch(da, tr):
        """stack_inv(da) -> (dtr for this conv input, dW accum term)."""
        _stack_inv_into(si_scr, da, g_scr, w, hw, masks)
        si = si_scr[...].astype(mm_dtype)
        dtr = _dot_kc(w2m, si)
        dw = _dot_nn(si, tr.astype(mm_dtype))
        return dtr, dw

    def finalize_clean(t):
        x_c, z_c, _ = parts(t, 0)
        dtr = pend_ring[t % 3]
        dxq[0, t, 0] = back_transform(dtr, t, 0, x_c, z_c).astype(dxq.dtype)
        pend_ring[t % 3] = jnp.zeros((c, l), F32)

    def body(t, _):
        x_n, z_n, tr_n = parts(t, 1)
        _, _, tr_c = parts(t, 0)
        go_c = gout[0, t, 0].astype(F32)
        go_n = gout[0, t, 1].astype(F32)

        if with_ctx:
            y2d_c = y2dres[0, t, 0].astype(F32)
            y2d_n = y2dres[0, t, 1].astype(F32)
            ctx = ctxres[0, t, 0].astype(F32)
            g_c, g_n = gates[0, t, 0, 0], gates[0, t, 0, 1]
            da_c, db_c, dg_c = blend_bwd(go_c, y2d_c, ctx, g_c)
            da_n, db_n, dg_n = blend_bwd(go_n, y2d_n, ctx, g_n)
            dgates[0, t, 0, 0] = dg_c
            dgates[0, t, 0, 1] = dg_n
        else:
            da_c, da_n = go_c, go_n

        dtr_c, dw_c = branch(da_c, tr_c)
        dtr_n, dw_n = branch(da_n, tr_n)
        dw2t[...] += dw_c + dw_n

        if with_ctx:
            _, _, p2 = parts(jnp.maximum(t - 2, 0), 0)
            _, _, p1 = parts(jnp.maximum(t - 1, 0), 0)
            tr2 = jnp.where(t >= 2, p2, ones)
            tr1 = jnp.where(t >= 1, p1, ones)
            dctx = db_c + db_n
            _stack_inv_into(si_scr, dctx, g_scr, w, hw, masks)
            si = si_scr[...].astype(mm_dtype)
            dw3at[...] += _dot_nn(si, tr2.astype(mm_dtype))
            dw3bt[...] += _dot_nn(si, tr1.astype(mm_dtype))
            d2 = _dot_kc(w3am, si)
            d1 = _dot_kc(w3bm, si)

            @pl.when(t >= 2)
            def _():
                pend_ring[(t - 2) % 3] += d2

            @pl.when(t >= 1)
            def _():
                pend_ring[(t - 1) % 3] += d1

        dxq[0, t, 1] = back_transform(dtr_n, t, 1, x_n, z_n).astype(dxq.dtype)
        pend_ring[t % 3] += dtr_c

        # frame t-2's pending grad is now complete
        @pl.when(t >= 2)
        def _():
            finalize_clean(t - 2)
        return 0

    # ring slots must start at zero (uninitialized VMEM otherwise)
    pend_ring[...] = jnp.zeros(pend_ring.shape, F32)
    jax.lax.fori_loop(0, t_frames, body, 0)
    for tt in range(max(t_frames - 2, 0), t_frames):
        finalize_clean(tt)


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


def _specs(t, cp, cop, l):
    vm = pltpu.VMEM
    xq = pl.BlockSpec((1, t, 2, cp, l), lambda b: (b, 0, 0, 0, 0),
                      memory_space=vm)
    w2 = pl.BlockSpec((9 * cp, cop), lambda b: (0, 0), memory_space=vm)
    w3 = pl.BlockSpec((18 * cp, cop), lambda b: (0, 0), memory_space=vm)
    cvq = pl.BlockSpec((1, t, 2, cp), lambda b: (b, 0, 0, 0),
                       memory_space=vm)
    gates = pl.BlockSpec((1, t, 1, 2), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.SMEM)
    return xq, w2, w3, cvq, gates


def _vmem_params(*byte_counts):
    """Scoped-VMEM limit sized to the call (double-buffered blocks + live
    values); a blanket high limit starves XLA's scheduling of neighboring
    ops, a blanket low one OOMs the big level-0 backward."""
    need = int(sum(byte_counts) * 2.5) + 8 * 1024 * 1024
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
    xq, w2s, w3s, cvq, gsp = _specs(t, cp, cop, l)
    kernel = functools.partial(
        _fwd_kernel, t_frames=t, w=w, hw=hw, silu_in=silu_in,
        has_cv=has_cv, with_ctx=with_ctx, mm_dtype=mm_dtype)
    osp = pl.BlockSpec((1, t, 2, cop, hw), lambda b_: (b_, 0, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    osh = jax.ShapeDtypeStruct((b, t, 2, cop, hw), xp.dtype)
    if with_ctx:
        csp = pl.BlockSpec((1, t, 1, cop, hw), lambda b_: (b_, 0, 0, 0, 0),
                           memory_space=pltpu.VMEM)
        csh = jax.ShapeDtypeStruct((b, t, 1, cop, hw), xp.dtype)
        out_specs, out_shape = [osp, osp, csp], [osh, osh, csh]
    else:
        out_specs, out_shape = [osp], [osh]
    res = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[xq, w2s, w3s, cvq, gsp],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((9 * cp, hw), mm_dtype),
                        pltpu.VMEM((2, cp, l), F32)],
        compiler_params=_vmem_params(
            t * 2 * cp * l * 2 * 2, t * 2 * cop * hw * 2 * (3 if with_ctx
                                                            else 1),
            9 * cp * hw * 2, 2 * cp * l * 4),
        interpret=interpret,
    )(xp, w2p, w3p, cv, gates.astype(F32)[:, :, None])
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
    vm = pltpu.VMEM
    xq = pl.BlockSpec((1, t, 2, cp, l), lambda b_: (b_, 0, 0, 0, 0),
                      memory_space=vm)
    wts = pl.BlockSpec((9 * cop, cp), lambda b_: (0, 0), memory_space=vm)
    cvq = pl.BlockSpec((1, t, 2, cp), lambda b_: (b_, 0, 0, 0),
                       memory_space=vm)
    gsp = pl.BlockSpec((1, t, 1, 2), lambda b_: (b_, 0, 0, 0),
                       memory_space=pltpu.SMEM)
    goutsp = pl.BlockSpec((1, t, 2, cop, hw), lambda b_: (b_, 0, 0, 0, 0),
                          memory_space=vm)
    ctxsp = pl.BlockSpec((1, t, 1, cop, hw), lambda b_: (b_, 0, 0, 0, 0),
                         memory_space=vm)
    if y2d_res is None:
        y2d_res = gout      # unread placeholder operand (no-ctx path)
        ctx_res = jnp.zeros((b, t, 1, cop, hw), xp.dtype)
    out_specs = [
        pl.BlockSpec((1, t, 2, cp, l), lambda b_: (b_, 0, 0, 0, 0),
                     memory_space=vm),                           # dxq
        wts,                                                     # dw2t
        pl.BlockSpec((9 * cop, cp), lambda b_: (0, 0),
                     memory_space=vm),                           # dw3at
        pl.BlockSpec((9 * cop, cp), lambda b_: (0, 0),
                     memory_space=vm),                           # dw3bt
        pl.BlockSpec((1, t, 2, cp), lambda b_: (b_, 0, 0, 0),
                     memory_space=vm),                           # dcvq
        pl.BlockSpec((1, t, 1, 2), lambda b_: (b_, 0, 0, 0),
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
        _bwd_kernel, t_frames=t, w=w, hw=hw, silu_in=silu_in,
        has_cv=has_cv, with_ctx=with_ctx, mm_dtype=mm_dtype)
    dxq, dw2t, dw3at_o, dw3bt_o, dcvq, dgates = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[xq, wts, wts, wts, cvq, gsp, goutsp, goutsp, ctxsp],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((9 * cop, l), F32),
            pltpu.VMEM((cop, l), F32),
            pltpu.VMEM((3, cp, l), F32),
        ],
        compiler_params=_vmem_params(
            t * 2 * cp * l * 2 * 3, t * 2 * cop * hw * 2 * 3,
            9 * cop * l * 4, 3 * cp * l * 4, 2 * 9 * cop * cp * 4),
        interpret=interpret,
    )(xp, w2t, w3at, w3bt, cv, gates.astype(F32)[:, :, None],
      gout, y2d_res, ctx_res)

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
