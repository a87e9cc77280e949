"""Fused Pallas gated-conv kernel vs its dense oracle and the module path.

The kernel (ops/fused_conv.py) implements MPCausal3DGatedConv's train mode
(reference /root/reference/edm2/conv.py:49-101) with the input transform
fused. Tests run the kernel in interpreter mode on CPU and check:
  * forward equivalence with the packed dense oracle for every flag combo,
  * every gradient (x, w2, w3, cvec, gates) against the oracle's autodiff,
  * full-Precond equivalence of the fused Block path vs the XLA path.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoregressive_diffusion_tpu.ops import fused_conv as fc


def _rel_check(a, b, tol=5e-5):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = np.abs(b).mean() + 1e-6
    assert np.abs(a - b).max() / scale < tol, np.abs(a - b).max() / scale


def _setup(c=8, co=8, h=8, w=8, b=2, t=4, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x5 = jax.random.normal(ks[0], (b, 2 * t, h, w, c))
    xp = fc.pack_x(x5, h, w)
    w2 = jax.random.normal(ks[1], (3, 3, c, co)) * 0.2
    w3 = jax.random.normal(ks[2], (2, 3, 3, c, co)) * 0.2
    cvec = 1 + 0.1 * jax.random.normal(ks[3], (b, t, 2, c))
    gates = jax.nn.sigmoid(jax.random.normal(ks[4], (b, t, 2)))
    return xp, w2, w3, cvec, gates


@pytest.mark.parametrize("silu_in", [True, False])
@pytest.mark.parametrize("has_cv", [True, False])
@pytest.mark.parametrize("with_ctx", [True, False])
def test_fused_kernel_matches_oracle(silu_in, has_cv, with_ctx):
    h = w = 8
    xp, w2, w3, cvec, gates = _setup(h=h, w=w)
    cv = cvec if has_cv else None
    args = (xp, w2, w3, cv, gates)

    out_k = fc.fused_gated_conv(*args, h, w, silu_in, with_ctx, True)
    out_r = fc.fused_gated_conv_reference(*args, h, w, silu_in, with_ctx)
    _rel_check(out_k, out_r)

    probe = jnp.cos(jnp.arange(out_r.size).reshape(out_r.shape) * 0.37)

    def loss_k(*a):
        return jnp.sum(fc.fused_gated_conv(*a, h, w, silu_in, with_ctx,
                                           True) * probe)

    def loss_r(*a):
        return jnp.sum(fc.fused_gated_conv_reference(*a, h, w, silu_in,
                                                     with_ctx) * probe)

    argnums = (0, 1, 2, 3, 4) if has_cv else (0, 1, 2, 4)
    gk = jax.grad(loss_k, argnums)(*args)
    gr = jax.grad(loss_r, argnums)(*args)
    names = (["dx", "dw2", "dw3", "dcv", "dgates"] if has_cv
             else ["dx", "dw2", "dw3", "dgates"])
    for name, a, b in zip(names, gk, gr):
        if name == "dgates" and not with_ctx:
            continue  # gates unused without the context branch
        _rel_check(a, b)


def test_fused_kernel_bf16_packed_rolls_matches_unpacked(monkeypatch):
    # bf16 activations trigger the packed-i32 tap-roll path (channel pairs
    # bitcast into one i32 sublane before the 9 rolls -- Mosaic's
    # dynamic_rotate is 32-bit-only). Packing only reorders cast-vs-roll
    # (the bf16 cast commutes with lane shifts and masks), so forward AND
    # every gradient must match the unpacked bf16 path EXACTLY; the f32
    # oracle check is a loose sanity bound on the bf16 rounding itself.
    h = w = 8
    xp, w2, w3, cvec, gates = _setup(h=h, w=w)
    xp16 = xp.astype(jnp.bfloat16)
    probe = None

    def run():
        nonlocal probe
        out = fc.fused_gated_conv(xp16, w2, w3, cvec, gates, h, w, True,
                                  True, True)
        if probe is None:
            probe = jnp.cos(jnp.arange(out.size).reshape(out.shape) * 0.37)

        def loss(*a):
            return jnp.sum(fc.fused_gated_conv(*a, h, w, True, True, True)
                           .astype(jnp.float32) * probe)
        g = jax.grad(loss, (0, 1, 2, 3, 4))(xp16, w2, w3, cvec, gates)
        return out, g

    monkeypatch.setenv("AD_TPU_PACKED_ROLLS", "1")
    out_p, g_p = run()
    monkeypatch.setenv("AD_TPU_PACKED_ROLLS", "0")
    out_u, g_u = run()

    assert np.array_equal(np.asarray(out_p, np.float32),
                          np.asarray(out_u, np.float32))
    for name, a, b in zip(["dx", "dw2", "dw3", "dcv", "dgates"], g_p, g_u):
        assert np.array_equal(np.asarray(a, np.float32),
                              np.asarray(b, np.float32)), name

    out_r = fc.fused_gated_conv_reference(
        xp16.astype(jnp.float32), w2, w3, cvec, gates, h, w, True, True)
    _rel_check(out_p.astype(jnp.float32), out_r, tol=2e-2)


def test_fused_kernel_nonsquare_and_odd_channels():
    # C=9 exercises the channel zero-padding path (the UNet stem has
    # img_channels + 1 = 9 input channels).
    h, w = 4, 16
    xp, w2, w3, cvec, gates = _setup(c=9, co=8, h=h, w=w)
    out_k = fc.fused_gated_conv(xp, w2, w3, None, gates, h, w, True, True,
                                True)
    out_r = fc.fused_gated_conv_reference(xp, w2, w3, None, gates, h, w,
                                          True, True)
    _rel_check(out_k, out_r)


def test_fused_block_path_matches_xla_path():
    """Full Precond forward+grad: fused (interpret) vs reference XLA path."""
    from autoregressive_diffusion_tpu.models import Precond, UNetConfig

    cfg = UNetConfig(img_resolution=16, img_channels=4, model_channels=16,
                     channel_mult=(1, 2), num_blocks=1,
                     video_attn_resolutions=(4,), frame_attn_resolutions=(8,),
                     max_frames=16)
    model = Precond(cfg, sigma_data=1.0)
    b, t = 2, 3
    x = jax.random.normal(jax.random.PRNGKey(0), (b, 2 * t, 16, 16, 4))
    sig = jnp.exp(jax.random.normal(jax.random.PRNGKey(1), (b, 2 * t)))
    cond = jnp.zeros((b, 2 * t), jnp.int32)

    def run(fused):
        prev = os.environ.get("AD_TPU_FUSED_CONV")
        os.environ["AD_TPU_FUSED_CONV"] = "interpret" if fused else "0"
        try:
            variables = model.init(jax.random.PRNGKey(7), x, sig, cond,
                                   mode="train")
            probe = None

            def loss(v, xx):
                y, _ = model.apply(v, xx, sig, cond, mode="train")
                p = jnp.sin(jnp.arange(y.size).reshape(y.shape) * 0.13)
                return jnp.sum(y * p), y

            (_, y), grads = jax.value_and_grad(
                loss, argnums=(0, 1), has_aux=True)(variables, x)
            return y, grads
        finally:
            if prev is None:
                os.environ.pop("AD_TPU_FUSED_CONV", None)
            else:
                os.environ["AD_TPU_FUSED_CONV"] = prev

    y_r, g_r = run(False)
    y_f, g_f = run(True)
    assert np.abs(np.asarray(y_f) - np.asarray(y_r)).max() < 3e-4
    for a, b_ in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_f)):
        rel = (np.abs(np.asarray(a, np.float64)
                      - np.asarray(b_, np.float64)).max()
               / (np.abs(np.asarray(a)).max() + 1e-8))
        assert rel < 5e-4, rel


def test_fused_enc_skip_block_grads_finite_and_match():
    """Regression: attention-free enc Block with in != out channels (the
    conv_skip + pixel-norm branch). The packed layout's H-pad rows are
    exactly zero; normalize's backward at an exactly-zero vector is NaN in
    JAX, which surfaced as a NaN conv_skip.w grad on the first real train
    step (clip_by_global_norm then wiped every param). The skip conv +
    pixel norm must run on the unpacked tensor, and all grads must be
    finite and match the XLA path."""
    from autoregressive_diffusion_tpu.models import Precond, UNetConfig

    cfg = UNetConfig(img_resolution=16, img_channels=4, model_channels=16,
                     channel_mult=(1, 2), num_blocks=1,
                     video_attn_resolutions=(), frame_attn_resolutions=(),
                     max_frames=16)
    model = Precond(cfg, sigma_data=1.0)
    b, t = 2, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (b, 2 * t, 16, 16, 4))
    sig = jnp.exp(jax.random.normal(jax.random.PRNGKey(1), (b, 2 * t)))

    def run(fused, monkey=os.environ):
        prev = os.environ.get("AD_TPU_FUSED_CONV")
        os.environ["AD_TPU_FUSED_CONV"] = "interpret" if fused else "0"
        try:
            variables = model.init(jax.random.PRNGKey(7), x, sig,
                                   mode="train")

            def loss(v):
                y, _ = model.apply(v, x, sig, mode="train")
                p = jnp.sin(jnp.arange(y.size).reshape(y.shape) * 0.13)
                return jnp.sum(y * p)

            return jax.grad(loss)(variables)
        finally:
            if prev is None:
                os.environ.pop("AD_TPU_FUSED_CONV", None)
            else:
                os.environ["AD_TPU_FUSED_CONV"] = prev

    g_f = run(True)
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_f):
        assert bool(jnp.isfinite(leaf).all()), (
            f"non-finite grad at {jax.tree_util.keystr(path)}")
    g_r = run(False)
    for a, b_ in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_f)):
        denom = np.abs(np.asarray(a, np.float64)).max() + 1e-6
        assert np.abs(np.asarray(a) - np.asarray(b_)).max() / denom < 2e-3


def test_fused_kernel_frame_blocked_matches_oracle(monkeypatch):
    """Frame-blocked grid (TB < T): nt = ceil(5/2) = 3 programs per batch
    element with a partial last block, halo views crossing every block
    boundary, and cross-block context gradients recomputed by the halo
    epilogue. Must match the dense oracle fwd + all grads exactly like the
    single-block path."""
    monkeypatch.setenv("AD_TPU_FUSED_TB", "2")
    h = w = 8
    xp, w2, w3, cvec, gates = _setup(h=h, w=w, t=5, seed=3)
    args = (xp, w2, w3, cvec, gates)

    out_k = fc.fused_gated_conv(*args, h, w, True, True, True)
    out_r = fc.fused_gated_conv_reference(*args, h, w, True, True)
    _rel_check(out_k, out_r)

    probe = jnp.cos(jnp.arange(out_r.size).reshape(out_r.shape) * 0.37)

    def loss_k(*a):
        return jnp.sum(fc.fused_gated_conv(*a, h, w, True, True, True)
                       * probe)

    def loss_r(*a):
        return jnp.sum(fc.fused_gated_conv_reference(*a, h, w, True, True)
                       * probe)

    gk = jax.grad(loss_k, (0, 1, 2, 3, 4))(*args)
    gr = jax.grad(loss_r, (0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(["dx", "dw2", "dw3", "dcv", "dgates"], gk, gr):
        _rel_check(a, b)


def test_vmem_gate_and_block_picker():
    """The footprint model must (a) keep the gym flagship single-block,
    (b) pick a reduced TB for CS-scale shapes instead of rejecting them,
    (c) reject only shapes that cannot fit even at TB=2."""
    # gym flagship hot block: 64x64, 32ch -> whole clip in one program
    assert fc._pick_tb(8, 64, 64, 32, 32) == 8
    # CS decoder block: 32x32, 256ch, T=16 overflows whole-clip VMEM; with
    # the round-5 stream-paired scratches (2*Lp wide) it no longer fits
    # even at TB=2, so the footprint gate rejects it -- consistent with the
    # measured policy (Cp >= 128 shapes lose to XLA and are cap-routed
    # there by default anyway)
    budget = 64 << 20
    assert fc._bwd_vmem_bytes(2, 32, 32, 256, 256) > budget
    assert fc._bwd_vmem_bytes(16, 32, 32, 256, 256) > budget
    # a CS-encoder-scale 96ch shape still fits frame-blocked
    tb = fc._pick_tb(16, 32, 32, 96, 96)
    assert 2 <= tb <= 16
    assert fc._bwd_vmem_bytes(tb, 32, 32, 96, 96) <= budget
    # fused_supported admits the CS shape (channel-aware) in train mode
    ok, _ = fc.fused_supported("train", 32, 32, 32, cin=256, cout=256)
    # gate passes the footprint check on CPU only via env; just assert the
    # footprint path didn't reject (on CPU the backend check returns False)
    assert ok in (True, False)
    prev = os.environ.get("AD_TPU_FUSED_CONV")
    os.environ["AD_TPU_FUSED_CONV"] = "interpret"
    try:
        # the channel cap (AD_TPU_FUSED_MAX_CP, default 192 since the
        # round-5 paired-stack sweep) sends
        # lane-dense shapes (Cp >= 128) to XLA: measured end-to-end at CS
        # scale the kernel loses there (all-fused 117.2 vs XLA 106.1
        # ms/step), so cin=256 is rejected by default...
        ok, _ = fc.fused_supported("train", 32, 32, 32, cin=256, cout=256)
        assert not ok
        # ...and with the cap raised it is STILL rejected -- by the
        # footprint gate (paired scratches exceed the budget at TB=2);
        # a 96ch shape is admitted
        os.environ["AD_TPU_FUSED_MAX_CP"] = "512"
        ok, _ = fc.fused_supported("train", 32, 32, 32,
                                   cin=256, cout=256)
        assert not ok
        ok, interp = fc.fused_supported("train", 32, 32, 32,
                                        cin=96, cout=96)
        assert ok and interp
        # a lane-starved gym shape is admitted under the default cap
        del os.environ["AD_TPU_FUSED_MAX_CP"]
        ok, interp = fc.fused_supported("train", 64, 64, 16,
                                        cin=64, cout=64)
        assert ok and interp
        # an absurd shape that cannot fit even at TB=2 is rejected
        os.environ["AD_TPU_FUSED_MAX_CP"] = "99999"
        ok, _ = fc.fused_supported("train", 256, 256, 32,
                                   cin=4096, cout=4096)
        assert not ok
        del os.environ["AD_TPU_FUSED_MAX_CP"]
    finally:
        if prev is None:
            os.environ.pop("AD_TPU_FUSED_CONV", None)
        else:
            os.environ["AD_TPU_FUSED_CONV"] = prev


@pytest.mark.parametrize("flavor,has_skip,with_ctx",
                         [("enc", True, True), ("enc", False, True),
                          ("dec", True, True), ("dec", False, False)])
def test_decode_block_kernel_matches_oracle(flavor, has_skip, with_ctx):
    """fused_decode_block (interpret) vs a plain-jnp oracle of the eval
    Block step: skip conv, pixel norm (enc), silu, both gated causal convs
    against 2-frame caches, modulation, residual mp_sum, clip."""
    import math

    from autoregressive_diffusion_tpu.ops.numerics import normalize

    rng = np.random.default_rng(3)
    b, h, w = 2, 8, 16
    cin = 24 if has_skip else 16
    co = 16
    c0 = co if flavor == "enc" else cin
    f32 = np.float32

    x = jnp.asarray(rng.normal(size=(b, 1, h, w, cin)), jnp.float32)
    a0 = jnp.asarray(rng.normal(size=(b, 2, h, w, c0)), jnp.float32)
    a1 = jnp.asarray(rng.normal(size=(b, 2, h, w, co)), jnp.float32)
    wsk = (jnp.asarray(rng.normal(size=(cin, co)), jnp.float32) * 0.2
           if has_skip else None)
    w20 = jnp.asarray(rng.normal(size=(3, 3, c0, co)), jnp.float32) * 0.1
    w30 = jnp.asarray(rng.normal(size=(2, 3, 3, c0, co)), jnp.float32) * 0.1
    w21 = jnp.asarray(rng.normal(size=(3, 3, co, co)), jnp.float32) * 0.1
    w31 = jnp.asarray(rng.normal(size=(2, 3, 3, co, co)), jnp.float32) * 0.1
    cv = jnp.asarray(rng.normal(size=(b, co)), jnp.float32) * 0.5 + 1.0
    gates = jnp.asarray(rng.uniform(0.1, 0.9, size=(b, 2)), jnp.float32)
    res_t, clip = 0.3, 256.0

    def silu(v):
        return jax.nn.silu(v) / 0.596

    def conv2d(v, wk):  # (B, T, H, W, C) same-padded
        b_, t = v.shape[:2]
        v4 = v.reshape((-1,) + v.shape[2:])
        y = jax.lax.conv_general_dilated(
            v4, wk, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.reshape((b_, t) + y.shape[1:])

    def ctx_conv(cache, wk):  # conv3d over exactly the 2 cached frames
        y = jax.lax.conv_general_dilated(
            cache, wk, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y  # (B, 1, H, W, Co)

    def blend(a, bb, g):
        g = g[:, None, None, None, None]
        return (a + (bb - a) * g) * jax.lax.rsqrt((1 - g) ** 2 + g ** 2)

    # oracle
    if flavor == "enc":
        hx = jnp.einsum("bthwc,cd->bthwd", x, wsk) if has_skip else x
        hx = normalize(hx, axis=-1)
        res = hx
    else:
        hx = x
        res = jnp.einsum("bthwc,cd->bthwd", x, wsk) if has_skip else x
    t0 = silu(hx)
    y = conv2d(t0, w20)
    if with_ctx:
        y = blend(y, ctx_conv(a0, w30), gates[:, 0])
    t1 = silu(y * cv[:, None, None, None, :])
    y = conv2d(t1, w21)
    if with_ctx:
        y = blend(y, ctx_conv(a1, w31), gates[:, 1])
    s = 1.0 / math.sqrt((1 - res_t) ** 2 + res_t ** 2)
    want = jnp.clip((res + (y - res) * res_t) * s, -clip, clip)

    got, t0k, t1k = fc.fused_decode_block(
        x, a0, a1, wsk, w20, w30, w21, w31, cv, gates, h, w, flavor,
        res_t, clip, with_ctx, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(t0k), np.asarray(t0),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(t1k), np.asarray(t1),
                               atol=3e-5, rtol=1e-4)


def test_fused_decode_precond_matches_xla_path():
    """Full Precond: prefill on the XLA path, then one cached decode step
    with the fused decode-Block kernel (interpret) vs the XLA eval path --
    outputs AND advanced conv caches must match."""
    from functools import partial

    from autoregressive_diffusion_tpu.models import Precond, UNetConfig
    from autoregressive_diffusion_tpu.models.cache import init_cache

    cfg = UNetConfig(img_resolution=16, img_channels=4, model_channels=16,
                     channel_mult=(1, 2), num_blocks=1,
                     video_attn_resolutions=(4,), frame_attn_resolutions=(8,),
                     max_frames=8)
    model = Precond(cfg, sigma_data=1.0)
    b, t = 2, 3
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t + 1, 16, 16, 4))
    sig = jnp.full((b, t + 1), 0.3)
    variables = model.init(jax.random.PRNGKey(7),
                           jnp.concatenate([x, x], 1),
                           jnp.concatenate([sig, sig], 1), mode="train")
    apply_ev = partial(model.apply, mode="eval", update_cache=True)

    def decode_step(env_val):
        prev = os.environ.get("AD_TPU_FUSED_DECODE")
        os.environ["AD_TPU_FUSED_DECODE"] = env_val
        try:
            cache = init_cache(model, variables, batch_size=b)
            _, cache = apply_ev(variables, x[:, :t], sig[:, :t], cache=cache)
            y, cache2 = apply_ev(variables, x[:, t:], sig[:, t:],
                                 cache=cache)
            y2, _ = model.apply(variables, x[:, t:], sig[:, t:],
                                mode="eval", just_2d=True)
            return y, y2, cache2
        finally:
            if prev is None:
                os.environ.pop("AD_TPU_FUSED_DECODE", None)
            else:
                os.environ["AD_TPU_FUSED_DECODE"] = prev

    y_r, y2_r, cache_r = decode_step("0")
    y_f, y2_f, cache_f = decode_step("interpret")
    assert np.abs(np.asarray(y_f) - np.asarray(y_r)).max() < 3e-4
    assert np.abs(np.asarray(y2_f) - np.asarray(y2_r)).max() < 3e-4
    for a, b_ in zip(jax.tree.leaves(cache_r), jax.tree.leaves(cache_f)):
        assert np.abs(np.asarray(a, np.float64)
                      - np.asarray(b_, np.float64)).max() < 3e-4
