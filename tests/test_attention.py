"""Consistency matrix for Video/Frame attention, mirroring
/root/reference/edm2/consistency_test.py:34-172 on CPU shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoregressive_diffusion_tpu.models import VideoAttention, FrameAttention
from autoregressive_diffusion_tpu.ops import dense_attention, normalize

B, T, RES, CH = 2, 8, 8, 64
CUT = 3
TOL = 3e-4


@pytest.fixture(scope="module")
def video_attn():
    attn = VideoAttention(channels=CH, num_heads=4, max_frames=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, RES, RES, CH))
    params = attn.init(jax.random.PRNGKey(42), x, mode="eval")
    return attn, params


def test_train_vs_just_2d_first_frame_only(video_attn):
    """Reference :63-74 -- in DART train mode the first frame of each replica
    has no context, so it must equal the 2D path; later frames must differ."""
    attn, params = video_attn
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 2 * T, RES, RES, CH))
    y_video, _ = attn.apply(params, x, mode="train")
    y_2d, _ = attn.apply(params, x, mode="train", just_2d=True)

    d = y_video - y_2d
    # frame 0 of the clean half and frame 0 of the noisy half (index T)
    assert float(jnp.std(d[:, 0])) <= TOL
    assert float(jnp.std(d[:, T])) <= TOL
    assert float(jnp.std(d[:, 1:T])) > 1e-2
    assert float(jnp.std(d[:, T + 1:])) > 1e-2


def test_train_vs_eval(video_attn):
    """Reference :108-125."""
    attn, params = video_attn
    x = jax.random.normal(jax.random.PRNGKey(2), (B, 2 * T, RES, RES, CH))
    y_train, _ = attn.apply(params, x, mode="train")

    x_eval = jnp.concatenate([x[:, :CUT], x[:, CUT + T][:, None]], axis=1)
    y_eval, _ = attn.apply(params, x_eval, mode="eval")

    assert float(jnp.std(y_train[:, :CUT] - y_eval[:, :-1])) <= TOL
    assert float(jnp.std(y_train[:, CUT + T] - y_eval[:, -1])) <= TOL


def test_cached_vs_non_cached(video_attn):
    attn, params = video_attn
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, RES, RES, CH))
    y_full, _ = attn.apply(params, x, mode="eval")

    y_ctx, cache = attn.apply(params, x[:, :-1], None, True, 0, "eval")
    y_last, _ = attn.apply(params, x[:, -1:], cache, False, T - 1, "eval")
    d = float(jnp.std(y_full[:, -1] - y_last[:, 0]))
    assert d <= TOL, d
    d0 = float(jnp.std(y_full[:, :-1] - y_ctx))
    assert d0 <= TOL, d0


def test_cached_vs_non_cached_multistep(video_attn):
    attn, params = video_attn
    x = jax.random.normal(jax.random.PRNGKey(4), (1, T, RES, RES, CH))
    y_full, _ = attn.apply(params, x, mode="eval")

    y0, cache = attn.apply(params, x[:, :-2], None, True, 0, "eval")
    y1, cache = attn.apply(params, x[:, -2:-1], cache, True, T - 2, "eval")
    y2, _ = attn.apply(params, x[:, -1:], cache, False, T - 1, "eval")
    y_cat = jnp.concatenate([y0, y1, y2], axis=1)
    d = float(jnp.std((y_full - y_cat)[:, -2:]))
    assert d <= TOL, d


def test_frame_attention_matches_manual_softmax():
    """Reference :41-55."""
    attn = FrameAttention(channels=CH, num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(5), (B, T, RES, RES, CH))
    params = attn.init(jax.random.PRNGKey(43), x)
    y, _ = attn.apply(params, x)

    # manual path through the same projections
    import einops
    from autoregressive_diffusion_tpu.models.layers import MPConv
    from autoregressive_diffusion_tpu.ops.numerics import mp_sum
    qkv = MPConv(CH * 3, (1, 1)).apply(
        {"params": params["params"]["attn_qkv"]}, x)
    yy = einops.rearrange(qkv, "b t h w (s m c) -> s b m t (h w) c", s=3, m=4)
    q, k, v = normalize(yy, axis=-1)
    logits = jnp.einsum("bmtqc,bmtkc->bmtqk", q, k) / np.sqrt(q.shape[-1])
    w = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bmtqk,bmtkc->bmtqc", w, v)
    o = einops.rearrange(o, "b m t (h w) c -> b t h w (m c)", h=RES, w=RES)
    proj = MPConv(CH, (1, 1)).apply({"params": params["params"]["attn_proj"]}, o)
    y_manual = mp_sum(x, proj, t=0.3)
    assert float(jnp.std(y - y_manual)) <= TOL


def test_precond_prefill_offset_routes_to_splash_and_matches_dense(monkeypatch):
    """The static `prefill_offset` hint at the Precond level must (a) route
    warm-cache prefill through ops.flash_attention.prefill_cache_attention
    and (b) produce the same output as the hint-free dense path (guards
    models/unet.py prefill_offset plumbing + the production call sites in
    scripts/generate.py and sampling.make_sampler_callback)."""
    from autoregressive_diffusion_tpu.models import Precond, UNetConfig
    from autoregressive_diffusion_tpu.models.cache import init_cache
    import autoregressive_diffusion_tpu.models.attention as attn_mod
    from autoregressive_diffusion_tpu.ops import flash_attention as fa

    cfg = UNetConfig(img_resolution=16, img_channels=4, model_channels=16,
                     channel_mult=(1, 2), num_blocks=1,
                     video_attn_resolutions=(8,),
                     frame_attn_resolutions=(), max_frames=8,
                     channels_per_head=16)  # default 64 -> 0 heads here
    model = Precond(cfg)
    t_ctx, t_new = 3, 2
    x = jax.random.normal(jax.random.PRNGKey(7),
                          (1, t_ctx + t_new, 16, 16, 4))
    sig = jnp.full((1, t_ctx + t_new), 0.05)
    variables = model.init(jax.random.PRNGKey(8), x, sig, mode="eval")

    def run(offset_hint, warm_kwargs):
        cache = init_cache(model, variables, batch_size=1)
        _, cache = model.apply(variables, x[:, :t_ctx], sig[:, :t_ctx],
                               mode="eval", cache=cache, update_cache=True)
        y, cache = model.apply(variables, x[:, t_ctx:], sig[:, t_ctx:],
                               mode="eval", cache=cache, update_cache=True,
                               prefill_offset=offset_hint, **warm_kwargs)
        return y, cache

    y_dense, cache_dense = run(None, {})

    # route the hinted path through the splash kernel: force the support
    # gate on and run the kernel in interpreter mode (CPU has no Mosaic)
    calls = []
    real_prefill = fa.prefill_cache_attention

    def spy_prefill(q, k, v, t_new_, f_total, offset, hw, interpret=False):
        calls.append((t_new_, f_total, offset))
        return real_prefill(q, k, v, t_new_, f_total, offset, hw,
                            interpret=True)

    # mimic the TPU gate's shape rule (seq tileable to 128 lanes) instead of
    # a blanket True: init_cache's internal 1-frame trace (seq=64) and the
    # cold prefill (seq=192) must keep the dense path, only the warm prefill
    # (t_new*hw = 128) routes to splash
    monkeypatch.setattr(attn_mod, "flash_supported",
                        lambda s, d: s % 128 == 0 and s >= 128)
    monkeypatch.setattr(attn_mod, "prefill_cache_attention", spy_prefill)
    y_hint, cache_hint = run(t_ctx, {})

    assert calls, "prefill_offset hint did not route to the splash kernel"
    assert all(c == (t_new, cfg.max_frames, t_ctx) for c in calls), calls
    assert float(jnp.std(y_hint - y_dense)) <= TOL
    assert int(cache_hint["frames"]) == int(cache_dense["frames"]) \
        == t_ctx + t_new
