"""Consistency matrix for MPCausalConv3d, mirroring the reference suite
/root/reference/edm2/consistency_test.py:232-307 (train<->eval, cached<->non-
cached, multistep) on CPU-runnable shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoregressive_diffusion_tpu.models import MPCausalConv3d

B, T, H, W, C = 2, 8, 8, 8, 8
CUT = 3
TOL = 3e-4  # reference error bound (consistency_test.py:32)


@pytest.fixture(scope="module")
def conv_and_params():
    conv = MPCausalConv3d(C, (3, 3, 3))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, H, W, C))
    c_noise = jax.random.normal(jax.random.fold_in(key, 1), (B, T))
    params = conv.init(jax.random.PRNGKey(42), x, c_noise, mode="eval")
    return conv, params


def test_train_vs_eval(conv_and_params):
    conv, params = conv_and_params
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (B, 2 * T, H, W, C))
    c_noise = jax.random.normal(jax.random.fold_in(key, 1), (B, 2 * T))
    y_train, _ = conv.apply(params, x, c_noise, mode="train")

    # eval on (clean[:CUT], noisy[CUT]) must match train outputs at the same
    # positions (the noisy frame sees exactly the clean past).
    x_eval = jnp.concatenate([x[:, :CUT], x[:, CUT + T][:, None]], axis=1)
    cn_eval = jnp.concatenate([c_noise[:, :CUT], c_noise[:, CUT + T][:, None]], axis=1)
    y_eval, _ = conv.apply(params, x_eval, cn_eval, mode="eval")

    d1 = float(jnp.std(y_train[:, :CUT] - y_eval[:, :-1]))
    d2 = float(jnp.std(y_train[:, CUT + T] - y_eval[:, -1]))
    assert d1 <= TOL, d1
    assert d2 <= TOL, d2


def test_cached_vs_non_cached(conv_and_params):
    conv, params = conv_and_params
    key = jax.random.PRNGKey(9)
    x = jax.random.normal(key, (B, T, H, W, C))
    c_noise = jax.random.normal(jax.random.fold_in(key, 1), (B, T))

    y_full, _ = conv.apply(params, x, c_noise, mode="eval")

    y_ctx, cache = conv.apply(params, x[:, :-1], c_noise[:, :-1],
                              frames=0, update_cache=True, mode="eval")
    y_last, _ = conv.apply(params, x[:, -1:], c_noise[:, -1:],
                           frames=T - 1, cache=cache, mode="eval")
    y_cat = jnp.concatenate([y_ctx, y_last], axis=1)
    d = float(jnp.std(y_full - y_cat))
    assert d <= TOL, d


def test_cached_multistep(conv_and_params):
    conv, params = conv_and_params
    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (B, T, H, W, C))
    c_noise = jax.random.normal(jax.random.fold_in(key, 1), (B, T))

    y_full, _ = conv.apply(params, x, c_noise, mode="eval")

    y0, cache = conv.apply(params, x[:, :-2], c_noise[:, :-2],
                           frames=0, update_cache=True, mode="eval")
    y1, cache = conv.apply(params, x[:, -2:-1], c_noise[:, -2:-1],
                           frames=T - 2, cache=cache, update_cache=True, mode="eval")
    y2, _ = conv.apply(params, x[:, -1:], c_noise[:, -1:],
                       frames=T - 1, cache=cache, mode="eval")
    y_cat = jnp.concatenate([y0, y1, y2], axis=1)
    d = float(jnp.std(y_full - y_cat))
    assert d <= TOL, d


def test_just_2d_is_frame_local(conv_and_params):
    conv, params = conv_and_params
    key = jax.random.PRNGKey(13)
    x = jax.random.normal(key, (B, T, H, W, C))
    c_noise = jnp.zeros((B, T))
    y, _ = conv.apply(params, x, c_noise, mode="eval", just_2d=True)
    # permuting frames permutes outputs identically -> no temporal mixing
    perm = jnp.array([3, 1, 0, 2, 7, 6, 5, 4])
    y_perm, _ = conv.apply(params, x[:, perm], c_noise, mode="eval", just_2d=True)
    np.testing.assert_allclose(np.asarray(y[:, perm]), np.asarray(y_perm),
                               rtol=1e-5, atol=1e-5)
