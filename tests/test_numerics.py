"""Golden tests for the magnitude-preserving numerics core against the exact
fp32 formulas of /root/reference/edm2/utils.py (SURVEY.md section 2.2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoregressive_diffusion_tpu.ops import (bmult, gaussian_loss, mp_cat,
                                              mp_fourier, mp_silu, mp_sum,
                                              mp_weight, normalize, resample)

RNG = np.random.default_rng(0)


def test_normalize_matches_formula():
    x = jnp.asarray(RNG.normal(size=(4, 16, 8)).astype(np.float32))
    y = normalize(x)  # default: all dims but first
    n = np.linalg.norm(np.asarray(x).reshape(4, -1), axis=1)
    expected = np.asarray(x) / (1e-4 + n / np.sqrt(16 * 8))[:, None, None]
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5, atol=1e-6)


def test_normalize_axis_last():
    x = jnp.asarray(RNG.normal(size=(3, 5, 7)).astype(np.float32))
    y = normalize(x, axis=-1)
    n = np.linalg.norm(np.asarray(x), axis=-1, keepdims=True)
    expected = np.asarray(x) / (1e-4 + n / np.sqrt(7))
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5, atol=1e-6)


def test_mp_silu():
    x = jnp.linspace(-4, 4, 64)
    np.testing.assert_allclose(
        np.asarray(mp_silu(x)),
        np.asarray(x) / (1 + np.exp(-np.asarray(x))) / 0.596, rtol=1e-5)


def test_mp_sum_scalar_preserves_unit_variance():
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (200_000,))
    b = jax.random.normal(jax.random.fold_in(key, 1), (200_000,))
    for t in (0.3, 0.5):
        y = mp_sum(a, b, t)
        assert abs(float(jnp.std(y)) - 1.0) < 2e-2


def test_mp_sum_tensor_t_matches_scalar():
    a = jnp.asarray(RNG.normal(size=(4, 8)).astype(np.float32))
    b = jnp.asarray(RNG.normal(size=(4, 8)).astype(np.float32))
    t = jnp.full((4,), 0.3, jnp.float32)
    np.testing.assert_allclose(np.asarray(mp_sum(a, b, t)),
                               np.asarray(mp_sum(a, b, 0.3)), rtol=1e-5, atol=1e-6)


def test_mp_cat_weights():
    a = jnp.ones((2, 3))
    b = jnp.ones((2, 5))
    y = mp_cat(a, b, axis=-1, t=0.5)
    c = np.sqrt((3 + 5) / 0.5)
    np.testing.assert_allclose(np.asarray(y[:, :3]), c / np.sqrt(3) * 0.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y[:, 3:]), c / np.sqrt(5) * 0.5, rtol=1e-6)


def test_mp_fourier_magnitude():
    freqs = jnp.asarray(2 * np.pi * RNG.normal(size=(256,)).astype(np.float32))
    phases = jnp.asarray(2 * np.pi * RNG.random(256).astype(np.float32))
    x = jnp.asarray(RNG.normal(size=(1000,)).astype(np.float32))
    y = mp_fourier(x, freqs, phases)
    assert y.shape == (1000, 256)
    assert abs(float(jnp.mean(y**2)) - 1.0) < 5e-2  # cos^2 * 2 averages to 1


def test_mp_weight_scaling():
    w = jnp.asarray(RNG.normal(size=(3, 3, 16, 32)).astype(np.float32))
    y = mp_weight(w, gain=2.0)
    # normalize gives each output filter norm sqrt(fan_in); the
    # gain/sqrt(fan_in) scaling leaves per-filter norm == gain (up to eps)
    norms = np.linalg.norm(np.asarray(y).reshape(-1, 32), axis=0)
    np.testing.assert_allclose(norms, 2.0, rtol=1e-3)


def test_bmult_shapes():
    x = jnp.ones((2, 4, 4, 3))
    assert bmult(x, jnp.arange(2.0)).shape == x.shape
    assert float(bmult(x, jnp.arange(2.0))[1, 0, 0, 0]) == 1.0
    t2 = jnp.ones((2, 3)) * 2
    assert float(bmult(x, t2)[0, 0, 0, 0]) == 2.0


def test_resample_down_up():
    x = jnp.asarray(RNG.normal(size=(2, 8, 8, 3)).astype(np.float32))
    d = resample(x, mode="down")
    assert d.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(
        np.asarray(d[0, 0, 0]), np.asarray(x[0, :2, :2].mean(axis=(0, 1))),
        rtol=1e-5, atol=1e-6)
    u = resample(x, mode="up")
    assert u.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(u[0, :2, :2, 0]),
                               np.full((2, 2), np.asarray(x)[0, 0, 0, 0]), rtol=1e-6)
    # video-shaped input keeps leading dims
    xv = jnp.zeros((2, 5, 8, 8, 3))
    assert resample(xv, mode="down").shape == (2, 5, 4, 4, 3)


def test_gaussian_loss_minimum_at_target():
    mean = jnp.zeros((10,))
    target = jnp.zeros((10,))
    lv0 = gaussian_loss(mean, jnp.zeros((10,)), target)
    lv1 = gaussian_loss(mean + 0.5, jnp.zeros((10,)), target)
    assert float(lv1) > float(lv0)
    np.testing.assert_allclose(float(lv0), 0.918, rtol=1e-6)
