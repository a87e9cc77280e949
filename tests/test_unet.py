"""UNet-level consistency + causality, mirroring
/root/reference/edm2/consistency_test.py:174-228, plus Precond math checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoregressive_diffusion_tpu.models import (Precond, UNet, UNetConfig,
                                                 init_cache)

CFG = UNetConfig(img_resolution=16, img_channels=8, label_dim=0,
                 model_channels=16, channel_mult=(1, 2), num_blocks=1,
                 video_attn_resolutions=(16, 8), frame_attn_resolutions=(),
                 channels_per_head=16, max_frames=16)
B, T = 2, 6
CUT = 3
TOL = 3e-4


@pytest.fixture(scope="module")
def unet_and_params():
    unet = UNet(CFG)
    x = jnp.zeros((B, T, 16, 16, 8))
    cn = jnp.zeros((B, T))
    variables = unet.init(jax.random.PRNGKey(0), x, cn, mode="eval")
    # out_gain is zero-init (reference networks_edm2.py:143), which would make
    # the raw UNet output identically zero; set it to 1 so consistency and
    # causality are observable.
    variables["params"]["out_gain"] = jnp.float32(1.0)
    return unet, variables


def test_train_vs_eval(unet_and_params):
    unet, variables = unet_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 2 * T, 16, 16, 8))
    cn = jnp.zeros((B, 2 * T))
    y_train, _ = unet.apply(variables, x, cn, mode="train")

    x_eval = jnp.concatenate([x[:, :CUT], x[:, CUT + T][:, None]], axis=1)
    cn_eval = jnp.zeros((B, CUT + 1))
    y_eval, _ = unet.apply(variables, x_eval, cn_eval, mode="eval")

    d1 = float(jnp.std(y_train[:, :CUT] - y_eval[:, :-1]))
    d2 = float(jnp.std(y_train[:, CUT + T] - y_eval[:, -1]))
    assert d1 <= TOL, d1
    assert d2 <= TOL, d2


def test_causality(unet_and_params):
    """Perturbing clean frame k must affect only frames >= k in the clean half
    and frames > k in the noisy half (reference :214-228)."""
    unet, variables = unet_and_params
    key = jax.random.PRNGKey(2)
    r = jax.random.normal(key, (B, T, 16, 16, 8))
    zeros = jnp.zeros_like(r)
    a = jnp.concatenate([zeros, r], axis=1)
    xp = zeros.at[:, CUT].set(jax.random.normal(jax.random.fold_in(key, 1),
                                                (B, 16, 16, 8)))
    b = jnp.concatenate([xp, r], axis=1)
    cn = jnp.zeros((B, 2 * T))
    y = (unet.apply(variables, b, cn, mode="train")[0]
         - unet.apply(variables, a, cn, mode="train")[0])

    assert float(jnp.std(y[:, :CUT])) <= TOL
    assert float(jnp.std(y[:, CUT:T])) > 0.01
    assert float(jnp.std(y[:, T:T + CUT])) <= TOL
    assert float(jnp.std(y[:, T + CUT + 1:])) > 0.01


def test_precond_cached_rollout_consistency():
    """Full Precond: prefill + cached decode == uncached eval (the core
    O(1)-per-frame inference invariant)."""
    model = Precond(CFG, sigma_data=1.0)
    x = jax.random.normal(jax.random.PRNGKey(3), (B, T, 16, 16, 8))
    sigma = jnp.full((B, T), 0.5)
    variables = model.init(jax.random.PRNGKey(4), x, sigma, mode="eval")
    variables["params"]["unet"]["out_gain"] = jnp.float32(1.0)

    y_full, _ = model.apply(variables, x, sigma, mode="eval")

    cache = init_cache(model, variables, B)
    _, cache = model.apply(variables, x[:, :-1], sigma[:, :-1], cache=cache,
                           update_cache=True, mode="eval")
    y_dec, _ = model.apply(variables, x[:, -1:], sigma[:, -1:], cache=cache,
                           mode="eval")
    d = float(jnp.std(y_full[:, -1] - y_dec[:, 0]))
    assert d <= TOL, d


def test_precond_formulas():
    """c_skip/c_out/c_in identities: at F_x == 0 the output is c_skip * x."""
    model = Precond(CFG, sigma_data=0.5)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 16, 16, 8))
    sigma = jnp.array([[1.0, 4.0]])
    variables = model.init(jax.random.PRNGKey(6), x, sigma, mode="eval")
    y, _ = model.apply(variables, x, sigma, mode="eval")
    # out_gain is zero-init so UNet output is exactly 0 -> y == c_skip * x
    sd = 0.5
    c_skip = sd**2 / (sigma**2 + sd**2)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(c_skip[:, :, None, None, None] * x),
        rtol=1e-5, atol=1e-5)


def test_dropout_applied_in_train_only():
    """dropout>0 must change train-mode outputs (per dropout rng) and leave
    eval deterministic (reference networks_edm2.py:78-79)."""
    cfg = UNetConfig(img_resolution=16, img_channels=8, label_dim=0,
                     model_channels=16, channel_mult=(1, 2), num_blocks=1,
                     video_attn_resolutions=(16, 8), frame_attn_resolutions=(),
                     channels_per_head=16, max_frames=16, dropout=0.3)
    unet = UNet(cfg)
    x = jnp.zeros((B, 2 * T, 16, 16, 8))
    cn = jnp.zeros((B, 2 * T))
    variables = unet.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(1)},
                          x, cn, mode="train")
    variables["params"]["out_gain"] = jnp.float32(1.0)

    xr = jax.random.normal(jax.random.PRNGKey(2), (B, 2 * T, 16, 16, 8))
    y1, _ = unet.apply(variables, xr, cn, mode="train",
                       rngs={"dropout": jax.random.PRNGKey(3)})
    y2, _ = unet.apply(variables, xr, cn, mode="train",
                       rngs={"dropout": jax.random.PRNGKey(4)})
    y3, _ = unet.apply(variables, xr, cn, mode="train",
                       rngs={"dropout": jax.random.PRNGKey(3)})
    assert float(jnp.abs(y1 - y2).max()) > 1e-6  # masks differ
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y3))  # same rng

    # eval: no dropout rng needed, fully deterministic
    xe = xr[:, :T]
    cne = jnp.zeros((B, T))
    e1, _ = unet.apply(variables, xe, cne, mode="eval")
    e2, _ = unet.apply(variables, xe, cne, mode="eval")
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_int8_decode_quantization():
    """quantize_variables + decode_quant=True must reproduce the fp32 decode
    path closely (unit-norm columns quantize benignly; see train/quantize.py)."""
    import dataclasses
    from autoregressive_diffusion_tpu.models import Precond, init_cache
    from autoregressive_diffusion_tpu.train import (quantize_variables,
                                                    quantized_config)

    cfg = dataclasses.replace(CFG, label_dim=0)
    model = Precond(cfg, sigma_data=1.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 16, 16, 8))
    sig = jnp.full((B, T), 0.3)
    variables = model.init(jax.random.PRNGKey(1), x, sig, mode="eval")
    variables["params"]["unet"]["out_gain"] = jnp.float32(1.0)
    # forced weight normalization holds at rest: normalize the raw params
    # like train/optim.py would after a step
    from autoregressive_diffusion_tpu.train import forced_weight_norm
    variables = dict(variables, params=forced_weight_norm(variables["params"]))

    qmodel = Precond(quantized_config(cfg), sigma_data=1.0)
    qvars = quantize_variables(variables)

    # prefill + decode through both models
    def run(m, v):
        cache = init_cache(m, v, batch_size=B)
        _, cache = m.apply(v, x[:, :T - 1], sig[:, :T - 1], cache=cache,
                           update_cache=True, mode="eval")
        y, _ = m.apply(v, x[:, T - 1:], sig[:, :1], cache=cache,
                       update_cache=True, mode="eval")
        return y

    y32 = run(model, variables)
    y8 = run(qmodel, qvars)
    rel = float(jnp.abs(y8 - y32).max() / (jnp.abs(y32).max() + 1e-9))
    assert rel < 0.05, rel
    # int8 params really are int8 (the HBM saving is real)
    qkv = qvars["params"]["unet"]["dec_8x8_in0"]["attn"]["attn_qkv"]
    assert qkv["w_q"].dtype == np.int8
    assert "w" not in qkv
    # ... and so is the KV cache under decode quantization (fixed-scale int8
    # on pixel-normed K/V; models/attention.py::_quant_kv)
    qcache = init_cache(qmodel, qvars, batch_size=B)
    kv_dtypes = {leaf.dtype for path, leaf in
                 jax.tree_util.tree_flatten_with_path(qcache)[0]
                 if any(getattr(p, "key", None) in ("k", "v") for p in path)}
    assert kv_dtypes == {np.dtype(np.int8)}, kv_dtypes
    f32cache = init_cache(model, variables, batch_size=B)
    kv_dtypes32 = {leaf.dtype for path, leaf in
                   jax.tree_util.tree_flatten_with_path(f32cache)[0]
                   if any(getattr(p, "key", None) in ("k", "v") for p in path)}
    assert np.dtype(np.int8) not in kv_dtypes32
