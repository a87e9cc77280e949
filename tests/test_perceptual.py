"""Perceptual losses: exact-architecture AlexNet-LPIPS parity vs a
torch-side oracle, weight-converter robustness, and the dispatcher.

The oracle below re-derives the published pip-lpips v0.1 computation
(`LPIPS(net='alex', spatial=False)`: ScalingLayer -> five torchvision-AlexNet
feature slices -> channel-unit-normalized feature diffs -> 1x1 linear heads
-> spatial average) directly with torch.nn.functional, seeded random
weights. Passing proves our JAX implementation is architecture-exact, so
loading the real calibrated weights (AD_TPU_LPIPS_WEIGHTS) gives weight-exact
parity with the reference's loss (reference cs_vae_train.py:80,118-121).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from autoregressive_diffusion_tpu.train.perceptual import (
    LPIPS_SCALE, LPIPS_SHIFT, _ALEX_SLICES, alexnet_lpips_distance,
    alexnet_lpips_loss, lpips_params_from_torch, perceptual_loss,
    random_feature_perceptual_loss)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _random_torch_weights(seed=0):
    """Seeded random AlexNet conv + LPIPS linear-head weights (torch OIHW)."""
    g = torch.Generator().manual_seed(seed)
    shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
              (256, 384, 3, 3), (256, 256, 3, 3)]
    convs = [(torch.randn(s, generator=g) * 0.1,
              torch.randn(s[0], generator=g) * 0.1) for s in shapes]
    lins = [torch.rand((1, s[0], 1, 1), generator=g) for s in shapes]
    return convs, lins


def _torch_lpips(x, y, convs, lins, eps=1e-10):
    """Oracle: the pip-lpips alex forward in plain torch ops. x, y: NCHW."""
    shift = torch.tensor(LPIPS_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(LPIPS_SCALE).view(1, 3, 1, 1)

    def feats(v):
        v = (v - shift) / scale
        out = []
        for (w, b), (pool, _, _, s, p) in zip(convs, _ALEX_SLICES):
            if pool:
                v = F.max_pool2d(v, 3, 2)
            v = F.relu(F.conv2d(v, w, b, stride=s, padding=p))
            out.append(v)
        return out

    fx, fy = feats(x), feats(y)
    total = torch.zeros(x.shape[0])
    for lin, a, b in zip(lins, fx, fy):
        na = a / (torch.sqrt(torch.sum(a * a, 1, keepdim=True)) + eps)
        nb = b / (torch.sqrt(torch.sum(b * b, 1, keepdim=True)) + eps)
        d = (na - nb) ** 2
        total = total + F.conv2d(d, lin).mean(dim=(1, 2, 3))
    return total


def _params_from(convs, lins):
    sd = {}
    for i, (w, b) in enumerate(convs):
        sd[f"features.{i}.weight"], sd[f"features.{i}.bias"] = w, b
    for i, lin in enumerate(lins):
        sd[f"lin{i}.model.1.weight"] = lin
    return lpips_params_from_torch(sd)


class TestAlexLPIPSParity:
    def test_distance_matches_torch_oracle(self):
        convs, lins = _random_torch_weights(0)
        rng = np.random.default_rng(1)
        x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
        y = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
        want = _torch_lpips(torch.tensor(x).permute(0, 3, 1, 2),
                            torch.tensor(y).permute(0, 3, 1, 2),
                            convs, lins).numpy()
        got = np.asarray(alexnet_lpips_distance(
            jnp.asarray(x), jnp.asarray(y), _params_from(convs, lins)))
        assert got.shape == (2,)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_loss_reduction_matches_reference_semantics(self):
        convs, lins = _random_torch_weights(2)
        params = _params_from(convs, lins)
        rng = np.random.default_rng(3)
        recon = rng.uniform(-1, 1, (1, 3, 64, 64, 3)).astype(np.float32)
        frames = rng.uniform(-1, 1, (1, 3, 64, 64, 3)).astype(np.float32)
        per_frame = alexnet_lpips_distance(
            jnp.asarray(recon[0]), jnp.asarray(frames[0]), params)
        want = float(jnp.mean(jnp.log(per_frame + 1e-8)))
        got = float(alexnet_lpips_loss(
            jnp.asarray(recon), jnp.asarray(frames), params))
        assert abs(got - want) < 1e-6

    def test_identical_inputs_zero_distance(self):
        convs, lins = _random_torch_weights(4)
        params = _params_from(convs, lins)
        x = jnp.ones((1, 64, 64, 3)) * 0.3
        d = float(alexnet_lpips_distance(x, x, params)[0])
        assert abs(d) < 1e-12


class TestWeightConverter:
    def test_lpips_style_keys_and_split_dicts(self):
        convs, lins = _random_torch_weights(5)
        # pip-lpips full-dump naming, backbone and heads in separate dicts
        slices = [("slice1", 0), ("slice2", 1), ("slice3", 1),
                  ("slice4", 0), ("slice5", 0)]
        net_sd = {}
        for (name, j), (w, b) in zip(slices, convs):
            net_sd[f"net.{name}.{j}.weight"] = w
            net_sd[f"net.{name}.{j}.bias"] = b
        lin_sd = {f"lin{i}.model.1.weight": l for i, l in enumerate(lins)}
        p1 = lpips_params_from_torch(net_sd, lin_sd)
        p2 = _params_from(convs, lins)
        for (w1, b1), (w2, b2) in zip(p1["convs"], p2["convs"]):
            np.testing.assert_array_equal(w1, w2)
            np.testing.assert_array_equal(b1, b2)
        for l1, l2 in zip(p1["lins"], p2["lins"]):
            np.testing.assert_array_equal(l1, l2)
        # the two 256-channel heads must keep their order
        np.testing.assert_array_equal(p1["lins"][3],
                                      lins[3].numpy()[0, :, 0, 0])
        np.testing.assert_array_equal(p1["lins"][4],
                                      lins[4].numpy()[0, :, 0, 0])

    def test_missing_heads_raise(self):
        convs, _ = _random_torch_weights(6)
        sd = {}
        for i, (w, b) in enumerate(convs):
            sd[f"features.{i}.weight"], sd[f"features.{i}.bias"] = w, b
        with pytest.raises(ValueError, match="linear heads"):
            lpips_params_from_torch(sd)


class TestDispatcher:
    def test_fallback_is_random_feature(self, monkeypatch):
        """With the calibrated artifact disabled, RGB falls back to the
        random-feature metric (and non-RGB always does)."""
        monkeypatch.delenv("AD_TPU_LPIPS_WEIGHTS", raising=False)
        monkeypatch.setenv("AD_TPU_LPIPS_CALIBRATED", "0")
        rng = np.random.default_rng(7)
        recon = jnp.asarray(rng.uniform(-1, 1, (1, 2, 32, 32, 3)), jnp.float32)
        frames = jnp.asarray(rng.uniform(-1, 1, (1, 2, 32, 32, 3)), jnp.float32)
        got = float(perceptual_loss(recon, frames))
        want = float(random_feature_perceptual_loss(recon, frames))
        assert abs(got - want) < 1e-6

    def test_env_weights_use_exact_lpips(self, monkeypatch, tmp_path):
        convs, lins = _random_torch_weights(8)
        sd = {}
        for i, (w, b) in enumerate(convs):
            sd[f"features.{i}.weight"], sd[f"features.{i}.bias"] = w, b
        for i, lin in enumerate(lins):
            sd[f"lin{i}.model.1.weight"] = lin
        path = tmp_path / "lpips_alex.pth"
        torch.save(sd, str(path))
        monkeypatch.setenv("AD_TPU_LPIPS_WEIGHTS", str(path))
        rng = np.random.default_rng(9)
        recon = jnp.asarray(rng.uniform(-1, 1, (1, 2, 64, 64, 3)), jnp.float32)
        frames = jnp.asarray(rng.uniform(-1, 1, (1, 2, 64, 64, 3)), jnp.float32)
        got = float(perceptual_loss(recon, frames))
        want = float(alexnet_lpips_loss(recon, frames,
                                        _params_from(convs, lins)))
        assert abs(got - want) < 1e-6


def test_calibrated_lpips_params_load_and_behave():
    """The committed offline-calibrated LPIPS artifact
    (tools/calibrate_lpips.py): loads, is exact-architecture compatible,
    distances are positive, increase with noise strength, and zero for
    identical inputs; perceptual_loss dispatches to it for RGB inputs."""
    import numpy as np

    from autoregressive_diffusion_tpu.train.perceptual import (
        alexnet_lpips_distance, calibrated_lpips_params, perceptual_loss,
        random_feature_perceptual_loss)

    params = calibrated_lpips_params()
    assert len(params["convs"]) == 5 and len(params["lins"]) == 5
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    d0 = np.asarray(alexnet_lpips_distance(x, x, params))
    assert np.all(d0 < 1e-8)
    n1 = x + 0.05 * jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    n2 = x + 0.2 * jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    d1 = np.asarray(alexnet_lpips_distance(x, jnp.clip(n1, -1, 1), params))
    d2 = np.asarray(alexnet_lpips_distance(x, jnp.clip(n2, -1, 1), params))
    assert np.all(d1 > 0) and np.all(d2 > d1)

    # dispatcher: RGB goes through the calibrated metric (not the
    # random-feature fallback)
    fr = x[None]  # (b=1, t=2, h, w, 3)
    rc = jnp.clip(n1, -1, 1)[None]
    pl = float(perceptual_loss(rc, fr))
    rf = float(random_feature_perceptual_loss(rc, fr))
    assert np.isfinite(pl) and pl != rf
