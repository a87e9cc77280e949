"""Golden numerical parity against the PyTorch reference.

Fixtures in tests/reference_parity/fixtures/*.npz were recorded from
/root/reference (torch CPU, fp32) by tests/reference_parity/generate_fixtures.py
-- see its docstring for the three documented CPU-recording patches. Weights
are transplanted through utils/import_2d.py layout permutations and every
output is compared at the reference's own cross-mode consistency bound,
std-of-diff <= 3e-4 (reference consistency_test.py:32); the 16-NFE sampler
trajectory, which compounds error over 16 sequential UNet calls, gets 1e-3.

This is the proof of BASELINE.md's "denoiser outputs match the PyTorch
reference within fp32 tolerance" target: Precond (networks_edm2.py:266-297)
in all four execution modes, MPCausal3DGatedConv (conv.py:49-101),
VideoAttention (attention_modules.py:15-88), every numerics op
(utils.py:83-158, :209), EDM2Loss (loss.py:9-47), and an 8-step
edm_sampler_with_mse trajectory (sampler.py:12-85).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoregressive_diffusion_tpu.models import Precond, UNetConfig, init_cache
from autoregressive_diffusion_tpu.models.attention import VideoAttention
from autoregressive_diffusion_tpu.models.layers import MPCausalConv3d
from autoregressive_diffusion_tpu.ops import numerics as nx
from autoregressive_diffusion_tpu.sampling import edm_sampler, karras_schedule
from autoregressive_diffusion_tpu.train import (EDM2LossConfig, edm2_loss,
                                                init_coefs)
from autoregressive_diffusion_tpu.utils.import_2d import (_conv_w, _conv3d_w,
                                                          _dense_w,
                                                          _import_gating,
                                                          _qkv_mcs_to_smc,
                                                          import_torch_3d)

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "reference_parity", "fixtures")
TOL = 3e-4  # reference consistency_test.py:32


def load(name):
    path = os.path.join(FIX, name)
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} missing -- run "
                    "tests/reference_parity/generate_fixtures.py")
    return dict(np.load(path))


def tl(x):  # torch video layout (b, t, c, h, w) -> ours (b, t, h, w, c)
    return np.transpose(x, (0, 1, 3, 4, 2))


def sdiff(a, b):
    return float(np.std(np.asarray(a, np.float64) - np.asarray(b, np.float64)))


# --------------------------------------------------------------------------
# numerics
# --------------------------------------------------------------------------

def test_numerics_parity():
    z = load("numerics.npz")
    x = jnp.asarray(z["norm_x"])
    assert sdiff(nx.normalize(x), z["norm_default"]) <= TOL
    assert sdiff(nx.normalize(x, axis=-1), z["norm_lastdim"]) <= TOL
    assert sdiff(nx.normalize(x, axis=1), z["norm_dim1"]) <= TOL

    # resample: torch NCHW depthwise vs ours channels-last (B, H, W, C)
    xr = jnp.asarray(np.transpose(z["resample_x"], (0, 2, 3, 1))[:, None])
    down = nx.resample(xr, mode="down")[:, 0]
    up = nx.resample(xr, mode="up")[:, 0]
    assert sdiff(down, np.transpose(z["resample_down"], (0, 2, 3, 1))) <= TOL
    assert sdiff(up, np.transpose(z["resample_up"], (0, 2, 3, 1))) <= TOL

    assert sdiff(nx.mp_silu(jnp.asarray(z["silu_x"])), z["silu_y"]) <= TOL

    a, b = jnp.asarray(z["mp_sum_a"]), jnp.asarray(z["mp_sum_b"])
    assert sdiff(nx.mp_sum(a, b, t=0.3), z["mp_sum_t03"]) <= TOL
    assert sdiff(nx.mp_sum(a, b, t=jnp.asarray(z["mp_sum_tv"])),
                 z["mp_sum_tvec"]) <= TOL

    # mp_cat: torch dim=1 of NCHW == ours axis=-1 of NHWC
    ca = jnp.asarray(np.transpose(z["mp_cat_a"], (0, 2, 3, 1)))
    cb = jnp.asarray(np.transpose(z["mp_cat_b"], (0, 2, 3, 1)))
    y = nx.mp_cat(ca, cb, axis=-1, t=0.4)
    assert sdiff(y, np.transpose(z["mp_cat_y"], (0, 2, 3, 1))) <= TOL

    fy = nx.mp_fourier(jnp.asarray(z["fourier_x"]),
                       jnp.asarray(z["fourier_freqs"]),
                       jnp.asarray(z["fourier_phases"]))
    assert sdiff(fy, z["fourier_y"]) <= TOL

    bx = jnp.asarray(z["bmult_x"])
    assert sdiff(nx.bmult(bx, jnp.asarray(z["bmult_t1"])), z["bmult_y1"]) <= TOL
    # torch bmult 2D t multiplies (b, c, ...) on dim 1; ours multiplies the
    # LAST axis -- transpose x to channels-last and back
    bxl = jnp.asarray(np.transpose(z["bmult_x"], (0, 2, 1)))
    y2 = nx.bmult(bxl, jnp.asarray(z["bmult_t2"]))
    assert sdiff(np.transpose(np.asarray(y2), (0, 2, 1)), z["bmult_y2"]) <= TOL

    gl = nx.gaussian_loss(jnp.asarray(z["gauss_mean"]),
                          jnp.asarray(z["gauss_logvar"]),
                          jnp.asarray(z["gauss_target"]))
    assert abs(float(gl) - float(z["gauss_y"])) <= TOL


# --------------------------------------------------------------------------
# MPCausal3DGatedConv
# --------------------------------------------------------------------------

def _conv_variables(z):
    mod = MPCausalConv3d(8, (3, 3, 3))
    x = jnp.asarray(tl(z["x_train"]))
    cn = jnp.asarray(z["c_noise_train"])
    variables = mod.init(jax.random.PRNGKey(0), x, cn, mode="train")
    p = jax.tree.map(np.array, dict(variables["params"]))
    p["last_frame_conv"]["w"] = _conv_w(z["sd/last_frame_conv.weight.weight"])
    p["w"] = _conv3d_w(z["sd/weight.weight"])
    _import_gating(p["gating"], {f"g.{k}": z[f"sd/gating.{k}"]
                                 for k in ("offset", "mult", "max_gating",
                                           "min_gating")}, "g")
    return mod, {"params": p}


def test_causal_conv_parity():
    z = load("conv.npz")
    mod, variables = _conv_variables(z)
    x = jnp.asarray(tl(z["x_train"]))
    cn = jnp.asarray(z["c_noise_train"])

    y, _ = mod.apply(variables, x, cn, mode="train")
    assert sdiff(y, tl(z["y_train"])) <= TOL

    y2d, _ = mod.apply(variables, x, cn, mode="train", just_2d=True)
    assert sdiff(y2d, tl(z["y_2d"])) <= TOL

    xe = jnp.asarray(tl(z["x_eval"]))
    ce = jnp.asarray(z["cn_eval"])
    y_pre, cache = mod.apply(variables, xe, ce, mode="eval",
                             update_cache=True)
    assert sdiff(y_pre, tl(z["y_prefill"])) <= TOL

    xd = jnp.asarray(tl(z["x_decode"]))
    cd = jnp.asarray(z["cn_decode"])
    y_dec, _ = mod.apply(variables, xd, cd, frames=xe.shape[1], cache=cache,
                         mode="eval", update_cache=True)
    assert sdiff(y_dec, tl(z["y_decode"])) <= TOL


# --------------------------------------------------------------------------
# VideoAttention
# --------------------------------------------------------------------------

def test_video_attention_parity():
    z = load("attention.npz")
    heads = int(z["num_heads"])
    mod = VideoAttention(32, heads, max_frames=8)
    x = jnp.asarray(tl(z["x_train"]))
    variables = mod.init(jax.random.PRNGKey(0), x, mode="train")
    p = jax.tree.map(np.array, dict(variables["params"]))
    p["attn_qkv"]["w"] = _conv_w(
        _qkv_mcs_to_smc(z["sd/attn_qkv.weight.weight"], heads))
    p["attn_proj"]["w"] = _conv_w(z["sd/attn_proj.weight.weight"])
    variables = {"params": p}

    y, _ = mod.apply(variables, x, mode="train")
    assert sdiff(y, tl(z["y_train"])) <= TOL

    y2d, _ = mod.apply(variables, x, mode="train", just_2d=True)
    assert sdiff(y2d, tl(z["y_2d"])) <= TOL

    xe = jnp.asarray(tl(z["x_eval"]))
    y_pre, cache = mod.apply(variables, xe, mode="eval", update_cache=True)
    assert sdiff(y_pre, tl(z["y_prefill"])) <= TOL

    xd = jnp.asarray(tl(z["x_decode"]))
    y_dec, _ = mod.apply(variables, xd, cache=cache, frames=xe.shape[1],
                         mode="eval", update_cache=True)
    assert sdiff(y_dec, tl(z["y_decode"])) <= TOL


# --------------------------------------------------------------------------
# Full Precond (4 modes + train input-gradient)
# --------------------------------------------------------------------------

CFG = UNetConfig(img_resolution=16, img_channels=4, label_dim=4,
                 model_channels=16, channel_mult=(1, 2), num_blocks=1,
                 video_attn_resolutions=(8,), frame_attn_resolutions=(16,),
                 channels_per_head=16, max_frames=8)


@pytest.fixture(scope="module")
def precond_setup():
    z = load("precond.npz")
    model = Precond(CFG, sigma_data=1.0)
    x = jnp.asarray(tl(z["x_train"]))
    sig = jnp.asarray(z["sigma_train"])
    cond = jnp.asarray(z["cond_train"], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, sig, cond, mode="train")
    sd = {k[3:]: v for k, v in z.items() if k.startswith("sd/")}
    variables = import_torch_3d(variables, sd, CFG)
    return model, variables, z


def test_precond_train_parity(precond_setup):
    model, variables, z = precond_setup
    x = jnp.asarray(tl(z["x_train"]))
    sig = jnp.asarray(z["sigma_train"])
    cond = jnp.asarray(z["cond_train"], jnp.int32)
    probe = jnp.asarray(tl(np.sin(
        np.arange(z["y_train"].size, dtype=np.float32) * 0.17)
        .reshape(z["y_train"].shape)))

    def f(xv):
        y, _ = model.apply(variables, xv, sig, cond, mode="train")
        return jnp.sum(y * probe), y

    (_, y), gx = jax.value_and_grad(f, has_aux=True)(x)
    assert sdiff(y, tl(z["y_train"])) <= TOL
    # input gradients (reference test.py:34-91 compares these too)
    assert sdiff(gx, tl(z["probe_grad_x"])) <= 1e-3


def test_precond_2d_parity(precond_setup):
    model, variables, z = precond_setup
    t = z["y_2d"].shape[1]
    x = jnp.asarray(tl(z["x_train"]))[:, :t]
    sig = jnp.asarray(z["sigma_train"])[:, :t]
    cond = jnp.asarray(z["cond_train"], jnp.int32)[:, :t]
    y, _ = model.apply(variables, x, sig, cond, mode="eval", just_2d=True)
    assert sdiff(y, tl(z["y_2d"])) <= TOL


def test_precond_prefill_decode_parity(precond_setup):
    model, variables, z = precond_setup
    t = z["y_prefill"].shape[1]
    x = jnp.asarray(tl(z["x_train"]))[:, :t]
    cond = jnp.asarray(z["cond_train"], jnp.int32)[:, :t]
    b = x.shape[0]
    sig = jnp.full((b, t), 0.05)
    cache = init_cache(model, variables, batch_size=b)
    y_pre, cache = model.apply(variables, x, sig, cond, cache=cache,
                               update_cache=True, mode="eval")
    assert sdiff(y_pre, tl(z["y_prefill"])) <= TOL

    xd = jnp.asarray(tl(z["x_decode"]))
    y_dec, _ = model.apply(variables, xd, jnp.full((b, 1), 1.7), cond[:, :1],
                           cache=cache, update_cache=True, mode="eval")
    assert sdiff(y_dec, tl(z["y_decode"])) <= TOL


# --------------------------------------------------------------------------
# EDM2Loss value
# --------------------------------------------------------------------------

def test_loss_parity(precond_setup):
    model, variables, _ = precond_setup
    z = load("loss.npz")
    cfg = EDM2LossConfig(P_mean=1.2, P_std=1.0, sigma_data=1.0,
                         context_noise_reduction=0.5)
    sigma = jnp.asarray(z["sigma"])
    # fixture records the raw eps (randn_like capture); the reference then
    # scales by sigma (loss.py:31)
    noise = sigma[:, :, None, None, None] * jnp.asarray(tl(z["noise"]))
    loss, aux = edm2_loss(
        model, variables, jnp.asarray(tl(z["images"])), jax.random.PRNGKey(0),
        cfg, jnp.asarray(z["cond"], jnp.int32), init_coefs(),
        sigma=sigma, noise=noise)
    assert abs(float(loss) - float(z["loss"])) <= 2e-3 * max(1, abs(float(z["loss"])))
    assert abs(float(aux["unweighted"]) - float(z["unweighted"])) \
        <= 2e-3 * max(1, abs(float(z["unweighted"])))


# --------------------------------------------------------------------------
# Sampler trajectory
# --------------------------------------------------------------------------

def test_sampler_parity(precond_setup):
    model, variables, _ = precond_setup
    z = load("sampler.npz")
    ctx = jnp.asarray(tl(z["ctx"]))
    cond = jnp.asarray(z["cond"], jnp.int32)
    b, t = ctx.shape[:2]
    t0 = float(karras_schedule(8, 0.02, 20.0, 7.0)[0])

    def prefill():
        cache = init_cache(model, variables, batch_size=b)
        _, cache = model.apply(variables, ctx, jnp.full((b, t), 0.05), cond,
                               cache=cache, update_cache=True, mode="eval")
        return cache

    shape = tuple(np.transpose(z["x_init"], (0, 1, 3, 4, 2)).shape)
    x, _, _, _ = edm_sampler(
        model, variables, prefill(), jax.random.PRNGKey(0), shape=shape,
        conditioning=cond[:, :1], num_steps=8, sigma_min=0.02, sigma_max=20.0,
        rho=7.0, x_init=jnp.asarray(tl(z["x_init"])) * t0)
    # 16 sequential UNet calls compound fp32 noise; 1e-3 std-of-diff
    assert sdiff(x, tl(z["x_final"])) <= 1e-3

    _, mses, mses_pred, _ = edm_sampler(
        model, variables, prefill(), jax.random.PRNGKey(0), shape=shape,
        conditioning=cond[:, :1], num_steps=8, sigma_min=0.02, sigma_max=20.0,
        rho=7.0, x_init=jnp.asarray(tl(z["x_init_target"])) * t0,
        target=jnp.asarray(tl(z["target"])))
    np.testing.assert_allclose(np.asarray(mses), z["mse_target"],
                               rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mses_pred), z["mse_pred_target"],
                               rtol=5e-3, atol=1e-4)


# --------------------------------------------------------------------------
# VAE stack (reference edm2/vae/vae.py; fixtures from
# generate_vae_fixtures.py -- weights randomized at record time, parity
# needs only that both sides run the same weights)
# --------------------------------------------------------------------------

def _conv3d_t2j(w):
    """torch Conv3d weight (out, in, kt, kh, kw) -> flax DHWIO."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def tl5(x):  # torch (b, c, t, h, w) -> ours (b, t, h, w, c)
    return np.transpose(x, (0, 2, 3, 4, 1))


def test_vae_group_conv_parity():
    from autoregressive_diffusion_tpu.models.vae import GroupCausalConv3d
    fx = load("vae_conv.npz")
    mod = GroupCausalConv3d(6, (4, 3, 3), group_size=2)
    variables = {"params": {"kernel": jnp.asarray(_conv3d_t2j(fx["w"])),
                            "bias": jnp.asarray(fx["b"])}}
    y, _ = mod.apply(variables, jnp.asarray(tl5(fx["x"])))
    assert sdiff(y, tl5(fx["y"])) <= TOL


def test_vae_resblock_parity():
    from autoregressive_diffusion_tpu.models.vae import VAEResBlock
    fx = load("vae_resblock.npz")
    mod = VAEResBlock(6, kernel=(4, 3, 3), group_size=2, t_cond=True)
    variables = {
        "params": {
            "conv3d0": {"kernel": jnp.asarray(_conv3d_t2j(fx["conv0_w"])),
                        "bias": jnp.asarray(fx["conv0_b"])},
            "conv3d1": {"kernel": jnp.asarray(_conv3d_t2j(fx["conv1_w"])),
                        "bias": jnp.asarray(fx["conv1_b"])},
            "t_cond": {"kernel": jnp.asarray(fx["tc_w"].T),
                       "bias": jnp.asarray(fx["tc_b"])},
        },
        "buffers": {"freqs": jnp.asarray(fx["freqs"]),
                    "phases": jnp.asarray(fx["phases"])},
    }
    y, _ = mod.apply(variables, jnp.asarray(tl5(fx["x"])),
                     jnp.asarray(fx["t"]))
    assert sdiff(y, tl5(fx["y"])) <= TOL


def test_vae_encoder_parity():
    """Full 2-block encoder: updown pixel-shuffle, compression conv with
    channel-area-interpolated residual, nested group-causal res blocks."""
    from autoregressive_diffusion_tpu.models.vae import EncoderDecoder
    fx = load("vae_encoder.npz")

    def blk(i):
        p = f"encoder_blocks/{i}"
        return {
            "compression_block": {
                "kernel": jnp.asarray(_conv3d_t2j(
                    fx[f"{p}/compression_block/weight"])),
                "bias": jnp.asarray(fx[f"{p}/compression_block/bias"])},
            "res_block_0": {
                "conv3d0": {"kernel": jnp.asarray(_conv3d_t2j(
                    fx[f"{p}/res_blocks/0/conv3d0/conv3d/weight"])),
                    "bias": jnp.asarray(
                        fx[f"{p}/res_blocks/0/conv3d0/conv3d/bias"])},
                "conv3d1": {"kernel": jnp.asarray(_conv3d_t2j(
                    fx[f"{p}/res_blocks/0/conv3d1/weight"])),
                    "bias": jnp.asarray(
                        fx[f"{p}/res_blocks/0/conv3d1/bias"])},
            },
        }

    mod = EncoderDecoder(channels=(3, 4, 6), n_res_blocks=1,
                         time_compressions=(1, 2),
                         spatial_compressions=(2, 2), coder_type="encoder")
    variables = {"params": {"encoder_block_0": blk(0),
                            "encoder_block_1": blk(1)}}
    y, _ = mod.apply(variables, jnp.asarray(tl5(fx["x"])))
    assert sdiff(y, tl5(fx["y"])) <= TOL


def test_vae_decoder_parity():
    """Full 2-block decoder: decompression conv, up pixel-shuffle,
    t-conditioned res blocks (MPFourier + modulation), final conv with
    channel-area residual, logvar-multiplier split."""
    from autoregressive_diffusion_tpu.models.vae import EncoderDecoder
    fx = load("vae_decoder.npz")

    def blk(i):
        p = f"encoder_blocks/{i}"
        params = {
            "decompression_block": {
                "kernel": jnp.asarray(_conv3d_t2j(
                    fx[f"{p}/decompression_block/weight"])),
                "bias": jnp.asarray(fx[f"{p}/decompression_block/bias"])},
            "final_conv": {
                "kernel": jnp.asarray(_conv3d_t2j(
                    fx[f"{p}/final_conv/weight"])),
                "bias": jnp.asarray(fx[f"{p}/final_conv/bias"])},
            "res_block_0": {
                "conv3d0": {"kernel": jnp.asarray(_conv3d_t2j(
                    fx[f"{p}/res_blocks/0/conv3d0/conv3d/weight"])),
                    "bias": jnp.asarray(
                        fx[f"{p}/res_blocks/0/conv3d0/conv3d/bias"])},
                "conv3d1": {"kernel": jnp.asarray(_conv3d_t2j(
                    fx[f"{p}/res_blocks/0/conv3d1/weight"])),
                    "bias": jnp.asarray(
                        fx[f"{p}/res_blocks/0/conv3d1/bias"])},
                "t_cond": {"kernel": jnp.asarray(
                    fx[f"{p}/res_blocks/0/t_cond/weight"].T),
                    "bias": jnp.asarray(
                        fx[f"{p}/res_blocks/0/t_cond/bias"])},
            },
        }
        buffers = {"res_block_0": {
            "freqs": jnp.asarray(fx[f"{p}/res_blocks/0/fourier_cond/freqs"]),
            "phases": jnp.asarray(
                fx[f"{p}/res_blocks/0/fourier_cond/phases"])}}
        return params, buffers

    p0, b0 = blk(0)
    p1, b1 = blk(1)
    mod = EncoderDecoder(channels=(3, 4, 6), n_res_blocks=1,
                         time_compressions=(1, 2),
                         spatial_compressions=(2, 2), coder_type="decoder")
    variables = {
        "params": {"encoder_block_0": p0, "encoder_block_1": p1,
                   "logvar_multiplier": jnp.asarray(
                       fx["logvar_multiplier"]).reshape(())},
        "buffers": {"encoder_block_0": b0, "encoder_block_1": b1},
    }
    mean, logvar, _ = mod.apply(variables, jnp.asarray(tl5(fx["x"])),
                                jnp.asarray(fx["t"]))
    assert sdiff(mean, tl5(fx["mean"])) <= TOL
    assert sdiff(logvar, tl5(fx["logvar"])) <= TOL


def test_vae_discriminator_parity():
    """MixedDiscriminator (discriminator.py:286-302) in eval mode:
    BatchNorm running stats, BlurPool2D/3D, GroupNorm 3D stack, per-frame +
    temporal logits concatenated along time."""
    from autoregressive_diffusion_tpu.models.discriminator import \
        MixedDiscriminator
    fx = load("vae_discriminator.npz")

    def conv2(p):  # torch Conv2d (out,in,kh,kw) -> flax HWIO
        return {"kernel": jnp.asarray(np.transpose(fx[f"{p}/weight"],
                                                   (2, 3, 1, 0))),
                "bias": jnp.asarray(fx[f"{p}/bias"])}

    def conv3(p):
        return {"kernel": jnp.asarray(_conv3d_t2j(fx[f"{p}/weight"])),
                "bias": jnp.asarray(fx[f"{p}/bias"])}

    def gn(p):
        return {"scale": jnp.asarray(fx[f"{p}/weight"]),
                "bias": jnp.asarray(fx[f"{p}/bias"])}

    def bn(p):
        return ({"scale": jnp.asarray(fx[f"{p}/weight"]),
                 "bias": jnp.asarray(fx[f"{p}/bias"])},
                {"mean": jnp.asarray(fx[f"{p}/running_mean"]),
                 "var": jnp.asarray(fx[f"{p}/running_var"])})

    d2_params, d2_stats = {"conv_in": conv2("discriminator2d/conv_in"),
                           "conv_out": conv2("discriminator2d/conv_out")}, {}
    for i in range(3):
        p = f"discriminator2d/blocks/{i}"
        n1p, n1s = bn(f"{p}/norm1")
        n2p, n2s = bn(f"{p}/norm2")
        blk = {"norm1": n1p, "norm2": n2p,
               "conv1": conv2(f"{p}/conv1"), "conv2": conv2(f"{p}/conv2")}
        if i < 2:  # downsample blocks have the blurpool+1x1 shortcut
            blk["shortcut_conv"] = conv2(f"{p}/shortcut/1")
        d2_params[f"block_{i}"] = blk
        d2_stats[f"block_{i}"] = {"norm1": n1s, "norm2": n2s}

    d3_params = {"conv_in": conv3("discriminator3d/conv_in"),
                 "conv_out": conv3("discriminator3d/conv_out")}
    for i in range(2):
        p = f"discriminator3d/blocks/{i}"
        sc = f"{p}/shortcut/1" if i == 0 else f"{p}/shortcut/0"
        d3_params[f"block_{i}"] = {
            "norm1": gn(f"{p}/norm1"), "norm2": gn(f"{p}/norm2"),
            "conv1": conv3(f"{p}/conv1"), "conv2": conv3(f"{p}/conv2"),
            "shortcut_conv": conv3(sc)}

    variables = {"params": {"discriminator2d": d2_params,
                            "discriminator3d": d3_params},
                 "batch_stats": {"discriminator2d": d2_stats}}
    model = MixedDiscriminator()
    y = model.apply(variables, jnp.asarray(tl5(fx["x"])), False)
    # ours: (b, t', h', w', 2); torch: (b, 2, t', h', w')
    assert sdiff(y, np.transpose(fx["y"], (0, 2, 3, 4, 1))) <= TOL
