"""Golden-fixture generator: records reference (PyTorch, /root/reference)
module outputs for the parity suite tests/test_reference_parity.py.

Run manually (torch CPU):  python tests/reference_parity/generate_fixtures.py
Outputs tests/reference_parity/fixtures/*.npz (committed to the repo).

Two documented patches are applied to the reference while recording -- both
reproduce the reference's own *mathematical* semantics on CPU:

1. `NormalizedWeight.forward` is replaced by its eval-mode math (single
   normalize, no in-place forced-renorm copy, conv.py:14-21): the train-mode
   in-place copy is an optimizer-step detail (this build performs it in
   train/optim.py `forced_weight_norm`, tested separately) and on fp32 CPU
   the `.to(float32)` aliases the parameter so the reference would otherwise
   double-normalize while recording.
2. RoPE tables are kept fp32 instead of the reference's `.to(torch.float16)`
   (RoPe.py:24,28) -- a CUDA-memory artifact; the TPU build computes them in
   fp32 (ops/rope.py) and parity is defined against the fp32 math.
3. FlexAttention BlockMasks hardcode device="cuda" (attention_masking.py:11)
   and cannot build on CPU; `compiled_flex_attention` is replaced by dense
   masked SDPA with the *same* mask_mod formulas (frame-granular,
   attention_masking.py:15-24, :61-64) -- the equivalence flex == dense
   masked SDPA is the reference's own consistency test
   (consistency_test.py:79-103).
"""
import os
import sys

import numpy as np
import torch
import torch.nn.functional as F

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
sys.path.insert(0, REF)
os.makedirs(OUT, exist_ok=True)

from edm2 import utils as rutils  # noqa: E402
from edm2 import conv as rconv  # noqa: E402
from edm2.attention import attention_modules as ratt  # noqa: E402
from edm2.attention import RoPe as rrope  # noqa: E402
from edm2 import networks_edm2 as rnet  # noqa: E402
from edm2 import loss as rloss  # noqa: E402
from edm2 import sampler as rsamp  # noqa: E402


# --------------------------------------------------------------------------
# Patches (see module docstring)
# --------------------------------------------------------------------------

def _pure_normalized_weight(self, gain=1):
    w = rutils.normalize(self.weight.to(torch.float32))
    return w * (gain / np.sqrt(w[0].numel()))


rconv.NormalizedWeight.forward = _pure_normalized_weight


def _fp32_rotary(self, seq_len):
    import einops
    t = torch.arange(seq_len).type_as(self.inv_freq)
    freqs = torch.einsum("i , j -> i j", t, self.inv_freq)
    freqs = torch.cat((freqs, freqs), dim=-1)  # fp32 (reference: fp16)
    power = (t - (seq_len // 2)) / self.scale_base
    scale = self.scale ** einops.rearrange(power, "n -> n 1")
    scale = torch.cat((scale, scale), dim=-1)  # fp32 (reference: fp16)
    return freqs.unsqueeze(1), scale.unsqueeze(1)


rrope.RotaryEmbedding.make_rotary_embedding = _fp32_rotary


def _train_mask_dense(n_frames, image_size):
    """TrainingMask.mask_mod (attention_masking.py:15-24), verbatim in
    numpy, expanded to token granularity."""
    L = 2 * n_frames * image_size
    f = np.arange(L) // image_size
    q, k = f[:, None], f[None, :]
    nf = n_frames
    causal_clean = q >= k
    causal_noisy = (q - nf) > k
    towards_clean = k < nf
    mask_towards_clean = (causal_clean ^ causal_noisy ^ (q < nf)) & towards_clean
    self_mask_noisy = (k >= nf) & (q == k)
    return torch.from_numpy(mask_towards_clean ^ self_mask_noisy ^ towards_clean)


def _infer_mask_dense(n_frames, image_size):
    """InferenceMask.mask_mod (attention_masking.py:61-64)."""
    L = n_frames * image_size
    f = np.arange(L) // image_size
    return torch.from_numpy(f[:, None] >= f[None, :])


def _dense_flex(q, k, v, score_mod=None, block_mask=None):
    mask = block_mask if isinstance(block_mask, torch.Tensor) else score_mod
    assert isinstance(mask, torch.Tensor)
    return F.scaled_dot_product_attention(q, k, v, attn_mask=mask)


def _patched_train_mask(batch_size, num_heads, n_frames, image_size):
    return _train_mask_dense(n_frames, image_size)


def _patched_infer_mask(batch_size, num_heads, n_frames, image_size):
    return _infer_mask_dense(n_frames, image_size), None


ratt.compiled_flex_attention = _dense_flex
ratt.make_train_mask = _patched_train_mask
# VideoAttention unpacks: score_mod, inference_mask = make_infer_mask(...)
ratt.make_infer_mask = _patched_infer_mask
rnet.VideoAttention = ratt.VideoAttention


def sd_np(module):
    return {k: v.detach().cpu().float().numpy()
            for k, v in module.state_dict().items()}


def t2np(x):
    return x.detach().cpu().float().numpy()


# --------------------------------------------------------------------------
# 1. numerics (edm2/utils.py)
# --------------------------------------------------------------------------

def gen_numerics():
    g = torch.Generator().manual_seed(0)
    out = {}
    x = torch.randn(3, 4, 5, 6, generator=g)
    out["norm_x"] = t2np(x)
    out["norm_default"] = t2np(rutils.normalize(x))
    out["norm_lastdim"] = t2np(rutils.normalize(x, dim=-1))
    out["norm_dim1"] = t2np(rutils.normalize(x, dim=1))

    xr = torch.randn(2, 3, 8, 8, generator=g)
    out["resample_x"] = t2np(xr)
    out["resample_down"] = t2np(rutils.resample(xr, mode="down"))
    out["resample_up"] = t2np(rutils.resample(xr, mode="up"))

    out["silu_x"] = t2np(x)
    out["silu_y"] = t2np(rutils.mp_silu(x))

    a = torch.randn(2, 5, 4, generator=g)
    b = torch.randn(2, 5, 4, generator=g)
    out["mp_sum_a"], out["mp_sum_b"] = t2np(a), t2np(b)
    out["mp_sum_t03"] = t2np(rutils.mp_sum(a, b, t=0.3))
    tv = torch.rand(2, generator=g)
    out["mp_sum_tv"] = t2np(tv)
    out["mp_sum_tvec"] = t2np(rutils.mp_sum(a, b, tv))

    ca = torch.randn(2, 3, 4, 4, generator=g)
    cb = torch.randn(2, 5, 4, 4, generator=g)
    out["mp_cat_a"], out["mp_cat_b"] = t2np(ca), t2np(cb)
    out["mp_cat_y"] = t2np(rutils.mp_cat(ca, cb, dim=1, t=0.4))

    four = rutils.MPFourier(16)
    fx = torch.randn(7, generator=g)
    out["fourier_freqs"] = t2np(four.freqs)
    out["fourier_phases"] = t2np(four.phases)
    out["fourier_x"] = t2np(fx)
    out["fourier_y"] = t2np(four(fx))

    bx = torch.randn(2, 3, 4, generator=g)
    bt1 = torch.rand(2, generator=g)
    bt2 = torch.rand(2, 3, generator=g)
    out["bmult_x"], out["bmult_t1"], out["bmult_t2"] = map(t2np, (bx, bt1, bt2))
    out["bmult_y1"] = t2np(rutils.bmult(bx, bt1))
    out["bmult_y2"] = t2np(rutils.bmult(bx, bt2))

    m = torch.randn(2, 3, 4, generator=g)
    lv = torch.randn(2, 3, 4, generator=g) * 0.5
    tgt = torch.randn(2, 3, 4, generator=g)
    out["gauss_mean"], out["gauss_logvar"], out["gauss_target"] = map(t2np, (m, lv, tgt))
    out["gauss_y"] = t2np(rutils.GaussianLoss(m, lv, tgt))

    np.savez(os.path.join(OUT, "numerics.npz"), **out)
    print("numerics.npz")


# --------------------------------------------------------------------------
# 2. MPCausal3DGatedConv (edm2/conv.py:49-101): train / prefill / cached /
#    just_2d
# --------------------------------------------------------------------------

def gen_conv():
    torch.manual_seed(1)
    b, t, c, co, h, w = 2, 3, 6, 8, 5, 5
    mod = rconv.MPCausal3DGatedConv(c, co, kernel=[3, 3, 3])
    out = {f"sd/{k}": v for k, v in sd_np(mod).items()}

    g = torch.Generator().manual_seed(2)
    x_base = torch.randn(b, 2 * t, c, h, w, generator=g)
    c_noise = torch.randn(b, 2 * t, generator=g)
    out["x_train"] = t2np(x_base)
    out["c_noise_train"] = t2np(c_noise)

    mod.train()
    x_flat = x_base.reshape(b * 2 * t, c, h, w)
    y, _ = mod(x_flat, None, b, c_noise)
    out["y_train"] = t2np(y.reshape(b, 2 * t, co, h, w))

    # just_2d (train shape irrelevant; uses last_frame_conv only)
    y2d, _ = mod(x_flat, None, b, c_noise, just_2d=True)
    out["y_2d"] = t2np(y2d.reshape(b, 2 * t, co, h, w))

    # eval prefill (t frames, fresh cache) + one cached decode step
    mod.eval()
    x_eval = x_base[:, :t]
    cn_eval = c_noise[:, :t]
    out["x_eval"], out["cn_eval"] = t2np(x_eval), t2np(cn_eval)
    cache = {}
    y_pre, cache = mod(x_eval.reshape(b * t, c, h, w), None, b, cn_eval,
                       cache=cache, update_cache=True)
    out["y_prefill"] = t2np(y_pre.reshape(b, t, co, h, w))

    x_new = torch.randn(b, 1, c, h, w, generator=g)
    cn_new = torch.randn(b, 1, generator=g)
    out["x_decode"], out["cn_decode"] = t2np(x_new), t2np(cn_new)
    y_dec, cache = mod(x_new.reshape(b, c, h, w), None, b, cn_new,
                       cache=cache, update_cache=True)
    out["y_decode"] = t2np(y_dec.reshape(b, 1, co, h, w))
    np.savez(os.path.join(OUT, "conv.npz"), **out)
    print("conv.npz")


# --------------------------------------------------------------------------
# 3. VideoAttention (attention_modules.py:15-88): train / prefill / decode /
#    just_2d
# --------------------------------------------------------------------------

def gen_attention():
    torch.manual_seed(3)
    b, t, ch, heads, h, w = 2, 4, 32, 2, 4, 4
    mod = ratt.VideoAttention(ch, heads)
    out = {f"sd/{k}": v for k, v in sd_np(mod).items()}
    out["num_heads"] = np.int32(heads)

    g = torch.Generator().manual_seed(4)
    x = torch.randn(b, 2 * t, ch, h, w, generator=g)
    out["x_train"] = t2np(x)
    mod.train()
    y, _ = mod(x.reshape(b * 2 * t, ch, h, w), b)
    out["y_train"] = t2np(y.reshape(b, 2 * t, ch, h, w))

    y2d, _ = mod(x.reshape(b * 2 * t, ch, h, w), b, just_2d=True)
    out["y_2d"] = t2np(y2d.reshape(b, 2 * t, ch, h, w))

    mod.eval()
    x_eval = x[:, :t]
    out["x_eval"] = t2np(x_eval)
    cache = None
    y_pre, cache = mod(x_eval.reshape(b * t, ch, h, w), b, cache=cache,
                       update_cache=True)
    out["y_prefill"] = t2np(y_pre.reshape(b, t, ch, h, w))

    x_new = torch.randn(b, 1, ch, h, w, generator=g)
    out["x_decode"] = t2np(x_new)
    y_dec, cache = mod(x_new.reshape(b, ch, h, w), b, cache=cache,
                       update_cache=True)
    out["y_decode"] = t2np(y_dec.reshape(b, 1, ch, h, w))
    np.savez(os.path.join(OUT, "attention.npz"), **out)
    print("attention.npz")


# --------------------------------------------------------------------------
# 4. Full Precond (networks_edm2.py:117-297): 4 modes + train input-grad
# --------------------------------------------------------------------------

CFG = dict(img_resolution=16, img_channels=4, label_dim=4, model_channels=16,
           channel_mult=[1, 2], num_blocks=1, video_attn_resolutions=[8],
           frame_attn_resolutions=[16], channels_per_head=16)


def build_precond():
    torch.manual_seed(5)
    unet = rnet.UNet(**CFG)
    return rnet.Precond(unet, use_fp16=False, sigma_data=1.0)


def gen_precond():
    precond = build_precond()
    out = {f"sd/{k}": v for k, v in sd_np(precond.unet).items()}

    b, t, c, res = 2, 3, CFG["img_channels"], CFG["img_resolution"]
    g = torch.Generator().manual_seed(6)
    x = torch.randn(b, 2 * t, c, res, res, generator=g)
    sigma = torch.exp(torch.randn(b, 2 * t, generator=g))
    cond = torch.randint(0, CFG["label_dim"], (b, 2 * t), generator=g)
    out["x_train"], out["sigma_train"] = t2np(x), t2np(sigma)
    out["cond_train"] = cond.numpy().astype(np.int32)

    precond.train()
    x_in = x.clone().requires_grad_(True)
    y, _ = precond(x_in, sigma, cond)
    out["y_train"] = t2np(y)
    probe = torch.sin(torch.arange(y.numel(), dtype=torch.float32) * 0.17)
    (y * probe.reshape(y.shape)).sum().backward()
    out["probe_grad_x"] = t2np(x_in.grad)

    precond.eval()
    with torch.no_grad():
        y2d, _ = precond(x[:, :t], sigma[:, :t], cond[:, :t], just_2d=True)
        out["y_2d"] = t2np(y2d)

        cache = {}
        sig_pre = torch.full((b, t), 0.05)
        y_pre, cache = precond(x[:, :t], sig_pre, cond[:, :t], cache=cache,
                               update_cache=True)
        out["y_prefill"] = t2np(y_pre)

        x_new = torch.randn(b, 1, c, res, res, generator=g)
        sig_new = torch.full((b, 1), 1.7)
        out["x_decode"] = t2np(x_new)
        y_dec, cache = precond(x_new, sig_new, cond[:, :1], cache=cache,
                               update_cache=True)
        out["y_decode"] = t2np(y_dec)
    np.savez(os.path.join(OUT, "precond.npz"), **out)
    print("precond.npz")


# --------------------------------------------------------------------------
# 5. EDM2Loss (loss.py:9-47) with recorded sigma/noise
# --------------------------------------------------------------------------

def gen_loss():
    precond = build_precond()
    precond.train()
    b, t, c, res = 2, 3, CFG["img_channels"], CFG["img_resolution"]
    g = torch.Generator().manual_seed(7)
    images = torch.randn(b, t, c, res, res, generator=g)
    cond = torch.randint(0, CFG["label_dim"], (b, t), generator=g)
    sigma_noisy = torch.exp(torch.randn(b, t, generator=g) * 1.0 + 1.2)
    sigma_ctx = (torch.rand(b, 1, generator=g) * 0.5).expand(-1, t).clone()
    sigma = torch.cat([sigma_ctx, sigma_noisy], dim=1)

    captured = {}
    orig_randn_like = torch.randn_like

    def capture(x, **kw):
        r = orig_randn_like(x, **kw)
        captured["noise"] = r.clone()
        return r

    torch.randn_like = capture
    try:
        loss_fn = rloss.EDM2Loss(P_mean=1.2, P_std=1.0, sigma_data=1.0,
                                 context_noise_reduction=0.5)
        loss, unweighted = loss_fn(precond, images, cond, sigma=sigma)
    finally:
        torch.randn_like = orig_randn_like

    np.savez(os.path.join(OUT, "loss.npz"),
             images=t2np(images), cond=cond.numpy().astype(np.int32),
             sigma=t2np(sigma), noise=t2np(captured["noise"]),
             loss=np.float32(loss.item()), unweighted=np.float32(unweighted))
    print("loss.npz")


# --------------------------------------------------------------------------
# 6. Sampler trajectory (sampler.py:12-85): 8 steps, S_churn=0, fixed noise
# --------------------------------------------------------------------------

def gen_sampler():
    precond = build_precond()
    precond.eval()
    b, t, c, res = 2, 3, CFG["img_channels"], CFG["img_resolution"]
    g = torch.Generator().manual_seed(8)
    ctx = torch.randn(b, t, c, res, res, generator=g)
    cond = torch.randint(0, CFG["label_dim"], (b, t), generator=g)

    captured = {}
    orig_randn = torch.randn

    def capture(*shape, **kw):
        kw.pop("device", None)
        r = orig_randn(*shape, **kw)
        captured.setdefault("x_init", r.clone())
        return r

    with torch.no_grad():
        cache = {}
        _, cache = precond(ctx, torch.full((b, t), 0.05), cond[:, :t],
                           cache=cache, update_cache=True)
        torch.randn = capture
        try:
            x, mse, mse_pred, cache = rsamp.edm_sampler_with_mse(
                precond, cache, conditioning=cond[:, :1], num_steps=8,
                sigma_min=0.02, sigma_max=20.0, rho=7, guidance=1, S_churn=0)
        finally:
            torch.randn = orig_randn

        # with-target variant (separate prefill; target path skips cache
        # commits so the same fresh cache state is what our side rebuilds)
        cache2 = {}
        _, cache2 = precond(ctx, torch.full((b, t), 0.05), cond[:, :t],
                            cache=cache2, update_cache=True)
        target = torch.randn(b, 1, c, res, res, generator=g) * 0.5
        captured2 = {}

        def capture2(*shape, **kw):
            kw.pop("device", None)
            r = orig_randn(*shape, **kw)
            captured2.setdefault("x_init", r.clone())
            return r

        torch.randn = capture2
        try:
            _, mse_t, mse_pred_t, _ = rsamp.edm_sampler_with_mse(
                precond, cache2, target=target, conditioning=cond[:, :1],
                num_steps=8, sigma_min=0.02, sigma_max=20.0, rho=7,
                guidance=1, S_churn=0)
        finally:
            torch.randn = orig_randn

    np.savez(os.path.join(OUT, "sampler.npz"),
             ctx=t2np(ctx), cond=cond.numpy().astype(np.int32),
             x_init=t2np(captured["x_init"]), x_final=t2np(x),
             target=t2np(target), x_init_target=t2np(captured2["x_init"]),
             mse_target=np.asarray(mse_t, np.float32),
             mse_pred_target=np.asarray(mse_pred_t, np.float32))
    print("sampler.npz")


if __name__ == "__main__":
    gen_numerics()
    gen_conv()
    gen_attention()
    gen_precond()
    gen_loss()
    gen_sampler()
