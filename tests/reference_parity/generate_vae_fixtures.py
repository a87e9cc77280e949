"""Golden-fixture generator for the VAE stack: records reference
(/root/reference/edm2/vae/vae.py) module outputs on torch CPU for
tests/test_reference_parity.py's VAE section.

Run manually:  python tests/reference_parity/generate_vae_fixtures.py
Outputs tests/reference_parity/fixtures/vae_*.npz (committed).

All weights are RANDOMIZED before recording (several reference convs are
zero-initialised, which would make the fixtures vacuous); parity only
requires that both sides run the same weights. No reference patches are
needed -- the VAE stack has no FlexAttention/NormalizedWeight/fp16-RoPE.
"""
import os
import sys

import numpy as np
import torch

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
sys.path.insert(0, REF)
os.makedirs(OUT, exist_ok=True)

from edm2.vae import vae as rvae  # noqa: E402

torch.manual_seed(33)


def rand_(m, scale=0.25):
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn_like(p) * scale)
    return m


def npz(name, **arrs):
    np.savez(os.path.join(OUT, name),
             **{k: np.asarray(v.detach() if torch.is_tensor(v) else v,
                              np.float32) for k, v in arrs.items()})
    print(f"wrote {name}: {sorted(arrs)}")


# 1. GroupCausal3DConvVAE (vae.py:18-53): group-strided conv + time
#    pixel-unshuffle, self-padding cache on first call
conv = rand_(rvae.GroupCausal3DConvVAE(4, 6, (4, 3, 3), 2))
conv.eval()
x = torch.randn(2, 4, 8, 8, 8)  # (b, c, t, h, w)
with torch.no_grad():
    y, _ = conv(x)
npz("vae_conv.npz", x=x, w=conv.conv3d.weight, b=conv.conv3d.bias, y=y)

# 2. ResBlock with t-conditioning (vae.py:56-93)
rb = rand_(rvae.ResBlock(6, kernel=(4, 3, 3), group_size=2, t_cond=True))
rb.eval()
x2 = torch.randn(2, 6, 8, 8, 8)
t = torch.rand(2)
with torch.no_grad():
    y2, _ = rb(x2, t)
npz("vae_resblock.npz", x=x2, t=t, y=y2,
    conv0_w=rb.conv3d0.conv3d.weight, conv0_b=rb.conv3d0.conv3d.bias,
    conv1_w=rb.conv3d1.weight, conv1_b=rb.conv3d1.bias,
    tc_w=rb.t_cond.weight, tc_b=rb.t_cond.bias,
    freqs=rb.fourier_cond.freqs, phases=rb.fourier_cond.phases)

# 3. Full encoder (vae.py:167-203): 2 blocks, updown pixel-shuffle,
#    channel-area-interpolated residuals, nested res blocks
enc = rand_(rvae.EncoderDecoder([3, 4, 6], 1, [1, 2], [2, 2], "encoder"))
enc.eval()
x3 = torch.randn(1, 3, 4, 16, 16)
with torch.no_grad():
    y3, _ = enc(x3, None)
sd = {k: v for k, v in enc.state_dict().items()
      if "group_size_tensor" not in k}
npz("vae_encoder.npz", x=x3, y=y3, **{k.replace(".", "/"): v
                                      for k, v in sd.items()})

# 4. Full decoder (type='decoder'): decompression conv, up pixel-shuffle,
#    t-conditioned res blocks, final conv with channel residual, logvar
#    multiplier split
dec = rand_(rvae.EncoderDecoder([3, 4, 6], 1, [1, 2], [2, 2], "decoder"))
dec.eval()
x4 = torch.randn(1, 6, 2, 4, 4)
t4 = torch.rand(1)
with torch.no_grad():
    mean4, logvar4, _ = dec(x4, t4)
sd = {k: v for k, v in dec.state_dict().items()
      if "group_size_tensor" not in k}
npz("vae_decoder.npz", x=x4, t=t4, mean=mean4, logvar=logvar4,
    **{k.replace(".", "/"): v for k, v in sd.items()})

# 5. MixedDiscriminator (discriminator.py:286-302): 2D (BatchNorm/BlurPool)
#    + 3D (GroupNorm/BlurPool3D) stacks, per-frame and temporal logits
#    concatenated along time. Eval mode (BatchNorm running stats, also
#    randomized -- var kept positive).
from edm2.vae import discriminator as rdisc  # noqa: E402

md = rand_(rdisc.MixedDiscriminator())
with torch.no_grad():
    for name, buf in md.named_buffers():
        if name.endswith("running_mean"):
            buf.copy_(0.1 * torch.randn_like(buf))
        elif name.endswith("running_var"):
            buf.copy_(0.5 + torch.rand_like(buf))
md.eval()
x5 = torch.randn(2, 6, 4, 16, 16)
with torch.no_grad():
    y5 = md(x5)
sd = {k: v for k, v in md.state_dict().items()
      if not (k.endswith("filt") or k.endswith("num_batches_tracked"))}
npz("vae_discriminator.npz", x=x5, y=y5,
    **{k.replace(".", "/"): v for k, v in sd.items()})
