"""Import NVIDIA EDM2 *2D* image-denoiser checkpoints into the 3D video UNet.

TPU-native rebuild of the reference's bootstrap path
(/root/reference/edm2/networks_edm2.py:238-258 `UNet.load_from_2d`,
edm2/conv.py:96-101, test.py:19-91): a pretrained 2D EDM2 UNet seeds the
video model -- every 2D conv weight lands in the corresponding
`last_frame_conv`, attention qkv/proj and embeddings copy over directly, and
the temporal-context 3D convs keep their fresh init (the Gating params start
at sigmoid(-5) ~= 0.007, so the imported model initially behaves as the 2D
model on every frame; `just_2d=True` reproduces it exactly).

Input is a flat `{name: np.ndarray}` dict in the NVIDIA EDM2 naming scheme
(`enc.64x64_block0.conv_res0.weight`, `emb_fourier.freqs`, `out_gain`, ...)
-- what `state_dict()` of the upstream 2D UNet contains. Use
`torch_state_dict_to_numpy` to convert a loaded torch checkpoint.

Layout conversions (torch -> Flax, channels-last):
  conv2d  (O, I, kh, kw) -> (kh, kw, I, O)
  dense   (O, I)         -> (I, O)
"""
from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def torch_state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    """Detach a torch state dict to numpy (torch is an optional dependency)."""
    return {k: np.asarray(v.detach().cpu().float().numpy())
            for k, v in state_dict.items()}


def _conv_w(w: np.ndarray) -> np.ndarray:
    assert w.ndim == 4, f"expected OIHW conv weight, got {w.shape}"
    return np.transpose(w, (2, 3, 1, 0))


def _dense_w(w: np.ndarray) -> np.ndarray:
    assert w.ndim == 2, f"expected (out, in) dense weight, got {w.shape}"
    return np.transpose(w)


def _set(tree: dict, path, value, target_shape=None):
    node = tree
    for k in path[:-1]:
        node = node[k]
    old = node[path[-1]]
    value = np.asarray(value, dtype=np.float32)
    if value.shape != old.shape:
        raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                         f"checkpoint {value.shape} vs model {old.shape}")
    node[path[-1]] = value.astype(old.dtype) if hasattr(old, "dtype") else value


def _import_causal_conv(params: dict, sd: Dict[str, np.ndarray], prefix: str):
    """2D conv weight -> last_frame_conv of an MPCausalConv3d
    (reference conv.py:96-101)."""
    _set(params, ("last_frame_conv", "w"), _conv_w(sd[prefix + ".weight"]))


def _qkv_mcs_to_smc(w_oihw: np.ndarray, num_heads: int) -> np.ndarray:
    """Permute a qkv projection's output channels from the reference's
    (m c s) interleave (attention_modules.py:48) to this build's contiguous
    (s m c) layout (models/attention.py). Pure relabeling of rows."""
    o, i, kh, kw = w_oihw.shape
    c = o // (3 * num_heads)
    return (w_oihw.reshape(num_heads, c, 3, i, kh, kw)
            .transpose(2, 0, 1, 3, 4, 5).reshape(o, i, kh, kw))


def _import_block(params: dict, sd: Dict[str, np.ndarray], prefix: str,
                  num_heads: int = 0):
    """Reference networks_edm2.py:95-110 Block.load_from_2d."""
    _import_causal_conv(params["conv_res0"], sd, prefix + ".conv_res0")
    _import_causal_conv(params["conv_res1"], sd, prefix + ".conv_res1")
    if prefix + ".conv_skip.weight" in sd:
        _set(params, ("conv_skip", "w"), _conv_w(sd[prefix + ".conv_skip.weight"]))
    if prefix + ".emb_linear.weight" in sd:
        _set(params, ("emb_linear", "w"), _dense_w(sd[prefix + ".emb_linear.weight"]))
    if prefix + ".emb_gain" in sd:
        _set(params, ("emb_gain",), sd[prefix + ".emb_gain"].reshape(()))
    if prefix + ".attn_qkv.weight" in sd:
        qkv = _qkv_mcs_to_smc(sd[prefix + ".attn_qkv.weight"], num_heads)
        _set(params, ("attn", "attn_qkv", "w"), _conv_w(qkv))
        _set(params, ("attn", "attn_proj", "w"), _conv_w(sd[prefix + ".attn_proj.weight"]))


def import_torch_edm2(variables, sd: Dict[str, np.ndarray], cfg):
    """Returns a copy of `variables` with all 2D-derivable weights replaced
    by the NVIDIA EDM2 2D checkpoint `sd` (reference networks_edm2.py:239-258).

    `variables` is the Flax variable dict of models.Precond (or UNet); `cfg`
    the UNetConfig used to build it.
    """
    from flax.core import unfreeze

    variables = jax.tree.map(lambda x: np.array(x), unfreeze(variables),
                             is_leaf=lambda x: x is None)
    root = variables["params"]
    unet_p = root["unet"] if "unet" in root else root
    buf_root = variables.get("buffers", {})
    unet_b = buf_root.get("unet", buf_root)

    for side, name, spec in cfg.block_layout():
        if side == "out":
            _import_causal_conv(unet_p["out_conv"], sd, "out_conv")
            continue
        prefix = f"{side}.{name}"
        target = unet_p[f"{side}_{name}"]
        if spec["kind"] == "conv":
            _import_causal_conv(target, sd, prefix)
        else:
            _import_block(target, sd, prefix,
                          num_heads=spec["cout"] // cfg.channels_per_head)

    _set(unet_p, ("emb_noise", "w"), _dense_w(sd["emb_noise.weight"]))
    if cfg.label_dim and "emb_label.weight" in sd:
        _set(unet_p, ("emb_label", "w"), _dense_w(sd["emb_label.weight"]))
    _set(unet_p, ("out_gain",), sd["out_gain"].reshape(()))
    if "emb_fourier_sigma" in unet_b:
        _set(unet_b, ("emb_fourier_sigma", "freqs"), sd["emb_fourier.freqs"])
        _set(unet_b, ("emb_fourier_sigma", "phases"), sd["emb_fourier.phases"])
    return jax.tree.map(np.asarray, variables,
                        is_leaf=lambda x: x is None)


def export_2d_state(variables, cfg) -> Dict[str, np.ndarray]:
    """Inverse of `import_torch_edm2` for the 2D-derivable subset: flattens
    the video UNet's per-frame weights back into NVIDIA EDM2 2D naming.
    Useful for round-trip tests and for exporting the just_2d submodel."""
    root = jax.tree.map(np.asarray, variables["params"])
    unet_p = root["unet"] if "unet" in root else root
    buf_root = variables.get("buffers", {})
    unet_b = buf_root.get("unet", buf_root)

    def conv_back(w):
        return np.transpose(np.asarray(w), (3, 2, 0, 1))

    sd: Dict[str, np.ndarray] = {}
    for side, name, spec in cfg.block_layout():
        if side == "out":
            sd["out_conv.weight"] = conv_back(unet_p["out_conv"]["last_frame_conv"]["w"])
            continue
        prefix = f"{side}.{name}"
        p = unet_p[f"{side}_{name}"]
        if spec["kind"] == "conv":
            sd[prefix + ".weight"] = conv_back(p["last_frame_conv"]["w"])
            continue
        sd[prefix + ".conv_res0.weight"] = conv_back(p["conv_res0"]["last_frame_conv"]["w"])
        sd[prefix + ".conv_res1.weight"] = conv_back(p["conv_res1"]["last_frame_conv"]["w"])
        if "conv_skip" in p:
            sd[prefix + ".conv_skip.weight"] = conv_back(p["conv_skip"]["w"])
        sd[prefix + ".emb_linear.weight"] = np.transpose(np.asarray(p["emb_linear"]["w"]))
        sd[prefix + ".emb_gain"] = np.asarray(p["emb_gain"]).reshape(())
        if "attn" in p:
            heads = spec["cout"] // cfg.channels_per_head
            qkv = conv_back(p["attn"]["attn_qkv"]["w"])
            o, i, kh, kw = qkv.shape
            c = o // (3 * heads)
            # invert _qkv_mcs_to_smc: ours (s m c) -> reference (m c s)
            qkv = (qkv.reshape(3, heads, c, i, kh, kw)
                   .transpose(1, 2, 0, 3, 4, 5).reshape(o, i, kh, kw))
            sd[prefix + ".attn_qkv.weight"] = qkv
            sd[prefix + ".attn_proj.weight"] = conv_back(p["attn"]["attn_proj"]["w"])

    sd["emb_noise.weight"] = np.transpose(np.asarray(unet_p["emb_noise"]["w"]))
    if "emb_label" in unet_p:
        sd["emb_label.weight"] = np.transpose(np.asarray(unet_p["emb_label"]["w"]))
    sd["out_gain"] = np.asarray(unet_p["out_gain"]).reshape(())
    if "emb_fourier_sigma" in unet_b:
        sd["emb_fourier.freqs"] = np.asarray(unet_b["emb_fourier_sigma"]["freqs"])
        sd["emb_fourier.phases"] = np.asarray(unet_b["emb_fourier_sigma"]["phases"])
    return sd


# ---------------------------------------------------------------------------
# Full 3D reference-checkpoint import (for golden parity tests and for
# loading checkpoints trained with the PyTorch reference itself).
# ---------------------------------------------------------------------------

def _conv3d_w(w: np.ndarray) -> np.ndarray:
    """torch (O, I, kt, kh, kw) -> ours (kt, kh, kw, I, O)."""
    assert w.ndim == 5, f"expected OIDHW conv3d weight, got {w.shape}"
    return np.transpose(w, (2, 3, 4, 1, 0))


def _import_gating(params: dict, sd, prefix: str):
    """Reference edm2/conv.py:104-110 Gating parameters."""
    _set(params, ("offset",), sd[prefix + ".offset"])
    _set(params, ("mult",), sd[prefix + ".mult"])
    _set(params, ("max_gating",), sd[prefix + ".max_gating"].reshape(()))
    _set(params, ("min_gating",), sd[prefix + ".min_gating"].reshape(()))


def _import_causal_conv_3d(params: dict, sd, prefix: str):
    """Full MPCausal3DGatedConv (reference conv.py:49-101): 2D last-frame
    conv + (kt-1) temporal context conv + gating. Reference MPConv wraps its
    parameter in NormalizedWeight, hence the `.weight.weight` names."""
    _set(params, ("last_frame_conv", "w"),
         _conv_w(sd[prefix + ".last_frame_conv.weight.weight"]))
    if "w" in params:  # absent when the module was only traced just_2d
        _set(params, ("w",), _conv3d_w(sd[prefix + ".weight.weight"]))
    if "gating" in params:
        _import_gating(params["gating"], sd, prefix + ".gating")


def _import_block_3d(params: dict, sd, prefix: str, num_heads: int = 0):
    _import_causal_conv_3d(params["conv_res0"], sd, prefix + ".conv_res0")
    _import_causal_conv_3d(params["conv_res1"], sd, prefix + ".conv_res1")
    if prefix + ".conv_skip.weight.weight" in sd:
        _set(params, ("conv_skip", "w"),
             _conv_w(sd[prefix + ".conv_skip.weight.weight"]))
    _set(params, ("emb_linear", "w"),
         _dense_w(sd[prefix + ".emb_linear.weight.weight"]))
    _set(params, ("emb_gain",), sd[prefix + ".emb_gain"].reshape(()))
    if prefix + ".attn_qkv.weight.weight" in sd and "attn" in params:
        qkv = _qkv_mcs_to_smc(sd[prefix + ".attn_qkv.weight.weight"],
                              num_heads)
        _set(params, ("attn", "attn_qkv", "w"), _conv_w(qkv))
        _set(params, ("attn", "attn_proj", "w"),
             _conv_w(sd[prefix + ".attn_proj.weight.weight"]))


def import_torch_3d(variables, sd, cfg):
    """Import a FULL reference 3D UNet state dict (torch naming, e.g.
    `enc.16x16_block0.conv_res0.weight.weight`) into this build's Flax
    variables. Unlike `import_torch_edm2` (2D bootstrap subset,
    networks_edm2.py:238-258) this maps every parameter: temporal context
    convs, gating, out_res. Used by tests/test_reference_parity.py."""
    from flax.core import unfreeze

    sd = {k: np.asarray(v) for k, v in sd.items()}
    variables = jax.tree.map(lambda x: np.array(x), unfreeze(variables),
                             is_leaf=lambda x: x is None)
    root = variables["params"]
    unet_p = root["unet"] if "unet" in root else root
    buf_root = variables.get("buffers", {})
    unet_b = buf_root.get("unet", buf_root)

    for side, name, spec in cfg.block_layout():
        if side == "out":
            _import_causal_conv_3d(unet_p["out_conv"], sd, "out_conv")
            continue
        prefix = f"{side}.{name}"
        target = unet_p[f"{side}_{name}"]
        if spec["kind"] == "conv":
            _import_causal_conv_3d(target, sd, prefix)
        else:
            _import_block_3d(target, sd, prefix,
                             num_heads=spec["cout"] // cfg.channels_per_head)

    _set(unet_p, ("emb_noise", "w"), _dense_w(sd["emb_noise.weight.weight"]))
    if cfg.label_dim and "emb_label.weight.weight" in sd:
        _set(unet_p, ("emb_label", "w"),
             _dense_w(sd["emb_label.weight.weight"]))
    _set(unet_p, ("out_gain",), sd["out_gain"].reshape(()))
    _import_gating(unet_p["out_res"], sd, "out_res")
    if "emb_fourier_sigma" in unet_b:
        _set(unet_b, ("emb_fourier_sigma", "freqs"), sd["emb_fourier_sigma.freqs"])
        _set(unet_b, ("emb_fourier_sigma", "phases"), sd["emb_fourier_sigma.phases"])
    return jax.tree.map(np.asarray, variables, is_leaf=lambda x: x is None)
