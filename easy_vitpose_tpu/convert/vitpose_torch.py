"""torch ViTPose checkpoint (.pth) -> JAX params pytree.

Maps the reference's state-dict layout (key names documented at
reference model_split.py:35-48 and produced by vit_models/backbone/vit.py +
head/topdown_heatmap_simple_head.py) onto the NHWC/stacked-scan layout used by
:mod:`easy_vitpose_tpu.models`.

Layout transforms (all done once here so runtime kernels are layout-free):
* Linear weights: torch (out, in) -> (in, out).
* Patch conv: torch OIHW (D, C, kh, kw) -> flattened (kh*kw*C, D) matching the
  unfold order in models/vit.py:patch_embed.
* ConvTranspose2d: torch (Cin, Cout, kh, kw) -> spatially flipped HWIO
  (kh, kw, Cin, Cout) so lax.conv_general_dilated(lhs_dilation=2) reproduces it.
* Conv2d: torch OIHW -> HWIO.
* Per-block params are stacked on a leading depth axis for lax.scan.

Tolerant loading mirrors the reference's prefix-stripping loader
(reference vit_utils/util.py:117-228): ``module.`` prefixes are dropped.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from ..configs import ModelConfig


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def normalize_state_dict(sd: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Unwrap {'state_dict': ...} and strip 'module.' prefixes."""
    if "state_dict" in sd and isinstance(sd["state_dict"], Mapping):
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = _np(v)
    return out


def convert_vitpose_state_dict(sd: Mapping[str, Any], cfg: ModelConfig,
                               dtype=np.float32) -> Dict[str, Any]:
    """Convert a reference-format state dict to our params pytree."""
    sd = normalize_state_dict(sd)
    bb = cfg.backbone
    D = bb.embed_dim

    def lin(name):
        return sd[name + ".weight"].T.astype(dtype), sd[name + ".bias"].astype(dtype)

    # --- backbone ---
    pw = sd["backbone.patch_embed.proj.weight"]          # (D, C, kh, kw)
    patch_w = pw.transpose(2, 3, 1, 0).reshape(-1, D).astype(dtype)
    patch_b = sd["backbone.patch_embed.proj.bias"].astype(dtype)
    pos = sd["backbone.pos_embed"].astype(dtype)

    blocks = []
    for i in range(bb.depth):
        p = f"backbone.blocks.{i}"
        qkv_w, qkv_b = lin(p + ".attn.qkv")
        proj_w, proj_b = lin(p + ".attn.proj")
        fc1_w, fc1_b = lin(p + ".mlp.fc1")
        fc2_w, fc2_b = lin(p + ".mlp.fc2")
        blocks.append({
            "ln1_s": sd[p + ".norm1.weight"].astype(dtype),
            "ln1_b": sd[p + ".norm1.bias"].astype(dtype),
            "qkv_w": qkv_w, "qkv_b": qkv_b,
            "proj_w": proj_w, "proj_b": proj_b,
            "ln2_s": sd[p + ".norm2.weight"].astype(dtype),
            "ln2_b": sd[p + ".norm2.bias"].astype(dtype),
            "mlp": {"fc1_w": fc1_w, "fc1_b": fc1_b,
                    "fc2_w": fc2_w, "fc2_b": fc2_b},
        })
    stacked = _stack_blocks(blocks)

    backbone = {
        "patch_w": patch_w, "patch_b": patch_b, "pos_embed": pos,
        "blocks": stacked,
        "ln_s": sd["backbone.last_norm.weight"].astype(dtype),
        "ln_b": sd["backbone.last_norm.bias"].astype(dtype),
    }

    # --- head ---
    # reference Sequential layout: [deconv, bn, relu] * n -> indices 0,1 / 3,4 ...
    deconv, bn_state = [], []
    for i in range(len(cfg.head.deconv_kernels)):
        base = f"keypoint_head.deconv_layers.{3 * i}"
        w = sd[base + ".weight"]                         # (Cin, Cout, kh, kw)
        w = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).astype(dtype)
        bn = f"keypoint_head.deconv_layers.{3 * i + 1}"
        deconv.append({
            "w": np.ascontiguousarray(w),
            "bn": {"scale": sd[bn + ".weight"].astype(dtype),
                   "bias": sd[bn + ".bias"].astype(dtype)},
        })
        bn_state.append({
            "mean": sd[bn + ".running_mean"].astype(np.float32),
            "var": sd[bn + ".running_var"].astype(np.float32),
        })

    fw = sd["keypoint_head.final_layer.weight"]          # (K, Cin, kh, kw)
    head = {
        "deconv": deconv,
        "bn_state": bn_state,
        "final_w": fw.transpose(2, 3, 1, 0).astype(dtype),
        "final_b": sd["keypoint_head.final_layer.bias"].astype(dtype),
    }
    return {"backbone": backbone, "head": head}


def _stack_blocks(blocks):
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs), *blocks)


def load_torch_checkpoint(path: str, cfg: ModelConfig, dtype=np.float32):
    """Load a reference .pth checkpoint into a params pytree (requires torch)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    return convert_vitpose_state_dict(ckpt, cfg, dtype=dtype)
