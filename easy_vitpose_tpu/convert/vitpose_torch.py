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


def expected_vitpose_keys(cfg: ModelConfig):
    """The exact single-task state-dict key set :func:`convert_vitpose_state_dict`
    consumes for ``cfg`` (required, optional) — optional keys are torch
    bookkeeping buffers the math never reads (num_batches_tracked)."""
    req = {"backbone.patch_embed.proj.weight",
           "backbone.patch_embed.proj.bias",
           "backbone.pos_embed",
           "backbone.last_norm.weight", "backbone.last_norm.bias"}
    for i in range(cfg.backbone.depth):
        p = f"backbone.blocks.{i}"
        for mod in (".attn.qkv", ".attn.proj", ".mlp.fc1", ".mlp.fc2",
                    ".norm1", ".norm2"):
            req.add(p + mod + ".weight")
            req.add(p + mod + ".bias")
    opt = set()
    for i in range(len(cfg.head.deconv_kernels)):
        req.add(f"keypoint_head.deconv_layers.{3 * i}.weight")
        bn = f"keypoint_head.deconv_layers.{3 * i + 1}"
        req |= {bn + ".weight", bn + ".bias",
                bn + ".running_mean", bn + ".running_var"}
        opt.add(bn + ".num_batches_tracked")
    req |= {"keypoint_head.final_layer.weight",
            "keypoint_head.final_layer.bias"}
    return req, opt


def audit_state_dict_keys(sd: Mapping[str, Any], cfg: ModelConfig) -> None:
    """Fail loud on key-coverage drift (the reference loader's
    missing/unexpected-key report, reference vit_utils/util.py:160-171,
    hardened into an error).

    A checkpoint with EXTRA non-buffer tensors (a layer-scale gamma, split
    q/v biases from an mmpose variant, an unexpected depth) would otherwise
    be silently mis-converted — the converter indexes only expected keys —
    and the drift would surface only as an accuracy gap downstream.
    """
    req, opt = expected_vitpose_keys(cfg)
    have = set(sd)
    missing = sorted(req - have)
    unexpected = sorted(have - req - opt)
    if missing or unexpected:
        msg = [f"checkpoint layout does not match config {cfg.name!r}:"]
        if missing:
            msg.append(f"  missing {len(missing)} expected key(s): "
                       + ", ".join(missing[:8])
                       + (" ..." if len(missing) > 8 else ""))
        if unexpected:
            msg.append(f"  unexpected {len(unexpected)} source key(s) the "
                       "converter would silently drop: "
                       + ", ".join(unexpected[:8])
                       + (" ..." if len(unexpected) > 8 else ""))
        msg.append("  (pass strict=False to convert anyway, dropping the "
                   "unexpected keys; ViTPose+ MoE checkpoints go through "
                   "'cli/convert plus' or convert/model_split.py instead)")
        raise ValueError("\n".join(msg))


def convert_vitpose_state_dict(sd: Mapping[str, Any], cfg: ModelConfig,
                               dtype=np.float32,
                               strict: bool = True) -> Dict[str, Any]:
    """Convert a reference-format state dict to our params pytree.

    ``strict`` (default) audits key coverage first — any missing expected
    key or unexpected non-buffer source key is a hard error naming the
    keys (see :func:`audit_state_dict_keys`)."""
    sd = normalize_state_dict(sd)
    if strict:
        audit_state_dict_keys(sd, cfg)
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


def patch_weight_to_torch(w, patch_size: int, in_chans: int,
                          embed_dim: int) -> np.ndarray:
    """Pytree flat patch-embed weight (P*P*C, D) -> torch OIHW (D, C, P, P).

    Single source of truth for the layout inversion — used by both the
    state-dict back-export below and the ONNX graph builder
    (export/onnx_vitpose.py), so a pytree layout change has one site."""
    P, C, D = patch_size, in_chans, embed_dim
    return np.ascontiguousarray(
        np.asarray(w, np.float32).reshape(P, P, C, D).transpose(3, 2, 0, 1))


def deconv_weight_to_torch(w) -> np.ndarray:
    """Pytree pre-flipped lax deconv weight (kh, kw, Cin, Cout) -> torch
    IOHW (Cin, Cout, kh, kw) with the spatial flip undone
    (models/head.py:32-46 documents the pre-flip)."""
    return np.ascontiguousarray(
        np.asarray(w, np.float32).transpose(2, 3, 0, 1)[:, :, ::-1, ::-1])


def conv_weight_to_torch(w) -> np.ndarray:
    """Pytree HWIO conv weight -> torch OIHW."""
    return np.ascontiguousarray(
        np.asarray(w, np.float32).transpose(3, 2, 0, 1))


def load_torch_checkpoint(path: str, cfg: ModelConfig, dtype=np.float32,
                          strict: bool = True):
    """Load a reference .pth checkpoint into a params pytree (requires torch).

    ``strict`` audits key coverage (missing/unexpected keys are a hard
    error; reference's loader only prints them, vit_utils/util.py:160-171)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    return convert_vitpose_state_dict(ckpt, cfg, dtype=dtype, strict=strict)


def export_vitpose_state_dict(params: Mapping[str, Any],
                              cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_vitpose_state_dict`: params pytree ->
    reference-format torch state dict (f32 numpy, reference key names/layouts,
    documented at reference model_split.py:35-48).

    This is the deploy-back path: a checkpoint finetuned on TPU can re-enter
    the reference's torch/ONNX/TRT ecosystem (its VitInference loads raw
    state dicts directly, reference easy_ViTPose/inference.py:162-166).
    Round-trips exactly with the forward converter at f32.
    """
    def f32(x):
        return np.asarray(x, np.float32)

    bb = cfg.backbone
    D, C, P = bb.embed_dim, bb.in_chans, bb.patch_size
    bbp, head = params["backbone"], params["head"]
    sd: Dict[str, np.ndarray] = {}

    # --- backbone ---
    sd["backbone.patch_embed.proj.weight"] = patch_weight_to_torch(
        bbp["patch_w"], P, C, D)
    sd["backbone.patch_embed.proj.bias"] = f32(bbp["patch_b"])
    sd["backbone.pos_embed"] = f32(bbp["pos_embed"])

    blocks = bbp["blocks"]
    for i in range(bb.depth):
        p = f"backbone.blocks.{i}"
        b = blocks
        sd[p + ".norm1.weight"] = f32(b["ln1_s"][i])
        sd[p + ".norm1.bias"] = f32(b["ln1_b"][i])
        sd[p + ".attn.qkv.weight"] = np.ascontiguousarray(f32(b["qkv_w"][i]).T)
        sd[p + ".attn.qkv.bias"] = f32(b["qkv_b"][i])
        sd[p + ".attn.proj.weight"] = np.ascontiguousarray(f32(b["proj_w"][i]).T)
        sd[p + ".attn.proj.bias"] = f32(b["proj_b"][i])
        sd[p + ".norm2.weight"] = f32(b["ln2_s"][i])
        sd[p + ".norm2.bias"] = f32(b["ln2_b"][i])
        mlp = b["mlp"]
        sd[p + ".mlp.fc1.weight"] = np.ascontiguousarray(f32(mlp["fc1_w"][i]).T)
        sd[p + ".mlp.fc1.bias"] = f32(mlp["fc1_b"][i])
        sd[p + ".mlp.fc2.weight"] = np.ascontiguousarray(f32(mlp["fc2_w"][i]).T)
        sd[p + ".mlp.fc2.bias"] = f32(mlp["fc2_b"][i])

    sd["backbone.last_norm.weight"] = f32(bbp["ln_s"])
    sd["backbone.last_norm.bias"] = f32(bbp["ln_b"])

    # --- head (Sequential [deconv, bn, relu] * n -> indices 3i / 3i+1) ---
    for i, (dc, bn_state) in enumerate(zip(head["deconv"], head["bn_state"])):
        base = f"keypoint_head.deconv_layers.{3 * i}"
        sd[base + ".weight"] = deconv_weight_to_torch(dc["w"])
        bn = f"keypoint_head.deconv_layers.{3 * i + 1}"
        sd[bn + ".weight"] = f32(dc["bn"]["scale"])
        sd[bn + ".bias"] = f32(dc["bn"]["bias"])
        sd[bn + ".running_mean"] = f32(bn_state["mean"])
        sd[bn + ".running_var"] = f32(bn_state["var"])
        sd[bn + ".num_batches_tracked"] = np.asarray(0, np.int64)

    sd["keypoint_head.final_layer.weight"] = conv_weight_to_torch(
        head["final_w"])
    sd["keypoint_head.final_layer.bias"] = f32(head["final_b"])
    return sd


def save_torch_checkpoint(params: Mapping[str, Any], cfg: ModelConfig,
                          path: str) -> None:
    """Write params as a reference-loadable ``{'state_dict': ...}`` .pth."""
    import torch
    sd = export_vitpose_state_dict(params, cfg)
    torch.save({"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                               for k, v in sd.items()}}, path)
