"""Hybrid CNN-stem embedding (reference HybridEmbed equivalent).

The reference's ``HybridEmbed`` (reference: vit_models/backbone/vit.py:231-260)
feeds an arbitrary torch CNN, takes its LAST feature map, flattens it and
projects with a Linear to ``embed_dim`` — no shipped config instantiates it
(dead upstream), but it is part of the backbone's API surface.

TPU-native re-design rather than a port: instead of wrapping an external
torch module, this is a self-contained functional conv stem —
``len(stem_channels)`` stages of [3x3 stride-2 conv -> LayerNorm -> GELU]
in NHWC (TPU's native conv layout), followed by the same flatten + Linear
projection the reference applies.  Four stride-2 stages reproduce the /16
token grid of the default PatchEmbed (256x192 -> 16x12 tokens), so the
pos-embed and everything downstream are unchanged.  Design notes:

* LayerNorm (not BatchNorm) keeps the stem stateless — no running-stat
  plumbing through jit/shard_map, and the norm is over the channels-last
  axis XLA vectorizes best.
* convs are plain ``lax.conv_general_dilated`` in NHWC/HWIO — XLA maps
  3x3 convs onto the MXU directly; no hand kernel is warranted at stem
  sizes (<2% of backbone FLOPs).
* everything is shape-static and scan/jit friendly; the stem slots in
  front of the existing block stack (fused/int8 block paths unaffected).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..configs import BackboneConfig
from .vit import layer_norm

Params = Dict[str, Any]


def stem_forward(params: Params, x: jnp.ndarray,
                 cfg: BackboneConfig) -> jnp.ndarray:
    """CNN stem + linear projection -> (B, N, D) tokens.

    Args:
      params: {"convs": [{"w": HWIO, "b": (C,)}...], "lns": [{"s","b"}...],
               "proj_w": (C_last, D), "proj_b": (D,)}.
      x: (B, H, W, 3) normalized image, NHWC.
    Returns:
      (B, Hp*Wp, D) tokens on the same /16 grid as the default PatchEmbed.
    """
    h = x
    for conv, ln in zip(params["convs"], params["lns"]):
        # no preferred_element_type: the conv transpose rule requires the
        # cotangent and weight dtypes to MATCH (unlike dot), so an f32
        # accumulate annotation breaks the bf16-AMP backward; TPU convs
        # accumulate in f32 on the MXU regardless of the HLO output dtype
        h = jax.lax.conv_general_dilated(
            h, conv["w"].astype(h.dtype),
            window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = h + conv["b"].astype(h.dtype)
        h = layer_norm(h, ln["s"], ln["b"], cfg.layer_norm_eps)
        h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    B, Hf, Wf, C = h.shape
    tokens = h.reshape(B, Hf * Wf, C)
    # flatten + Linear proj, as the reference does after its CNN
    # (vit.py:256-259)
    out = jnp.dot(tokens, params["proj_w"].astype(x.dtype),
                  preferred_element_type=jnp.float32) + params["proj_b"]
    return out.astype(x.dtype)


def init_stem_params(rng: jax.Array, cfg: BackboneConfig,
                     dtype=jnp.float32) -> Params:
    """Trunc-normal(0.02) conv/proj weights, zero biases, unit LN —
    the same scheme as the rest of the backbone (vit.py:348-366)."""
    chans = cfg.stem_channels
    assert chans, "init_stem_params called without cfg.stem_channels"
    keys = jax.random.split(rng, len(chans) + 1)

    def tn(key, shape, std=0.02):
        return (jax.random.truncated_normal(key, -2.0, 2.0, shape)
                * std).astype(dtype)

    convs, lns = [], []
    c_in = cfg.in_chans
    for k, c_out in zip(keys[:-1], chans):
        convs.append({"w": tn(k, (3, 3, c_in, c_out)),
                      "b": jnp.zeros((c_out,), dtype)})
        lns.append({"s": jnp.ones((c_out,), dtype),
                    "b": jnp.zeros((c_out,), dtype)})
        c_in = c_out
    return {
        "convs": convs,
        "lns": lns,
        "proj_w": tn(keys[-1], (chans[-1], cfg.embed_dim)),
        "proj_b": jnp.zeros((cfg.embed_dim,), dtype),
    }
