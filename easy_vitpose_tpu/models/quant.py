"""Int8 (W8A8) quantized serving path for the ViT backbone.

TPU v5e's MXU runs int8 x int8 -> int32 matmuls at 2x the bf16 peak
(394.7 TOPS vs 197 TFLOP/s), and int8 weights halve the per-layer weight
streaming that dominates ViT-L/H serving.  This module quantizes the four
big linears of every transformer block (qkv, proj, fc1, fc2 — together
~99% of backbone FLOPs) to int8 with:

* **weights**: symmetric per-output-channel int8, scales folded from the
  f32 checkpoint (`quantize_vit_params`), so each output column keeps its
  own dynamic range;
* **activations**: dynamic symmetric per-token (per-row) int8, computed
  on the fly inside the kernel from the f32 LayerNorm output — no
  calibration pass needed, and the LN output is naturally outlier-tame.

Attention itself (QK^T softmax V — ~1% of FLOPs at 192 tokens) stays in
the bf16 compute dtype with f32 logits, and LayerNorm statistics stay f32,
exactly like the bf16 fused block (models/fused_block.py).

Two implementations with identical math:

* :func:`block_q8` — plain XLA ops (runs anywhere; CPU test oracle);
* :func:`fused_block_q8` — the whole block in one Pallas VMEM kernel
  (serving path; activations cross HBM once per layer, int8 weights
  stream at half the bf16 bytes).

This is a serving-only feature beyond the reference (the reference's
fastest path is fp16 TensorRT — easy_ViTPose README; its torch path is
fp32); accuracy impact is bounded by tests (heatmap error ~1e-3 of range,
keypoint drift sub-pixel on smooth heatmaps).
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..configs import BackboneConfig

Params = Dict[str, Any]

_Q8_KEYS = ("qkv_wq", "qkv_s", "proj_wq", "proj_s")


def quantize_linear(w: jnp.ndarray, contract_axis: int = -2):
    """Symmetric per-output-channel int8 quantization of a linear weight.

    Args:
      w: (..., in, out) float weight (a leading stacked-depth axis is fine).
      contract_axis: the contraction (input) axis the scale reduces over.
    Returns:
      (w_q int8 same shape, scales float32 with ``contract_axis`` removed).
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=contract_axis)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    wq = jnp.clip(jnp.rint(wf / jnp.expand_dims(s, contract_axis)),
                  -127, 127).astype(jnp.int8)
    return wq, s.astype(jnp.float32)


def quant_rows(h: jnp.ndarray):
    """Dynamic symmetric per-row int8 quantization of activations.

    Args:
      h: (R, D) float activations (any float dtype; computed in f32).
    Returns:
      (q int8 (R, D), scales f32 (R, 1)).
    """
    hf = h.astype(jnp.float32)
    amax = jnp.max(jnp.abs(hf), axis=-1, keepdims=True)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.rint(hf / s), -127, 127).astype(jnp.int8)
    return q, s


def _linear_q8(h: jnp.ndarray, wq: jnp.ndarray, sw: jnp.ndarray,
               b: jnp.ndarray) -> jnp.ndarray:
    """f32 activations -> dynamic-quant int8 matmul -> f32 output."""
    q, sx = quant_rows(h)
    acc = jax.lax.dot_general(q, wq, (((q.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * sw.astype(jnp.float32)[None, :] \
        + b.astype(jnp.float32)


def quantize_vit_params(params: Params, compute_dtype=jnp.bfloat16) -> Params:
    """Build a serving-ready int8 params pytree from f32 ViTPose params.

    The blocks' qkv/proj/fc1/fc2 become (int8 weights, f32 per-channel
    scales); biases and LN affines stay f32 (they are applied in f32);
    everything else (patch embed, pos embed, final LN, head) is cast to
    ``compute_dtype`` like the bf16 serving path.  Quantize from the f32
    checkpoint — not from already-bf16-cast weights — so the scales keep
    full precision.
    """
    from .vitpose import cast_params

    blocks = params["backbone"]["blocks"]
    qkv_wq, qkv_s = quantize_linear(blocks["qkv_w"])
    proj_wq, proj_s = quantize_linear(blocks["proj_w"])
    fc1_wq, fc1_s = quantize_linear(blocks["mlp"]["fc1_w"])
    fc2_wq, fc2_s = quantize_linear(blocks["mlp"]["fc2_w"])
    f32 = lambda v: v.astype(jnp.float32)
    qblocks = {
        "ln1_s": f32(blocks["ln1_s"]), "ln1_b": f32(blocks["ln1_b"]),
        "ln2_s": f32(blocks["ln2_s"]), "ln2_b": f32(blocks["ln2_b"]),
        "qkv_wq": qkv_wq, "qkv_s": qkv_s, "qkv_b": f32(blocks["qkv_b"]),
        "proj_wq": proj_wq, "proj_s": proj_s, "proj_b": f32(blocks["proj_b"]),
        "mlp": {
            "fc1_wq": fc1_wq, "fc1_s": fc1_s,
            "fc1_b": f32(blocks["mlp"]["fc1_b"]),
            "fc2_wq": fc2_wq, "fc2_s": fc2_s,
            "fc2_b": f32(blocks["mlp"]["fc2_b"]),
        },
    }
    rest = {k: v for k, v in params["backbone"].items() if k != "blocks"}
    out = cast_params({"backbone": rest,
                       **{k: v for k, v in params.items()
                          if k != "backbone"}}, compute_dtype)
    out["backbone"]["blocks"] = qblocks
    return out


def is_q8_blocks(blocks: Params) -> bool:
    return all(k in blocks for k in _Q8_KEYS)


def block_q8(x: jnp.ndarray, p: Params, num_heads: int, eps: float) -> jnp.ndarray:
    """Pre-LN transformer block with int8 qkv/proj/fc1/fc2 — XLA ops.

    Same math as :func:`fused_block_q8`; the CPU-runnable oracle and the
    XLA fallback (XLA lowers the int8 dots natively on TPU too).
    """
    B, N, D = x.shape
    dt = x.dtype
    hd = D // num_heads

    def ln(v, s, b):
        vf = v.astype(jnp.float32)
        mean = jnp.mean(vf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(vf - mean), axis=-1, keepdims=True)
        return (vf - mean) * jax.lax.rsqrt(var + eps) * s + b

    def lin(h2d, wq, sw, b):
        return _linear_q8(h2d, wq, sw, b)

    h = ln(x, p["ln1_s"], p["ln1_b"]).reshape(B * N, D)
    qkv = lin(h, p["qkv_wq"], p["qkv_s"], p["qkv_b"]).astype(dt)
    qkv = qkv.reshape(B, N, 3, num_heads, hd)
    q = jnp.swapaxes(qkv[:, :, 0], 1, 2)
    k = jnp.swapaxes(qkv[:, :, 1], 1, 2)
    v = jnp.swapaxes(qkv[:, :, 2], 1, 2)
    logits = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(dt)
    o = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
    o = jnp.swapaxes(o, 1, 2).reshape(B * N, D)
    a = lin(o.astype(jnp.float32), p["proj_wq"], p["proj_s"], p["proj_b"])
    x = x + a.reshape(B, N, D).astype(dt)

    h = ln(x, p["ln2_s"], p["ln2_b"]).reshape(B * N, D)
    m = lin(h, p["mlp"]["fc1_wq"], p["mlp"]["fc1_s"], p["mlp"]["fc1_b"])
    m = jax.nn.gelu(m, approximate=False)
    m = lin(m, p["mlp"]["fc2_wq"], p["mlp"]["fc2_s"], p["mlp"]["fc2_b"])
    return x + m.reshape(B, N, D).astype(dt)


def _block_q8_kernel(x_ref, ln1_s, ln1_b, qkv_wq, qkv_s, qkv_b,
                     proj_wq, proj_s, proj_b, ln2_s, ln2_b,
                     fc1_wq, fc1_s, fc1_b, fc2_wq, fc2_s, fc2_b, out_ref,
                     *, G: int, N: int, D: int, num_heads: int, eps: float):
    from .fused_block import _gelu_exact

    hd = D // num_heads
    x = x_ref[:].reshape(G * N, D)
    dt = x.dtype

    def ln(v, s, b):
        vf = v.astype(jnp.float32)
        mean = jnp.mean(vf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(vf - mean), axis=-1, keepdims=True)
        return (vf - mean) * jax.lax.rsqrt(var + eps) * s[0] + b[0]

    def lin(h, wq, sw, b):
        q, sx = quant_rows(h)
        acc = jnp.dot(q, wq[:], preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * sx * sw[0] + b[0]

    # ---- attention branch ----
    h = ln(x, ln1_s, ln1_b)
    qkv = lin(h, qkv_wq, qkv_s, qkv_b).astype(dt)         # (R, 3D)
    scale = hd ** -0.5
    crop_rows = []
    for g in range(G):
        rows = slice(g * N, (g + 1) * N)
        head_cols = []
        for hh in range(num_heads):
            c = hh * hd
            q = qkv[rows, c:c + hd]
            k = qkv[rows, D + c:D + c + hd]
            v = qkv[rows, 2 * D + c:2 * D + c + hd]
            logits = jax.lax.dot_general(
                q * scale, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1).astype(dt)
            o = jnp.dot(probs, v, preferred_element_type=jnp.float32)
            head_cols.append(o.astype(dt))
        crop_rows.append(jnp.concatenate(head_cols, axis=-1))
    attn_out = jnp.concatenate(crop_rows, axis=0).astype(jnp.float32)
    a = lin(attn_out, proj_wq, proj_s, proj_b)
    x = x + a.astype(dt)

    # ---- MLP branch ----
    h = ln(x, ln2_s, ln2_b)
    m = lin(h, fc1_wq, fc1_s, fc1_b)
    m = _gelu_exact(m)
    m = lin(m, fc2_wq, fc2_s, fc2_b)
    out_ref[:] = (x + m.astype(dt)).reshape(G, N, D)


def fused_block_q8(x: jnp.ndarray, p: Params, cfg: BackboneConfig, *,
                   crops_per_step: int = None,
                   interpret: bool = False) -> jnp.ndarray:
    """One int8 transformer block over (B, N, D) tokens in a single Pallas
    kernel (the W8A8 twin of models/fused_block.py::fused_block)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, D = x.shape
    if crops_per_step is None:
        # Tile policy: same as the bf16 kernel. A standalone backbone sweep
        # (bench_block_gsize.py --q8, ViT-B) reads G=16 5% faster than G=2
        # (13.08 vs 13.76 ms), but the full pose step measured ~3% SLOWER
        # at G=16 (17.1 vs 16.7 ms across comparable sessions) — the bigger
        # tile's longer critical-path tail composes worse with the
        # sampler/head. G=2 is the proven e2e config.
        crops_per_step = 2 if D <= 768 else 4
    G = min(crops_per_step, B)
    pad = (-B) % G
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, N, D), x.dtype)], axis=0)
    Bp = B + pad

    def row(v):
        return v.reshape(1, -1)

    weights = [row(p["ln1_s"]), row(p["ln1_b"]),
               p["qkv_wq"], row(p["qkv_s"]), row(p["qkv_b"]),
               p["proj_wq"], row(p["proj_s"]), row(p["proj_b"]),
               row(p["ln2_s"]), row(p["ln2_b"]),
               p["mlp"]["fc1_wq"], row(p["mlp"]["fc1_s"]),
               row(p["mlp"]["fc1_b"]),
               p["mlp"]["fc2_wq"], row(p["mlp"]["fc2_s"]),
               row(p["mlp"]["fc2_b"])]
    wspecs = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                           memory_space=pltpu.VMEM) for w in weights]

    kern = functools.partial(_block_q8_kernel, G=G, N=N, D=D,
                             num_heads=cfg.num_heads,
                             eps=cfg.layer_norm_eps)
    out = pl.pallas_call(
        kern,
        grid=(Bp // G,),
        in_specs=[pl.BlockSpec((G, N, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] + wspecs,
        out_specs=pl.BlockSpec((G, N, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, N, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, *weights)
    return out[:B] if pad else out
