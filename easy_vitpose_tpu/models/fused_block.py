"""Pallas fused transformer block: the whole pre-LN block in one kernel.

Motivation (PERF.md): the ViT backbone runs at ~45% MFU on v5e because every
inter-matmul tensor (LN outputs, QKV, attention probs, MLP hidden) round-trips
HBM between XLA fusions — ~5-6 GB of activation traffic per ViT-B/64 step on
top of the ~11 ms of pure matmul FLOPs.  This kernel computes

    x + attn(LN1(x)) -> h;  h + MLP(LN2(h))

entirely in VMEM for a tile of G crops (G*192 token rows), so per layer the
activations cross HBM exactly once (read x, write out) and the layer weights
stream once per layer (constant index_map -> Mosaic fetches them for the
first grid step only).  Attention logits are computed in f32 *for free* —
they never leave VMEM (the XLA path had to keep them bf16 because a
materialized f32 logits tensor cost ~113 MB HBM traffic per layer).

Semantics match models/vit.py::block (reference vit_models/backbone/vit.py:
182-205): fused QKV, per-head softmax(QK^T/sqrt(d))V, exact-erf GELU,
LayerNorm eps from config, f32 LN statistics, f32 matmul accumulation.
Serving path only (no drop-path; training uses the XLA block).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..configs import BackboneConfig


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """f32 erf for the kernel: Mosaic has no erf/erfc lowering, so use the
    Abramowitz-Stegun 7.1.26 rational approximation (max abs error 1.5e-7,
    well under bf16 resolution; verified vs lax.erf in tests)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """torch nn.GELU default (exact erf form), via the in-kernel erf."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _block_kernel(x_ref, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b,
                  ln2_s, ln2_b, fc1_w, fc1_b, fc2_w, fc2_b, out_ref,
                  *, G: int, N: int, D: int, num_heads: int, eps: float):
    hd = D // num_heads
    x = x_ref[:].reshape(G * N, D)                    # (R, D) compute dtype
    dt = x.dtype

    def ln(v, s, b):
        vf = v.astype(jnp.float32)
        mean = jnp.mean(vf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(vf - mean), axis=-1, keepdims=True)
        y = (vf - mean) * jax.lax.rsqrt(var + eps)
        return (y * s[0].astype(jnp.float32)
                + b[0].astype(jnp.float32)).astype(dt)

    # ---- attention branch ----
    h = ln(x, ln1_s, ln1_b)
    qkv = (jnp.dot(h, qkv_w[:], preferred_element_type=jnp.float32)
           + qkv_b[0].astype(jnp.float32)).astype(dt)      # (R, 3D)
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
            # logits in f32: free here (VMEM-only), matches the parity path
            logits = jax.lax.dot_general(
                q * scale, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (N, N)
            probs = jax.nn.softmax(logits, axis=-1).astype(dt)
            o = jnp.dot(probs, v, preferred_element_type=jnp.float32)
            head_cols.append(o.astype(dt))
        crop_rows.append(jnp.concatenate(head_cols, axis=-1))  # (N, D)
    attn_out = jnp.concatenate(crop_rows, axis=0)              # (R, D)
    a = (jnp.dot(attn_out, proj_w[:], preferred_element_type=jnp.float32)
         + proj_b[0].astype(jnp.float32)).astype(dt)
    x = x + a

    # ---- MLP branch ----
    h = ln(x, ln2_s, ln2_b)
    m = (jnp.dot(h, fc1_w[:], preferred_element_type=jnp.float32)
         + fc1_b[0].astype(jnp.float32))
    m = _gelu_exact(m).astype(dt)                          # torch-exact erf
    m = (jnp.dot(m, fc2_w[:], preferred_element_type=jnp.float32)
         + fc2_b[0].astype(jnp.float32)).astype(dt)
    out_ref[:] = (x + m).reshape(G, N, D)


def fused_block(x: jnp.ndarray, p, cfg: BackboneConfig, *,
                crops_per_step: int = None, interpret: bool = False
                ) -> jnp.ndarray:
    """One transformer block over (B, N, D) tokens via the fused kernel.

    Args:
      x: (B, N, D) tokens (bf16 serving or f32 parity).
      p: one layer's params dict (un-stacked leaves of params["blocks"]).
      crops_per_step: G crops per grid step (B is padded to a multiple).
        Default (None) is size-dependent from TPU sweeps
        (scripts/bench_block_gsize.py + bench_detector_sizes.py): G=2 for
        D<=768 (ViT-B/64 backbone 16.2 ms vs 18.1 at G=4 — small tiles
        pipeline the token DMAs under compute best; headline bench
        3016 -> 3160 crops/s) and G=4 for ViT-L/H (bigger weights want
        bigger tiles; measured 59.4 / 112.5 ms e2e).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, D = x.shape
    if crops_per_step is None:
        crops_per_step = 2 if D <= 768 else 4
    G = min(crops_per_step, B)
    pad = (-B) % G
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, N, D), x.dtype)], axis=0)
    Bp = B + pad

    def row(v):  # 1D param -> (1, L) for TPU 2D layout
        return v.reshape(1, -1)

    weights = [row(p["ln1_s"]), row(p["ln1_b"]),
               p["qkv_w"], row(p["qkv_b"]),
               p["proj_w"], row(p["proj_b"]),
               row(p["ln2_s"]), row(p["ln2_b"]),
               p["mlp"]["fc1_w"], row(p["mlp"]["fc1_b"]),
               p["mlp"]["fc2_w"], row(p["mlp"]["fc2_b"])]
    # constant index_map: Mosaic fetches each weight block once, not per step
    # (all weights are 2D after row())
    wspecs = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                           memory_space=pltpu.VMEM) for w in weights]

    kern = functools.partial(_block_kernel, G=G, N=N, D=D,
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
