"""Custom-VJP fused transformer block for TRAINING.

The serving fused block (models/fused_block.py) is forward-only; training
ran the plain XLA block at ~29% step MFU (PERF.md) because every
inter-matmul tensor round-trips HBM in both the forward and backward
passes.  This module implements the whole pre-LN block as a
``jax.custom_vjp`` with three Pallas kernels:

* **forward** — the serving kernel plus (a) per-crop drop-path masks
  (stochastic depth; the default B/L/H recipes train with it), (b) a
  second output ``x1 = x + attn_branch`` saved as the residual for the
  backward MLP kernel (one extra R x D write per layer; recomputing x1 in
  backward would force the attention forward to run twice), and (c) in
  the opt-in saved-qkv flavor (EVT_TRAIN_ATTN=saved; recompute measured
  faster on v5e) the qkv projection, saved for the attention backward.
* **backward-MLP** — given (x1, dout): recompute LN2/fc1/GELU in VMEM,
  produce dx1 and the fc1/fc2/LN2 weight grads.
* **backward-ATTN** — given (x, dx1[, qkv]): recompute LN1/softmax (and
  qkv, unless saved) in VMEM, produce dx and the qkv/proj/LN1 weight
  grads.

Weight grads accumulate across grid steps into output blocks that are
revisited only on *consecutive* grid iterations — the one accumulation
pattern Pallas TPU defines (the block stays resident in VMEM between
consecutive same-index steps and is written back once after the last).
Constant-index blocks trivially satisfy this.  For wide MLPs (ViT-L/H)
the fc1/fc2 weight grads are chunked along the hidden dim; a single
``grid=(tiles, chunks)`` kernel would revisit each chunk's output block
non-consecutively across tiles (undefined on real TPU — the TPU
interpreter raises "Revisited block ... of output" for it), so the
chunked path splits into two kernels: a full-width dx kernel over
``(tiles,)`` and a weight-grad kernel over ``(chunks, tiles)`` with the
tile reduction innermost.  ``tests/test_fused_block_train.py`` pins both
gradient equality vs ``jax.grad`` of the XLA block and the TPU-interpret
pipelining check (``pltpu.InterpretParams``).

Backward math (f32):
  LN:    dx = (1/sigma) * (dxhat - mean(dxhat) - xhat * mean(dxhat*xhat)),
         dxhat = dh * scale;  dscale = sum(dh*xhat);  dbias = sum(dh)
  GELU': Phi(x) + x*phi(x),  Phi = 0.5*(1+erf(x/sqrt2)),
         phi = exp(-x^2/2)/sqrt(2*pi)
  softmax: dlogits = P * (dP - rowsum(dP * P))
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..configs import BackboneConfig
from .fused_block import _erf, _gelu_exact

Params = Dict[str, Any]

_INV_SQRT2PI = 0.3989422804014327


def _gelu_grad(x: jnp.ndarray) -> jnp.ndarray:
    """d/dx of the exact-erf GELU, f32."""
    cdf = 0.5 * (1.0 + _erf(x * 0.7071067811865476))
    pdf = jnp.exp(-0.5 * x * x) * _INV_SQRT2PI
    return cdf + x * pdf


def _ln_fwd(v, s, b, eps):
    """f32 LN returning (y, xhat, inv_sigma)."""
    vf = v.astype(jnp.float32)
    mean = jnp.mean(vf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(vf - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (vf - mean) * inv
    return xhat * s + b, xhat, inv


def _ln_bwd(dh, xhat, inv, s):
    """f32 LN input-gradient given upstream dh; also (dscale, dbias)."""
    dxhat = dh * s
    dx = inv * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
                - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    return dx, jnp.sum(dh * xhat, axis=0), jnp.sum(dh, axis=0)


# --------------------------------------------------------------- forward

def _dp_rows(dp_ref, tile_idx, G, N):
    """Gather the tile's per-crop drop-path scalars into (G*N, 1) f32."""
    base = tile_idx * G
    return jnp.concatenate([jnp.full((N, 1), dp_ref[base + g, 0],
                                     jnp.float32) for g in range(G)], axis=0)



def _fwd_kernel(x_ref, dp_ref, ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b,
                ln2_s, ln2_b, fc1_w, fc1_b, fc2_w, fc2_b,
                out_ref, x1_ref, *extra_refs,
                G: int, N: int, D: int, num_heads: int, eps: float,
                save_qkv: bool = False, save_m: bool = False):
    hd = D // num_heads
    x = x_ref[:].reshape(G * N, D)
    dt = x.dtype
    # per-crop drop-path keep (already scaled by 1/keep_prob): the full
    # (B, 1) scalar vector sits in SMEM (block == array — blocked SMEM
    # specs hit the same (8,128) tiling rule as VMEM); index by grid step
    dp = _dp_rows(dp_ref, pl.program_id(0), G, N)

    h, _, _ = _ln_fwd(x, ln1_s[0].astype(jnp.float32),
                      ln1_b[0].astype(jnp.float32), eps)
    h = h.astype(dt)
    qkv = (jnp.dot(h, qkv_w[:], preferred_element_type=jnp.float32)
           + qkv_b[0].astype(jnp.float32)).astype(dt)
    extras = list(extra_refs)
    if save_qkv:
        # saved-qkv flavor: the attention backward reads this instead of
        # re-running the 3-matmul qkv projection (see _attn_backward_padded)
        extras.pop(0)[:] = qkv.reshape(G, N, 3 * D)
    scale = hd ** -0.5
    rows_out = []
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
        rows_out.append(jnp.concatenate(head_cols, axis=-1))
    attn = jnp.concatenate(rows_out, axis=0)
    a = (jnp.dot(attn, proj_w[:], preferred_element_type=jnp.float32)
         + proj_b[0].astype(jnp.float32))
    x1 = (x.astype(jnp.float32) + a * dp).astype(dt)
    x1_ref[:] = x1.reshape(G, N, D)

    h2, _, _ = _ln_fwd(x1, ln2_s[0].astype(jnp.float32),
                       ln2_b[0].astype(jnp.float32), eps)
    h2 = h2.astype(dt)
    m = (jnp.dot(h2, fc1_w[:], preferred_element_type=jnp.float32)
         + fc1_b[0].astype(jnp.float32))
    if save_m:
        # saved-m flavor: the MLP backward reads this instead of
        # re-running the fc1 forward (see _mlp_backward_padded)
        extras.pop(0)[:] = m.astype(dt).reshape(G, N, m.shape[-1])
    g = _gelu_exact(m).astype(dt)
    m2 = (jnp.dot(g, fc2_w[:], preferred_element_type=jnp.float32)
          + fc2_b[0].astype(jnp.float32))
    out_ref[:] = (x1.astype(jnp.float32) + m2 * dp).astype(dt).reshape(G, N, D)


# ---------------------------------------------------------- backward: MLP

def _mlp_bwd_core(x1_ref, dout_ref, dp_ref, ln2_s, ln2_b, fc1_w, fc1_b,
                  fc2_w, tile_idx, G, N, D, eps, *, need_g, m_ref=None):
    """Shared recompute chain for all three MLP-backward kernels: load
    the tile, LN2 forward, fc1 forward (full- or chunk-width depending on
    the weight refs passed), then dm2 -> dg -> dm1.  Keeping this in ONE
    place guards against the three kernels silently diverging (any
    eps/precision change applies to narrow, dx and dw paths alike).

    ``m_ref`` (saved-m flavor, EVT_TRAIN_MLP) replaces the fc1-forward
    matmul with the forward kernel's saved pre-GELU activations.

    Returns (x1, dt, dout_f32, dp, s2, xhat2, inv2, h2, m, g_or_None,
    dm2, dm2c, dm1, dm1c)."""
    x1 = x1_ref[:].reshape(G * N, D)
    dt = x1.dtype
    dout = dout_ref[:].reshape(G * N, D).astype(jnp.float32)
    dp = _dp_rows(dp_ref, tile_idx, G, N)

    s2 = ln2_s[0].astype(jnp.float32)
    h2f, xhat2, inv2 = _ln_fwd(x1, s2, ln2_b[0].astype(jnp.float32), eps)
    h2 = h2f.astype(dt)
    if m_ref is not None:
        m = m_ref[:].reshape(G * N, -1).astype(jnp.float32)  # (R, H)
    else:
        m = (jnp.dot(h2, fc1_w[:], preferred_element_type=jnp.float32)
             + fc1_b[0].astype(jnp.float32))             # (R, H or Hc)
    g = _gelu_exact(m).astype(dt) if need_g else None

    dm2 = dout * dp                                      # (R, D) f32
    dm2c = dm2.astype(dt)
    dg = jax.lax.dot_general(dm2c, fc2_w[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dm1 = dg * _gelu_grad(m)
    dm1c = dm1.astype(dt)
    return x1, dt, dout, dp, s2, xhat2, inv2, h2, m, g, dm2, dm2c, dm1, dm1c


def _bwd_mlp_kernel(x1_ref, dout_ref, dp_ref, ln2_s, ln2_b,
                    fc1_w, fc1_b, fc2_w,
                    dx1_ref, dfc1w_ref, dfc1b_ref, dfc2w_ref, dfc2b_ref,
                    dln2s_ref, dln2b_ref,
                    *, G: int, N: int, D: int, eps: float, m_ref=None):
    """Full-width fused MLP backward, grid (batch tiles,).  Used when the
    f32 fc1/fc2 grad accumulators fit VMEM (D <= 768).  All weight-grad
    outputs are constant-index blocks, so the += accumulation across
    tiles is over consecutive revisits (well-defined on TPU)."""
    first_tile = pl.program_id(0) == 0
    (x1, dt, dout, dp, s2, xhat2, inv2, h2, m, g, dm2, dm2c, dm1,
     dm1c) = _mlp_bwd_core(x1_ref, dout_ref, dp_ref, ln2_s, ln2_b,
                           fc1_w, fc1_b, fc2_w, pl.program_id(0),
                           G, N, D, eps, need_g=True, m_ref=m_ref)

    dh2 = jax.lax.dot_general(dm1c, fc1_w[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dx1_ln, ds2, db2ln = _ln_bwd(dh2, xhat2, inv2, s2)
    dx1_ref[:] = (dout + dx1_ln).astype(dt).reshape(G, N, D)

    dW2 = jax.lax.dot_general(g, dm2c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dW1 = jax.lax.dot_general(h2, dm1c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)

    @pl.when(first_tile)
    def _():
        dfc1w_ref[:] = jnp.zeros_like(dfc1w_ref)
        dfc1b_ref[:] = jnp.zeros_like(dfc1b_ref)
        dfc2w_ref[:] = jnp.zeros_like(dfc2w_ref)
        dfc2b_ref[:] = jnp.zeros_like(dfc2b_ref)
        dln2s_ref[:] = jnp.zeros_like(dln2s_ref)
        dln2b_ref[:] = jnp.zeros_like(dln2b_ref)

    dfc1w_ref[:] += dW1
    dfc1b_ref[:] += jnp.sum(dm1, axis=0)[None]
    dfc2w_ref[:] += dW2
    dfc2b_ref[:] += jnp.sum(dm2, axis=0)[None]
    dln2s_ref[:] += ds2[None]
    dln2b_ref[:] += db2ln[None]


def _bwd_mlp_dx_kernel(x1_ref, dout_ref, dp_ref, ln2_s, ln2_b,
                       fc1_w, fc1_b, fc2_w,
                       dx1_ref, dfc2b_ref, dln2s_ref, dln2b_ref,
                       *, G: int, N: int, D: int, eps: float):
    """Wide-MLP path, kernel 1 of 2: dx1 + LN2/fc2-bias grads, grid
    (batch tiles,).  Full-width bf16 fc1/fc2 weights fit VMEM even at
    ViT-H (13 MB each); only the f32 weight-grad accumulators do not —
    those live in the chunked dw kernel below."""
    first_tile = pl.program_id(0) == 0
    (x1, dt, dout, dp, s2, xhat2, inv2, h2, m, _, dm2, dm2c, dm1,
     dm1c) = _mlp_bwd_core(x1_ref, dout_ref, dp_ref, ln2_s, ln2_b,
                           fc1_w, fc1_b, fc2_w, pl.program_id(0),
                           G, N, D, eps, need_g=False)

    dh2 = jax.lax.dot_general(dm1c, fc1_w[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dx1_ln, ds2, db2ln = _ln_bwd(dh2, xhat2, inv2, s2)
    dx1_ref[:] = (dout + dx1_ln).astype(dt).reshape(G, N, D)

    @pl.when(first_tile)
    def _():
        dfc2b_ref[:] = jnp.zeros_like(dfc2b_ref)
        dln2s_ref[:] = jnp.zeros_like(dln2s_ref)
        dln2b_ref[:] = jnp.zeros_like(dln2b_ref)

    dfc2b_ref[:] += jnp.sum(dm2, axis=0)[None]
    dln2s_ref[:] += ds2[None]
    dln2b_ref[:] += db2ln[None]


def _bwd_mlp_kernel_ms(x1_ref, dout_ref, dp_ref, ln2_s, ln2_b,
                       fc1_w, fc1_b, fc2_w, m_sav_ref,
                       dx1_ref, dfc1w_ref, dfc1b_ref, dfc2w_ref, dfc2b_ref,
                       dln2s_ref, dln2b_ref,
                       *, G: int, N: int, D: int, eps: float):
    """Saved-m flavor of the narrow MLP backward (EVT_TRAIN_MLP)."""
    _bwd_mlp_kernel(x1_ref, dout_ref, dp_ref, ln2_s, ln2_b,
                    fc1_w, fc1_b, fc2_w,
                    dx1_ref, dfc1w_ref, dfc1b_ref, dfc2w_ref, dfc2b_ref,
                    dln2s_ref, dln2b_ref,
                    G=G, N=N, D=D, eps=eps, m_ref=m_sav_ref)


def _bwd_mlp_dx_save_kernel(x1_ref, dout_ref, dp_ref, ln2_s, ln2_b,
                            fc1_w, fc1_b, fc2_w,
                            dx1_ref, h2_ref, dm2c_ref, dm1c_ref, g_ref,
                            dfc1b_ref, dfc2b_ref, dln2s_ref, dln2b_ref,
                            *, G: int, N: int, D: int, eps: float,
                            m_ref=None):
    """Wide-MLP saved-operand path, kernel 1 of 2 (default since r3):
    like :func:`_bwd_mlp_dx_kernel` but additionally WRITES the four bf16
    matmul operands the weight-grad kernel needs — ``h2`` (LN2 out),
    ``dm2c`` (drop-path-scaled dout), ``dm1c`` (pre-GELU grad) and ``g``
    (GELU out) — so kernel 2 is two pure matmuls instead of re-running
    the whole fc1-forward/GELU/dg chain per hidden chunk.  The recompute
    path duplicated 2 full matmul units + the GELU/LN2 vector work per
    block (x ``nj`` for the token reads); the saved operands cost one
    bf16 HBM round-trip of 2(R,D)+2(R,H) instead.  The values written
    are bitwise the ones this kernel already computed, so gradients are
    unchanged.  ``db1`` also moves here (full-width f32 ``dm1`` is in
    registers anyway)."""
    first_tile = pl.program_id(0) == 0
    (x1, dt, dout, dp, s2, xhat2, inv2, h2, m, g, dm2, dm2c, dm1,
     dm1c) = _mlp_bwd_core(x1_ref, dout_ref, dp_ref, ln2_s, ln2_b,
                           fc1_w, fc1_b, fc2_w, pl.program_id(0),
                           G, N, D, eps, need_g=True, m_ref=m_ref)
    hidden = m.shape[-1]

    dh2 = jax.lax.dot_general(dm1c, fc1_w[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dx1_ln, ds2, db2ln = _ln_bwd(dh2, xhat2, inv2, s2)
    dx1_ref[:] = (dout + dx1_ln).astype(dt).reshape(G, N, D)
    h2_ref[:] = h2.reshape(G, N, D)
    dm2c_ref[:] = dm2c.reshape(G, N, D)
    dm1c_ref[:] = dm1c.reshape(G, N, hidden)
    g_ref[:] = g.reshape(G, N, hidden)

    @pl.when(first_tile)
    def _():
        dfc1b_ref[:] = jnp.zeros_like(dfc1b_ref)
        dfc2b_ref[:] = jnp.zeros_like(dfc2b_ref)
        dln2s_ref[:] = jnp.zeros_like(dln2s_ref)
        dln2b_ref[:] = jnp.zeros_like(dln2b_ref)

    dfc1b_ref[:] += jnp.sum(dm1, axis=0)[None]
    dfc2b_ref[:] += jnp.sum(dm2, axis=0)[None]
    dln2s_ref[:] += ds2[None]
    dln2b_ref[:] += db2ln[None]


def _bwd_mlp_dx_save_kernel_ms(x1_ref, dout_ref, dp_ref, ln2_s, ln2_b,
                               fc1_w, fc1_b, fc2_w, m_sav_ref,
                               dx1_ref, h2_ref, dm2c_ref, dm1c_ref, g_ref,
                               dfc1b_ref, dfc2b_ref, dln2s_ref, dln2b_ref,
                               *, G: int, N: int, D: int, eps: float):
    """Saved-m flavor of the wide dx kernel (EVT_TRAIN_MLP)."""
    _bwd_mlp_dx_save_kernel(x1_ref, dout_ref, dp_ref, ln2_s, ln2_b,
                            fc1_w, fc1_b, fc2_w,
                            dx1_ref, h2_ref, dm2c_ref, dm1c_ref, g_ref,
                            dfc1b_ref, dfc2b_ref, dln2s_ref, dln2b_ref,
                            G=G, N=N, D=D, eps=eps, m_ref=m_sav_ref)


def _bwd_mlp_dw_saved_kernel(h2_ref, dm2c_ref, dm1c_ref, g_ref,
                             dfc1w_ref, dfc2w_ref,
                             *, G: int, N: int, D: int):
    """Wide-MLP saved-operand path, kernel 2 of 2: pure chunked weight
    grads from the bf16 operands kernel 1 saved.  Grid (hidden chunks j,
    batch tiles i) with the tile reduction innermost — each chunk's
    output blocks are revisited only on consecutive iterations."""
    i = pl.program_id(1)
    R = G * N
    h2 = h2_ref[:].reshape(R, D)
    dm2c = dm2c_ref[:].reshape(R, D)
    dm1c = dm1c_ref[:].reshape(R, -1)
    g = g_ref[:].reshape(R, -1)

    dW1 = jax.lax.dot_general(h2, dm1c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dW2 = jax.lax.dot_general(g, dm2c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        dfc1w_ref[:] = jnp.zeros_like(dfc1w_ref)
        dfc2w_ref[:] = jnp.zeros_like(dfc2w_ref)

    dfc1w_ref[:] += dW1
    dfc2w_ref[:] += dW2


def _bwd_mlp_dw_kernel(x1_ref, dout_ref, dp_ref, ln2_s, ln2_b,
                       fc1_w, fc1_b, fc2_w,
                       dfc1w_ref, dfc1b_ref, dfc2w_ref,
                       *, G: int, N: int, D: int, eps: float):
    """Wide-MLP path, kernel 2 of 2: chunked fc1/fc2 weight grads, grid
    (hidden chunks j, batch tiles i) — the tile *reduction* dim is
    innermost, so each chunk's output blocks are revisited on consecutive
    iterations only (the one accumulation pattern Pallas TPU defines;
    the previous (tiles, chunks) grid was flagged by the TPU interpreter
    as "Revisited block ... of output").  Per (j, i) step only the j-th
    fc1/fc2 weight columns/rows and their f32 grad chunks are resident;
    LN2 + the j-th fc1 column forward are recomputed from x1."""
    i = pl.program_id(1)
    (x1, dt, dout, dp, s2, xhat2, inv2, h2, m, g, dm2, dm2c, dm1,
     dm1c) = _mlp_bwd_core(x1_ref, dout_ref, dp_ref, ln2_s, ln2_b,
                           fc1_w, fc1_b, fc2_w, i, G, N, D, eps,
                           need_g=True)

    dW2 = jax.lax.dot_general(g, dm2c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dW1 = jax.lax.dot_general(h2, dm1c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        dfc1w_ref[:] = jnp.zeros_like(dfc1w_ref)
        dfc1b_ref[:] = jnp.zeros_like(dfc1b_ref)
        dfc2w_ref[:] = jnp.zeros_like(dfc2w_ref)

    dfc1w_ref[:] += dW1
    dfc1b_ref[:] += jnp.sum(dm1, axis=0)[None]
    dfc2w_ref[:] += dW2


# --------------------------------------------------------- backward: ATTN

def _bwd_attn_kernel(x_ref, dx1_ref, dp_ref, ln1_s, ln1_b,
                     qkv_w, qkv_b, proj_w,
                     dx_ref, dqkvw_ref, dqkvb_ref, dprojw_ref, dprojb_ref,
                     dln1s_ref, dln1b_ref,
                     *, G: int, N: int, D: int, num_heads: int, eps: float,
                     qkv_sav_ref=None):
    """Attention backward.  When ``qkv_sav_ref`` is bound (saved-qkv
    flavor, see EVT_TRAIN_ATTN), the forward's qkv projection is read
    back instead of re-derived — LN1 is still recomputed (needed for the
    LN backward and the dWqkv contraction operand either way)."""
    first = pl.program_id(0) == 0
    hd = D // num_heads

    x = x_ref[:].reshape(G * N, D)
    dt = x.dtype
    dx1 = dx1_ref[:].reshape(G * N, D).astype(jnp.float32)
    dp = _dp_rows(dp_ref, pl.program_id(0), G, N)

    s1 = ln1_s[0].astype(jnp.float32)
    h1f, xhat1, inv1 = _ln_fwd(x, s1, ln1_b[0].astype(jnp.float32), eps)
    h1 = h1f.astype(dt)
    if qkv_sav_ref is not None:
        qkv = qkv_sav_ref[:].reshape(G * N, 3 * D)
    else:
        qkv = (jnp.dot(h1, qkv_w[:], preferred_element_type=jnp.float32)
               + qkv_b[0].astype(jnp.float32)).astype(dt)
    scale = hd ** -0.5

    da = dx1 * dp                                        # (R, D) f32
    dac = da.astype(dt)
    dattn = jax.lax.dot_general(dac, proj_w[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)

    attn_rows = []
    dqkv_rows = []
    for g in range(G):
        rows = slice(g * N, (g + 1) * N)
        head_o, head_dq, head_dk, head_dv = [], [], [], []
        for hh in range(num_heads):
            c = hh * hd
            q = qkv[rows, c:c + hd]
            k = qkv[rows, D + c:D + c + hd]
            v = qkv[rows, 2 * D + c:2 * D + c + hd]
            logits = jax.lax.dot_general(
                q * scale, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            probs_f = jax.nn.softmax(logits, axis=-1)    # (N, N) f32
            probs = probs_f.astype(dt)
            o = jnp.dot(probs, v, preferred_element_type=jnp.float32)
            head_o.append(o.astype(dt))

            do = dattn[rows, c:c + hd].astype(dt)        # (N, hd)
            dP = jax.lax.dot_general(                    # do @ v^T
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dv = jax.lax.dot_general(                    # P^T @ do
                probs, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dlog = probs_f * (dP - jnp.sum(dP * probs_f, axis=-1,
                                           keepdims=True))
            dlogc = dlog.astype(dt)
            dq = jnp.dot(dlogc, k,
                         preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(                    # dlog^T @ q
                dlogc, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            head_dq.append(dq)
            head_dk.append(dk)
            head_dv.append(dv)
        attn_rows.append(jnp.concatenate(head_o, axis=-1))
        dqkv_rows.append(jnp.concatenate(
            head_dq + head_dk + head_dv, axis=-1))       # (N, 3D)
    attn = jnp.concatenate(attn_rows, axis=0)            # (R, D)
    dqkv = jnp.concatenate(dqkv_rows, axis=0)            # (R, 3D) f32
    dqkvc = dqkv.astype(dt)

    dh1 = jax.lax.dot_general(dqkvc, qkv_w[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dx_ln, ds1, db1ln = _ln_bwd(dh1, xhat1, inv1, s1)
    dx_ref[:] = (dx1 + dx_ln).astype(dt).reshape(G, N, D)

    dWqkv = jax.lax.dot_general(h1, dqkvc, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dWp = jax.lax.dot_general(attn, dac, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)

    @pl.when(first)
    def _():
        dqkvw_ref[:] = jnp.zeros_like(dqkvw_ref)
        dqkvb_ref[:] = jnp.zeros_like(dqkvb_ref)
        dprojw_ref[:] = jnp.zeros_like(dprojw_ref)
        dprojb_ref[:] = jnp.zeros_like(dprojb_ref)
        dln1s_ref[:] = jnp.zeros_like(dln1s_ref)
        dln1b_ref[:] = jnp.zeros_like(dln1b_ref)

    dqkvw_ref[:] += dWqkv
    dqkvb_ref[:] += jnp.sum(dqkv, axis=0)[None]
    dprojw_ref[:] += dWp
    dprojb_ref[:] += jnp.sum(da, axis=0)[None]
    dln1s_ref[:] += ds1[None]
    dln1b_ref[:] += db1ln[None]


def _bwd_attn_saved_kernel(x_ref, dx1_ref, dp_ref, ln1_s, ln1_b,
                           qkv_w, qkv_b, proj_w, qkv_sav_ref,
                           dx_ref, dqkvw_ref, dqkvb_ref, dprojw_ref,
                           dprojb_ref, dln1s_ref, dln1b_ref,
                           *, G: int, N: int, D: int, num_heads: int,
                           eps: float):
    """Saved-qkv flavor: same body, qkv read from the forward's output."""
    _bwd_attn_kernel(x_ref, dx1_ref, dp_ref, ln1_s, ln1_b,
                     qkv_w, qkv_b, proj_w,
                     dx_ref, dqkvw_ref, dqkvb_ref, dprojw_ref, dprojb_ref,
                     dln1s_ref, dln1b_ref,
                     G=G, N=N, D=D, num_heads=num_heads, eps=eps,
                     qkv_sav_ref=qkv_sav_ref)


# ------------------------------------------------------------- plumbing

from jax.experimental import pallas as pl          # noqa: E402
from jax.experimental.pallas import tpu as pltpu   # noqa: E402

import os as _os  # noqa: E402

def _vmem() -> int:
    return int(_os.environ.get("EVT_TRAIN_VMEM", 110 * 1024 * 1024))


def _vmem_mlp() -> int:
    # the G=8 MLP-backward tile needs ~115 MB scoped VMEM (120.4 MB with
    # the saved-m input block); hardware caps at 128 MB — a LIMIT, not an
    # allocation, so safe for smaller tiles, and a 125 MB limit is proven
    # on-device (the G=8-everywhere sweep, PERF.md). Own env var:
    # EVT_TRAIN_VMEM tunes the general limit without dragging this one
    # below the default tile's requirement.
    return int(_os.environ.get("EVT_TRAIN_VMEM_MLP", 123 * 1024 * 1024))


def _tile(D: int) -> int:
    ov = _os.environ.get("EVT_TRAIN_TILE")
    if ov:
        return int(ov)
    return 2 if D <= 768 else 4


def _wide_saved() -> bool:
    """Wide-MLP (ViT-L/H) backward flavor: 'saved' (default) writes the
    bf16 matmul operands from the dx kernel so the chunked weight-grad
    kernel is pure matmuls; EVT_TRAIN_WIDE=recompute keeps the r3
    re-derive-per-chunk kernels (A/B lever for bench_train.py)."""
    return _os.environ.get("EVT_TRAIN_WIDE", "saved") != "recompute"


def _attn_saved(D: int) -> bool:
    """Attention backward flavor: 'saved' writes the forward's qkv
    projection to HBM (one (R, 3D) bf16 per layer, live until that
    layer's backward) and skips the 3-matmul re-projection in the
    backward.  Default OFF for every size since the r3 on-device A/B
    (bench_train.py --ab-attn, ViT-B/64 interleaved): saved-qkv measured
    0.976x vs recompute — on v5e the extra HBM write+read of the (R, 3D)
    activation costs more than the 3 re-projection matmuls it removes
    (same verdict as the saved-m MLP flavor, 0.985x).  Recompute also
    frees the per-layer activation, protecting HBM headroom at ViT-H.
    EVT_TRAIN_ATTN=saved opts back in."""
    ov = _os.environ.get("EVT_TRAIN_ATTN")
    if ov not in (None, "", "saved", "recompute"):
        # the pre-r3 contract was "anything but 'recompute' means saved";
        # fail loudly rather than silently flipping a pinned perf config
        raise ValueError(
            f"EVT_TRAIN_ATTN={ov!r}: expected 'saved' or 'recompute'")
    return ov == "saved"


def _mlp_saved(D: int) -> bool:
    """MLP backward flavor: 'saved' writes the forward's pre-GELU fc1
    activations ((R, H) bf16 per layer, live until that layer's backward)
    and the backward skips the fc1-forward recompute matmul.  Only
    meaningful for the narrow kernel and the saved-operand wide dx
    kernel — the recompute wide flavor ignores it.

    Default OFF (EVT_TRAIN_MLP=saved opts in): the extra (G, N, H) input
    block adds ~19 MB of double-buffered VMEM to the G=8 narrow tile
    that already runs near the 128 MB cap, and VMEM overflow only
    surfaces when compiling on real hardware — flip the default once the
    on-device A/B (bench_train.py --ab-mlp) proves it compiles and wins."""
    return _os.environ.get("EVT_TRAIN_MLP") == "saved"


def saved_flags(D: int):
    """(save_qkv, save_m): which forward residuals the fused train
    kernels save vs recompute at width D.  The ONE home for the policy —
    _fused_train_fwd_impl and every external caller that must stay in
    lockstep with it (train/fast_step.py packs residual dicts from these
    flags) read it from here, so a threshold or env-flag change cannot
    leave a copy behind."""
    # the recompute wide flavor has no kernel that could consume saved m
    return _attn_saved(D), _mlp_saved(D) and (D <= 768 or _wide_saved())


def _tile_mlp_bwd(D: int) -> int:
    """Batch tile for the MLP-backward kernel only.  The r3 decompose
    sweep (PERF.md): larger tiles amortize the LN2/GELU vector work and
    lengthen the dW contraction dim — G=8 cuts bwd-MLP ~10% while the
    forward/attention kernels prefer G=2; per-kernel tiles take both.
    The saved-operand wide path adds 2(R,D)+2(R,H) bf16 output blocks to
    the dx kernel, so ViT-H drops to G=2 to stay inside scoped VMEM."""
    ov = _os.environ.get("EVT_TRAIN_TILE_MLP")
    if ov:
        return int(ov)
    if D <= 768:
        return 8
    return 2 if (D > 1024 and _wide_saved()) else 4


def _row(v):
    return v.reshape(1, -1)


def _weights_fwd(p):
    return [_row(p["ln1_s"]), _row(p["ln1_b"]), p["qkv_w"], _row(p["qkv_b"]),
            p["proj_w"], _row(p["proj_b"]), _row(p["ln2_s"]),
            _row(p["ln2_b"]), p["mlp"]["fc1_w"], _row(p["mlp"]["fc1_b"]),
            p["mlp"]["fc2_w"], _row(p["mlp"]["fc2_b"])]


def _pad(x, G):
    B = x.shape[0]
    pad = (-B) % G
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x, B, B + pad


def _const_specs(ws):
    return [pl.BlockSpec(w.shape, lambda i: tuple(0 for _ in w.shape),
                         memory_space=pltpu.VMEM) for w in ws]


def _fused_train_fwd_impl(x, dp, p, cfg: BackboneConfig, interpret: bool):
    B0, N, D = x.shape
    G = min(_tile(D), B0)
    x, B, Bp = _pad(x, G)
    dp, _, _ = _pad(dp.reshape(B0, 1).astype(jnp.float32), G)
    ws = _weights_fwd(p)
    hidden = p["mlp"]["fc1_w"].shape[-1]
    save_qkv, save_m = saved_flags(D)
    kern = functools.partial(_fwd_kernel, G=G, N=N, D=D,
                             num_heads=cfg.num_heads, eps=cfg.layer_norm_eps,
                             save_qkv=save_qkv, save_m=save_m)
    tok_spec = pl.BlockSpec((G, N, D), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    dp_spec = pl.BlockSpec((Bp, 1), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    out_specs = [tok_spec, tok_spec]
    out_shapes = [jax.ShapeDtypeStruct((Bp, N, D), x.dtype),
                  jax.ShapeDtypeStruct((Bp, N, D), x.dtype)]
    if save_qkv:
        out_specs.append(pl.BlockSpec((G, N, 3 * D), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((Bp, N, 3 * D), x.dtype))
    if save_m:
        out_specs.append(pl.BlockSpec((G, N, hidden), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((Bp, N, hidden), x.dtype))
    outs = list(pl.pallas_call(
        kern,
        grid=(Bp // G,),
        in_specs=[tok_spec, dp_spec] + _const_specs(ws),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem()),
        interpret=interpret,
    )(x, dp, *ws))
    out, x1 = outs[0][:B], outs[1][:B]
    rest = outs[2:]
    qkv = rest.pop(0) if save_qkv else None
    m_sav = rest.pop(0) if save_m else None
    return out, x1, qkv, m_sav


def _tok_dp_specs(G, N, D, Bp):
    tok_spec = pl.BlockSpec((G, N, D), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    dp_spec = pl.BlockSpec((Bp, 1), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    return tok_spec, dp_spec


def _acc_specs(shapes):
    """Constant-index accumulator outputs (f32)."""
    specs, shps = [], []
    for s in shapes:
        specs.append(pl.BlockSpec(s, lambda i: tuple(0 for _ in s),
                                  memory_space=pltpu.VMEM))
        shps.append(jax.ShapeDtypeStruct(s, jnp.float32))
    return specs, shps


def _mlp_backward_padded(x1, dout, dp, p, cfg: BackboneConfig, G: int,
                         interpret, m_sav=None):
    """Padded (Bp, N, D) inputs -> (dx1, dW1, db1, dW2, db2, ds2, dbeta2).

    ``m_sav`` (padded (Bp, N, hidden), from the forward's saved output)
    selects the saved-m kernels; None re-runs the fc1 forward in-kernel.
    Standalone so scripts/bench_train_decompose.py can time the MLP and
    attention backward kernels separately."""
    Bp, N, D = x1.shape
    hidden = p["mlp"]["fc1_w"].shape[-1]
    tok_spec, dp_spec = _tok_dp_specs(G, N, D, Bp)
    hid_in_spec = pl.BlockSpec((G, N, hidden), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    acc_specs = _acc_specs
    x = x1  # dtype reference only

    # ---- MLP backward ----
    # hidden chunking bounds VMEM for wide MLPs: without it the f32
    # dW1/dW2 accumulators alone are ~52 MB for ViT-H
    nj = 1 if D <= 768 else (2 if D <= 1024 else 4)
    if hidden % nj:
        nj = 1
    Hc = hidden // nj
    ws_mlp = [_row(p["ln2_s"]), _row(p["ln2_b"]), p["mlp"]["fc1_w"],
              _row(p["mlp"]["fc1_b"]), p["mlp"]["fc2_w"]]

    if nj == 1:
        # narrow MLP: one fused kernel, all weight-grad outputs
        # constant-index (accumulation over consecutive revisits)
        acc1, accs1 = acc_specs([(D, hidden), (1, hidden), (hidden, D),
                                 (1, D), (1, D), (1, D)])
        in_specs = [tok_spec, tok_spec, dp_spec] + _const_specs(ws_mlp)
        inputs = [x1, dout, dp] + ws_mlp
        if m_sav is not None:
            kern = functools.partial(_bwd_mlp_kernel_ms, G=G, N=N, D=D,
                                     eps=cfg.layer_norm_eps)
            in_specs.append(hid_in_spec)
            inputs.append(m_sav)
        else:
            kern = functools.partial(_bwd_mlp_kernel, G=G, N=N, D=D,
                                     eps=cfg.layer_norm_eps)
        dx1, dW1, db1, dW2, db2, ds2, dbeta2 = pl.pallas_call(
            kern,
            grid=(Bp // G,),
            in_specs=in_specs,
            out_specs=(tok_spec, *acc1),
            out_shape=(jax.ShapeDtypeStruct((Bp, N, D), x.dtype), *accs1),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_vmem_mlp()),
            interpret=interpret,
        )(*inputs)
    elif _wide_saved():
        # wide MLP (ViT-L/H), saved-operand flavor: the dx kernel writes
        # the bf16 operands (h2, dm2c, dm1c, g) + all bias/LN grads; the
        # chunked dw kernel is then two pure matmuls per (chunk, tile).
        # Cuts the 2-matmul-units + GELU/LN2 recompute duplication the
        # recompute flavor pays per block, for one transient bf16 HBM
        # round-trip (freed after the dw kernel — unlike forward
        # activation saving this adds no per-layer live memory).
        hid_spec = pl.BlockSpec((G, N, hidden), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        acc1, accs1 = acc_specs([(1, hidden), (1, D), (1, D), (1, D)])
        in_specs = [tok_spec, tok_spec, dp_spec] + _const_specs(ws_mlp)
        inputs = [x1, dout, dp] + ws_mlp
        if m_sav is not None:
            kern = functools.partial(_bwd_mlp_dx_save_kernel_ms, G=G, N=N,
                                     D=D, eps=cfg.layer_norm_eps)
            in_specs.append(hid_in_spec)
            inputs.append(m_sav)
        else:
            kern = functools.partial(_bwd_mlp_dx_save_kernel, G=G, N=N,
                                     D=D, eps=cfg.layer_norm_eps)
        (dx1, h2c, dm2c, dm1c, gc, db1, db2, ds2, dbeta2) = pl.pallas_call(
            kern,
            grid=(Bp // G,),
            in_specs=in_specs,
            out_specs=(tok_spec, tok_spec, tok_spec, hid_spec, hid_spec,
                       *acc1),
            out_shape=(jax.ShapeDtypeStruct((Bp, N, D), x.dtype),
                       jax.ShapeDtypeStruct((Bp, N, D), x.dtype),
                       jax.ShapeDtypeStruct((Bp, N, D), x.dtype),
                       jax.ShapeDtypeStruct((Bp, N, hidden), x.dtype),
                       jax.ShapeDtypeStruct((Bp, N, hidden), x.dtype),
                       *accs1),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_vmem_mlp()),
            interpret=interpret,
        )(*inputs)

        tok2 = pl.BlockSpec((G, N, D), lambda j, i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        hid2 = pl.BlockSpec((G, N, Hc), lambda j, i: (i, 0, j),
                            memory_space=pltpu.VMEM)
        kern = functools.partial(_bwd_mlp_dw_saved_kernel, G=G, N=N, D=D)
        dW1, dW2 = pl.pallas_call(
            kern,
            grid=(nj, Bp // G),
            in_specs=[tok2, tok2, hid2, hid2],
            out_specs=(
                pl.BlockSpec((D, Hc), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Hc, D), lambda j, i: (j, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(jax.ShapeDtypeStruct((D, hidden), jnp.float32),
                       jax.ShapeDtypeStruct((hidden, D), jnp.float32)),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem()),
            interpret=interpret,
        )(h2c, dm2c, dm1c, gc)
    else:
        # wide MLP (ViT-L/H), recompute flavor: two kernels so every
        # accumulating output block is revisited only consecutively (see
        # kernel docstrings); the dw kernel re-derives the fc1/GELU chain
        # per hidden chunk.
        acc1, accs1 = acc_specs([(1, D), (1, D), (1, D)])
        kern = functools.partial(_bwd_mlp_dx_kernel, G=G, N=N, D=D,
                                 eps=cfg.layer_norm_eps)
        dx1, db2, ds2, dbeta2 = pl.pallas_call(
            kern,
            grid=(Bp // G,),
            in_specs=[tok_spec, tok_spec, dp_spec] + _const_specs(ws_mlp),
            out_specs=(tok_spec, *acc1),
            out_shape=(jax.ShapeDtypeStruct((Bp, N, D), x.dtype), *accs1),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem()),
            interpret=interpret,
        )(x1, dout, dp, *ws_mlp)

        def const2(shape):
            return pl.BlockSpec(shape, lambda j, i: tuple(0 for _ in shape),
                                memory_space=pltpu.VMEM)

        tok2 = pl.BlockSpec((G, N, D), lambda j, i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        dw_in_specs = [
            tok2, tok2,
            pl.BlockSpec((Bp, 1), lambda j, i: (0, 0),
                         memory_space=pltpu.SMEM),
            const2((1, D)), const2((1, D)),                   # ln2 s/b
            pl.BlockSpec((D, Hc), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),            # fc1_w chunk
            pl.BlockSpec((1, Hc), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),            # fc1_b chunk
            pl.BlockSpec((Hc, D), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),            # fc2_w chunk
        ]
        dw_out_specs = (
            pl.BlockSpec((D, Hc), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),            # dW1
            pl.BlockSpec((1, Hc), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),            # db1
            pl.BlockSpec((Hc, D), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),            # dW2
        )
        dw_out_shapes = (
            jax.ShapeDtypeStruct((D, hidden), jnp.float32),
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),
            jax.ShapeDtypeStruct((hidden, D), jnp.float32),
        )
        kern = functools.partial(_bwd_mlp_dw_kernel, G=G, N=N, D=D,
                                 eps=cfg.layer_norm_eps)
        dW1, db1, dW2 = pl.pallas_call(
            kern,
            grid=(nj, Bp // G),
            in_specs=dw_in_specs,
            out_specs=dw_out_specs,
            out_shape=dw_out_shapes,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem()),
            interpret=interpret,
        )(x1, dout, dp, *ws_mlp)
    return dx1, dW1, db1, dW2, db2, ds2, dbeta2


def _attn_backward_padded(x, dx1, dp, p, cfg: BackboneConfig, G: int,
                          interpret, qkv=None):
    """Padded inputs -> (dx, dWqkv, dbqkv, dWp, dbp, ds1, dbeta1).

    ``qkv`` (padded (Bp, N, 3D), from the forward's saved output) selects
    the saved-qkv kernel; None re-projects qkv in-kernel."""
    Bp, N, D = x.shape
    tok_spec, dp_spec = _tok_dp_specs(G, N, D, Bp)
    ws_attn = [_row(p["ln1_s"]), _row(p["ln1_b"]), p["qkv_w"],
               _row(p["qkv_b"]), p["proj_w"]]
    attn_acc_specs, attn_acc_shapes = _acc_specs(
        [(D, 3 * D), (1, 3 * D), (D, D), (1, D), (1, D), (1, D)])
    in_specs = [tok_spec, tok_spec, dp_spec] + _const_specs(ws_attn)
    inputs = [x, dx1, dp] + ws_attn
    if qkv is not None:
        kern = functools.partial(_bwd_attn_saved_kernel, G=G, N=N, D=D,
                                 num_heads=cfg.num_heads,
                                 eps=cfg.layer_norm_eps)
        in_specs.append(pl.BlockSpec((G, N, 3 * D), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(qkv)
    else:
        kern = functools.partial(_bwd_attn_kernel, G=G, N=N, D=D,
                                 num_heads=cfg.num_heads,
                                 eps=cfg.layer_norm_eps)
    return pl.pallas_call(
        kern,
        grid=(Bp // G,),
        in_specs=in_specs,
        out_specs=(tok_spec, *attn_acc_specs),
        out_shape=(jax.ShapeDtypeStruct((Bp, N, D), x.dtype),
                   *attn_acc_shapes),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem()),
        interpret=interpret,
    )(*inputs)


def _fused_train_bwd_impl(x, x1, qkv, m_sav, dout, dp, p,
                          cfg: BackboneConfig, interpret):
    B0, N, D = x.shape
    G = min(_tile(D), B0)
    x, B, Bp = _pad(x, G)
    x1, _, _ = _pad(x1, G)
    dout, _, _ = _pad(dout, G)
    dp, _, _ = _pad(dp.reshape(B0, 1).astype(jnp.float32), G)
    # MLP backward runs its own (larger) batch tile when it divides the
    # padded batch; otherwise it falls back to the attention tile
    Gm = _tile_mlp_bwd(D)
    if Bp % Gm:
        Gm = G

    dx1, dW1, db1, dW2, db2, ds2, dbeta2 = _mlp_backward_padded(
        x1, dout, dp, p, cfg, Gm, interpret, m_sav=m_sav)
    dx, dWqkv, dbqkv, dWp, dbp, ds1, dbeta1 = _attn_backward_padded(
        x, dx1, dp, p, cfg, G, interpret, qkv=qkv)

    def like(g, ref):
        return g.reshape(ref.shape).astype(ref.dtype)

    dparams = {
        "ln1_s": like(ds1, p["ln1_s"]), "ln1_b": like(dbeta1, p["ln1_b"]),
        "qkv_w": like(dWqkv, p["qkv_w"]), "qkv_b": like(dbqkv, p["qkv_b"]),
        "proj_w": like(dWp, p["proj_w"]), "proj_b": like(dbp, p["proj_b"]),
        "ln2_s": like(ds2, p["ln2_s"]), "ln2_b": like(dbeta2, p["ln2_b"]),
        "mlp": {
            "fc1_w": like(dW1, p["mlp"]["fc1_w"]),
            "fc1_b": like(db1, p["mlp"]["fc1_b"]),
            "fc2_w": like(dW2, p["mlp"]["fc2_w"]),
            "fc2_b": like(db2, p["mlp"]["fc2_b"]),
        },
    }
    return dx[:B], dparams


def make_fused_block_train(cfg: BackboneConfig, interpret: bool = False):
    """Build the custom-VJP fused training block for a given config.

    Returns ``f(x, p, dp_keep) -> out`` where ``dp_keep`` is the (B,)
    pre-scaled drop-path keep mask (ones = no drop-path).  Differentiable
    in ``x`` and ``p``; the mask is treated as a constant (it is a Bernoulli
    draw, exactly like the XLA path's stop-gradient-free mask multiply —
    its gradient is never used).
    """

    @jax.custom_vjp
    def block(x, p, dp_keep):
        out, _, _, _ = _fused_train_fwd_impl(x, dp_keep, p, cfg, interpret)
        return out

    def fwd(x, p, dp_keep):
        out, x1, qkv, m_sav = _fused_train_fwd_impl(x, dp_keep, p, cfg,
                                                    interpret)
        return out, (x, x1, qkv, m_sav, p, dp_keep)

    def bwd(res, dout):
        x, x1, qkv, m_sav, p, dp_keep = res
        dx, dp_grads = _fused_train_bwd_impl(x, x1, qkv, m_sav, dout,
                                             dp_keep, p, cfg, interpret)
        return dx, dp_grads, jnp.zeros_like(dp_keep)

    block.defvjp(fwd, bwd)
    return block
