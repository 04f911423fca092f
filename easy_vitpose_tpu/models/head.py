"""Top-down heatmap head, TPU-first (NHWC).

Equivalent in math to the reference's ``TopdownHeatmapSimpleHead``
(reference: vit_models/head/topdown_heatmap_simple_head.py:43-193):
N deconv stages (ConvTranspose k4 s2 p1, no bias) + BatchNorm + ReLU, then a
final 1x1 (or 3x3) conv -> K heatmaps.  16x12 features -> 64x48 heatmaps.

TPU design notes:
* ConvTranspose is lowered to ``lax.conv_general_dilated`` with ``lhs_dilation``
  so XLA maps it onto the MXU like a regular conv (kernels are stored
  pre-flipped in HWIO by the converter/init).
* BatchNorm is algebraically folded into a scale+bias at inference; training
  mode computes batch statistics and returns updated running stats.
* The "simple" variant (0 deconvs, bilinear x4 upsample, 3x3 final conv;
  reference train_configs/ViTPose_base_simple_coco_256x192.py:63-67) is
  supported via ``HeadConfig.upsample``.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs import HeadConfig

Params = Dict[str, Any]
BN_EPS = 1e-5        # torch BatchNorm2d default
BN_MOMENTUM = 0.1    # torch default running-stat update rate


def conv_transpose_s2(x: jnp.ndarray, w: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """torch ConvTranspose2d(k, s=2, p=(k//2 - 1), op=0, bias=False) in NHWC.

    ``w`` is (kh, kw, Cin, Cout), already spatially flipped relative to the
    torch layout (done once at conversion/init time).
    Output spatial dims are exactly 2x the input (for k=4, p=1).
    """
    pad = kernel - 1 - (kernel // 2 - 1)  # k=4 -> 2
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_transpose_s2_phase(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Sub-pixel (phase-decomposed) twin of :func:`conv_transpose_s2` for
    k=4: mathematically the same sums, 4x fewer MACs.

    The lhs-dilated lowering convolves a 2x-dilated input whose elements are
    3/4 zeros with the full 4x4 kernel.  But each output pixel y[2i+r, 2j+c]
    only ever touches the taps w[2dr+r, 2dc+c] (the dilation parity kills
    the rest), so the deconv is exactly ONE dense 2x2 conv producing all
    four phases as 4*Cout channels, then a pixel-shuffle interleave:

        y[2i+r, 2j+c] = sum_{dr,dc} x[i-1+dr, j-1+dc] * w[2dr+r, 2dc+c]

    MXU-shaped: a single (B*(H+1)*(W+1)) x (4*Cin) x (4*Cout) matmul-conv
    with zero wasted multiplies, and its VJP is dilation-free too (a plain
    VALID k2 conv backward), which is what makes the TRAINING head cheap.
    """
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    # (4, 4, Cin, Cout) -> (dr, r, dc, c, Cin, Cout) -> k2 kernel with the
    # phase axis folded into the output channels as (r, c, Cout)
    w6 = w.reshape(2, 2, 2, 2, Cin, Cout)
    k2 = jnp.transpose(w6, (0, 2, 4, 1, 3, 5)).reshape(2, 2, Cin, 4 * Cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, k2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))     # (B, H+1, W+1, 4C)
    y = y.reshape(B, H + 1, W + 1, 2, 2, Cout)
    # phase (r, c) lives at conv output offset (r, c)
    phases = jnp.stack(
        [jnp.stack([y[:, r:H + r, c:W + c, r, c] for c in (0, 1)], axis=3)
         for r in (0, 1)], axis=2)                      # (B, H, 2, W, 2, C)
    return phases.reshape(B, 2 * H, 2 * W, Cout)


def conv_transpose_s2_packed(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Third lowering of the k=4 s=2 convT: one dense stride-1 VALID 3x3
    conv producing all four sub-pixel phases as 4*Cout channels,
    reassembled by a pure reshape/transpose.

    MEASURED NULL — kept as the documented record so the idea is not
    re-tried (repo convention, like the Pallas window sampler): on-chip
    interleaved at ViT-B/64 train fwd+bwd this measures 9.44 ms vs
    5.59 ms for 'dilated' (scripts/bench_head_train.py, r5 session; the
    r4 quiet-session dilated number is 3.60).  The MAC-count theory —
    9/4 the minimal MACs here vs 4x for 'dilated', and a scatter-free
    VJP unlike 'phase' — loses to the 4x-wider (B, H, W, 4*Cout) conv
    output and its transpose reassembly: the stage is bandwidth-bound,
    not MAC-bound, and 'dilated' writes the (2H, 2W, Cout) result
    directly.  'dilated' stays the training default
    (models/vitpose.py::TRAIN_DECONV_IMPL).

    Construction: phase (r, c) output (i, j) needs taps
    x[i+r-1+dr, j+c-1+dc] (dr, dc in {0,1}), and the union over phases
    is exactly the 3x3 window centered at (i, j) — each phase zero-pads
    the unused 5 of 9 positions:

        y[2i+r, 2j+c] = sum_{dr,dc} x[i+r-1+dr, j+c-1+dc] * w[2dr+r, 2dc+c]

    Bit-level: same sums as the lhs-dilated lowering up to float reorder
    (~1e-6 rel); value+gradient parity pinned in tests/test_head_phase.py.
    """
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    # (4, 4, Cin, Cout) -> w6[dr, r, dc, c] = w[2dr+r, 2dc+c]
    w6 = w.reshape(2, 2, 2, 2, Cin, Cout)
    # phase (r, c) occupies 3x3 positions (r+dr, c+dc): pad its 2x2 taps
    phases = [jnp.pad(w6[:, r, :, c], ((r, 1 - r), (c, 1 - c),
                                       (0, 0), (0, 0)))
              for r in (0, 1) for c in (0, 1)]           # 4 x (3,3,Cin,Cout)
    k3 = jnp.stack(phases, axis=-2)                      # (3,3,Cin,4,Cout)
    k3 = k3.reshape(3, 3, Cin, 4 * Cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, k3, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))      # (B, H, W, 4Cout)
    y = y.reshape(B, H, W, 2, 2, Cout)
    return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(B, 2 * H, 2 * W, Cout)


def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray],
           padding: str = "SAME") -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def batch_norm(x: jnp.ndarray, p: Params, *, train: bool,
               axis_name: Optional[str] = None) -> Tuple[jnp.ndarray, Params]:
    """BatchNorm2d over NHWC. Returns (y, updated_state).

    ``axis_name``: when running per-device inside ``shard_map`` over a
    data-parallel mesh axis, pass its name — batch statistics are then
    computed over the GLOBAL batch (pmean of the shard moments), matching
    the single-program semantics (torch SyncBatchNorm equivalent).
    """
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            var = jax.lax.pmean(
                jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2)), axis_name)
            n = n * jax.lax.psum(1, axis_name)
        else:
            var = jnp.var(xf, axis=(0, 1, 2))
        unbiased = var * n / max(n - 1, 1) if axis_name is None \
            else var * n / (n - 1)
        new_state = {
            "mean": (1 - BN_MOMENTUM) * p["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * p["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = p["mean"], p["var"]
        new_state = {"mean": p["mean"], "var": p["var"]}
    inv = jax.lax.rsqrt(var + BN_EPS) * p["scale"]
    y = (x.astype(jnp.float32) - mean) * inv + p["bias"]
    return y.astype(x.dtype), new_state


def head_forward(params: Params, x: jnp.ndarray, cfg: HeadConfig,
                 *, train: bool = False,
                 axis_name: Optional[str] = None,
                 deconv_impl: str = "phase") -> Tuple[jnp.ndarray, Params]:
    """(B, Hp, Wp, D) features -> (B, 4*Hp, 4*Wp, K) heatmaps (NHWC).

    Returns (heatmaps, new_bn_state) where new_bn_state mirrors
    ``params['bn_state']`` (running mean/var per deconv stage).
    ``axis_name``: see :func:`batch_norm` (global BN stats under shard_map).
    ``deconv_impl``: 'phase' (default; sub-pixel decomposition, 4x fewer
    MACs, the SERVING lowering — see :func:`conv_transpose_s2_phase`),
    'dilated' (direct lhs-dilated lowering, the TRAINING default —
    models/vitpose.py::TRAIN_DECONV_IMPL) or 'packed' (3x3-packed
    phases — a measured null kept for the record, see
    :func:`conv_transpose_s2_packed`).  All equal to float-reorder
    noise (~4e-7 rel).
    """
    new_bn = []
    for i, k in enumerate(cfg.deconv_kernels):
        if deconv_impl == "phase" and k == 4:
            x = conv_transpose_s2_phase(x, params["deconv"][i]["w"])
        elif deconv_impl == "packed" and k == 4:
            x = conv_transpose_s2_packed(x, params["deconv"][i]["w"])
        else:
            x = conv_transpose_s2(x, params["deconv"][i]["w"], k)
        y, st = batch_norm(x, {**params["deconv"][i]["bn"],
                               **params["bn_state"][i]}, train=train,
                           axis_name=axis_name)
        new_bn.append(st)
        x = jnp.maximum(y, 0)
    if cfg.upsample and cfg.upsample > 1:
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * cfg.upsample, W * cfg.upsample, C),
                             method="bilinear")
    x = conv2d(x, params["final_w"], params["final_b"],
               padding="SAME" if cfg.final_conv_kernel > 1 else "VALID")
    return x, new_bn


def init_head_params(rng: jax.Array, cfg: HeadConfig, dtype=jnp.float32) -> Params:
    """Init mirroring the reference (normal std=0.001 convs, BN gamma=1;
    reference simple_head.py:323-334)."""
    keys = jax.random.split(rng, len(cfg.deconv_filters) + 1)
    deconv, bn_state = [], []
    cin = cfg.in_channels
    for i, (f, k) in enumerate(zip(cfg.deconv_filters, cfg.deconv_kernels)):
        w = (jax.random.normal(keys[i], (k, k, cin, f)) * 0.001).astype(dtype)
        deconv.append({
            "w": w,
            "bn": {"scale": jnp.ones((f,), dtype), "bias": jnp.zeros((f,), dtype)},
        })
        bn_state.append({"mean": jnp.zeros((f,), jnp.float32),
                         "var": jnp.ones((f,), jnp.float32)})
        cin = f
    kf = cfg.final_conv_kernel
    return {
        "deconv": deconv,
        "bn_state": bn_state,
        "final_w": (jax.random.normal(keys[-1], (kf, kf, cin, cfg.num_keypoints))
                    * 0.001).astype(dtype),
        "final_b": jnp.zeros((cfg.num_keypoints,), dtype),
    }
