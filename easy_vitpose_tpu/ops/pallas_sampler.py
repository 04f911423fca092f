"""Pallas crop sampler: window-streamed bilinear crop+pad+resize.

The XLA samplers (ops/preprocess.py) are >20x off speed-of-light because
they either gather element-by-element (7.7 ms) or interpolate with dense
(OW, W) matmuls over the FULL frame height for every crop (5.7 ms — the
x-pass alone is ~150 GFLOP at 1080p/64 crops).  This kernel (the ROADMAP r1
item 1 design) streams the frame through VMEM in 64-row windows and only
computes windows that intersect a crop's y-span:

  grid = (M crops, H/64 windows); frame is planar (3, H, W) uint8, one
  (3, 64, W) window block per step (Mosaic pipelines the window DMAs).

  per crop (first window): build the one-hot 2-tap x-interp matrix
    Wx (W, OW) from the crop geometry into persistent VMEM scratch —
    encodes crop offset, zero padding and edge clamping, exactly the
    column math of sample_crops.
  per in-span window (scalar-prefetch conditional; out-of-span windows do
  nothing): per channel
    x-reduce:  xr = win(64, W) @ Wx            -> (64, OW)   [MXU]
    y-accumulate: acc += Gy_w(OH, 64) @ xr     -> (OH, OW)   [MXU]
  where Gy_w holds each output row's 2-tap y weights masked to this window.
  Last window writes acc to the output block.

FLOPs per crop drop from ~2.7 GF to ~hc/H * (2*64*W*OW*3) + y-pass — about
5x less, and the window DMA traffic is the uint8 frame once per crop-span.

Numerics match sample_crops (same half-pixel mapping, zero padding, edge
clamps); bf16 taps quantize like the bf16 gather path (~0.5/255/pixel, the
reference's own uint8 resize noise scale).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..configs import IMAGE_SIZE

WINDOW = 64  # frame rows per grid step


def _sampler_kernel(geom_ref, frame_ref, out_ref, wx_ref, acc_ref,
                    *, W: int, OW: int, OH: int, n_win: int, dtype):
    m = pl.program_id(0)
    w = pl.program_id(1)

    x1 = geom_ref[m, 0]
    wc = geom_ref[m, 1]
    left = geom_ref[m, 2]
    wp = geom_ref[m, 3]
    y1 = geom_ref[m, 4]
    hc = geom_ref[m, 5]
    top = geom_ref[m, 6]
    hp = geom_ref[m, 7]

    # ---- once per crop: x-interp matrix + clear the accumulator ----
    @pl.when(w == 0)
    def _():
        o = jax.lax.broadcasted_iota(jnp.int32, (W, OW), 1)
        wpix = jax.lax.broadcasted_iota(jnp.int32, (W, OW), 0)
        wpf = wp.astype(jnp.float32)
        sx = (o.astype(jnp.float32) + 0.5) * (wpf / OW) - 0.5
        sx = jnp.clip(sx, 0.0, wpf - 1.0)
        px0 = jnp.floor(sx).astype(jnp.int32)     # padded-crop x of tap 0
        fx = sx - px0.astype(jnp.float32)
        px1 = jnp.minimum(px0 + 1, wp - 1)

        def tap(px, wt):
            in_x = (px >= left) & (px < left + wc)
            gx = jnp.clip(px - left + x1, 0, W - 1)
            return jnp.where((wpix == gx) & in_x, wt, 0.0)

        wx_ref[:] = (tap(px0, 1.0 - fx) + tap(px1, fx)).astype(dtype)
        acc_ref[:] = jnp.zeros((3, OH, OW), jnp.float32)

    # ---- in-span windows: x-reduce + y-accumulate ----
    span_lo = w * WINDOW
    in_span = (span_lo < y1 + hc) & (span_lo + WINDOW > y1)

    @pl.when(in_span)
    def _():
        oh = jax.lax.broadcasted_iota(jnp.int32, (OH, WINDOW), 0)
        r = jax.lax.broadcasted_iota(jnp.int32, (OH, WINDOW), 1)
        hpf = hp.astype(jnp.float32)
        sy = (oh.astype(jnp.float32) + 0.5) * (hpf / OH) - 0.5
        sy = jnp.clip(sy, 0.0, hpf - 1.0)
        py0 = jnp.floor(sy).astype(jnp.int32)     # padded-crop y of tap 0
        fy = sy - py0.astype(jnp.float32)
        py1 = jnp.minimum(py0 + 1, hp - 1)

        def tap(py, wt):
            in_y = (py >= top) & (py < top + hc)
            gy = py - top + y1                    # frame row of this tap
            return jnp.where((r == gy - span_lo) & in_y, wt, 0.0)

        gy_w = (tap(py0, 1.0 - fy) + tap(py1, fy)).astype(dtype)  # (OH, 64)
        for c in range(3):
            # Mosaic has no direct uint8->bf16 cast; go via int32/f32
            win = (frame_ref[c].astype(jnp.int32)
                   .astype(jnp.float32).astype(dtype))            # (64, W)
            xr = jnp.dot(win, wx_ref[:],
                         preferred_element_type=jnp.float32)      # (64, OW)
            # channel-OUTERMOST accumulator: (OH, OW) writes are clean
            # (sublane, lane) tiles; a channel-minor layout made every
            # accumulate a strided 3-lane write (measured 10x slowdown)
            acc_ref[c] += jnp.dot(gy_w, xr.astype(dtype),
                                  preferred_element_type=jnp.float32)

    @pl.when(w == n_win - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def sample_crops_pallas(frame: jnp.ndarray, geo,
                        out_wh: Tuple[int, int] = IMAGE_SIZE,
                        sample_dtype=jnp.bfloat16,
                        interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for sample_crops/sample_crops_matmul.

    Args:
      frame: (H, W, 3) uint8 RGB frame.
      geo: crop_geometry(...) output for M boxes.
    Returns:
      (M, OH, OW, 3) ``sample_dtype`` crops in [0, 255].
    """
    H, W = frame.shape[:2]
    OW, OH = out_wh
    M = geo["x1"].shape[0]
    n_win = -(-H // WINDOW)
    Hp = n_win * WINDOW
    planar = jnp.transpose(frame, (2, 0, 1))          # (3, H, W)
    if Hp != H:
        planar = jnp.pad(planar, ((0, 0), (0, Hp - H), (0, 0)))

    geom = jnp.stack([geo["x1"], geo["wc"], geo["left"], geo["wp"],
                      geo["y1"], geo["hc"], geo["top"], geo["hp"]],
                     axis=-1).astype(jnp.int32)       # (M, 8)

    kern = functools.partial(_sampler_kernel, W=W, OW=OW, OH=OH,
                             n_win=n_win, dtype=sample_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M, n_win),
        in_specs=[pl.BlockSpec((3, WINDOW, W), lambda m, w, g: (0, w, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, OH, OW), lambda m, w, g: (m, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((W, OW), sample_dtype),        # per-crop Wx
            pltpu.VMEM((3, OH, OW), jnp.float32),     # accumulator (planar)
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, 3, OH, OW), sample_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(geom, planar)
    return jnp.transpose(out, (0, 2, 3, 1))  # planar -> NHWC (XLA, fused)
