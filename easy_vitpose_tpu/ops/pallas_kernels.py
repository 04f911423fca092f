"""Pallas TPU kernels for decode-path hot ops.

The UDP decode modulates every heatmap with a Gaussian blur, then clips and
takes the log (ops/decode.py:post_dark_udp).  XLA fuses the 22-tap separable
blur reasonably, but each shifted term re-reads the padded map from
HBM-or-registers as fusion sees fit; this kernel pins one (H+2r, W+2r) map
tile in VMEM per grid step and runs the taps + clip + log entirely in
registers — one HBM read + one write per map.

Used by decode via ``keypoints_from_heatmaps_udp(..., use_pallas=True)``;
CPU tests run the same kernel in interpreter mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .decode import gaussian_kernel_1d


def _modulate_kernel_body(hm_ref, out_ref, *, taps, r, H, W):
    """hm_ref: (1, H+2r, W+2r) pre-padded map; out: (1, H, W) log-blurred."""
    x = hm_ref[0]
    # horizontal pass
    acc = None
    for i in range(2 * r + 1):
        t = x[:, i:i + W] * taps[i]
        acc = t if acc is None else acc + t
    # vertical pass
    out = None
    for i in range(2 * r + 1):
        t = acc[i:i + H, :] * taps[i]
        out = t if out is None else out + t
    out_ref[0] = jnp.log(jnp.clip(out, 0.001, 50.0))


def udp_modulate_pallas(heatmaps: jnp.ndarray, kernel: int = 11,
                        interpret: bool = False) -> jnp.ndarray:
    """Fused blur+clip+log over (N, K, H, W) heatmaps (one map per grid step).

    Matches gaussian_blur_2d -> clip -> log (reflect-101 padding applied here
    on the host-side jnp.pad, exactly like the XLA path).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, K, H, W = heatmaps.shape
    r = kernel // 2
    taps = tuple(float(v) for v in gaussian_kernel_1d(kernel))
    x = heatmaps.astype(jnp.float32).reshape(N * K, H, W)
    x = jnp.pad(x, ((0, 0), (r, r), (r, r)), mode="reflect")

    body = functools.partial(_modulate_kernel_body, taps=taps, r=r, H=H, W=W)
    out = pl.pallas_call(
        body,
        grid=(N * K,),
        in_specs=[pl.BlockSpec((1, H + 2 * r, W + 2 * r),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N * K, H, W), jnp.float32),
        interpret=interpret,
    )(x)
    return out.reshape(N, K, H, W)
