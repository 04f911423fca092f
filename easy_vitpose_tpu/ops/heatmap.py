"""Gaussian heatmap target rendering for training.

Equivalent to the reference's per-joint host loop
(reference datasets/COCO.py:384-439 _generate_target) but fully vectorized
over joints — and expressible in jnp, so targets can be rendered on device.

Reference quirks preserved exactly:
* joint -> heatmap cell: ``int(x / stride + 0.5)`` with int() TRUNCATION
  (not floor) — differs for negative coords;
* a joint whose +/-3-sigma box falls fully outside the map gets weight 0;
* the Gaussian is unnormalized (peak == 1) and rendered on an integer grid
  offset by the truncated center (NOT sub-pixel), then cropped to the map.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def generate_gaussian_targets(joints: np.ndarray, joints_vis: np.ndarray,
                              heatmap_size: Tuple[int, int] = (48, 64),
                              image_size: Tuple[int, int] = (192, 256),
                              sigma: float = 3.0,
                              joints_weight: np.ndarray = None,
                              use_different_joints_weight: bool = False
                              ) -> Tuple[np.ndarray, np.ndarray]:
    """Render (K, Hh, Wh) Gaussian targets + (K, 1) weights for ONE instance.

    Args:
      joints: (K, 2) xy in input-image pixels.
      joints_vis: (K, 1+) visibility (first column used).
      heatmap_size: (Wh, Hh); image_size: (Wi, Hi).
    """
    K = joints.shape[0]
    Wh, Hh = heatmap_size
    Wi, Hi = image_size
    tmp_size = sigma * 3

    stride = np.array([Wi / Wh, Hi / Hh], np.float32)
    mu = np.trunc(joints[:, :2] / stride + 0.5).astype(np.int64)  # int() trunc
    ul = np.trunc(mu - tmp_size).astype(np.int64)                 # (K, 2)
    br = np.trunc(mu + tmp_size + 1).astype(np.int64)

    weight = joints_vis[:, 0].astype(np.float32).copy()
    oob = ((ul[:, 0] >= Wh) | (ul[:, 1] >= Hh)
           | (br[:, 0] < 0) | (br[:, 1] < 0))
    weight = np.where(oob, 0.0, weight)

    # vectorized paste: value at map cell (y, x) for joint k is
    # g((x - ul_x_k) - size//2, (y - ul_y_k) - size//2) when inside the
    # k-th gaussian window, else 0.
    size = int(2 * tmp_size + 1)
    x0 = size // 2
    xs = np.arange(Wh)[None, None, :]     # (1, 1, Wh)
    ys = np.arange(Hh)[None, :, None]     # (1, Hh, 1)
    gx = xs - ul[:, 0][:, None, None] - x0
    gy = ys - ul[:, 1][:, None, None] - x0
    g = np.exp(-(gx ** 2 + gy ** 2) / (2.0 * sigma ** 2))
    inside = ((xs >= ul[:, 0][:, None, None]) & (xs < br[:, 0][:, None, None])
              & (ys >= ul[:, 1][:, None, None]) & (ys < br[:, 1][:, None, None]))
    target = np.where(inside & (weight[:, None, None] > 0.5), g, 0.0)

    weight = weight[:, None]
    if use_different_joints_weight and joints_weight is not None:
        weight = weight * joints_weight
    return target.astype(np.float32), weight.astype(np.float32)


def generate_gaussian_targets_jnp(joints, joints_vis,
                                  heatmap_size: Tuple[int, int] = (48, 64),
                                  image_size: Tuple[int, int] = (192, 256),
                                  sigma: float = 3.0,
                                  joints_weight=None,
                                  use_different_joints_weight: bool = False):
    """Batched on-device twin of :func:`generate_gaussian_targets`.

    Args:
      joints: (B, K, 2) xy in input-image pixels (f32).
      joints_vis: (B, K, 2) visibility (first column used).
    Returns (B, K, Hh, Wh) targets + (B, K, 1) weights, matching the numpy
    renderer exactly (same int() truncation / out-of-bounds / unnormalized-
    Gaussian quirks).  Used by the ``device_input`` training path: the loader
    ships uint8 crops + joint coords and the targets are rendered inside the
    jitted train step (TPU-idiomatic replacement for the reference's host
    per-joint loop, reference datasets/COCO.py:384-439).
    """
    import jax.numpy as jnp

    Wh, Hh = heatmap_size
    Wi, Hi = image_size
    tmp_size = sigma * 3

    stride = jnp.asarray([Wi / Wh, Hi / Hh], jnp.float32)
    mu = jnp.trunc(joints[..., :2] / stride + 0.5)            # (B, K, 2)
    ul = jnp.trunc(mu - tmp_size).astype(jnp.int32)
    br = jnp.trunc(mu + tmp_size + 1).astype(jnp.int32)

    weight = joints_vis[..., 0].astype(jnp.float32)           # (B, K)
    oob = ((ul[..., 0] >= Wh) | (ul[..., 1] >= Hh)
           | (br[..., 0] < 0) | (br[..., 1] < 0))
    weight = jnp.where(oob, 0.0, weight)

    size = int(2 * tmp_size + 1)
    x0 = size // 2
    xs = jnp.arange(Wh, dtype=jnp.int32)[None, None, None, :]  # (1,1,1,Wh)
    ys = jnp.arange(Hh, dtype=jnp.int32)[None, None, :, None]  # (1,1,Hh,1)
    ulx = ul[..., 0][..., None, None]                          # (B,K,1,1)
    uly = ul[..., 1][..., None, None]
    gx = (xs - ulx - x0).astype(jnp.float32)
    gy = (ys - uly - x0).astype(jnp.float32)
    g = jnp.exp(-(gx ** 2 + gy ** 2) / (2.0 * sigma ** 2))
    inside = ((xs >= ulx) & (xs < br[..., 0][..., None, None])
              & (ys >= uly) & (ys < br[..., 1][..., None, None]))
    target = jnp.where(inside & (weight[..., None, None] > 0.5), g, 0.0)

    weight = weight[..., None]                                 # (B, K, 1)
    if use_different_joints_weight and joints_weight is not None:
        weight = weight * jnp.asarray(joints_weight, jnp.float32)
    return target.astype(jnp.float32), weight.astype(jnp.float32)
