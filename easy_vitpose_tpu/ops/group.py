"""Bottom-up associative-embedding grouping.

Capability parity with the reference's (vestigial, never called by the main
path) HeatmapParser (reference vit_utils/post_processing/group.py:13-169):
max-pool peak NMS over per-joint heatmaps, per-joint top-k candidate
extraction, and tag-space Hungarian matching that assembles candidates into
person groups.  Peak NMS and top-k are jnp (device-friendly); the
joint-by-joint assignment is host scipy (same role as the reference's
Munkres).
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def heatmap_peak_nms(heatmaps: jnp.ndarray, kernel: int = 5) -> jnp.ndarray:
    """Suppress non-peak responses: keep values equal to their kxk max-pool
    (reference group.py:155-169).  (N, K, H, W) -> same shape."""
    pad = (kernel - 1) // 2
    pooled = jax.lax.reduce_window(
        heatmaps, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, kernel, kernel),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (pad, pad), (pad, pad)))
    return jnp.where(pooled == heatmaps, heatmaps, 0.0)


def top_k_candidates(heatmaps: jnp.ndarray, tags: jnp.ndarray, k: int = 30
                     ) -> Dict[str, np.ndarray]:
    """Per-joint top-k peak candidates.

    Args:
      heatmaps: (K, H, W) one image's joint heatmaps (post peak-NMS).
      tags: (K, H, W) or (K, H, W, T) associative-embedding tag maps.
    Returns dict of numpy arrays: loc (K, k, 2) xy, val (K, k), tag (K, k, T).
    """
    K, H, W = heatmaps.shape[:3]
    flat = heatmaps.reshape(K, H * W)
    val, idx = jax.lax.top_k(flat, k)
    x = (idx % W).astype(jnp.float32)
    y = (idx // W).astype(jnp.float32)
    if tags.ndim == 3:
        tags = tags[..., None]
    T = tags.shape[-1]
    tag_flat = tags.reshape(K, H * W, T)
    tag_k = jnp.take_along_axis(tag_flat, idx[..., None], axis=1)
    return {"loc": np.asarray(jnp.stack([x, y], -1)),
            "val": np.asarray(val), "tag": np.asarray(tag_k)}


def match_by_tag(cands: Dict[str, np.ndarray], joint_order: List[int],
                 detection_threshold: float = 0.1,
                 tag_threshold: float = 1.0,
                 max_people: int = 30,
                 ignore_too_much: bool = False,
                 use_detection_val: bool = True) -> np.ndarray:
    """Assemble per-joint candidates into people by tag distance
    (reference group.py:28-118 semantics).

    Returns (P, K, 3 + T) array: per person per joint (x, y, score, tag...).
    """
    from scipy.optimize import linear_sum_assignment

    K = cands["val"].shape[0]
    T = cands["tag"].shape[-1]
    groups: List[np.ndarray] = []        # each (K, 3 + T)
    group_tags: List[List[np.ndarray]] = []

    for j in joint_order:
        vals = cands["val"][j]
        sel = vals > detection_threshold
        if not sel.any():
            continue
        locs = cands["loc"][j][sel]
        vals_j = vals[sel]
        tags_j = cands["tag"][j][sel]
        rows = np.concatenate([locs, vals_j[:, None], tags_j], axis=1)

        if not groups:
            for r in rows:
                groups.append(_new_group(K, T, j, r))
                group_tags.append([r[3:]])
            continue

        if ignore_too_much and len(groups) >= max_people:
            continue

        means = np.stack([np.mean(t, axis=0)
                          for t in [np.stack(g) for g in group_tags]])
        diff = np.linalg.norm(tags_j[:, None, :] - means[None], axis=2)
        cost = np.round(diff) * 100 - vals_j[:, None] if use_detection_val \
            else diff.copy()
        # pad to square so every candidate can open a new group
        n_c, n_g = cost.shape
        if n_c > n_g:
            pad = np.full((n_c, n_c - n_g), 1e10)
            cost = np.concatenate([cost, pad], axis=1)
        ri, ci = linear_sum_assignment(cost)
        for r, c in zip(ri, ci):
            if c < n_g and diff[r, c] < tag_threshold:
                groups[c][j] = rows[r][:3 + T]
                group_tags[c].append(rows[r][3:])
            else:
                groups.append(_new_group(K, T, j, rows[r]))
                group_tags.append([rows[r][3:]])

    if not groups:
        return np.zeros((0, K, 3 + T), np.float32)
    out = np.stack(groups)[:max_people]
    return out.astype(np.float32)


def _new_group(K: int, T: int, j: int, row: np.ndarray) -> np.ndarray:
    g = np.zeros((K, 3 + T), np.float64)
    g[j] = row[:3 + T]
    return g


def parse_bottom_up(heatmaps: np.ndarray, tags: np.ndarray,
                    joint_order: List[int] = None,
                    detection_threshold: float = 0.1,
                    tag_threshold: float = 1.0,
                    max_people: int = 30, top_k: int = 30) -> np.ndarray:
    """Full bottom-up parse for ONE image: NMS -> top-k -> tag grouping."""
    K = heatmaps.shape[0]
    if joint_order is None:
        joint_order = list(range(K))
    nms = heatmap_peak_nms(jnp.asarray(heatmaps)[None])[0]
    cands = top_k_candidates(nms, jnp.asarray(tags), k=top_k)
    return match_by_tag(cands, joint_order, detection_threshold,
                        tag_threshold, max_people)
