"""Training losses (reference: vit_models/losses/).

The train loop only ever uses JointsMSELoss (reference
vit_utils/train_valid_fn.py:73); the rest of the reference's loss zoo that is
reachable from configs is provided for capability parity:
JointsOHKMMSELoss (mse_loss.py:95-151), CombinedTargetMSELoss (:47-93),
AdaptiveWingLoss (heatmap_loss.py), and the common regression losses
(regression_loss.py: SmoothL1/Wing/SoftWing/L1/MSE/MPJPE).
All are pure jnp functions over batched arrays.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def joints_mse_loss(pred: jnp.ndarray, target: jnp.ndarray,
                    target_weight: Optional[jnp.ndarray] = None,
                    loss_weight: float = 1.0) -> jnp.ndarray:
    """JointsMSELoss (reference mse_loss.py:9-44).

    pred/target: (B, K, H, W); target_weight: (B, K, 1) or None.
    Equivalent to: mean over joints of MSE(pred_j * w_j, target_j * w_j)
    with MSE reduction 'mean' over (B, H*W).
    """
    B, K = pred.shape[:2]
    p = pred.reshape(B, K, -1).astype(jnp.float32)
    t = target.reshape(B, K, -1).astype(jnp.float32)
    if target_weight is not None:
        w = target_weight.reshape(B, K, 1).astype(jnp.float32)
        p = p * w
        t = t * w
    return jnp.mean((p - t) ** 2) * loss_weight


def joints_ohkm_mse_loss(pred: jnp.ndarray, target: jnp.ndarray,
                         target_weight: Optional[jnp.ndarray] = None,
                         topk: int = 8, loss_weight: float = 1.0) -> jnp.ndarray:
    """Online hard keypoint mining MSE (reference mse_loss.py:95-151):
    per sample, average the topk largest per-joint MSE losses."""
    B, K = pred.shape[:2]
    p = pred.reshape(B, K, -1).astype(jnp.float32)
    t = target.reshape(B, K, -1).astype(jnp.float32)
    if target_weight is not None:
        w = target_weight.reshape(B, K, 1).astype(jnp.float32)
        p = p * w
        t = t * w
    per_joint = jnp.mean((p - t) ** 2, axis=-1)   # (B, K)
    top_vals, _ = jax.lax.top_k(per_joint, topk)
    return jnp.mean(jnp.sum(top_vals, axis=1) / topk) * loss_weight


def combined_target_mse_loss(pred: jnp.ndarray, target: jnp.ndarray,
                             target_weight: jnp.ndarray,
                             loss_weight: float = 1.0) -> jnp.ndarray:
    """CombinedTarget (heatmap+offset triplets) MSE (reference mse_loss.py:47-93)."""
    B, C = pred.shape[:2]
    K = C // 3
    p = pred.reshape(B, K, 3, -1).astype(jnp.float32)
    t = target.reshape(B, K, 3, -1).astype(jnp.float32)
    w = target_weight.reshape(B, K, 1).astype(jnp.float32)
    hm_p, hm_t = p[:, :, 0] * w, t[:, :, 0] * w
    # Each jnp.mean over (B, K, HW) equals (1/K) * sum_j per-joint mean-MSE,
    # i.e. the reference's sum-over-joints followed by "/ num_joints".
    loss = 0.5 * jnp.mean((hm_p - hm_t) ** 2)
    for i in (1, 2):
        loss += 0.5 * jnp.mean((hm_t * p[:, :, i] - hm_t * t[:, :, i]) ** 2)
    return loss * loss_weight


def adaptive_wing_loss(pred: jnp.ndarray, target: jnp.ndarray,
                       target_weight: Optional[jnp.ndarray] = None,
                       alpha: float = 2.1, omega: float = 14.0,
                       epsilon: float = 1.0, theta: float = 0.5,
                       loss_weight: float = 1.0) -> jnp.ndarray:
    """Adaptive wing loss for heatmaps (reference heatmap_loss.py:6-88)."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    delta = jnp.abs(t - p)
    a_pow = alpha - t
    A = omega * (1 / (1 + (theta / epsilon) ** a_pow)) * a_pow \
        * ((theta / epsilon) ** (a_pow - 1)) / epsilon
    C = theta * A - omega * jnp.log1p((theta / epsilon) ** a_pow)
    small = omega * jnp.log1p((delta / epsilon) ** a_pow)
    big = A * delta - C
    loss = jnp.where(delta < theta, small, big)
    if target_weight is not None:
        w = target_weight.reshape(*target_weight.shape[:2], 1, 1)
        loss = loss * w
    return jnp.mean(loss) * loss_weight


def smooth_l1_loss(pred, target, target_weight=None, loss_weight=1.0):
    """(reference regression_loss.py SmoothL1Loss semantics, beta=1)."""
    d = jnp.abs(pred - target)
    loss = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
    if target_weight is not None:
        loss = loss * target_weight
    return jnp.mean(loss) * loss_weight


def wing_loss(pred, target, target_weight=None, omega: float = 10.0,
              epsilon: float = 2.0, loss_weight: float = 1.0):
    """Wing loss (reference regression_loss.py:44-99)."""
    d = jnp.abs(pred - target)
    C = omega * (1.0 - math.log(1.0 + omega / epsilon))
    loss = jnp.where(d < omega, omega * jnp.log(1.0 + d / epsilon), d - C)
    if target_weight is not None:
        loss = loss * target_weight
    return jnp.mean(loss) * loss_weight


def bce_loss(pred_logits, target, target_weight=None, loss_weight=1.0):
    """Binary cross-entropy with logits (reference classfication_loss.py:9)."""
    p = pred_logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    loss = jnp.maximum(p, 0) - p * t + jnp.log1p(jnp.exp(-jnp.abs(p)))
    if target_weight is not None:
        loss = loss * target_weight
    return jnp.mean(loss) * loss_weight


def ae_heatmap_loss(pred, target, mask=None):
    """Bottom-up heatmap MSE with optional pixel mask
    (reference multi_loss_factory.py HeatmapLoss:30-66 semantics)."""
    d = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    if mask is not None:
        d = d * mask.astype(jnp.float32)[:, None]
    return jnp.mean(d, axis=(1, 2, 3))


def ae_grouping_loss(tags: jnp.ndarray, joint_indices: jnp.ndarray,
                     joint_valid: jnp.ndarray,
                     pull_weight: float = 1.0, push_weight: float = 1.0):
    """Associative-embedding pull/push losses for ONE image
    (reference multi_loss_factory.py AELoss:69-159 semantics, fixed shapes).

    Args:
      tags: (HW,) or (HW, T) flattened tag map.
      joint_indices: (P, K) int flat heatmap index of each gt joint.
      joint_valid: (P, K) 1/0 validity.
    Returns (pull, push) scalars.
    """
    if tags.ndim == 1:
        tags = tags[:, None]
    P, K = joint_indices.shape
    t = tags[joint_indices.reshape(-1)].reshape(P, K, -1)   # (P, K, T)
    v = joint_valid.astype(jnp.float32)[..., None]          # (P, K, 1)
    cnt = jnp.maximum(v.sum(1), 1e-6)                       # (P, 1)
    mean = (t * v).sum(1) / cnt                             # (P, T)
    pull_per = ((t - mean[:, None]) ** 2 * v).sum(1) / cnt
    person_valid = (v.sum(1) > 0).astype(jnp.float32)       # (P, 1)
    n_person = jnp.maximum(person_valid.sum(), 1.0)
    pull = (pull_per * person_valid).sum() / n_person

    diff = mean[:, None, :] - mean[None, :, :]              # (P, P, T)
    pv = person_valid[:, 0]
    pair_valid = pv[:, None] * pv[None, :] * (1 - jnp.eye(P))
    push_mat = jnp.exp(-jnp.sum(diff ** 2, -1)) * pair_valid
    denom = jnp.maximum(n_person * (n_person - 1), 1.0)
    push = push_mat.sum() / denom * 0.5
    return pull * pull_weight, push * push_weight


def mpjpe_loss(pred, target, target_weight=None, loss_weight=1.0):
    """Mean per-joint position error (reference regression_loss.py MPJPELoss)."""
    d = jnp.linalg.norm(pred - target, axis=-1)
    if target_weight is not None:
        d = d * target_weight.reshape(d.shape)
    return jnp.mean(d) * loss_weight
