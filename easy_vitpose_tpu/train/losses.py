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
    """Adaptive wing loss for heatmaps (reference heatmap_loss.py:6-88).
    Weighting matches the reference: the (B, K, 1)-broadcast weight scales
    the heatmaps BEFORE the loss (heatmap_loss.py:77-79)."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    if target_weight is not None:
        w = target_weight.reshape(*target_weight.shape[:2], 1, 1) \
            .astype(jnp.float32)
        p = p * w
        t = t * w
        target_weight = None
    delta = jnp.abs(t - p)
    a_pow = alpha - t
    A = omega * (1 / (1 + (theta / epsilon) ** a_pow)) * a_pow \
        * ((theta / epsilon) ** (a_pow - 1)) / epsilon
    C = theta * A - omega * jnp.log1p((theta / epsilon) ** a_pow)
    small = omega * jnp.log1p((delta / epsilon) ** a_pow)
    big = A * delta - C
    loss = jnp.where(delta < theta, small, big)
    return jnp.mean(loss) * loss_weight


def _weighted(pred, target, target_weight):
    """Reference regression losses apply the weight to the INPUTS
    (criterion(output*w, target*w)), not to the per-element loss."""
    if target_weight is not None:
        return pred * target_weight, target * target_weight
    return pred, target


def smooth_l1_loss(pred, target, target_weight=None, loss_weight=1.0):
    """(reference regression_loss.py SmoothL1Loss semantics, beta=1;
    F.smooth_l1_loss default 'mean' reduction)."""
    p, t = _weighted(pred, target, target_weight)
    d = jnp.abs(p - t)
    loss = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
    return jnp.mean(loss) * loss_weight


def l1_loss(pred, target, target_weight=None, loss_weight=1.0):
    """(reference regression_loss.py L1Loss: F.l1_loss 'mean')."""
    p, t = _weighted(pred, target, target_weight)
    return jnp.mean(jnp.abs(p - t)) * loss_weight


def mse_regression_loss(pred, target, target_weight=None, loss_weight=1.0):
    """(reference regression_loss.py MSELoss: F.mse_loss 'mean')."""
    p, t = _weighted(pred, target, target_weight)
    return jnp.mean((p - t) ** 2) * loss_weight


def wing_loss(pred, target, target_weight=None, omega: float = 10.0,
              epsilon: float = 2.0, loss_weight: float = 1.0):
    """Wing loss (reference regression_loss.py:44-99): per-sample SUM over
    (K, D), then batch mean."""
    p, t = _weighted(pred, target, target_weight)
    d = jnp.abs(p - t)
    C = omega - omega * math.log(1.0 + omega / epsilon)
    loss = jnp.where(d < omega, omega * jnp.log(1.0 + d / epsilon), d - C)
    return jnp.mean(jnp.sum(loss, axis=(1, 2))) * loss_weight


def soft_wing_loss(pred, target, target_weight=None, omega1: float = 2.0,
                   omega2: float = 20.0, epsilon: float = 0.5,
                   loss_weight: float = 1.0):
    """Soft wing loss (reference regression_loss.py SoftWingLoss, Lin et al.
    TIP'21): |x| below omega1, log branch above, same sum-then-mean
    reduction as WingLoss."""
    p, t = _weighted(pred, target, target_weight)
    d = jnp.abs(p - t)
    B = omega1 - omega2 * math.log(1.0 + omega1 / epsilon)
    loss = jnp.where(d < omega1, d, omega2 * jnp.log(1.0 + d / epsilon) + B)
    return jnp.mean(jnp.sum(loss, axis=(1, 2))) * loss_weight


def bone_loss(pred, target, joint_parents, target_weight=None,
              loss_weight: float = 1.0):
    """Bone-length loss (reference regression_loss.py BoneLoss): L1 between
    batch-mean bone lengths of pred and target over non-root bones.

    joint_parents: K ints, parent index per joint (root: parent == self).
    target_weight: optional (B, K-1) per-bone weights.
    """
    parents = jnp.asarray(joint_parents)
    non_root = [i for i, p in enumerate(joint_parents) if p != i]
    pb = jnp.linalg.norm(pred - pred[:, parents], axis=-1)[:, non_root]
    tb = jnp.linalg.norm(target - target[:, parents], axis=-1)[:, non_root]
    if target_weight is not None:
        pb = pb * target_weight
        tb = tb * target_weight
    return jnp.mean(jnp.abs(pb.mean(0) - tb.mean(0))) * loss_weight


def project_joints(x, intrinsics):
    """Pinhole (+ optional radial/tangential distortion) projection of 3D
    joints to 2D (reference regression_loss.py SemiSupervisionLoss
    .project_joints).

    x: (B, K, 3); intrinsics: (B, 4) [f, c] or (B, 9) [f, c, k, p].
    """
    intr = intrinsics[:, None, :]
    f, c = intr[..., :2], intr[..., 2:4]
    xy = jnp.clip(x[:, :, :2] / x[:, :, 2:], -1.0, 1.0)
    if intrinsics.shape[-1] == 9:
        k, p = intr[..., 4:7], intr[..., 7:9]
        r2 = jnp.sum(xy ** 2, axis=-1, keepdims=True)
        radial = 1 + jnp.sum(
            k * jnp.concatenate([r2, r2 ** 2, r2 ** 3], -1), -1,
            keepdims=True)
        tan = jnp.sum(p * xy, axis=-1, keepdims=True)
        xy = xy * (radial + tan) + p * r2
    return f * xy + c


def semi_supervision_loss(labeled_pose, unlabeled_pose, unlabeled_traj,
                          unlabeled_target_2d, intrinsics, joint_parents,
                          projection_loss_weight: float = 1.0,
                          bone_loss_weight: float = 1.0):
    """Semi-supervision losses (reference regression_loss.py
    SemiSupervisionLoss, Pavllo et al. CVPR'19): returns
    {'proj_loss', 'bone_loss'}.  The reference's warmup-iteration gating is
    host-side control flow — callers skip calling this during warmup."""
    proj_2d = project_joints(unlabeled_pose + unlabeled_traj, intrinsics)
    return {
        "proj_loss": mpjpe_loss(proj_2d, unlabeled_target_2d,
                                loss_weight=projection_loss_weight),
        "bone_loss": bone_loss(unlabeled_pose, labeled_pose, joint_parents,
                               loss_weight=bone_loss_weight),
    }


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
    """Mean per-joint position error (reference regression_loss.py
    MPJPELoss): the (B, K, D) weight multiplies the residual INSIDE the
    norm."""
    r = pred - target
    if target_weight is not None:
        r = r * target_weight
    return jnp.mean(jnp.linalg.norm(r, axis=-1)) * loss_weight
