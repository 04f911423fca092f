"""3D human-mesh and GAN losses (reference vit_models/losses/mesh_loss.py).

Vestigial in the reference too (no config reaches them — they belong to the
upstream mmpose mesh-recovery models), ported for complete loss-zoo parity as
pure jnp functions.  Components:

* rotation helpers: rot6d_to_rotmat (Zhou et al. CVPR'19), batch_rodrigues,
  quat_to_rotmat (mesh_loss.py:7-71)
* perspective_projection (mesh_loss.py:73-112)
* mesh_loss(): vertex L1 + SMPL pose/beta MSE + 3D-joint SmoothL1
  (pelvis-centered) + 2D reprojection SmoothL1 (mesh_loss.py:113-313)
* gan_loss(): vanilla / lsgan / wgan / hinge (mesh_loss.py:313-444)
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp


def _normalize(v, axis=-1, eps=1e-12):
    return v / jnp.clip(jnp.linalg.norm(v, axis=axis, keepdims=True),
                        eps, None)


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 6) continuous 6D rotation rep -> (B, 3, 3) rotation matrices."""
    x = x.reshape(-1, 3, 2)
    a1, a2 = x[:, :, 0], x[:, :, 1]
    b1 = _normalize(a1)
    b2 = _normalize(a2 - jnp.sum(b1 * a2, -1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack((b1, b2, b3), axis=-1)


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """(B, 4) quaternion (w, x, y, z) -> (B, 3, 3)."""
    q = quat / jnp.linalg.norm(quat, axis=1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    w2, x2, y2, z2 = w ** 2, x ** 2, y ** 2, z ** 2
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack([
        w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
        2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
        2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
    ], axis=1).reshape(-1, 3, 3)


def batch_rodrigues(theta: jnp.ndarray) -> jnp.ndarray:
    """(B, 3) axis-angle -> (B, 3, 3) via the quaternion route (matches the
    reference's epsilon: |theta + 1e-8|)."""
    l2 = jnp.linalg.norm(theta + 1e-8, axis=1, keepdims=True)
    half = l2 * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * (theta / l2)], 1)
    return quat_to_rotmat(quat)


def perspective_projection(points, rotation, translation, focal_length,
                           camera_center):
    """(B, N, 3) points through a pinhole camera -> (B, N, 2)."""
    B = points.shape[0]
    K = jnp.zeros((B, 3, 3))
    K = K.at[:, 0, 0].set(focal_length)
    K = K.at[:, 1, 1].set(focal_length)
    K = K.at[:, 2, 2].set(1.0)
    K = K.at[:, :2, 2].set(camera_center)
    p = jnp.einsum("bij,bkj->bki", rotation, points) + translation[:, None]
    p = p / p[:, :, -1:]
    return jnp.einsum("bij,bkj->bki", K, p)[:, :, :2]


def _smooth_l1(a, b):
    d = jnp.abs(a - b)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def mesh_loss(output: Dict[str, jnp.ndarray], target: Dict[str, jnp.ndarray],
              *, joints_2d_loss_weight: float = 1.0,
              joints_3d_loss_weight: float = 1.0,
              vertex_loss_weight: float = 1.0,
              smpl_pose_loss_weight: float = 1.0,
              smpl_beta_loss_weight: float = 1.0,
              img_res: int = 224, focal_length: float = 5000.0
              ) -> Dict[str, jnp.ndarray]:
    """Reference MeshLoss.forward (mesh_loss.py:246-313).

    output: vertices (B,V,3), joints_3d (B,J,3), camera (B,3 scale/tx/ty),
      optional pose (B,24,3,3 rotmats) and beta (B,10).
    target: vertices, joints_3d, joints_3d_visible (B,J,1 or (B,J,3)),
      joints_2d (B,J,2 image coords), joints_2d_visible, pose (B,72
      axis-angle), beta, has_smpl (B,).
    """
    losses = {}
    has_smpl = target["has_smpl"].astype(jnp.float32)

    v_l1 = jnp.abs(output["vertices"] - target["vertices"])
    losses["vertex_loss"] = (has_smpl[:, None, None] * v_l1).mean() \
        * vertex_loss_weight

    if "pose" in output and "beta" in output:
        gt_rotmat = batch_rodrigues(
            target["pose"].reshape(-1, 3)).reshape(-1, 24, 3, 3)
        pose_mse = (output["pose"] - gt_rotmat) ** 2
        beta_mse = (output["beta"] - target["beta"]) ** 2
        losses["smpl_pose_loss"] = (
            has_smpl[:, None, None, None] * pose_mse).mean() \
            * smpl_pose_loss_weight
        losses["smpl_beta_loss"] = (has_smpl[:, None] * beta_mse).mean() \
            * smpl_beta_loss_weight

    # 3D joints, pelvis-centered (reference uses joints 2/3 midpoint)
    gt3 = target["joints_3d"]
    pr3 = output["joints_3d"]
    gt3 = gt3 - (gt3[:, 2, :] + gt3[:, 3, :])[:, None] / 2
    pr3c = pr3 - (pr3[:, 2, :] + pr3[:, 3, :])[:, None] / 2
    conf3 = target["joints_3d_visible"].astype(jnp.float32)
    losses["joints_3d_loss"] = (conf3 * _smooth_l1(pr3c, gt3)).mean() \
        * joints_3d_loss_weight

    # 2D reprojection through the weak-perspective camera
    cam = output["camera"]
    B = pr3.shape[0]
    cam_t = jnp.stack([cam[:, 1], cam[:, 2],
                       2 * focal_length / (img_res * cam[:, 0] + 1e-9)], -1)
    eye = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    pred_2d = perspective_projection(pr3, eye, cam_t, focal_length,
                                     jnp.zeros((B, 2)))
    pred_2d = 2 * pred_2d / (img_res - 1)            # origin: image center
    gt_2d = 2 * target["joints_2d"] / (img_res - 1) - 1  # origin: top-left
    conf2 = target["joints_2d_visible"].astype(jnp.float32)
    losses["joints_2d_loss"] = (conf2 * _smooth_l1(pred_2d, gt_2d)).mean() \
        * joints_2d_loss_weight
    return losses


def gan_loss(x: jnp.ndarray, target_is_real: bool, gan_type: str = "vanilla",
             real_label_val: float = 1.0, fake_label_val: float = 0.0,
             loss_weight: float = 1.0, is_disc: bool = False) -> jnp.ndarray:
    """Reference GANLoss.forward (mesh_loss.py:313-444).

    loss_weight applies to generator calls only (discriminators always 1.0),
    like the reference."""
    x = x.astype(jnp.float32)
    if gan_type == "wgan":
        loss = -x.mean() if target_is_real else x.mean()
    elif gan_type == "hinge":
        if is_disc:
            xx = -x if target_is_real else x
            loss = jnp.maximum(1 + xx, 0.0).mean()
        else:
            loss = -x.mean()
    else:
        label = jnp.full_like(
            x, real_label_val if target_is_real else fake_label_val)
        if gan_type == "vanilla":  # BCE with logits
            loss = (jnp.maximum(x, 0) - x * label
                    + jnp.log1p(jnp.exp(-jnp.abs(x)))).mean()
        elif gan_type == "lsgan":
            loss = ((x - label) ** 2).mean()
        else:
            raise NotImplementedError(f"GAN type {gan_type}")
    return loss if is_disc else loss * loss_weight
