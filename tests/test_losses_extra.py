"""Unit tests for the extended loss zoo (BCE, AE, OHKM, wing family)."""
import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.train import losses as L


def test_bce_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 10)).astype(np.float32)
    target = (rng.uniform(size=(4, 10)) > 0.5).astype(np.float32)
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(target)).item()
    got = float(L.bce_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert abs(got - ref) < 1e-6


def test_ohkm_topk_selects_hard_joints():
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(2, 10, 8, 6)).astype(np.float32)
    target = pred.copy()
    target[:, :3] += 5.0  # only 3 joints have error
    full = float(L.joints_ohkm_mse_loss(jnp.asarray(pred), jnp.asarray(target),
                                        topk=3))
    loose = float(L.joints_ohkm_mse_loss(jnp.asarray(pred), jnp.asarray(target),
                                         topk=10))
    assert full > loose  # averaging over easy joints dilutes the loss


def test_ohkm_matches_torch_oracle():
    """Pin reference JointsOHKMMSELoss semantics (mse_loss.py:95-151):
    per-joint raw mean MSE (no 0.5 factor), top-k sum / k, mean over batch."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    B, K, H, W, topk = 3, 10, 8, 6, 4
    pred = rng.normal(size=(B, K, H, W)).astype(np.float32)
    target = rng.normal(size=(B, K, H, W)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, (B, K, 1)).astype(np.float32)

    tp = torch.from_numpy(pred).reshape(B, K, -1)
    tt = torch.from_numpy(target).reshape(B, K, -1)
    tw = torch.from_numpy(w)
    per_joint = ((tp * tw - tt * tw) ** 2).mean(dim=2)  # (B, K) raw MSE
    vals, _ = torch.topk(per_joint, topk, dim=1)
    ref = (vals.sum(dim=1) / topk).mean().item()

    got = float(L.joints_ohkm_mse_loss(jnp.asarray(pred), jnp.asarray(target),
                                       jnp.asarray(w), topk=topk))
    assert abs(got - ref) < 1e-6


def test_combined_target_matches_torch_oracle():
    """Pin reference CombinedTargetMSELoss semantics (mse_loss.py:47-93):
    sum over joints of 0.5*(hm MSE + gated offset MSEs), divided by K once."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    B, K, H, W = 2, 5, 8, 6
    pred = rng.normal(size=(B, 3 * K, H, W)).astype(np.float32)
    target = rng.normal(size=(B, 3 * K, H, W)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, (B, K, 1)).astype(np.float32)

    tp = torch.from_numpy(pred).reshape(B, 3 * K, -1)
    tt = torch.from_numpy(target).reshape(B, 3 * K, -1)
    tw = torch.from_numpy(w)
    mse = torch.nn.MSELoss(reduction="mean")
    ref = 0.0
    for j in range(K):
        hp, ht = tp[:, 3 * j] * tw[:, j], tt[:, 3 * j] * tw[:, j]
        ref = ref + 0.5 * mse(hp, ht)
        for c in (1, 2):
            ref = ref + 0.5 * mse(ht * tp[:, 3 * j + c],
                                  ht * tt[:, 3 * j + c])
    ref = (ref / K).item()

    got = float(L.combined_target_mse_loss(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(w)))
    assert abs(got - ref) < 1e-5


def test_ae_grouping_pull_push():
    # two people with distinct tags -> near-zero pull, small push
    HW = 100
    tags = np.zeros((HW,), np.float32)
    tags[:50] = 1.0
    tags[50:] = 8.0
    idx = np.array([[3, 7, 11], [55, 60, 70]])  # (P=2, K=3)
    valid = np.ones((2, 3))
    pull, push = L.ae_grouping_loss(jnp.asarray(tags), jnp.asarray(idx),
                                    jnp.asarray(valid))
    assert float(pull) < 1e-6
    assert float(push) < 1e-6  # tags far apart -> exp(-d^2) ~ 0
    # same tags -> push ~ 0.5 (exp(0)=1 * 0.5 factor)
    tags2 = np.ones((HW,), np.float32)
    pull2, push2 = L.ae_grouping_loss(jnp.asarray(tags2), jnp.asarray(idx),
                                      jnp.asarray(valid))
    assert abs(float(push2) - 0.5) < 1e-6


def test_wing_family_matches_torch_oracle():
    """Pin reference WingLoss/SoftWingLoss semantics
    (regression_loss.py:44-99, :122-196): weight multiplies the INPUTS,
    reduction is per-sample sum over (K, D) then batch mean."""
    torch = pytest.importorskip("torch")
    import math
    rng = np.random.default_rng(3)
    B, K, D = 4, 17, 2
    p = rng.normal(0, 5, (B, K, D)).astype(np.float32)
    t = rng.normal(0, 5, (B, K, D)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, (B, K, D)).astype(np.float32)

    tp, tt = torch.from_numpy(p * w), torch.from_numpy(t * w)
    # wing (omega=10, eps=2)
    dlt = (tt - tp).abs()
    C = 10.0 - 10.0 * math.log(1.0 + 10.0 / 2.0)
    wl = torch.where(dlt < 10.0, 10.0 * torch.log(1 + dlt / 2.0), dlt - C)
    ref_w = torch.mean(torch.sum(wl, dim=[1, 2])).item()
    got_w = float(L.wing_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w)))
    assert abs(got_w - ref_w) < 1e-4 * max(1, abs(ref_w))
    # soft wing (omega1=2, omega2=20, eps=0.5)
    Bc = 2.0 - 20.0 * math.log(1.0 + 2.0 / 0.5)
    sl = torch.where(dlt < 2.0, dlt, 20.0 * torch.log(1 + dlt / 0.5) + Bc)
    ref_s = torch.mean(torch.sum(sl, dim=[1, 2])).item()
    got_s = float(L.soft_wing_loss(jnp.asarray(p), jnp.asarray(t),
                                   jnp.asarray(w)))
    assert abs(got_s - ref_s) < 1e-4 * max(1, abs(ref_s))
    # mpjpe: weight inside the norm
    ref_m = torch.mean(torch.norm(torch.from_numpy((p - t) * w), dim=-1)).item()
    got_m = float(L.mpjpe_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w)))
    assert abs(got_m - ref_m) < 1e-5


def test_bone_loss_matches_torch_oracle():
    """Pin reference BoneLoss (regression_loss.py:303-355)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    B, K = 5, 6
    parents = [0, 0, 1, 2, 0, 4]  # joint 0 is root
    p = rng.normal(size=(B, K, 3)).astype(np.float32)
    t = rng.normal(size=(B, K, 3)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, (B, K - 1)).astype(np.float32)

    non_root = [i for i in range(K) if parents[i] != i]
    tp, tt = torch.from_numpy(p), torch.from_numpy(t)
    ob = torch.norm(tp - tp[:, parents], dim=-1)[:, non_root]
    tb = torch.norm(tt - tt[:, parents], dim=-1)[:, non_root]
    tw = torch.from_numpy(w)
    ref = torch.mean(torch.abs((ob * tw).mean(0) - (tb * tw).mean(0))).item()
    got = float(L.bone_loss(jnp.asarray(p), jnp.asarray(t), parents,
                            jnp.asarray(w)))
    assert abs(got - ref) < 1e-6


def test_semi_supervision_projection():
    """project_joints reproduces the reference's distorted pinhole camera
    (regression_loss.py:391-416); semi_supervision_loss returns finite
    proj/bone losses and zero for a perfect projection."""
    rng = np.random.default_rng(5)
    B, K = 3, 6
    pose = rng.normal(0, 0.3, (B, K, 3)).astype(np.float32)
    pose[..., 2] += 4.0  # in front of the camera
    traj = np.zeros((B, K, 3), np.float32)
    intr4 = np.tile(np.array([[1000.0, 1000.0, 320.0, 240.0]],
                             np.float32), (B, 1))
    target_2d = np.asarray(L.project_joints(jnp.asarray(pose),
                                            jnp.asarray(intr4)))
    parents = [0, 0, 1, 2, 0, 4]
    out = L.semi_supervision_loss(jnp.asarray(pose), jnp.asarray(pose),
                                  jnp.asarray(traj), jnp.asarray(target_2d),
                                  jnp.asarray(intr4), parents)
    assert float(out["proj_loss"]) < 1e-4
    assert float(out["bone_loss"]) == 0.0
    # 9-param intrinsics (with distortion) still finite and different
    intr9 = np.concatenate([intr4, np.tile(np.array(
        [[0.1, -0.05, 0.01, 0.001, -0.002]], np.float32), (B, 1))], 1)
    p9 = np.asarray(L.project_joints(jnp.asarray(pose), jnp.asarray(intr9)))
    assert np.isfinite(p9).all() and np.abs(p9 - target_2d).max() > 0.01


def test_wing_smooth_l1_adaptive_wing_finite():
    rng = np.random.default_rng(0)
    p = rng.normal(size=(2, 17, 2)).astype(np.float32)
    t = rng.normal(size=(2, 17, 2)).astype(np.float32)
    hm_p = rng.uniform(0, 1, (2, 17, 8, 6)).astype(np.float32)
    hm_t = rng.uniform(0, 1, (2, 17, 8, 6)).astype(np.float32)
    for v in (L.wing_loss(p, t), L.smooth_l1_loss(p, t), L.mpjpe_loss(p, t),
              L.adaptive_wing_loss(hm_p, hm_t)):
        assert np.isfinite(float(v))
    # zero error -> zero loss
    assert float(L.wing_loss(p, p)) == 0.0
    assert float(L.smooth_l1_loss(p, p)) == 0.0
