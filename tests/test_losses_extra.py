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
