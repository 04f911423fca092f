"""Mesh/GAN loss parity vs torch oracles (reference mesh_loss.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.train import mesh_losses as M

torch = pytest.importorskip("torch")


def test_rotation_helpers_match_torch():
    rng = np.random.default_rng(0)
    theta = rng.normal(0, 1.5, (8, 3)).astype(np.float32)

    t = torch.from_numpy(theta)
    l2 = torch.norm(t + 1e-8, p=2, dim=1)
    angle = l2.unsqueeze(-1)
    quat = torch.cat([torch.cos(angle * 0.5),
                      torch.sin(angle * 0.5) * (t / angle)], dim=1)
    nq = quat / quat.norm(p=2, dim=1, keepdim=True)
    w, x, y, z = nq[:, 0], nq[:, 1], nq[:, 2], nq[:, 3]
    ref = torch.stack([
        w**2 + x**2 - y**2 - z**2, 2*x*y - 2*w*z, 2*w*y + 2*x*z,
        2*w*z + 2*x*y, w**2 - x**2 + y**2 - z**2, 2*y*z - 2*w*x,
        2*x*z - 2*w*y, 2*w*x + 2*y*z, w**2 - x**2 - y**2 + z**2,
    ], dim=1).view(-1, 3, 3).numpy()

    got = np.asarray(M.batch_rodrigues(jnp.asarray(theta)))
    np.testing.assert_allclose(got, ref, atol=1e-5)

    # rot6d: output must be valid rotations reconstructing the input frame
    x6 = rng.normal(size=(8, 6)).astype(np.float32)
    R = np.asarray(M.rot6d_to_rotmat(jnp.asarray(x6)))
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_perspective_projection_pinhole():
    rng = np.random.default_rng(1)
    B, N = 2, 5
    pts = rng.normal(0, 0.5, (B, N, 3)).astype(np.float32)
    pts[..., 2] += 5.0
    R = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    t = np.zeros((B, 3), np.float32)
    f = 1000.0
    c = np.zeros((B, 2), np.float32)
    got = np.asarray(M.perspective_projection(
        jnp.asarray(pts), jnp.asarray(R), jnp.asarray(t), f, jnp.asarray(c)))
    ref = f * pts[..., :2] / pts[..., 2:3]
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_mesh_loss_components():
    rng = np.random.default_rng(2)
    B, V, J = 4, 20, 24
    out = {
        "vertices": jnp.asarray(rng.normal(size=(B, V, 3)), jnp.float32),
        "joints_3d": jnp.asarray(rng.normal(size=(B, J, 3)), jnp.float32),
        "camera": jnp.asarray(np.abs(rng.normal(size=(B, 3))) + 0.5,
                              jnp.float32),
        "pose": jnp.asarray(np.tile(np.eye(3, dtype=np.float32),
                                    (B, 24, 1, 1))),
        "beta": jnp.asarray(rng.normal(size=(B, 10)), jnp.float32),
    }
    tgt = {
        "vertices": out["vertices"],  # perfect verts -> zero vertex loss
        "joints_3d": jnp.asarray(rng.normal(size=(B, J, 3)), jnp.float32),
        "joints_3d_visible": jnp.ones((B, J, 1)),
        "joints_2d": jnp.asarray(rng.uniform(0, 224, (B, J, 2)), jnp.float32),
        "joints_2d_visible": jnp.ones((B, J, 1)),
        "pose": jnp.zeros((B, 72)),  # axis-angle 0 -> identity rotmats
        "beta": out["beta"],
        "has_smpl": jnp.ones((B,)),
    }
    losses = M.mesh_loss(out, tgt, img_res=224)
    assert set(losses) == {"vertex_loss", "smpl_pose_loss", "smpl_beta_loss",
                           "joints_3d_loss", "joints_2d_loss"}
    assert float(losses["vertex_loss"]) == 0.0
    assert float(losses["smpl_pose_loss"]) < 1e-10  # identity == identity
    assert float(losses["smpl_beta_loss"]) == 0.0
    assert float(losses["joints_3d_loss"]) > 0
    assert float(losses["joints_2d_loss"]) > 0
    # has_smpl=0 kills the smpl/vertex terms
    tgt0 = dict(tgt, has_smpl=jnp.zeros((B,)),
                vertices=jnp.asarray(rng.normal(size=(B, V, 3)), jnp.float32))
    l0 = M.mesh_loss(out, tgt0, img_res=224)
    assert float(l0["vertex_loss"]) == 0.0


def test_gan_loss_types_match_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(6, 1)).astype(np.float32)
    tx = torch.from_numpy(x)
    # vanilla
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        tx, torch.ones_like(tx)).item()
    got = float(M.gan_loss(jnp.asarray(x), True, "vanilla"))
    assert abs(got - ref) < 1e-6
    # lsgan fake
    ref = torch.nn.functional.mse_loss(tx, torch.zeros_like(tx)).item()
    got = float(M.gan_loss(jnp.asarray(x), False, "lsgan"))
    assert abs(got - ref) < 1e-6
    # wgan
    assert abs(float(M.gan_loss(jnp.asarray(x), True, "wgan")) -
               (-x.mean())) < 1e-6
    # hinge, discriminator real: mean(relu(1 - x))
    ref = torch.relu(1 - tx).mean().item()
    got = float(M.gan_loss(jnp.asarray(x), True, "hinge", is_disc=True))
    assert abs(got - ref) < 1e-6
    # generator weighting applies, discriminator weighting doesn't
    assert abs(float(M.gan_loss(jnp.asarray(x), True, "lsgan",
                                loss_weight=3.0)) -
               3.0 * float(M.gan_loss(jnp.asarray(x), True, "lsgan"))) < 1e-6
