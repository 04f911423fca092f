"""Device-input training path: uint8 crops + joint coords shipped to device,
normalization + Gaussian target rendering inside the jitted step
(train/step.py::render_batch_on_device).  Numerics must match the host
loader path exactly — same truncation / out-of-bounds / weight quirks as the
reference's per-joint host loop (reference datasets/COCO.py:384-439)."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.configs import IMAGENET_MEAN, IMAGENET_STD
from easy_vitpose_tpu.models.vitpose import init_vitpose_params
from easy_vitpose_tpu.ops.heatmap import (generate_gaussian_targets,
                                          generate_gaussian_targets_jnp)
from easy_vitpose_tpu.parallel import mesh as meshlib
from easy_vitpose_tpu.train import step as trainlib
from tests.test_model_parity import CASES


def _random_joints(rng, b, k):
    """Mix of in-bounds, out-of-bounds and negative coordinates plus
    0/1/2-valued visibility — every branch of the renderer."""
    joints = rng.uniform(-60, 260, size=(b, k, 2)).astype(np.float32)
    # force some joints well inside / fully outside
    joints[:, 0] = rng.uniform(10, 180, size=(b, 2))
    joints[:, 1] = rng.uniform(400, 900, size=(b, 2))
    joints[:, 2] = rng.uniform(-300, -100, size=(b, 2))
    vis_col = rng.integers(0, 3, size=(b, k, 1)).astype(np.float32)
    vis = np.repeat(np.clip(vis_col, 0, 1), 2, axis=2)
    return joints, vis


@pytest.mark.parametrize("sigma", [3.0, 2.0])
@pytest.mark.parametrize("udjw", [False, True])
def test_jnp_renderer_matches_numpy(sigma, udjw):
    rng = np.random.default_rng(0)
    b, k = 6, 17
    joints, vis = _random_joints(rng, b, k)
    jw = rng.uniform(0.5, 1.5, size=(k, 1)).astype(np.float32)

    t_jnp, w_jnp = generate_gaussian_targets_jnp(
        jnp.asarray(joints), jnp.asarray(vis), sigma=sigma,
        joints_weight=jw, use_different_joints_weight=udjw)
    t_jnp, w_jnp = np.asarray(t_jnp), np.asarray(w_jnp)

    for i in range(b):
        t_np, w_np = generate_gaussian_targets(
            joints[i], vis[i], sigma=sigma, joints_weight=jw,
            use_different_joints_weight=udjw)
        np.testing.assert_allclose(t_jnp[i], t_np, atol=1e-6)
        np.testing.assert_allclose(w_jnp[i], w_np, atol=1e-7)


def _raw_batch(rng, b, k=17):
    imgs = rng.integers(0, 256, size=(b, 256, 192, 3), dtype=np.uint8)
    joints, vis = _random_joints(rng, b, k)
    return {"images_u8": imgs, "joints": joints, "joints_vis": vis}


def _host_render(raw):
    """The host loader's exact math (dataset.__getitem__ normalize +
    per-instance numpy renderer)."""
    x = (raw["images_u8"].astype(np.float32) / 255.0
         - np.asarray(IMAGENET_MEAN, np.float32)) \
        / np.asarray(IMAGENET_STD, np.float32)
    ts, ws = [], []
    for j, v in zip(raw["joints"], raw["joints_vis"]):
        t, w = generate_gaussian_targets(j, v)
        ts.append(t)
        ws.append(w)
    return {"images": x, "targets": np.stack(ts),
            "target_weights": np.stack(ws)}


@pytest.mark.parametrize("grad_accum", [1, 2])
def test_train_step_equality_host_vs_device_input(grad_accum):
    cfg = CASES["tiny"]
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    tx = trainlib.make_optimizer(1e-3)
    state = trainlib.init_train_state(params, tx)
    rng = np.random.default_rng(1)
    raw = _raw_batch(rng, 8)
    host = _host_render(raw)
    key = jax.random.PRNGKey(7)

    step_host = jax.jit(trainlib.make_train_step(
        cfg, tx, use_amp=True, grad_accum=grad_accum))
    step_raw = jax.jit(trainlib.make_train_step(
        cfg, tx, use_amp=True, grad_accum=grad_accum))

    s_h, m_h = step_host(state, host, key)
    s_r, m_r = step_raw(state, raw, key)
    assert abs(float(m_h["loss"]) - float(m_r["loss"])) < 1e-7
    for a, b in zip(jax.tree.leaves(s_h["params"]),
                    jax.tree.leaves(s_r["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sharded_step_equality_host_vs_device_input():
    cfg = CASES["tiny"]
    mesh = meshlib.make_mesh()
    assert mesh.devices.size == 8
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    tx = trainlib.make_optimizer(1e-3)
    state0 = trainlib.init_train_state(params, tx)
    rng = np.random.default_rng(2)
    raw = _raw_batch(rng, 16)
    host = _host_render(raw)
    key = meshlib.replicate(mesh, jax.random.PRNGKey(3))

    step_h = trainlib.make_train_step_sharded(cfg, tx, mesh, use_amp=True,
                                              block_impl="xla",
                                              donate_state=False)
    step_r = trainlib.make_train_step_sharded(cfg, tx, mesh, use_amp=True,
                                              block_impl="xla",
                                              donate_state=False)
    st = meshlib.replicate(mesh, state0)
    s_h, m_h = step_h(st, meshlib.shard_batch(mesh, host), key)
    s_r, m_r = step_r(st, meshlib.shard_batch(mesh, raw), key)
    assert abs(float(m_h["loss"]) - float(m_r["loss"])) < 1e-7
    for a, b in zip(jax.tree.leaves(s_h["params"]),
                    jax.tree.leaves(s_r["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


# ----------------------------------------------------------------- dataset

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_devinput")
    (root / "train2017").mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(8):
        h, w = 240, 320
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        name = f"{i:012d}.jpg"
        cv2.imwrite(str(root / "train2017" / name), img)
        images.append({"id": i, "file_name": name, "width": w, "height": h})
        kp = np.zeros((17, 3))
        kp[:, 0] = rng.uniform(40, 280, 17)
        kp[:, 1] = rng.uniform(40, 200, 17)
        kp[:, 2] = 2
        x0, y0 = kp[:, 0].min() - 5, kp[:, 1].min() - 5
        bw, bh = kp[:, 0].max() - x0 + 5, kp[:, 1].max() - y0 + 5
        annotations.append({
            "id": i, "image_id": i, "category_id": 1,
            "keypoints": kp.ravel().tolist(), "num_keypoints": 17,
            "bbox": [float(x0), float(y0), float(bw), float(bh)],
            "area": float(bw * bh), "iscrowd": 0})
    (root / "annotations").mkdir()
    with open(root / "annotations" / "person_keypoints_train2017.json",
              "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    return str(root)


def test_dataset_raw_mode_matches_host_mode(coco_dir):
    from easy_vitpose_tpu.train.dataset import (CocoPoseDataset,
                                                batch_iterator)
    # identical seeds -> identical augmentation draws; the raw batch rendered
    # on device must equal the host batch bit-for-bit modulo f32 noise
    ds_h = CocoPoseDataset(coco_dir, "train2017", is_train=True, seed=5)
    ds_r = CocoPoseDataset(coco_dir, "train2017", is_train=True, seed=5,
                           device_input=True)
    bh = next(batch_iterator(ds_h, 4, shuffle=False, prefetch=0))
    br = next(batch_iterator(ds_r, 4, shuffle=False, prefetch=0))
    assert br["images_u8"].dtype == np.uint8
    assert br["images_u8"].shape == (4, 256, 192, 3)
    rendered = trainlib.render_batch_on_device(
        {k: jnp.asarray(v) for k, v in br.items() if k != "meta"})
    np.testing.assert_allclose(np.asarray(rendered["images"]),
                               bh["images"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rendered["targets"]),
                               bh["targets"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rendered["target_weights"]),
                               bh["target_weights"], atol=1e-7)


def test_train_model_device_input_e2e(coco_dir, tmp_path):
    from easy_vitpose_tpu.train.dataset import CocoPoseDataset
    from easy_vitpose_tpu.train.loop import TrainSettings, train_model
    cfg = CASES["tiny"]

    def run(device_input):
        params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
        ds = CocoPoseDataset(coco_dir, "train2017", is_train=True, seed=0)
        st = TrainSettings(lr=1e-3, total_epochs=1, batch_size=8,
                           use_amp=True, save_interval=100,
                           tensorboard=False, device_input=device_input,
                           work_dir=str(tmp_path / f"di{device_input}"))
        return train_model(params, cfg, ds, None, st, log=lambda s: None)

    h = run(False)
    r = run(True)
    # same seeds, same augmentation draws, same math -> same trajectory
    assert np.isfinite(r["history"][-1]["train_loss"])
    assert abs(h["history"][-1]["train_loss"]
               - r["history"][-1]["train_loss"]) < 1e-6
