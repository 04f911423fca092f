"""Tensor-parallel training (parallel/tp.py) on the 8-virtual-device mesh:
the (data x model) TP step must compute the same training trajectory as the
pure-DP step — GSPMD collectives, not numerics, are the only difference."""
import dataclasses

import jax
import numpy as np
import pytest

from easy_vitpose_tpu.configs import BackboneConfig, HeadConfig, ModelConfig
from easy_vitpose_tpu.models.vitpose import init_vitpose_params
from easy_vitpose_tpu.parallel import mesh as meshlib
from easy_vitpose_tpu.parallel import tp as tplib
from easy_vitpose_tpu.train import step as steplib

CFG = ModelConfig(
    name="tptiny", dataset="coco",
    backbone=BackboneConfig(embed_dim=128, depth=2, num_heads=4),
    head=HeadConfig(in_channels=128, num_keypoints=17,
                    deconv_filters=(16, 16)))


def _batch(b=8):
    rng = np.random.default_rng(0)
    return {
        "images": rng.normal(size=(b, 256, 192, 3)).astype(np.float32),
        "targets": rng.uniform(0, 1, (b, 17, 64, 48)).astype(np.float32),
        "target_weights": np.ones((b, 17, 1), np.float32),
    }


def _run(n_data, n_model, use_amp=False, steps=2):
    params = init_vitpose_params(jax.random.PRNGKey(0), CFG)
    tx = steplib.make_optimizer(1e-3)
    state = steplib.init_train_state(params, tx)
    step = steplib.make_train_step(CFG, tx, use_amp=use_amp)
    key = jax.random.PRNGKey(1)
    batch = _batch()
    if n_model == 1:
        mesh = meshlib.make_mesh(n_data)
        jstep = steplib.jit_data_parallel(step, mesh, donate_state=False)
        state = meshlib.replicate(mesh, state)
        dev_batch = meshlib.shard_batch(mesh, batch)
        key = meshlib.replicate(mesh, key)
    else:
        mesh = tplib.make_mesh_2d(n_data, n_model)
        jstep = tplib.jit_tensor_parallel(step, mesh, state,
                                          donate_state=False)
        state = tplib.shard_state(state, mesh)
        dev_batch = meshlib.shard_batch(mesh, batch)
        key = jax.device_put(
            key, tplib.NamedSharding(mesh, tplib.P()))
    losses = []
    for _ in range(steps):
        state, metrics = jstep(state, dev_batch, key)
        losses.append(float(metrics["loss"]))
    return losses, jax.tree.map(np.asarray, state["params"])


@pytest.mark.parametrize("layout", [(4, 2), (2, 4)])
def test_tp_matches_dp_trajectory(layout):
    ref_losses, ref_params = _run(8, 1)
    tp_losses, tp_params = _run(*layout)
    np.testing.assert_allclose(tp_losses, ref_losses, rtol=1e-5)
    diffs = jax.tree.map(lambda a, b: float(np.abs(a - b).max()),
                         ref_params, tp_params)
    assert max(jax.tree.leaves(diffs)) < 1e-5


def test_tp_sharding_actually_partitions():
    """The qkv/fc weights must really be split over the model axis (not
    silently replicated)."""
    mesh = tplib.make_mesh_2d(4, 2)
    params = init_vitpose_params(jax.random.PRNGKey(0), CFG)
    sharded = tplib.shard_state(params, mesh)
    qkv = sharded["backbone"]["blocks"]["qkv_w"]
    assert qkv.sharding.spec == tplib.P(None, None, "model")
    # per-device shard holds half the output features
    shard_shape = qkv.addressable_shards[0].data.shape
    assert shard_shape[-1] == qkv.shape[-1] // 2
    fc2 = sharded["backbone"]["blocks"]["mlp"]["fc2_w"]
    assert fc2.addressable_shards[0].data.shape[1] == fc2.shape[1] // 2
    # replicated leaves stay whole
    pw = sharded["backbone"]["patch_w"]
    assert pw.addressable_shards[0].data.shape == pw.shape
