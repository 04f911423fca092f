"""Gradient accumulation (train/step.py grad_accum=k).

The reference's from-scratch recipe assumes 64 samples/GPU on an 8-GPU
launcher (train_configs/*.py ``data['samples_per_gpu']`` + DDP, SURVEY
§2.3) — a 512 effective batch.  ``grad_accum`` reproduces that on fewer
chips: the jitted step scans k sequential micro-batches, averages f32
gradients and updates the optimizer ONCE, so step counters / LR
schedules / EMA see a single large-batch step.  BN batch statistics are
chained per micro-batch (the reference's per-GPU BN batches likewise
never see the full 512).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from easy_vitpose_tpu.configs import BackboneConfig, HeadConfig, ModelConfig
from easy_vitpose_tpu.models.vitpose import (init_vitpose_params,
                                             vitpose_forward_train)
from easy_vitpose_tpu.parallel import mesh as meshlib
from easy_vitpose_tpu.train import step as trainlib
from easy_vitpose_tpu.train.losses import joints_mse_loss

CFG = ModelConfig(
    name="tiny", dataset="coco",
    backbone=BackboneConfig(embed_dim=96, depth=2, num_heads=4,
                            drop_path_rate=0.2),
    head=HeadConfig(in_channels=96, num_keypoints=17,
                    deconv_filters=(32, 32)))


def _setup(B=8, tx=None, cfg=CFG, seed=0):
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    tx = tx or trainlib.make_optimizer(1e-3)
    state = trainlib.init_train_state(params, tx)
    rng = np.random.default_rng(seed)
    batch = {
        "images": rng.normal(size=(B, 256, 192, 3)).astype(np.float32),
        "targets": rng.uniform(0, 1, (B, 17, 64, 48)).astype(np.float32),
        "target_weights": np.ones((B, 17, 1), np.float32)}
    return state, batch, tx


def _tree_allclose(a, b, rtol=1e-6, atol=1e-7, msg=""):
    for (path, x), y in zip(
            jax.tree_util.tree_leaves_with_path(jax.tree.map(np.asarray, a)),
            jax.tree_util.tree_leaves(jax.tree.map(np.asarray, b))):
        np.testing.assert_allclose(
            y, x, rtol=rtol, atol=atol,
            err_msg=f"{msg} at {jax.tree_util.keystr(path)}")


def test_accum_matches_manual_micro_batch_oracle():
    """grad_accum=k must equal: per-micro-batch grads at the SAME params
    (BN state chained), averaged, one tx.update — the defining semantics.
    SGD so post-step param deltas are LINEAR in the gradients (Adam's
    m/sqrt(v) is sign-like at step 1 and amplifies scan-vs-loop
    reduction-order noise on near-zero grads to full +-lr)."""
    k, B = 4, 8
    state, batch_np, tx = _setup(B=B, tx=optax.sgd(1e-3))
    key = jax.random.PRNGKey(11)
    batch = {kk: jnp.asarray(v) for kk, v in batch_np.items()}

    step = jax.jit(trainlib.make_train_step(CFG, tx, use_amp=False,
                                            grad_accum=k))
    s_new, metrics = step(state, batch, key)

    # manual oracle: same micro split, same keys, chained BN
    keys = jax.random.split(key, k)
    b = B // k
    bn = state["bn_state"]
    gsum = jax.tree.map(jnp.zeros_like, state["params"])
    losses = []
    for i in range(k):
        mb = {kk: v[i * b:(i + 1) * b] for kk, v in batch.items()}

        def loss_f(tr, bn=bn, mb=mb, ki=keys[i]):
            params = trainlib.merge_bn_state(tr, bn)
            heat, new_bn = vitpose_forward_train(params, mb["images"], CFG,
                                                 rng=ki)
            return joints_mse_loss(heat, mb["targets"],
                                   mb["target_weights"]), new_bn

        (loss, bn), g = jax.value_and_grad(loss_f, has_aux=True)(
            state["params"])
        gsum = jax.tree.map(jnp.add, gsum, g)
        losses.append(float(loss))
    grads = jax.tree.map(lambda g: g / k, gsum)
    updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
    expect_params = optax.apply_updates(state["params"], updates)

    assert float(metrics["loss"]) == pytest.approx(np.mean(losses), rel=1e-6)
    assert float(metrics["grad_norm"]) == pytest.approx(
        float(optax.global_norm(grads)), rel=1e-5)
    # scan-vs-python-loop reduction-order noise only (observed ~1e-7 abs)
    _tree_allclose(expect_params, s_new["params"], rtol=1e-4, atol=5e-7,
                   msg="params")
    _tree_allclose(bn, s_new["bn_state"], rtol=1e-5, atol=1e-6,
                   msg="bn_state")
    assert int(s_new["step"]) == 1  # ONE optimizer step for k micro-batches


def test_accum_one_is_identity_with_plain_step():
    """grad_accum=1 must be byte-equivalent to the original step."""
    state, batch_np, tx = _setup(B=4)
    key = jax.random.PRNGKey(5)
    batch = {kk: jnp.asarray(v) for kk, v in batch_np.items()}
    s1, m1 = jax.jit(trainlib.make_train_step(CFG, tx, use_amp=False))(
        state, batch, key)
    s2, m2 = jax.jit(trainlib.make_train_step(CFG, tx, use_amp=False,
                                              grad_accum=1))(
        state, batch, key)
    assert float(m1["loss"]) == float(m2["loss"])
    _tree_allclose(s1["params"], s2["params"], rtol=0, atol=0, msg="params")


def test_accum_composes_with_ema_single_tick():
    """EMA must tick once per optimizer step, not once per micro-batch."""
    k, B, d = 2, 4, 0.9
    params = init_vitpose_params(jax.random.PRNGKey(0), CFG)
    tx = trainlib.make_optimizer(1e-3)
    state = trainlib.init_train_state(params, tx, ema_decay=d)
    rng = np.random.default_rng(2)
    batch = {
        "images": jnp.asarray(rng.normal(size=(B, 256, 192, 3)),
                              jnp.float32),
        "targets": jnp.asarray(rng.uniform(0, 1, (B, 17, 64, 48)),
                               jnp.float32),
        "target_weights": jnp.ones((B, 17, 1), jnp.float32)}
    step = jax.jit(trainlib.make_train_step(CFG, tx, use_amp=False,
                                            ema_decay=d, grad_accum=k))
    s_new, _ = step(state, batch, jax.random.PRNGKey(0))
    expect = jax.tree.map(lambda e, p: d * e + (1 - d) * p,
                          state["ema_params"], s_new["params"])
    _tree_allclose(expect, s_new["ema_params"], msg="ema")


def test_sharded_accum_matches_unsharded_on_reordered_batch():
    """8-device sharded grad_accum: micro-batch i is the union of every
    device's i-th local slice with GLOBAL BN stats per micro-step — so it
    must equal the unsharded accum step on the equivalently reordered
    batch (device-major gather)."""
    assert len(jax.devices()) == 8
    n_dev, k, B = 8, 2, 16
    cfg0 = dataclasses.replace(
        CFG, backbone=dataclasses.replace(CFG.backbone, drop_path_rate=0.0))
    mesh = meshlib.make_mesh()
    state, batch_np, tx = _setup(B=B, tx=optax.sgd(1e-3), cfg=cfg0)
    key = jax.random.PRNGKey(9)

    # device-major reorder: micro i := concat_d local_d[i*b : (i+1)*b]
    b_loc = B // n_dev // k
    order = np.concatenate([
        np.concatenate([np.arange(d * (B // n_dev) + i * b_loc,
                                  d * (B // n_dev) + (i + 1) * b_loc)
                        for d in range(n_dev)])
        for i in range(k)])
    reordered = {kk: v[order] for kk, v in batch_np.items()}
    step_ref = jax.jit(trainlib.make_train_step(cfg0, tx, use_amp=False,
                                                grad_accum=k))
    s1, m1 = step_ref(state,
                      {kk: jnp.asarray(v) for kk, v in reordered.items()},
                      key)

    step_sh = trainlib.make_train_step_sharded(
        cfg0, tx, mesh, use_amp=False, block_impl="xla",
        donate_state=False, grad_accum=k)
    s2, m2 = step_sh(meshlib.replicate(mesh, state),
                     meshlib.shard_batch(mesh, batch_np),
                     meshlib.replicate(mesh, key))

    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-5)
    _tree_allclose(s1["params"], s2["params"], rtol=1e-5, atol=1e-6,
                   msg="params")
    _tree_allclose(s1["bn_state"], s2["bn_state"], rtol=1e-4, atol=1e-5,
                   msg="bn_state")


def test_cli_and_preset_plumb_grad_accum(monkeypatch, tmp_path):
    """--grad-accum / yaml grad_accum reach TrainSettings unchanged."""
    from easy_vitpose_tpu.cli import train as cli_train
    from easy_vitpose_tpu.train import presets

    assert presets.from_scratch("b", grad_accum=8,
                                batch_size=512).grad_accum == 8

    captured = {}

    def fake_train_model(params, cfg, train_ds, val_ds, settings, **kw):
        captured["settings"] = settings
        return {"params": params, "history": []}

    class FakeDS:
        ann_file = None

        def __init__(self, *a, **kw):
            pass

        def __len__(self):
            return 0

    monkeypatch.setattr(cli_train, "train_model", fake_train_model)
    monkeypatch.setattr(cli_train, "CocoPoseDataset", FakeDS)
    (tmp_path / "w").mkdir()  # normally created by the real train_model
    cli_train.main(["--data-root", str(tmp_path), "--model-name", "s",
                    "--batch-size", "16", "--grad-accum", "4",
                    "--work-dir", str(tmp_path / "w")])
    assert captured["settings"].grad_accum == 4
    assert captured["settings"].batch_size == 16


def test_sharded_accum_fused_kernels_smoke():
    """grad_accum composes with the fused custom-VJP Pallas train block
    under shard_map (interpret mode on CPU): finite loss, step advances."""
    assert len(jax.devices()) == 8
    mesh = meshlib.make_mesh()
    state, batch_np, tx = _setup(B=16)
    step = trainlib.make_train_step_sharded(
        CFG, tx, mesh, use_amp=False,
        block_impl="pallas_train_interpret", donate_state=False,
        grad_accum=2)
    s, m = step(meshlib.replicate(mesh, state),
                meshlib.shard_batch(mesh, batch_np),
                meshlib.replicate(mesh, jax.random.PRNGKey(1)))
    assert np.isfinite(float(m["loss"]))
    assert int(np.asarray(s["step"])) == 1
