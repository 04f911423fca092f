"""Layer-decay optimizer + AOT export tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.models.vitpose import init_vitpose_params
from easy_vitpose_tpu.train import step as trainlib
from tests.test_model_parity import CASES


def test_layerwise_lr_decay_scales_by_depth():
    cfg = CASES["tiny"]  # depth 2
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    trainable, _ = trainlib.split_bn_state(params)
    tx = trainlib.layerwise_lr_decay(0.5, depth=2)
    state = tx.init(trainable)
    ones = jax.tree.map(jnp.ones_like, trainable)
    scaled, _ = tx.update(ones, state)
    # head untouched
    assert float(scaled["head"]["final_b"][0]) == 1.0
    # embeddings get rate^depth = 0.25
    assert abs(float(scaled["backbone"]["patch_b"][0]) - 0.25) < 1e-6
    # block 0 gets 0.5^2=0.25... wait: layer i in 1..depth -> rate^(depth-i)
    qkv = np.asarray(scaled["backbone"]["blocks"]["qkv_b"])
    assert abs(qkv[0, 0] - 0.5) < 1e-6   # layer 1: rate^(2-1)
    assert abs(qkv[1, 0] - 1.0) < 1e-6   # layer 2 (last): rate^0


def test_adamw_layer_decay_runs():
    cfg = CASES["tiny"]
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    tx = trainlib.make_adamw_layer_decay_optimizer(
        learning_rate=1e-3, depth=cfg.backbone.depth)
    state = trainlib.init_train_state(params, tx)
    step = trainlib.make_train_step(cfg, tx, use_amp=False)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(size=(2, 256, 192, 3)), jnp.float32),
        "targets": jnp.asarray(rng.uniform(0, 1, (2, 17, 64, 48)), jnp.float32),
        "target_weights": jnp.ones((2, 17, 1)),
    }
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state["params"], new_state["params"])
    assert max(jax.tree.leaves(d)) > 0


def test_aot_export_roundtrip(tmp_path):
    """jax.export serialize -> deserialize -> call produces same heatmaps."""
    from jax import export as jax_export
    import functools
    from easy_vitpose_tpu.models.vitpose import vitpose_forward
    cfg = CASES["tiny"]
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    fn = jax.jit(functools.partial(vitpose_forward, cfg=cfg))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 256, 192, 3)),
                    jnp.float32)
    p_spec = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                          params)
    exported = jax_export.export(fn)(
        p_spec, jax.ShapeDtypeStruct(x.shape, x.dtype))
    blob = exported.serialize()
    assert len(blob) > 1000
    restored = jax_export.deserialize(blob)
    y_ref = np.asarray(fn(params, x))
    y = np.asarray(restored.call(params, x))
    np.testing.assert_allclose(y, y_ref, atol=1e-5)


def test_aot_export_roundtrip_int8(tmp_path):
    """The int8 (W8A8) serving program exports and round-trips: int8
    weights bake into the artifact, outputs match the live xla_q8 path."""
    from jax import export as jax_export
    import functools
    from easy_vitpose_tpu.models.quant import quantize_vit_params
    from easy_vitpose_tpu.models.vitpose import vitpose_forward
    cfg = CASES["tiny"]
    params = quantize_vit_params(
        init_vitpose_params(jax.random.PRNGKey(0), cfg))
    fn = jax.jit(functools.partial(vitpose_forward, cfg=cfg,
                                   block_impl="xla_q8"))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 256, 192, 3)),
                    jnp.bfloat16)
    p_spec = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                          params)
    exported = jax_export.export(fn)(
        p_spec, jax.ShapeDtypeStruct(x.shape, x.dtype))
    restored = jax_export.deserialize(exported.serialize())
    y_ref = np.asarray(fn(params, x))
    y = np.asarray(restored.call(params, x))
    np.testing.assert_allclose(y, y_ref, atol=1e-5)
