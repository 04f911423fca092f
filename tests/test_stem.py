"""Hybrid CNN-stem embedding (reference HybridEmbed, vit.py:231-260).

The reference ships HybridEmbed as dead code (no config instantiates it);
ours is a functional conv stem selected by ``BackboneConfig.stem_channels``.
These tests pin: token-grid compatibility with the default PatchEmbed,
forward/grad health through the full ViTPose composite, train-step
integration (weight-decay mask, layer-decay grouping), and that shipped
configs remain stem-free.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easy_vitpose_tpu.configs import get_model_config
from easy_vitpose_tpu.models.stem import init_stem_params, stem_forward
from easy_vitpose_tpu.models.vit import init_vit_params, vit_forward
from easy_vitpose_tpu.models.vitpose import (init_vitpose_params,
                                             vitpose_forward,
                                             vitpose_forward_train)

STEM = (8, 16, 16, 24)  # tiny 4-stage /16 stem for CPU tests


def tiny_cfg(stem=STEM):
    cfg = get_model_config("coco", "s", stem_channels=stem)
    bb = dataclasses.replace(cfg.backbone, depth=2, embed_dim=64,
                             num_heads=2, stem_channels=stem)
    return dataclasses.replace(
        cfg, backbone=bb,
        head=dataclasses.replace(cfg.head, in_channels=64))


def test_shipped_configs_have_no_stem():
    for size in "sblh":
        assert get_model_config("coco", size).backbone.stem_channels is None


def test_token_grid_matches_patch_embed():
    # 4 stride-2 SAME stages on 256x192 -> the same (16, 12) grid as
    # PatchEmbed(p16, pad2), so pos-embed shapes are interchangeable.
    with_stem = get_model_config("coco", "s", stem_channels=STEM).backbone
    without = get_model_config("coco", "s").backbone
    assert with_stem.patch_shape == without.patch_shape == (16, 12)
    assert with_stem.num_tokens == without.num_tokens


def test_stem_forward_shape_and_dtype():
    cfg = tiny_cfg().backbone
    p = init_stem_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((2, 256, 192, 3), jnp.float32)
    t = stem_forward(p, x, cfg)
    assert t.shape == (2, cfg.num_tokens, cfg.embed_dim)
    tb = stem_forward(jax.tree.map(lambda a: a.astype(jnp.bfloat16), p),
                      x.astype(jnp.bfloat16), cfg)
    assert tb.dtype == jnp.bfloat16


def test_vit_forward_uses_stem_params():
    cfg = tiny_cfg().backbone
    p = init_vit_params(jax.random.PRNGKey(0), cfg)
    assert "stem" in p and "patch_w" not in p
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 256, 192, 3)), jnp.float32)
    feats = vit_forward(p, x, cfg)
    assert feats.shape == (2, 16, 12, cfg.embed_dim)
    assert bool(jnp.all(jnp.isfinite(feats)))


def test_full_composite_and_grads():
    cfg = tiny_cfg()
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 256, 192, 3)), jnp.float32)
    heat = vitpose_forward(params, x, cfg)
    assert heat.shape == (2, cfg.num_keypoints, 64, 48)

    def loss(p):
        h, _ = vitpose_forward_train(p, x, cfg, rng=jax.random.PRNGKey(2))
        return jnp.mean(jnp.square(h))

    g = jax.grad(loss)(params)
    stem_leaves = jax.tree_util.tree_leaves(g["backbone"]["stem"])
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in stem_leaves)
    # every stem leaf actually receives gradient signal
    assert all(float(jnp.max(jnp.abs(l))) > 0 for l in stem_leaves)


def test_amp_backward_through_stem():
    """bf16-AMP gradient through the stem convs (regression: an f32
    preferred_element_type on the conv broke its transpose rule under
    mixed dtypes — dots tolerate the mix, convs do not)."""
    from easy_vitpose_tpu.models.vitpose import cast_params
    cfg = tiny_cfg()
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(4).normal(
        size=(2, 256, 192, 3)), jnp.float32)

    def loss(p):
        fp = cast_params(p, jnp.bfloat16)
        h, _ = vitpose_forward_train(fp, x.astype(jnp.bfloat16), cfg,
                                     rng=jax.random.PRNGKey(5))
        return jnp.mean(jnp.square(h.astype(jnp.float32)))

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(g["backbone"]["stem"])
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert all(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_train_step_with_stem():
    from easy_vitpose_tpu.train import step as trainlib
    cfg = tiny_cfg()
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    tx = trainlib.make_optimizer(1e-3)
    state = trainlib.init_train_state(params, tx)
    step = jax.jit(trainlib.make_train_step(cfg, tx, use_amp=False))
    rng = np.random.default_rng(3)
    batch = {
        "images": jnp.asarray(rng.normal(size=(2, 256, 192, 3)), jnp.float32),
        "targets": jnp.asarray(rng.uniform(0, 1, (2, 17, 64, 48)), jnp.float32),
        "target_weights": jnp.ones((2, 17, 1), jnp.float32),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(4))
    before = state["params"]["backbone"]["stem"]["convs"][0]["w"]
    after = new_state["params"]["backbone"]["stem"]["convs"][0]["w"]
    assert float(jnp.max(jnp.abs(after - before))) > 0
    assert bool(jnp.isfinite(metrics["loss"]))


def test_wd_mask_excludes_stem_norms_and_biases():
    from easy_vitpose_tpu.train.step import make_adamw_layer_decay_optimizer
    cfg = tiny_cfg()
    params = init_vitpose_params(jax.random.PRNGKey(0), cfg)
    tx = make_adamw_layer_decay_optimizer(depth=cfg.backbone.depth)
    opt = tx.init(params)  # must not raise
    g = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(g, opt, params)
    assert jax.tree_util.tree_structure(updates) == \
        jax.tree_util.tree_structure(params)
